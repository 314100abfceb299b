#!/bin/bash
python federated_main.py \
  --root DATA/ --model fedavg --trainer PromptFL --seed ${SEED:-1} \
  --num_users 2 --frac 1.0 --lr 0.001 --round 50 --n_ctx 4 \
  --attribute_type ${ATTRIBUTE_TYPE:-race} --attributes race gender age \
  --dataset-config-file configs/datasets/fedchexmimic.yaml \
  --config-file configs/trainers/GLP_OT/vit_b16_oph.yaml \
  --output-dir output/promptfl_fedchexmimic_seed${SEED:-1}
