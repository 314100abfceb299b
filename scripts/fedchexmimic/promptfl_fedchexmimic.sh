#!/bin/bash
# client-parallel SPMD rounds (TPU path); PARALLEL_CLIENTS=0 for the
# sequential host loop
PARALLEL_FLAG=$([ "${PARALLEL_CLIENTS:-1}" = "1" ] && echo --parallel_clients)
python federated_main.py \
  --root DATA/ --model fedavg --trainer PromptFL --seed ${SEED:-1} \
  --num_users 2 --frac 1.0 --lr 0.001 --round 50 --n_ctx 4 \
  --attribute_type ${ATTRIBUTE_TYPE:-race} --attributes race gender age \
  --dataset-config-file configs/datasets/fedchexmimic.yaml \
  --config-file configs/trainers/GLP_OT/vit_b16_oph.yaml \
  --output-dir output/promptfl_fedchexmimic_seed${SEED:-1} ${PARALLEL_FLAG}
