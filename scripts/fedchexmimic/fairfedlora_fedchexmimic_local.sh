#!/bin/bash
# client-parallel SPMD rounds (TPU path); PARALLEL_CLIENTS=0 for the
# sequential host loop
PARALLEL_FLAG=$([ "${PARALLEL_CLIENTS:-1}" = "1" ] && echo --parallel_clients)
python federated_main.py \
  --root DATA/ --model local --trainer GLP_OT_SVLoRA --seed ${SEED:-1} \
  --num_users 2 --frac 1.0 --lr 0.001 --round 50 --n_ctx 4 --num_prompt 2 \
  --OT None --unfreeze_image_encoder True --lora_rank 12 --lora_alpha 2 \
  --lora_type FairLoRA \
  --attribute_type ${ATTRIBUTE_TYPE:-race} --attributes race gender age \
  --dataset-config-file configs/datasets/fedchexmimic.yaml \
  --config-file configs/trainers/GLP_OT/vit_b16_oph.yaml \
  --output-dir output/fairfedlora_local_fedchexmimic_seed${SEED:-1} ${PARALLEL_FLAG}
