#!/bin/bash
# client-parallel SPMD rounds (TPU path); PARALLEL_CLIENTS=0 for the
# sequential host loop
PARALLEL_FLAG=$([ "${PARALLEL_CLIENTS:-1}" = "1" ] && echo --parallel_clients)
python federated_main.py \
  --root DATA/ --model FedOTP --trainer GLP_OT --seed ${SEED:-1} \
  --num_users 2 --frac 1.0 --lr 0.001 --round 50 --n_ctx 4 --num_prompt 2 \
  --OT COT --top_percent 0.8 --eps 0.1 --thresh 0.001 --max_iter 100 \
  --attribute_type ${ATTRIBUTE_TYPE:-race} --attributes race gender age \
  --dataset-config-file configs/datasets/fedchexmimic.yaml \
  --config-file configs/trainers/GLP_OT/vit_b16_oph.yaml \
  --output-dir output/fedotp_fedchexmimic_seed${SEED:-1} ${PARALLEL_FLAG}
