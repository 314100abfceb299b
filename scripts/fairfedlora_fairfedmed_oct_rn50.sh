#!/bin/bash
# TPU launcher — same hyperparameters as the reference's fairfedlora_fairfedmed_oct_rn50.sh

DATA="DATA/"
MODEL=FedOTPLoRA
TRAINER=GLP_OT_SVLoRA
OT=None
TOP_PERCENT=0.8
EPS=0.1
THRESH=0.001
MAX_ITER=100
LR=0.001
GAMMA=0.1
USERS=3
FRAC=0.8
ROUND=50
STEPSIZE=200
NUM_PROMPT=2
CFG=rn50_oph
NCTX=4
BETA=0.3
ATTRIBUTE_TYPE=${ATTRIBUTE_TYPE:-language}
LoRA_RANK=32
LoRA_ALPHA=8
SEED=${SEED:-1}
# client-parallel SPMD rounds (TPU path); PARALLEL_CLIENTS=0 for the
# sequential host loop
PARALLEL_FLAG=$([ "${PARALLEL_CLIENTS:-1}" = "1" ] && echo --parallel_clients)

DIR=output/FairLoRA_${CFG}_ema/fairfedmed_${ATTRIBUTE_TYPE}_rank${LoRA_RANK}_alpha${LoRA_ALPHA}/seed${SEED}
python federated_main.py \
  --root ${DATA} \
  --model ${MODEL} \
  --seed ${SEED} \
  --num_users ${USERS} \
  --frac ${FRAC} \
  --lr ${LR} \
  --OT ${OT} \
  --top_percent ${TOP_PERCENT} \
  --eps ${EPS} \
  --thresh ${THRESH} \
  --max_iter ${MAX_ITER} \
  --gamma ${GAMMA} \
  --trainer ${TRAINER} \
  --round ${ROUND} \
  --stepsize ${STEPSIZE} \
  --attribute_type ${ATTRIBUTE_TYPE} \
  --partition noniid-labeldir100 \
  --beta ${BETA} \
  --n_ctx ${NCTX} \
  --num_prompt ${NUM_PROMPT} \
  --unfreeze_image_encoder True \
  --lora_rank ${LoRA_RANK} \
  --lora_alpha ${LoRA_ALPHA} \
  --lora_type FairLoRA \
  --modality_type oct_bscans \
  --dim_per_3d_slice 16 \
  --dataset-config-file configs/datasets/fairfedmed.yaml \
  --config-file configs/trainers/GLP_OT/${CFG}.yaml \
  --output-dir ${DIR} \
  ${PARALLEL_FLAG} \
  --shared_half_s True \
  --lambda_fairness 0.0
