#!/usr/bin/env bash
# Canonical CL runs, seed 42 — hyperparameter parity with the reference
# experiments (naive / ewc λ=10000 / replay / featdistill / MAFED balanced /
# MAFED adaptive; task order: action count subcategory scene color).
set -euo pipefail

# SEED / EXP / TASKS are overridable so run_finetuning.sh can sweep seeds and
# ContVQA splits (diverse_domains / taxonomy_domains default to the
# reference's seeded random task order: omit --tasks and the trainer derives
# it from the split file keys, mafed_tpu/utils/cl_utils.py).
SEED=${SEED:-42}
EXP=${EXP:-question_types}
if [ "$EXP" = "question_types" ]; then
  TASKS=${TASKS:-"action count subcategory scene color"}
else
  TASKS=${TASKS:-}
fi
MODEL=${MODEL:-storage/models/vl-pythia-eva-410m}
CFG=config/train-vqa-base-cl-vlpythia.json
OUT=${OUT:-storage/runs}
COMMON="--config $CFG --model_name $MODEL --seed $SEED --exp $EXP \
  ${TASKS:+--tasks $TASKS} --learning_rate 5e-5 --accumulate_grad_batches 4"

# naive
python -m mafed_tpu.train $COMMON --batch_size 32 \
  --cl_method naive --output_dir "$OUT/naive_seed$SEED"

# EWC
python -m mafed_tpu.train $COMMON --batch_size 32 \
  --cl_method ewc --reg_lambda 10000 --output_dir "$OUT/ewc_seed$SEED"

# Experience replay
python -m mafed_tpu.train $COMMON --batch_size 32 \
  --cl_method replay --cl_memory 4000 --replay_interval 4 --replay_coeff 1.0 \
  --output_dir "$OUT/replay_seed$SEED"

# Feature distillation (uniform layers, token-proportional modality weights)
python -m mafed_tpu.train $COMMON --batch_size 16 \
  --cl_method featdistill --cl_memory 4000 --replay_interval 4 \
  --distillation_layer_weighing_strategy discounted --distillation_layer_discount 0.5 \
  --distillation_modality_weighing_strategy equal --distillation_coeff 1.0 \
  --distillation_loss mse --output_dir "$OUT/featdistill_seed$SEED"

# MAFED balanced
python -m mafed_tpu.train $COMMON --batch_size 16 \
  --cl_method featdistill --cl_memory 4000 --replay_interval 4 \
  --distillation_layer_weighing_strategy discounted --distillation_layer_discount 0.5 \
  --distillation_modality_weighing_strategy balanced --distillation_coeff 1.0 \
  --distillation_loss mse --output_dir "$OUT/mafed_balanced_seed$SEED"

# MAFED adaptive
python -m mafed_tpu.train $COMMON --batch_size 16 \
  --cl_method featdistill --cl_memory 4000 --replay_interval 4 \
  --distillation_layer_weighing_strategy discounted --distillation_layer_discount 0.5 \
  --distillation_modality_weighing_strategy adaptive --distillation_coeff 1.0 \
  --distillation_loss mse --output_dir "$OUT/mafed_adaptive_seed$SEED"
