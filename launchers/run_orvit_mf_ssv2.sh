#!/usr/bin/env bash
# Train/eval ORViT-Motionformer on SSv2 (counterpart of the reference's
# SLURM launchers; on TPU pods run one process per host and pass
# --shard_id/--num_shards/--init_method).
set -euo pipefail
cd "$(dirname "$0")/.."
python tools/run_net.py \
  --cfg configs/ORViT/SSv2_ORViT-MF_224_16x4.yaml \
  --exp_name "${EXP_NAME:-orvit_mf}" \
  TRAIN.METHOD sup TEST.EVAL_TASK ar \
  "$@"
