#!/usr/bin/env bash
# Train STEVE on MOVi-E (counterpart of reference launchers/run_steve1.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
python tools/run_net.py \
  --cfg configs/movi_e/base.yaml \
  --exp_name "${EXP_NAME:-steve}" \
  "$@"
