#!/usr/bin/env bash
# Joint slot+box model launcher (counterpart of reference
# launchers/run_slot_model.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
python tools/steve_train_net.py \
  --cfg "${CFG:-configs/movi_e/base.yaml}" \
  --exp_name "${EXP_NAME:-slot_model}" \
  "$@"
