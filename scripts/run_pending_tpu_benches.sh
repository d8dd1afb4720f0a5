#!/usr/bin/env bash
# Round-3 tail: the axon relay died before these could run (BENCH_NOTES
# "Relay outage" section). Fire them in one go when the TPU is back:
#   bash scripts/run_pending_tpu_benches.sh
# Logs land in /tmp/tpu_bench_logs/; paste results into BENCH_NOTES.md.
set -u
mkdir -p /tmp/tpu_bench_logs
cd "$(dirname "$0")/.."

echo "== probe =="
timeout 120 python -c "import jax; print(jax.devices())" || {
  echo "relay still down"; exit 1; }

echo "== headline bench (fetch-forced, erf numerics) =="
timeout 2400 python bench.py 2>&1 | tee /tmp/tpu_bench_logs/bench.log

echo "== STEVE rollout (KV cache, fetch-forced) =="
timeout 2400 python scripts/bench_steve_rollout.py 2>&1 \
  | tee /tmp/tpu_bench_logs/steve_rollout.log

echo "== loader-in-the-loop flagship eval =="
timeout 2400 python scripts/bench_eval_in_loop.py 2>&1 \
  | tee /tmp/tpu_bench_logs/eval_in_loop.log

echo "done; record the numbers in BENCH_NOTES.md round-3/4 sections"
