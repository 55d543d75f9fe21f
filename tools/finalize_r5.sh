#!/bin/bash
# Post-training pipeline for the r5 flagship (2 chained check levels):
# compact artifact -> held-out eval (chained-REM ladder + per-shell
# diagnostic) -> RD plot -> device profile -> multichip cache prewarm.
# Run AFTER the watchdog exits (chip free).
#
# Usage: tools/finalize_r5.sh [RUN_DIR] [STAGE]
set -euo pipefail
RUN=${1:-runs/r5_flagship}
STAGE=${2:-rems}
DST=artifacts/ckpt_r5_flagship

PYTHONPATH= JAX_PLATFORMS=cpu python tools/make_artifact.py \
    "$RUN/$STAGE" "$DST"
# eval on the real chip (fast); falls back to CPU if the tunnel hangs.
timeout 3000 python tools/eval_checkpoint.py "$DST" \
    --regions val d0 photo768 \
    --out "$DST/eval_heldout.json" \
  || PYTHONPATH= JAX_PLATFORMS=cpu timeout 5400 python \
    tools/eval_checkpoint.py "$DST" --regions val d0 photo768 \
    --out "$DST/eval_heldout.json"
PYTHONPATH= JAX_PLATFORMS=cpu python tools/plot_rd.py \
    "$DST/eval_heldout.json" --out artifacts/rd_r5.png
cp "$RUN/train_log.jsonl" "$DST/train_log.jsonl" 2>/dev/null || true
# per-program device profile on the fresh checkpoint (real chip); bench.py
# cites it for device-busy fraction + achieved TFLOP/s
timeout 1200 python tools/profile_sweep.py --ckpt "$DST" \
    --out artifacts/profile_r5.json || true
# Pre-warm the persistent compile cache for the driver's multichip dryrun
PYTHONPATH= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    timeout 3000 python __graft_entry__.py 8 || true
echo "finalize_r5 done: $DST + artifacts/rd_r5.png"
