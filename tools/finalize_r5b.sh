#!/bin/bash
# Round-5 post-CNN-training pipeline: WACNN artifact + buffered-codec
# eval + demo output, flagship device profile, RD plot, bench — run when
# the r5_cnn watchdog has exited and the flagship eval JSON exists.
set -uo pipefail
CNN_RUN=${1:-runs/r5_cnn}
CNN_DST=artifacts/ckpt_r5_cnn
FLAG=artifacts/ckpt_r5_flagship

PYTHONPATH= JAX_PLATFORMS=cpu python tools/make_artifact.py \
    "$CNN_RUN/first_train" "$CNN_DST"
cp "$CNN_RUN/train_log.jsonl" "$CNN_DST/train_log.jsonl" 2>/dev/null || true

# WACNN buffered single-stream eval (real chip; CPU fallback)
timeout 1800 python tools/eval_cnn.py "$CNN_DST" \
    --out "$CNN_DST/eval_cnn.json" \
  || PYTHONPATH= JAX_PLATFORMS=cpu timeout 3600 python tools/eval_cnn.py \
    "$CNN_DST" --out "$CNN_DST/eval_cnn.json"

# demo output on the trained cnn checkpoint (buffered stream path)
PYTHONPATH= JAX_PLATFORMS=cpu python - <<'EOF'
import numpy as np
from PIL import Image
from epic_tpu.data.device_bank import TEASER_PATH, TEASER_REGIONS
im = np.asarray(Image.open(TEASER_PATH).convert("RGB"))
y0, y1, x0, x1 = TEASER_REGIONS["d0"]
Image.fromarray(im[y0:y0+512, x0:x0+512]).save("/tmp/demo_d0.png")
EOF
timeout 1200 python -m epic_tpu.cli.codec compress /tmp/demo_d0.png \
    /tmp/demo_d0.epic --checkpoint "$CNN_DST" \
    > "$CNN_DST/demo_out.txt" 2>&1 \
  && timeout 1200 python -m epic_tpu.cli.codec decompress /tmp/demo_d0.epic \
    /tmp/demo_d0_recon.png --checkpoint "$CNN_DST" \
    >> "$CNN_DST/demo_out.txt" 2>&1 || true
tail -2 "$CNN_DST/demo_out.txt" || true

# flagship device profile on the real chip (scan-mode programs)
timeout 1800 python tools/profile_sweep.py --ckpt "$FLAG" \
    --out artifacts/profile_r5.json || true

# RD plot from the (possibly still-running) flagship eval
if [ -f "$FLAG/eval_heldout.json" ]; then
  PYTHONPATH= JAX_PLATFORMS=cpu python tools/plot_rd.py \
      "$FLAG/eval_heldout.json" --out artifacts/rd_r5.png || true
fi
echo "finalize_r5b done"
