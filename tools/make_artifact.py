"""Convert an Orbax training checkpoint into the compact committed
artifact format (config.json + last.npz, bf16) consumed by bench.py.

Usage: python tools/make_artifact.py SRC_CKPT_DIR DST_DIR [--which best]
Runs entirely on the host (no TPU needed): PYTHONPATH= JAX_PLATFORMS=cpu.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--which", default=None, help="best|last (auto)")
    args = p.parse_args(argv)

    from epic_tpu.training.checkpoint import load_checkpoint, save_artifact

    which = args.which or ("best" if os.path.exists(
        os.path.join(args.src, "best")) else "last")
    model, params, config, step = load_checkpoint(args.src, which)
    out = save_artifact(args.dst, params, config, step)
    sz = os.path.getsize(out) / 1e6
    print(json.dumps({"src": f"{args.src}/{which}", "out": out,
                      "step": step, "size_mb": round(sz, 1)}))


if __name__ == "__main__":
    main(sys.argv[1:])
