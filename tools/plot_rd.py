"""Overlay a trained checkpoint's RD curve on the published anchor curves
(the reference's validation story: train.py:350-356 + utility/plot.py:8-95
+ comparison.py anchors). Input = an eval_checkpoint.py JSON.

Usage: python tools/plot_rd.py EVAL_JSON [--out artifacts/rd_r3.png]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("eval_json")
    p.add_argument("--out", default="artifacts/rd_r3.png")
    args = p.parse_args(argv)

    from epic_tpu.utils.plot import plot_rate_distortion

    with open(args.eval_json) as f:
        ev = json.load(f)

    results = {}
    groups = ev.get("groups") or {"heldout": ev}
    for name, g in groups.items():
        label = f"epic_tpu {ev['checkpoint'].split('/')[-2]} ({name})"
        results[label] = {"bpp": g["real_bpp"], "psnr": g["psnr"]}
    out = plot_rate_distortion(
        results, args.out,
        title="epic_tpu (teaser held-out) vs published Kodak anchors")
    print(out or "matplotlib unavailable")


if __name__ == "__main__":
    main(sys.argv[1:])
