"""Extend a trained REM checkpoint to MORE check levels.

The reference flagship defaults to three checkpoint levels
(/root/reference/src/models/rem_pic.py:23: [0.01, 0.25, 1.75]) and one
REM bank per quality bracket between them. Our r4 flagship trained ONE
level (0.75). This tool grows check_levels without throwing the trained
bank away: REM bank j covers the bracket (c_j, c_{j+1}] (rem_pic.py:
200-214), so a trained bank is re-indexed to whichever NEW bank has the
same lower bracket edge; unmatched new banks get a fresh init. The
result is a resumable `rems`-stage checkpoint: relaunch train_device
with the new --check_levels and only the fresh bank starts cold.

Usage:
  PYTHONPATH= JAX_PLATFORMS=cpu python tools/extend_rem_banks.py \
      artifacts/ckpt_r4_flagship runs/r5_flagship/rems \
      --check_levels 0.25 0.75
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def fresh_bank(model, seed: int):
    """Init ONE nn.vmap-stacked LatentRateReduction bank (the exact
    module construction of VarianceMaskingPICREM.setup, models/rem.py)."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from epic_tpu.ops import LatentRateReduction

    stacked = nn.vmap(
        LatentRateReduction,
        variable_axes={"params": 0},
        split_rngs={"params": True},
        in_axes=0, out_axes=0)
    mod = stacked(model.dim_chunk, model.mu_std, model.rem_dimension)
    s, c = model.ns0, model.dim_chunk
    y = jnp.zeros((s, 1, 4, 4, c))
    pb = jnp.zeros((s, 1, 4, 4, 2 * c))
    pp = jnp.zeros((s, 1, 4, 4, 2 * c if model.mu_std else c))
    att = jnp.ones_like(pp)
    return mod.init(jax.random.key(seed), y, pb, pp, att)["params"]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("src", help="trained REM checkpoint dir")
    p.add_argument("dst", help="output stage dir (e.g. runs/r5/rems)")
    p.add_argument("--check_levels", type=float, nargs="+", required=True)
    p.add_argument("--which", default="last")
    p.add_argument("--seed", type=int, default=7)
    args = p.parse_args(argv)

    import jax

    from epic_tpu.models import get_model
    from epic_tpu.training.checkpoint import load_checkpoint, save_checkpoint

    model, params, config, step = load_checkpoint(args.src, args.which)
    old = [float(c) for c in config["check_levels"]]
    new = [float(c) for c in args.check_levels]
    if not all(a < b for a, b in zip(new, new[1:])):
        raise SystemExit(f"check_levels must be increasing: {new}")

    config = dict(config, check_levels=new)
    name = config.pop("model", "rem")
    new_model = get_model(name, **{
        k: (tuple(v) if isinstance(v, list) else v)
        for k, v in config.items()})
    config["model"] = name

    params = dict(params)
    trained = {old[j]: params.pop(f"post_latent_{j}")
               for j in range(len(old)) if f"post_latent_{j}" in params}
    kept, cold = 0, 0
    for j, edge in enumerate(new):
        bank = trained.get(edge)
        if bank is not None:
            kept += 1
            src_shapes = jax.tree.map(lambda a: a.shape, bank)
        else:
            cold += 1
            bank = fresh_bank(new_model, args.seed + j)
        params[f"post_latent_{j}"] = bank
    if kept:
        # sanity: fresh banks must be shape-identical to trained ones
        for j in range(len(new)):
            got = jax.tree.map(lambda a: a.shape, params[f"post_latent_{j}"])
            if got != src_shapes:
                raise SystemExit(f"bank {j} shape mismatch vs trained bank")

    os.makedirs(args.dst, exist_ok=True)
    save_checkpoint(args.dst, params, config, step=0)
    print(f"wrote {args.dst}: check_levels {old} -> {new} "
          f"({kept} trained banks re-indexed, {cold} fresh), "
          f"src step {step}")

    run_dir = os.path.dirname(os.path.abspath(args.dst))
    prog = {"stage": "rems", "next_step": 1, "lr": None,
            "best_loss": None, "plateau": 0}
    with open(os.path.join(run_dir, "progress.json"), "w") as f:
        json.dump(prog, f)
    print(f"progress journal -> {run_dir}/progress.json (resume @ step 1)")


if __name__ == "__main__":
    main()
