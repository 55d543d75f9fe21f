"""Training driver — the 4-stage curriculum orchestrator.

Reference behavior: src/train.py:22-394. Stages: first_train (multi-quality
R-D) -> refine_gs (decoder fine-tune, sampled qualities) -> refine_gs_ga
(enc+dec, log-spaced lambda schedule) -> rems (rate-only REM training with
checkpoint-latent extraction). Per-epoch: train, entropy-estimation
validation, periodic real-codec eval (compress_with_ac), RD plots,
best/last checkpoints with config embedded.

Usage: python -m epic_tpu.cli.train --training_type first_train \
    --training_dataset ... --test_dataset ... --save_path ...
"""

from __future__ import annotations

import os
import sys
import time
from typing import Optional

import numpy as np


def main(argv=None):
    import os as _os

    import jax

    try:  # persistent XLA compile cache (first-run compiles are minutes)
        jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                            _os.path.expanduser("~/.jax_compile_cache")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from ..data import ImageFolder, TestImageDataset, data_loader
    from ..models import get_model
    from ..training import (compress_with_ac, create_train_state,
                            load_checkpoint, make_eval_step, make_stage,
                            make_train_step, save_checkpoint, test_epoch,
                            valid_epoch)
    from ..training.step import (extract_quality_ref, make_ckpt_extractor,
                                 make_valid_loss_step)
    from ..training.state import set_learning_rate
    from ..codec import PICCodec
    from ..utils.parser import model_config_from_args, parse_train_args
    from ..utils.plot import plot_rate_distortion

    args = parse_train_args(argv)
    rng = jax.random.key(args.seed)
    np_rng = np.random.default_rng(args.seed)

    # ---- model: from checkpoint config or from args (train.py:91-123) ----
    if args.checkpoint != "none":
        overrides = {}
        if args.model == "rem":
            overrides = {"model": "rem",
                         "check_levels": tuple(args.check_levels),
                         "mu_std": args.mu_std,
                         "rem_dimension": args.dimension}
        model, params, cfg, start_step = load_checkpoint(
            args.checkpoint, config_overrides=overrides,
            disable_rems_if_missing=False)
        if args.model == "rem" and "post_latent_0" not in params:
            # PIC -> REM stage transition: fresh-init the REM banks, merge
            # the trained parent weights in (rem_pic.py:66-78 analog)
            from ..training import merge_params

            dummy = jnp.zeros((1, 64, 64, 3))
            rng, init_rng, noise_rng = jax.random.split(rng, 3)
            fresh = model.init({"params": init_rng, "noise": noise_rng},
                               dummy, method="init_all")["params"]
            params = merge_params(fresh, params)
            print("initialized REM banks fresh; merged parent weights")
    else:
        cfg = model_config_from_args(args)
        model = get_model(args.model, **cfg)
        cfg["model"] = args.model
        dummy = jnp.zeros((1, args.patch_size, args.patch_size, 3))
        rng, init_rng, noise_rng = jax.random.split(rng, 3)
        variables = model.init({"params": init_rng, "noise": noise_rng},
                               dummy, method="init_all")
        params = variables["params"]
        if args.checkpoint_base != "none":
            # stage transition: load matching subtrees from a base
            # checkpoint (functions.py:107-164 analog — names match, so a
            # partial merge suffices)
            _, base_params, _, _ = load_checkpoint(args.checkpoint_base)
            params = _merge_matching(params, base_params)
        start_step = 0

    # ---- stage plan / state ----
    plan = make_stage(args.training_type, tuple(args.lmbda_list),
                      tuple(args.check_levels), tuple(args.check_levels_np),
                      unfreeze_lrp=args.lrp)
    state = create_train_state(
        params, args.training_type, args.learning_rate,
        args.aux_learning_rate, args.clip_max_norm, args.lrp,
        model.multiple_decoder, model.multiple_encoder)
    train_step = make_train_step(model, plan)
    eval_step = make_eval_step(model)
    valid_loss_step = make_valid_loss_step(model, plan)
    ckpt_extractor = make_ckpt_extractor(model) if plan.rems else None

    # ---- data ----
    train_set = ImageFolder(args.training_dataset, "train", args.patch_size,
                            args.num_images)
    train_set, valid_set = _validation_split(
        train_set, args.training_dataset, args.patch_size,
        args.num_images_val)
    test_set = TestImageDataset(args.test_dataset)

    best_loss = float("inf")
    lr = args.learning_rate
    plateau = 0
    save_dir = os.path.join(args.save_path, args.training_type)

    for epoch in range(args.epochs):
        t0 = time.time()
        meters = {}
        loader = data_loader(train_set, args.batch_size,
                             seed=args.seed + epoch,
                             steps=args.steps_per_epoch)
        for batch in loader:
            rng, noise_rng = jax.random.split(rng)
            batch = jnp.asarray(batch)
            if plan.sampling:
                qi = int(np_rng.integers(len(plan.list_quality)))
                q = float(plan.list_quality[qi])
                lm = (float(plan.lmbda_schedule[qi])
                      if plan.lmbda_schedule is not None else
                      float(plan.lmbda_list[-1]))
                ckpt_lat = None
                if ckpt_extractor is not None:
                    qref = extract_quality_ref(q, plan.rems)
                    ckpt_lat = ckpt_extractor(state.params, batch,
                                              jnp.float32(qref))
                state, metrics = train_step(state, batch, noise_rng,
                                            jnp.float32(q), jnp.float32(lm),
                                            ckpt_lat)
            else:
                state, metrics = train_step(state, batch, noise_rng)
            for k in ("loss", "bpp_loss", "bpp_hype", "aux_loss"):
                if k in metrics:
                    meters.setdefault(k, []).append(float(metrics[k]))

        train_loss = float(np.mean(meters.get("loss", [np.nan])))

        # validation (entropy estimation)
        vbatches = data_loader(valid_set, args.valid_batch_size,
                               seed=1234, steps=4)
        val = valid_epoch(eval_step, state.params, vbatches,
                          loss_step=valid_loss_step)
        # plateau steps on the stage criterion's validation loss
        # (reference: lr_scheduler.step(loss), train.py:279)
        val_loss = val["loss"]
        print(f"epoch {epoch}: train loss {train_loss:.4f} | "
              f"valid bpp {np.mean(val['bpp']):.4f} "
              f"psnr {np.mean(val['psnr']):.2f} | "
              f"{time.time()-t0:.0f}s", flush=True)

        # ReduceLROnPlateau analog (train.py:130, factor 0.3)
        if val_loss < best_loss - 1e-6:
            best_loss = val_loss
            plateau = 0
            is_best = True
        else:
            plateau += 1
            is_best = False
            if plateau > args.patience:
                lr *= args.lr_factor
                plateau = 0
                # in-place LR drop: Adam moments survive (ReduceLROnPlateau
                # analog; reference train.py:130)
                state = set_learning_rate(state, lr)
                print(f"  lr -> {lr:.2e}")

        save_checkpoint(save_dir, state.params, cfg,
                        step=start_step + (epoch + 1), is_best=is_best)

        # periodic real-codec eval + RD plot (train.py:310-356)
        if (epoch + 1) % args.eval_every == 0 or epoch == args.epochs - 1:
            codec = PICCodec(model, {"params": state.params})
            imgs = [img for img, _ in list(test_set)[:4]]
            real = compress_with_ac(
                codec, imgs, pr_list=(0, 0.5, 1, 2, 5, 10),
                check_levels=plan.rems,
                compute_ms_ssim=(imgs[0].shape[0] >= 176
                                 and imgs[0].shape[1] >= 176))
            est = test_epoch(eval_step, state.params,
                             [i[None] if i.ndim == 3 else i for i in imgs])
            print(f"  real-codec bpp {real['bpp']} psnr {real['psnr']}")
            plot_rate_distortion(
                {"epic_tpu (real)": real, "epic_tpu (est)": est},
                os.path.join(save_dir, f"rd_epoch{epoch}.png"))

    print("training done")


def _validation_split(train_set, training_dataset: str, patch_size: int,
                      num_images_val: Optional[int]):
    """Return (train_set, valid_set). Prefers the dataset's own 'test'
    split; without one, carves a deterministic holdout (last ~10%, capped
    at 64 images) off the train list so plateau/best-checkpoint signals
    come from unseen data instead of the train set."""
    from ..data import ImageFolder

    try:
        return train_set, ImageFolder(training_dataset, "test", patch_size,
                                      num_images_val)
    except FileNotFoundError:
        pass
    if len(train_set.paths) >= 2:
        import copy

        n_hold = max(1, min(len(train_set.paths) // 10, 64))
        valid_set = copy.copy(train_set)
        valid_set.paths = train_set.paths[-n_hold:]
        train_set.paths = train_set.paths[:-n_hold]
        print(f"WARNING: no 'test' split under {training_dataset}; held "
              f"out the last {n_hold} train image(s) for validation",
              file=sys.stderr, flush=True)
        return train_set, valid_set
    print(f"WARNING: no 'test' split under {training_dataset} and only "
          "one train image; validating on the TRAIN set "
          "(plateau/best-checkpoint signals will be optimistic)",
          file=sys.stderr, flush=True)
    return train_set, train_set


def _merge_matching(params, base_params):
    """Copy values from base_params for every path that exists in both with
    the same shape (stage-transition init, functions.py:107-164 analog)."""
    import jax

    flat_new = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_base = dict(jax.tree_util.tree_flatten_with_path(base_params)[0])
    merged = {
        p: (flat_base[p] if p in flat_base
            and flat_base[p].shape == v.shape else v)
        for p, v in flat_new.items()
    }
    treedef = jax.tree_util.tree_structure(params)
    # rebuild in original flatten order
    leaves = [merged[p] for p, _ in
              jax.tree_util.tree_flatten_with_path(params)[0]]
    return jax.tree_util.tree_unflatten(treedef, leaves)


if __name__ == "__main__":
    main(sys.argv[1:])
