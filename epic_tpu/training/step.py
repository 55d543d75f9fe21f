"""Jitted train/eval steps and epoch loops.

Reference behavior: src/training/step.py (train_one_epoch, valid_epoch,
test_epoch). TPU-native differences: one compiled step per stage (sampled
quality and lambda enter as traced scalars, so the ~250-point quality grids
do NOT retrigger compilation); gradient clipping and freezing live in the
optax chain; the noise rng is explicit.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.pic import VarianceMaskingPIC
from .losses import CRITERIA
from .stages import StagePlan
from .state import TrainState


def make_train_step(model, plan: StagePlan) -> Callable:
    """Returns step(state, batch, rng, quality, lmbda, checkpoint_ref)
    -> (state, metrics). For multi-quality stages quality/lmbda are ignored
    (baked in); for sampling stages they are traced scalars."""
    criterion = CRITERIA[plan.criterion]

    if not plan.sampling:
        lmbda = jnp.asarray(plan.lmbda_list, jnp.float32)
        qualities = list(plan.list_quality)

        @jax.jit
        def step(state: TrainState, batch, rng, quality=None,
                 lmbda_in=None, checkpoint_ref=None):
            def loss_fn(params):
                out = model.apply({"params": params}, batch, qualities,
                                  True, rngs={"noise": rng})
                d = criterion(out, batch, lmbda)
                return d["loss"], d

            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            state = state.apply_main(grads)
            aux_grads = jax.grad(lambda p: model.apply(
                {"params": p}, method=VarianceMaskingPIC.aux_loss))(
                    state.params)
            state = state.apply_aux(aux_grads)
            metrics["aux_loss"] = model.apply(
                {"params": state.params},
                method=VarianceMaskingPIC.aux_loss)
            return state, metrics

        return step

    @jax.jit
    def step(state: TrainState, batch, rng, quality, lmbda_in,
             checkpoint_ref=None):
        def loss_fn(params):
            out = model.apply(
                {"params": params}, batch, quality, True, None,
                checkpoint_ref, rngs={"noise": rng},
                method=VarianceMaskingPIC.forward_single_quality)
            d = criterion(out, batch, lmbda_in)
            return d["loss"], d

        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_main(grads)
        aux_grads = jax.grad(lambda p: model.apply(
            {"params": p}, method=VarianceMaskingPIC.aux_loss))(state.params)
        state = state.apply_aux(aux_grads)
        metrics["aux_loss"] = model.apply(
            {"params": state.params}, method=VarianceMaskingPIC.aux_loss)
        return state, metrics

    return step


def make_ckpt_extractor(model) -> Callable:
    """No-grad checkpoint-latent extraction for REM training (reference:
    step.py:62-79 + rem_pic.ExtractChekpointRepr). quality_ref is traced."""
    @jax.jit
    def extract(params, batch, quality_ref):
        out = model.apply(
            {"params": params}, batch, quality_ref, False,
            method=VarianceMaskingPIC.forward_single_quality)
        return jax.lax.stop_gradient(out["y_hat"])

    return extract


def extract_quality_ref(quality: float,
                        check_levels: Sequence[float]) -> float:
    """Checkpoint level bracketing a sampled quality (reference:
    step.py:13-30 / rem_pic.find_check_quality)."""
    c = list(check_levels)
    if quality <= c[0]:
        return 0.0
    for j in range(len(c) - 1):
        if c[j] < quality <= c[j + 1]:
            return c[j]
    return c[-1]


def make_eval_step(model, static_quality=None) -> Callable:
    """eval(params, batch, quality) -> (x_hat, bpp_total, mse). quality is
    traced; one compile covers any quality grid. static_quality pins the
    forward to one python-float quality and ignores the traced argument —
    single-quality models (WACNN) take the static base-only path, which a
    traced quality cannot reach."""
    @jax.jit
    def evaluate(params, batch, quality):
        q = quality if static_quality is None else float(static_quality)
        out = model.apply(
            {"params": params}, batch, q, False,
            method=VarianceMaskingPIC.forward_single_quality)
        b, h, w, _ = batch.shape
        npix = b * h * w
        bits = sum(-jnp.log2(l).sum()
                   for l in jax.tree.leaves(out["likelihoods"]))
        mse = ((out["x_hat"] - batch) ** 2).mean(axis=(1, 2, 3))
        return out["x_hat"], bits / npix, mse

    return evaluate


def make_valid_loss_step(model, plan: StagePlan,
                         static_quality=None) -> Callable:
    """valid(params, batch, quality) -> stage-criterion loss (scalar).
    The plateau scheduler steps on this, matching the reference's
    lr_scheduler.step(criterion loss) at train.py:279."""
    criterion = CRITERIA[plan.criterion]
    lmbda = jnp.float32(plan.lmbda_list[-1])

    @jax.jit
    def valid(params, batch, quality):
        q = quality if static_quality is None else float(static_quality)
        out = model.apply(
            {"params": params}, batch, q, False,
            method=VarianceMaskingPIC.forward_single_quality)
        return criterion(out, batch, lmbda)["loss"]

    return valid


def _psnr(mse: np.ndarray) -> np.ndarray:
    return -10.0 * np.log10(np.maximum(mse, 1e-12))


def valid_epoch(eval_step, params, batches,
                pr_list: Sequence[float] = (0.76, 1, 1.25, 2, 3, 5, 10),
                loss_step=None):
    """Entropy-estimation validation sweep (reference: step.py:137-204;
    default grid train.py:275). Returns dict of per-level lists; when a
    loss_step (make_valid_loss_step) is given, also the mean stage-criterion
    loss under 'loss'."""
    bpp = np.zeros(len(pr_list))
    psnr = np.zeros(len(pr_list))
    losses = []
    n = 0
    for batch in batches:
        batch = jnp.asarray(batch)
        for k, q in enumerate(pr_list):
            _, b, mse = eval_step(params, batch, jnp.float32(q))
            bpp[k] += float(b)
            psnr[k] += float(_psnr(np.asarray(mse)).mean())
            if loss_step is not None:
                losses.append(float(loss_step(params, batch,
                                              jnp.float32(q))))
        n += 1
    n = max(n, 1)
    out = {"bpp": (bpp / n).tolist(), "psnr": (psnr / n).tolist(),
           "pr_list": list(pr_list)}
    if losses:
        out["loss"] = float(np.mean(losses))
    return out


# the 15-level grid the reference evaluates on (train.py:189,282)
TEST_PR_LIST = (0, 0.05, 0.1, 0.25, 0.5, 0.6, 0.75, 1, 1.25, 2, 2.5, 3,
                3.5, 5, 10)


def test_epoch(eval_step, params, batches,
               pr_list: Sequence[float] = TEST_PR_LIST):
    """Entropy-estimated RD over the standard 15-level grid (reference:
    step.py:206-243)."""
    return valid_epoch(eval_step, params, batches, pr_list)
