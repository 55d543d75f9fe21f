"""Mesh construction + data-parallel train/eval steps.

Pattern (the scaling-book recipe): build a 1-D "data" mesh over all chips,
replicate parameters, shard the batch on axis 0, and let XLA insert the
gradient all-reduce over ICI. No NCCL/MPI translation — the reference has
no distributed layer to translate (SURVEY.md §2.8).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.pic import VarianceMaskingPIC
from ..training.losses import CRITERIA
from ..training.stages import StagePlan
from ..training.state import TrainState


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(batch, sharding)


def make_parallel_train_step(model, plan: StagePlan, mesh: Mesh,
                             axis_name: str = "data") -> Callable:
    """Data-parallel version of training.step.make_train_step: params
    replicated, batch sharded on axis 0. Returns
    step(state, batch, rng, quality, lmbda) -> (state, metrics)."""
    criterion = CRITERIA[plan.criterion]
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis_name))

    if not plan.sampling:
        lmbda = jnp.asarray(plan.lmbda_list, jnp.float32)
        qualities = list(plan.list_quality)

        def _step(state: TrainState, batch, rng):
            def loss_fn(params):
                out = model.apply({"params": params}, batch, qualities,
                                  True, rngs={"noise": rng})
                d = criterion(out, batch, lmbda)
                return d["loss"], d

            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            state = state.apply_main(grads)
            aux_grads = jax.grad(lambda p: model.apply(
                {"params": p},
                method=VarianceMaskingPIC.aux_loss))(state.params)
            state = state.apply_aux(aux_grads)
            return state, metrics

        return jax.jit(_step,
                       in_shardings=(repl, data, repl),
                       out_shardings=(repl, repl))

    with_ckpt = plan.rems is not None

    def _step(state: TrainState, batch, rng, quality, lmbda_in,
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
        return state, metrics

    if with_ckpt:
        # rems: the extracted checkpoint latent is batch-like — sharded on
        # the data axis alongside the inputs it was extracted from
        return jax.jit(_step,
                       in_shardings=(repl, data, repl, repl, repl, data),
                       out_shardings=(repl, repl))
    return jax.jit(_step,
                   in_shardings=(repl, data, repl, repl, repl),
                   out_shardings=(repl, repl))


def make_parallel_ckpt_extractor(model, mesh: Mesh,
                                 axis_name: str = "data") -> Callable:
    """Data-parallel no-grad checkpoint-latent extraction for REM training
    (training.step.make_ckpt_extractor under the mesh): batch in, latent
    out, both sharded on the data axis."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis_name))

    def extract(params, batch, quality_ref):
        out = model.apply(
            {"params": params}, batch, quality_ref, False,
            method=VarianceMaskingPIC.forward_single_quality)
        return jax.lax.stop_gradient(out["y_hat"])

    return jax.jit(extract,
                   in_shardings=(repl, data, repl),
                   out_shardings=data)


def make_parallel_eval_step(model, mesh: Mesh,
                            axis_name: str = "data") -> Callable:
    """Data-parallel entropy-estimation eval: the RD-sweep workhorse
    (images x quality levels fan out across chips)."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis_name))

    def _eval(params, batch, quality):
        out = model.apply(
            {"params": params}, batch, quality, False,
            method=VarianceMaskingPIC.forward_single_quality)
        b, h, w, _ = batch.shape
        bits = sum(-jnp.log2(l).sum()
                   for l in jax.tree.leaves(out["likelihoods"]))
        mse = ((out["x_hat"] - batch) ** 2).mean(axis=(1, 2, 3))
        return out["x_hat"], bits / (b * h * w), mse

    return jax.jit(_eval,
                   in_shardings=(repl, data, repl),
                   out_shardings=(data, repl, data))
