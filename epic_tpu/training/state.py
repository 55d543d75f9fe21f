"""Training state: parameters + main/aux optimizers.

Reference behavior: utility/functions.py:23-59 (Adam lr 1e-4 over all
params except bottleneck quantiles; separate Adam lr 1e-3 for quantiles),
with grad-clip 1.0 (training/step.py:96) folded into the optax chain.
The aux optimizer actually steps here (the reference's never does, due to
the 'first_strain' typo at functions.py:56 — documented divergence).
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax import struct

from .stages import quantiles_mask, trainable_mask


class TrainState(struct.PyTreeNode):
    step: int
    params: Any
    opt_state: Any
    aux_opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    aux_tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_main(self, grads):
        updates, opt_state = self.tx.update(grads, self.opt_state,
                                            self.params)
        params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=params,
                            opt_state=opt_state)

    def apply_aux(self, grads):
        updates, aux_state = self.aux_tx.update(grads, self.aux_opt_state,
                                                self.params)
        params = optax.apply_updates(self.params, updates)
        return self.replace(params=params, aux_opt_state=aux_state)


def _label_tree(mask):
    """bool tree -> 'train'/'freeze' label tree for multi_transform.
    (optax.masked is NOT suitable: it passes un-masked updates through
    unchanged — i.e. raw gradients would be ADDED to frozen params.)"""
    return jax.tree_util.tree_map(
        lambda m: "train" if m else "freeze", mask)


def create_train_state(params, stage: str = "first_train",
                       learning_rate: float = 1e-4,
                       aux_learning_rate: float = 1e-3,
                       clip_norm: float = 1.0,
                       unfreeze_lrp: bool = False,
                       multiple_decoder: bool = True,
                       multiple_encoder: bool = True) -> TrainState:
    mask = trainable_mask(params, stage, unfreeze_lrp,
                          multiple_decoder, multiple_encoder)
    # inject_hyperparams makes the learning rate part of opt_state, so a
    # ReduceLROnPlateau-style LR drop (set_learning_rate below) preserves
    # the Adam moments — matching the reference's in-place scheduler
    # (train.py:130) instead of re-initializing the optimizer.
    # apply_if_finite: a single non-finite gradient otherwise poisons the
    # whole tree THROUGH clip_by_global_norm (inf norm -> 0*inf = NaN
    # scale -> NaN params; observed once at flagship step ~30.7k). Skipping
    # the bad step preserves the moments and training just continues; 20
    # consecutive bad steps means real divergence and propagates.
    tx = optax.apply_if_finite(optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.multi_transform(
            {"train": optax.inject_hyperparams(optax.adam)(learning_rate),
             "freeze": optax.set_to_zero()},
            _label_tree(mask)),
    ), max_consecutive_errors=20)
    aux_tx = optax.apply_if_finite(optax.multi_transform(
        {"train": optax.adam(aux_learning_rate),
         "freeze": optax.set_to_zero()},
        _label_tree(quantiles_mask(params))), max_consecutive_errors=20)
    return TrainState(step=0, params=params,
                      opt_state=tx.init(params),
                      aux_opt_state=aux_tx.init(params),
                      tx=tx, aux_tx=aux_tx)


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Return state with the main optimizer's learning rate replaced,
    keeping all Adam moments (ReduceLROnPlateau analog, reference
    train.py:130/279). Finds every inject_hyperparams state in the optax
    chain and overwrites its 'learning_rate' entry."""
    import jax.numpy as jnp

    def visit(node):
        hp = getattr(node, "hyperparams", None)
        if isinstance(hp, dict) and "learning_rate" in hp:
            hp = dict(hp)
            hp["learning_rate"] = jnp.asarray(
                lr, jnp.asarray(hp["learning_rate"]).dtype)
            return node._replace(hyperparams=hp)
        if isinstance(node, tuple):
            children = [visit(c) for c in node]
            if hasattr(node, "_fields"):      # NamedTuple state
                return type(node)(*children)
            return tuple(children)
        if isinstance(node, dict):
            return {k: visit(v) for k, v in node.items()}
        return node

    return state.replace(opt_state=visit(state.opt_state))


def get_learning_rate(state: TrainState) -> float:
    """Read the current main learning rate back out of opt_state."""
    found = []

    def visit(node):
        if hasattr(node, "hyperparams") and isinstance(
                getattr(node, "hyperparams"), dict) and \
                "learning_rate" in node.hyperparams:
            found.append(float(node.hyperparams["learning_rate"]))
            return
        if isinstance(node, tuple):
            for c in node:
                visit(c)
        elif isinstance(node, dict):
            for c in node.values():
                visit(c)

    visit(state.opt_state)
    return found[0] if found else float("nan")
