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
    tx = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.multi_transform(
            {"train": optax.adam(learning_rate),
             "freeze": optax.set_to_zero()},
            _label_tree(mask)),
    )
    aux_tx = optax.multi_transform(
        {"train": optax.adam(aux_learning_rate),
         "freeze": optax.set_to_zero()},
        _label_tree(quantiles_mask(params)))
    return TrainState(step=0, params=params,
                      opt_state=tx.init(params),
                      aux_opt_state=aux_tx.init(params),
                      tx=tx, aux_tx=aux_tx)
