"""Multi-chip scaling via jax.sharding meshes.

The reference is single-device (SURVEY.md §2.8: no distributed backend at
all); parallelism here is designed TPU-first: data parallelism over images
(and quality levels) on an ICI mesh — params replicated, batch sharded,
XLA inserts the gradient psum. Multi-host sweeps ride jax.distributed.
"""

from .mesh import (
    make_mesh,
    replicate,
    shard_batch,
    make_parallel_train_step,
    make_parallel_eval_step,
    make_parallel_ckpt_extractor,
)
from .distributed import init_multihost, local_shard

__all__ = [
    "make_mesh",
    "replicate",
    "shard_batch",
    "make_parallel_train_step",
    "make_parallel_eval_step",
    "make_parallel_ckpt_extractor",
    "init_multihost",
    "local_shard",
]
