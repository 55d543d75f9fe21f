"""Multi-host initialization (DCN) for pod-scale RD sweeps.

The reference has no distributed layer (SURVEY.md §2.8). TPU-native
recipe: jax.distributed.initialize() on every host, a global "data" mesh
over all chips, each host feeding its local shard of the image list; host
rANS workers run per-host on their local shards.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-host; no-op (returns
    False) in single-process settings. Env-var driven on TPU pods."""
    import jax

    if num_processes in (None, 1) and "JAX_COORDINATOR_ADDRESS" not in os.environ \
            and coordinator_address is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def local_shard(items: Sequence, process_index: Optional[int] = None,
                process_count: Optional[int] = None):
    """This host's contiguous shard of a global work list (images)."""
    import jax

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    n = len(items)
    per = (n + pc - 1) // pc
    return items[pi * per:(pi + 1) * per]
