"""Multi-host helpers.

The algorithm needs no cross-sample communication (SURVEY.md §2.3), so
multi-host scale is: initialize the distributed runtime, shard the seed
batch across all hosts' devices over DCN+ICI, and gather the finished
images back to host 0 for artifact writing. These helpers wrap the standard
JAX APIs so the frontends stay host-count agnostic.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax


def initialize(coordinator_address: Optional[str] = None, num_processes: Optional[int] = None, process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed when running multi-host; no-op single-host."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_primary() -> bool:
    return jax.process_index() == 0


def _allgather_to_numpy(tree):
    from jax.experimental import multihost_utils

    # tiled: concatenate shards along axis 0 instead of stacking a process
    # axis — global batch-sharded [B, ...] arrays come back as full [B, ...]
    # on every host (and it is required for non-fully-addressable arrays)
    return jax.tree_util.tree_map(
        np.asarray, multihost_utils.process_allgather(tree, tiled=True)
    )


def to_host(tree):
    """Materialize a (possibly globally sharded) array pytree on this host.

    Single-process: one batched device->host pull (per-leaf np.asarray costs
    a tunnel roundtrip per leaf on remote-attached TPUs). Multi-process:
    every host gathers the full arrays over DCN so artifact writing on the
    primary sees all samples (runner.generate_batch routes its outputs
    through this)."""
    if jax.process_count() > 1:
        return _allgather_to_numpy(tree)
    return jax.device_get(tree)


def gather_to_host(x) -> np.ndarray:
    """All-gather a globally sharded array's data onto every host as numpy
    (DCN collective; used to collect per-seed images for artifact output)."""
    return _allgather_to_numpy(x)


def local_batch_slice(global_batch: int) -> slice:
    """This process's slice of a [global_batch, ...] leading axis when the
    batch is evenly sharded across processes."""
    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
