"""Multi-chip sharding of the batched executors.

The reference has no distributed backend at all (SURVEY.md section 2.8): its
scaling axes were CPU worker threads and CUDA streams.  Here the natural
parallel axis is the *gate batch*: every expensive stage is already a batch
of independent rows (bootstrap rows per level, key-switch rows, RAM write
chains over 2^a addresses), so multi-chip execution is data parallelism over
that axis with the evaluation keys replicated:

  * mesh axis "gates": bootstrap/KS batches sharded along rows; XLA inserts
    the all-gather back to the replicated wire-state array at scatter time
    (wire exchange between DAG levels rides ICI);
  * keys (bkntt, ksk, bk2ntt, pksk) replicated on every chip.

The engines call :func:`shard_batch` on their big batches; with no mesh
configured the constraint is a no-op, so single-chip and sharded execution
share one code path.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_active_mesh: Optional[Mesh] = None


def make_mesh(n_devices: Optional[int] = None, axis: str = "gates") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def set_mesh(mesh: Optional[Mesh]) -> None:
    global _active_mesh
    _active_mesh = mesh


def get_mesh() -> Optional[Mesh]:
    return _active_mesh


def shard_batch(x, axis: int = 0):
    """Constrain the leading (batch) axis to the 'gates' mesh axis."""
    mesh = _active_mesh
    if mesh is None:
        return x
    spec = [None] * x.ndim
    spec[axis] = "gates"
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec))
    )


def replicated(x):
    mesh = _active_mesh
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P()))
