"""Multi-host initialization.

The reference is strictly single-process (SURVEY.md section 2.8); scaling
beyond one host here follows the standard jax recipe: call
:func:`initialize` once per process, then build the global mesh -- the
gate-batch axis spans every chip in the slice, wire exchange between DAG
levels rides ICI within a host slice and DCN across hosts via the
all-gathers XLA inserts at the replicated-state scatters.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-var fallbacks.

    On Cloud TPU pods the arguments auto-detect; elsewhere set
    IYOKAN_COORDINATOR / IYOKAN_NUM_PROCESSES / IYOKAN_PROCESS_ID.
    """
    kwargs = {}
    addr = coordinator_address or os.environ.get("IYOKAN_COORDINATOR")
    if addr:
        kwargs["coordinator_address"] = addr
    npn = num_processes or os.environ.get("IYOKAN_NUM_PROCESSES")
    if npn:
        kwargs["num_processes"] = int(npn)
    pid = process_id if process_id is not None else os.environ.get(
        "IYOKAN_PROCESS_ID"
    )
    if pid is not None:
        kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)


def global_mesh(axis: str = "gates"):
    """Mesh over every device in the (multi-host) job."""
    from .mesh import make_mesh

    return make_mesh(axis=axis)
