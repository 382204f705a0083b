"""Multi-host (multi-process) setup over DCN.

The reference is strictly single-process/single-IPU (SURVEY.md §4: "no
multi-IPU or multi-host code paths exist"); the north star requires N>=2
host scaling. JAX's model: one process per host, `jax.distributed`
bootstraps the cluster, `jax.devices()` then spans every host and the SAME
shard_map code from parallel/distributed.py runs unchanged — XLA routes the
all_gather/reduce_scatter over ICI within a slice and DCN across slices.

Typical launch (one command per host):

    python -m gaussian_splat_ipu_tpu.app.train --input scene.ply \
        --distributed   # after initialize() via GSPLAT_COORDINATOR env

Environment contract (when not running on Cloud TPU auto-detection):
    GSPLAT_COORDINATOR  host:port of process 0
    GSPLAT_NUM_PROCESSES, GSPLAT_PROCESS_ID
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax

log = logging.getLogger("gsplat")


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Bootstrap jax.distributed from args or GSPLAT_* env vars.

    Returns True when a multi-process cluster was initialised, False for
    the single-process fallback (no env set). Idempotent.
    """
    coordinator = coordinator or os.environ.get("GSPLAT_COORDINATOR")
    if coordinator is None:
        # On Cloud TPU pods jax.distributed can self-configure; only do so
        # when explicitly requested to keep single-host runs untouched.
        return False
    num_processes = num_processes or int(
        os.environ.get("GSPLAT_NUM_PROCESSES", "1"))
    process_id = process_id if process_id is not None else int(
        os.environ.get("GSPLAT_PROCESS_ID", "0"))
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    log.info("distributed: process %d/%d, %d global devices",
             process_id, num_processes, len(jax.devices()))
    return True


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0


def local_shard_bounds(n: int) -> tuple:
    """[lo, hi) of the gaussian axis owned by this process's devices,
    for loading only the local slice of a huge scene from disk."""
    nproc = jax.process_count()
    per = -(-n // nproc)
    lo = jax.process_index() * per
    return lo, min(lo + per, n)
