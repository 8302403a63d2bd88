r"""
Multi-host runtime helpers.

The reference spawns one process per GPU and rendezvouses over TCP/NCCL
(``virtex/utils/distributed.py:15-112``). On TPU there is no process
manager: each TPU host runs the same program, ``jax.distributed.initialize``
wires the hosts, and all cross-chip communication is XLA collectives over
ICI/DCN inserted from shardings (SURVEY §5.8). These helpers mirror the
reference's query/sync surface so scripts read the same.
"""
from __future__ import annotations

from typing import Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialise the multi-host runtime. No-op on a single host (mirrors the
    reference's no-op helpers without dist.init, ``distributed.py:115-137``).
    On TPU pods the arguments are auto-detected from the environment."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)
    else:
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-process / already initialised


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_master_process() -> bool:
    """True for exactly one process (rank 0), reference
    ``distributed.py:132-137``."""
    return jax.process_index() == 0


def synchronize() -> None:
    """Cross-host barrier, replaces ``dist.barrier()``."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("virtex_tpu_barrier")


def average_across_processes(
    t: Union[jnp.ndarray, Dict[str, jnp.ndarray]]
):
    """Mean over hosts (replaces all_reduce÷world,
    ``distributed.py:140-160``). For metrics computed inside jit over a
    sharded batch this is already done by XLA; use this only for host-side
    python scalars."""
    if jax.process_count() == 1:
        return t
    from jax.experimental import multihost_utils

    def avg(x):
        g = multihost_utils.process_allgather(jnp.asarray(x))
        return np.mean(np.asarray(g), axis=0)

    if isinstance(t, dict):
        return {k: avg(v) for k, v in t.items()}
    return avg(t)


def device_mem_usage_mb() -> float:
    """Peak device memory in MB (replaces ``gpu_mem_usage``,
    ``distributed.py:163-172``)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        return stats.get("peak_bytes_in_use", 0) / 2**20
    except Exception:
        return 0.0
