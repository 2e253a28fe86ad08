"""Multi-host training setup: jax.distributed init + per-host data sharding.

TPU-native replacement for ``nr3d_lib.distributed`` (reference: init_env,
get_rank/get_local_rank/get_world_size/is_master over torch.distributed/NCCL
— SURVEY.md §2.9 distributed row, §5 comm-backend row). On TPU pods the
mesh spans all hosts' devices; each host feeds its shard of the global ray
batch and XLA's SPMD partitioner handles every collective over ICI/DCN.

Launch (one command per host, reference DDP-launch analog)::

    python -m neuralsim_tpu.tools.train --config ... \
        --distributed.coordinator=HOST0:1234 \
        --distributed.num_processes=N --distributed.process_id=i
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_env(coordinator: Optional[str] = None, num_processes: int = 1,
             process_id: int = 0) -> Dict[str, Any]:
    """Initialize multi-host JAX (no-op single-host). Returns rank info with
    the reference's field names."""
    if coordinator and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return {"rank": jax.process_index(),
            "local_rank": 0,
            "world_size": jax.process_count(),
            "is_master": jax.process_index() == 0}


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_master() -> bool:
    return jax.process_index() == 0


def global_mesh(axis_name: str = "data") -> Mesh:
    """One data mesh over every device of every host."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def host_local_batch_to_global(mesh: Mesh, batch, axis_name: str = "data"):
    """Assemble per-host batch shards into one global sharded array tree
    (each host supplies n_global / world_size rays — the
    DistributedWeightedRandomSampler analog)."""
    sharding = NamedSharding(mesh, P(axis_name))

    def put(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree.map(put, batch)
