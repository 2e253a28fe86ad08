"""Device-mesh parallelism: ray/pixel data-parallel sharding over ICI.

TPU-native replacement for the reference's two parallelism mechanisms
(SURVEY.md §2.7): PyTorch DDP (multi-process NCCL data parallel,
train.py:1405) and the single-process multi-GPU render_parallel scatter/gather
(render_parallel.py:28-320). Here both collapse into ONE pjit program:

  * mesh ``('data',)`` — ray batches sharded on the data axis, model params
    replicated; XLA inserts the gradient psum over ICI and overlaps it with
    the backward pass automatically.
  * multi-host: same code under ``jax.distributed.initialize`` — each process
    feeds its local shard (the DistributedWeightedRandomSampler analog is the
    per-host batch slice).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def shard_batch_spec(batch: Dict[str, Any], axis_name: str = "data") -> Dict[str, P]:
    """PartitionSpec tree: every batch leaf sharded on its leading (ray) axis."""
    return jax.tree.map(lambda _: P(axis_name), batch)


def replicated_spec(tree: Any) -> Any:
    return jax.tree.map(lambda _: P(), tree)


def make_sharded_train_step(trainer, mesh: Mesh, step_type: str = "pixel",
                            axis_name: str = "data", example_batch=None,
                            cam_id: Optional[str] = None):
    """Build the pjit'd data-parallel train step.

    Batch leaves are sharded on the ray axis; TrainState is replicated. XLA
    derives the psum for gradient reduction from the sharding constraints —
    the DDP-allreduce equivalent rides ICI fused into the backward
    (SURVEY.md §5 distributed row).

    The batch sharding spec is derived from ``example_batch``'s pytree (any
    step type / any key set — pixel, lidar, patch, pose-refinement batches
    with rays_xy/rays_fidx all shard on their leading ray axis). When
    ``example_batch`` is None the spec is resolved lazily from the first
    batch passed to the returned step.
    """

    def step(state, batch, key):
        return trainer.train_step(state, batch, key, step_type, cam_id)

    batch_sharding = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())

    def specs_for(batch):
        return jax.tree.map(lambda _: batch_sharding, batch)

    if example_batch is not None:
        return jax.jit(step,
                       in_shardings=(repl, specs_for(example_batch), repl),
                       out_shardings=(repl, repl))

    _cache: Dict[Tuple, Any] = {}

    def lazy_step(state, batch, key):
        sig = tuple(sorted(batch))
        if sig not in _cache:
            _cache[sig] = jax.jit(step,
                                  in_shardings=(repl, specs_for(batch), repl),
                                  out_shardings=(repl, repl))
        return _cache[sig](state, batch, key)

    return lazy_step


def make_sharded_render(renderer, mesh: Mesh, axis_name: str = "data", **query_kw):
    """pjit'd eval-render over sharded rays: the replacement for the
    reference's render_parallel scene replication (scatter rays / gather
    buffers becomes plain XLA SPMD)."""
    batch_sharding = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())

    def render(params, rays_o, rays_d):
        return renderer.ray_query(params, rays_o, rays_d, key=None, **query_kw)

    return jax.jit(render,
                   in_shardings=(repl, batch_sharding, batch_sharding),
                   out_shardings=batch_sharding)


def pad_to_multiple(x: jnp.ndarray, m: int, axis: int = 0):
    n = x.shape[axis]
    pad = (-n) % m
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, mode="edge"), n
