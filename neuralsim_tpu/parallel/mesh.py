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
                            cam_id: Optional[str] = None,
                            advance_it: bool = True):
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
        return trainer.train_step(state, batch, key, step_type, cam_id,
                                  advance_it)

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


class ShardedTrainer:
    """Drop-in data-parallel wrapper for a Trainer/MultiObjectTrainer.

    Exposes the same ``train_step(state, batch, key, step_type, cam_id)``
    surface the CLI drivers call, but routes every (step_type, cam_id, batch
    signature) through its own pjit'd sharded step over ``mesh`` — this is
    how ``training.data_parallel: true`` in the YAML turns the single-chip
    training loop into the DDP equivalent (reference train.py:1405 NCCL DDP;
    here one SPMD program whose gradient psum rides ICI)."""

    def __init__(self, trainer, mesh: Optional[Mesh] = None,
                 axis_name: str = "data"):
        self.trainer = trainer
        self.mesh = mesh if mesh is not None else make_mesh()
        self.axis_name = axis_name
        self.n_devices = self.mesh.devices.size
        self._steps: Dict[Tuple, Any] = {}

    def __getattr__(self, name):
        # defer everything else (compute_losses, renderer, ...) to the trainer
        return getattr(self.trainer, name)

    def train_step(self, state, batch, key, step_type: str = "pixel",
                   cam_id: Optional[str] = None, advance_it: bool = True):
        lead = {k: v.shape[0] for k, v in batch.items()
                if hasattr(v, "shape") and v.ndim >= 1}
        bad = {k: n for k, n in lead.items() if n % self.n_devices}
        if bad:
            raise ValueError(
                f"data_parallel: batch axes {bad} not divisible by "
                f"{self.n_devices} devices — round training.n_rays/"
                f"n_rays_lidar/patch sizes to a multiple of the device count")
        sig = (step_type, cam_id, advance_it)
        if sig not in self._steps:
            self._steps[sig] = make_sharded_train_step(
                self.trainer, self.mesh, step_type,
                axis_name=self.axis_name, cam_id=cam_id,
                advance_it=advance_it)
        return self._steps[sig](state, batch, key)


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


class ShardedRenderer:
    """Data-parallel eval rendering for a SingleVolumeRenderer-like object:
    the product wiring of the reference's ``render_parallel`` scene-replication
    path (render_parallel.py:28-320 + ``EvalParallelWrapper``,
    single_volume_renderer.py:556-565). Rays shard over the mesh inside one
    pjit'd ``ray_query``; a host-side chunk loop bounds memory exactly like
    ``render_chunked``. Models replicate (they fit on-chip), so no scene
    scatter/gather machinery is needed — XLA SPMD splits the rays."""

    _DROP = ("vw", "sigma_dynamic_cr", "per_src", "merged_buffer",
             "details_cr", "rendered_cr", "rendered_dv")

    def __init__(self, renderer, mesh: Optional[Mesh] = None,
                 axis_name: str = "data"):
        self.renderer = renderer
        self.mesh = mesh if mesh is not None else make_mesh()
        self.axis_name = axis_name
        self.n_devices = self.mesh.devices.size
        self._jits: Dict[Tuple, Any] = {}

    def __getattr__(self, name):
        return getattr(self.renderer, name)

    def _sharded_query(self, static_kw: Dict[str, Any], with_cond: bool,
                       with_occ: bool):
        sig = (repr(sorted(static_kw.items(), key=lambda kv: kv[0])),
               with_cond, with_occ)
        if sig not in self._jits:
            shard = NamedSharding(self.mesh, P(self.axis_name))
            repl = NamedSharding(self.mesh, P())

            def query(params, ro, rd, cond, occ):
                kw = dict(static_kw)
                if cond is not None:
                    kw["cond"] = cond
                if occ is not None:
                    kw["occ_states"] = occ
                r = self.renderer.ray_query(params, ro, rd, key=None, **kw)
                for k in self._DROP:
                    r.pop(k, None)
                return r

            self._jits[sig] = jax.jit(
                query,
                in_shardings=(repl, shard, shard,
                              repl if with_cond else None,
                              repl if with_occ else None),
                out_shardings=shard)
        return self._jits[sig]

    def render_chunked(self, params, rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                       *, rayschunk: int = 4096, key=None, cond=None,
                       occ_states=None, **kw):
        static_kw = {k: v for k, v in kw.items() if v is not None}
        n = rays_o.shape[0]
        chunk = -(-rayschunk // self.n_devices) * self.n_devices
        pad = (-n) % chunk
        ro = jnp.concatenate([rays_o, jnp.ones((pad, 3), rays_o.dtype)], 0)
        rd = jnp.concatenate([rays_d, jnp.ones((pad, 3), rays_d.dtype)], 0)
        fn = self._sharded_query(static_kw, cond is not None,
                                 occ_states is not None)
        if occ_states is not None:
            repl = NamedSharding(self.mesh, P())
            occ_states = jax.device_put(occ_states, repl)
        outs = []
        for i in range(0, ro.shape[0], chunk):
            outs.append(fn(params, ro[i:i + chunk], rd[i:i + chunk],
                           (jnp.broadcast_to(cond, (chunk, cond.shape[-1]))
                            if cond is not None else None), occ_states))
        out = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *outs)
        return jax.tree.map(lambda x: x[:n], out)


def pad_to_multiple(x: jnp.ndarray, m: int, axis: int = 0):
    n = x.shape[axis]
    pad = (-n) % m
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, mode="edge"), n
