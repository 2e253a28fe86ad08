"""EMA occupancy grids + fixed-shape grid-skipping ray proposal.

TPU-native equivalent of ``nr3d_lib.models.accelerations`` (``OccGridAccel``,
``OccGridEma``, ``OccGridEmaBatched``, dynamic variants — SURVEY.md §2.9
accelerations row; config semantics: ``occ_val_fn_cfg {type: sdf, inv_s}``,
``occ_thre``, ``ema_decay``, ``n_steps_between_update`` per
withmask_withlidar_joint.240219.yaml:196-214 and App. D.4).

TPU translation (SURVEY.md §7): the CUDA grid-skipping marcher that emits
variable samples/ray becomes a two-phase static-shape proposal:
  1. probe ``march_steps`` fixed equidistant segments of [near, far],
  2. inverse-transform-sample the full budget from the per-segment
     occupancy CDF — every sample lands in occupied space.
Grid state is an explicit pytree member of the training state (donated and
updated under the step cadence), not a hidden module buffer.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..maths.common import normalized_logistic_density


class OccGridState(NamedTuple):
    """Occupancy grid pytree: values in [0,1] + derived boolean mask.

    val:  [R, R, R] (or [B, R, R, R] batched) EMA occupancy value
    mask: same shape, bool — val > occ_thre
    """
    val: jnp.ndarray
    mask: jnp.ndarray


class OccGridEma:
    """Single-instance EMA occupancy grid over an AABB space."""

    def __init__(self, space, resolution: int = 64, *, occ_thre: float = 0.3,
                 ema_decay: float = 0.95, occ_val_fn: str = "sdf",
                 occ_inv_s: float = 256.0, n_steps_between_update: int = 16,
                 n_warmup_steps: int = 256, init_occupied: bool = True,
                 march_steps: int = 64, samples_per_voxel: int = 1):
        self.space = space
        self.res = resolution
        self.occ_thre = occ_thre
        self.ema_decay = ema_decay
        self.occ_val_fn = occ_val_fn
        self.occ_inv_s = occ_inv_s
        self.n_steps_between_update = n_steps_between_update
        self.n_warmup_steps = n_warmup_steps
        self.init_occupied = init_occupied
        # probe count of the fixed-step proposal march (the step_size /
        # max_steps knob): step = (far-near)/march_steps
        self.march_steps = march_steps
        # jittered field samples per voxel per EMA update (max-reduced): a
        # single sample misses a thin surface crossing a large voxel with
        # high probability, so its EMA decays and the surface becomes
        # unmarchable (reference updates sample num_steps x num_pts)
        self.samples_per_voxel = max(int(samples_per_voxel), 1)

    # -- state ---------------------------------------------------------------
    def init_state(self) -> OccGridState:
        v = jnp.ones((self.res,) * 3) if self.init_occupied else jnp.zeros((self.res,) * 3)
        return OccGridState(val=v, mask=v > self.occ_thre)

    # -- occupancy value from the field --------------------------------------
    @property
    def voxel_half_diag(self) -> jnp.ndarray:
        """Half the world-space diagonal of one voxel."""
        return jnp.linalg.norm(
            (self.space.aabb_max - self.space.aabb_min) / (2.0 * self.res))

    def _occ_from_raw(self, out: jnp.ndarray) -> jnp.ndarray:
        if self.occ_val_fn == "sdf":
            # SDF -> peaked density proxy (reference occ_val_fn_cfg type:
            # sdf). Conservative voxel-radius erosion: a sampled point
            # within half a voxel diagonal of the zero level set registers
            # the PEAK value. Without this, a sharp occ_inv_s (band width
            # 1/inv_s << voxel size) means random samples in a genuinely
            # surface-crossing voxel almost never land inside the band, the
            # EMA decays below occ_thre, and the grid EVAPORATES mid-train
            # (VERDICT r4 item 6: the mixed-hash object run ended
            # occ_frac=0.0, silently uniform-marching). The SDF is metric
            # (eikonal-regularized), so the erosion is sound: it marks
            # exactly the voxels that can contain the surface.
            sd = jnp.maximum(jnp.abs(out) - self.voxel_half_diag, 0.0)
            return normalized_logistic_density(sd, self.occ_inv_s)
        if self.occ_val_fn == "density":
            dt = (self.space.aabb_max - self.space.aabb_min).max() / self.res
            return 1.0 - jnp.exp(-out * dt)
        raise ValueError(self.occ_val_fn)

    def _occ_val(self, query_fn: Callable, x: jnp.ndarray) -> jnp.ndarray:
        return self._occ_from_raw(query_fn(x))

    # -- EMA update -----------------------------------------------------------
    def update(self, state: OccGridState, query_fn: Callable, key, it
               ) -> OccGridState:
        """One EMA update: jitter one sample per voxel, take
        max(decay * old, new) (Instant-NGP style), rethreshold.

        Call under the trainer's cadence (`it % n_steps_between_update == 0`
        via lax.cond — reference updates every N steps with warmup)."""
        R = self.res
        S = self.samples_per_voxel
        idx = jnp.stack(jnp.meshgrid(*([jnp.arange(R)] * 3), indexing="ij"), -1)
        u = jax.random.uniform(key, (S,) + idx.shape)
        x01 = (idx[None] + u) / R
        x = self.space.unnormalize_coords(x01.reshape(-1, 3))
        val = self._occ_val(query_fn, x).reshape(S, R, R, R).max(axis=0)
        val = jax.lax.stop_gradient(val)
        new_val = jnp.maximum(state.val * self.ema_decay, val)
        # during warmup keep everything occupied so early training sees space
        warm = jnp.asarray(it) < self.n_warmup_steps
        new_val = jnp.where(warm, jnp.maximum(new_val, self.occ_thre + 1e-3), new_val)
        return OccGridState(val=new_val, mask=new_val > self.occ_thre)

    def maybe_update(self, state: OccGridState, query_fn: Callable, key, it
                     ) -> OccGridState:
        do = (jnp.asarray(it) % self.n_steps_between_update) == 0
        return jax.lax.cond(do,
                            lambda s: self.update(s, query_fn, key, it),
                            lambda s: s, state)

    # -- queries ---------------------------------------------------------------
    def occupancy_at(self, state: OccGridState, x: jnp.ndarray) -> jnp.ndarray:
        """bool occupancy at world points [..., 3] (False outside the box)."""
        x01 = self.space.normalize_coords(x)
        inside = jnp.all((x01 >= 0) & (x01 <= 1), axis=-1)
        cell = jnp.clip((x01 * self.res).astype(jnp.int32), 0, self.res - 1)
        occ = state.mask[cell[..., 0], cell[..., 1], cell[..., 2]]
        return occ & inside

    def _occ_probe_f(self, mask: jnp.ndarray, x: jnp.ndarray,
                     lead: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Float occupancy probe on the hot proposal path: one flat bf16
        1-D take instead of 3-D advanced indexing (4.97 -> 2.31 ms for
        8192x48 probes on the v5e, scripts/prof_march3.py). ``mask``: a
        [R,R,R] boolean grid, optionally with leading axes selected by
        ``lead`` (per-point instance/keyframe index)."""
        R = self.res
        x01 = self.space.normalize_coords(x)
        inside = jnp.all((x01 >= 0) & (x01 <= 1), axis=-1)
        cell = jnp.clip((x01 * R).astype(jnp.int32), 0, R - 1)
        lin = (cell[..., 0] * R + cell[..., 1]) * R + cell[..., 2]
        if lead is not None:
            lin = lead * (R * R * R) + lin
        flat = mask.reshape(-1).astype(jnp.bfloat16)
        occ = jnp.take(flat, lin.reshape(-1), mode="clip").reshape(lin.shape)
        return occ.astype(jnp.float32) * inside

    def occupied_fraction(self, state: OccGridState) -> jnp.ndarray:
        return jnp.mean(state.mask.astype(jnp.float32))

    # -- ray proposal (the marcher replacement) --------------------------------
    def ray_proposal(self, state: OccGridState, rays_o: jnp.ndarray,
                     rays_d: jnp.ndarray, near: jnp.ndarray, far: jnp.ndarray,
                     n_samples: int, key: Optional[jax.Array] = None,
                     march_steps: Optional[int] = None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Grid-marched occupancy-concentrated depth proposal.

        The TPU formulation of the reference's DDA grid-skipping marcher
        (``occ_grid`` accel with step_size/max_steps,
        withmask_withlidar_joint.240219.yaml:196-229), as a fixed-shape
        two-phase march:

          1. probe ``march_steps`` equidistant segments of [near, far]
             (step_size = (far-near)/march_steps — the marcher's step size,
             so march_steps doubles as max_steps);
          2. inverse-transform-sample ALL ``n_samples`` depths from the CDF of
             the per-segment occupancy — every sample lands inside an
             occupied segment (stratified within it), i.e. the effective
             sample spacing is occupied_length / n_samples, exactly what a
             DDA marcher with per-voxel subdivision achieves, minus the
             variable shapes.

        Returns (t [N, n_samples] ascending, valid [N, n_samples]). Rays with
        zero occupied probes fall back to uniform sampling (empty-grid warmup
        still renders); their ``valid`` stays True so early training sees
        space, matching the warmup-everything-occupied convention.
        """
        from ..ops.segment import sample_pdf
        N = rays_o.shape[0]
        M = march_steps or self.march_steps
        # probe segment midpoints
        edges01 = jnp.linspace(0.0, 1.0, M + 1)
        t_edges = near[:, None] + (far - near)[:, None] * edges01      # [N, M+1]
        t_mid = 0.5 * (t_edges[:, 1:] + t_edges[:, :-1])
        x = rays_o[:, None, :] + t_mid[..., None] * rays_d[:, None, :]
        occ = self._occ_probe_f(state.mask, x)                         # [N, M]
        hit_any = jnp.max(occ, axis=-1, keepdims=True) > 0.0

        # occupancy CDF -> all samples in occupied segments (tiny uniform
        # floor = the miss fallback within the same primitive). sample_pdf
        # draws stratified -> t comes back sorted; no post-sort.
        w = occ + (~hit_any) * 1.0
        t = sample_pdf(t_edges, w, n_samples, key=key, det=key is None,
                       eps=1e-6)
        valid = jnp.ones_like(t, dtype=bool)
        return t, valid


class OccGridEmaBatched(OccGridEma):
    """Per-instance batched occupancy grids ([B, R, R, R]) for categorical
    shared models (reference OccGridAccelBatched_Ema / occ_grid_batched_ema,
    batched_neus.py:321-365)."""

    def __init__(self, space, n_instances: int, resolution: int = 32, **kw):
        super().__init__(space, resolution, **kw)
        self.n_instances = n_instances

    def init_state(self) -> OccGridState:
        v = (jnp.ones if self.init_occupied else jnp.zeros)(
            (self.n_instances,) + (self.res,) * 3)
        return OccGridState(val=v, mask=v > self.occ_thre)

    def update(self, state: OccGridState, query_fn: Callable, key, it
               ) -> OccGridState:
        """query_fn(x, bidx) -> per-instance SDF/density at points."""
        R, B = self.res, self.n_instances
        idx = jnp.stack(jnp.meshgrid(*([jnp.arange(R)] * 3), indexing="ij"), -1)
        u = jax.random.uniform(key, (B,) + idx.shape)
        x01 = (idx[None] + u) / R
        x = self.space.unnormalize_coords(x01.reshape(B, -1, 3))
        bidx = jnp.broadcast_to(jnp.arange(B)[:, None], x.shape[:2])
        out = query_fn(x.reshape(-1, 3), bidx.reshape(-1))
        val = jax.lax.stop_gradient(
            self._occ_from_raw(out)).reshape(B, R, R, R)
        new_val = jnp.maximum(state.val * self.ema_decay, val)
        warm = jnp.asarray(it) < self.n_warmup_steps
        new_val = jnp.where(warm, jnp.maximum(new_val, self.occ_thre + 1e-3), new_val)
        return OccGridState(val=new_val, mask=new_val > self.occ_thre)

    def occupancy_at(self, state: OccGridState, x: jnp.ndarray,
                     bidx: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x01 = self.space.normalize_coords(x)
        inside = jnp.all((x01 >= 0) & (x01 <= 1), axis=-1)
        cell = jnp.clip((x01 * self.res).astype(jnp.int32), 0, self.res - 1)
        if bidx is None:
            bidx = jnp.zeros(x.shape[:-1], jnp.int32)
        occ = state.mask[bidx, cell[..., 0], cell[..., 1], cell[..., 2]]
        return occ & inside

    def ray_proposal_batched(self, state: OccGridState, rays_o: jnp.ndarray,
                             rays_d: jnp.ndarray, near: jnp.ndarray,
                             far: jnp.ndarray, n_samples: int,
                             bidx: jnp.ndarray, key: Optional[jax.Array] = None,
                             march_steps: Optional[int] = None
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Per-instance grid-marched proposal: same fixed-step occupancy-CDF
        march as the base class, reading each ray's own instance grid
        (reference occ_grid_batched_ema marcher)."""
        from ..ops.segment import sample_pdf
        M = march_steps or self.march_steps
        edges01 = jnp.linspace(0.0, 1.0, M + 1)
        t_edges = near[:, None] + (far - near)[:, None] * edges01
        t_mid = 0.5 * (t_edges[:, 1:] + t_edges[:, :-1])
        x = rays_o[:, None, :] + t_mid[..., None] * rays_d[:, None, :]
        occ = self._occ_probe_f(state.mask, x, lead=jnp.broadcast_to(
            bidx[:, None], t_mid.shape))
        hit_any = jnp.max(occ, axis=-1, keepdims=True) > 0.0
        w = occ + (~hit_any) * 1.0
        t = sample_pdf(t_edges, w, n_samples, key=key, det=key is None,
                       eps=1e-6)
        return t, jnp.ones_like(t, dtype=bool)


class OccGridEmaDynamic(OccGridEma):
    """Time-conditioned occupancy: one EMA grid per time keyframe
    ([K, R, R, R]) for dynamic fields (reference occ_grid_dynamic_ema /
    OccGridAccelDynamic — the r1 gap 'time axis not in grid'). Queries pick
    the nearest keyframe of the normalized time in [0, 1]."""

    def __init__(self, space, resolution: int = 32, *, n_keyframes: int = 8,
                 **kw):
        super().__init__(space, resolution, **kw)
        self.n_keyframes = n_keyframes

    def init_state(self) -> OccGridState:
        v = (jnp.ones if self.init_occupied else jnp.zeros)(
            (self.n_keyframes,) + (self.res,) * 3)
        return OccGridState(val=v, mask=v > self.occ_thre)

    def _kf(self, t01: jnp.ndarray) -> jnp.ndarray:
        return jnp.clip((t01 * self.n_keyframes).astype(jnp.int32),
                        0, self.n_keyframes - 1)

    def update(self, state: OccGridState, query_fn: Callable, key, it
               ) -> OccGridState:
        """query_fn(x, t01) -> sdf/density at points for normalized time."""
        R, K = self.res, self.n_keyframes
        idx = jnp.stack(jnp.meshgrid(*([jnp.arange(R)] * 3), indexing="ij"), -1)
        u = jax.random.uniform(key, (K,) + idx.shape)
        x01 = (idx[None] + u) / R
        x = self.space.unnormalize_coords(x01.reshape(K, -1, 3))
        t01 = (jnp.arange(K, dtype=jnp.float32) + 0.5) / K
        t = jnp.broadcast_to(t01[:, None], x.shape[:2])
        out = query_fn(x.reshape(-1, 3), t.reshape(-1))
        val = jax.lax.stop_gradient(
            self._occ_from_raw(out)).reshape(K, R, R, R)
        new_val = jnp.maximum(state.val * self.ema_decay, val)
        warm = jnp.asarray(it) < self.n_warmup_steps
        new_val = jnp.where(warm, jnp.maximum(new_val, self.occ_thre + 1e-3),
                            new_val)
        return OccGridState(val=new_val, mask=new_val > self.occ_thre)

    def occupancy_at(self, state: OccGridState, x: jnp.ndarray,
                     t01: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x01 = self.space.normalize_coords(x)
        inside = jnp.all((x01 >= 0) & (x01 <= 1), axis=-1)
        cell = jnp.clip((x01 * self.res).astype(jnp.int32), 0, self.res - 1)
        kf = (jnp.zeros(x.shape[:-1], jnp.int32) if t01 is None
              else self._kf(jnp.broadcast_to(t01, x.shape[:-1])))
        occ = state.mask[kf, cell[..., 0], cell[..., 1], cell[..., 2]]
        return occ & inside

    def ray_proposal_dynamic(self, state: OccGridState, rays_o, rays_d,
                             near, far, n_samples: int, t01: jnp.ndarray,
                             key: Optional[jax.Array] = None,
                             march_steps: Optional[int] = None):
        """Per-ray-time grid-marched proposal (t01: [N] normalized times)."""
        from ..ops.segment import sample_pdf
        M = march_steps or self.march_steps
        edges01 = jnp.linspace(0.0, 1.0, M + 1)
        t_edges = near[:, None] + (far - near)[:, None] * edges01
        t_mid = 0.5 * (t_edges[:, 1:] + t_edges[:, :-1])
        x = rays_o[:, None, :] + t_mid[..., None] * rays_d[:, None, :]
        kf = self._kf(jnp.broadcast_to(t01[:, None], t_mid.shape))
        occ = self._occ_probe_f(state.mask, x, lead=kf)
        hit_any = jnp.max(occ, axis=-1, keepdims=True) > 0.0
        w = occ + (~hit_any) * 1.0
        t = sample_pdf(t_edges, w, n_samples, key=key, det=key is None,
                       eps=1e-6)
        return t, jnp.ones((rays_o.shape[0], n_samples), bool)
