"""EmerNeRF: self-supervised static + dynamic (+ flow) decomposition field.

TPU-native re-design of the reference's EmerNeRF street models
(``EmerNerfStreet`` / ``EmerNerfStreetOnlyDynamic``, app/models/single/
dynamic_nerf.py:23,93, backed by ``nr3d_lib...EmerNeRFModel`` — SURVEY.md
§2.2/§2.9): a static density field plus a time-conditioned dynamic field
whose densities add; emergent decomposition comes from the dynamic branch's
sparsity. An optional scene-flow head predicts forward/backward offsets for
cycle-consistency supervision (reference FlowLoss, app/loss/flow.py:21).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .blocks import MLP
from .embedders import get_embedder
from .encodings.lotd import make_lotd
from .encodings.permuto import PermutoEncoding
from .spatial import AABBSpace
from ..ops.segment import tau_to_alpha

Params = Dict[str, Any]


class EmerNeRFField:
    def __init__(self, space: AABBSpace = None, *,
                 static_encoding_cfg: Optional[Dict] = None,
                 dynamic_permuto_cfg: Optional[Dict] = None,
                 geo_feat_dim: int = 15, decoder_hidden: int = 64,
                 radiance_hidden: int = 64, sh_degree: int = 4,
                 with_flow: bool = True, only_dynamic: bool = False):
        self.space = space or AABBSpace()
        self.only_dynamic = only_dynamic
        self.with_flow = with_flow
        self.use_time = True  # trainers derive cond from rays_fidx

        if not only_dynamic:
            self.static_enc = make_lotd(static_encoding_cfg or
                                        {"n_levels": 12, "base_res": 16,
                                         "max_res": 2048,
                                         "log2_hashmap_size": 18}, 3)
            self.static_dec = MLP(self.static_enc.out_dim, 1 + geo_feat_dim,
                                  hidden=decoder_hidden, depth=1)
        # dynamic branch: 4D (xyz, t) permutohedral encoding
        dc = dict(dynamic_permuto_cfg or {})
        dc.setdefault("n_levels", 12)
        dc.setdefault("base_res", 4.0)
        dc.setdefault("max_res", 512.0)
        dc.setdefault("log2_hashmap_size", 17)
        self.dyn_enc = PermutoEncoding(4, **dc)
        self.dyn_dec = MLP(self.dyn_enc.out_dim, 1 + geo_feat_dim,
                           hidden=decoder_hidden, depth=1)
        if with_flow:
            # forward + backward scene flow offsets (6 outputs)
            self.flow_dec = MLP(self.dyn_enc.out_dim, 6, hidden=decoder_hidden,
                                depth=1, last_b_init=0.0)

        self.dir_embed, dir_dim = get_embedder({"type": "sh", "degree": sh_degree})
        self.radiance_net = MLP(geo_feat_dim + dir_dim, 3, hidden=radiance_hidden,
                                depth=2, output_activation="sigmoid")

    def init(self, key) -> Params:
        ks = jax.random.split(key, 5)
        p: Params = {"dyn_enc": self.dyn_enc.init(ks[0]),
                     "dyn_dec": self.dyn_dec.init(ks[1]),
                     "radiance": self.radiance_net.init(ks[2])}
        if not self.only_dynamic:
            p["static_enc"] = self.static_enc.init(ks[3])
            p["static_dec"] = self.static_dec.init(jax.random.fold_in(ks[3], 1))
        if self.with_flow:
            p["flow_dec"] = self.flow_dec.init(ks[4])
        return p

    @staticmethod
    def _act(raw):
        return jnp.exp(jnp.clip(raw, -15.0, 15.0))

    def query(self, params: Params, x: jnp.ndarray, t01: jnp.ndarray
              ) -> Dict[str, jnp.ndarray]:
        """x [.,3], t01 [.] -> densities + feats + flow for both branches."""
        u = self.space.normalize_coords(x)
        out: Dict[str, jnp.ndarray] = {}
        hd = self.dyn_enc(params["dyn_enc"],
                          jnp.concatenate([u, t01[..., None]], -1))
        dd = self.dyn_dec(params["dyn_dec"], hd)
        out["sigma_dynamic"] = self._act(dd[..., 0])
        out["feat_dynamic"] = dd[..., 1:]
        if not self.only_dynamic:
            hs = self.static_enc(params["static_enc"], u)
            ds = self.static_dec(params["static_dec"], hs)
            out["sigma_static"] = self._act(ds[..., 0])
            out["feat_static"] = ds[..., 1:]
        if self.with_flow:
            fl = self.flow_dec(params["flow_dec"], hd)
            out["flow_fwd"] = fl[..., :3]
            out["flow_bwd"] = fl[..., 3:]
        return out

    def ray_query(self, params: Params, rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                  *, key=None, it=None, cond: Optional[jnp.ndarray] = None,
                  near=None, far=None, num_coarse: int = 96, perturb: bool = True,
                  with_rgb: bool = True, **_unused) -> Dict[str, Any]:
        """Dense buffer with combined density; per-branch weights exposed for
        the emergent decomposition losses. ``cond``: [N, 1] normalized time."""
        N = rays_o.shape[0]
        n_, f_, hit = self.space.ray_test(rays_o, rays_d, near=near, far=far)
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, num_coarse), (N, num_coarse))
        if perturb and key is not None:
            u = u + (jax.random.uniform(key, (N, num_coarse)) - 0.5) / num_coarse
        t = n_[:, None] + (f_ - n_)[:, None] * jnp.clip(u, 0.0, 1.0)
        mask = jnp.broadcast_to(hit[:, None], t.shape)
        x = rays_o[:, None, :] + t[..., None] * rays_d[:, None, :]
        t01 = (jnp.zeros((N,)) if cond is None else cond[..., 0])
        q = self.query(params, x, jnp.broadcast_to(t01[:, None], t.shape))

        sigma_d = q["sigma_dynamic"]
        sigma = sigma_d if self.only_dynamic else sigma_d + q["sigma_static"]
        dt = jnp.concatenate([t[..., 1:] - t[..., :-1],
                              jnp.ones_like(t[..., :1]) * 1e-3], -1)
        alpha = jnp.where(mask, tau_to_alpha(sigma * dt), 0.0)
        buf: Dict[str, Any] = {"t": t, "mask": mask, "alpha": alpha,
                               "nablas": jnp.zeros_like(x),
                               "sigma_dynamic": sigma_d}
        if not self.only_dynamic:
            buf["sigma_static"] = q["sigma_static"]
            buf["dynamic_ratio"] = sigma_d / jnp.clip(sigma, 1e-8)
        if self.with_flow:
            buf["flow_fwd"] = q["flow_fwd"]
            buf["flow_bwd"] = q["flow_bwd"]
        if with_rgb:
            # density-weighted feature mix (EmerNeRF's shared color head)
            if self.only_dynamic:
                feat = q["feat_dynamic"]
            else:
                wd = (sigma_d / jnp.clip(sigma, 1e-8))[..., None]
                feat = wd * q["feat_dynamic"] + (1 - wd) * q["feat_static"]
            dirs = jnp.broadcast_to(rays_d[:, None, :], x.shape)
            buf["rgb"] = self.radiance_net(
                params["radiance"],
                jnp.concatenate([feat, self.dir_embed(dirs)], -1))
        buf["details"] = {"hit": hit, "near": n_, "far": f_}
        return buf

    def flow_cycle_residual(self, params: Params, x: jnp.ndarray,
                            t01: jnp.ndarray, dt: float = 0.02) -> jnp.ndarray:
        """Forward-then-backward flow cycle error (reference FlowLoss)."""
        q0 = self.query(params, x, t01)
        x_fwd = x + q0["flow_fwd"] * dt
        q1 = self.query(params, x_fwd, t01 + dt)
        x_back = x_fwd + q1["flow_bwd"] * dt
        return jnp.sum((x_back - x) ** 2, axis=-1)
