"""Scene-graph nodes with per-frame pose data (pytree-of-arrays design).

TPU-native re-design of ``app/resources/nodes.py`` (reference ``SceneNode``:
transform/world_transform/scale attributes :50-52, recursive update with
bounding spheres :71-107, per-frame ``frame_data`` with validity flags
:188-229, ``load_from_odict`` scenario parsing :306, ``_slice_at/_interp_at``
:467,493 — SURVEY.md §2.1).

Design translation (SURVEY.md §7): a node's per-frame attributes are plain
``[T, ...]`` arrays; "slicing" a scene at frame indices is a vectorized
gather; world-transform propagation walks nodes in topological order with a
static Python loop (node count is compile-time constant), so the whole graph
update lives inside jit and pose gradients flow (LearnableParams).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np
import jax.numpy as jnp

from ..maths.transforms import (compose_transforms, lerp, make_transform,
                                quat_slerp, quat_to_rot, rot_to_quat)


class SceneNode:
    """Static node metadata + per-frame attribute arrays.

    frame_data keys (all leading dim T = scene frame count; frames outside
    the node's segments are identity/invalid):
      transform [T, 4, 4]   parent-relative pose
      scale     [T, 3]      kept separate from transform (reference keeps
                            scale out of the 4x4, nodes.py:50-52)
      valid     [T]         bool — node exists at this frame
      global_ts [T]         optional per-frame timestamps
    plus observer-specific keys (intr, hw, rays_o/rays_d ...).
    """

    def __init__(self, node_id: str, class_name: str = "node",
                 parent: Optional[str] = None):
        self.id = node_id
        self.class_name = class_name
        self.parent = parent
        self.frame_data: Dict[str, Any] = {}
        self.n_frames: int = 0
        # filled by Scene
        self.index: int = -1
        self.parent_index: int = -1

    # -- scenario parsing ----------------------------------------------------
    @classmethod
    def from_odict(cls, node_id: str, odict: Dict, n_scene_frames: int,
                   parent: Optional[str] = None) -> "SceneNode":
        """Parse one scenario observer/object entry (reference
        ``SceneNode.load_from_odict``, nodes.py:306): either flat ``data``
        over all frames, or ``segments`` [{start_frame, n_frames, data}] with
        validity flags outside segments (SURVEY.md App. A.4)."""
        node = cls(node_id, odict.get("class_name", "node"), parent)
        T = n_scene_frames
        transform = np.tile(np.eye(4, dtype=np.float32), (T, 1, 1))
        scale = np.ones((T, 3), np.float32)
        valid = np.zeros((T,), bool)
        extra: Dict[str, np.ndarray] = {}

        def fill(data: Dict, start: int, n: int):
            sl = slice(start, start + n)
            for k, v in data.items():
                v = np.asarray(v)
                if v.ndim and v.shape[0] > n:  # tolerate over-long arrays
                    v = v[:n]
                if k == "transform":
                    transform[sl] = v.astype(np.float32).reshape(n, 4, 4)
                elif k == "scale":
                    scale[sl] = np.broadcast_to(v.astype(np.float32).reshape(n, -1),
                                                (n, 3))
                else:
                    if k not in extra:
                        extra[k] = np.zeros((T,) + v.shape[1:], v.dtype)
                    extra[k][sl] = v
            valid[sl] = True

        if "segments" in odict:
            for seg in odict["segments"]:
                fill(seg["data"], int(seg.get("start_frame", 0)),
                     int(seg["n_frames"]))
        elif "data" in odict:
            n = int(odict.get("n_frames", T))
            fill(odict["data"], 0, n)
        else:  # static node
            valid[:] = True

        node.frame_data = {"transform": jnp.asarray(transform),
                           "scale": jnp.asarray(scale),
                           "valid": jnp.asarray(valid)}
        for k, v in extra.items():
            node.frame_data[k] = jnp.asarray(v)
        node.n_frames = T
        return node

    # -- per-node slicing ------------------------------------------------------
    def slice_at(self, fi) -> Dict[str, Any]:
        """Gather frame data at (possibly batched) integer frame index."""
        fi = jnp.asarray(fi)
        return {k: v[fi] for k, v in self.frame_data.items()}

    def interp_at(self, ts, default_table=None) -> Dict[str, Any]:
        """Continuous-timestamp interpolation (reference ``_interp_at``,
        nodes.py:493): position lerp + rotation slerp between bracketing
        keyframes on this node's own timestamp table (``default_table``:
        the scene clock, for nodes whose scenario carries no global_ts)."""
        table = self.frame_data.get("global_ts")
        max_fi = self.n_frames - 1
        if table is None:
            if default_table is not None:
                # borrowed scene clock: a node with MORE frames than the
                # clock table must not index past the table (silent clamped
                # reads give t1==t0 degenerate weights — ADVICE r4); clip
                # the bracket to the shorter of the two
                table = default_table
                max_fi = min(len(table), self.n_frames) - 1
            else:
                table = jnp.arange(self.n_frames, dtype=jnp.float32)
        ts = jnp.asarray(ts, jnp.float32)
        hi = jnp.clip(jnp.searchsorted(table, ts, side="right"), 1, max_fi)
        lo = hi - 1
        t0, t1 = table[lo], table[hi]
        w = jnp.clip((ts - t0) / jnp.clip(t1 - t0, 1e-9), 0.0, 1.0)

        T0 = self.frame_data["transform"][lo]
        T1 = self.frame_data["transform"][hi]
        q0, q1 = rot_to_quat(T0[..., :3, :3]), rot_to_quat(T1[..., :3, :3])
        q = quat_slerp(q0, q1, w[..., None] if w.ndim < q0.ndim - 1 else w)
        tr = lerp(T0[..., :3, 3], T1[..., :3, 3], w[..., None])
        out = {"transform": make_transform(quat_to_rot(q), tr),
               "scale": lerp(self.frame_data["scale"][lo],
                             self.frame_data["scale"][hi], w[..., None]),
               "valid": self.frame_data["valid"][lo] & self.frame_data["valid"][hi]}
        for k, v in self.frame_data.items():
            if k not in out and k != "global_ts" and jnp.issubdtype(v.dtype, jnp.floating):
                vl, vh = v[lo], v[hi]
                out[k] = lerp(vl, vh,
                              w.reshape(w.shape + (1,) * (vl.ndim - w.ndim)))
            elif k not in out:
                out[k] = v[lo]
        return out
