"""Node-trajectory animation sources for re-simulation.

Reference behaviors (app/anim/file_anim.py:12-99):
  * ``FileAnim`` — load per-frame node poses from an external file (npz/json)
    and override the scenario trajectory (closed-loop re-simulation input).
  * ``ReverseEgoAnim`` — play the ego trajectory backwards (demo).
Applied by producing a replacement ``transform [T, 4, 4]`` per node, then
patching ``SceneNode.frame_data`` before slicing.
"""
from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp


class Anim:
    """Base: maps (node_id, n_frames) -> optional replacement trajectory."""

    def transforms_for(self, node_id: str, n_frames: int) -> Optional[np.ndarray]:
        return None

    def apply(self, scene) -> None:
        for node in scene.nodes_topo:
            tr = self.transforms_for(node.id, node.n_frames)
            if tr is not None:
                node.frame_data = dict(node.frame_data)
                node.frame_data["transform"] = jnp.asarray(tr, jnp.float32)


class FileAnim(Anim):
    """Trajectories from a file.

    npz: one array per node id, each [T, 4, 4] (or [T, 7] pos+quat wxyz).
    json: {node_id: [[4x4]...]}.
    """

    def __init__(self, path: str):
        self.data: Dict[str, np.ndarray] = {}
        if path.endswith(".npz"):
            with np.load(path) as z:
                for k in z.files:
                    self.data[k] = z[k]
        elif path.endswith(".json"):
            with open(path) as f:
                self.data = {k: np.asarray(v, np.float32)
                             for k, v in json.load(f).items()}
        else:
            raise ValueError(f"unsupported anim file {path}")

    def transforms_for(self, node_id, n_frames):
        tr = self.data.get(node_id)
        if tr is None:
            return None
        tr = np.asarray(tr, np.float32)
        if tr.ndim == 2 and tr.shape[-1] == 7:  # pos + quat(wxyz)
            from ..maths.transforms import make_transform, quat_to_rot
            R = np.asarray(quat_to_rot(jnp.asarray(tr[:, 3:])))
            out = np.tile(np.eye(4, dtype=np.float32), (tr.shape[0], 1, 1))
            out[:, :3, :3] = R
            out[:, :3, 3] = tr[:, :3]
            tr = out
        if tr.shape[0] < n_frames:  # hold last pose
            pad = np.repeat(tr[-1:], n_frames - tr.shape[0], 0)
            tr = np.concatenate([tr, pad], 0)
        return tr[:n_frames]


class ReverseEgoAnim(Anim):
    """Play the named node's (default: ego) trajectory backwards."""

    def __init__(self, node_id: str = "ego"):
        self.node_id = node_id
        self._orig: Dict[str, np.ndarray] = {}

    def apply(self, scene) -> None:
        node = scene.nodes[self.node_id]
        tr = np.asarray(node.frame_data["transform"])[::-1].copy()
        node.frame_data = dict(node.frame_data)
        node.frame_data["transform"] = jnp.asarray(tr)


def create_anim(cfg, scene=None) -> Anim:
    """Anim factory for the render driver (reference ``create_anim`` used by
    code_multi/tools/render_anim.py:80).

    ``cfg`` forms:
      * path string  -> FileAnim (npz/json of per-node trajectories)
      * "reverse_ego" or "reverse_ego:<node_id>" -> ReverseEgoAnim
      * dict {type: file|reverse_ego, path?, node_id?}
    """
    def _default_ego():
        if scene is not None:
            eid = scene.metas.get("ego_car_id")
            if eid and eid in scene.nodes:
                return eid
            for n in scene.nodes_topo:
                if n.class_name == "EgoVehicle":
                    return n.id
            # scenes without an ego node (e.g. synthetic object scenes):
            # reverse the pose track of the first camera observer's topmost
            # posed ancestor — the closest analog of "drive backwards".
            for n in scene.nodes_topo:
                if n.class_name == "Camera":
                    nid = n.id
                    while scene.nodes[nid].parent is not None:
                        nid = scene.nodes[nid].parent
                    return nid
        return "ego"

    if isinstance(cfg, str):
        if cfg.startswith("reverse_ego"):
            _, _, nid = cfg.partition(":")
            return ReverseEgoAnim(nid or _default_ego())
        return FileAnim(cfg)
    t = cfg.get("type", "file")
    if t == "reverse_ego":
        return ReverseEgoAnim(cfg.get("node_id") or _default_ego())
    if t == "file":
        return FileAnim(cfg["path"])
    raise ValueError(f"unknown anim type {t}")
