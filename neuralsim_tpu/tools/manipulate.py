"""Scene manipulation / editing demos: transform scene objects and re-render.

TPU-native re-design of ``code_multi/tools/manipulate.py`` (reference, 758
LoC — SURVEY.md §2.6): rotate / translate / scale / replicate / delete
("thanos") objects by mutating node transforms after slicing, plus self_*
camera moves. Edits are pure functions FrozenScene -> FrozenScene so they
compose and stay jit-compatible.
"""
from __future__ import annotations

import math
from typing import Callable, Dict, List, Optional

import numpy as np
import jax.numpy as jnp

from ..maths.transforms import compose_transforms, make_transform
from ..scene.scene import FrozenScene


# ---------------------------------------------------------------------------
# Node-transform edits (applied to a frozen scene's world transforms)
# ---------------------------------------------------------------------------

def _edit_world(frozen: FrozenScene, node_id: str,
                fn: Callable[[jnp.ndarray], jnp.ndarray]) -> FrozenScene:
    idx = frozen.scene.nodes[node_id].index
    out = FrozenScene.__new__(FrozenScene)
    out.scene = frozen.scene
    out.node_data = list(frozen.node_data)
    out.world = list(frozen.world)
    out.world[idx] = fn(out.world[idx])
    return out


def rotate_object(frozen: FrozenScene, node_id: str, angle_rad: float,
                  axis: str = "z") -> FrozenScene:
    c, s = math.cos(angle_rad), math.sin(angle_rad)
    R = {"z": [[c, -s, 0], [s, c, 0], [0, 0, 1]],
         "y": [[c, 0, s], [0, 1, 0], [-s, 0, c]],
         "x": [[1, 0, 0], [0, c, -s], [0, s, c]]}[axis]
    Rm = make_transform(jnp.asarray(R, jnp.float32))

    def fn(T):
        return compose_transforms(T, Rm)
    return _edit_world(frozen, node_id, fn)


def translate_object(frozen: FrozenScene, node_id: str, offset) -> FrozenScene:
    off = jnp.asarray(offset, jnp.float32)

    def fn(T):
        return T.at[..., :3, 3].add(off)
    return _edit_world(frozen, node_id, fn)


def scale_object(frozen: FrozenScene, node_id: str, factor: float) -> FrozenScene:
    idx = frozen.scene.nodes[node_id].index
    out = FrozenScene.__new__(FrozenScene)
    out.scene = frozen.scene
    out.node_data = list(frozen.node_data)
    out.world = list(frozen.world)
    d = dict(out.node_data[idx])
    d["scale"] = d["scale"] * factor
    out.node_data[idx] = d
    return out


def delete_objects(frozen: FrozenScene, node_ids: List[str]) -> FrozenScene:
    """Invalidate nodes (the renderer masks their samples) — 'thanos' mode
    deletes a random half (reference manipulate.py)."""
    out = FrozenScene.__new__(FrozenScene)
    out.scene = frozen.scene
    out.node_data = list(frozen.node_data)
    out.world = list(frozen.world)
    for nid in node_ids:
        idx = frozen.scene.nodes[nid].index
        d = dict(out.node_data[idx])
        d["valid"] = jnp.zeros_like(jnp.asarray(d["valid"]))
        out.node_data[idx] = d
    return out


def thanos(frozen: FrozenScene, rng: np.random.Generator) -> FrozenScene:
    ids = frozen.scene.drawable_ids()
    kill = list(rng.choice(ids, size=len(ids) // 2, replace=False))
    return delete_objects(frozen, kill)


def replicate_object(frozen: FrozenScene, node_id: str, offset):
    """Render-level replication: returns an extra (world, data) pair the
    caller can append as a pseudo-object binding."""
    idx = frozen.scene.nodes[node_id].index
    T = frozen.world[idx].at[..., :3, 3].add(jnp.asarray(offset, jnp.float32))
    return T, frozen.node_data[idx]


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def main_function(cfg):
    import jax
    if cfg.get("platform"):
        jax.config.update("jax_platforms", cfg["platform"])
    import jax.numpy as jnp
    from .train_multi import build_everything_multi
    from ..scene.observers import camera_get_selected_rays
    from ..utils.checkpoint import CheckpointIO
    from ..utils.logger import _write_png, color_depth

    scene, bank, renderer, trainer, loader, dataset = build_everything_multi(cfg)
    key = jax.random.PRNGKey(cfg.get("seed", 42))
    params = bank.init_params(key)
    exp_dir = cfg.get("resume_dir") or cfg.get("exp_dir", ".")
    ckpt = CheckpointIO(os.path.join(exp_dir, "ckpts"))
    state = trainer.init_state(key, params=params)
    restored = ckpt.load(state, cfg.get("ckpt"))
    if restored is not None:
        params = restored[0] if isinstance(restored, (tuple, list)) else restored.params

    mcfg = cfg.get("manipulate", {})
    mode = mcfg.get("mode", "rotate")
    fi = int(mcfg.get("frame", 0))
    target = mcfg.get("node") or scene.drawable_ids()[0]
    frozen = scene.slice_at(fi)
    rng = np.random.default_rng(cfg.get("seed", 42))
    if mode == "rotate":
        frozen = rotate_object(frozen, target, float(mcfg.get("angle", 0.7)))
    elif mode == "translate":
        frozen = translate_object(frozen, target, mcfg.get("offset", [1, 0, 0]))
    elif mode == "scale":
        frozen = scale_object(frozen, target, float(mcfg.get("factor", 1.5)))
    elif mode == "thanos":
        frozen = thanos(frozen, rng)
    elif mode == "delete":
        frozen = delete_objects(frozen, mcfg.get("nodes", [target]))

    cam_id = loader.cam_ids[0]
    W, H = loader.image_wh(cam_id)
    ds = int(mcfg.get("downscale", 2))
    ys, xs = np.meshgrid(np.arange(H // ds), np.arange(W // ds), indexing="ij")
    xy = jnp.asarray(np.stack([xs * ds + 0.5 * ds, ys * ds + 0.5 * ds],
                              -1).reshape(-1, 2).astype(np.float32))
    ro, rd = camera_get_selected_rays(frozen, cam_id, xy)
    out = renderer.ray_query(params, frozen, ro, rd, key=None)
    rgb = np.asarray(out["rgb_volume"]).reshape(H // ds, W // ds, 3)
    out_dir = os.path.join(exp_dir, "manipulate")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{mode}_{target}_{fi:04d}.png")
    _write_png(path, (np.clip(rgb, 0, 1) * 255).astype(np.uint8))
    print(f"manipulated render -> {path}")
    return path


import os  # noqa: E402  (used in main_function)


def main(argv=None):
    from ..config import BaseConfig
    return main_function(BaseConfig("neuralsim_tpu manipulate").parse(argv))


if __name__ == "__main__":
    main()
