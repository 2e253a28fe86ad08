"""Camera observers: pixel sampling + ray lifting from a frozen scene.

TPU-native re-design of ``app/resources/observers/cameras.py`` (reference
``Camera``: intrinsics selection :68-102, frustum culling
``filter_drawable_groups`` :193-233, ``get_selected_rays/get_all_rays``
:249+, ``MultiCamBundle`` :451-537 — SURVEY.md §2.1).

Cameras are SceneNodes whose frame_data carries ``intr [T,3,3]``, ``hw
[T,2]`` and optional ``distortion [T,D]``; these pure functions consume the
*frozen* slices so ray lifting can live inside the jitted train step
(pose/intrinsics gradients flow — reference defers lifting to the trainer,
dataio/data_loader/__init__.py:22-30).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp

from .cameras_math import get_rays, sphere_inside_frustum, view_frustum_planes
from ..scene import FrozenScene


def camera_get_selected_rays(frozen: FrozenScene, cam_id: str,
                             xy: jnp.ndarray,
                             camera_model: str = "pinhole"
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lift continuous pixel coords [..., 2] to world rays using the frozen
    camera pose + intrinsics (reference Camera.get_selected_rays)."""
    data = frozen.data(cam_id)
    c2w = frozen.world_transform(cam_id)
    intr = data["intr"]
    dist = data.get("distortion")
    return get_rays(xy, intr, c2w, distortion=dist, camera_model=camera_model)


def camera_get_all_rays(frozen: FrozenScene, cam_id: str, H: int, W: int,
                        camera_model: str = "pinhole"
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full-frame ray grid [H*W, 3] (reference Camera.get_all_rays)."""
    u, v = jnp.meshgrid(jnp.arange(W) + 0.5, jnp.arange(H) + 0.5)
    xy = jnp.stack([u, v], axis=-1).reshape(-1, 2)
    ro, rd = camera_get_selected_rays(frozen, cam_id, xy, camera_model)
    return ro.reshape(-1, 3), rd.reshape(-1, 3)


def camera_filter_drawables(frozen: FrozenScene, cam_id: str, H: int, W: int,
                            drawable_ids: List[str],
                            bounding_radii: Dict[str, float],
                            near: float = 0.0) -> List[str]:
    """Frustum-cull drawables by bounding sphere vs the camera frustum
    (reference cameras.py:193-233 + nodes.py:91-103). Host-side (static
    output list) — used to build the per-batch object set before jit."""
    import numpy as np
    data = frozen.data(cam_id)
    intr = np.asarray(data["intr"])
    c2w = np.asarray(frozen.world_transform(cam_id))
    if intr.ndim > 2:
        intr = intr.reshape(-1, 3, 3)[0]
        c2w = c2w.reshape(-1, 4, 4)[0]
    planes = view_frustum_planes(jnp.asarray(intr), jnp.asarray(c2w), W, H, near)
    keep = []
    for did in drawable_ids:
        w = np.asarray(frozen.world_transform(did)).reshape(-1, 4, 4)[0]
        scale = np.asarray(frozen.data(did)["scale"]).reshape(-1, 3)[0]
        center = jnp.asarray(w[:3, 3])
        radius = jnp.asarray(float(np.max(scale) * bounding_radii.get(did, 1.0)))
        if bool(sphere_inside_frustum(center[None], radius[None], planes)[0]):
            keep.append(did)
    return keep
