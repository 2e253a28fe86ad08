"""Large-scale scene datasets: Mega-NeRF and Block-NeRF.

Functional equivalent of the reference's ``dataio/mega_nerf/mega_nerf_dataset.py``
(222 LoC): reads the Mega-NeRF preprocessed layout —

    root/
        coordinates.pt                   (origin_drb, pose_scale_factor)
        {train,val}/metadata/<stem>.pt   ({c2w [3,4], intrinsics [fx,fy,cx,cy], H, W})
        {train,val}/rgbs/<stem>.jpg
        masks/<stem>.pt                  (optional torch-pickled keep masks)

Poses are stored camera-to-world in an OpenGL-style frame and normalized to
[-1, 1] (altitude is dim 0, down-right-backwards); flipping the y/z columns
yields OpenCV convention (reference :129-139). The scenario carries
``floor_info`` (altitude floor for street/floor-style SDF pretraining) and,
when ``should_split_block``, a ``split_block_info`` grid that maps directly
onto ``ForestBlockSpace(block_coords, block_size, origin)`` for the
LoTDForest family (reference prepare_dense_grids analog).
"""
from __future__ import annotations

import os
from math import ceil
from typing import Any, Dict, List, Optional

import numpy as np

from .scene_dataset import SceneDataset

_OPENCV_TO_OPENGL = np.diag([1.0, -1.0, -1.0, 1.0])


class MegaNeRFDataset(SceneDataset):
    """Mega-NeRF preprocessed-scene reader. One scene per root; scene id =
    the directory's basename (matching the reference's dataset_name)."""

    def __init__(self, root: str, *, splits: tuple = ("train", "val"),
                 train_every: Optional[int] = None,
                 ray_altitude_range: Optional[List[float]] = None,
                 main_class_name: str = "Street", **_):
        self.root = root
        self.main_class_name = main_class_name
        import torch
        coord = torch.load(os.path.join(root, "coordinates.pt"),
                           map_location="cpu", weights_only=False)
        self.origin_drb = np.asarray(coord["origin_drb"], np.float64)
        self.pose_scale_factor = float(coord["pose_scale_factor"])
        if ray_altitude_range is not None:
            self.x_minmax = [(x - self.origin_drb[0]) / self.pose_scale_factor
                             for x in ray_altitude_range]
        else:
            self.x_minmax = [-1.0, 1.0]

        metas, rgbs, masks = [], [], []
        for split in splits:
            mdir = os.path.join(root, split, "metadata")
            if not os.path.isdir(mdir):
                continue
            names = sorted(os.listdir(mdir))
            if split == "train" and train_every:
                names = names[::train_every]
            for name in names:
                stem = os.path.splitext(name)[0]
                md = torch.load(os.path.join(mdir, name),
                                map_location="cpu", weights_only=False)
                rgb = None
                for ext in (".jpg", ".png", ".JPG", ".PNG"):
                    p = os.path.join(root, split, "rgbs", stem + ext)
                    if os.path.isfile(p):
                        rgb = p
                        break
                if rgb is None:
                    continue
                c2w34 = np.asarray(md["c2w"], np.float64)
                c2w = np.eye(4)
                c2w[:3, :4] = c2w34[:3, :4]
                c2w = c2w @ _OPENCV_TO_OPENGL
                fx, fy, cx, cy = np.asarray(md["intrinsics"],
                                            np.float64).tolist()
                K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]],
                             np.float32)
                mask_p = os.path.join(root, "masks", name)
                metas.append({"c2w": c2w.astype(np.float32), "intr": K,
                              "hw": (int(md["H"]), int(md["W"]))})
                rgbs.append(rgb)
                masks.append(mask_p if os.path.isfile(mask_p) else None)
        self._metas = metas
        self._rgbs = rgbs
        self._masks = masks

    # -- SceneDataset ----------------------------------------------------------
    def scene_ids(self) -> List[str]:
        return [os.path.basename(os.path.normpath(self.root)) or "mega_nerf"]

    def get_scenario(self, scene_id: str, *, should_split_block: bool = False,
                     split_block_cfg: Optional[Dict] = None, **kw
                     ) -> Dict[str, Any]:
        n = len(self._metas)
        c2ws = np.stack([m["c2w"] for m in self._metas])
        tracks_2d = c2ws[:, 1:3, 3]
        aabb = np.zeros((2, 3))
        aabb[:, 1:] = np.stack([tracks_2d.min(0), tracks_2d.max(0)])
        aabb[:, 0] = self.x_minmax
        metas: Dict[str, Any] = {
            "num_frames": n, "up_vec": "-x",    # dim 0 = altitude (down+)
            "aabb": aabb,
            # altitude floor for SDF pretraining: x grows DOWNWARD, so
            # (x - floor_at) < 0 is above ground (reference floor_info)
            "floor_info": {"floor_dim": "x", "floor_up_sign": -1,
                           "floor_at": 0.5 * (self.x_minmax[0]
                                              + self.x_minmax[1])},
        }
        if should_split_block:
            cfg = dict(split_block_cfg or {})
            bs = float(cfg.get("world_block_size", cfg.get("block_size", 0.5)))
            origin = np.array([self.x_minmax[0], *aabb[0, 1:]])
            res = [max(int(ceil((hi - lo) / bs)), 1)
                   for lo, hi in zip(origin, [self.x_minmax[1], *aabb[1, 1:]])]
            block_ks = np.stack(
                np.meshgrid(*[np.arange(r) for r in res], indexing="ij"),
                -1).reshape(-1, 3)
            metas["split_block_info"] = {
                "block_ks": block_ks, "world_origin": origin,
                "world_block_size": bs, "level": 0}
        observers = {"camera": {
            "class_name": "Camera", "n_frames": n, "camera_model": "pinhole",
            "data": {
                "transform": c2ws,
                "intr": np.stack([m["intr"] for m in self._metas]),
                "hw": np.asarray([m["hw"] for m in self._metas], np.int32),
            }}}
        objects = {self.main_class_name.lower():
                   {"class_name": self.main_class_name, "n_frames": n,
                    "data": {}}}
        return {"scene_id": scene_id, "metas": metas,
                "observers": observers, "objects": objects}

    def get_image(self, scene_id: str, cam_id: str, frame_index: int
                  ) -> np.ndarray:
        from PIL import Image
        img = np.asarray(Image.open(self._rgbs[frame_index]),
                         np.float32) / 255.0
        return img[..., :3]

    def get_occupancy_mask(self, scene_id, cam_id, frame_index):
        p = self._masks[frame_index]
        if p is None:
            return None
        import torch
        with open(p, "rb") as f:
            keep = torch.load(f, map_location="cpu", weights_only=False)
        return np.asarray(keep, np.float32)

    def get_lidar(self, scene_id, lidar_id, frame_index):
        return None


class BlockNeRFDataset(SceneDataset):
    """Block-NeRF (block-nerf-pytorch preprocessed Waymo-Block layout)
    reader — reference ``dataio/block_nerf/block_nerf_dataset.py`` (357 LoC):

        root/<split>/
            train_all_meta.pt        {img_name: {cam_idx, c2w [3,4] OpenGL,
                                      intrinsics [fx, fy], W, H,
                                      equivalent_exposure}}
            split_block_train.json   {block_id: {elements: [[img_name, ...]]}}
            rgbs/<img_name>.png      masks/<img_name>.npz (semantic ids)
            depths/<img_name>.npz    normals/<img_name>.jpg

    Per-frame ``exposure`` rides in the camera data (consumed by appearance
    embeddings / ColorTransform). ``block_ids`` restricts frames to the
    chosen blocks."""

    def __init__(self, root: str, *, split: str = "train",
                 block_ids=None, cam_ids=None, exposures_std: float = 1.0,
                 mask_taxonomy: str = "cityscapes", **_):
        import json

        import torch

        from .custom import TAXONOMIES, _ids
        self.root = root
        self.split = split
        tax = TAXONOMIES[mask_taxonomy]
        self._kind_ids = {k: _ids(tax, [k])
                          for k in ("sky", "human", "vehicle", "dynamic",
                                    "road")}
        meta = torch.load(os.path.join(root, "train", "train_all_meta.pt"),
                          map_location="cpu", weights_only=False)
        if block_ids is not None:
            block_ids = [str(b) for b in (block_ids if isinstance(
                block_ids, (list, tuple)) else [block_ids])]
            with open(os.path.join(root, "train",
                                   "split_block_train.json")) as f:
                info = json.load(f)
            keep = set()
            for b in block_ids:
                keep.update(e[0] for e in info[b]["elements"])
            meta = {k: v for k, v in meta.items() if k in keep}
        if cam_ids is not None:
            cam_ids = {str(c) for c in (cam_ids if isinstance(
                cam_ids, (list, tuple)) else [cam_ids])}
            meta = {k: v for k, v in meta.items()
                    if str(v["cam_idx"]) in cam_ids}

        self.img_names, c2ws, intrs, hws, exps = [], [], [], [], []
        for name in sorted(meta):
            mi = meta[name]
            c2w = np.eye(4)
            c2w[:3, :4] = np.asarray(mi["c2w"], np.float64)[:3, :4]
            c2ws.append(c2w @ _OPENCV_TO_OPENGL)
            W, H = int(mi["W"]), int(mi["H"])
            fx, fy = (float(v) for v in np.asarray(
                mi["intrinsics"], np.float64)[:2])
            intrs.append(np.array([[fx, 0, W * 0.5], [0, fy, H * 0.5],
                                   [0, 0, 1]], np.float32))
            hws.append((H, W))
            exps.append(float(mi["equivalent_exposure"]) / exposures_std)
            self.img_names.append(name)
        self._c2ws = np.stack(c2ws).astype(np.float32)
        self._intrs = np.stack(intrs)
        self._hws = np.asarray(hws, np.int32)
        self._exps = np.asarray(exps, np.float32)

    def scene_ids(self) -> List[str]:
        return ["waymo-block-nerf"]

    def get_scenario(self, scene_id: str, **kw) -> Dict[str, Any]:
        n = len(self.img_names)
        observers = {"camera": {
            "class_name": "Camera", "n_frames": n, "camera_model": "pinhole",
            "data": {"transform": self._c2ws, "intr": self._intrs,
                     "hw": self._hws, "exposure": self._exps}}}
        return {"scene_id": scene_id,
                "metas": {"num_frames": n, "up_vec": "+z"},
                "observers": observers,
                "objects": {"street": {"class_name": "Street",
                                       "n_frames": n, "data": {}}}}

    def _path(self, kind: str, frame_index: int, ext: str) -> str:
        return os.path.join(self.root, self.split, kind,
                            f"{self.img_names[frame_index]}.{ext}")

    def get_image(self, scene_id, cam_id, frame_index) -> np.ndarray:
        from PIL import Image
        img = np.asarray(Image.open(self._path("rgbs", frame_index, "png")),
                         np.float32) / 255.0
        return img[..., :3]

    def get_exposure(self, scene_id, cam_id, frame_index) -> float:
        return float(self._exps[frame_index])

    def _raw_mask(self, frame_index):
        p = self._path("masks", frame_index, "npz")
        if not os.path.isfile(p):
            return None
        with np.load(p) as z:
            return z[z.files[0]]

    def get_occupancy_mask(self, scene_id, cam_id, frame_index):
        raw = self._raw_mask(frame_index)
        if raw is None:
            return None
        return (~np.isin(raw, self._kind_ids["sky"])).astype(
            np.float32).squeeze()

    def get_semantic_mask(self, scene_id, cam_id, frame_index, kind="all"):
        raw = self._raw_mask(frame_index)
        if raw is None or kind == "all":
            return raw
        return np.isin(raw, self._kind_ids[kind]).squeeze()

    def get_mono_depth(self, scene_id, cam_id, frame_index):
        p = self._path("depths", frame_index, "npz")
        if not os.path.isfile(p):
            return None
        with np.load(p) as z:
            return z[z.files[0]].astype(np.float32)

    def get_mono_normals(self, scene_id, cam_id, frame_index):
        p = self._path("normals", frame_index, "jpg")
        if not os.path.isfile(p):
            return None
        from PIL import Image
        return np.asarray(Image.open(p), np.float32) / 255.0 * 2.0 - 1.0

    def get_lidar(self, scene_id, lidar_id, frame_index):
        return None
