"""Object-centric dataset implementations: DTU / BMVS (IDR format), MonoSDF
(scannet-style with mono cues), and COLMAP reconstructions.

TPU-native re-implementations of the reference's dataset impls
(``dataio/dtu/dtu_dataset.py``, ``dataio/bmvs/bmvs_dataset.py``,
``dataio/monosdf/``, ``dataio/colmap/colmap_dataset.py`` — SURVEY.md §2.5).
These back the ``neus_in_10_minutes`` / indoor baseline configs
(BASELINE.md targets #1-2): the directory conventions and normalization
semantics match the reference so its preprocessed data drops in unchanged.

IDR format (DTU/BMVS): ``<root>/image/*.png``, ``<root>/mask/*.png``,
``<root>/cameras.npz`` holding ``world_mat_i`` (projection P = K [R|t]) and
``scale_mat_i`` (object-of-interest normalization); the normalized camera
matrix is ``P @ scale_mat`` and poses come from its K/R/t decomposition.

MonoSDF format: ``<root>/*_rgb.png``, ``*_depth.npy``, ``*_normal.npy``,
``cameras.npz`` (same world/scale mats).

COLMAP format: ``<root>/images/*`` + ``<root>/sparse/0/{cameras,images}.bin``
(or ``.txt``); the binary layout is the public COLMAP spec.
"""
from __future__ import annotations

import glob
import os
import struct
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from .scene_dataset import SceneDataset


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

def load_rgb(path: str) -> np.ndarray:
    from PIL import Image
    img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    return img


def load_mask(path: str) -> np.ndarray:
    from PIL import Image
    m = np.asarray(Image.open(path), np.float32)
    if m.ndim == 3:
        m = m[..., 0]
    return (m > 127.5).astype(np.float32)


def load_K_Rt_from_P(P: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Decompose a 3x4 projection into (K [3,3] with K[2,2]=1, c2w [4,4]).

    Standard RQ-based decomposition (the cv2.decomposeProjectionMatrix
    semantics the IDR/NeuS data pipeline relies on)."""
    from scipy.linalg import rq
    M = P[:3, :3]
    K, R = rq(M)
    # enforce positive diagonal on K
    S = np.diag(np.sign(np.diag(K)))
    K = K @ S
    R = S @ R
    if np.linalg.det(R) < 0:
        R = -R
        K = -K
    t = np.linalg.solve(K, P[:3, 3])
    K = K / K[2, 2]
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = R.T                    # world_from_cam rotation
    c2w[:3, 3] = -R.T @ t                # camera center
    return K.astype(np.float32), c2w


def _single_object_scenario(scene_id: str, n_frames: int, c2ws: np.ndarray,
                            intrs: np.ndarray, hws: np.ndarray,
                            main_class: str = "Main",
                            aabb_scale: float = 1.0) -> Dict[str, Any]:
    return {
        "scene_id": scene_id,
        "metas": {"num_frames": n_frames, "up_vec": "+z",
                  "world_offset": np.zeros(3, np.float32),
                  "aabb_scale": aabb_scale},
        "observers": {
            "camera_0": {
                "class_name": "Camera", "n_frames": n_frames,
                "data": {"transform": c2ws.astype(np.float32),
                         "intr": intrs.astype(np.float32),
                         "hw": hws.astype(np.int32),
                         "global_ts": np.arange(n_frames, dtype=np.float32)},
            }
        },
        "objects": {
            "obj_0": {"class_name": main_class, "segments": [{
                "start_frame": 0, "n_frames": n_frames,
                "data": {"transform": np.tile(np.eye(4, dtype=np.float32),
                                              (n_frames, 1, 1)),
                         "scale": np.ones((n_frames, 3), np.float32)},
            }]}
        },
    }


# ---------------------------------------------------------------------------
# DTU / BMVS (IDR format)
# ---------------------------------------------------------------------------

class DTUDataset(SceneDataset):
    """IDR-format object dataset (reference dtu_dataset.py:66-160): images,
    optional masks, cameras.npz with world/scale mats. The scale mat maps the
    object of interest into the unit sphere — the NeuS object space."""

    main_class = "Main"

    def __init__(self, root: str, *, scene_id: Optional[str] = None,
                 downscale: float = 1.0, with_mask: bool = True,
                 cam_file: str = "cameras.npz", **_):
        self.root = root
        self._scene_id = scene_id or os.path.basename(os.path.normpath(root))
        self.downscale = downscale
        exts = ("*.png", "*.jpg", "*.JPG", "*.jpeg")
        self.image_paths = sorted(sum(
            [glob.glob(os.path.join(root, "image", e)) for e in exts], []))
        if not self.image_paths:
            raise FileNotFoundError(f"no images under {root}/image")
        self.mask_paths = sorted(sum(
            [glob.glob(os.path.join(root, "mask", e)) for e in exts], [])) \
            if with_mask else []
        cams = np.load(os.path.join(root, cam_file))
        n = len(self.image_paths)
        self.intrs = np.zeros((n, 3, 3), np.float32)
        self.c2ws = np.zeros((n, 4, 4), np.float32)
        for i in range(n):
            world_mat = cams[f"world_mat_{i}"].astype(np.float64)
            scale_mat = cams[f"scale_mat_{i}"].astype(np.float64)
            P = (world_mat @ scale_mat)[:3, :4]
            K, c2w = load_K_Rt_from_P(P)
            if downscale != 1.0:
                K = K.copy()
                K[:2] /= downscale
            self.intrs[i] = K
            self.c2ws[i] = c2w
        img0 = load_rgb(self.image_paths[0])
        H, W = img0.shape[:2]
        if downscale != 1.0:
            H, W = int(H / downscale), int(W / downscale)
        self.H, self.W = H, W

    # -- SceneDataset ----------------------------------------------------------
    def scene_ids(self) -> List[str]:
        return [self._scene_id]

    def get_scenario(self, scene_id: str = None, **kw) -> Dict[str, Any]:
        n = len(self.image_paths)
        hws = np.tile(np.array([self.H, self.W]), (n, 1))
        return _single_object_scenario(self._scene_id, n, self.c2ws,
                                       self.intrs, hws,
                                       main_class=self.main_class)

    def _maybe_downscale(self, img: np.ndarray) -> np.ndarray:
        if self.downscale == 1.0:
            return img
        import cv2
        return cv2.resize(img, (self.W, self.H),
                          interpolation=cv2.INTER_AREA)

    def get_image(self, scene_id: str, cam_id: str, frame_index: int
                  ) -> np.ndarray:
        return self._maybe_downscale(load_rgb(self.image_paths[frame_index]))

    def get_occupancy_mask(self, scene_id: str, cam_id: str,
                           frame_index: int) -> Optional[np.ndarray]:
        if not self.mask_paths:
            return None
        return self._maybe_downscale(load_mask(self.mask_paths[frame_index]))


class BMVSDataset(DTUDataset):
    """BlendedMVS in the IDR layout (reference bmvs_dataset.py — identical
    format after the normalize_bmvs step; this reader consumes normalized
    output directly)."""


# ---------------------------------------------------------------------------
# MonoSDF / scannet-style indoor format with mono cues
# ---------------------------------------------------------------------------

class MonoSDFDataset(SceneDataset):
    """MonoSDF preprocessed indoor scenes (reference dataio/monosdf):
    ``<id>_rgb.png`` + ``<id>_depth.npy`` + ``<id>_normal.npy`` +
    cameras.npz (world/scale mats, same decomposition as IDR)."""

    main_class = "Main"

    def __init__(self, root: str, *, scene_id: Optional[str] = None,
                 cam_file: str = "cameras.npz", **_):
        self.root = root
        self._scene_id = scene_id or os.path.basename(os.path.normpath(root))
        self.rgb_paths = sorted(glob.glob(os.path.join(root, "*_rgb.png")))
        if not self.rgb_paths:
            raise FileNotFoundError(f"no *_rgb.png under {root}")
        self.depth_paths = [p.replace("_rgb.png", "_depth.npy")
                            for p in self.rgb_paths]
        self.normal_paths = [p.replace("_rgb.png", "_normal.npy")
                             for p in self.rgb_paths]
        cams = np.load(os.path.join(root, cam_file))
        n = len(self.rgb_paths)
        self.intrs = np.zeros((n, 3, 3), np.float32)
        self.c2ws = np.zeros((n, 4, 4), np.float32)
        for i in range(n):
            world_mat = cams[f"world_mat_{i}"].astype(np.float64)
            scale_mat = cams[f"scale_mat_{i}"].astype(np.float64) \
                if f"scale_mat_{i}" in cams else np.eye(4)
            K, c2w = load_K_Rt_from_P((world_mat @ scale_mat)[:3, :4])
            self.intrs[i] = K
            self.c2ws[i] = c2w
        img0 = load_rgb(self.rgb_paths[0])
        self.H, self.W = img0.shape[:2]

    def scene_ids(self) -> List[str]:
        return [self._scene_id]

    def get_scenario(self, scene_id: str = None, **kw) -> Dict[str, Any]:
        n = len(self.rgb_paths)
        hws = np.tile(np.array([self.H, self.W]), (n, 1))
        return _single_object_scenario(self._scene_id, n, self.c2ws,
                                       self.intrs, hws,
                                       main_class=self.main_class)

    def get_image(self, scene_id, cam_id, frame_index) -> np.ndarray:
        return load_rgb(self.rgb_paths[frame_index])

    def get_mono_depth(self, scene_id, cam_id, frame_index):
        p = self.depth_paths[frame_index]
        return np.load(p).astype(np.float32) if os.path.isfile(p) else None

    def get_mono_normals(self, scene_id, cam_id, frame_index):
        p = self.normal_paths[frame_index]
        return np.load(p).astype(np.float32) if os.path.isfile(p) else None


# ---------------------------------------------------------------------------
# COLMAP sparse reconstructions
# ---------------------------------------------------------------------------

def _read_colmap_cameras_bin(path: str) -> Dict[int, Dict[str, Any]]:
    """Parse cameras.bin per the public COLMAP binary format spec."""
    # model_id -> (name, n_params)
    models = {0: ("SIMPLE_PINHOLE", 3), 1: ("PINHOLE", 4),
              2: ("SIMPLE_RADIAL", 4), 3: ("RADIAL", 5),
              4: ("OPENCV", 8), 5: ("OPENCV_FISHEYE", 8),
              6: ("FULL_OPENCV", 12), 7: ("FOV", 5),
              8: ("SIMPLE_RADIAL_FISHEYE", 4), 9: ("RADIAL_FISHEYE", 5),
              10: ("THIN_PRISM_FISHEYE", 12)}
    out = {}
    with open(path, "rb") as f:
        n = struct.unpack("<Q", f.read(8))[0]
        for _ in range(n):
            cam_id, model_id, w, h = struct.unpack("<iiQQ", f.read(24))
            name, np_ = models[model_id]
            params = struct.unpack("<" + "d" * np_, f.read(8 * np_))
            out[cam_id] = {"model": name, "width": w, "height": h,
                           "params": np.asarray(params)}
    return out


def _read_colmap_images_bin(path: str) -> Dict[int, Dict[str, Any]]:
    """Parse images.bin (qvec, tvec, camera_id, name, 2D points skipped)."""
    out = {}
    with open(path, "rb") as f:
        n = struct.unpack("<Q", f.read(8))[0]
        for _ in range(n):
            img_id = struct.unpack("<i", f.read(4))[0]
            qvec = np.asarray(struct.unpack("<dddd", f.read(32)))
            tvec = np.asarray(struct.unpack("<ddd", f.read(24)))
            cam_id = struct.unpack("<i", f.read(4))[0]
            name = b""
            while True:
                c = f.read(1)
                if c == b"\x00":
                    break
                name += c
            n2d = struct.unpack("<Q", f.read(8))[0]
            f.read(24 * n2d)  # x, y, point3D_id per 2D point
            out[img_id] = {"qvec": qvec, "tvec": tvec, "camera_id": cam_id,
                           "name": name.decode()}
    return out


def _qvec_to_rot(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])


def _colmap_K(cam: Dict[str, Any]) -> np.ndarray:
    p = cam["params"]
    K = np.eye(3)
    if cam["model"] == "SIMPLE_PINHOLE" or cam["model"].startswith("SIMPLE_RADIAL") \
            or cam["model"] == "RADIAL" or cam["model"] == "RADIAL_FISHEYE":
        K[0, 0] = K[1, 1] = p[0]
        K[0, 2], K[1, 2] = p[1], p[2]
    else:
        K[0, 0], K[1, 1], K[0, 2], K[1, 2] = p[0], p[1], p[2], p[3]
    return K


class COLMAPDataset(SceneDataset):
    """Dataset over a COLMAP sparse reconstruction (reference
    colmap_dataset.py + colmap_loader.py): images/ + sparse/0/*.bin. Scene is
    normalized so the camera centroid sits at the origin with unit spread —
    the reference's camera-based auto-normalization."""

    main_class = "Main"

    def __init__(self, root: str, *, scene_id: Optional[str] = None,
                 normalize: bool = True, **_):
        self.root = root
        self._scene_id = scene_id or os.path.basename(os.path.normpath(root))
        sparse = os.path.join(root, "sparse", "0")
        if not os.path.isdir(sparse):
            sparse = os.path.join(root, "sparse")
        cams = _read_colmap_cameras_bin(os.path.join(sparse, "cameras.bin"))
        imgs = _read_colmap_images_bin(os.path.join(sparse, "images.bin"))
        items = sorted(imgs.values(), key=lambda d: d["name"])
        n = len(items)
        self.image_paths = [os.path.join(root, "images", d["name"])
                            for d in items]
        self.intrs = np.zeros((n, 3, 3), np.float32)
        self.c2ws = np.zeros((n, 4, 4), np.float32)
        for i, d in enumerate(items):
            R_w2c = _qvec_to_rot(d["qvec"])
            t = d["tvec"]
            c2w = np.eye(4)
            c2w[:3, :3] = R_w2c.T
            c2w[:3, 3] = -R_w2c.T @ t
            self.c2ws[i] = c2w
            self.intrs[i] = _colmap_K(cams[d["camera_id"]])
        if normalize and n > 0:
            centers = self.c2ws[:, :3, 3]
            center = centers.mean(0)
            radius = max(float(np.linalg.norm(centers - center, axis=-1).max()),
                         1e-6)
            self.c2ws[:, :3, 3] = (centers - center) / radius
        cam0 = cams[items[0]["camera_id"]]
        self.H, self.W = int(cam0["height"]), int(cam0["width"])

    def scene_ids(self) -> List[str]:
        return [self._scene_id]

    def get_scenario(self, scene_id: str = None, **kw) -> Dict[str, Any]:
        n = len(self.image_paths)
        hws = np.tile(np.array([self.H, self.W]), (n, 1))
        return _single_object_scenario(self._scene_id, n, self.c2ws,
                                       self.intrs, hws,
                                       main_class=self.main_class)

    def get_image(self, scene_id, cam_id, frame_index) -> np.ndarray:
        return load_rgb(self.image_paths[frame_index])


# ---------------------------------------------------------------------------
# NeRF-synthetic (Blender) format
# ---------------------------------------------------------------------------

# Blender/OpenGL camera (x right, y up, z back) -> OpenCV (x right, y down,
# z forward): negate the y and z basis columns.
_BLENDER_TO_OPENCV = np.diag([1.0, -1.0, -1.0])


class BlenderDataset(SceneDataset):
    """NeRF-synthetic scenes (reference dataio/nerf):
    ``<root>/transforms_<split>.json`` + ``<root>/<file_path>.png``.
    White-background RGBA images; alpha doubles as the occupancy mask."""

    main_class = "Main"

    def __init__(self, root: str, *, split: str = "train",
                 scene_id: Optional[str] = None, **_):
        import json
        self.root = root
        self._scene_id = scene_id or os.path.basename(os.path.normpath(root))
        with open(os.path.join(root, f"transforms_{split}.json")) as f:
            meta = json.load(f)
        self.frames_meta = meta["frames"]
        n = len(self.frames_meta)
        self.c2ws = np.zeros((n, 4, 4), np.float32)
        for i, fr in enumerate(self.frames_meta):
            T = np.asarray(fr["transform_matrix"], np.float64)
            T[:3, :3] = T[:3, :3] @ _BLENDER_TO_OPENCV
            self.c2ws[i] = T
        img0 = self._load_rgba(0)
        self.H, self.W = img0.shape[:2]
        f = 0.5 * self.W / np.tan(0.5 * float(meta["camera_angle_x"]))
        self.intr = np.array([[f, 0, self.W / 2], [0, f, self.H / 2],
                              [0, 0, 1]], np.float32)

    def _img_path(self, i: int) -> str:
        p = os.path.join(self.root, self.frames_meta[i]["file_path"])
        return p if os.path.splitext(p)[1] else p + ".png"

    def _load_rgba(self, i: int) -> np.ndarray:
        from PIL import Image
        return np.asarray(Image.open(self._img_path(i)).convert("RGBA"),
                          np.float32) / 255.0

    def scene_ids(self) -> List[str]:
        return [self._scene_id]

    def get_scenario(self, scene_id: str = None, **kw) -> Dict[str, Any]:
        n = len(self.frames_meta)
        hws = np.tile(np.array([self.H, self.W]), (n, 1))
        intrs = np.tile(self.intr, (n, 1, 1))
        return _single_object_scenario(self._scene_id, n, self.c2ws, intrs,
                                       hws, main_class=self.main_class)

    def get_image(self, scene_id, cam_id, frame_index) -> np.ndarray:
        rgba = self._load_rgba(frame_index)
        # composite onto white (the NeRF-synthetic convention)
        return rgba[..., :3] * rgba[..., 3:] + (1.0 - rgba[..., 3:])

    def get_occupancy_mask(self, scene_id, cam_id, frame_index):
        return (self._load_rgba(frame_index)[..., 3] > 0.5).astype(np.float32)


# ---------------------------------------------------------------------------
# NeRS / MVMC single-instance dataset
# ---------------------------------------------------------------------------

def decode_coco_rle(rle: Dict[str, Any]) -> np.ndarray:
    """Decode an uncompressed COCO RLE ({'counts', 'size'}) to a bool mask.

    COCO RLE runs are column-major (Fortran order) over [H, W]; counts
    alternate (skip, fill) run lengths. Matches the semantics of the
    reference's rle_to_binary_mask (dataio/ners/instance_dataset.py:18-33)
    via a vectorized cumsum-based expansion instead of a Python run loop.
    """
    counts = rle["counts"]
    if isinstance(counts, str):
        counts = [int(c) for c in counts.split(" ")]
    counts = np.asarray(counts, np.int64)
    size = tuple(rle["size"])
    total = int(np.prod(size))
    # run start offsets: cumulative sum of all runs; fill runs are the odd ones
    ends = np.cumsum(counts)
    starts = ends - counts
    flat = np.zeros(total, dtype=bool)
    for s, e in zip(starts[1::2], ends[1::2]):
        flat[s:e] = True
    return flat.reshape(size, order="F")


class MVMCNeRSDataset(SceneDataset):
    """NeRS MVMC single-instance reader (reference
    dataio/ners/instance_dataset.py and instance_dataset_cropped.py).

    Layout: ``<root>/<instance_id>/annotations.json`` +
    ``<root>/<instance_id>/images/<filename>``. Each annotation carries a
    COCO-RLE instance mask, a bbox, and NeRS camera fits
    (``camera_optimized`` / ``camera_pretrained``) as pytorch3d-convention
    world-to-camera (R, T) plus a fov in degrees spanning the image NDC.

    Pose conversion: pytorch3d w2c (row-vector convention) → OpenCV c2w is
    ``c2w[:3,:3] = R; c2w[:3,3] = -R @ T`` followed by the axis flip
    ``diag(-1,-1,1)`` (pytorch3d's +X-left/+Y-up vs OpenCV's +X-right/
    +Y-down).

    With ``crop_size`` set, images/masks are cropped to a padded square
    around the bbox and resized (the reference's cropped variant); the
    focal spans the crop and the principal point is the original image
    center mapped into crop pixels (including the resize scale, which the
    upstream file drops).
    """

    main_class = "Main"

    def __init__(self, root: str, *, instance_id, scene_id: Optional[str] = None,
                 camera_type: str = "camera_optimized",
                 crop_size: Optional[int] = None, pad: float = 0.1, **_):
        import json
        instance_id = str(instance_id)
        self.instance_dir = os.path.join(root, instance_id)
        self._scene_id = scene_id or f"MVMC-{instance_id}"
        self.crop_size = crop_size
        with open(os.path.join(self.instance_dir, "annotations.json")) as f:
            annos = json.load(f)["annotations"]
        n = len(annos)
        self.image_paths = [os.path.join(self.instance_dir, "images",
                                         a["filename"]) for a in annos]
        self.masks = [decode_coco_rle(a["mask"]) for a in annos]
        hws = np.array([m.shape[:2] for m in self.masks], np.float64)
        Rs = np.array([a[camera_type]["R"] for a in annos], np.float64)
        Ts = np.array([a[camera_type]["T"] for a in annos], np.float64)
        fovs = np.deg2rad(np.array([a[camera_type]["fov"] for a in annos],
                                   np.float64))
        f_ndc = np.abs(1.0 / np.tan(fovs / 2.0))          # focal in NDC units

        if crop_size is None:
            self.hws = hws.astype(np.int32)
            intrs = np.zeros((n, 3, 3), np.float64)
            # fov spans full W (x) and H (y) separately — NeRS NDC convention
            intrs[:, 0, 0] = f_ndc * hws[:, 1] / 2.0
            intrs[:, 1, 1] = f_ndc * hws[:, 0] / 2.0
            intrs[:, 0, 2] = hws[:, 1] / 2.0
            intrs[:, 1, 2] = hws[:, 0] / 2.0
            intrs[:, 2, 2] = 1.0
            self.square_bboxes = None
        else:
            # padded square bbox around the instance, resized to crop_size
            bboxes = np.array([a["bbox"] for a in annos], np.float64)
            centers = (bboxes[:, :2] + bboxes[:, 2:]) / 2.0
            halves = (np.max(bboxes[:, 2:] - bboxes[:, :2], axis=1) / 2.0
                      * (1.0 + pad)).astype(np.int64)
            centers = centers.astype(np.int64)
            self.square_bboxes = np.concatenate(
                [centers - halves[:, None], centers + halves[:, None]], axis=1)
            scale = crop_size / (2.0 * halves)            # crop px per src px
            intrs = np.zeros((n, 3, 3), np.float64)
            intrs[:, 0, 0] = intrs[:, 1, 1] = f_ndc * crop_size / 2.0
            pp = (hws[:, [1, 0]] / 2.0 - self.square_bboxes[:, :2]) \
                * scale[:, None]
            intrs[:, :2, 2] = pp
            intrs[:, 2, 2] = 1.0
            self.hws = np.full((n, 2), crop_size, np.int32)
        self.intrs = intrs.astype(np.float32)

        c2ws = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
        c2ws[:, :3, :3] = Rs
        c2ws[:, :3, 3] = -np.einsum("nij,nj->ni", Rs, Ts)
        c2ws = c2ws @ np.diag([-1.0, -1.0, 1.0, 1.0])
        self.c2ws = c2ws.astype(np.float32)

    def _crop_resize(self, img: np.ndarray, i: int,
                     is_mask: bool) -> np.ndarray:
        if self.crop_size is None:
            return img
        from PIL import Image
        x0, y0, x1, y1 = (int(v) for v in self.square_bboxes[i])
        H, W = img.shape[:2]
        # pad-crop: out-of-bounds region is zeros
        out_shape = (y1 - y0, x1 - x0) + img.shape[2:]
        out = np.zeros(out_shape, img.dtype)
        sy0, sy1 = max(y0, 0), min(y1, H)
        sx0, sx1 = max(x0, 0), min(x1, W)
        out[sy0 - y0:sy1 - y0, sx0 - x0:sx1 - x0] = img[sy0:sy1, sx0:sx1]
        mode = Image.BILINEAR if is_mask else Image.LANCZOS
        pim = Image.fromarray(
            (out * 255).astype(np.uint8) if out.dtype != np.uint8 else out)
        res = np.asarray(pim.resize((self.crop_size, self.crop_size), mode),
                         np.float32) / 255.0
        return res

    def scene_ids(self) -> List[str]:
        return [self._scene_id]

    def get_scenario(self, scene_id: str = None, **kw) -> Dict[str, Any]:
        n = len(self.image_paths)
        return _single_object_scenario(self._scene_id, n, self.c2ws,
                                       self.intrs, np.asarray(self.hws),
                                       main_class=self.main_class)

    def get_image(self, scene_id, cam_id, frame_index) -> np.ndarray:
        img = load_rgb(self.image_paths[frame_index])
        return self._crop_resize(img, frame_index, is_mask=False)

    def get_occupancy_mask(self, scene_id, cam_id, frame_index):
        m = self.masks[frame_index].astype(np.float32)
        m = self._crop_resize(m, frame_index, is_mask=True)
        return (m > 0.5).astype(np.float32)
