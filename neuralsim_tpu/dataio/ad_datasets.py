"""Autonomous-driving dataset readers: KITTI, nuScenes, PandaSet.

Functional pure-python implementations of the readers the reference leaves
as stubs (``dataio/autonomous_driving/kitti/kitti_dataset.py`` — "To be
merged", empty bodies; ``nuscenes/nuscenes_dataset.py`` idem;
``pandaset/pandaset_dataset.py`` — shell only). Each parses the dataset's
native on-disk layout directly (no devkit dependencies) and emits the
universal scenario dict (SURVEY.md App. A.4) consumed by
``Scene.load_from_scenario`` — the same contract as ``WaymoDataset``.

Layouts:
  KITTI odometry   sequences/<seq>/{image_2/*.png, velodyne/*.bin, calib.txt}
                   + poses/<seq>.txt (or sequences/<seq>/poses.txt)
  nuScenes         v1.0-*/{scene,sample,sample_data,ego_pose,
                   calibrated_sensor,sensor}.json + samples/<CHANNEL>/*
  PandaSet         <seq>/camera/<name>/{NN.jpg,intrinsics.json,poses.json}
                   + <seq>/lidar/{NN.pkl(.gz), poses.json}
"""
from __future__ import annotations

import gzip
import json
import os
import pickle
from glob import glob
from typing import Any, Dict, List, Optional

import numpy as np

from .scene_dataset import SceneDataset


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

def _quat_to_mat(w: float, x: float, y: float, z: float) -> np.ndarray:
    """Rotation matrix from a (w, x, y, z) quaternion (host-side numpy;
    the jnp version lives in maths/transforms.py)."""
    q = np.array([w, x, y, z], np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _pose_mat(rot: np.ndarray, trans) -> np.ndarray:
    T = np.eye(4)
    T[:3, :3] = rot
    T[:3, 3] = np.asarray(trans, np.float64)
    return T


def _load_image(path: str) -> np.ndarray:
    from PIL import Image
    return np.asarray(Image.open(path), np.float32)[..., :3] / 255.0


def _points_to_rays(pts_sensor: np.ndarray) -> Dict[str, np.ndarray]:
    """Sensor-frame points -> {'rays_o','rays_d','ranges'} (the SceneDataset
    lidar contract, scene_dataset.py:48)."""
    r = np.linalg.norm(pts_sensor, axis=-1)
    keep = r > 1e-6
    pts, r = pts_sensor[keep], r[keep]
    return {"rays_o": np.zeros_like(pts, dtype=np.float32),
            "rays_d": (pts / r[:, None]).astype(np.float32),
            "ranges": r.astype(np.float32)}


# ---------------------------------------------------------------------------
# KITTI (odometry layout)
# ---------------------------------------------------------------------------

class KITTIDataset(SceneDataset):
    """KITTI odometry-layout reader (reference stub: kitti_dataset.py).

    Scene id = sequence name ("00", "01", ...). Camera poses come from the
    ground-truth ``poses`` file (cam0 frame); the color camera (image_2) is
    offset by the P2 baseline. Velodyne scans become sensor-frame rays with
    the velodyne node parented at ``Tr``-derived world transforms.
    """

    def __init__(self, root: str, camera: str = "image_2", **_):
        self.root = root
        self.camera = camera

    # -- layout ---------------------------------------------------------------
    def _seq_dir(self, scene_id: str) -> str:
        d = os.path.join(self.root, "sequences", scene_id)
        return d if os.path.isdir(d) else os.path.join(self.root, scene_id)

    def scene_ids(self) -> List[str]:
        base = os.path.join(self.root, "sequences")
        if not os.path.isdir(base):
            base = self.root
        return sorted(d for d in os.listdir(base)
                      if os.path.isdir(os.path.join(base, d)))

    def _calib(self, scene_id: str) -> Dict[str, np.ndarray]:
        out = {}
        with open(os.path.join(self._seq_dir(scene_id), "calib.txt")) as f:
            for line in f:
                if ":" not in line:
                    continue
                k, v = line.split(":", 1)
                vals = np.array([float(t) for t in v.split()], np.float64)
                out[k.strip()] = vals.reshape(3, 4)
        return out

    def _poses(self, scene_id: str) -> np.ndarray:
        for p in (os.path.join(self.root, "poses", f"{scene_id}.txt"),
                  os.path.join(self._seq_dir(scene_id), "poses.txt")):
            if os.path.isfile(p):
                flat = np.loadtxt(p).reshape(-1, 3, 4)
                T = np.tile(np.eye(4), (len(flat), 1, 1))
                T[:, :3, :] = flat
                return T
        raise FileNotFoundError(f"KITTI poses for sequence {scene_id}")

    def get_scenario(self, scene_id: str, **kw) -> Dict[str, Any]:
        calib = self._calib(scene_id)
        poses_cam0 = self._poses(scene_id)              # [T, 4, 4] cam0->world
        T_n = len(poses_cam0)
        cam_key = {"image_2": "P2", "image_3": "P3",
                   "image_0": "P0", "image_1": "P1"}[self.camera]
        P = calib[cam_key]
        K = P[:3, :3]
        # horizontal stereo baseline of this camera vs cam0: x = -P[0,3]/fx
        t_cam = np.array([-P[0, 3] / P[0, 0], 0.0, 0.0])
        c2w = poses_cam0 @ _pose_mat(np.eye(3), t_cam)

        img0 = glob(os.path.join(self._seq_dir(scene_id), self.camera, "*"))
        H, W = (_load_image(sorted(img0)[0]).shape[:2] if img0 else (376, 1241))

        observers: Dict[str, Any] = {
            self.camera: {
                "class_name": "Camera", "n_frames": T_n,
                "camera_model": "pinhole",
                "data": {
                    "transform": c2w.astype(np.float32),
                    "intr": np.tile(K.astype(np.float32), (T_n, 1, 1)),
                    "hw": np.tile(np.array([H, W], np.int32), (T_n, 1)),
                },
            },
        }
        if "Tr" in calib and os.path.isdir(
                os.path.join(self._seq_dir(scene_id), "velodyne")):
            Tr = np.eye(4)
            Tr[:3, :] = calib["Tr"]                     # velodyne -> cam0
            observers["velodyne"] = {
                "class_name": "RaysLidar", "n_frames": T_n,
                "data": {"transform": (poses_cam0 @ Tr).astype(np.float32)},
            }
        return {"scene_id": scene_id,
                "metas": {"num_frames": T_n, "up_vec": "-y"},
                "observers": observers, "objects": {}}

    def get_image(self, scene_id: str, cam_id: str, frame_index: int
                  ) -> np.ndarray:
        for ext in ("png", "jpg"):
            p = os.path.join(self._seq_dir(scene_id), cam_id,
                             f"{frame_index:06d}.{ext}")
            if os.path.isfile(p):
                return _load_image(p)
        raise FileNotFoundError(f"KITTI {scene_id}/{cam_id}/{frame_index}")

    def get_lidar(self, scene_id: str, lidar_id: str, frame_index: int
                  ) -> Optional[Dict[str, np.ndarray]]:
        p = os.path.join(self._seq_dir(scene_id), "velodyne",
                         f"{frame_index:06d}.bin")
        if not os.path.isfile(p):
            return None
        pts = np.fromfile(p, np.float32).reshape(-1, 4)[:, :3]
        return _points_to_rays(pts)


# ---------------------------------------------------------------------------
# nuScenes (devkit-free JSON-table reader)
# ---------------------------------------------------------------------------

class NuScenesDataset(SceneDataset):
    """nuScenes reader over the raw JSON tables (reference stub:
    nuscenes_dataset.py). Scene id = scene ``name`` (e.g. "scene-0061").
    Keyframe samples only; per-sensor world transforms are
    ego_pose @ calibrated_sensor. Boxes from sample_annotation become
    scenario objects with per-frame transforms/validity.
    """

    CAMERAS = ("CAM_FRONT", "CAM_FRONT_LEFT", "CAM_FRONT_RIGHT",
               "CAM_BACK", "CAM_BACK_LEFT", "CAM_BACK_RIGHT")

    def __init__(self, root: str, version: str = "v1.0-mini",
                 cameras: Optional[List[str]] = None,
                 with_annotations: bool = True, **_):
        self.root = root
        self.version = version
        self.cameras = list(cameras) if cameras else list(self.CAMERAS)
        self.with_annotations = with_annotations
        self._tables: Dict[str, List[Dict]] = {}

    def _table(self, name: str) -> List[Dict]:
        if name not in self._tables:
            with open(os.path.join(self.root, self.version,
                                   f"{name}.json")) as f:
                self._tables[name] = json.load(f)
        return self._tables[name]

    def _index(self, name: str) -> Dict[str, Dict]:
        key = f"_{name}_by_token"
        if key not in self._tables:
            self._tables[key] = {r["token"]: r for r in self._table(name)}
        return self._tables[key]

    def scene_ids(self) -> List[str]:
        return [s["name"] for s in self._table("scene")]

    def _scene_rec(self, scene_id: str) -> Dict:
        for s in self._table("scene"):
            if s["name"] == scene_id or s["token"] == scene_id:
                return s
        raise KeyError(f"nuScenes scene {scene_id}")

    def _samples(self, scene_id: str) -> List[Dict]:
        samples = self._index("sample")
        rec = self._scene_rec(scene_id)
        out, tok = [], rec["first_sample_token"]
        while tok:
            s = samples[tok]
            out.append(s)
            tok = s["next"]
        return out

    def _sample_data_by_sample(self, scene_id: str) -> Dict[str, Dict[str, Dict]]:
        """{channel: {sample_token: sample_data record}} (keyframes only)."""
        key = f"_sd_{scene_id}"
        if key not in self._tables:
            sample_toks = {s["token"] for s in self._samples(scene_id)}
            sensors = self._index("sensor")
            calib = self._index("calibrated_sensor")
            out: Dict[str, Dict[str, Dict]] = {}
            for sd in self._table("sample_data"):
                if not sd["is_key_frame"] or sd["sample_token"] not in sample_toks:
                    continue
                ch = sensors[calib[sd["calibrated_sensor_token"]]
                             ["sensor_token"]]["channel"]
                out.setdefault(ch, {})[sd["sample_token"]] = sd
            self._tables[key] = out
        return self._tables[key]

    def _sensor_pose(self, sd: Dict) -> np.ndarray:
        ego = self._index("ego_pose")[sd["ego_pose_token"]]
        cal = self._index("calibrated_sensor")[sd["calibrated_sensor_token"]]
        T_ego = _pose_mat(_quat_to_mat(*ego["rotation"]), ego["translation"])
        T_sen = _pose_mat(_quat_to_mat(*cal["rotation"]), cal["translation"])
        return T_ego @ T_sen

    def get_scenario(self, scene_id: str, **kw) -> Dict[str, Any]:
        samples = self._samples(scene_id)
        T_n = len(samples)
        by_ch = self._sample_data_by_sample(scene_id)
        calib = self._index("calibrated_sensor")
        observers: Dict[str, Any] = {}
        for ch in self.cameras:
            sds = by_ch.get(ch)
            if not sds:
                continue
            tra = np.tile(np.eye(4, dtype=np.float32), (T_n, 1, 1))
            intr = np.zeros((T_n, 3, 3), np.float32)
            hw = np.zeros((T_n, 2), np.int32)
            valid = np.zeros((T_n,), bool)
            for i, s in enumerate(samples):
                sd = sds.get(s["token"])
                if sd is None:
                    continue
                tra[i] = self._sensor_pose(sd)
                intr[i] = np.asarray(
                    calib[sd["calibrated_sensor_token"]]["camera_intrinsic"],
                    np.float32)
                hw[i] = (sd["height"], sd["width"])
                valid[i] = True
            observers[ch] = {"class_name": "Camera", "n_frames": T_n,
                             "camera_model": "pinhole",
                             "data": {"transform": tra, "intr": intr,
                                      "hw": hw, "valid": valid}}
        if "LIDAR_TOP" in by_ch:
            sds = by_ch["LIDAR_TOP"]
            tra = np.tile(np.eye(4, dtype=np.float32), (T_n, 1, 1))
            valid = np.zeros((T_n,), bool)
            for i, s in enumerate(samples):
                sd = sds.get(s["token"])
                if sd is not None:
                    tra[i] = self._sensor_pose(sd)
                    valid[i] = True
            observers["LIDAR_TOP"] = {"class_name": "RaysLidar",
                                      "n_frames": T_n,
                                      "data": {"transform": tra,
                                               "valid": valid}}

        objects: Dict[str, Any] = {}
        if self.with_annotations and self._has_table("sample_annotation"):
            objects = self._objects(samples)
        return {"scene_id": scene_id,
                "metas": {"num_frames": T_n, "up_vec": "+z"},
                "observers": observers, "objects": objects}

    def _has_table(self, name: str) -> bool:
        return os.path.isfile(os.path.join(self.root, self.version,
                                           f"{name}.json"))

    def _objects(self, samples: List[Dict]) -> Dict[str, Any]:
        """sample_annotation boxes -> scenario objects (per-frame transform,
        size, validity), Vehicle/Pedestrian classes mapped like the waymo
        preprocessor."""
        T_n = len(samples)
        idx = {s["token"]: i for i, s in enumerate(samples)}
        inst = self._index("instance")
        cat = self._index("category")
        out: Dict[str, Any] = {}
        for a in self._table("sample_annotation"):
            i = idx.get(a["sample_token"])
            if i is None:
                continue
            oid = a["instance_token"][:12]
            if oid not in out:
                cname = cat[inst[a["instance_token"]]
                            ["category_token"]]["name"]
                klass = ("Vehicle" if cname.startswith("vehicle")
                         else "Pedestrian" if cname.startswith("human")
                         else "Unknown")
                out[oid] = {
                    "class_name": klass, "n_frames": T_n,
                    "data": {
                        "transform": np.tile(np.eye(4, dtype=np.float32),
                                             (T_n, 1, 1)),
                        "size": np.zeros((T_n, 3), np.float32),
                        "valid": np.zeros((T_n,), bool),
                    },
                }
            o = out[oid]["data"]
            o["transform"][i] = _pose_mat(_quat_to_mat(*a["rotation"]),
                                          a["translation"])
            # nuScenes wlh -> lwh
            w, l, h = a["size"]
            o["size"][i] = (l, w, h)
            o["valid"][i] = True
        return out

    def _file_of(self, scene_id: str, channel: str, frame_index: int) -> str:
        sds = self._sample_data_by_sample(scene_id).get(channel, {})
        samples = self._samples(scene_id)
        sd = sds.get(samples[frame_index]["token"])
        if sd is None:
            raise FileNotFoundError(
                f"nuScenes {scene_id}/{channel}/{frame_index}")
        return os.path.join(self.root, sd["filename"])

    def get_image(self, scene_id: str, cam_id: str, frame_index: int
                  ) -> np.ndarray:
        return _load_image(self._file_of(scene_id, cam_id, frame_index))

    def get_lidar(self, scene_id: str, lidar_id: str, frame_index: int
                  ) -> Optional[Dict[str, np.ndarray]]:
        try:
            p = self._file_of(scene_id, lidar_id, frame_index)
        except FileNotFoundError:
            return None
        # .pcd.bin: float32 x,y,z,intensity,ring
        pts = np.fromfile(p, np.float32).reshape(-1, 5)[:, :3]
        return _points_to_rays(pts)


# ---------------------------------------------------------------------------
# PandaSet
# ---------------------------------------------------------------------------

class PandaSetDataset(SceneDataset):
    """PandaSet reader (reference shell: pandaset_dataset.py; pose math per
    the public pandaset-devkit conventions the reference's preprocess.py
    targets). Scene id = sequence name ("001", ...). Cameras are direct
    world children (no ego node); LiDAR pkl frames store WORLD-frame points,
    converted back to sensor-frame rays via the per-frame lidar pose.
    """

    def __init__(self, root: str, cameras: Optional[List[str]] = None, **_):
        self.root = root
        self.cameras = cameras

    def scene_ids(self) -> List[str]:
        return sorted(d for d in os.listdir(self.root)
                      if os.path.isdir(os.path.join(self.root, d, "camera")))

    def _cam_names(self, scene_id: str) -> List[str]:
        base = os.path.join(self.root, scene_id, "camera")
        names = sorted(d for d in os.listdir(base)
                       if os.path.isdir(os.path.join(base, d)))
        return [n for n in names if not self.cameras or n in self.cameras]

    @staticmethod
    def _pose_from_json(e: Dict) -> np.ndarray:
        h, p = e["heading"], e["position"]
        return _pose_mat(_quat_to_mat(h["w"], h["x"], h["y"], h["z"]),
                         (p["x"], p["y"], p["z"]))

    def get_scenario(self, scene_id: str, **kw) -> Dict[str, Any]:
        seq = os.path.join(self.root, scene_id)
        observers: Dict[str, Any] = {}
        T_n = None
        for cam in self._cam_names(scene_id):
            cd = os.path.join(seq, "camera", cam)
            with open(os.path.join(cd, "intrinsics.json")) as f:
                K = json.load(f)
            with open(os.path.join(cd, "poses.json")) as f:
                poses = json.load(f)
            T_n = len(poses) if T_n is None else min(T_n, len(poses))
            c2w = np.stack([self._pose_from_json(e) for e in poses])
            intr = np.array([[K["fx"], 0, K["cx"]],
                             [0, K["fy"], K["cy"]],
                             [0, 0, 1]], np.float32)
            imgs = sorted(glob(os.path.join(cd, "*.jpg")))
            H, W = (_load_image(imgs[0]).shape[:2] if imgs else (1080, 1920))
            observers[cam] = {
                "class_name": "Camera", "n_frames": len(poses),
                "camera_model": "pinhole",
                "data": {"transform": c2w.astype(np.float32),
                         "intr": np.tile(intr, (len(poses), 1, 1)),
                         "hw": np.tile(np.array([H, W], np.int32),
                                       (len(poses), 1))},
            }
        lp = os.path.join(seq, "lidar", "poses.json")
        if os.path.isfile(lp):
            with open(lp) as f:
                poses = json.load(f)
            l2w = np.stack([self._pose_from_json(e) for e in poses])
            observers["lidar"] = {
                "class_name": "RaysLidar", "n_frames": len(poses),
                "data": {"transform": l2w.astype(np.float32)},
            }
            T_n = len(poses) if T_n is None else min(T_n, len(poses))
        return {"scene_id": scene_id,
                "metas": {"num_frames": T_n or 0, "up_vec": "+z"},
                "observers": observers, "objects": {}}

    def get_image(self, scene_id: str, cam_id: str, frame_index: int
                  ) -> np.ndarray:
        return _load_image(os.path.join(self.root, scene_id, "camera",
                                        cam_id, f"{frame_index:02d}.jpg"))

    def get_lidar(self, scene_id: str, lidar_id: str, frame_index: int
                  ) -> Optional[Dict[str, np.ndarray]]:
        base = os.path.join(self.root, scene_id, "lidar")
        pkl = None
        for ext in (".pkl.gz", ".pkl"):
            p = os.path.join(base, f"{frame_index:02d}{ext}")
            if os.path.isfile(p):
                pkl = p
                break
        if pkl is None:
            return None
        opener = gzip.open if pkl.endswith(".gz") else open
        with opener(pkl, "rb") as f:
            df = pickle.load(f)
        # pandas DataFrame with world-frame x/y/z columns
        pts_w = np.stack([np.asarray(df["x"], np.float64),
                          np.asarray(df["y"], np.float64),
                          np.asarray(df["z"], np.float64)], -1)
        with open(os.path.join(base, "poses.json")) as f:
            pose = self._pose_from_json(json.load(f)[frame_index])
        R, t = pose[:3, :3], pose[:3, 3]
        return _points_to_rays((pts_w - t) @ R)
