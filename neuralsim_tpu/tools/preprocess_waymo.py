"""Waymo Open Dataset tfrecord -> preprocessed training layout.

TPU-native re-implementation of the reference's
``dataio/autonomous_driving/waymo/preprocess.py`` (:91 main loop, :505-519
ego-motion-compensated LiDAR rays — SURVEY.md §2.5): converts raw
``segment-*.tfrecord`` files into the universal layout the WaymoDataset
reader consumes (byte-compatible with data preprocessed for the reference):

    out_root/<seq_name>/
        scenario.pt                        (universal scenario dict)
        images/<cam_id>/<frame:08d>.jpg    (raw JPEG bytes from the proto)
        lidars/<lidar_id>/<frame:08d>.npz  (rays_o, rays_d, ranges —
                                            sensor frame at frame pose,
                                            per-return ego-motion compensated
                                            for the TOP lidar)

Mask / mono-cue extraction (reference extract_masks.py /
extract_mono_cues.py) requires pretrained segmentation & mono networks that
are not shipped; those outputs remain optional inputs the reader consumes
when present.

Frame decoding uses the pure-Python wire parser in ``dataio/waymo_proto``
(no waymo_open_dataset dependency). Usage::

    python -m neuralsim_tpu.tools.preprocess_waymo \
        --src /data/waymo/raw --out /data/waymo/processed [--seq_list a,b]
"""
from __future__ import annotations

import argparse
import glob
import os
from typing import Any, Dict, List, Optional

import numpy as np

from ..dataio.waymo_proto import iter_tfrecord, parse_frame

# OpenCV camera axes (x right, y down, z forward) expressed in the Waymo
# camera frame (x forward, y left, z up): columns are the OpenCV basis.
OPENCV_TO_WAYMO_CAM = np.array([[0.0, 0.0, 1.0],
                                [-1.0, 0.0, 0.0],
                                [0.0, -1.0, 0.0]])


def _rpy_to_rot(roll, pitch, yaw):
    cr, sr = np.cos(roll), np.sin(roll)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    return Rz @ Ry @ Rx


def lidar_rays_from_range_image(ri: np.ndarray, calib: Dict[str, Any],
                                frame_pose: np.ndarray,
                                pixel_pose: Optional[np.ndarray] = None
                                ) -> Dict[str, np.ndarray]:
    """Range image [H, W, C>=1] -> per-return rays in the SENSOR frame at the
    frame pose (reference preprocess.py:505-519 semantics).

    Without ``pixel_pose`` rays originate at the sensor origin. With the TOP
    lidar's per-pixel vehicle pose, each return is lifted to world at its
    own capture time and re-expressed in the frame-time sensor frame —
    ego-motion compensation — so rays get per-return origins.
    """
    H, W = ri.shape[:2]
    rng = ri[..., 0]
    valid = rng > 0

    incl = np.asarray(calib["beam_inclinations"], np.float64)
    if incl.size != H:
        incl = np.linspace(calib.get("beam_inclination_min", -0.3),
                           calib.get("beam_inclination_max", 0.3), H)
    incl = incl[::-1]                       # row 0 = highest beam
    extr = np.asarray(calib["extrinsic"], np.float64)
    az_correction = np.arctan2(extr[1, 0], extr[0, 0])
    ratios = (np.arange(W) + 0.5) / W
    azimuth = (1.0 - 2.0 * ratios) * np.pi - az_correction

    az = np.broadcast_to(azimuth[None, :], (H, W))
    el = np.broadcast_to(incl[:, None], (H, W))
    dirs_s = np.stack([np.cos(el) * np.cos(az),
                       np.cos(el) * np.sin(az),
                       np.sin(el)], -1)      # unit, sensor frame

    if pixel_pose is None:
        d = dirs_s[valid].astype(np.float32)
        return {"rays_o": np.zeros_like(d), "rays_d": d,
                "ranges": rng[valid].astype(np.float32)}

    # per-pixel vehicle pose: [H, W, 6] (roll, pitch, yaw, x, y, z)
    pts_s = dirs_s * rng[..., None]
    R_e, t_e = extr[:3, :3], extr[:3, 3]
    pts_v = pts_s @ R_e.T + t_e             # vehicle frame at pixel time
    rpy = pixel_pose[..., :3]
    txyz = pixel_pose[..., 3:]
    # world at pixel time
    pts_w = np.einsum("hwij,hwj->hwi",
                      _rpy_to_rot_batch(rpy), pts_v) + txyz
    org_v = np.broadcast_to(t_e, pts_v.shape)
    org_w = np.einsum("hwij,hwj->hwi",
                      _rpy_to_rot_batch(rpy), org_v) + txyz
    # back to frame-time vehicle, then sensor frame
    inv_fp = np.linalg.inv(frame_pose)
    inv_e = np.linalg.inv(extr)

    def w2s(p):
        pv = p @ inv_fp[:3, :3].T + inv_fp[:3, 3]
        return pv @ inv_e[:3, :3].T + inv_e[:3, 3]

    pts = w2s(pts_w)[valid]
    orgs = w2s(org_w)[valid]
    delta = pts - orgs
    ranges = np.linalg.norm(delta, axis=-1)
    d = delta / np.clip(ranges[:, None], 1e-9, None)
    return {"rays_o": orgs.astype(np.float32), "rays_d": d.astype(np.float32),
            "ranges": ranges.astype(np.float32)}


def _rpy_to_rot_batch(rpy: np.ndarray) -> np.ndarray:
    roll, pitch, yaw = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cr, sr = np.cos(roll), np.sin(roll)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    R = np.zeros(rpy.shape[:-1] + (3, 3))
    R[..., 0, 0] = cy * cp
    R[..., 0, 1] = cy * sp * sr - sy * cr
    R[..., 0, 2] = cy * sp * cr + sy * sr
    R[..., 1, 0] = sy * cp
    R[..., 1, 1] = sy * sp * sr + cy * cr
    R[..., 1, 2] = sy * sp * cr - cy * sr
    R[..., 2, 0] = -sp
    R[..., 2, 1] = cp * sr
    R[..., 2, 2] = cp * cr
    return R


def _box_transform(center, heading):
    T = np.eye(4)
    c, s = np.cos(heading), np.sin(heading)
    T[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    T[:3, 3] = center
    return T


def process_sequence(tfrecord_path: str, out_root: str, *,
                     seq_name: Optional[str] = None,
                     class_names: Dict[str, str] = None) -> str:
    """One segment tfrecord -> out_root/<seq_name>/ (returns the seq dir)."""
    class_names = class_names or {"Vehicle": "Vehicle",
                                  "Pedestrian": "Pedestrian",
                                  "Cyclist": "Cyclist"}
    frames = [parse_frame(rec) for rec in iter_tfrecord(tfrecord_path)]
    if not frames:
        raise ValueError(f"no frames in {tfrecord_path}")
    if seq_name is None:
        seq_name = frames[0]["context_name"] or \
            os.path.splitext(os.path.basename(tfrecord_path))[0]
        seq_name = seq_name.replace("segment-", "").split(".")[0] or "seq"
    seq_dir = os.path.join(out_root, seq_name)
    os.makedirs(seq_dir, exist_ok=True)
    T = len(frames)

    # --- ego poses, offset so coordinates stay float32-friendly ------------
    ego = np.stack([f["pose"] for f in frames])            # [T, 4, 4]
    world_offset = ego[0, :3, 3].copy()
    ego_c = ego.copy()
    ego_c[:, :3, 3] -= world_offset

    # --- cameras ------------------------------------------------------------
    cam_children: Dict[str, Any] = {}
    for cam_id, cal in frames[0]["camera_calib"].items():
        fu, fv, cu, cv = cal["intrinsic"][:4]
        dist = np.asarray(cal["intrinsic"][4:9], np.float32) \
            if len(cal["intrinsic"]) >= 9 else np.zeros(5, np.float32)
        intr = np.array([[fu, 0, cu], [0, fv, cv], [0, 0, 1]], np.float32)
        extr = np.asarray(cal["extrinsic"])
        extr_cv = extr.copy()
        extr_cv[:3, :3] = extr[:3, :3] @ OPENCV_TO_WAYMO_CAM
        cam_children[f"camera_{cam_id}"] = {
            "class_name": "Camera", "n_frames": T,
            "data": {
                "transform": np.tile(extr_cv.astype(np.float32), (T, 1, 1)),
                "intr": np.tile(intr, (T, 1, 1)),
                "hw": np.tile(np.array([cal["height"], cal["width"]],
                                       np.int32), (T, 1)),
                "distortion": np.tile(dist, (T, 1)),
                "global_ts": np.asarray(
                    [f["timestamp_micros"] * 1e-6 for f in frames],
                    np.float64) - frames[0]["timestamp_micros"] * 1e-6,
            },
        }
        cdir = os.path.join(seq_dir, "images", f"camera_{cam_id}")
        os.makedirs(cdir, exist_ok=True)
        for fi, f in enumerate(frames):
            jpg = f["cameras"].get(cam_id)
            if jpg:
                with open(os.path.join(cdir, f"{fi:08d}.jpg"), "wb") as fh:
                    fh.write(jpg)

    # --- lidars -------------------------------------------------------------
    lidar_children: Dict[str, Any] = {}
    for lid, cal in frames[0]["laser_calib"].items():
        lidar_children[f"lidar_{lid}"] = {
            "class_name": "RaysLidar", "n_frames": T,
            "data": {"transform": np.tile(
                np.asarray(cal["extrinsic"], np.float32), (T, 1, 1))},
        }
        ldir = os.path.join(seq_dir, "lidars", f"lidar_{lid}")
        os.makedirs(ldir, exist_ok=True)
        for fi, f in enumerate(frames):
            las = f["lasers"].get(lid)
            if las is None or las["ri"] is None:
                continue
            ri = las["ri"]
            if ri.ndim == 2:
                ri = ri[..., None]
            rays = lidar_rays_from_range_image(
                ri, f["laser_calib"].get(lid, cal), f["pose"],
                pixel_pose=las.get("pose"))
            np.savez_compressed(os.path.join(ldir, f"{fi:08d}.npz"), **rays)

    # --- objects from laser-label tracks ------------------------------------
    tracks: Dict[str, Dict[int, Dict]] = {}
    types: Dict[str, str] = {}
    for fi, f in enumerate(frames):
        for lb in f["labels"]:
            if lb["type"] not in class_names:
                continue
            tracks.setdefault(lb["id"], {})[fi] = lb
            types[lb["id"]] = class_names[lb["type"]]
    objects: Dict[str, Any] = {}
    for tid, seen in tracks.items():
        fis = sorted(seen)
        start, end = fis[0], fis[-1]
        n = end - start + 1
        tf = np.zeros((n, 4, 4), np.float32)
        sc = np.zeros((n, 3), np.float32)
        valid = np.zeros((n,), bool)
        for fi in range(start, end + 1):
            src = seen.get(fi) or seen[min(fis, key=lambda j: abs(j - fi))]
            # box center given in the VEHICLE frame -> world
            box_w = ego_c[fi] @ _box_transform(src["center"], src["heading"])
            tf[fi - start] = box_w
            sc[fi - start] = src["size"] * 0.5   # unit-cube canonical space
            valid[fi - start] = fi in seen
        objects[tid] = {
            "class_name": types[tid],
            "segments": [{"start_frame": start, "n_frames": n,
                          "data": {"transform": tf, "scale": sc,
                                   "valid": valid}}],
        }

    scenario = {
        "scene_id": seq_name,
        "metas": {"num_frames": T, "up_vec": "+z",
                  "world_offset": world_offset.astype(np.float32),
                  "ego_car_id": "ego_car"},
        "observers": {
            "ego_car": {"class_name": "EgoVehicle", "n_frames": T,
                        "data": {"transform": ego_c.astype(np.float32),
                                 "global_ts": np.asarray(
                                     [f["timestamp_micros"] * 1e-6
                                      for f in frames], np.float64)
                                 - frames[0]["timestamp_micros"] * 1e-6},
                        "children": {**cam_children, **lidar_children}},
        },
        "objects": objects,
    }
    import torch
    torch.save(scenario, os.path.join(seq_dir, "scenario.pt"))
    return seq_dir


def main(argv=None):
    p = argparse.ArgumentParser("waymo tfrecord preprocessing",
                                allow_abbrev=False)
    p.add_argument("--src", required=True,
                   help="tfrecord file or directory of segment-*.tfrecord")
    p.add_argument("--out", required=True, help="output root")
    p.add_argument("--seq_list", default=None,
                   help="comma-separated sequence basenames to keep")
    args = p.parse_args(argv)
    if os.path.isdir(args.src):
        paths = sorted(glob.glob(os.path.join(args.src, "*.tfrecord")))
    else:
        paths = [args.src]
    if args.seq_list:
        keep = set(args.seq_list.split(","))
        paths = [p_ for p_ in paths
                 if os.path.basename(p_).split(".")[0] in keep]
    for path in paths:
        out = process_sequence(path, args.out)
        print(f"processed {path} -> {out}", flush=True)


if __name__ == "__main__":
    main()
