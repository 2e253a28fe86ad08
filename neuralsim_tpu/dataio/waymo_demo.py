"""Fabricate a Waymo-LAYOUT multi-object driving sequence with analytic GT.

Writes the exact universal format the reference's Waymo preprocessing emits
(scenario.pt + images/ + lidars/ + masks/ — reference
``dataio/autonomous_driving/waymo/preprocess.py:91,505-519``, our
``tools/preprocess_waymo.py``), so the full code_multi toolchain
(``WaymoDataset`` reader -> scene graph with ego-child camera_FRONT /
lidar_TOP -> ``train_multi`` -> ``eval_multi`` -> ``render``) can be driven
end-to-end without real Waymo data (BASELINE.md target config #5).

The scene: an ego car driving +x over a ground plane with lane markings,
K vehicles (spheres in unit-cube canonical space, like the preprocessed box
tracks) parked / leading / oncoming, a horizon band (distant content), and a
sky gradient. Everything is sphere-traced from an analytic SDF, so images,
masks (Waymo semantic taxonomy: sky=10, vehicle=13), and LiDAR ranges are
exact.
"""
from __future__ import annotations

import math
import os
from typing import Dict, List

import numpy as np

# camera-to-ego rotation, OpenCV convention (x right, y down, z forward),
# ego +x forward / +y left / +z up
R_CAM2EGO = np.array([[0.0, 0.0, 1.0],
                      [-1.0, 0.0, 0.0],
                      [0.0, -1.0, 0.0]], np.float32)

VEH_COLORS = np.array([[0.85, 0.25, 0.2], [0.2, 0.4, 0.85],
                       [0.9, 0.75, 0.2], [0.3, 0.75, 0.4],
                       [0.7, 0.3, 0.8]], np.float32)


class DemoDrive:
    """Analytic driving scene: ego trajectory + vehicle tracks + SDF."""

    def __init__(self, n_frames: int = 8, speed: float = 1.5,
                 n_vehicles: int = 3, seed: int = 0):
        self.T = n_frames
        self.speed = speed
        self.K = n_vehicles
        rng = np.random.default_rng(seed)
        # vehicle k: lane offset, start x, velocity, radius
        lanes = [-2.2, 2.2, 0.0, -2.2, 2.2]
        self.veh = []
        for k in range(n_vehicles):
            self.veh.append({
                "y": lanes[k % len(lanes)],
                "x0": 6.0 + 4.0 * k + rng.uniform(-1, 1),
                "v": [0.0, speed * 0.7, -speed * 1.5][k % 3],
                "r": 0.9 + 0.15 * (k % 2),
            })

    def ego_pose(self, fi: int) -> np.ndarray:
        p = np.eye(4, dtype=np.float32)
        p[0, 3] = self.speed * fi
        p[2, 3] = 1.8
        return p

    def veh_center(self, k: int, fi: int) -> np.ndarray:
        v = self.veh[k]
        return np.array([v["x0"] + v["v"] * fi, v["y"], v["r"]], np.float32)

    # -- analytic geometry ----------------------------------------------------
    def sdf(self, p: np.ndarray, fi: int) -> np.ndarray:
        d = p[..., 2]                                       # ground z=0
        for k in range(self.K):
            c = self.veh_center(k, fi)
            d = np.minimum(d, np.linalg.norm(p - c, axis=-1) - self.veh[k]["r"])
        return d

    def albedo(self, p: np.ndarray, fi: int) -> np.ndarray:
        out = np.empty(p.shape, np.float32)
        # road: gray with dashed center-line stripes
        stripe = ((np.abs(p[..., 1]) < 0.15)
                  & ((p[..., 0] % 3.0) < 1.5))
        road = np.where(stripe[..., None],
                        np.array([0.85, 0.8, 0.3], np.float32),
                        np.array([0.35, 0.35, 0.37], np.float32)
                        + 0.05 * np.cos(p[..., :1] * 2.0))
        out[:] = road
        best = p[..., 2].copy()                             # ground distance
        for k in range(self.K):
            c = self.veh_center(k, fi)
            dk = np.linalg.norm(p - c, axis=-1) - self.veh[k]["r"]
            sel = dk < best
            out[sel] = VEH_COLORS[k % len(VEH_COLORS)]
            best = np.minimum(best, dk)
        return out

    def semantic(self, p: np.ndarray, hit: np.ndarray, fi: int) -> np.ndarray:
        sem = np.zeros(hit.shape, np.uint8)                 # road/other = 0
        sem[~hit] = 10                                      # sky
        best = np.where(hit, p[..., 2], np.inf)
        for k in range(self.K):
            c = self.veh_center(k, fi)
            dk = np.linalg.norm(p - c, axis=-1) - self.veh[k]["r"]
            sem[hit & (dk < best)] = 13                     # vehicle
            best = np.minimum(best, dk)
        return sem

    def trace(self, o: np.ndarray, d: np.ndarray, fi: int, max_t=60.0):
        t = np.full(d.shape[:-1], 0.05, np.float64)
        for _ in range(96):
            p = o + t[..., None] * d
            t = t + np.clip(self.sdf(p, fi), -0.1, 1.0)
            t = np.minimum(t, max_t)
        p = o + t[..., None] * d
        hit = (np.abs(self.sdf(p, fi)) < 5e-3) & (t < max_t * 0.99)
        return p, t, hit

    def shade(self, p, d, hit, fi) -> np.ndarray:
        eps = 1e-3
        g = np.stack([self.sdf(p + np.array([eps, 0, 0]), fi)
                      - self.sdf(p - np.array([eps, 0, 0]), fi),
                      self.sdf(p + np.array([0, eps, 0]), fi)
                      - self.sdf(p - np.array([0, eps, 0]), fi),
                      self.sdf(p + np.array([0, 0, eps]), fi)
                      - self.sdf(p - np.array([0, 0, eps]), fi)], -1)
        n = g / np.clip(np.linalg.norm(g, axis=-1, keepdims=True), 1e-9, None)
        light = np.array([0.3, 0.25, -0.91])
        light /= np.linalg.norm(light)
        lam = np.clip(-(n * light).sum(-1), 0, 1) * 0.7 + 0.3
        rgb_fg = self.albedo(p, fi) * lam[..., None]
        # sky: horizon band (the "distant" content) + zenith gradient
        z01 = np.clip(0.5 * (d[..., 2] + 1.0), 0, 1)
        horizon = np.exp(-np.abs(d[..., 2]) * 14.0)
        sky = ((1 - z01[..., None]) * np.array([0.9, 0.85, 0.75])
               + z01[..., None] * np.array([0.35, 0.55, 0.9]))
        sky = sky * (1 - horizon[..., None]) \
            + horizon[..., None] * np.array([0.75, 0.6, 0.5])
        return np.where(hit[..., None], rgb_fg, sky).astype(np.float32)


def build_demo_sequence(root: str, seq_name: str = "demo_drive", *,
                        n_frames: int = 8, H: int = 80, W: int = 120,
                        n_vehicles: int = 3, fov_deg: float = 62.0,
                        lidar_hw=(12, 64), speed: float = 1.5,
                        seed: int = 0) -> str:
    """Write the sequence directory; returns its path."""
    import torch
    drive = DemoDrive(n_frames, speed, n_vehicles, seed)
    seq_dir = os.path.join(root, seq_name)
    for sub in ("images/camera_FRONT", "lidars/lidar_TOP",
                "masks/camera_FRONT"):
        os.makedirs(os.path.join(seq_dir, sub), exist_ok=True)

    f = 0.5 * W / math.tan(math.radians(fov_deg) / 2)
    intr = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    cam2ego = np.eye(4, dtype=np.float32)
    cam2ego[:3, :3] = R_CAM2EGO
    cam2ego[:3, 3] = [1.2, 0.0, 0.2]          # hood-mounted, slightly up
    lidar2ego = np.eye(4, dtype=np.float32)
    lidar2ego[:3, 3] = [0.0, 0.0, 0.6]

    ego = np.stack([drive.ego_pose(fi) for fi in range(n_frames)])

    from PIL import Image
    u, v = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    dirs_cam = np.stack([(u - intr[0, 2]) / intr[0, 0],
                         (v - intr[1, 2]) / intr[1, 1],
                         np.ones_like(u)], -1)
    lH, lW = lidar_hw
    az = np.linspace(-math.pi * 0.4, math.pi * 0.4, lW)
    el = np.linspace(-0.35, 0.05, lH)
    azg, elg = np.meshgrid(az, el)
    beams_local = np.stack([np.cos(elg) * np.cos(azg),
                            np.cos(elg) * np.sin(azg),
                            np.sin(elg)], -1).reshape(-1, 3).astype(np.float32)

    for fi in range(n_frames):
        c2w = ego[fi] @ cam2ego
        d = dirs_cam @ c2w[:3, :3].T
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = np.broadcast_to(c2w[:3, 3], d.shape).astype(np.float64)
        p, t, hit = drive.trace(o, d, fi)
        rgb = drive.shade(p, d, hit, fi)
        Image.fromarray((np.clip(rgb, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(seq_dir, "images", "camera_FRONT", f"{fi:08d}.jpg"),
            quality=95)
        np.savez_compressed(
            os.path.join(seq_dir, "masks", "camera_FRONT", f"{fi:08d}.npz"),
            mask=drive.semantic(p, hit, fi))

        l2w = ego[fi] @ lidar2ego
        dw = beams_local @ l2w[:3, :3].T
        ow = np.broadcast_to(l2w[:3, 3], dw.shape).astype(np.float64)
        _, t_l, hit_l = drive.trace(ow, dw, fi)
        ranges = np.where(hit_l, t_l, 0.0).astype(np.float32)
        np.savez_compressed(
            os.path.join(seq_dir, "lidars", "lidar_TOP", f"{fi:08d}.npz"),
            rays_o=np.zeros_like(beams_local), rays_d=beams_local,
            ranges=ranges)

    ts = np.arange(n_frames, dtype=np.float64) * 0.1
    objects: Dict[str, Dict] = {}
    for k in range(n_vehicles):
        tf = np.tile(np.eye(4, dtype=np.float32), (n_frames, 1, 1))
        for fi in range(n_frames):
            tf[fi, :3, 3] = drive.veh_center(k, fi)
        r = drive.veh[k]["r"]
        objects[f"veh_{k}"] = {"class_name": "Vehicle", "segments": [{
            "start_frame": 0, "n_frames": n_frames,
            "data": {"transform": tf,
                     "scale": np.full((n_frames, 3), r, np.float32),
                     "valid": np.ones((n_frames,), bool)}}]}

    scenario = {
        "scene_id": seq_name,
        "metas": {"num_frames": n_frames, "up_vec": "+z",
                  "ego_car_id": "ego_car"},
        "observers": {
            "ego_car": {"class_name": "EgoVehicle", "n_frames": n_frames,
                        "data": {"transform": ego, "global_ts": ts},
                        "children": {
                            "camera_FRONT": {
                                "class_name": "Camera", "n_frames": n_frames,
                                "data": {
                                    "transform": np.tile(cam2ego,
                                                         (n_frames, 1, 1)),
                                    "intr": np.tile(intr, (n_frames, 1, 1)),
                                    "hw": np.tile(np.array([H, W], np.int32),
                                                  (n_frames, 1)),
                                    "global_ts": ts,
                                }},
                            "lidar_TOP": {
                                "class_name": "RaysLidar",
                                "n_frames": n_frames,
                                "data": {"transform": np.tile(
                                    lidar2ego, (n_frames, 1, 1)),
                                    "global_ts": ts}},
                        }},
        },
        "objects": objects,
    }
    torch.save(scenario, os.path.join(seq_dir, "scenario.pt"))
    return seq_dir


def main(argv: List[str] = None):
    import argparse
    ap = argparse.ArgumentParser("waymo_demo", allow_abbrev=False)
    ap.add_argument("--root", default="data/waymo_demo")
    ap.add_argument("--seq", default="demo_drive")
    ap.add_argument("--n_frames", type=int, default=8)
    ap.add_argument("--H", type=int, default=80)
    ap.add_argument("--W", type=int, default=120)
    ap.add_argument("--n_vehicles", type=int, default=3)
    a = ap.parse_args(argv)
    out = build_demo_sequence(a.root, a.seq, n_frames=a.n_frames, H=a.H,
                              W=a.W, n_vehicles=a.n_vehicles)
    print(out)


if __name__ == "__main__":
    main()
