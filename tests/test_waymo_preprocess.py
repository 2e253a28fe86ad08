"""Waymo tfrecord preprocessing round-trip: synthesize a segment tfrecord
with the public Frame schema (pure-python encoder), run the preprocess CLI,
and consume the output through WaymoDataset + Scene (the reader the rest of
the framework uses). Covers the ego-motion-compensated LiDAR ray math
(reference preprocess.py:505-519)."""
import io
import os
import zlib

import numpy as np
import pytest

from neuralsim_tpu.dataio import waymo_proto as wp
from neuralsim_tpu.dataio.waymo import WaymoDataset
from neuralsim_tpu.scene import Scene
from neuralsim_tpu.tools.preprocess_waymo import (lidar_rays_from_range_image,
                                                  process_sequence)


def _jpeg_bytes(h=8, w=12):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(np.full((h, w, 3), 128, np.uint8)).save(buf, "JPEG")
    return buf.getvalue()


def _make_frame(fi, ego_pose, with_pixel_pose=True):
    H, W = 4, 16
    # camera calibration: FRONT pinhole
    cam_cal = (wp.enc_varint_field(1, 1) +
               wp.enc_packed_doubles(2, [100.0, 100.0, 6.0, 4.0,
                                         0, 0, 0, 0, 0]) +
               wp.enc_transform(3, np.eye(4)) +
               wp.enc_varint_field(4, 12) + wp.enc_varint_field(5, 8))
    # TOP laser calibration
    extr = np.eye(4)
    extr[:3, 3] = [1.0, 0.0, 2.0]
    incl = np.linspace(-0.3, 0.1, H)
    las_cal = (wp.enc_varint_field(1, 1) +
               wp.enc_packed_doubles(2, incl) +
               wp.enc_double(3, float(incl[0])) +
               wp.enc_double(4, float(incl[-1])) +
               wp.enc_transform(5, extr))
    ctx = (wp.enc_len(1, b"synthetic_segment") +
           wp.enc_len(2, cam_cal) + wp.enc_len(3, las_cal))

    # range image [H, W, 4]: constant 10m ranges
    ri = np.zeros((H, W, 4), np.float32)
    ri[..., 0] = 10.0
    ri_msg = wp.enc_len(1, zlib.compress(wp.enc_matrix_float(ri)))
    if with_pixel_pose:
        # per-pixel vehicle pose == frame pose (rpy=0 for our test poses)
        pp = np.zeros((H, W, 6), np.float32)
        pp[..., 3:] = ego_pose[:3, 3]
        ri_msg += wp.enc_len(3, zlib.compress(wp.enc_matrix_float(pp)))
    laser = wp.enc_varint_field(1, 1) + wp.enc_len(2, ri_msg)

    cam_img = wp.enc_varint_field(1, 1) + wp.enc_len(2, _jpeg_bytes())

    # one vehicle track
    box = (wp.enc_double(1, 5.0 + fi) + wp.enc_double(2, 1.0) +
           wp.enc_double(3, 0.5) + wp.enc_double(4, 2.0) +
           wp.enc_double(5, 4.5) + wp.enc_double(6, 1.8) +
           wp.enc_double(7, 0.3))
    label = (wp.enc_len(1, box) + wp.enc_varint_field(3, 1) +
             wp.enc_len(4, b"veh_0"))

    frame = (wp.enc_len(1, ctx) +
             wp.enc_varint_field(2, 1000000 + fi * 100000) +
             wp.enc_transform(3, ego_pose) +
             wp.enc_len(4, cam_img) +
             wp.enc_len(6, laser) +
             wp.enc_len(7, label))
    return frame


@pytest.fixture(scope="module")
def processed(tmp_path_factory):
    root = tmp_path_factory.mktemp("waymo")
    recs = []
    for fi in range(3):
        pose = np.eye(4)
        pose[:3, 3] = [fi * 2.0, 0.0, 0.0]      # ego drives +x
        recs.append(_make_frame(fi, pose))
    src = root / "segment-synthetic.tfrecord"
    wp.write_tfrecord(str(src), recs)
    out = root / "processed"
    seq_dir = process_sequence(str(src), str(out))
    return str(out), os.path.basename(seq_dir)


def test_layout_and_scenario(processed):
    out, seq = processed
    ds = WaymoDataset(out)
    assert ds.scene_ids() == [seq]
    sc = ds.get_scenario(seq)
    scene = Scene.load_from_scenario(sc)
    assert scene.n_frames == 3
    assert "camera_FRONT" in scene.observers
    assert "lidar_TOP" in scene.observers
    # camera is a child of the ego node; its world pose moves with the ego
    fr0 = scene.slice_at(0)
    fr2 = scene.slice_at(2)
    c0 = np.asarray(fr0.world_transform("camera_FRONT"))[:3, 3]
    c2 = np.asarray(fr2.world_transform("camera_FRONT"))[:3, 3]
    np.testing.assert_allclose(c2 - c0, [4.0, 0.0, 0.0], atol=1e-5)
    # vehicle track became a drawable with box half-extent scale
    assert len(scene.drawables) == 1
    oid = list(scene.drawables)[0]
    d0 = fr0.data(oid)
    np.testing.assert_allclose(np.asarray(d0["scale"]),
                               [4.5 / 2, 2.0 / 2, 1.8 / 2], atol=1e-6)
    img = ds.get_image(seq, "camera_FRONT", 0)
    assert img.shape == (8, 12, 3)


def test_lidar_rays_roundtrip(processed):
    out, seq = processed
    ds = WaymoDataset(out)
    ld = ds.get_lidar(seq, "lidar_TOP", 1)
    assert ld is not None
    # pixel pose == frame pose -> compensation is identity: origins at the
    # sensor origin, ranges preserved
    np.testing.assert_allclose(ld["ranges"], 10.0, atol=1e-4)
    np.testing.assert_allclose(ld["rays_o"], 0.0, atol=1e-4)
    assert np.allclose(np.linalg.norm(ld["rays_d"], axis=-1), 1.0, atol=1e-5)


def test_ego_motion_compensation_moves_origins():
    """Per-pixel poses differing from the frame pose must produce per-return
    origins such that origin + range*dir reproduces the true world point."""
    H, W = 2, 8
    ri = np.zeros((H, W, 1), np.float32)
    ri[..., 0] = 5.0
    calib = {"beam_inclinations": np.linspace(-0.2, 0.0, H),
             "beam_inclination_min": -0.2, "beam_inclination_max": 0.0,
             "extrinsic": np.eye(4)}
    frame_pose = np.eye(4)
    frame_pose[:3, 3] = [10.0, 0.0, 0.0]
    pixel_pose = np.zeros((H, W, 6), np.float32)
    pixel_pose[..., 3] = 9.0      # captured 1m behind the frame pose
    rays = lidar_rays_from_range_image(ri, calib, frame_pose,
                                       pixel_pose=pixel_pose)
    # origins shifted by -1m in x (sensor frame = vehicle frame here)
    np.testing.assert_allclose(rays["rays_o"][:, 0], -1.0, atol=1e-5)
    # and ranges unchanged (pure translation of the sensor)
    np.testing.assert_allclose(rays["ranges"], 5.0, atol=1e-5)


def test_streetsurf_trains_on_preprocessed_sequence(processed):
    """The full StreetSurf chain on a preprocessed Waymo-layout sequence:
    WaymoDataset reader -> ego-child cameras -> street+distant+sky assets ->
    camera + LiDAR joint training through the real CLI (tiny scale)."""
    out_root, seq = processed
    from neuralsim_tpu.tools.train import main_function
    cfg = {
        "exp_dir": os.path.join(out_root, "exp"),
        "seed": 0, "compile_cache": None,
        "dataset_cfg": {
            "target": "neuralsim_tpu.dataio.waymo.WaymoDataset",
            "params": {"root": out_root,
                       "camera_list": ["camera_FRONT"],
                       "lidar_list": ["lidar_TOP"]},
        },
        "scenebank_cfg": {"scenarios": [seq]},
        "assetbank_cfg": {
            "Street": {
                "model_class": "neuralsim_tpu.models.assets.LoTDNeuSStreet",
                "model_params": {
                    "extend_size": 10.0,
                    "encoding_cfg": {"n_levels": 4, "base_res": 8,
                                     "max_res": 32, "n_feats": 2,
                                     "log2_hashmap_size": 10},
                    "geo_feat_dim": 8, "radiance_hidden": 16,
                    "inv_s_init": 10.0, "pretrain": None, "accel_cfg": None,
                    "query_cfg": {"num_coarse": 16, "num_fine": [4],
                                  "upsample_inv_s": 32.0,
                                  "upsample_inv_s_factors": [1.0]}},
                "asset_params": {"training_cfg": {"lr": 0.01}}},
            "Sky": {"model_class":
                    "neuralsim_tpu.models.assets.SimpleSkyAsset",
                    "model_params": {"hidden": 8},
                    "asset_params": {"training_cfg": {"lr": 0.003}}},
        },
        "renderer": {"cr_class": "Street", "sky_class": "Sky"},
        "training": {"num_iters": 3, "n_rays": 64, "n_rays_lidar": 32,
                     "uniform_sample_n": 32, "i_log": 1, "i_val": 1000,
                     "val_downscale": 4, "with_mask": False,
                     "with_lidar": True,
                     "losses": {"rgb": {"fn_type": "huber", "w": 10.0},
                                "eikonal": {"w": 0.01},
                                "lidar": {"w": 0.1, "depth": {"w": 1.0}}}},
    }
    out = main_function(cfg)
    assert np.isfinite(out["psnr"])
