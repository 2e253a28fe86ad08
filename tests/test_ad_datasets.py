"""KITTI / nuScenes / PandaSet readers over synthesized fixture trees.

The reference leaves all three as stubs (kitti_dataset.py "To be merged");
these tests verify our functional readers parse each dataset's native
layout and produce scenarios that load into the scene graph.
"""
import gzip
import json
import os
import pickle

import numpy as np
import pytest


def _png(path, H=8, W=12):
    from PIL import Image
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = (np.random.default_rng(0).random((H, W, 3)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


# ---------------------------------------------------------------------------
def _make_kitti(root):
    seq = os.path.join(root, "sequences", "00")
    os.makedirs(os.path.join(seq, "velodyne"), exist_ok=True)
    K = [[100.0, 0, 6.0, -20.0], [0, 100.0, 4.0, 0], [0, 0, 1.0, 0]]
    with open(os.path.join(seq, "calib.txt"), "w") as f:
        f.write("P0: 100 0 6 0 0 100 4 0 0 0 1 0\n")
        f.write("P2: " + " ".join(str(v) for r in K for v in r) + "\n")
        f.write("Tr: 0 -1 0 0 0 0 -1 0 1 0 0 0.1\n")
    os.makedirs(os.path.join(root, "poses"), exist_ok=True)
    poses = []
    for i in range(3):
        T = np.eye(4)
        T[0, 3] = i * 1.5
        poses.append(T[:3].reshape(-1))
    np.savetxt(os.path.join(root, "poses", "00.txt"), np.stack(poses))
    for i in range(3):
        _png(os.path.join(seq, "image_2", f"{i:06d}.png"))
        pts = np.random.default_rng(i).normal(size=(50, 4)).astype(np.float32)
        pts[:, 3] = 0.5
        pts.tofile(os.path.join(seq, "velodyne", f"{i:06d}.bin"))


def test_kitti_reader(tmp_path):
    from neuralsim_tpu.dataio.ad_datasets import KITTIDataset
    from neuralsim_tpu.scene import Scene
    _make_kitti(str(tmp_path))
    ds = KITTIDataset(str(tmp_path))
    assert ds.scene_ids() == ["00"]
    sc = ds.get_scenario("00")
    assert sc["metas"]["num_frames"] == 3
    cam = sc["observers"]["image_2"]
    assert cam["data"]["intr"][0][0, 0] == 100.0
    # stereo baseline: x offset = -P2[0,3]/fx = 0.2, on top of pose x
    assert np.isclose(cam["data"]["transform"][1][0, 3], 1.5 + 0.2)
    assert "velodyne" in sc["observers"]
    img = ds.get_image("00", "image_2", 1)
    assert img.shape == (8, 12, 3) and img.max() <= 1.0
    ld = ds.get_lidar("00", "velodyne", 0)
    assert set(ld) == {"rays_o", "rays_d", "ranges"}
    assert np.allclose(np.linalg.norm(ld["rays_d"], axis=-1), 1.0, atol=1e-5)
    scene = Scene.load_from_scenario(sc)
    assert scene.n_frames == 3


# ---------------------------------------------------------------------------
def _make_nuscenes(root):
    v = os.path.join(root, "v1.0-mini")
    os.makedirs(v, exist_ok=True)
    q = [1.0, 0.0, 0.0, 0.0]
    samples = [{"token": f"s{i}", "next": f"s{i+1}" if i < 2 else "",
                "scene_token": "sc0"} for i in range(3)]
    tables = {
        "scene": [{"token": "sc0", "name": "scene-0001",
                   "first_sample_token": "s0", "nbr_samples": 3}],
        "sample": samples,
        "sensor": [{"token": "se_c", "channel": "CAM_FRONT",
                    "modality": "camera"},
                   {"token": "se_l", "channel": "LIDAR_TOP",
                    "modality": "lidar"}],
        "calibrated_sensor": [
            {"token": "cs_c", "sensor_token": "se_c", "rotation": q,
             "translation": [1.0, 0.0, 1.5],
             "camera_intrinsic": [[90.0, 0, 6], [0, 90.0, 4], [0, 0, 1]]},
            {"token": "cs_l", "sensor_token": "se_l", "rotation": q,
             "translation": [0.0, 0.0, 1.8], "camera_intrinsic": []}],
        "ego_pose": [{"token": f"ep{i}", "rotation": q,
                      "translation": [2.0 * i, 0.0, 0.0]} for i in range(3)],
        "sample_data": [],
        "instance": [{"token": "inst0", "category_token": "cat0"}],
        "category": [{"token": "cat0", "name": "vehicle.car"}],
        "sample_annotation": [
            {"token": f"a{i}", "sample_token": f"s{i}",
             "instance_token": "inst0", "rotation": q,
             "translation": [5.0, 1.0 * i, 0.0], "size": [2.0, 4.5, 1.6]}
            for i in range(2)],
    }
    for i in range(3):
        fn_c = f"samples/CAM_FRONT/{i}.jpg"
        fn_l = f"samples/LIDAR_TOP/{i}.pcd.bin"
        tables["sample_data"] += [
            {"token": f"sd_c{i}", "sample_token": f"s{i}",
             "calibrated_sensor_token": "cs_c", "ego_pose_token": f"ep{i}",
             "is_key_frame": True, "filename": fn_c, "height": 8,
             "width": 12},
            {"token": f"sd_l{i}", "sample_token": f"s{i}",
             "calibrated_sensor_token": "cs_l", "ego_pose_token": f"ep{i}",
             "is_key_frame": True, "filename": fn_l, "height": 0,
             "width": 0}]
        _png(os.path.join(root, fn_c))
        os.makedirs(os.path.join(root, "samples/LIDAR_TOP"), exist_ok=True)
        pts = np.random.default_rng(i).normal(size=(40, 5)).astype(np.float32)
        pts.tofile(os.path.join(root, fn_l))
    for name, rows in tables.items():
        with open(os.path.join(v, f"{name}.json"), "w") as f:
            json.dump(rows, f)


def test_nuscenes_reader(tmp_path):
    from neuralsim_tpu.dataio.ad_datasets import NuScenesDataset
    from neuralsim_tpu.scene import Scene
    _make_nuscenes(str(tmp_path))
    ds = NuScenesDataset(str(tmp_path))
    assert ds.scene_ids() == ["scene-0001"]
    sc = ds.get_scenario("scene-0001")
    assert sc["metas"]["num_frames"] == 3
    cam = sc["observers"]["CAM_FRONT"]
    # sensor world pose = ego @ calibrated: x = 2*i + 1
    assert np.isclose(cam["data"]["transform"][2][0, 3], 5.0)
    assert cam["data"]["valid"].all()
    assert "LIDAR_TOP" in sc["observers"]
    # annotation boxes -> objects with validity and lwh size
    assert len(sc["objects"]) == 1
    obj = next(iter(sc["objects"].values()))
    assert obj["class_name"] == "Vehicle"
    assert obj["data"]["valid"].tolist() == [True, True, False]
    assert np.allclose(obj["data"]["size"][0], [4.5, 2.0, 1.6])
    img = ds.get_image("scene-0001", "CAM_FRONT", 0)
    assert img.shape == (8, 12, 3)
    ld = ds.get_lidar("scene-0001", "LIDAR_TOP", 1)
    assert ld["ranges"].shape[0] == 40
    scene = Scene.load_from_scenario(sc)
    assert scene.n_frames == 3


# ---------------------------------------------------------------------------
def test_custom_autodrive_taxonomies(tmp_path):
    """CustomAutoDriveDataset: Waymo-layout tree + selectable semantic
    taxonomy (reference custom_autodrive_dataset.py:80-147). ade20k ids map
    sky=2/road=6/person=12/car=20; cityscapes sky=10/road=0/person=11."""
    from neuralsim_tpu.dataio.custom import CustomAutoDriveDataset
    root = str(tmp_path)
    md = os.path.join(root, "seq0", "masks", "cam")
    os.makedirs(md, exist_ok=True)
    sem = np.array([[2, 6], [12, 20]], np.int32)   # ade20k ids
    np.savez(os.path.join(md, "00000000.npz"), sem)

    ds = CustomAutoDriveDataset(root, sequences=["seq0"],
                                mask_taxonomy="ade20k")
    occ = ds.get_occupancy_mask("seq0", "cam", 0)
    assert occ.tolist() == [[0.0, 1.0], [1.0, 1.0]]          # sky id 2 only
    assert ds.get_semantic_mask("seq0", "cam", 0, "human").tolist() == \
        [[False, False], [True, False]]
    assert ds.get_semantic_mask("seq0", "cam", 0, "vehicle").tolist() == \
        [[False, False], [False, True]]
    assert ds.get_road_mask("seq0", "cam", 0).tolist() == \
        [[False, True], [False, False]]

    # cityscapes interprets the same ids differently (2=building, 6=t-light)
    ds2 = CustomAutoDriveDataset(root, sequences=["seq0"],
                                 mask_taxonomy="cityscapes")
    assert ds2.get_occupancy_mask("seq0", "cam", 0).min() == 1.0  # no sky=10
    assert ds2.get_semantic_mask("seq0", "cam", 0, "dynamic").tolist() == \
        [[False, False], [True, False]]                      # 12=rider
    with pytest.raises(ValueError):
        CustomAutoDriveDataset(root, mask_taxonomy="nope")


# ---------------------------------------------------------------------------
def _make_pandaset(root):
    seq = os.path.join(root, "001")
    cd = os.path.join(seq, "camera", "front_camera")
    ld = os.path.join(seq, "lidar")
    os.makedirs(cd, exist_ok=True)
    os.makedirs(ld, exist_ok=True)
    with open(os.path.join(cd, "intrinsics.json"), "w") as f:
        json.dump({"fx": 80.0, "fy": 80.0, "cx": 6.0, "cy": 4.0}, f)
    poses = [{"heading": {"w": 1.0, "x": 0.0, "y": 0.0, "z": 0.0},
              "position": {"x": 1.0 * i, "y": 0.0, "z": 2.0}}
             for i in range(2)]
    for d in (cd, ld):
        with open(os.path.join(d, "poses.json"), "w") as f:
            json.dump(poses, f)
    for i in range(2):
        _png(os.path.join(cd, f"{i:02d}.jpg"))
        # world-frame points around the lidar pose
        pts = np.random.default_rng(i).normal(
            size=(30, 3)).astype(np.float64) + [1.0 * i, 0.0, 2.0]
        try:
            import pandas as pd
            df = pd.DataFrame(pts, columns=["x", "y", "z"])
        except ImportError:  # plain dict of columns unpickles the same way
            df = {"x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2]}
        with gzip.open(os.path.join(ld, f"{i:02d}.pkl.gz"), "wb") as f:
            pickle.dump(df, f)


def test_pandaset_reader(tmp_path):
    from neuralsim_tpu.dataio.ad_datasets import PandaSetDataset
    from neuralsim_tpu.scene import Scene
    _make_pandaset(str(tmp_path))
    ds = PandaSetDataset(str(tmp_path))
    assert ds.scene_ids() == ["001"]
    sc = ds.get_scenario("001")
    assert sc["metas"]["num_frames"] == 2
    assert sc["observers"]["front_camera"]["data"]["intr"][0][0, 0] == 80.0
    assert "lidar" in sc["observers"]
    # world points near the pose -> small sensor-frame ranges
    ld = ds.get_lidar("001", "lidar", 1)
    assert ld["ranges"].max() < 10.0
    img = ds.get_image("001", "front_camera", 0)
    assert img.shape == (8, 12, 3)
    scene = Scene.load_from_scenario(sc)
    assert scene.n_frames == 2
