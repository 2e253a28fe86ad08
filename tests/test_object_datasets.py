"""DTU/BMVS (IDR format), MonoSDF, COLMAP dataset readers: round-trip tests
against generated on-disk fixtures, plus CLI training on a DTU-format dir
(the neus_in_10_minutes chain, BASELINE.md target #1)."""
import os
import struct

import numpy as np
import pytest

from neuralsim_tpu.dataio.object_datasets import (BMVSDataset, COLMAPDataset,
                                                  DTUDataset, MonoSDFDataset,
                                                  load_K_Rt_from_P)
from neuralsim_tpu.dataio.synthetic import SyntheticObjectDataset


def _write_png(path, img01):
    from PIL import Image
    Image.fromarray((np.clip(img01, 0, 1) * 255).astype(np.uint8)).save(path)


@pytest.fixture(scope="module")
def idr_dir(tmp_path_factory):
    """Synthetic scene exported in the IDR (DTU/BMVS) directory layout."""
    root = tmp_path_factory.mktemp("dtu_scan")
    ds = SyntheticObjectDataset(n_frames=4, H=40, W=48)
    os.makedirs(root / "image")
    os.makedirs(root / "mask")
    cams = {}
    for i in range(ds.n_frames):
        fr = ds.render_frame(i)
        _write_png(root / "image" / f"{i:06d}.png", fr["image_rgb"])
        _write_png(root / "mask" / f"{i:06d}.png",
                   np.repeat(fr["image_occupancy_mask"][..., None], 3, -1))
        c2w = ds.c2ws[i]
        w2c = np.linalg.inv(c2w)
        P = np.eye(4)
        P[:3, :4] = ds.intr @ w2c[:3, :4]
        cams[f"world_mat_{i}"] = P
        cams[f"scale_mat_{i}"] = np.eye(4)
    np.savez(root / "cameras.npz", **cams)
    return str(root), ds


def test_load_K_Rt_roundtrip(idr_dir):
    root, ds = idr_dir
    for i in range(ds.n_frames):
        w2c = np.linalg.inv(ds.c2ws[i])
        P = ds.intr @ w2c[:3, :4]
        K, c2w = load_K_Rt_from_P(P)
        np.testing.assert_allclose(K, ds.intr, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(c2w, ds.c2ws[i], rtol=1e-4, atol=1e-4)


def test_dtu_dataset_reads_idr_layout(idr_dir):
    root, ds = idr_dir
    d = DTUDataset(root)
    assert d.scene_ids() == [os.path.basename(root)]
    sc = d.get_scenario()
    assert sc["observers"]["camera_0"]["n_frames"] == 4
    np.testing.assert_allclose(sc["observers"]["camera_0"]["data"]["transform"],
                               ds.c2ws, rtol=1e-4, atol=1e-4)
    img = d.get_image(None, "camera_0", 0)
    assert img.shape == (40, 48, 3)
    m = d.get_occupancy_mask(None, "camera_0", 0)
    assert m.shape == (40, 48)
    assert set(np.unique(m)) <= {0.0, 1.0}
    # BMVS shares the reader
    assert BMVSDataset(root).get_scenario()["observers"]["camera_0"]["n_frames"] == 4


def test_monosdf_dataset(tmp_path):
    ds = SyntheticObjectDataset(n_frames=2, H=24, W=24)
    cams = {}
    for i in range(2):
        fr = ds.render_frame(i)
        _write_png(tmp_path / f"{i:06d}_rgb.png", fr["image_rgb"])
        np.save(tmp_path / f"{i:06d}_depth.npy", fr["image_depth"])
        w2c = np.linalg.inv(ds.c2ws[i])
        P = np.eye(4)
        P[:3, :4] = ds.intr @ w2c[:3, :4]
        cams[f"world_mat_{i}"] = P
    np.savez(tmp_path / "cameras.npz", **cams)
    d = MonoSDFDataset(str(tmp_path))
    np.testing.assert_allclose(d.c2ws, ds.c2ws[:2], rtol=1e-4, atol=1e-4)
    md = d.get_mono_depth(None, "camera_0", 0)
    assert md.shape == (24, 24)
    assert d.get_mono_normals(None, "camera_0", 0) is None  # not written


def _write_colmap_bin(root, ds):
    sparse = root / "sparse" / "0"
    os.makedirs(sparse)
    os.makedirs(root / "images")
    with open(sparse / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, ds.W, ds.H))  # PINHOLE
        K = ds.intr
        f.write(struct.pack("<dddd", K[0, 0], K[1, 1], K[0, 2], K[1, 2]))
    with open(sparse / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", ds.n_frames))
        for i in range(ds.n_frames):
            w2c = np.linalg.inv(ds.c2ws[i])
            R = w2c[:3, :3]
            t = w2c[:3, 3]
            # rotation matrix -> quaternion (w, x, y, z)
            w = np.sqrt(max(1 + R[0, 0] + R[1, 1] + R[2, 2], 0)) / 2
            x = (R[2, 1] - R[1, 2]) / (4 * w)
            y = (R[0, 2] - R[2, 0]) / (4 * w)
            z = (R[1, 0] - R[0, 1]) / (4 * w)
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<dddd", w, x, y, z))
            f.write(struct.pack("<ddd", *t))
            f.write(struct.pack("<i", 1))
            f.write(f"{i:06d}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 0))
            _write_png(root / "images" / f"{i:06d}.png",
                       ds.render_frame(i)["image_rgb"])


def test_colmap_dataset(tmp_path):
    ds = SyntheticObjectDataset(n_frames=3, H=24, W=24)
    _write_colmap_bin(tmp_path, ds)
    d = COLMAPDataset(str(tmp_path), normalize=False)
    np.testing.assert_allclose(d.c2ws, ds.c2ws[:3], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(d.intrs[0], ds.intr, rtol=1e-5, atol=1e-5)
    img = d.get_image(None, "camera_0", 1)
    assert img.shape == (24, 24, 3)
    # normalization puts the camera centroid at the origin in a unit sphere
    dn = COLMAPDataset(str(tmp_path), normalize=True)
    centers = dn.c2ws[:, :3, 3]
    assert np.linalg.norm(centers.mean(0)) < 1e-5
    assert np.linalg.norm(centers, axis=-1).max() <= 1.0 + 1e-5


def test_train_on_dtu_format_dir(idr_dir):
    """neus_in_10_minutes chain: object-centric NeuS trains on an IDR-format
    directory through the real CLI (BASELINE.md target #1 done-criterion at
    CI scale)."""
    root, _ = idr_dir
    from neuralsim_tpu.tools.train import main_function
    cfg = {
        "exp_dir": os.path.join(root, "exp"),
        "seed": 0, "compile_cache": None,
        "dataset_cfg": {
            "target": "neuralsim_tpu.dataio.object_datasets.DTUDataset",
            "params": {"root": root},
        },
        "scenebank_cfg": {},
        "assetbank_cfg": {
            "Main": {"model_class": "neuralsim_tpu.models.assets.LoTDNeuSObj",
                     "model_params": {
                         "extent": 1.0,
                         "encoding_cfg": {"n_levels": 4, "base_res": 8,
                                          "max_res": 32, "n_feats": 2,
                                          "log2_hashmap_size": 10},
                         "geo_feat_dim": 8, "decoder_hidden": 16,
                         "radiance_hidden": 16, "inv_s_init": 30.0,
                         "query_cfg": {"num_coarse": 16, "num_fine": [4],
                                       "upsample_inv_s": 32.0,
                                       "upsample_inv_s_factors": [1.0]}},
                     "asset_params": {"training_cfg": {"lr": 0.01}}},
        },
        "renderer": {"cr_class": "Main"},
        "training": {"num_iters": 5, "n_rays": 128, "uniform_sample_n": 32,
                     "i_log": 2, "i_val": 1000, "val_downscale": 8,
                     "with_mask": True,
                     "losses": {"rgb": {"fn_type": "huber", "w": 10.0},
                                "occupancy_mask": {"w": 0.3},
                                "eikonal": {"w": 0.01}}},
    }
    out = main_function(cfg)
    assert np.isfinite(out["psnr"])


def test_blender_dataset(tmp_path):
    import json
    ds = SyntheticObjectDataset(n_frames=2, H=24, W=24)
    frames = []
    os.makedirs(tmp_path / "train")
    for i in range(2):
        fr = ds.render_frame(i)
        rgba = np.concatenate([fr["image_rgb"],
                               fr["image_occupancy_mask"][..., None]], -1)
        from PIL import Image
        Image.fromarray((rgba * 255).astype(np.uint8), "RGBA").save(
            tmp_path / "train" / f"r_{i}.png")
        T = ds.c2ws[i].copy()
        T[:3, :3] = T[:3, :3] @ np.diag([1.0, -1.0, -1.0])  # opencv->blender
        frames.append({"file_path": f"train/r_{i}",
                       "transform_matrix": T.tolist()})
    fx = ds.intr[0, 0]
    with open(tmp_path / "transforms_train.json", "w") as f:
        json.dump({"camera_angle_x": float(2 * np.arctan(0.5 * 24 / fx)),
                   "frames": frames}, f)
    from neuralsim_tpu.dataio.object_datasets import BlenderDataset
    d = BlenderDataset(str(tmp_path))
    np.testing.assert_allclose(d.c2ws, ds.c2ws[:2], rtol=1e-5, atol=1e-5)
    assert abs(d.intr[0, 0] - fx) < 0.5
    img = d.get_image(None, "camera_0", 0)
    m = d.get_occupancy_mask(None, "camera_0", 0)
    assert img.shape == (24, 24, 3) and m.shape == (24, 24)
    # background composited to white where alpha=0
    assert float(img[m < 0.5].min()) > 0.99


def test_mvmc_ners_dataset(tmp_path):
    """NeRS/MVMC reader: RLE decode parity, fov->intrinsics, pytorch3d->
    OpenCV pose conversion (reference dataio/ners/instance_dataset.py)."""
    import json
    from neuralsim_tpu.dataio.object_datasets import (MVMCNeRSDataset,
                                                      decode_coco_rle)
    rng = np.random.default_rng(0)
    root = tmp_path / "mvmc"
    inst = root / "123"
    os.makedirs(inst / "images")
    H, W, n = 36, 48, 3
    annos = []
    dense_masks = []
    for i in range(n):
        img = rng.uniform(size=(H, W, 3))
        _write_png(inst / "images" / f"{i}.jpg", img)
        # random rectangle mask -> column-major RLE
        m = np.zeros((H, W), bool)
        m[8:20, 10 + i:30] = True
        dense_masks.append(m)
        flat = m.reshape(-1, order="F").astype(np.int8)
        # build COCO counts (skip, fill, skip, fill, ...)
        change = np.flatnonzero(np.diff(flat)) + 1
        bounds = np.concatenate([[0], change, [flat.size]])
        runs = np.diff(bounds).tolist()
        counts = runs if flat[0] == 0 else [0] + runs
        # random rotation (orthonormal, det +1)
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        annos.append({
            "filename": f"{i}.jpg",
            "bbox": [10 + i, 8, 30, 20],
            "mask": {"counts": " ".join(map(str, counts)), "size": [H, W]},
            "camera_optimized": {"R": q.tolist(),
                                 "T": rng.normal(size=3).tolist(),
                                 "fov": 50.0 + i},
        })
    with open(inst / "annotations.json", "w") as f:
        json.dump({"annotations": annos}, f)

    # RLE decode parity
    for a, m in zip(annos, dense_masks):
        np.testing.assert_array_equal(decode_coco_rle(a["mask"]), m)

    d = MVMCNeRSDataset(str(root), instance_id=123)
    sc = d.get_scenario()
    assert sc["observers"]["camera_0"]["n_frames"] == n
    img = d.get_image(sc["scene_id"], "camera_0", 0)
    assert img.shape == (H, W, 3)
    np.testing.assert_array_equal(
        d.get_occupancy_mask(sc["scene_id"], "camera_0", 1),
        dense_masks[1].astype(np.float32))
    # intrinsics: fov spans W on x, H on y
    f = 1.0 / np.tan(np.deg2rad(50.0) / 2.0)
    np.testing.assert_allclose(d.intrs[0, 0, 0], f * W / 2, rtol=1e-6)
    np.testing.assert_allclose(d.intrs[0, 1, 1], f * H / 2, rtol=1e-6)
    # poses: rotation orthonormal with det +1; c2w @ w2c == I
    for i in range(n):
        R = d.c2ws[i, :3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(R) > 0
    # camera center must be invariant to the pytorch3d->OpenCV flip:
    # center = -R_w2c^T T, and the flip only changes axis directions
    R0 = np.array(annos[0]["camera_optimized"]["R"])
    T0 = np.array(annos[0]["camera_optimized"]["T"])
    np.testing.assert_allclose(d.c2ws[0, :3, 3], -R0 @ T0, atol=1e-5)

    # cropped variant: square output, principal point maps og center
    dc = MVMCNeRSDataset(str(root), instance_id="123", crop_size=32)
    imgc = dc.get_image(sc["scene_id"], "camera_0", 0)
    assert imgc.shape == (32, 32, 3)
    mc = dc.get_occupancy_mask(sc["scene_id"], "camera_0", 0)
    assert mc.shape == (32, 32) and mc.max() == 1.0
    assert dc.get_scenario()["observers"]["camera_0"]["data"]["hw"][0, 0] == 32
