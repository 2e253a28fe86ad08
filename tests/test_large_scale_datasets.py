"""Mega-NeRF reader over a synthesized fixture tree (reference
dataio/mega_nerf/mega_nerf_dataset.py): metadata/rgbs layout, OpenGL->OpenCV
pose flip, altitude floor info, forest block splitting."""
import os

import numpy as np
import torch


def _make_mega(root):
    torch.save({"origin_drb": torch.tensor([10.0, 0.0, 0.0]),
                "pose_scale_factor": 50.0},
               os.path.join(root, "coordinates.pt"))
    from PIL import Image
    rng = np.random.default_rng(0)
    for split, n in (("train", 3), ("val", 1)):
        os.makedirs(os.path.join(root, split, "metadata"), exist_ok=True)
        os.makedirs(os.path.join(root, split, "rgbs"), exist_ok=True)
        for i in range(n):
            stem = f"{split}_{i:03d}"
            c2w = torch.eye(4)[:3]
            c2w[1, 3] = 0.3 * i          # spread along dim 1
            torch.save({"c2w": c2w, "intrinsics": torch.tensor(
                [100.0, 100.0, 6.0, 4.0]), "H": 8, "W": 12},
                os.path.join(root, split, "metadata", stem + ".pt"))
            arr = (rng.random((8, 12, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(
                os.path.join(root, split, "rgbs", stem + ".jpg"))
    os.makedirs(os.path.join(root, "masks"), exist_ok=True)
    torch.save(torch.ones(8, 12, dtype=torch.bool),
               os.path.join(root, "masks", "train_000.pt"))


def _make_block(root):
    import json
    from PIL import Image
    os.makedirs(os.path.join(root, "train", "rgbs"), exist_ok=True)
    os.makedirs(os.path.join(root, "train", "masks"), exist_ok=True)
    meta = {}
    for i in range(4):
        name = f"img_{i:04d}"
        c2w = torch.eye(4)[:3]
        c2w[0, 3] = 2.0 * i
        meta[name] = {"image_name": name, "cam_idx": i % 2, "c2w": c2w,
                      "intrinsics": torch.tensor([90.0, 90.0]),
                      "W": 12, "H": 8, "equivalent_exposure": 0.1 * i}
        arr = (np.random.default_rng(i).random((8, 12, 3)) * 255
               ).astype(np.uint8)
        Image.fromarray(arr).save(
            os.path.join(root, "train", "rgbs", name + ".png"))
        sem = np.full((8, 12), 10, np.int32)   # cityscapes sky
        sem[4:] = 0                            # road below horizon
        np.savez(os.path.join(root, "train", "masks", name + ".npz"), sem)
    torch.save(meta, os.path.join(root, "train", "train_all_meta.pt"))
    blocks = {"0": {"elements": [[f"img_{i:04d}", 0] for i in range(2)]},
              "1": {"elements": [[f"img_{i:04d}", 0] for i in range(2, 4)]}}
    with open(os.path.join(root, "train", "split_block_train.json"),
              "w") as f:
        json.dump(blocks, f)


def test_block_nerf_reader(tmp_path):
    from neuralsim_tpu.dataio.large_scale import BlockNeRFDataset
    from neuralsim_tpu.scene import Scene
    _make_block(str(tmp_path))
    ds = BlockNeRFDataset(str(tmp_path), block_ids=["0"])
    sc = ds.get_scenario("waymo-block-nerf")
    assert sc["metas"]["num_frames"] == 2          # block filter applied
    cam = sc["observers"]["camera"]
    assert cam["data"]["intr"][0][0, 2] == 6.0     # cx = W/2
    np.testing.assert_allclose(cam["data"]["transform"][0][:3, :3],
                               np.diag([1.0, -1.0, -1.0]), atol=1e-6)
    assert np.allclose(cam["data"]["exposure"], [0.0, 0.1])
    occ = ds.get_occupancy_mask("s", "camera", 0)
    assert occ[0, 0] == 0.0 and occ[5, 0] == 1.0   # sky row vs road row
    assert ds.get_semantic_mask("s", "camera", 0, "road")[5, 0]
    assert ds.get_image("s", "camera", 1).shape == (8, 12, 3)
    assert np.isclose(ds.get_exposure("s", "camera", 1), 0.1)
    scene = Scene.load_from_scenario(sc)
    assert scene.n_frames == 2

    # cam filter path
    ds2 = BlockNeRFDataset(str(tmp_path), cam_ids=[0])
    assert ds2.get_scenario("x")["metas"]["num_frames"] == 2


def test_mega_nerf_reader(tmp_path):
    from neuralsim_tpu.dataio.large_scale import MegaNeRFDataset
    from neuralsim_tpu.scene import Scene
    _make_mega(str(tmp_path))
    ds = MegaNeRFDataset(str(tmp_path),
                         ray_altitude_range=[5.0, 35.0])
    # altitude normalization: (x - origin_drb[0]) / scale
    assert np.allclose(ds.x_minmax, [-0.1, 0.5])
    sc = ds.get_scenario("s", should_split_block=True,
                         split_block_cfg={"block_size": 0.25})
    assert sc["metas"]["num_frames"] == 4
    cam = sc["observers"]["camera"]
    assert cam["data"]["intr"][0][0, 0] == 100.0
    # OpenGL->OpenCV: y/z columns flipped vs identity metadata pose
    np.testing.assert_allclose(cam["data"]["transform"][0][:3, :3],
                               np.diag([1.0, -1.0, -1.0]), atol=1e-6)
    fi = sc["metas"]["floor_info"]
    assert fi["floor_dim"] == "x" and np.isclose(fi["floor_at"], 0.2)
    sb = sc["metas"]["split_block_info"]
    # altitude extent 0.6 / 0.25 -> 3 blocks in dim 0
    assert sb["block_ks"][:, 0].max() == 2
    assert sb["world_block_size"] == 0.25

    img = ds.get_image("s", "camera", 0)
    assert img.shape == (8, 12, 3)
    m = ds.get_occupancy_mask("s", "camera", 0)
    assert m is not None and m.shape == (8, 12)

    # block grid maps straight onto ForestBlockSpace
    from neuralsim_tpu.fields.forest import ForestBlockSpace
    space = ForestBlockSpace(sb["block_ks"], sb["world_block_size"],
                             sb["world_origin"])
    scene = Scene.load_from_scenario(sc)
    assert scene.n_frames == 4
    assert space.block_size == 0.25
