"""Mask / mono-cue extraction tools with random-weight local checkpoints
(reference extract_masks.py / extract_mono_cues.py — SegFormer + omnidata
DPT; this image ships no pretrained weights, so the tools gate on a local
HF checkpoint dir and these tests exercise the full inference + IO path
with tiny randomly-initialized models)."""
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def demo_seq(tmp_path_factory):
    from neuralsim_tpu.dataio.waymo_demo import build_demo_sequence
    root = str(tmp_path_factory.mktemp("data"))
    build_demo_sequence(root, n_frames=2, H=32, W=48, n_vehicles=1,
                        lidar_hw=(4, 8))
    return root


@pytest.fixture(scope="module")
def segformer_dir(tmp_path_factory):
    from transformers import SegformerConfig, SegformerForSemanticSegmentation
    cfg = SegformerConfig(
        num_channels=3, num_encoder_blocks=4, depths=[1, 1, 1, 1],
        sr_ratios=[4, 2, 1, 1], hidden_sizes=[8, 8, 16, 16],
        patch_sizes=[7, 3, 3, 3], strides=[4, 2, 2, 2],
        num_attention_heads=[1, 1, 2, 2], decoder_hidden_size=16,
        num_labels=19)
    d = str(tmp_path_factory.mktemp("segformer"))
    SegformerForSemanticSegmentation(cfg).save_pretrained(d)
    return d


@pytest.fixture(scope="module")
def dpt_dir(tmp_path_factory):
    from transformers import DPTConfig, DPTForDepthEstimation
    cfg = DPTConfig(hidden_size=32, num_hidden_layers=4,
                    num_attention_heads=2, intermediate_size=64,
                    image_size=384, patch_size=16,
                    neck_hidden_sizes=[16, 16, 16, 16],
                    fusion_hidden_size=16,
                    backbone_out_indices=[0, 1, 2, 3])
    d = str(tmp_path_factory.mktemp("dpt"))
    DPTForDepthEstimation(cfg).save_pretrained(d)
    return d


def test_extract_masks_cli(demo_seq, segformer_dir):
    from neuralsim_tpu.tools.extract_masks import main
    n = main(["--data_root", demo_seq, "--weights", segformer_dir,
              "--mask_dirname", "masks_pred", "--infer_size", "64"])
    assert n == 2
    p = os.path.join(demo_seq, "demo_drive", "masks_pred", "camera_FRONT",
                     "00000000.npz")
    with np.load(p) as z:
        m = z[z.files[0]]
    assert m.shape == (32, 48) and m.dtype == np.uint8
    assert m.max() < 19      # cityscapes trainIds


def test_extract_masks_requires_weights(demo_seq):
    from neuralsim_tpu.tools.extract_masks import main
    with pytest.raises(FileNotFoundError):
        main(["--data_root", demo_seq, "--weights", "/nonexistent"])


def test_extract_depth_cli(demo_seq, dpt_dir):
    from neuralsim_tpu.tools.extract_mono_cues import main
    n = main(["--task", "depth", "--data_root", demo_seq,
              "--weights", dpt_dir, "--ref_img_size", "64",
              "--depth_dirname", "depths_pred"])
    assert n == 2
    p = os.path.join(demo_seq, "demo_drive", "depths_pred", "camera_FRONT",
                     "00000000.npz")
    with np.load(p) as z:
        d = z[z.files[0]].astype(np.float32)
    assert d.shape == (32, 48, 1)
    assert np.isfinite(d).all() and d.min() >= 0.0 and d.max() <= 1.0 + 1e-3


def test_extract_normals_cli(demo_seq, dpt_dir):
    from neuralsim_tpu.tools.extract_mono_cues import main
    n = main(["--task", "normal", "--data_root", demo_seq,
              "--weights", dpt_dir, "--ref_img_size", "64",
              "--normals_dirname", "normals_pred"])
    assert n == 2
    base = os.path.join(demo_seq, "demo_drive", "normals_pred",
                        "camera_FRONT", "00000000")
    assert os.path.isfile(base + ".jpg")
    with np.load(base + ".npz") as z:
        nm = z[z.files[0]].astype(np.float32)
    assert nm.shape == (32, 48, 3)
    assert np.isfinite(nm).all()


def test_extracted_cues_readable_by_waymo_dataset(demo_seq, dpt_dir,
                                                  segformer_dir):
    """The tools' outputs round-trip through the WaymoDataset reader
    (depths/masks/normals dirnames are the reader defaults)."""
    from neuralsim_tpu.dataio.waymo import WaymoDataset
    from neuralsim_tpu.tools.extract_masks import main as masks_main
    from neuralsim_tpu.tools.extract_mono_cues import main as cues_main
    cues_main(["--task", "depth", "--data_root", demo_seq,
               "--weights", dpt_dir, "--ref_img_size", "64"])
    cues_main(["--task", "normal", "--data_root", demo_seq,
               "--weights", dpt_dir, "--ref_img_size", "64"])
    ds = WaymoDataset(root=demo_seq)
    sid = ds.scene_ids()[0]
    d = ds.get_mono_depth(sid, "camera_FRONT", 0)
    nm = ds.get_mono_normals(sid, "camera_FRONT", 0)
    assert d is not None and d.shape[:2] == (32, 48)
    assert nm is not None and nm.shape == (32, 48, 3)
