"""Monocular depth / surface-normal cue extraction (reference
dataio/autonomous_driving/waymo/extract_mono_cues.py: omnidata DPT-Hybrid,
depth saved as float16 npz in [0,1] normalized by the per-image max,
normals saved as uint8 jpg in [0,1] — both resized back to full res).

TPU-era re-design: inference through a LOCAL HuggingFace DPT checkpoint
directory (``--weights``). ``--task depth`` accepts any
DPTForDepthEstimation checkpoint (e.g. a local Intel/dpt-hybrid-midas or an
omnidata checkpoint converted to HF layout); ``--task normal`` accepts a
DPT checkpoint whose head was widened to 3 channels (``--head_channels``
rebuilds the final conv before loading, omnidata-v2-style). The gate is "no
weights dir" (zero-egress image ships no pretrained nets), not "not
implemented".

Output layout matches the reader (dataio/waymo.py): depths/<cam>/<f>.npz
float16 [H, W, 1]; normals/<cam>/<f>.jpg (+ npz) in [0, 1].
"""
from __future__ import annotations

import argparse
import os
from glob import glob
from typing import List, Optional

import numpy as np


def load_model(weights_dir: str, task: str, head_channels: int = 1):
    if not os.path.isdir(weights_dir):
        raise FileNotFoundError(
            f"--weights must be a local HuggingFace DPT checkpoint dir "
            f"(got {weights_dir}). This image has no network egress.")
    import torch
    from transformers import DPTConfig, DPTForDepthEstimation
    if task == "depth" and head_channels == 1:
        model = DPTForDepthEstimation.from_pretrained(weights_dir)
    else:
        # widen the final head conv to `head_channels` (normals = 3),
        # then load whatever matches (omnidata-v2-converted checkpoints
        # carry the 3-channel head; strict=False tolerates absent buffers)
        cfg = DPTConfig.from_pretrained(weights_dir)
        model = DPTForDepthEstimation(cfg)
        head = model.head.head
        for i in range(len(head) - 1, -1, -1):
            if isinstance(head[i], torch.nn.Conv2d):
                old = head[i]
                head[i] = torch.nn.Conv2d(
                    old.in_channels, head_channels, old.kernel_size,
                    old.stride, old.padding)
                break
        import safetensors.torch as st
        state = {}
        for f in glob(os.path.join(weights_dir, "*.safetensors")):
            state.update(st.load_file(f))
        for f in glob(os.path.join(weights_dir, "*.bin")):
            state.update(torch.load(f, map_location="cpu",
                                    weights_only=True))
        # drop head weights whose shape disagrees with the widened head
        # (e.g. a 1-channel depth checkpoint feeding a 3-channel normals
        # head keeps its backbone and gets a fresh head)
        own = dict(model.state_dict())
        for k in list(state):
            if k in own and tuple(state[k].shape) != tuple(own[k].shape):
                print(f"extract_mono_cues: dropping shape-mismatched {k} "
                      f"{tuple(state[k].shape)} -> fresh "
                      f"{tuple(own[k].shape)}", flush=True)
                del state[k]
        missing, unexpected = model.load_state_dict(state, strict=False)
        dropped = [k for k in missing if not k.startswith("head.")]
        if dropped:
            raise ValueError(f"checkpoint missing non-head keys: "
                             f"{dropped[:5]}...")
    model.eval()
    return model, torch


def _resize(torch, x, hw):
    return torch.nn.functional.interpolate(
        x, hw, mode="bilinear", align_corners=False)


def infer_cue(model, torch, img: np.ndarray, task: str,
              ref_img_size: int = 384) -> np.ndarray:
    """img [H, W, 3] in [0,1] -> depth [H, W, 1] float16 in [0,1] (relative,
    max-normalized like the reference) or normals [H, W, 3] in [0,1]."""
    H, W = img.shape[:2]
    x = torch.from_numpy(np.ascontiguousarray(
        img.transpose(2, 0, 1)[None])).float()
    x = (x - 0.5) / 0.5                       # omnidata/midas normalization
    # square inference resolution: HF DPT's internal-ViT neck reshapes
    # tokens by sqrt(seq) when no external backbone config is present, so
    # non-square inputs are unsupported there; cues are weak hints and the
    # output is resized back to the true (H, W) regardless (the reference
    # keeps aspect — extract_mono_cues.py:66-73 — at the cost of requiring
    # the exact omnidata stack)
    x = _resize(torch, x, (ref_img_size, ref_img_size))
    with torch.no_grad():
        # HF squeezes dim 1 only when it is size 1, so a widened 3-channel
        # (normals) head comes back as [1, 3, h, w] and depth as [1, h, w]
        out = model(pixel_values=x).predicted_depth
        if out.ndim == 3:
            out = out[:, None]
        if task == "depth":
            # relative depth in [0,1], max-normalized (reference :80-82)
            out = out.clamp(min=0)
            out = out / out.max().clamp(min=1e-8)
        else:
            out = out.clamp(0, 1)
        out = _resize(torch, out.float(), (H, W))[0]
    arr = out.permute(1, 2, 0).numpy()
    return arr


def run_sequence(seq_dir: str, model, torch, task: str, rgb_dirname: str,
                 out_dirname: str, ignore_existing: bool, verbose: bool,
                 ref_img_size: int) -> int:
    from PIL import Image
    n_done = 0
    for cam_dir in sorted(glob(os.path.join(seq_dir, rgb_dirname, "*"))):
        cam_id = os.path.basename(cam_dir)
        out_dir = os.path.join(seq_dir, out_dirname, cam_id)
        os.makedirs(out_dir, exist_ok=True)
        for fpath in sorted(glob(os.path.join(cam_dir, "*"))):
            stem = os.path.splitext(os.path.basename(fpath))[0]
            out = os.path.join(out_dir, stem + ".npz")
            if ignore_existing and os.path.isfile(out):
                continue
            img = np.asarray(Image.open(fpath), np.float32)[..., :3] / 255.0
            arr = infer_cue(model, torch, img, task, ref_img_size)
            if task == "depth":
                np.savez_compressed(out, arr.astype(np.float16))
                if verbose:
                    Image.fromarray(
                        (arr[..., 0] * 255).clip(0, 255).astype(np.uint8)
                    ).save(os.path.join(out_dir, stem + ".jpg"), quality=92)
            else:
                u8 = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
                Image.fromarray(u8).save(
                    os.path.join(out_dir, stem + ".jpg"), quality=95)
                np.savez_compressed(out, arr.astype(np.float16))
            n_done += 1
    return n_done


def main(argv: Optional[List[str]] = None):
    ap = argparse.ArgumentParser(allow_abbrev=False)
    ap.add_argument("--task", required=True, choices=["depth", "normal",
                                                      "normals"])
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--weights", required=True,
                    help="local HF DPT checkpoint dir")
    ap.add_argument("--seq_list", default=None)
    ap.add_argument("--rgb_dirname", default="images")
    ap.add_argument("--depth_dirname", default="depths")
    ap.add_argument("--normals_dirname", default="normals")
    ap.add_argument("--ref_img_size", type=int, default=384)
    ap.add_argument("--ignore_existing", action="store_true")
    ap.add_argument("--verbose", action="store_true")
    a = ap.parse_args(argv)
    task = "depth" if a.task == "depth" else "normal"

    model, torch = load_model(a.weights, task,
                              head_channels=1 if task == "depth" else 3)
    out_dirname = a.depth_dirname if task == "depth" else a.normals_dirname
    seqs = (a.seq_list.split(",") if a.seq_list else
            sorted(os.path.basename(p)
                   for p in glob(os.path.join(a.data_root, "*"))
                   if os.path.isdir(os.path.join(p, a.rgb_dirname))))
    total = 0
    for seq in seqs:
        n = run_sequence(os.path.join(a.data_root, seq), model, torch, task,
                         a.rgb_dirname, out_dirname, a.ignore_existing,
                         a.verbose, a.ref_img_size)
        print(f"{seq}: {n} {task} maps", flush=True)
        total += n
    print(f"done: {total} {task} maps", flush=True)
    return total


if __name__ == "__main__":
    main()
