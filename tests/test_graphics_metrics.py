"""Tests: marching tetrahedra mesh extraction + SSIM/PSNR metrics."""
import numpy as np

from neuralsim_tpu.graphics import export_mesh_ply, extract_mesh, marching_tets
from neuralsim_tpu.maths.metrics import psnr_np, ssim_np


def test_marching_tets_sphere():
    res = 48
    xs = np.linspace(-1, 1, res)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    sdf = np.sqrt(X**2 + Y**2 + Z**2) - 0.5
    verts, faces = marching_tets(sdf, origin=(-1, -1, -1),
                                 spacing=[2 / (res - 1)] * 3)
    assert verts.shape[0] > 500 and faces.shape[0] > 500
    r = np.linalg.norm(verts, axis=-1)
    np.testing.assert_allclose(r.mean(), 0.5, atol=0.02)
    assert np.abs(r - 0.5).max() < 0.06
    # faces index valid vertices
    assert faces.max() < verts.shape[0] and faces.min() >= 0


def test_extract_mesh_from_fn(tmp_path):
    verts, faces = extract_mesh(
        lambda p: np.linalg.norm(p, axis=-1) - 0.4,
        aabb_min=(-1, -1, -1), aabb_max=(1, 1, 1), resolution=32)
    r = np.linalg.norm(verts, axis=-1)
    np.testing.assert_allclose(r.mean(), 0.4, atol=0.03)
    p = tmp_path / "m.ply"
    export_mesh_ply(str(p), verts, faces)
    data = p.read_bytes()
    assert data.startswith(b"ply") and len(data) > 1000


def test_ssim_psnr():
    rng = np.random.default_rng(0)
    img = rng.random((64, 64, 3)).astype(np.float32)
    assert psnr_np(img, img) > 90
    assert ssim_np(img, img) > 0.999
    noisy = np.clip(img + rng.normal(0, 0.1, img.shape), 0, 1)
    p = psnr_np(noisy, img)
    s = ssim_np(noisy, img)
    assert 15 < p < 25
    assert 0.2 < s < 0.95
    # SSIM should punish structural change more than constant shift
    shifted = np.clip(img + 0.1, 0, 1)
    assert ssim_np(shifted, img) > s
