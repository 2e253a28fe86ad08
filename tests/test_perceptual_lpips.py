"""VGG16 perceptual loss + LPIPS with externally supplied weights.

The image is zero-egress (no pretrained weights), so these tests exercise
the loader + forward/backward with RANDOM torchvision-layout weights —
the gate is "no weights file", not "not implemented" (VERDICT r2 item 8;
reference app/loss/perceptual.py:24-101).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from neuralsim_tpu.losses.vgg import (_VGG16_CHANNELS, _VGG16_CONV_IDX,
                                      load_vgg16, lpips_pair,
                                      vgg16_features, vgg_perceptual)
from neuralsim_tpu.losses.perceptual import perceptual_loss
from neuralsim_tpu.maths.metrics import lpips_np


def _random_vgg16_npz(path, with_lins=False, seed=0):
    rng = np.random.default_rng(seed)
    state = {}
    cin = 3
    for ci, fi in enumerate(_VGG16_CONV_IDX):
        cout = _VGG16_CHANNELS[ci]
        state[f"features.{fi}.weight"] = \
            rng.normal(0, 0.05, (cout, cin, 3, 3)).astype(np.float32)
        state[f"features.{fi}.bias"] = np.zeros(cout, np.float32)
        cin = cout
    if with_lins:
        for k, c in enumerate((64, 128, 256, 512, 512)):
            state[f"lin{k}.model.1.weight"] = \
                np.abs(rng.normal(0, 0.1, (1, c, 1, 1))).astype(np.float32)
    np.savez(path, **state)
    return str(path)


def test_vgg16_feature_shapes(tmp_path):
    p = _random_vgg16_npz(tmp_path / "vgg.npz")
    convs, lins = load_vgg16(p)
    assert len(convs) == 13 and lins == ()
    x = jnp.asarray(np.random.default_rng(1).uniform(
        size=(2, 32, 32, 3)), jnp.float32)
    f1, f2, f3 = vgg16_features(convs, x,
                                ("relu1_2", "relu2_2", "relu3_3"))
    assert f1.shape == (2, 32, 32, 64)
    assert f2.shape == (2, 16, 16, 128)
    assert f3.shape == (2, 8, 8, 256)


def test_perceptual_loss_value_and_gradient(tmp_path):
    p = _random_vgg16_npz(tmp_path / "vgg.npz")
    rng = np.random.default_rng(2)
    gt = jnp.asarray(rng.uniform(size=(1, 16, 16, 3)), jnp.float32)
    # identical patches -> 0; different -> positive
    cfg = {"weights_path": p, "w": 1.0}
    assert float(perceptual_loss(gt, gt, 0, cfg)) == pytest.approx(0.0, abs=1e-6)
    pred = jnp.clip(gt + 0.2, 0, 1)
    val = float(perceptual_loss(pred, gt, 0, cfg))
    assert np.isfinite(val) and val > 0
    # gradients flow to the prediction (trainable), not NaN
    g = jax.grad(lambda x: perceptual_loss(x, gt, 0, cfg))(pred)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
    # no weights -> inert 0 (gate, not NotImplementedError)
    assert float(perceptual_loss(pred, gt, 0, {"w": 1.0})) == 0.0


def test_lpips_with_and_without_lins(tmp_path):
    p_lin = _random_vgg16_npz(tmp_path / "lpips.npz", with_lins=True)
    convs, lins = load_vgg16(p_lin)
    assert len(lins) == 5 and lins[0].shape == (64,)
    rng = np.random.default_rng(3)
    a = rng.uniform(size=(24, 24, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape).astype(np.float32), 0, 1)
    d_same = lpips_np(a, a, p_lin)
    d_diff = lpips_np(a, b, p_lin)
    assert d_same == pytest.approx(0.0, abs=1e-6)
    assert np.isfinite(d_diff) and d_diff > 0
    # no weights path -> None (metric reported as absent, not fake)
    assert lpips_np(a, b, None) is None
    # backbone without lin heads falls back to channel-mean weighting
    v = float(lpips_pair(convs, (), jnp.asarray(a)[None], jnp.asarray(b)[None]))
    assert np.isfinite(v) and v > 0


def test_loader_rejects_non_vgg(tmp_path):
    np.savez(tmp_path / "bad.npz", foo=np.zeros(3, np.float32))
    with pytest.raises(ValueError, match="VGG16"):
        load_vgg16(str(tmp_path / "bad.npz"))
