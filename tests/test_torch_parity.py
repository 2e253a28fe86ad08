"""Numerical parity vs independent PyTorch oracles.

BASELINE.md's parity requirement is allclose images + pixel-grads vs the
PyTorch/CUDA reference; the reference's numerical core (nr3d_lib) is absent
from the checkout (SURVEY.md header), so these tests implement the published
math independently in torch (CPU, fp64) and require our JAX kernels to match:
NeuS CDF-ratio alpha, transmittance weights, volume integration, CDF
inverse-transform sampling, and pixel gradients through the composite.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from neuralsim_tpu.fields.neus import neus_alpha_from_sdf
from neuralsim_tpu.ops.segment import alpha_to_vw, sample_pdf
from neuralsim_tpu.renderers.buffers import volume_integrate


def torch_neus_alpha(sdf, cos, dist, inv_s, eps=1e-5):
    est_prev = sdf - cos * dist * 0.5
    est_next = sdf + cos * dist * 0.5
    cdf_prev = torch.sigmoid(est_prev * inv_s)
    cdf_next = torch.sigmoid(est_next * inv_s)
    return ((cdf_prev - cdf_next + eps) / (cdf_prev + eps)).clamp(0.0, 1.0)


def torch_alpha_to_vw(alpha, mask):
    a = torch.where(mask, alpha, torch.zeros_like(alpha))
    trans = torch.cumprod(
        torch.cat([torch.ones_like(a[..., :1]), 1.0 - a + 1e-10], -1), -1)[..., :-1]
    return a * trans


def test_neus_alpha_parity():
    rng = np.random.default_rng(0)
    sdf = rng.standard_normal((64, 32)) * 0.3
    cos = -np.abs(rng.standard_normal((64, 32)))
    dist = rng.random((64, 32)) * 0.1 + 1e-3
    ours = np.asarray(neus_alpha_from_sdf(jnp.asarray(sdf), jnp.asarray(cos),
                                          jnp.asarray(dist), 64.0))
    ref = torch_neus_alpha(torch.tensor(sdf), torch.tensor(cos),
                           torch.tensor(dist), 64.0).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_vw_and_integration_parity():
    rng = np.random.default_rng(1)
    alpha = rng.random((32, 24)).astype(np.float64) * 0.5
    mask = rng.random((32, 24)) > 0.2
    t = np.sort(rng.random((32, 24)), axis=-1) * 10
    rgb = rng.random((32, 24, 3))

    ours_vw = np.asarray(alpha_to_vw(jnp.asarray(alpha), jnp.asarray(mask)))
    ref_vw = torch_alpha_to_vw(torch.tensor(alpha), torch.tensor(mask)).numpy()
    np.testing.assert_allclose(ours_vw, ref_vw, rtol=1e-5, atol=1e-7)

    out = volume_integrate({"t": jnp.asarray(t), "mask": jnp.asarray(mask),
                            "alpha": jnp.asarray(alpha), "rgb": jnp.asarray(rgb)})
    ref_rgb = (torch.tensor(ref_vw)[..., None]
               * torch.tensor(rgb) * torch.tensor(mask)[..., None]).sum(-2).numpy()
    np.testing.assert_allclose(np.asarray(out["rgb_volume"]), ref_rgb,
                               rtol=1e-5, atol=1e-6)
    ref_msum = (torch.tensor(ref_vw) * torch.tensor(mask)).sum(-1).numpy()
    np.testing.assert_allclose(np.asarray(out["mask_volume"]), ref_msum,
                               rtol=1e-5, atol=1e-6)


def test_sample_pdf_parity():
    """Deterministic inverse-transform sampling vs a torch searchsorted oracle."""
    rng = np.random.default_rng(2)
    bins = np.sort(rng.random((8, 17)), axis=-1).astype(np.float64)
    w = rng.random((8, 16)).astype(np.float64)
    n = 12
    ours = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(w), n, det=True))

    wt = torch.tensor(w) + 1e-5
    pdf = wt / wt.sum(-1, keepdim=True)
    cdf = torch.cumsum(pdf, -1)
    cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], -1)
    u = torch.linspace(0.5 / n, 1.0 - 0.5 / n, n, dtype=torch.float64).expand(8, n)
    inds = torch.searchsorted(cdf, u, right=True)
    below = (inds - 1).clamp(0, cdf.shape[-1] - 1)
    above = inds.clamp(0, cdf.shape[-1] - 1)
    cdf_b = torch.gather(cdf, -1, below)
    cdf_a = torch.gather(cdf, -1, above)
    bin_b = torch.gather(torch.tensor(bins), -1, below)
    bin_a = torch.gather(torch.tensor(bins), -1, above)
    denom = torch.where(cdf_a - cdf_b < 1e-5, torch.ones_like(cdf_a), cdf_a - cdf_b)
    ref = (bin_b + (u - cdf_b) / denom * (bin_a - bin_b)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_pixel_gradient_parity():
    """d(composite rgb)/d(per-sample rgb & alpha) matches torch autograd."""
    rng = np.random.default_rng(3)
    alpha0 = rng.random((4, 8)) * 0.6
    rgb0 = rng.random((4, 8, 3))
    mask = np.ones((4, 8), bool)

    def ours_loss(alpha, rgb):
        vw = alpha_to_vw(alpha, jnp.asarray(mask))
        return jnp.sum((vw[..., None] * rgb))

    ga, gr = jax.grad(ours_loss, argnums=(0, 1))(jnp.asarray(alpha0),
                                                 jnp.asarray(rgb0))

    ta = torch.tensor(alpha0, requires_grad=True)
    tr = torch.tensor(rgb0, requires_grad=True)
    vw = torch_alpha_to_vw(ta, torch.tensor(mask))
    (vw[..., None] * tr).sum().backward()
    np.testing.assert_allclose(np.asarray(ga), ta.grad.numpy(), rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(gr), tr.grad.numpy(), rtol=1e-4,
                               atol=1e-6)
