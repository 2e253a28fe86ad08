"""Property tests for the masked segment ops vs dense NumPy references.

These are the TPU analogs of the reference's pack_ops invariants (the closest
upstream test is test_multi_buffer_collect_and_merge in
buffer_compose_renderer.py — SURVEY.md §4.1)."""
import jax
import jax.numpy as jnp
import numpy as np

from neuralsim_tpu.ops import (
    alpha_to_vw,
    exclusive_cumprod,
    masked_mean,
    masked_sum,
    merge_sorted_buffers,
    sample_pdf,
    sort_samples,
    tau_to_alpha,
)


def test_exclusive_cumprod_matches_numpy():
    x = np.random.RandomState(0).uniform(0.1, 1.0, (4, 7)).astype(np.float32)
    got = np.asarray(exclusive_cumprod(jnp.asarray(x)))
    want = np.cumprod(np.concatenate([np.ones((4, 1), np.float32), x[:, :-1]], 1), axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_alpha_to_vw_ragged_equivalence():
    # Build a ragged "pack": ray 0 has 3 samples, ray 1 has 5, ray 2 has 0.
    rng = np.random.RandomState(1)
    S = 8
    counts = [3, 5, 0]
    alpha = rng.uniform(0, 1, (3, S)).astype(np.float32)
    mask = np.zeros((3, S), bool)
    for i, c in enumerate(counts):
        mask[i, :c] = True
    vw = np.asarray(alpha_to_vw(jnp.asarray(alpha), jnp.asarray(mask)))
    # dense reference per ray on the valid prefix
    for i, c in enumerate(counts):
        a = alpha[i, :c]
        T = np.cumprod(np.concatenate([[1.0], 1 - a[:-1] + 1e-10]))
        np.testing.assert_allclose(vw[i, :c], a * T, rtol=1e-4)
        np.testing.assert_allclose(vw[i, c:], 0.0, atol=1e-7)
    # total visibility weight <= 1
    assert np.all(vw.sum(-1) <= 1.0 + 1e-5)


def test_masked_sum_mean():
    x = jnp.arange(12.0).reshape(3, 4)
    mask = jnp.array([[1, 1, 0, 0], [1, 1, 1, 1], [0, 0, 0, 0]], bool)
    np.testing.assert_allclose(np.asarray(masked_sum(x, mask)), [1.0, 22.0, 0.0])
    np.testing.assert_allclose(np.asarray(masked_mean(x, mask)), [0.5, 5.5, 0.0])


def test_sort_samples_pushes_invalid_to_end():
    t = jnp.array([[3.0, 1.0, 2.0, 0.5]])
    mask = jnp.array([[True, True, False, True]])
    rgb = jnp.arange(12.0).reshape(1, 4, 3)
    t_s, m_s, rgb_s = sort_samples(t, mask, rgb)
    np.testing.assert_allclose(np.asarray(t_s[0, :3]), [0.5, 1.0, 3.0])
    assert np.asarray(m_s).tolist() == [[True, True, True, False]]
    # payload follows the permutation: t=0.5 was sample 3 -> rgb [9,10,11]
    np.testing.assert_allclose(np.asarray(rgb_s[0, 0]), [9.0, 10.0, 11.0])


def test_merge_sorted_buffers_matches_global_sort():
    rng = np.random.RandomState(2)
    N, S1, S2 = 5, 6, 4
    b1 = {
        "t": jnp.asarray(rng.uniform(0, 10, (N, S1)).astype(np.float32)),
        "mask": jnp.asarray(rng.rand(N, S1) > 0.3),
        "alpha": jnp.asarray(rng.uniform(0, 1, (N, S1)).astype(np.float32)),
    }
    b2 = {
        "t": jnp.asarray(rng.uniform(0, 10, (N, S2)).astype(np.float32)),
        "mask": jnp.asarray(rng.rand(N, S2) > 0.3),
        "alpha": jnp.asarray(rng.uniform(0, 1, (N, S2)).astype(np.float32)),
    }
    merged = merge_sorted_buffers([b1, b2], payload_keys=("alpha",))
    assert merged["t"].shape == (N, S1 + S2)
    t, m = np.asarray(merged["t"]), np.asarray(merged["mask"])
    for i in range(N):
        valid_t = t[i][m[i]]
        assert np.all(np.diff(valid_t) >= 0), "valid samples must be depth-sorted"
        n_valid = int(np.asarray(b1["mask"])[i].sum() + np.asarray(b2["mask"])[i].sum())
        assert m[i].sum() == n_valid
    # compositing the merged buffer == compositing the globally-sorted union
    vw = np.asarray(alpha_to_vw(merged["alpha"], merged["mask"]))
    for i in range(N):
        ts = np.concatenate([np.asarray(b1["t"])[i], np.asarray(b2["t"])[i]])
        als = np.concatenate([np.asarray(b1["alpha"])[i], np.asarray(b2["alpha"])[i]])
        ms = np.concatenate([np.asarray(b1["mask"])[i], np.asarray(b2["mask"])[i]])
        order = np.argsort(np.where(ms, ts, 1e10), kind="stable")
        a = np.where(ms, als, 0.0)[order]
        T = np.cumprod(np.concatenate([[1.0], 1 - a[:-1] + 1e-10]))
        np.testing.assert_allclose(vw[i], a * T, rtol=1e-4, atol=1e-6)


def test_tau_to_alpha():
    np.testing.assert_allclose(np.asarray(tau_to_alpha(jnp.array([0.0]))), [0.0])
    np.testing.assert_allclose(
        np.asarray(tau_to_alpha(jnp.array([1.0]))), [1 - np.exp(-1)], rtol=1e-6
    )


def test_sample_pdf_concentrates_on_heavy_bin():
    # weights concentrated in bin [2, 3) -> most samples land there
    bins = jnp.broadcast_to(jnp.arange(5.0), (3, 5))
    weights = jnp.broadcast_to(jnp.array([0.01, 0.01, 1.0, 0.01]), (3, 4))
    s_det = np.asarray(sample_pdf(bins, weights, 64, det=True))
    assert s_det.shape == (3, 64)
    frac_in_heavy = ((s_det >= 2) & (s_det < 3)).mean()
    assert frac_in_heavy > 0.9
    # stochastic path
    s_rand = np.asarray(sample_pdf(bins, weights, 64, key=jax.random.PRNGKey(0)))
    assert ((s_rand >= 2) & (s_rand < 3)).mean() > 0.85
    # monotone within each det row
    assert np.all(np.diff(s_det, axis=-1) >= 0)


def test_sample_pdf_uniform_weights_cover_range():
    bins = jnp.broadcast_to(jnp.linspace(0, 1, 9), (2, 9))
    weights = jnp.ones((2, 8))
    s = np.asarray(sample_pdf(bins, weights, 16, det=True))
    np.testing.assert_allclose(s.min(), 0.03125, atol=1e-5)
    np.testing.assert_allclose(s.max(), 1 - 0.03125, atol=1e-5)


def test_merge_sorted_samples_matches_sort():
    # merge of two per-ray-sorted sets == stable argsort of the concat
    from neuralsim_tpu.ops.segment import merge_sorted_samples

    rng = np.random.default_rng(0)
    t_a = np.sort(rng.uniform(0, 4, (64, 16)), axis=-1).astype(np.float32)
    t_b = np.sort(rng.uniform(0, 4, (64, 8)), axis=-1).astype(np.float32)
    # inject exact ties to exercise the a-before-b tie rule (re-sort to
    # keep the merge precondition: each input sorted per ray)
    t_b[:, 3] = t_a[:, 7]
    t_b = np.sort(t_b, axis=-1)
    p_a = rng.normal(size=(64, 16)).astype(np.float32)
    p_b = rng.normal(size=(64, 8)).astype(np.float32)
    m_a = np.ones((64, 16), bool)
    m_a[5:9] = False  # per-ray-constant mask, like hit gating
    m_b = np.ones((64, 8), bool)
    m_b[5:9] = False

    got = merge_sorted_samples(jnp.asarray(t_a), jnp.asarray(t_b),
                               (jnp.asarray(m_a), jnp.asarray(m_b)),
                               (jnp.asarray(p_a), jnp.asarray(p_b)))
    order = np.argsort(np.concatenate([t_a, t_b], -1), axis=-1, kind="stable")
    ref_t = np.take_along_axis(np.concatenate([t_a, t_b], -1), order, -1)
    ref_m = np.take_along_axis(np.concatenate([m_a, m_b], -1), order, -1)
    ref_p = np.take_along_axis(np.concatenate([p_a, p_b], -1), order, -1)
    np.testing.assert_allclose(np.asarray(got[0]), ref_t, rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(got[1]), ref_m)
    np.testing.assert_allclose(np.asarray(got[2]), ref_p, rtol=0, atol=0)


def test_merge_sorted_samples_grad_flows():
    from neuralsim_tpu.ops.segment import merge_sorted_samples

    t_a = jnp.sort(jax.random.uniform(jax.random.PRNGKey(0), (4, 6)), -1)
    t_b = jnp.sort(jax.random.uniform(jax.random.PRNGKey(1), (4, 3)), -1)

    def loss(p):
        t, pm = merge_sorted_samples(t_a, t_b, (p, p[:, :3]))
        return jnp.sum(t * pm)

    g = jax.grad(loss)(jnp.ones((4, 6)))
    assert np.all(np.isfinite(np.asarray(g)))


def test_alpha_to_vw_grad_flows():
    def loss(alpha):
        mask = jnp.ones_like(alpha, bool)
        return jnp.sum(alpha_to_vw(alpha, mask))

    g = jax.grad(loss)(jnp.full((2, 4), 0.5))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.asarray(g) != 0)
