"""Golden tests for fields + renderer v0 against analytically-known SDFs.

Test strategy per SURVEY.md §4: the reference has no test suite; we design
our own pyramid — numerical goldens on a unit sphere, shape/contract checks
on the volume-buffer protocol (App. A.1/A.2).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralsim_tpu.fields import AABBSpace, NeRFDistantField, NeuSField, SimpleSky
from neuralsim_tpu.fields.encodings.lotd import LoTDEncoding, make_lotd, ngp_levels
from neuralsim_tpu.fields.blocks import MLP, LipschitzMLP, geometric_init_mlp
from neuralsim_tpu.fields.embedders import spherical_harmonics, sinusoidal_embedder
from neuralsim_tpu.renderers import SingleVolumeRenderer


def test_mlp_shapes_and_grad():
    mlp = MLP(5, 3, hidden=32, depth=2, skips=(1,))
    p = mlp.init(jax.random.PRNGKey(0))
    x = jnp.ones((7, 5))
    y = mlp(p, x)
    assert y.shape == (7, 3)
    g = jax.grad(lambda p: jnp.sum(mlp(p, x)))(p)
    assert jax.tree.all(jax.tree.map(lambda a: jnp.all(jnp.isfinite(a)), g))


def test_lipschitz_mlp_bound():
    mlp = LipschitzMLP(4, 2, hidden=16, depth=2)
    p = mlp.init(jax.random.PRNGKey(1))
    y = mlp(p, jnp.ones((3, 4)))
    assert y.shape == (3, 2)
    assert float(LipschitzMLP.lipschitz_bound(p)) > 0


def test_sh_orthonormality():
    # SH basis functions should be orthonormal over the sphere (MC check).
    key = jax.random.PRNGKey(2)
    v = jax.random.normal(key, (200000, 3))
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    Y = spherical_harmonics(v, degree=3)  # [N, 9]
    gram = (Y.T @ Y) / v.shape[0] * (4 * jnp.pi)
    np.testing.assert_allclose(np.asarray(gram), np.eye(9), atol=0.05)


def test_pe_annealing_window():
    embed, dim = sinusoidal_embedder(4, 3, include_input=True)
    x = jnp.ones((2, 3)) * 0.3
    full = embed(x)
    assert full.shape == (2, dim)
    # alpha=0 kills all frequency bands but keeps the raw input
    masked = embed(x, alpha=0.0)
    np.testing.assert_allclose(np.asarray(masked[:, 3:]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(masked[:, :3]), np.asarray(x))


def test_lotd_encoding_interpolation_and_grads():
    enc = LoTDEncoding([(8, 2, "dense"), (32, 2, "hash")], input_dim=3,
                       log2_hashmap_size=10)
    p = enc.init(jax.random.PRNGKey(3))
    x = jax.random.uniform(jax.random.PRNGKey(4), (64, 3))
    f = enc(p, x)
    assert f.shape == (64, 4)
    # continuity: tiny perturbation => tiny feature change
    f2 = enc(p, x + 1e-5)
    assert float(jnp.max(jnp.abs(f - f2))) < 1e-3
    # gradients flow to the table
    g = jax.grad(lambda pp: jnp.sum(enc(pp, x) ** 2))(p)
    assert float(jnp.sum(jnp.abs(g["table"]))) > 0
    # level annealing masks the fine level
    f_coarse = enc(p, x, max_level=0)
    np.testing.assert_allclose(np.asarray(f_coarse[:, 2:]), 0.0, atol=1e-7)


def test_lotd_batched_tables():
    enc = LoTDEncoding([(8, 2, "dense")], input_dim=3)
    p = enc.init_batched(jax.random.PRNGKey(5), 3)
    x = jax.random.uniform(jax.random.PRNGKey(6), (10, 3))
    bidx = jnp.array([0, 1, 2, 0, 1, 2, 0, 1, 2, 0])
    f = enc(p, x, bidx=bidx)
    assert f.shape == (10, 2)
    # instance 0 and 1 have different tables -> different features
    f0 = enc({"table": p["table"][0:1].repeat(3, 0)}, x, bidx=bidx)
    assert float(jnp.max(jnp.abs(f - f0))) > 0


def test_ngp_level_ladder():
    levels = ngp_levels(n_levels=8, base_res=16, max_res=512, log2_hashmap_size=15)
    rs = [r for r, _, _ in levels]
    assert rs[0] == 16 and rs[-1] == 512
    assert all(rs[i] <= rs[i + 1] for i in range(len(rs) - 1))


def test_geometric_init_is_spherical():
    mlp = geometric_init_mlp(3, 1 + 8, hidden=64, depth=4, radius_init=0.5)
    p = mlp.init(jax.random.PRNGKey(7))
    # SDF should be ~|x| - 0.5 at init
    x = jnp.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 2.0, 0.0]])
    sdf = mlp(p, x)[:, 0]
    expected = jnp.linalg.norm(x, axis=-1) - 0.5
    np.testing.assert_allclose(np.asarray(sdf), np.asarray(expected), atol=0.25)


@pytest.fixture(scope="module")
def sphere_field():
    """A NeuSField over [-1,1]^3 whose initial SDF ≈ sphere of radius 0.5."""
    space = AABBSpace((-1, -1, -1), (1, 1, 1))
    field = NeuSField(space, geometry="lotd",
                      encoding_cfg={"n_levels": 4, "base_res": 8, "max_res": 64,
                                    "log2_hashmap_size": 12},
                      geo_feat_dim=8, radiance_hidden=32,
                      ln_inv_s_init=float(np.log(50.0)))
    params = field.init(jax.random.PRNGKey(0))
    return field, params


def test_neus_field_sdf_near_sphere(sphere_field):
    field, params = sphere_field
    x = jnp.array([[0.0, 0.0, 0.0], [0.9, 0.0, 0.0]])
    sdf = field.query_sdf(params, x)
    assert sdf[0] < 0  # inside
    assert sdf[1] > 0  # outside


def test_neus_nablas_are_unit_ish(sphere_field):
    field, params = sphere_field
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-0.8, maxval=0.8)
    sdf, nablas, feat = field.sdf_nablas_feat(params, x)
    norms = jnp.linalg.norm(nablas, axis=-1)
    # init is near-spherical => gradient norms near 1
    assert float(jnp.mean(jnp.abs(norms - 1.0))) < 0.5


def test_neus_ray_query_depth_matches_sphere(sphere_field):
    field, params = sphere_field
    # rays from +x axis pointing at origin: should hit the r=0.5 sphere at t=1.5
    n = 8
    rays_o = jnp.tile(jnp.array([[2.0, 0.0, 0.0]]), (n, 1))
    rays_d = jnp.tile(jnp.array([[-1.0, 0.0, 0.0]]), (n, 1))
    buf = field.ray_query(params, rays_o, rays_d, key=jax.random.PRNGKey(2),
                          num_coarse=64, num_fine=(16, 16),
                          upsample_inv_s=64.0, upsample_inv_s_factors=(1.0, 4.0))
    from neuralsim_tpu.renderers.buffers import volume_integrate
    rendered = volume_integrate(buf)
    depth = np.asarray(rendered["depth_volume"])
    mask = np.asarray(rendered["mask_volume"])
    assert mask.min() > 0.5  # opaque surface hit
    np.testing.assert_allclose(depth, 1.5, atol=0.15)


def test_neus_miss_rays_are_masked(sphere_field):
    field, params = sphere_field
    rays_o = jnp.array([[5.0, 5.0, 5.0]])
    rays_d = jnp.array([[1.0, 0.0, 0.0]])  # pointing away from the box
    buf = field.ray_query(params, rays_o, rays_d, key=None, num_coarse=32,
                          num_fine=(8,), upsample_inv_s_factors=(1.0,))
    assert not bool(buf["details"]["hit"][0])
    assert float(jnp.sum(buf["alpha"])) == 0.0


def test_single_volume_renderer_with_distant_and_sky(sphere_field):
    field, _ = sphere_field
    renderer = SingleVolumeRenderer(
        {"cr": field,
         "distant": NeRFDistantField(inner_radius=1.0, geometry="mlp",
                                     geo_feat_dim=8, radiance_hidden=32),
         "sky": SimpleSky(hidden=32)},
        query_cfg={"num_coarse": 32, "num_fine": (8,),
                   "upsample_inv_s_factors": (1.0,)},
        distant_query_cfg={"num_samples": 16})
    params = renderer.init(jax.random.PRNGKey(0))
    rays_o = jnp.tile(jnp.array([[2.0, 0.0, 0.0]]), (4, 1))
    rays_d = jnp.tile(jnp.array([[-1.0, 0.0, 0.0]]), (4, 1))
    rendered = jax.jit(lambda p, o, d: renderer.ray_query(
        p, o, d, key=jax.random.PRNGKey(1)))(params, rays_o, rays_d)
    assert rendered["rgb_volume"].shape == (4, 3)
    assert rendered["depth_volume"].shape == (4,)
    assert "rendered_cr" in rendered and "rendered_dv" in rendered
    assert jnp.all(jnp.isfinite(rendered["rgb_volume"]))
    # rgb in [0, 1] after sky blend
    assert float(jnp.min(rendered["rgb_volume"])) >= 0.0
    assert float(jnp.max(rendered["rgb_volume"])) <= 1.0 + 1e-5


def test_renderer_chunked_equals_direct(sphere_field):
    field, params_cr = sphere_field
    renderer = SingleVolumeRenderer(
        {"cr": field}, query_cfg={"num_coarse": 32, "num_fine": (8,),
                                  "upsample_inv_s_factors": (1.0,),
                                  "perturb": False})
    params = {"cr": params_cr}
    key = jax.random.PRNGKey(3)
    rays_o = jnp.tile(jnp.array([[2.0, 0.0, 0.0]]), (10, 1))
    d = jnp.array([[-1.0, 0.05, 0.0], [-1.0, 0.0, 0.05]]).repeat(5, 0)
    rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    direct = renderer.ray_query(params, rays_o, rays_d, key=None)
    chunked = renderer.render_chunked(params, rays_o, rays_d, rayschunk=4, key=None)
    np.testing.assert_allclose(np.asarray(direct["depth_volume"]),
                               np.asarray(chunked["depth_volume"]), rtol=1e-5)


def test_sorted_vs_unsorted_merge_parity():
    """The assume_sorted fast path must integrate exactly like the sorted
    merge for depth-disjoint cr+distant buffers."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from neuralsim_tpu.renderers.buffers import merge_and_integrate

    key = jax.random.PRNGKey(0)
    N, S1, S2 = 16, 12, 8
    k1, k2, k3, k4 = jax.random.split(key, 4)
    t1 = jnp.sort(jax.random.uniform(k1, (N, S1), minval=0.1, maxval=1.0), -1)
    t2 = jnp.sort(jax.random.uniform(k2, (N, S2), minval=1.0, maxval=5.0), -1)
    m1 = jax.random.uniform(k3, (N, S1)) > 0.3
    m2 = jnp.ones((N, S2), bool)
    b1 = {"t": t1, "mask": m1,
          "alpha": jax.random.uniform(k3, (N, S1)) * 0.5,
          "rgb": jax.random.uniform(k4, (N, S1, 3))}
    b2 = {"t": t2, "mask": m2,
          "alpha": jax.random.uniform(k4, (N, S2)) * 0.5,
          "rgb": jax.random.uniform(k1, (N, S2, 3))}
    r_sorted = merge_and_integrate([b1, b2], with_per_src=True,
                                   sort_free=False)
    for r_fast in (merge_and_integrate([b1, b2], with_per_src=True,
                                       assume_sorted=True),
                   merge_and_integrate([b1, b2], with_per_src=True)):
        for k in ("rgb_volume", "depth_volume", "mask_volume"):
            np.testing.assert_allclose(np.asarray(r_fast[k]),
                                       np.asarray(r_sorted[k]),
                                       rtol=1e-5, atol=1e-6)
        for i in range(2):
            np.testing.assert_allclose(
                np.asarray(r_fast["per_src"][i]["rgb_volume"]),
                np.asarray(r_sorted["per_src"][i]["rgb_volume"]),
                rtol=1e-5, atol=1e-6)


def test_sort_free_merge_parity_overlapping():
    """Order-free cross-source compositing (cross_source_vw, the default
    multi-buffer merge) must match the sort-based oracle on buffers whose
    depth ranges INTERLEAVE — the real multi-object case (vehicles overlap
    the street's depth range) — including gradients w.r.t. alpha."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from neuralsim_tpu.renderers.buffers import merge_and_integrate

    key = jax.random.PRNGKey(7)
    N, S1, S2, S3 = 16, 10, 8, 6
    ks = jax.random.split(key, 8)
    bufs = []
    for i, S in enumerate((S1, S2, S3)):
        t = jnp.sort(jax.random.uniform(ks[i], (N, S), minval=0.1,
                                        maxval=4.0), -1)
        bufs.append({
            "t": t,
            "mask": jax.random.uniform(ks[i + 3], (N, S)) > 0.3,
            "alpha": jax.random.uniform(ks[i + 3], (N, S)) * 0.9,
            "rgb": jax.random.uniform(ks[(i + 5) % 8], (N, S, 3)),
        })

    r_oracle = merge_and_integrate(bufs, with_per_src=True, sort_free=False)
    r_free = merge_and_integrate(bufs, with_per_src=True, sort_free=True)
    for k in ("rgb_volume", "depth_volume", "mask_volume"):
        np.testing.assert_allclose(np.asarray(r_free[k]),
                                   np.asarray(r_oracle[k]),
                                   rtol=1e-5, atol=1e-6)
    for i in range(3):
        for k in ("rgb_volume", "mask_volume"):
            np.testing.assert_allclose(
                np.asarray(r_free["per_src"][i][k]),
                np.asarray(r_oracle["per_src"][i][k]),
                rtol=1e-5, atol=1e-6)

    # gradient parity w.r.t. every source's alpha
    def loss(alphas, sort_free):
        bs = [{**b, "alpha": a} for b, a in zip(bufs, alphas)]
        r = merge_and_integrate(bs, sort_free=sort_free)
        return jnp.sum(r["rgb_volume"]) + jnp.sum(r["depth_volume"])

    a0 = [b["alpha"] for b in bufs]
    g_free = jax.grad(lambda a: loss(a, True))(a0)
    g_oracle = jax.grad(lambda a: loss(a, False))(a0)
    for gf, go in zip(g_free, g_oracle):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(go),
                                   rtol=1e-4, atol=1e-5)
