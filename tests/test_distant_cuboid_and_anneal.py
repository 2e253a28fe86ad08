"""r3 street-collapse regression: fixed_cuboid_shells distant contraction +
inv_s anneal start_it (reference var_ctrl ctrl_start / distant_mode
fixed_cuboid_shells — streetsurf config :19-23,67-68)."""
import jax
import jax.numpy as jnp
import numpy as np

from neuralsim_tpu.fields.nerf import NeRFDistantField
from neuralsim_tpu.fields.neus import NeuSField
from neuralsim_tpu.fields.spatial import (AABBSpace,
                                          contract_inverted_cuboid)


def test_cuboid_contraction_aliases_interior():
    center = jnp.asarray([10.0, 0.0, 3.0])
    half = jnp.asarray([20.0, 10.0, 4.0])
    # every point strictly inside the cuboid maps to the SAME shell point as
    # its ray-from-center projection onto the rho=1 shell -> the field cannot
    # distinguish interior positions along a center ray
    inside = center + half * jnp.asarray([0.25, 0.1, -0.3])
    deeper = center + half * jnp.asarray([0.5, 0.2, -0.6])
    c1 = contract_inverted_cuboid(inside, center, half)
    c2 = contract_inverted_cuboid(deeper, center, half)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-6)
    assert float(c1[..., 3]) == 1.0  # clipped to the shell
    # outside: distinct shells, 1/rho < 1, decreasing with distance
    out1 = center + half * jnp.asarray([2.0, 0.0, 0.0])
    out2 = center + half * jnp.asarray([4.0, 0.0, 0.0])
    o1 = contract_inverted_cuboid(out1, center, half)
    o2 = contract_inverted_cuboid(out2, center, half)
    assert float(o1[..., 3]) > float(o2[..., 3])
    assert abs(float(o1[..., 3]) - 0.5) < 1e-6


def test_distant_field_interior_invariance():
    f = NeRFDistantField(geometry="mlp", geo_feat_dim=4,
                         cr_aabb=([-6.0, -10.0, -0.6], [34.0, 10.0, 7.0]))
    p = f.init(jax.random.PRNGKey(0))
    a = jnp.asarray([[5.0, 0.0, 1.0]])      # inside the cr cuboid
    b = jnp.asarray([[20.0, 3.5, 2.4]])     # also inside, same center ray
    # both alias to shell points; density at interior points equals the
    # density of their shell projections (cannot represent a crisp road)
    sa, _ = f.query_density_feat(p, a)
    c = jnp.asarray([14.0, 0.0, 3.2])       # center
    h = jnp.asarray([20.0, 10.0, 3.8])
    proj = c + (a[0] - c) / jnp.max(jnp.abs((a[0] - c) / h))
    sp, _ = f.query_density_feat(p, proj[None])
    np.testing.assert_allclose(np.asarray(sa), np.asarray(sp), rtol=1e-5)
    del b


def test_distant_auto_wiring_from_cr_space():
    f = NeRFDistantField(geometry="mlp", geo_feat_dim=4)
    assert f.cub_center is None
    f.set_cr_aabb(AABBSpace((-1, -1, -1), (3, 1, 1)))
    np.testing.assert_allclose(np.asarray(f.cub_center), [1.0, 0.0, 0.0])
    np.testing.assert_allclose(np.asarray(f.cub_half), [2.0, 1.0, 1.0])


def test_inv_s_anneal_start_it():
    space = AABBSpace((-1, -1, -1), (1, 1, 1))
    f = NeuSField(space, geometry="mlp_pe", geo_feat_dim=4,
                  ln_inv_s_init=float(np.log(10.0)),
                  inv_s_final=800.0, inv_s_anneal_start_it=600,
                  inv_s_anneal_stop_it=3000)
    p = {"ln_inv_s": jnp.asarray(np.log(10.0), jnp.float32)}
    # before start_it: purely the learned value
    np.testing.assert_allclose(float(f.forward_inv_s(p, it=0)), 10.0,
                               rtol=1e-5)
    np.testing.assert_allclose(float(f.forward_inv_s(p, it=599)), 10.0,
                               rtol=1e-5)
    # midway through [start, stop]: linear mix
    mid = float(f.forward_inv_s(p, it=1800))
    np.testing.assert_allclose(mid, 0.5 * 10.0 + 0.5 * 800.0, rtol=1e-5)
    # at/after stop: the final value
    np.testing.assert_allclose(float(f.forward_inv_s(p, it=3000)), 800.0,
                               rtol=1e-5)
