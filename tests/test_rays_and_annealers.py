import jax.numpy as jnp
import numpy as np

from neuralsim_tpu.ops import ray_aabb_intersect, ray_sphere_intersect
from neuralsim_tpu.training import get_anneal_val


def test_ray_aabb_axis_hits():
    o = jnp.array([[-2.0, 0.0, 0.0], [0.0, 0.0, 0.0], [-2.0, 5.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    near, far, hit = ray_aabb_intersect(o, d, jnp.array([-1.0, -1, -1]), jnp.array([1.0, 1, 1]))
    assert np.asarray(hit).tolist() == [True, True, False]
    np.testing.assert_allclose(np.asarray(near[:2]), [1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(far[:2]), [3.0, 1.0], atol=1e-6)


def test_ray_aabb_diagonal_and_degenerate_dir():
    o = jnp.array([[-2.0, -2.0, -2.0]])
    d = jnp.array([[1.0, 1.0, 1.0]]) / np.sqrt(3)
    near, far, hit = ray_aabb_intersect(o, d, -1.0 * jnp.ones(3), jnp.ones(3))
    assert bool(hit[0])
    np.testing.assert_allclose(np.asarray(far - near)[0], 2 * np.sqrt(3), rtol=1e-5)
    # zero component direction (parallel to a slab) inside the slab
    o2 = jnp.array([[0.0, 0.0, -5.0]])
    d2 = jnp.array([[0.0, 0.0, 1.0]])
    _, _, hit2 = ray_aabb_intersect(o2, d2, -1.0 * jnp.ones(3), jnp.ones(3))
    assert bool(hit2[0])


def test_ray_sphere():
    o = jnp.array([[0.0, 0.0, -3.0], [0.0, 2.0, -3.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    near, far, hit = ray_sphere_intersect(o, d, radius=1.0)
    assert np.asarray(hit).tolist() == [True, False]
    np.testing.assert_allclose(np.asarray(near[0]), 2.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(far[0]), 4.0, atol=1e-5)
    # origin inside sphere: near clamps to 0
    o2 = jnp.array([[0.0, 0.0, 0.0]])
    near2, far2, hit2 = ray_sphere_intersect(o2, d[:1], radius=1.0)
    assert bool(hit2[0]) and float(near2[0]) == 0.0
    np.testing.assert_allclose(np.asarray(far2[0]), 1.0, atol=1e-5)


def test_annealers():
    np.testing.assert_allclose(float(get_anneal_val(5, type="constant", val=2.0)), 2.0)
    np.testing.assert_allclose(
        float(get_anneal_val(50, type="linear", start_it=0, stop_it=100, start_val=0.0, stop_val=1.0)),
        0.5,
    )
    # clamping
    np.testing.assert_allclose(
        float(get_anneal_val(200, type="linear", start_it=0, stop_it=100, start_val=0.0, stop_val=1.0)),
        1.0,
    )
    np.testing.assert_allclose(
        float(get_anneal_val(7, type="milestones", milestones=[5, 10], vals=[1.0, 2.0, 3.0])),
        2.0,
    )
    np.testing.assert_allclose(
        float(get_anneal_val(0, type="milestones", milestones=[5, 10], vals=[1.0, 2.0, 3.0])),
        1.0,
    )
    v = float(get_anneal_val(50, type="exponential", start_it=0, stop_it=100, start_val=0.01, stop_val=1.0))
    np.testing.assert_allclose(v, 0.1, rtol=1e-4)
