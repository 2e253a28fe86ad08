"""Sharded-vs-unsharded train-step parity on the 8-device virtual CPU mesh
(VERDICT r2 item 10; SURVEY.md §2.7 TPU plan): the pjit data-parallel step
must compute the SAME loss and parameter update as the single-device step —
sharding is an execution detail, never a math change."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralsim_tpu.dataio.synthetic import SyntheticObjectDataset
from neuralsim_tpu.fields import AABBSpace, NeuSField, SimpleSky
from neuralsim_tpu.parallel.mesh import make_mesh, make_sharded_train_step
from neuralsim_tpu.renderers import SingleVolumeRenderer
from neuralsim_tpu.training.trainer import Trainer


@pytest.fixture(scope="module")
def setup():
    ds = SyntheticObjectDataset(n_frames=2, H=32, W=32)
    field = NeuSField(AABBSpace((-1, -1, -1), (1, 1, 1)), geometry="lotd",
                      encoding_cfg={"n_levels": 3, "base_res": 8,
                                    "max_res": 32, "log2_hashmap_size": 10},
                      geo_feat_dim=4, radiance_hidden=16)
    renderer = SingleVolumeRenderer(
        {"cr": field, "sky": SimpleSky(hidden=8)},
        query_cfg={"num_coarse": 16, "num_fine": (),
                   "upsample_inv_s_factors": ()})
    trainer = Trainer(renderer,
                      loss_cfgs={"rgb": {"w": 10.0}, "eikonal": {"w": 0.01}},
                      training_cfgs={"cr": {"lr": 1e-2}, "sky": {"lr": 1e-3}},
                      uniform_sample_n=64)
    state = trainer.init_state(jax.random.PRNGKey(0))
    b = ds.sample_pixels(np.random.default_rng(0), 128)
    batch = {k: jnp.asarray(v) for k, v in b.items()
             if k in ("rays_o", "rays_d", "image_rgb",
                      "image_occupancy_mask")}
    return trainer, state, batch


def _clone(state):
    # trainer.train_step donates its state buffer; give each call its own
    return jax.tree.map(lambda x: jnp.array(x), state)


def test_sharded_step_matches_unsharded(setup):
    trainer, state, batch = setup
    assert len(jax.devices()) >= 8, "conftest must force 8 virtual devices"
    key = jax.random.PRNGKey(7)

    s1, m1 = trainer.train_step(_clone(state), dict(batch), key, "pixel",
                                None)

    mesh = make_mesh(8)
    step = make_sharded_train_step(trainer, mesh, "pixel",
                                   example_batch=batch)
    s8, m8 = step(_clone(state), dict(batch), key)

    np.testing.assert_allclose(float(m1["loss_total"]),
                               float(m8["loss_total"]), rtol=2e-5)
    # updated params identical up to reduction-order noise
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flat8 = jax.tree_util.tree_leaves(s8.params)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-6)


def test_sharded_step_device_count_invariance(setup):
    """Loss must not depend on HOW MANY devices shard the same global batch
    (catches axis-size-dependent math like per-shard means)."""
    trainer, state, batch = setup
    key = jax.random.PRNGKey(11)
    losses = []
    for n in (2, 8):
        mesh = make_mesh(n)
        step = make_sharded_train_step(trainer, mesh, "pixel",
                                       example_batch=batch)
        _, m = step(_clone(state), dict(batch), key)
        losses.append(float(m["loss_total"]))
    assert losses[0] == pytest.approx(losses[1], rel=2e-5)


def test_sharded_renderer_matches_unsharded(setup):
    """ShardedRenderer (the render_parallel product wiring) returns the same
    frame as the plain chunked render."""
    from neuralsim_tpu.parallel.mesh import ShardedRenderer

    trainer, state, _ = setup
    renderer = trainer.renderer
    ds = SyntheticObjectDataset(n_frames=2, H=16, W=16)
    b = ds.sample_pixels(np.random.default_rng(1), 256)
    ro, rd = jnp.asarray(b["rays_o"]), jnp.asarray(b["rays_d"])

    plain = renderer.render_chunked(state.params, ro, rd, rayschunk=64,
                                    query_overrides={"perturb": False})
    sharded = ShardedRenderer(renderer, make_mesh(8)).render_chunked(
        state.params, ro, rd, rayschunk=64,
        query_overrides={"perturb": False})
    for k in ("rgb_volume", "depth_volume", "mask_volume"):
        np.testing.assert_allclose(np.asarray(plain[k]),
                                   np.asarray(sharded[k]),
                                   rtol=2e-4, atol=2e-5)
