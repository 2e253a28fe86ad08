"""End-to-end training smoke test: fit a tiny NeuS to the synthetic object.

This is the CPU-runnable miniature of BASELINE.md target config #1
("neus_in_10_minutes" on an object scene — SURVEY.md §7 build step 4).
Asserts the optimizer actually reduces photometric loss and that a short
run reaches a sane PSNR on seen rays.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralsim_tpu.dataio.synthetic import SyntheticObjectDataset
from neuralsim_tpu.fields import AABBSpace, NeuSField, SimpleSky
from neuralsim_tpu.renderers import SingleVolumeRenderer
from neuralsim_tpu.training import Trainer, psnr


@pytest.fixture(scope="module")
def setup():
    ds = SyntheticObjectDataset(n_frames=6, H=48, W=48)
    space = AABBSpace((-1, -1, -1), (1, 1, 1))
    field = NeuSField(space, geometry="lotd",
                      encoding_cfg={"n_levels": 6, "base_res": 8, "max_res": 128,
                                    "log2_hashmap_size": 13, "n_feats": 2},
                      geo_feat_dim=8, decoder_hidden=32,
                      radiance_hidden=32, ln_inv_s_init=float(np.log(30.0)),
                      cos_anneal_stop_it=100)
    renderer = SingleVolumeRenderer(
        {"cr": field, "sky": SimpleSky(hidden=16)},
        query_cfg={"num_coarse": 32, "num_fine": (8, 8),
                   "upsample_inv_s": 32.0, "upsample_inv_s_factors": (1.0, 4.0)})
    trainer = Trainer(
        renderer,
        loss_cfgs={
            "rgb": {"fn_type": "huber", "fn_param": {"delta": 0.1}, "w": 10.0},
            "occupancy_mask": {"w": 0.3},
            "eikonal": {"w": 0.01, "on_render_ratio": 0.3},
            "sparsity": {"w": 0.002},
        },
        training_cfgs={
            "cr": {"lr": 1e-2, "eps": 1e-15, "betas": (0.9, 0.99),
                   "type": "exponential", "total_steps": 400,
                   "decay_target_factor": 0.2},
            "sky": {"lr": 3e-3},
        },
        uniform_sample_n=256)
    return ds, trainer


def _batch(ds, rng, n=512):
    b = ds.sample_pixels(rng, n)
    return {k: jnp.asarray(v) for k, v in b.items()
            if k in ("rays_o", "rays_d", "image_rgb", "image_occupancy_mask")}


def test_train_loss_decreases_and_psnr(setup):
    ds, trainer = setup
    rng = np.random.default_rng(0)
    state = trainer.init_state(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)

    first_losses, last_losses = None, None
    for i in range(120):
        key, sk = jax.random.split(key)
        state, metrics = trainer.train_step(state, _batch(ds, rng), sk, "pixel")
        if i == 0:
            first_losses = jax.device_get(metrics)
        last_losses = metrics
    last_losses = jax.device_get(last_losses)

    assert np.isfinite(last_losses["loss_total"])
    assert last_losses["loss_rgb"] < first_losses["loss_rgb"] * 0.8

    # PSNR on a held-in ray batch (deterministic render)
    b = _batch(ds, np.random.default_rng(123), 2048)
    rendered = trainer.renderer.ray_query(
        state.params, b["rays_o"], b["rays_d"], key=None,
        query_overrides={"perturb": False})
    p = float(psnr(rendered["rgb_volume"], b["image_rgb"]))
    assert p > 14.0, f"PSNR too low after short fit: {p}"


def test_train_step_params_all_finite(setup):
    ds, trainer = setup
    rng = np.random.default_rng(5)
    state = trainer.init_state(jax.random.PRNGKey(2))
    for _ in range(3):
        state, _ = trainer.train_step(state, _batch(ds, rng, 128),
                                      jax.random.PRNGKey(3), "pixel")
    assert jax.tree.all(jax.tree.map(
        lambda a: jnp.all(jnp.isfinite(a)), state.params))
