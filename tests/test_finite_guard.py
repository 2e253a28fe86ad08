"""Finite-step guard: a poisoned batch must not poison the params.

The reference gets skip-on-nonfinite-step semantics from its AMP GradScaler
(``scaler.step`` skips when unscaled grads contain inf/NaN,
code_single/tools/train.py:1409-1412,1492-1502). The TPU trainers train in
bf16/fp32 without a scaler, so ``apply_finite_guard`` re-creates those
semantics in-graph (VERDICT r4 item 1b: the round-4 flagship diverged to
loss=NaN at it~2400 and stayed NaN for 3600 iterations because one bad batch
permanently NaN'd every parameter).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralsim_tpu.dataio.synthetic import SyntheticObjectDataset
from neuralsim_tpu.fields import AABBSpace, NeuSField, SimpleSky
from neuralsim_tpu.renderers import SingleVolumeRenderer
from neuralsim_tpu.training import Trainer


@pytest.fixture(scope="module")
def setup():
    ds = SyntheticObjectDataset(n_frames=2, H=24, W=24)
    space = AABBSpace((-1, -1, -1), (1, 1, 1))
    field = NeuSField(space, geometry="lotd",
                      encoding_cfg={"n_levels": 4, "base_res": 8, "max_res": 32,
                                    "log2_hashmap_size": 10, "n_feats": 2},
                      geo_feat_dim=8, decoder_hidden=16, radiance_hidden=16)
    renderer = SingleVolumeRenderer(
        {"cr": field, "sky": SimpleSky(hidden=8)},
        query_cfg={"num_coarse": 16, "num_fine": (4,),
                   "upsample_inv_s": 32.0, "upsample_inv_s_factors": (1.0,)})
    trainer = Trainer(
        renderer,
        loss_cfgs={"rgb": {"fn_type": "l1", "w": 1.0},
                   "eikonal": {"w": 0.01}},
        uniform_sample_n=64)
    return ds, trainer


def _batch(ds, seed=0, n=128):
    b = ds.sample_pixels(np.random.default_rng(seed), n)
    return {k: jnp.asarray(v) for k, v in b.items()
            if k in ("rays_o", "rays_d", "image_rgb", "image_occupancy_mask")}


def test_poisoned_batch_skips_step_and_params_stay_finite(setup):
    ds, trainer = setup
    state = trainer.init_state(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)

    # one clean step first (also primes the jit cache)
    key, sk = jax.random.split(key)
    state, m = trainer.train_step(state, _batch(ds, 0), sk, "pixel")
    assert int(m["step_skipped"]) == 0
    assert int(m["skips_total"]) == 0
    params_before = jax.device_get(state.params)

    # poisoned batch: NaN ground-truth rgb -> NaN loss + NaN grads
    bad = _batch(ds, 1)
    bad["image_rgb"] = bad["image_rgb"].at[3].set(jnp.nan)
    key, sk = jax.random.split(key)
    state, m = trainer.train_step(state, bad, sk, "pixel")
    assert int(m["step_skipped"]) == 1
    assert int(m["skips_total"]) == 1
    # loss metric reports the poison, but params are untouched
    assert not np.isfinite(float(m["loss_total"]))
    after = jax.device_get(state.params)
    for a, b in zip(jax.tree.leaves(params_before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, b)

    # and training continues cleanly afterwards
    key, sk = jax.random.split(key)
    state, m = trainer.train_step(state, _batch(ds, 2), sk, "pixel")
    assert int(m["step_skipped"]) == 0
    assert int(m["skips_total"]) == 1
    assert np.isfinite(float(m["loss_total"]))
    assert all(np.all(np.isfinite(l)) for l in
               jax.tree.leaves(jax.device_get(state.params)))


def test_inf_grads_also_skipped(setup):
    ds, trainer = setup
    state = trainer.init_state(jax.random.PRNGKey(0))
    bad = _batch(ds, 3)
    bad["image_rgb"] = bad["image_rgb"].at[:].set(jnp.inf)
    state, m = trainer.train_step(state, bad, jax.random.PRNGKey(2), "pixel")
    assert int(m["step_skipped"]) == 1
    assert all(np.all(np.isfinite(l)) for l in
               jax.tree.leaves(jax.device_get(state.params)))
