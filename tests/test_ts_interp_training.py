"""Timestamp-mode training (reference ``use_ts_interp``, scenes.py:53-83)
plus LearnableParams intrinsics / sensor-timestamp refinement (reference
learnable_params.py:41-43,148-160): the trainer slices the graph with
``Scene.interp_at`` at the sensor's refined timestamps, and dintr/dts deltas
receive gradients through the in-jit ray lifting."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralsim_tpu.dataio.synthetic import SyntheticObjectDataset
from neuralsim_tpu.fields import AABBSpace, NeuSField
from neuralsim_tpu.models.assets import LearnableParams
from neuralsim_tpu.renderers import SingleVolumeRenderer
from neuralsim_tpu.scene import Scene
from neuralsim_tpu.training.trainer import Trainer


@pytest.fixture(scope="module")
def setup():
    ds = SyntheticObjectDataset(n_frames=4, H=32, W=32)
    scene = Scene.load_from_scenario(ds.get_scenario())
    field = NeuSField(AABBSpace((-1, -1, -1), (1, 1, 1)), geometry="lotd",
                      encoding_cfg={"n_levels": 3, "base_res": 8,
                                    "max_res": 32, "log2_hashmap_size": 10},
                      geo_feat_dim=4, radiance_hidden=16)
    renderer = SingleVolumeRenderer(
        {"cr": field}, query_cfg={"num_coarse": 16, "num_fine": (),
                                  "upsample_inv_s_factors": ()})
    return ds, scene, field, renderer


def _batch(ds, rng, n=96):
    fidx = rng.integers(0, 4, n).astype(np.int32)
    xs = rng.integers(0, 32, n)
    ys = rng.integers(0, 32, n)
    rgb = np.stack([ds.render_frame(int(f))["image_rgb"][y, x]
                    for f, y, x in zip(fidx, ys, xs)])
    return {"rays_xy": jnp.asarray(np.stack([xs + 0.5, ys + 0.5], -1),
                                   jnp.float32),
            "rays_fidx": jnp.asarray(fidx),
            "image_rgb": jnp.asarray(rgb, jnp.float32)}


def test_interp_matches_slice_at_keyframes(setup):
    """With unrefined integer timestamps, interp_at must reproduce slice_at
    (the keyframes ARE the samples)."""
    ds, scene, field, renderer = setup
    fr_s = scene.slice_at(jnp.asarray([0, 2, 3]))
    fr_i = scene.interp_at(jnp.asarray([0.0, 2.0, 3.0]))
    for ns, ni in zip(fr_s.node_data, fr_i.node_data):
        np.testing.assert_allclose(np.asarray(ns["transform"]),
                                   np.asarray(ni["transform"]), atol=1e-5)


def test_ts_and_intr_refinement_gradients(setup):
    """dts and dintr deltas move under training in timestamp mode."""
    ds, scene, field, renderer = setup
    lp = LearnableParams({"refine_nodes": ["camera_0"],
                          "refine_intr": ["camera_0"],
                          "refine_ts": ["camera_0"]})
    lp.populate(scene)
    trainer = Trainer(renderer, loss_cfgs={"rgb": {"w": 10.0}},
                      training_cfgs={"pose": {"lr": 1e-3}},
                      uniform_sample_n=0, scene=scene, pose_model_id="pose",
                      use_ts_interp=True)
    params = {"cr": field.init(jax.random.PRNGKey(0)),
              "pose": lp.init(jax.random.PRNGKey(1))}
    assert params["pose"]["camera_0"]["dts"].shape == (4,)
    assert params["pose"]["camera_0"]["dintr"].shape == (4, 4)
    state = trainer.init_state(jax.random.PRNGKey(2), params=params)

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(3)
    for _ in range(4):
        key, sk = jax.random.split(key)
        state, m = trainer.train_step(state, _batch(ds, rng), sk, "pixel",
                                      "camera_0")
    assert np.isfinite(float(m["loss_total"]))
    moved = state.params["pose"]["camera_0"]
    assert np.abs(np.asarray(moved["dts"])).max() > 0, \
        "sensor-ts deltas did not receive gradients"
    assert np.abs(np.asarray(moved["dintr"])).max() > 0, \
        "intrinsics deltas did not receive gradients"
    assert np.abs(np.asarray(moved["dtrans"])).max() > 0


def test_holistic_ts_offset_shape(setup):
    ds, scene, field, renderer = setup
    lp = LearnableParams({"refine_nodes": [], "refine_ts": ["camera_0"],
                          "ts_holistic_offset": True})
    lp.populate(scene)
    p = lp.init(jax.random.PRNGKey(0))
    assert p["camera_0"]["dts"].shape == (1,)
    # sensor_ts applies the single offset to every frame
    ts = scene.sensor_ts("camera_0", jnp.asarray([0, 1, 3]),
                         dts=p["camera_0"]["dts"] + 0.25)
    np.testing.assert_allclose(np.asarray(ts), [0.25, 1.25, 3.25], atol=1e-6)


def test_intr_refinement_without_ts_mode(setup):
    """dintr also works in plain frame-index mode (slice_at path)."""
    ds, scene, field, renderer = setup
    lp = LearnableParams({"refine_nodes": [], "refine_intr": ["camera_0"]})
    lp.populate(scene)
    trainer = Trainer(renderer, loss_cfgs={"rgb": {"w": 10.0}},
                      training_cfgs={"pose": {"lr": 1e-3}},
                      uniform_sample_n=0, scene=scene, pose_model_id="pose")
    params = {"cr": field.init(jax.random.PRNGKey(0)),
              "pose": lp.init(jax.random.PRNGKey(1))}
    state = trainer.init_state(jax.random.PRNGKey(2), params=params)
    rng = np.random.default_rng(1)
    key = jax.random.PRNGKey(4)
    for _ in range(3):
        key, sk = jax.random.split(key)
        state, m = trainer.train_step(state, _batch(ds, rng), sk, "pixel",
                                      "camera_0")
    assert np.abs(np.asarray(
        state.params["pose"]["camera_0"]["dintr"])).max() > 0
