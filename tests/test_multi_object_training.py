"""End-to-end multi-object training: dynamic synthetic scene through the
scene graph + compose renderer + MultiObjectTrainer (code_multi milestone)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralsim_tpu.dataio.synthetic_multi import SyntheticMultiObjectDataset
from neuralsim_tpu.renderers.buffer_compose import BufferComposeRenderer
from neuralsim_tpu.scene import AssetBank, Scene
from neuralsim_tpu.training.multi_trainer import MultiObjectTrainer


@pytest.fixture(scope="module")
def setup():
    ds = SyntheticMultiObjectDataset(n_frames=4, H=48, W=48)
    scene = Scene.load_from_scenario(ds.get_scenario())
    bank = AssetBank.create({
        "Vehicle": {
            "model_class": "neuralsim_tpu.models.assets.ADGenerativePermutoConcatNeuSObj",
            "model_params": {
                "z_dim": 2,
                "permuto_cfg": {"n_levels": 4, "base_res": 4, "max_res": 64,
                                "log2_hashmap_size": 12},
                "geo_feat_dim": 8, "radiance_hidden": 16, "inv_s_init": 40.0,
                "query_cfg": {"num_coarse": 24, "num_fine": (8,),
                              "upsample_inv_s_factors": (1.0,)}},
            "asset_params": {"training_cfg": {"lr": 8e-3}}},
        "Street": {
            "model_class": "neuralsim_tpu.models.assets.LoTDNeuSStreet",
            "model_params": {
                "aabb": [[-4, -4, -1.2], [4, 4, 1.5]],
                "encoding_cfg": {"n_levels": 4, "base_res": 8, "max_res": 64,
                                 "log2_hashmap_size": 12},
                "geo_feat_dim": 8, "radiance_hidden": 16, "inv_s_init": 20.0,
                "accel_cfg": None, "pretrain": None,
                "query_cfg": {"num_coarse": 32, "num_fine": (8,),
                              "upsample_inv_s_factors": (1.0,)}},
            "asset_params": {"training_cfg": {"lr": 8e-3}}},
        "Sky": {"model_class": "neuralsim_tpu.models.assets.SimpleSkyAsset",
                "model_params": {"hidden": 16},
                "asset_params": {"training_cfg": {"lr": 3e-3}}},
    }, [scene])
    renderer = BufferComposeRenderer.from_asset_bank(scene, bank)
    trainer = MultiObjectTrainer(
        scene, renderer,
        loss_cfgs={"rgb": {"fn_type": "huber", "fn_param": {"delta": 0.1},
                           "w": 10.0},
                   "occupancy_mask": {"w": 0.3},
                   "eikonal": {"w": 0.01},
                   "latent": {"w": 1e-3}},
        training_cfgs=bank.training_cfgs(), uniform_sample_n=128)
    return ds, scene, bank, renderer, trainer


def test_bank_structure(setup):
    ds, scene, bank, renderer, trainer = setup
    # one shared Vehicle model for both instances, one street, one sky
    assert "Vehicle#synthetic_multi" in bank.assets
    assert bank.model_for("synthetic_multi", "obj_a") == "Vehicle#synthetic_multi"
    assert bank.model_for("synthetic_multi", "obj_b") == "Vehicle#synthetic_multi"
    v = bank.assets["Vehicle#synthetic_multi"]
    assert v.instance_index == {"obj_a": 0, "obj_b": 1}
    # street binds as the scene-level cr model, not a per-object binding
    assert len(renderer.objects) == 2
    names = {ob.obj_id for ob in renderer.objects}
    assert names == {"obj_a", "obj_b"}
    assert renderer.scene_models["cr"][1] == "Street#synthetic_multi"


def test_multi_training_loss_decreases(setup):
    ds, scene, bank, renderer, trainer = setup
    params = bank.init_params(jax.random.PRNGKey(0))
    # snapshot before training: train_step donates its input state buffers
    z0 = np.array(params["Vehicle#synthetic_multi"]["latents"])
    state = trainer.init_state(jax.random.PRNGKey(1), params=params)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(2)
    first = last = None
    for i in range(25):
        b = ds.sample_pixels(rng, 256)
        batch = {k: jnp.asarray(v) for k, v in b.items()}
        key, sk = jax.random.split(key)
        state, m = trainer.train_step(state, batch, sk)
        if i == 0:
            first = jax.device_get(m)
        last = m
    last = jax.device_get(last)
    assert np.isfinite(last["loss_total"])
    assert last["loss_rgb"] < first["loss_rgb"]
    # latents received gradient updates
    z = np.asarray(state.params["Vehicle#synthetic_multi"]["latents"])
    assert np.abs(z - z0).max() > 0


def test_multi_lidar_and_patch_steps(setup):
    """r2 parity: lidar + image_patch step types through the compose
    renderer (reference code_multi/tools/train.py:240-252)."""
    ds, scene, bank, renderer, trainer = setup
    trainer2 = MultiObjectTrainer(
        scene, renderer,
        loss_cfgs={"rgb": {"fn_type": "huber", "w": 10.0},
                   "lidar": {"w": 1.0, "depth": {"w": 1.0},
                             "line_of_sight": {"w": 0.1}},
                   "s3im": {"w": 0.1, "patch_height": 4},
                   "mono_depth": {"w": 0.1}},
        training_cfgs=bank.training_cfgs(), uniform_sample_n=64)
    params = bank.init_params(jax.random.PRNGKey(0))
    state = trainer2.init_state(jax.random.PRNGKey(1), params=params)
    rng = np.random.default_rng(1)
    key = jax.random.PRNGKey(3)

    # lidar step: reuse pixel rays with synthetic ranges
    b = ds.sample_pixels(rng, 128)
    lbatch = {"rays_o": jnp.asarray(b["rays_o"]),
              "rays_d": jnp.asarray(b["rays_d"]),
              "rays_fidx": jnp.asarray(b["rays_fidx"]),
              "ranges": jnp.full((128,), 3.0)}
    key, sk = jax.random.split(key)
    state, ml = trainer2.train_step(state, lbatch, sk, "lidar")
    assert np.isfinite(float(ml["loss_total"]))
    assert "loss_lidar" in ml

    # image_patch step: [ph, pw] structured batch with a mono-depth cue
    ph = pw = 8
    b = ds.sample_pixels(rng, ph * pw)
    pbatch = {"rays_o": jnp.asarray(b["rays_o"]).reshape(ph, pw, 3),
              "rays_d": jnp.asarray(b["rays_d"]).reshape(ph, pw, 3),
              "rays_fidx": jnp.asarray(b["rays_fidx"]).reshape(ph, pw),
              "image_rgb": jnp.asarray(b["image_rgb"]).reshape(ph, pw, 3),
              "image_mono_depth": jnp.full((ph, pw), 3.0)}
    key, sk = jax.random.split(key)
    state, mp = trainer2.train_step(state, pbatch, sk, "image_patch")
    assert np.isfinite(float(mp["loss_total"]))
    assert "loss_s3im" in mp and "loss_mono_depth" in mp


def test_compaction_budget_limits_eval_cost(setup):
    """The hit-budget compaction evaluates each object on B < N rays while
    preserving the rendered output on hit rays (reference
    batched_query_shared semantics)."""
    ds, scene, bank, renderer, trainer = setup
    params = bank.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    b = ds.sample_pixels(rng, 256)
    frozen = scene.slice_at(jnp.asarray(b["rays_fidx"]))
    ro, rd = jnp.asarray(b["rays_o"]), jnp.asarray(b["rays_d"])

    r_full = BufferComposeRenderer(
        scene, renderer.objects, renderer.scene_models,
        hit_budget_frac=None).ray_query(params, frozen, ro, rd, key=None)
    r_half = BufferComposeRenderer(
        scene, renderer.objects, renderer.scene_models,
        hit_budget_frac=0.5).ray_query(params, frozen, ro, rd, key=None)
    # objects cover well under half the image in this scene -> identical
    np.testing.assert_allclose(np.asarray(r_half["rgb_volume"]),
                               np.asarray(r_full["rgb_volume"]),
                               rtol=1e-4, atol=1e-4)


def test_group_budget_pair_mode_parity(setup):
    """group_budget_frac: ONE (instance, ray)-pair budget for the whole
    shared-model group. With an ample budget it must reproduce the exact
    (uncompacted) render; training through it stays finite."""
    ds, scene, bank, renderer, trainer = setup
    params = bank.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    b = ds.sample_pixels(rng, 256)
    frozen = scene.slice_at(jnp.asarray(b["rays_fidx"]))
    ro, rd = jnp.asarray(b["rays_o"]), jnp.asarray(b["rays_d"])

    r_full = BufferComposeRenderer(
        scene, renderer.objects, renderer.scene_models,
        hit_budget_frac=None).ray_query(params, frozen, ro, rd, key=None)
    r_pair = BufferComposeRenderer(
        scene, renderer.objects, renderer.scene_models,
        group_budget_frac=1.0).ray_query(params, frozen, ro, rd, key=None)
    np.testing.assert_allclose(np.asarray(r_pair["rgb_volume"]),
                               np.asarray(r_full["rgb_volume"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(r_pair["depth_volume"]),
                               np.asarray(r_full["depth_volume"]),
                               rtol=1e-4, atol=1e-4)

    # training path (with_per_obj=False): the group folds into M slot lanes;
    # must still reproduce the exact render when M covers the overlaps
    r_slot = BufferComposeRenderer(
        scene, renderer.objects, renderer.scene_models,
        group_budget_frac=1.0).ray_query(params, frozen, ro, rd, key=None,
                                         with_per_obj=False)
    np.testing.assert_allclose(np.asarray(r_slot["rgb_volume"]),
                               np.asarray(r_full["rgb_volume"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(r_slot["depth_volume"]),
                               np.asarray(r_full["depth_volume"]),
                               rtol=1e-4, atol=1e-4)

    # one train step through the pair-mode renderer
    r2 = BufferComposeRenderer(scene, renderer.objects,
                               renderer.scene_models, group_budget_frac=0.5)
    tr = MultiObjectTrainer(
        scene, r2, loss_cfgs={"rgb": {"fn_type": "huber", "w": 10.0},
                              "eikonal": {"w": 0.01}},
        training_cfgs=bank.training_cfgs(), uniform_sample_n=64)
    state = tr.init_state(jax.random.PRNGKey(1),
                          params=bank.init_params(jax.random.PRNGKey(0)))
    batch = {k: jnp.asarray(v) for k, v in ds.sample_pixels(rng, 256).items()}
    state, m = tr.train_step(state, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(m["loss_total"]))


def test_gather_free_categorical_model(setup):
    """ADGenerativeLoTDConcatNeuSObj: the gather-free (all-CP LoTD +
    decoder-side latent concat) categorical model trains end-to-end through
    the compose renderer; latents and CP tables both receive gradients, and
    two instances diverge (per-instance identity lives in z)."""
    ds, scene, bank0, renderer0, trainer0 = setup
    bank = AssetBank.create({
        "Vehicle": {
            "model_class": "neuralsim_tpu.models.assets."
                           "ADGenerativeLoTDConcatNeuSObj",
            "model_params": {
                "z_dim": 4,
                "encoding_cfg": {"n_levels": 4, "base_res": 8, "max_res": 64,
                                 "n_feats": 2, "cp_max_res": 64},
                "geo_feat_dim": 8, "radiance_hidden": 16, "inv_s_init": 40.0,
                "query_cfg": {"num_coarse": 24, "num_fine": (8,),
                              "upsample_inv_s_factors": (1.0,)}},
            "asset_params": {"training_cfg": {"lr": 8e-3}}},
        "Street": {
            "model_class": "neuralsim_tpu.models.assets.LoTDNeuSStreet",
            "model_params": {
                "aabb": [[-4, -4, -1.2], [4, 4, 1.5]],
                "encoding_cfg": {"n_levels": 4, "base_res": 8, "max_res": 64,
                                 "log2_hashmap_size": 12},
                "geo_feat_dim": 8, "radiance_hidden": 16, "inv_s_init": 20.0,
                "accel_cfg": None, "pretrain": None,
                "query_cfg": {"num_coarse": 32, "num_fine": (8,),
                              "upsample_inv_s_factors": (1.0,)}},
            "asset_params": {"training_cfg": {"lr": 8e-3}}},
        "Sky": {"model_class": "neuralsim_tpu.models.assets.SimpleSkyAsset",
                "model_params": {"hidden": 16},
                "asset_params": {"training_cfg": {"lr": 3e-3}}},
    }, [scene])
    vid = "Vehicle#synthetic_multi"
    assert bank.assets[vid].instance_index == {"obj_a": 0, "obj_b": 1}
    renderer = BufferComposeRenderer.from_asset_bank(
        scene, bank, group_budget_frac=1.0)
    trainer = MultiObjectTrainer(
        scene, renderer,
        loss_cfgs={"rgb": {"fn_type": "huber", "w": 10.0},
                   "eikonal": {"w": 0.01}, "latent": {"w": 1e-3}},
        training_cfgs=bank.training_cfgs(), uniform_sample_n=64)
    params = bank.init_params(jax.random.PRNGKey(0))
    z0 = np.array(params[vid]["latents"])
    t0 = np.array(params[vid]["encoding"]["table"])
    state = trainer.init_state(jax.random.PRNGKey(1), params=params)
    rng = np.random.default_rng(5)
    key = jax.random.PRNGKey(6)
    first = last = None
    for i in range(20):
        batch = {k: jnp.asarray(v)
                 for k, v in ds.sample_pixels(rng, 256).items()}
        key, sk = jax.random.split(key)
        state, m = trainer.train_step(state, batch, sk)
        if i == 0:
            first = jax.device_get(m)
        last = m
    last = jax.device_get(last)
    assert np.isfinite(last["loss_total"])
    assert last["loss_rgb"] < first["loss_rgb"]
    z = np.asarray(state.params[vid]["latents"])
    t = np.asarray(state.params[vid]["encoding"]["table"])
    assert np.abs(z - z0).max() > 0          # latents train
    assert np.abs(t - t0).max() > 0          # shared CP tables train
    assert np.abs(z[0] - z[1]).max() > 0     # instances diverge

    # the two instances render distinguishably (identity through z only)
    field = bank.assets[vid].field
    x = jnp.asarray(np.random.default_rng(7).uniform(-0.4, 0.4, (64, 3)),
                    jnp.float32)
    s_a, _, _ = field.sdf_nablas_feat(state.params[vid], x,
                                      bidx=jnp.zeros((64,), jnp.int32))
    s_b, _, _ = field.sdf_nablas_feat(state.params[vid], x,
                                      bidx=jnp.ones((64,), jnp.int32))
    assert np.abs(np.asarray(s_a) - np.asarray(s_b)).max() > 1e-6
