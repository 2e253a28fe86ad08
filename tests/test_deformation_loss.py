"""DeformationLoss for dynamic categorical fields (reference
app/loss/conditional.py:20 — declared stub there; realized in
neuralsim_tpu/losses/conditional.py as an SDF time-rate penalty)."""
import jax
import jax.numpy as jnp
import pytest

from neuralsim_tpu.fields.conditional import ConditionalPermutoNeuSField
from neuralsim_tpu.losses import deformation_loss


@pytest.fixture(scope="module")
def dyn_field():
    field = ConditionalPermutoNeuSField(
        n_instances=2, z_dim=2, use_time=True,
        permuto_cfg={"n_levels": 3, "base_res": 4, "max_res": 32,
                     "log2_hashmap_size": 11},
        geo_feat_dim=8, radiance_hidden=16)
    params = field.init(jax.random.PRNGKey(0))
    return field, params


def test_deformation_nonneg_and_grad(dyn_field):
    field, params = dyn_field
    key = jax.random.PRNGKey(1)
    x = field.space.uniform_points(key, 64)
    t01 = jax.random.uniform(jax.random.fold_in(key, 1), (64, 1))
    bidx = jnp.zeros((64,), jnp.int32)
    cfg = {"w": 1.0, "dt": 0.05}

    val = deformation_loss(field, params, x, t01, 0, cfg, bidx=bidx)
    assert jnp.isfinite(val) and float(val) >= 0.0

    g = jax.grad(lambda p: deformation_loss(field, p, x, t01, 0, cfg,
                                            bidx=bidx))(params)
    gn = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
    assert gn > 0.0


def test_deformation_zero_for_static_field():
    """A field WITHOUT time conditioning has zero SDF time-rate."""
    field = ConditionalPermutoNeuSField(
        n_instances=2, z_dim=2, use_time=False,
        permuto_cfg={"n_levels": 3, "base_res": 4, "max_res": 32,
                     "log2_hashmap_size": 11},
        geo_feat_dim=8, radiance_hidden=16)
    params = field.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(2)
    x = field.space.uniform_points(key, 32)
    t01 = jax.random.uniform(jax.random.fold_in(key, 1), (32, 1))
    val = deformation_loss(field, params, x, t01, 0, {"w": 1.0},
                           bidx=jnp.zeros((32,), jnp.int32))
    assert float(val) == pytest.approx(0.0, abs=1e-6)


def test_trainer_assembles_deformation(dyn_field):
    """MultiObjectTrainer surfaces loss_deformation when configured and the
    bank holds a use_time field (reference code_multi/tools/train.py loss
    assembly region :240-252)."""
    from neuralsim_tpu.dataio.synthetic_multi import SyntheticMultiObjectDataset
    from neuralsim_tpu.renderers.buffer_compose import BufferComposeRenderer
    from neuralsim_tpu.scene import AssetBank, Scene
    from neuralsim_tpu.training.multi_trainer import MultiObjectTrainer

    ds = SyntheticMultiObjectDataset(n_frames=4, H=24, W=24)
    scene = Scene.load_from_scenario(ds.get_scenario())
    bank = AssetBank.create({
        "Vehicle": {
            "model_class": "neuralsim_tpu.models.assets."
                           "ADDynamicGenerativePermutoConcatNeuSObj",
            "model_params": {
                "z_dim": 2,
                "permuto_cfg": {"n_levels": 3, "base_res": 4, "max_res": 32,
                                "log2_hashmap_size": 11},
                "geo_feat_dim": 8, "radiance_hidden": 16, "inv_s_init": 40.0,
                "query_cfg": {"num_coarse": 8, "num_fine": (4,),
                              "upsample_inv_s_factors": (1.0,)}},
            "asset_params": {"training_cfg": {"lr": 8e-3}}},
        "Sky": {"model_class": "neuralsim_tpu.models.assets.SimpleSkyAsset",
                "model_params": {"hidden": 8},
                "asset_params": {"training_cfg": {"lr": 3e-3}}},
    }, [scene])
    renderer = BufferComposeRenderer.from_asset_bank(scene, bank)
    trainer = MultiObjectTrainer(
        scene, renderer,
        loss_cfgs={"rgb": {"fn_type": "l2", "w": 10.0},
                   "deformation": {"w": 0.1, "dt": 0.05}},
        training_cfgs=bank.training_cfgs(), uniform_sample_n=32)
    state = trainer.init_state(jax.random.PRNGKey(0), bank.init_params(
        jax.random.PRNGKey(1)))
    n = 64
    key = jax.random.PRNGKey(3)
    batch = {
        "rays_o": jax.random.uniform(key, (n, 3), minval=-1.0, maxval=1.0),
        "rays_d": jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (n, 1)),
        "rays_fidx": jnp.zeros((n,), jnp.int32),
        "image_rgb": jnp.full((n, 3), 0.5),
    }
    _, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(4))
    assert "loss_deformation" in metrics
    assert jnp.isfinite(metrics["loss_deformation"])
