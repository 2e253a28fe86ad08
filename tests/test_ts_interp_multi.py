"""Timestamp-mode training through the MULTI-object trainer (reference
code_multi trainer under use_ts_interp, scenes.py:53-83): object tracks are
interpolated continuously, and the step stays jittable + finite."""
import jax
import jax.numpy as jnp
import numpy as np

from neuralsim_tpu.dataio.synthetic_multi import SyntheticMultiObjectDataset
from neuralsim_tpu.renderers.buffer_compose import BufferComposeRenderer
from neuralsim_tpu.scene import AssetBank, Scene
from neuralsim_tpu.training.multi_trainer import MultiObjectTrainer


def test_multi_trainer_ts_interp_step():
    ds = SyntheticMultiObjectDataset(n_frames=4, H=24, W=24)
    scene = Scene.load_from_scenario(ds.get_scenario())
    bank = AssetBank.create({
        "Vehicle": {
            "model_class": "neuralsim_tpu.models.assets."
                           "ADGenerativePermutoConcatNeuSObj",
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
        scene, renderer, loss_cfgs={"rgb": {"fn_type": "l2", "w": 10.0}},
        training_cfgs=bank.training_cfgs(), uniform_sample_n=0,
        use_ts_interp=True)
    state = trainer.init_state(jax.random.PRNGKey(0),
                               bank.init_params(jax.random.PRNGKey(1)))
    n = 64
    key = jax.random.PRNGKey(2)
    batch = {
        "rays_o": jax.random.uniform(key, (n, 3), minval=-1.0, maxval=1.0),
        "rays_d": jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (n, 1)),
        "rays_fidx": jnp.asarray(np.arange(n) % 4, jnp.int32),
        "image_rgb": jnp.full((n, 3), 0.5),
    }
    s1, m = trainer.train_step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(m["loss_total"]))
    # params actually moved
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        s1.params, trainer.init_state(
            jax.random.PRNGKey(0),
            bank.init_params(jax.random.PRNGKey(1))).params)
    assert max(jax.tree_util.tree_leaves(d)) > 0
