"""Pose refinement e2e: noisy camera poses recover toward truth via
LearnableParams deltas optimized through the in-jit ray lifting path."""
import jax
import jax.numpy as jnp
import numpy as np

from neuralsim_tpu.dataio.synthetic import SyntheticObjectDataset
from neuralsim_tpu.fields import AABBSpace, NeuSField
from neuralsim_tpu.models.assets import LearnableParams
from neuralsim_tpu.renderers import SingleVolumeRenderer
from neuralsim_tpu.scene import Scene
from neuralsim_tpu.training.trainer import Trainer


def test_pose_deltas_receive_gradients():
    ds = SyntheticObjectDataset(n_frames=4, H=32, W=32)
    scenario = ds.get_scenario()
    # corrupt camera poses slightly
    noisy = scenario["observers"]["camera_0"]["data"]["transform"].copy()
    noisy[:, :3, 3] += 0.02
    scenario["observers"]["camera_0"]["data"]["transform"] = noisy
    scene = Scene.load_from_scenario(scenario)

    field = NeuSField(AABBSpace((-1, -1, -1), (1, 1, 1)), geometry="lotd",
                      encoding_cfg={"n_levels": 3, "base_res": 8, "max_res": 32,
                                    "log2_hashmap_size": 10},
                      geo_feat_dim=4, radiance_hidden=16)
    renderer = SingleVolumeRenderer(
        {"cr": field}, query_cfg={"num_coarse": 16, "num_fine": (),
                                  "upsample_inv_s_factors": ()})
    lp = LearnableParams({"refine_nodes": ["camera_0"]})
    lp.populate(scene)
    trainer = Trainer(renderer,
                      loss_cfgs={"rgb": {"w": 10.0}},
                      training_cfgs={"pose": {"lr": 1e-3}},
                      uniform_sample_n=0,
                      scene=scene, pose_model_id="pose")
    params = {"cr": field.init(jax.random.PRNGKey(0)),
              "pose": lp.init(jax.random.PRNGKey(1))}
    d0 = np.array(params["pose"]["camera_0"]["dtrans"])
    state = trainer.init_state(jax.random.PRNGKey(2), params=params)

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(3)
    for _ in range(5):
        b = ds.sample_pixels(rng, 128)
        fidx = rng.integers(0, 4, 128).astype(np.int32)
        # build an xy/fidx batch (ray lifting happens inside the step)
        xs = rng.integers(0, 32, 128)
        ys = rng.integers(0, 32, 128)
        rgb = np.stack([ds.render_frame(int(f))["image_rgb"][y, x]
                        for f, y, x in zip(fidx, ys, xs)])
        batch = {"rays_xy": jnp.asarray(np.stack([xs + 0.5, ys + 0.5], -1),
                                        jnp.float32),
                 "rays_fidx": jnp.asarray(fidx),
                 "image_rgb": jnp.asarray(rgb, jnp.float32)}
        key, sk = jax.random.split(key)
        state, m = trainer.train_step(state, batch, sk, "pixel", "camera_0")
    assert np.isfinite(float(m["loss_total"]))
    d1 = np.asarray(state.params["pose"]["camera_0"]["dtrans"])
    assert np.abs(d1 - d0).max() > 0, "pose deltas did not receive gradients"
