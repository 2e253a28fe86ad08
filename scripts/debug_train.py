"""Debug: train tiny NeuS on synthetic object, print loss curve + PSNR."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from neuralsim_tpu.utils.tpu_lock import acquire_for_process
acquire_for_process("scripts/debug_train.py")

import jax
if os.environ.get("BENCH_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from neuralsim_tpu.dataio.synthetic import SyntheticObjectDataset
from neuralsim_tpu.fields import AABBSpace, NeuSField, SimpleSky
from neuralsim_tpu.renderers import SingleVolumeRenderer
from neuralsim_tpu.training import Trainer, psnr

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

rng = np.random.default_rng(0)


def batch(n=512):
    b = ds.sample_pixels(rng, n)
    return {k: jnp.asarray(v) for k, v in b.items()
            if k in ("rays_o", "rays_d", "image_rgb", "image_occupancy_mask")}


state = trainer.init_state(jax.random.PRNGKey(0))
key = jax.random.PRNGKey(1)
for i in range(301):
    key, sk = jax.random.split(key)
    state, metrics = trainer.train_step(state, batch(), sk, "pixel")
    if i % 25 == 0:
        m = jax.device_get(metrics)
        print(f"it={i:4d} total={m['loss_total']:.4f} rgb={m['loss_rgb']:.4f} "
              f"mask={m.get('loss_mask', 0):.4f} eik={m.get('loss_eikonal', 0):.4f} "
              f"inv_s={m.get('inv_s', 0):.1f} mask_mean={m['rendered_mask_mean']:.3f}",
              flush=True)

b = ds.sample_pixels(np.random.default_rng(123), 2048)
bb = {k: jnp.asarray(v) for k, v in b.items()}
rendered = renderer.ray_query(state.params, bb["rays_o"], bb["rays_d"], key=None,
                              query_overrides={"perturb": False})
p = float(psnr(rendered["rgb_volume"], bb["image_rgb"]))
d_err = np.abs(np.asarray(rendered["depth_volume"]) - b["image_depth"])
hit = b["image_occupancy_mask"] > 0
print(f"PSNR={p:.2f}  depth MAE(fg)={d_err[hit].mean():.4f} "
      f"mask acc={((np.asarray(rendered['mask_volume'])>0.5)==hit).mean():.3f}")
