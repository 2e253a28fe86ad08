"""Gradient parity: pair-mode slot-lane fold vs per-object scatter paths.

Isolates the suspected slot-lane-fold quality bug (pair mode trains 1.6 dB
below per-instance at equal budget): same scene, same params, deterministic
sampling (key=None), identical pair selection (ample budgets) — forward and
gradients must agree across (a) exact oracle, (b) per-instance compaction,
(c) pair mode with per-obj scatter, (d) pair mode with slot-lane fold.
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from neuralsim_tpu.dataio.synthetic_multi import SyntheticMultiObjectDataset
from neuralsim_tpu.renderers.buffer_compose import BufferComposeRenderer
from neuralsim_tpu.scene import AssetBank, Scene

VEHICLE = {
    "model_class": "neuralsim_tpu.models.assets.ADGenerativeLoTDConcatNeuSObj",
    "model_params": {
        "z_dim": 8,
        "encoding_cfg": {"n_levels": 4, "base_res": 8, "max_res": 32,
                         "n_feats": 2, "cp_max_res": 32},
        "geo_feat_dim": 7, "radiance_hidden": 16, "inv_s_init": 30.0,
        "query_cfg": {"num_coarse": 12, "num_fine": (4,),
                      "upsample_inv_s_factors": (1.0,)}},
    "asset_params": {"training_cfg": {"lr": 8e-3}}}
STREET = {
    "model_class": "neuralsim_tpu.models.assets.LoTDNeuSStreet",
    "model_params": {
        "aabb": [[-4, -4, -1.2], [4, 4, 1.6]],
        "encoding_cfg": {"type": "tpu_mixed", "n_levels": 4, "base_res": 8,
                         "max_res": 64, "n_feats": 2, "n_hash_levels": 0,
                         "log2_hashmap_size": 15, "cp_max_res": 64},
        "geo_feat_dim": 7, "radiance_hidden": 16, "inv_s_init": 20.0,
        "accel_cfg": None, "pretrain": None,
        "query_cfg": {"num_coarse": 16, "num_fine": (4,),
                      "upsample_inv_s_factors": (1.0,)}},
    "asset_params": {"training_cfg": {"lr": 8e-3}}}
SKY = {"model_class": "neuralsim_tpu.models.assets.SimpleSkyAsset",
       "model_params": {"hidden": 16},
       "asset_params": {"training_cfg": {"lr": 3e-3}}}


def main():
    ds = SyntheticMultiObjectDataset(n_frames=2, H=32, W=32)
    scene = Scene.load_from_scenario(ds.get_scenario())
    bank = AssetBank.create({"Vehicle": VEHICLE, "Street": STREET, "Sky": SKY},
                            [scene])
    params = bank.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(v) for k, v in ds.sample_pixels(rng, 256).items()}
    frozen = scene.slice_at(batch["rays_fidx"])
    gt = batch["image_rgb"]

    def make(jq_kw, **kw):
        r = BufferComposeRenderer.from_asset_bank(scene, bank, **kw)
        def loss_fn(p):
            out = r.ray_query(p, frozen, batch["rays_o"], batch["rays_d"],
                              key=None, it=500, **jq_kw)
            return (jnp.mean((out["rgb_volume"] - gt) ** 2)
                    + 0.1 * jnp.mean(out["mask_volume"])), out
        return loss_fn

    modes = {
        "oracle": make({"with_per_obj": False},
                       group_budget_frac=None, hit_budget_frac=None),
        "perinst": make({"with_per_obj": False},
                        group_budget_frac=None, hit_budget_frac=1.0),
        "pair_scat": make({"with_per_obj": True},
                          group_budget_frac=2.0, hit_budget_frac=1.0),
        "pair_fold": make({"with_per_obj": False},
                          group_budget_frac=2.0, hit_budget_frac=1.0),
    }
    results = {}
    for name, fn in modes.items():
        (loss, out), grads = jax.value_and_grad(fn, has_aux=True)(params)
        results[name] = (float(loss), out, grads)
        print(f"{name:10s} loss={float(loss):.8f} "
              f"rgb_sum={float(jnp.sum(out['rgb_volume'])):.6f} "
              f"mask_sum={float(jnp.sum(out['mask_volume'])):.6f}")

    ref_loss, ref_out, ref_grads = results["oracle"]
    for name in ("perinst", "pair_scat", "pair_fold"):
        loss, out, grads = results[name]
        drgb = float(jnp.max(jnp.abs(out["rgb_volume"] - ref_out["rgb_volume"])))
        print(f"\n== {name} vs oracle ==  dloss={loss - ref_loss:+.3e} "
              f"max|drgb|={drgb:.3e}")
        flat_r, _ = jax.flatten_util.ravel_pytree(ref_grads)
        flat_t, _ = jax.flatten_util.ravel_pytree(grads)
        print(f"   grad max|d|={float(jnp.max(jnp.abs(flat_t - flat_r))):.3e} "
              f"  |ref|max={float(jnp.max(jnp.abs(flat_r))):.3e}")
        for mid in grads:
            gr, _ = jax.flatten_util.ravel_pytree(ref_grads[mid])
            gt_, _ = jax.flatten_util.ravel_pytree(grads[mid])
            d = float(jnp.max(jnp.abs(gt_ - gr)))
            if d > 1e-5 * max(float(jnp.max(jnp.abs(gr))), 1e-8):
                print(f"   model {mid}: grad max|d|={d:.3e} "
                      f"ref_max={float(jnp.max(jnp.abs(gr))):.3e}")


if __name__ == "__main__":
    from neuralsim_tpu.utils.tpu_lock import tpu_chip_lock
    with tpu_chip_lock("scripts/debug_pairmode_grads.py"):
        main()
