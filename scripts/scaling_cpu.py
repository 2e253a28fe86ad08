"""CPU-mesh scaling sanity curve (VERDICT r2 item 10).

Real multi-chip hardware is not attachable here (single-chip tunnel), so
this measures per-step wall time of the pjit data-parallel train step on an
8-virtual-device CPU mesh at FIXED global batch, for 1/2/4/8 devices. CPU
"devices" share the same cores, so this is NOT a throughput claim — it is a
pathology detector: a sharding bug that replicates work or inserts
per-device host sync shows up as superlinear time growth with device count;
a clean SPMD program stays roughly flat (same total FLOPs on the same
cores, modest partition overhead).

Run: python scripts/scaling_cpu.py [n_rays] [iters]
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from neuralsim_tpu.dataio.synthetic import SyntheticObjectDataset
from neuralsim_tpu.fields import AABBSpace, NeRFDistantField, NeuSField, SimpleSky
from neuralsim_tpu.parallel.mesh import make_mesh, make_sharded_train_step
from neuralsim_tpu.renderers import SingleVolumeRenderer
from neuralsim_tpu.training.trainer import Trainer

N_RAYS = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def main():
    field = NeuSField(AABBSpace((-1, -1, -1), (1, 1, 1)), geometry="lotd",
                      encoding_cfg={"type": "tpu_mixed", "n_levels": 6,
                                    "base_res": 8, "max_res": 128,
                                    "n_feats": 4, "n_hash_levels": 0,
                                    "cp_max_res": 256,
                                    "log2_hashmap_size": 12},
                      geo_feat_dim=8, radiance_hidden=32)
    renderer = SingleVolumeRenderer(
        {"cr": field,
         "distant": NeRFDistantField(inner_radius=1.0, geometry="mlp",
                                     geo_feat_dim=4, radiance_hidden=16),
         "sky": SimpleSky(hidden=16)},
        query_cfg={"num_coarse": 16, "num_fine": (8,),
                   "upsample_inv_s_factors": (1.0,)},
        distant_query_cfg={"num_samples": 16})
    trainer = Trainer(renderer,
                      loss_cfgs={"rgb": {"w": 10.0}, "eikonal": {"w": 0.01}},
                      training_cfgs={"cr": {"lr": 1e-2}},
                      uniform_sample_n=256)
    state0 = trainer.init_state(jax.random.PRNGKey(0))

    ds = SyntheticObjectDataset(n_frames=2, H=64, W=64)
    b = ds.sample_pixels(np.random.default_rng(0), N_RAYS)
    batch = {k: jnp.asarray(v) for k, v in b.items()
             if k in ("rays_o", "rays_d", "image_rgb",
                      "image_occupancy_mask")}
    key = jax.random.PRNGKey(1)

    results = []
    for n_dev in (1, 2, 4, 8):
        mesh = make_mesh(n_dev)
        step = make_sharded_train_step(trainer, mesh, "pixel",
                                       example_batch=batch)
        state = jax.tree.map(jnp.array, state0)
        state, m = step(state, dict(batch), key)        # compile
        jax.block_until_ready(m["loss_total"])
        t0 = time.perf_counter()
        for i in range(ITERS):
            state, m = step(state, dict(batch),
                            jax.random.fold_in(key, i))
        jax.block_until_ready(m["loss_total"])
        dt = (time.perf_counter() - t0) / ITERS
        results.append({"devices": n_dev, "ms_per_step": round(dt * 1e3, 1),
                        "loss": round(float(m["loss_total"]), 6)})
        print(json.dumps(results[-1]), flush=True)

    base = results[0]["ms_per_step"]
    worst = max(r["ms_per_step"] for r in results)
    print(json.dumps({"verdict": "ok" if worst < 2.0 * base else "PATHOLOGY",
                      "max_over_1dev": round(worst / base, 2)}), flush=True)


if __name__ == "__main__":
    main()
