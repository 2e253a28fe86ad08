"""CLI data-parallel training: ``training.data_parallel`` drives the full
train driver through the pjit'd sharded step on the 8-virtual-device CPU
mesh (the DDP analog of reference code_single/tools/train.py:1405).

Complements tests/test_sharded_parity.py (library-level parity): this one
catches driver wiring — batch keys that don't shard, divisibility checks,
metric replication for the host-side error-map update.
"""
import numpy as np
import pytest

from neuralsim_tpu.tools.train import main_function

from test_cli_train_e2e import _tiny_cfg


def test_cli_train_data_parallel(tmp_path):
    cfg = _tiny_cfg(tmp_path, data_parallel=True,
                    error_map={"hw": [8, 8], "frac_uniform": 0.5})
    out = main_function(cfg)
    assert np.isfinite(out["psnr"])


def test_cli_train_data_parallel_subset_mesh(tmp_path):
    # explicit device count (a pod-slice subset)
    cfg = _tiny_cfg(tmp_path, data_parallel=4)
    out = main_function(cfg)
    assert np.isfinite(out["psnr"])


def test_data_parallel_divisibility_error(tmp_path):
    cfg = _tiny_cfg(tmp_path, data_parallel=True, n_rays=130)
    with pytest.raises(ValueError, match="not divisible"):
        main_function(cfg)


def test_cli_train_multi_data_parallel(tmp_path):
    from neuralsim_tpu.tools.train_multi import main_function as mf_multi
    cfg = {
        "exp_dir": str(tmp_path / "exp_multi"),
        "seed": 0,
        "compile_cache": None,
        "dataset_cfg": {
            "target": "neuralsim_tpu.dataio.synthetic_multi."
                      "SyntheticMultiObjectDataset",
            "params": {"n_frames": 2, "H": 32, "W": 32},
        },
        "assetbank_cfg": {
            "Vehicle": {
                "model_class": "neuralsim_tpu.models.assets."
                               "ADGenerativeLoTDConcatNeuSObj",
                "model_params": {
                    "z_dim": 4,
                    "encoding_cfg": {"n_levels": 3, "base_res": 8,
                                     "max_res": 32, "n_feats": 2,
                                     "cp_max_res": 32},
                    "geo_feat_dim": 7, "radiance_hidden": 16,
                    "inv_s_init": 30.0,
                    "query_cfg": {"num_coarse": 8, "num_fine": [4],
                                  "upsample_inv_s_factors": [1.0]}},
                "asset_params": {"training_cfg": {"lr": 8e-3}}},
            "Street": {
                "model_class": "neuralsim_tpu.models.assets.LoTDNeuSStreet",
                "model_params": {
                    "aabb": [[-4, -4, -1.2], [4, 4, 1.6]],
                    "encoding_cfg": {"type": "tpu_mixed", "n_levels": 3,
                                     "base_res": 8, "max_res": 32,
                                     "n_feats": 2, "n_hash_levels": 0,
                                     "log2_hashmap_size": 10,
                                     "cp_max_res": 32},
                    "geo_feat_dim": 7, "radiance_hidden": 16,
                    "inv_s_init": 20.0, "accel_cfg": None, "pretrain": None,
                    "query_cfg": {"num_coarse": 8, "num_fine": [4],
                                  "upsample_inv_s_factors": [1.0]}},
                "asset_params": {"training_cfg": {"lr": 8e-3}}},
            "Sky": {"model_class": "neuralsim_tpu.models.assets.SimpleSkyAsset",
                    "model_params": {"hidden": 8},
                    "asset_params": {"training_cfg": {"lr": 3e-3}}},
        },
        "renderer": {"type": "multi", "hit_budget_frac": 0.5,
                     "group_budget_frac": 1.0},
        "training": {
            "num_iters": 4, "n_rays": 128, "uniform_sample_n": 64,
            "i_log": 2, "data_parallel": True,
            "losses": {
                "rgb": {"fn_type": "huber", "fn_param": {"delta": 0.1},
                        "w": 10.0},
                "eikonal": {"w": 0.01},
                "latent": {"w": 1e-3},
            },
        },
    }
    out = mf_multi(cfg)
    assert out["state"] is not None and int(out["state"].it) == 4
