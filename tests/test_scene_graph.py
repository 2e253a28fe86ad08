"""Scene graph tests: scenario parsing, slicing, interp, world transforms,
ray conversion, camera lifting, asset bank wiring."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralsim_tpu.scene import AssetBank, Scene, SceneNode
from neuralsim_tpu.scene.observers import (camera_get_all_rays,
                                           camera_get_selected_rays,
                                           lidar_rays_to_world,
                                           make_lidar_generator)


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0, 0], [s, c, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
                    np.float32)


@pytest.fixture
def scenario():
    T = 4
    ego_T = np.stack([np.array(
        [[1, 0, 0, float(i)], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        np.float32) @ _rot_z(0.1 * i) for i in range(T)])
    cam_T = np.tile(np.eye(4, dtype=np.float32), (T, 1, 1))
    cam_T[:, 2, 3] = 1.5  # camera 1.5 up... (z offset in ego frame)
    intr = np.tile(np.array([[50, 0, 32], [0, 50, 32], [0, 0, 1]], np.float32),
                   (T, 1, 1))
    car_T = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    car_T[:, 0, 3] = 10.0
    return {
        "scene_id": "s0",
        "metas": {"num_frames": T},
        "observers": {
            "ego": {"class_name": "EgoVehicle", "n_frames": T,
                    "data": {"transform": ego_T},
                    "children": {
                        "cam_front": {"class_name": "Camera", "n_frames": T,
                                      "data": {"transform": cam_T, "intr": intr,
                                               "hw": np.tile([64, 64], (T, 1)),
                                               "global_ts": np.arange(T, dtype=np.float32)}},
                        "lidar_top": {"class_name": "RaysLidar", "n_frames": T,
                                      "data": {"transform": cam_T}},
                    }},
        },
        "objects": {
            "car_1": {"class_name": "Vehicle", "segments": [{
                "start_frame": 1, "n_frames": 2,
                "data": {"transform": car_T,
                         "scale": np.tile([2.0, 1.0, 0.8], (2, 1))}}]},
        },
    }


def test_scenario_parse_and_registries(scenario):
    sc = Scene.load_from_scenario(scenario)
    assert set(sc.observer_ids()) == {"cam_front", "lidar_top"}
    assert sc.drawable_ids() == ["car_1"]
    assert sc.n_frames == 4
    # parents resolved
    assert sc.nodes["cam_front"].parent == "ego"


def test_world_transform_propagation(scenario):
    sc = Scene.load_from_scenario(scenario)
    fr = sc.slice_at(2)
    ego_w = np.asarray(fr.world_transform("ego"))
    cam_w = np.asarray(fr.world_transform("cam_front"))
    # camera world = ego @ cam_local
    expected = ego_w @ np.asarray(sc.nodes["cam_front"].frame_data["transform"][2])
    np.testing.assert_allclose(cam_w, expected, atol=1e-5)
    # ego at frame 2 has x translation 2
    assert ego_w[0, 3] == pytest.approx(2.0)


def test_batched_slice(scenario):
    sc = Scene.load_from_scenario(scenario)
    fr = sc.slice_at(jnp.array([0, 1, 2, 3]))
    w = fr.world_transform("cam_front")
    assert w.shape == (4, 4, 4)
    # validity flags for the segmented object
    v = np.asarray(fr.valid("car_1"))
    np.testing.assert_array_equal(v, [False, True, True, False])


def test_interp_at_midpoint(scenario):
    sc = Scene.load_from_scenario(scenario)
    fr = sc.interp_at(jnp.asarray([0.5]))
    ego_w = np.asarray(fr.world_transform("ego"))[0]
    assert ego_w[0, 3] == pytest.approx(0.5, abs=1e-5)  # translation lerp
    # rotation slerp: angle should be ~0.05
    ang = np.arctan2(ego_w[1, 0], ego_w[0, 0])
    assert ang == pytest.approx(0.05, abs=1e-4)


def test_rays_to_node_roundtrip(scenario):
    sc = Scene.load_from_scenario(scenario)
    fr = sc.slice_at(1)
    ro = jnp.asarray([[5.0, 1.0, 0.5]])
    rd = jnp.asarray([[1.0, 0.0, 0.0]])
    o_l, d_l, dn = fr.rays_to_node("car_1", ro, rd)
    o_b, d_b = fr.rays_from_node("car_1", o_l, d_l)
    np.testing.assert_allclose(np.asarray(o_b), np.asarray(ro), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_b), np.asarray(rd), atol=1e-5)


def test_camera_ray_lifting(scenario):
    sc = Scene.load_from_scenario(scenario)
    fr = sc.slice_at(0)
    # center pixel -> ray through optical axis (camera z in world frame)
    xy = jnp.asarray([[32.0, 32.0]])
    ro, rd = camera_get_selected_rays(fr, "cam_front", xy)
    cam_w = np.asarray(fr.world_transform("cam_front"))
    np.testing.assert_allclose(np.asarray(ro)[0], cam_w[:3, 3], atol=1e-5)
    np.testing.assert_allclose(np.asarray(rd)[0], cam_w[:3, 2], atol=1e-5)
    ro_all, rd_all = camera_get_all_rays(fr, "cam_front", 8, 8)
    assert ro_all.shape == (64, 3) and rd_all.shape == (64, 3)


def test_lidar_world_transform_and_generators(scenario):
    sc = Scene.load_from_scenario(scenario)
    fr = sc.slice_at(0)
    o = jnp.zeros((5, 3))
    d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (5, 1))
    wo, wd = lidar_rays_to_world(fr, "lidar_top", o, d)
    assert wo.shape == (5, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(wd), axis=-1), 1.0,
                               atol=1e-6)
    for model in ("pandar64", "vlp16"):
        gen = make_lidar_generator(model)
        _, dirs = gen.get_all_rays()
        np.testing.assert_allclose(np.linalg.norm(np.asarray(dirs), axis=-1),
                                   1.0, atol=1e-5)
    gen = make_lidar_generator("risley_prism", n_points=512)
    assert gen.dirs.shape == (512, 3)


def test_asset_bank_create_and_init(scenario):
    sc = Scene.load_from_scenario(scenario)
    bank = AssetBank.create({
        "Vehicle": {"model_class": "neuralsim_tpu.models.assets.LoTDNeuSObj",
                    "model_params": {"encoding_cfg": {"n_levels": 2, "base_res": 8,
                                                      "max_res": 16,
                                                      "log2_hashmap_size": 8}},
                    "asset_params": {"training_cfg": {"lr": 2e-3}}},
        "Sky": {"model_class": "neuralsim_tpu.models.assets.SimpleSkyAsset",
                "model_params": {"hidden": 16}},
    }, [sc])
    assert "Vehicle#s0#car_1" in bank.assets
    assert "Sky#s0" in bank.assets
    assert bank.model_for("s0", "car_1") == "Vehicle#s0#car_1"
    params = bank.init_params(jax.random.PRNGKey(0))
    assert set(params.keys()) == set(bank.ids())
    assert bank.training_cfgs()["Vehicle#s0#car_1"]["lr"] == 2e-3


def test_learnable_params_delta():
    from neuralsim_tpu.models.assets import LearnableParams
    lp = LearnableParams({"refine_nodes": ["cam"], "n_frames": 2})
    lp.populate(None)
    p = lp.init(jax.random.PRNGKey(0))
    T = jnp.tile(jnp.eye(4), (2, 1, 1))
    # zero deltas = identity
    out = LearnableParams.apply_delta(T, p["cam"]["dquat"], p["cam"]["dtrans"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(T), atol=1e-6)
    # small rotation about z by 0.1
    dq = jnp.tile(jnp.asarray([[0.0, 0.0, 0.1]]), (2, 1))
    out = LearnableParams.apply_delta(T, dq, jnp.zeros((2, 3)))
    ang = np.arctan2(np.asarray(out)[0, 1, 0], np.asarray(out)[0, 0, 0])
    assert ang == pytest.approx(0.1, abs=1e-5)
