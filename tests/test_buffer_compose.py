"""Multi-object compose renderer test: two objects + sky, depth ordering."""
import jax
import jax.numpy as jnp
import numpy as np

from neuralsim_tpu.renderers.buffer_compose import (BufferComposeRenderer,
                                                    ObjectBinding)
from neuralsim_tpu.fields import AABBSpace, NeuSField, SimpleSky
from neuralsim_tpu.scene import Scene


def _scenario():
    T = 2
    def trans(x):
        M = np.tile(np.eye(4, dtype=np.float32), (T, 1, 1))
        M[:, 0, 3] = x
        return M
    return {
        "scene_id": "m0", "metas": {"num_frames": T},
        "observers": {},
        "objects": {
            "near_obj": {"class_name": "Vehicle", "segments": [
                {"start_frame": 0, "n_frames": T,
                 "data": {"transform": trans(2.0),
                          "scale": np.ones((T, 3), np.float32)}}]},
            "far_obj": {"class_name": "Vehicle", "segments": [
                {"start_frame": 0, "n_frames": T,
                 "data": {"transform": trans(5.0),
                          "scale": np.ones((T, 3), np.float32)}}]},
        },
    }


def test_two_object_compose_depth_order():
    scene = Scene.load_from_scenario(_scenario())
    space = AABBSpace((-1, -1, -1), (1, 1, 1))
    f = NeuSField(space, geometry="lotd",
                  encoding_cfg={"n_levels": 3, "base_res": 8, "max_res": 32,
                                "log2_hashmap_size": 10},
                  geo_feat_dim=4, radiance_hidden=16,
                  ln_inv_s_init=float(np.log(60.0)))
    qcfg = {"num_coarse": 32, "num_fine": (8,), "upsample_inv_s_factors": (1.0,),
            "perturb": False}
    objs = [ObjectBinding("near_obj", "m_near", f, qcfg),
            ObjectBinding("far_obj", "m_far", f, qcfg)]
    sky = SimpleSky(hidden=16)
    r = BufferComposeRenderer(scene, objs, {"sky": (sky, "m_sky", {})})
    k = jax.random.PRNGKey(0)
    params = {"m_near": f.init(k), "m_far": f.init(jax.random.fold_in(k, 1)),
              "m_sky": sky.init(jax.random.fold_in(k, 2))}

    frozen = scene.slice_at(0)
    # ray along +x from origin: hits near_obj sphere (r=0.5 @ x=2) at t=1.5
    rays_o = jnp.asarray([[0.0, 0.0, 0.0]])
    rays_d = jnp.asarray([[1.0, 0.0, 0.0]])
    out = r.ray_query(params, frozen, rays_o, rays_d, key=None,
                      return_buffer=True)
    depth = float(out["depth_volume"][0])
    assert abs(depth - 1.5) < 0.2, depth
    # near object dominates the composite
    per = out["rendered_per_obj_in_scene"]
    assert float(per["near_obj"]["mask_volume"][0]) > 0.8
    assert float(per["far_obj"]["mask_volume"][0]) < 0.1
    # instance segmentation picks the near object
    from neuralsim_tpu.renderers.buffer_compose import render_instance_segmentation
    assert int(render_instance_segmentation(out)[0]) == 0


def test_nonunit_scale_world_depth():
    """Object-local sample depths must convert to WORLD t for scaled objects.

    The SDF-init sphere has local radius ~0.5; at object scale s its world
    radius is 0.5*s, so a ray from the origin toward the center at x=2 hits
    at t = 2 - 0.5*s. (ADVICE r1 high: t conversion must divide by dn.)"""
    for s, expect in ((0.5, 1.75), (2.0, 1.0)):
        sc = _scenario()
        del sc["objects"]["far_obj"]
        sc["objects"]["near_obj"]["segments"][0]["data"]["scale"] = \
            np.full((2, 3), s, np.float32)
        scene = Scene.load_from_scenario(sc)
        space = AABBSpace((-1, -1, -1), (1, 1, 1))
        f = NeuSField(space, geometry="lotd",
                      encoding_cfg={"n_levels": 2, "base_res": 8,
                                    "max_res": 16, "log2_hashmap_size": 9},
                      geo_feat_dim=4, radiance_hidden=16,
                      ln_inv_s_init=float(np.log(60.0)))
        qcfg = {"num_coarse": 48, "num_fine": (8,),
                "upsample_inv_s_factors": (1.0,), "perturb": False}
        r = BufferComposeRenderer(
            scene, [ObjectBinding("near_obj", "m", f, qcfg)], {})
        params = {"m": f.init(jax.random.PRNGKey(0))}
        out = r.ray_query(params, scene.slice_at(0),
                          jnp.asarray([[0.0, 0.0, 0.0]]),
                          jnp.asarray([[1.0, 0.0, 0.0]]), key=None)
        depth = float(out["depth_volume"][0])
        assert abs(depth - expect) < 0.2, (s, depth)


def test_compose_respects_validity():
    sc = _scenario()
    sc["objects"]["near_obj"]["segments"][0]["n_frames"] = 1  # only frame 0
    scene = Scene.load_from_scenario(sc)
    space = AABBSpace((-1, -1, -1), (1, 1, 1))
    f = NeuSField(space, geometry="lotd",
                  encoding_cfg={"n_levels": 2, "base_res": 8, "max_res": 16,
                                "log2_hashmap_size": 9},
                  geo_feat_dim=4, radiance_hidden=16,
                  ln_inv_s_init=float(np.log(60.0)))
    qcfg = {"num_coarse": 24, "num_fine": (), "upsample_inv_s_factors": (),
            "perturb": False}
    objs = [ObjectBinding("near_obj", "m", f, qcfg)]
    r = BufferComposeRenderer(scene, objs, {})
    params = {"m": f.init(jax.random.PRNGKey(0))}
    rays_o = jnp.asarray([[0.0, 0.0, 0.0]])
    rays_d = jnp.asarray([[1.0, 0.0, 0.0]])
    # frame 1: object invalid -> zero mass
    out1 = r.ray_query(params, scene.slice_at(1), rays_o, rays_d, key=None)
    assert float(out1["mask_volume"][0]) == 0.0
    out0 = r.ray_query(params, scene.slice_at(0), rays_o, rays_d, key=None)
    assert float(out0["mask_volume"][0]) > 0.5
