"""Tests: forest space, extra cameras, color transform, anim, profiler,
error map, mono losses, patch samplers, EmerNeRF."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_forest_block_space_and_field():
    from neuralsim_tpu.fields.forest import ForestBlockSpace, ForestNeuSField
    pts = np.array([[0.0, 0.0, 0.0], [30.0, 0.0, 0.0], [0.0, 30.0, 0.0]])
    forest = ForestBlockSpace.from_points(pts, block_size=25.0)
    assert forest.n_blocks == 3
    # point->block lookup
    bi = forest.block_of(jnp.asarray([[1.0, 1.0, 1.0], [26.0, 1.0, 1.0],
                                      [100.0, 100.0, 100.0]]))
    assert int(bi[0]) >= 0 and int(bi[1]) >= 0 and int(bi[2]) == -1
    field = ForestNeuSField(forest,
                            encoding_cfg={"n_levels": 2, "base_res": 4,
                                          "max_res": 8, "log2_hashmap_size": 8},
                            geo_feat_dim=4, radiance_hidden=8)
    params = field.init(jax.random.PRNGKey(0))
    x = jnp.asarray([[1.0, 1.0, 1.0], [100.0, 100.0, 100.0]])
    sdf = field.query_sdf(params, x)
    assert jnp.isfinite(sdf).all()
    assert float(sdf[1]) >= 20.0  # outside all blocks => empty


def test_extra_cameras():
    from neuralsim_tpu.scene.observers.extra_cameras import (
        ortho_get_rays, panorama_get_rays, panorama_project)
    c2w = jnp.eye(4)
    xy = jnp.asarray([[32.0, 32.0]])
    o, d = ortho_get_rays(xy, c2w, width=2.0, height=2.0, W=64, H=64)
    np.testing.assert_allclose(np.asarray(d)[0], [0, 0, 1], atol=1e-6)
    # pano center pixel looks forward (+z)
    o, d = panorama_get_rays(jnp.asarray([[128.0, 64.0]]), c2w, W=256, H=128)
    np.testing.assert_allclose(np.asarray(d)[0], [0, 0, 1], atol=1e-5)
    # project-back roundtrip
    xy2, r = panorama_project(d * 5.0, W=256, H=128)
    np.testing.assert_allclose(np.asarray(xy2)[0], [128.0, 64.0], atol=1e-3)
    np.testing.assert_allclose(float(r[0]), 5.0, atol=1e-5)


def test_color_transform():
    from neuralsim_tpu.models.misc_assets import ColorTransform
    ct = ColorTransform({"n_frames": 3})
    ct.populate(None)
    p = ct.init(jax.random.PRNGKey(0))
    rgb = jnp.asarray([[0.5, 0.4, 0.3]])
    out = ct.apply(p, rgb, jnp.asarray([1]))
    np.testing.assert_allclose(np.asarray(out), np.asarray(rgb), atol=1e-6)


def test_anim_reverse_and_file(tmp_path):
    from neuralsim_tpu.anim import FileAnim, ReverseEgoAnim
    from neuralsim_tpu.scene import Scene
    T = 3
    trs = np.tile(np.eye(4, dtype=np.float32), (T, 1, 1))
    trs[:, 0, 3] = np.arange(T)
    sc = Scene.load_from_scenario({
        "scene_id": "a", "metas": {"num_frames": T},
        "observers": {"ego": {"class_name": "EgoVehicle", "n_frames": T,
                              "data": {"transform": trs}}},
        "objects": {}})
    ReverseEgoAnim("ego").apply(sc)
    assert float(sc.nodes["ego"].frame_data["transform"][0, 0, 3]) == 2.0
    # file anim
    np.savez(tmp_path / "anim.npz", ego=trs)
    FileAnim(str(tmp_path / "anim.npz")).apply(sc)
    assert float(sc.nodes["ego"].frame_data["transform"][0, 0, 3]) == 0.0


def test_profiler():
    from neuralsim_tpu.utils.profiler import Profiler
    prof = Profiler(warmup_frames=1, record_frames=2)
    out = None
    for _ in range(3):
        with prof.range("sec"):
            jnp.sum(jnp.ones((8, 8))).block_until_ready()
        out = prof.step()
    assert out is not None and "sec" in out
    assert out["sec"]["count"] == 2


def test_error_map_importance():
    from neuralsim_tpu.training.error_map import ErrorMap, ImpSampler
    rng = np.random.default_rng(0)
    em = ErrorMap(n_frames=2, hw=(8, 8), init_val=1e-3, ema=0.0)
    # concentrate error in frame 1, top-left cell
    em.step_error_map(np.full(100, 1, int),
                      np.full((100, 2), 0.02), np.full(100, 10.0))
    f, xy = em.sample_joint(rng, 500)
    assert (f == 1).mean() > 0.9
    assert (xy[:, 0] < 0.2).mean() > 0.9
    s = ImpSampler(em, frac_uniform=0.0)
    fidx, xs, ys = s.sample(rng, "cam", 100, 64, 64)
    assert (fidx == 1).mean() > 0.9


def test_mono_losses():
    from neuralsim_tpu.losses import (mono_depth_loss, mono_normals_loss,
                                      solve_scale_shift)
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.random((1, 16, 16)) + 1.0)
    mask = jnp.ones((1, 16, 16), bool)
    # mono prior = affine transform of gt -> loss ~ 0 after scale/shift solve
    mono = gt * 0.3 + 2.0
    s, b = solve_scale_shift(mono, gt, mask)
    np.testing.assert_allclose(float(s[0, 0, 0]), 1 / 0.3, rtol=1e-2)
    loss = mono_depth_loss(gt, mono, mask, 0, {"w": 1.0})
    assert float(loss) < 1e-3
    # wrong prior -> big loss
    loss_bad = mono_depth_loss(gt, jnp.asarray(rng.random((1, 16, 16))),
                               mask, 0, {"w": 1.0})
    assert float(loss_bad) > float(loss)
    # normals: identical -> 0
    n = jnp.asarray(rng.standard_normal((32, 3)))
    ln = mono_normals_loss(n, n, jnp.ones(32, bool), 0, {"w": 1.0})
    assert float(ln) < 1e-6


def test_patch_samplers():
    from neuralsim_tpu.dataio.patch_sampler import (FlexGridPatchSampler,
                                                    SlideWindowPatchSampler)
    fs = FlexGridPatchSampler(num_pixels=(8, 8), scale_range=(0.2, 0.5), seed=0)
    g = fs.sample(64, 64)
    assert g.shape == (8, 8, 2)
    assert g.min() >= 0 and g[..., 0].max() < 64 and g[..., 1].max() < 64
    ss = SlideWindowPatchSampler(num_pixels=(16, 16))
    g1 = ss.sample(64, 64)
    g2 = ss.sample(64, 64)
    assert not np.allclose(g1, g2)  # window slides


def test_emernerf_field():
    from neuralsim_tpu.fields.emernerf import EmerNeRFField
    from neuralsim_tpu.fields import AABBSpace
    f = EmerNeRFField(AABBSpace((-1, -1, -1), (1, 1, 1)),
                      static_encoding_cfg={"n_levels": 2, "base_res": 4,
                                           "max_res": 16, "log2_hashmap_size": 8},
                      dynamic_permuto_cfg={"n_levels": 2, "base_res": 4.0,
                                           "max_res": 16.0,
                                           "log2_hashmap_size": 8},
                      geo_feat_dim=4, decoder_hidden=8, radiance_hidden=8)
    p = f.init(jax.random.PRNGKey(0))
    ro = jnp.asarray([[2.0, 0.0, 0.0]])
    rd = jnp.asarray([[-1.0, 0.0, 0.0]])
    buf = f.ray_query(p, ro, rd, key=None, cond=jnp.asarray([[0.3]]),
                      num_coarse=16, perturb=False)
    assert buf["alpha"].shape == (1, 16)
    assert "dynamic_ratio" in buf and "flow_fwd" in buf
    res = f.flow_cycle_residual(p, jnp.zeros((4, 3)), jnp.full((4,), 0.5))
    assert jnp.isfinite(res).all()


def test_gather_cols_custom_vjp():
    from neuralsim_tpu.ops.gather import gather_cols
    tbl = jax.random.normal(jax.random.PRNGKey(0), (3, 64))
    rows = jax.random.randint(jax.random.PRNGKey(1), (500,), 0, 64)
    w = jax.random.normal(jax.random.PRNGKey(2), (3, 500))
    g1 = jax.grad(lambda t: jnp.sum(gather_cols(t, rows) * w))(tbl)
    g2 = jax.grad(lambda t: jnp.sum(jnp.take(t, rows, axis=1) * w))(tbl)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5,
                               atol=1e-5)


def test_sdf_slice_image():
    from neuralsim_tpu.tools.visualize_slice import sdf_slice_image
    img = sdf_slice_image(lambda p: np.linalg.norm(p, axis=-1) - 0.5,
                          (-1, -1, -1), (1, 1, 1), axis=2, coord=0.0, res=64)
    assert img.shape == (64, 64, 3)
    # center is inside (blue-ish), corner outside (red-ish)
    assert img[32, 32, 2] > img[32, 32, 0]
    assert img[0, 0, 0] > img[0, 0, 2]


def test_visible_grid():
    from neuralsim_tpu.models.misc_assets import VisibleGrid
    vg = VisibleGrid((-1, -1, -1), (1, 1, 1), resolution=16)
    ro = np.zeros((10, 3))
    rd = np.tile([[1.0, 0, 0]], (10, 1))
    vg.add_depth_points(ro, rd, np.full(10, 0.5))
    assert vg.grid.sum() >= 1
    n0 = vg.grid.sum()
    vg.dilate(1)
    assert vg.grid.sum() > n0


def test_lidar_filter_in_cams():
    """filter_in_cams keeps only beams whose hit points project into a
    camera viewport (reference base_loader.py:654-753)."""
    from neuralsim_tpu.dataio.dataloader import SceneDataLoader
    from neuralsim_tpu.dataio.synthetic_scene import SyntheticSceneDataset
    from neuralsim_tpu.scene import Scene
    ds = SyntheticSceneDataset(n_frames=2, H=24, W=24, with_lidar=True)
    scene = Scene.load_from_scenario(ds.get_scenario("synthetic_object"))
    plain = SceneDataLoader(scene, ds, with_lidar=True)
    filt = SceneDataLoader(scene, ds, with_lidar=True,
                           filter_lidar_in_cams=True)
    lid = plain.lidar_ids[0]
    n_plain = plain.lidars[(lid, 0)]["ranges"].shape[0]
    n_filt = filt.lidars[(lid, 0)]["ranges"].shape[0]
    # lidar reuses camera rays here, but zero-range beams are dropped and
    # everything kept must project into the camera
    assert 0 < n_filt <= n_plain
    # max-range filter composes
    short = SceneDataLoader(scene, ds, with_lidar=True,
                            filter_lidar_max_range=2.0)
    assert short.lidars[(lid, 0)]["ranges"].size > 0
    assert short.lidars[(lid, 0)]["ranges"].max() <= 2.0


def test_visible_grid_morphology_and_roundtrip(tmp_path):
    """Reference postprocess semantics (app/visible_grid.py:217-232):
    close = 26-dilate then 26-erode with originals kept; close2 goes one
    ring further; hit counts survive a save/load roundtrip."""
    from neuralsim_tpu.models.misc_assets import VisibleGrid
    vg = VisibleGrid((-1, -1, -1), (1, 1, 1), resolution=16)
    # two isolated voxels one gap apart: closing must bridge the gap
    pts = np.array([[0.0, 0.0, 0.0], [0.25, 0.0, 0.0],
                    [0.0, 0.0, 0.0]])  # duplicate -> hits=2
    vg.add_points(pts)
    assert vg.hits.max() == 2
    original = vg.grid.copy()
    vg.postprocess("close")
    # originals always survive a close
    assert (vg.grid & original).sum() == original.sum()
    # dilation reaches strictly more voxels than close
    vg2 = VisibleGrid((-1, -1, -1), (1, 1, 1), resolution=16)
    vg2.add_points(pts)
    vg2.postprocess("dilation")
    assert vg2.grid.sum() >= vg.grid.sum()
    # close2 keeps originals too and is at least as large as close
    vg3 = VisibleGrid((-1, -1, -1), (1, 1, 1), resolution=16)
    vg3.add_points(pts)
    vg3.postprocess("close2")
    assert (vg3.grid & original).sum() == original.sum()
    with pytest.raises(ValueError):
        vg.postprocess("open")

    # roundtrip + occ-state export + containment
    p = str(tmp_path / "vg.npz")
    vg.save(p)
    back = VisibleGrid.load(p)
    assert (back.grid == vg.grid).all()
    assert back.hits.max() == 2
    st = back.to_occ_state()
    assert bool(st.mask.sum()) and st.val.shape == (16, 16, 16)
    assert back.contains(np.array([[0.0, 0.0, 0.0]]))[0]
    assert not back.contains(np.array([[5.0, 0.0, 0.0]]))[0]
    mins, maxs = back.voxel_aabbs()
    assert (maxs > mins).all()


def test_extract_visible_grid_cli(tmp_path):
    """Drive tools/extract_visible_grid.py end-to-end on GT LiDAR returns
    (reference code_multi/tools/extract_visible_grid.py flow)."""
    from neuralsim_tpu.tools.extract_visible_grid import main_function
    cfg = {
        "exp_dir": str(tmp_path),
        "dataset_cfg": {
            "target": "neuralsim_tpu.dataio.synthetic_scene.SyntheticSceneDataset",
            "params": {"n_frames": 2, "H": 24, "W": 24, "radius": 2.0,
                       "with_lidar": True},
        },
        "scenebank_cfg": {"scenarios": ["synthetic_object"]},
        "assetbank_cfg": {
            "Main": {
                "model_class": "neuralsim_tpu.models.assets.LoTDNeuSObj",
                "model_params": {
                    "extent": 1.0,
                    "encoding_cfg": {"n_levels": 2, "base_res": 8,
                                     "max_res": 16, "n_feats": 2,
                                     "log2_hashmap_size": 8},
                    "geo_feat_dim": 4, "decoder_hidden": 8,
                    "radiance_hidden": 8},
                "asset_params": {"training_cfg": {"lr": 0.01}},
            },
        },
        "renderer": {"cr_class": "Main"},
        "training": {"with_lidar": True, "num_iters": 0, "n_rays": 32,
                     "losses": {"rgb": {"w": 1.0}}},
        "grid": {"source": "lidar_gt", "res": 32, "morphology": "close"},
    }
    out = main_function(cfg)
    assert os.path.exists(out)
    from neuralsim_tpu.models.misc_assets import VisibleGrid
    vg = VisibleGrid.load(out)
    assert vg.grid.sum() > 0


def test_scene_flow_to_rgb():
    from neuralsim_tpu.utils.logger import scene_flow_to_rgb
    import numpy as np
    # zero flow -> white (sat 0, value 1)
    z = scene_flow_to_rgb(np.zeros((4, 4, 3)), flow_max_radius=0.5)
    assert z.shape == (4, 4, 3)
    np.testing.assert_allclose(z, 1.0, atol=1e-6)
    # +x flow at full radius -> pure hue 0 (red), saturated
    f = np.zeros((1, 3)); f[0, 0] = 0.5
    c = scene_flow_to_rgb(f, flow_max_radius=0.5)[0]
    np.testing.assert_allclose(c, [1.0, 0.0, 0.0], atol=1e-5)
    # opposite directions -> different colors; all values in [0,1]
    g = np.zeros((1, 3)); g[0, 0] = -0.5
    c2 = scene_flow_to_rgb(g, flow_max_radius=0.5)[0]
    assert np.abs(c - c2).max() > 0.5
    r = np.random.default_rng(0).normal(size=(8, 8, 3))
    out = scene_flow_to_rgb(r)
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_depth_fill_in_fast():
    from neuralsim_tpu.maths import depth_fill_in_fast
    import numpy as np
    rng = np.random.default_rng(0)
    H, W = 32, 40
    gt = 5.0 + 2.0 * np.sin(np.linspace(0, 3, H))[:, None] \
        + 0.5 * np.cos(np.linspace(0, 2, W))[None, :]
    sparse = np.zeros((H, W), np.float32)
    ys = rng.integers(0, H, 200); xs = rng.integers(0, W, 200)
    sparse[ys, xs] = gt[ys, xs]
    dense = depth_fill_in_fast(sparse, max_depth=20.0)
    # densification: many more valid pixels than the input
    assert (dense > 0.1).sum() > 3 * (sparse > 0.1).sum()
    # filled values stay close to the smooth GT surface where defined
    m = dense > 0.1
    err = np.abs(dense[m] - gt[m])
    assert np.median(err) < 0.5, float(np.median(err))
    # no invented depths beyond the input range
    assert dense.max() <= sparse.max() + 1e-3
