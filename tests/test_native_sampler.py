"""Native (C++/OpenMP) batch sampler: parity vs numpy fallback + perf sanity."""
import numpy as np
import pytest

from neuralsim_tpu.dataio.native_sampler import NativePixelSampler, load_native


@pytest.fixture(scope="module")
def cache():
    rng = np.random.default_rng(0)
    images = rng.random((4, 32, 48, 3)).astype(np.float32)
    masks = (rng.random((4, 32, 48)) > 0.5).astype(np.float32)
    return images, masks


def test_native_lib_loads():
    lib = load_native()
    assert lib is not None, "native/libnsbatch.so should be built (native/build.sh)"


def test_uniform_sampling_gathers_correct_pixels(cache):
    images, masks = cache
    s = NativePixelSampler(images, masks, seed=1)
    out = s.sample(4096)
    f = out["rays_fidx"]
    ys, xs = out["rays_sel"][:, 0], out["rays_sel"][:, 1]
    np.testing.assert_array_equal(out["image_rgb"], images[f, ys, xs])
    np.testing.assert_array_equal(out["image_occupancy_mask"], masks[f, ys, xs])
    # coverage: all frames hit, pixels spread
    assert set(np.unique(f)) == {0, 1, 2, 3}
    assert xs.max() < 48 and ys.max() < 32


def test_weighted_sampling_follows_error_map(cache):
    images, masks = cache
    s = NativePixelSampler(images, masks, seed=2)
    em = np.full((4, 8, 8), 1e-6)
    em[2, 0, 0] = 100.0  # all mass in frame 2, top-left cell
    out = s.sample(2000, error_map=em)
    assert (out["rays_fidx"] == 2).mean() > 0.95
    assert (out["rays_sel"][:, 1] < 48 / 8).mean() > 0.95


def test_error_splat(cache):
    images, masks = cache
    s = NativePixelSampler(images, masks, seed=3)
    em = np.zeros((4, 8, 8), np.float64)
    fidx = np.zeros(10, np.int32)
    xy = np.zeros((10, 2), np.int32)  # pixel (0,0) -> cell (0,0)
    err = np.full(10, 2.0, np.float32)
    s.splat_error(em, fidx, xy, err, ema=0.0)
    if load_native() is not None:
        assert em[0, 0, 0] == pytest.approx(2.0)


def test_determinism_same_seed(cache):
    images, masks = cache
    a = NativePixelSampler(images, masks, seed=7).sample(256)
    b = NativePixelSampler(images, masks, seed=7).sample(256)
    np.testing.assert_array_equal(a["rays_fidx"], b["rays_fidx"])
    np.testing.assert_array_equal(a["rays_sel"], b["rays_sel"])
