// Native host-side data plumbing for neuralsim_tpu.
//
// The reference framework keeps a >24 GiB host-RAM image/LiDAR cache and
// assembles per-iteration ray batches from it (SceneDataLoader +
// PixelDataset — SURVEY.md §2.5; reference base_loader.py / pixel_loader.py).
// Python-side fancy-indexing of that cache costs milliseconds per batch and
// runs on one core; at TPU step times of a few ms the host becomes the
// bottleneck. This library does the hot batch-assembly loops in C++ with
// OpenMP threads over a zero-copy view of the numpy cache.
//
// Exposed C ABI (ctypes-friendly):
//   ns_sample_pixels   — uniform (frame, pixel) batch gather with GT
//   ns_sample_pixels_weighted — CDF importance-sampled (frame,cell) batch
//   ns_splat_error_map — EMA error-map splat (importance-sampling update)
//   ns_gather_rays     — gather precomputed per-frame ray grids
//
// Build: see native/build.sh (g++ -O3 -march=native -fopenmp -shared -fPIC).
#include <atomic>
#include <cstdint>
#include <cstring>
#include <cmath>
#include <random>

extern "C" {

// xorshift128+ per-thread RNG: reproducible given (seed, index)
static inline uint64_t splitmix64(uint64_t x) {
  x += 0x9E3779B97f4A7C15ull;
  x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ull;
  x = (x ^ (x >> 27)) * 0x94D049BB133111EBull;
  return x ^ (x >> 31);
}

// Sample n uniform (frame, y, x) triplets and gather rgb (+mask) from the
// cache laid out [n_frames, H, W, 3] float32 (C-contiguous) / [n_frames,H,W].
void ns_sample_pixels(const float* images, const float* masks,
                      int64_t n_frames, int64_t H, int64_t W,
                      int64_t n_rays, uint64_t seed,
                      int32_t* out_fidx, int32_t* out_xy,
                      float* out_rgb, float* out_mask) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n_rays; ++i) {
    uint64_t r = splitmix64(seed ^ (uint64_t)i);
    int64_t fi = (int64_t)(r % (uint64_t)n_frames);
    r = splitmix64(r);
    int64_t y = (int64_t)(r % (uint64_t)H);
    r = splitmix64(r);
    int64_t x = (int64_t)(r % (uint64_t)W);
    out_fidx[i] = (int32_t)fi;
    out_xy[2 * i + 0] = (int32_t)x;
    out_xy[2 * i + 1] = (int32_t)y;
    const float* px = images + ((fi * H + y) * W + x) * 3;
    out_rgb[3 * i + 0] = px[0];
    out_rgb[3 * i + 1] = px[1];
    out_rgb[3 * i + 2] = px[2];
    if (masks && out_mask)
      out_mask[i] = masks[(fi * H + y) * W + x];
  }
}

// Importance sampling: draw n (frame, cell) pairs from a flat CDF over the
// error map [n_frames * mh * mw], then jitter to full-res pixels.
void ns_sample_pixels_weighted(const float* images, const float* masks,
                               const double* cdf,  // [n_frames*mh*mw] inclusive
                               int64_t n_frames, int64_t H, int64_t W,
                               int64_t mh, int64_t mw,
                               int64_t n_rays, uint64_t seed,
                               int32_t* out_fidx, int32_t* out_xy,
                               float* out_rgb, float* out_mask) {
  const int64_t cells = n_frames * mh * mw;
  const double total = cdf[cells - 1];
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n_rays; ++i) {
    uint64_t r = splitmix64(seed ^ (uint64_t)(i * 2654435761ull));
    double u = (double)(r >> 11) * (1.0 / 9007199254740992.0) * total;
    // binary search the CDF
    int64_t lo = 0, hi = cells - 1;
    while (lo < hi) {
      int64_t mid = (lo + hi) >> 1;
      if (cdf[mid] < u) lo = mid + 1; else hi = mid;
    }
    int64_t fi = lo / (mh * mw);
    int64_t cell = lo % (mh * mw);
    int64_t cy = cell / mw, cx = cell % mw;
    r = splitmix64(r);
    int64_t y = cy * H / mh + (int64_t)(r % (uint64_t)(H / mh > 0 ? H / mh : 1));
    r = splitmix64(r);
    int64_t x = cx * W / mw + (int64_t)(r % (uint64_t)(W / mw > 0 ? W / mw : 1));
    if (y >= H) y = H - 1;
    if (x >= W) x = W - 1;
    out_fidx[i] = (int32_t)fi;
    out_xy[2 * i + 0] = (int32_t)x;
    out_xy[2 * i + 1] = (int32_t)y;
    const float* px = images + ((fi * H + y) * W + x) * 3;
    out_rgb[3 * i + 0] = px[0];
    out_rgb[3 * i + 1] = px[1];
    out_rgb[3 * i + 2] = px[2];
    if (masks && out_mask)
      out_mask[i] = masks[(fi * H + y) * W + x];
  }
}

// EMA splat of per-ray errors into the error map [n_frames, mh, mw] float64.
void ns_splat_error_map(double* error_map, int64_t n_frames, int64_t mh,
                        int64_t mw, const int32_t* fidx, const int32_t* xy,
                        const float* err, int64_t n, int64_t H, int64_t W,
                        double ema) {
  // serial: n is a few thousand; atomics not worth it
  for (int64_t i = 0; i < n; ++i) {
    int64_t cy = (int64_t)xy[2 * i + 1] * mh / H;
    int64_t cx = (int64_t)xy[2 * i + 0] * mw / W;
    if (cy >= mh) cy = mh - 1;
    if (cx >= mw) cx = mw - 1;
    double* cell = error_map + (fidx[i] * mh + cy) * mw + cx;
    *cell = ema * (*cell) + (1.0 - ema) * (double)err[i];
  }
}

// Gather rays from precomputed per-frame ray grids [n_frames, H, W, 3].
void ns_gather_rays(const float* rays_o, const float* rays_d,
                    const int32_t* fidx, const int32_t* xy, int64_t n,
                    int64_t H, int64_t W, float* out_o, float* out_d) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    int64_t base = (((int64_t)fidx[i] * H + xy[2 * i + 1]) * W + xy[2 * i]) * 3;
    std::memcpy(out_o + 3 * i, rays_o + base, 3 * sizeof(float));
    std::memcpy(out_d + 3 * i, rays_d + base, 3 * sizeof(float));
  }
}

int ns_version() { return 1; }

}  // extern "C"
