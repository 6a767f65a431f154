// octic_data: native host-side data-path kernels.
//
// The TPU input pipeline's last hop is CPU-bound Python/numpy work: casting
// decoded uint8 images to float32, normalizing, and packing the NHWC batch
// (plus the rot90/flip variants of the equivariance stress eval,
// reference: deit/datasets.py:119-132). These fused, OpenMP-parallel
// kernels replace that hop; exposed via ctypes (octic_vits_tpu/data/native.py)
// with a numpy fallback when the shared library is absent.
//
// Build:  make -C native   (g++ -O3 -march=native -fopenmp -shared -fPIC)

#include <cstdint>
#include <cstring>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// in:  [n, h, w, 3] uint8 (decoded RGB images, already resized/cropped)
// out: [n, h, w, 3] float32 normalized with per-channel mean/std
void normalize_batch_u8(const uint8_t* in, float* out, int64_t n, int64_t h,
                        int64_t w, const float* mean, const float* std_,
                        int nthreads) {
  const int64_t hw = h * w;
  const float inv255 = 1.0f / 255.0f;
  float scale[3], shift[3];
  for (int c = 0; c < 3; ++c) {
    scale[c] = inv255 / std_[c];
    shift[c] = -mean[c] / std_[c];
  }
#if defined(_OPENMP)
  if (nthreads > 0) omp_set_num_threads(nthreads);
#pragma omp parallel for schedule(static)
#endif
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* src = in + i * hw * 3;
    float* dst = out + i * hw * 3;
    for (int64_t p = 0; p < hw; ++p) {
      dst[3 * p + 0] = (float)src[3 * p + 0] * scale[0] + shift[0];
      dst[3 * p + 1] = (float)src[3 * p + 1] * scale[1] + shift[1];
      dst[3 * p + 2] = (float)src[3 * p + 2] * scale[2] + shift[2];
    }
  }
}

// Gather-pack: assemble a batch from scattered float32 HWC sample buffers.
// srcs: array of n pointers to [h, w, c] float32; out: [n, h, w, c]
void pack_batch_f32(const float** srcs, float* out, int64_t n, int64_t hwc,
                    int nthreads) {
#if defined(_OPENMP)
  if (nthreads > 0) omp_set_num_threads(nthreads);
#pragma omp parallel for schedule(static)
#endif
  for (int64_t i = 0; i < n; ++i) {
    std::memcpy(out + i * hwc, srcs[i], sizeof(float) * hwc);
  }
}

// rot90 (k times CCW over H,W) + optional horizontal flip, NHWC float32.
// Used by the --rot-eval / --flop-eval equivariance stress evals.
void rot90_flip_batch_f32(const float* in, float* out, int64_t n, int64_t h,
                          int64_t w, int64_t c, int k, int flip,
                          int nthreads) {
  k = ((k % 4) + 4) % 4;
#if defined(_OPENMP)
  if (nthreads > 0) omp_set_num_threads(nthreads);
#pragma omp parallel for schedule(static)
#endif
  for (int64_t i = 0; i < n; ++i) {
    const float* src = in + i * h * w * c;
    // rot90 output dims: k odd -> (w, h), k even -> (h, w)
    const int64_t oh = (k % 2) ? w : h;
    const int64_t ow = (k % 2) ? h : w;
    float* dst = out + i * h * w * c;
    for (int64_t y = 0; y < oh; ++y) {
      for (int64_t x = 0; x < ow; ++x) {
        // inverse-map output (y, x) to input coords for CCW rot90^k
        int64_t sy, sx;
        switch (k) {
          case 0: sy = y; sx = x; break;
          case 1: sy = x; sx = w - 1 - y; break;        // out[y][x] = in[x][W-1-y]
          case 2: sy = h - 1 - y; sx = w - 1 - x; break;
          default: sy = h - 1 - x; sx = y; break;       // k == 3
        }
        int64_t ox = flip ? (ow - 1 - x) : x;
        std::memcpy(dst + (y * ow + ox) * c, src + (sy * w + sx) * c,
                    sizeof(float) * c);
      }
    }
  }
}

}  // extern "C"
