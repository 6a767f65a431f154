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

// ---------------------------------------------------------------------------
// resize_crop_u8: crop box + separable resize with PIL-equivalent adaptive-
// support cubic filter (a = -0.5; support scales with the downscale ratio,
// i.e. antialiased like PIL.Image.resize(..., BICUBIC)). One call covers
// both RandomResizedCrop (crop-then-resize) and Resize+CenterCrop (the crop
// region maps to an input box). RGB uint8 in/out.
// (reference transform load: dinov2/data/augmentations.py:19-118,
//  deit/augment.py:90-123 — torchvision RRC with the PIL backend)
// ---------------------------------------------------------------------------

static inline float cubic_filter(float x) {
  // Keys cubic, a = -0.5 (PIL's "bicubic")
  const float a = -0.5f;
  x = x < 0 ? -x : x;
  if (x < 1.0f) return ((a + 2.0f) * x - (a + 3.0f)) * x * x + 1.0f;
  if (x < 2.0f) return (((x - 5.0f) * x + 8.0f) * x - 4.0f) * a;
  return 0.0f;
}

// Precompute, for each of `out` output positions over input range
// [box0, box1), the first source index and normalized weights.
// bounds: [out] int32 start indices; weights: [out, kmax] floats.
static int precompute_taps(float box0, float box1, int64_t in_size,
                           int64_t out, int32_t* starts, float* weights,
                           int kmax) {
  const float scale = (box1 - box0) / (float)out;
  const float filterscale = scale < 1.0f ? 1.0f : scale;
  const float support = 2.0f * filterscale;
  const float inv_fs = 1.0f / filterscale;
  for (int64_t x = 0; x < out; ++x) {
    const float center = box0 + ((float)x + 0.5f) * scale;
    int64_t xmin = (int64_t)(center - support + 0.5f);
    if (xmin < 0) xmin = 0;
    int64_t xmax = (int64_t)(center + support + 0.5f);
    if (xmax > in_size) xmax = in_size;
    int k = (int)(xmax - xmin);
    if (k > kmax) k = kmax;
    float* w = weights + x * kmax;
    float ss = 0.0f;
    for (int j = 0; j < k; ++j) {
      w[j] = cubic_filter(((float)(xmin + j) - center + 0.5f) * inv_fs);
      ss += w[j];
    }
    if (ss != 0.0f) {
      for (int j = 0; j < k; ++j) w[j] /= ss;
    }
    for (int j = k; j < kmax; ++j) w[j] = 0.0f;
    starts[2 * x] = (int32_t)xmin;
    starts[2 * x + 1] = k;
  }
  return 0;
}

static inline uint8_t clamp_u8(float v) {
  v += 0.5f;  // round-half-up like PIL's fixed-point path
  if (v < 0.0f) return 0;
  if (v > 255.0f) return 255;
  return (uint8_t)v;
}

void resize_crop_u8(const uint8_t* in, int64_t ih, int64_t iw,
                    float by0, float bx0, float by1, float bx1,
                    uint8_t* out, int64_t oh, int64_t ow) {
  // tap count upper bound per axis
  const float sy = (by1 - by0) / (float)oh;
  const float sx = (bx1 - bx0) / (float)ow;
  const int kmax_y = (int)(2.0f * (sy < 1 ? 1 : sy) + 3.0f) * 2;
  const int kmax_x = (int)(2.0f * (sx < 1 ? 1 : sx) + 3.0f) * 2;

  int32_t* ys = new int32_t[2 * oh];
  float* wy = new float[oh * kmax_y];
  int32_t* xs = new int32_t[2 * ow];
  float* wx = new float[ow * kmax_x];
  precompute_taps(by0, by1, ih, oh, ys, wy, kmax_y);
  precompute_taps(bx0, bx1, iw, ow, xs, wx, kmax_x);

  // the vertical pass only needs the columns the horizontal taps read
  int64_t cx0 = iw, cx1 = 0;
  for (int64_t x = 0; x < ow; ++x) {
    if (xs[2 * x] < cx0) cx0 = xs[2 * x];
    if (xs[2 * x] + xs[2 * x + 1] > cx1) cx1 = xs[2 * x] + xs[2 * x + 1];
  }
  if (cx1 <= cx0) { cx0 = 0; cx1 = iw; }
  const int64_t cw = cx1 - cx0;

  // vertical pass into a float strip [oh, cw, 3], then horizontal
  float* strip = new float[oh * cw * 3];
  for (int64_t y = 0; y < oh; ++y) {
    const int32_t y0 = ys[2 * y];
    const int32_t ky = ys[2 * y + 1];
    const float* w = wy + y * kmax_y;
    float* dst = strip + y * cw * 3;
    for (int64_t i = 0; i < cw * 3; ++i) dst[i] = 0.0f;
    for (int j = 0; j < ky; ++j) {
      const uint8_t* src = in + ((int64_t)(y0 + j) * iw + cx0) * 3;
      const float wj = w[j];
      for (int64_t i = 0; i < cw * 3; ++i) dst[i] += wj * (float)src[i];
    }
  }
  for (int64_t y = 0; y < oh; ++y) {
    const float* row = strip + y * cw * 3;
    uint8_t* dst = out + y * ow * 3;
    for (int64_t x = 0; x < ow; ++x) {
      const int32_t x0 = xs[2 * x] - cx0;
      const int32_t kx = xs[2 * x + 1];
      const float* w = wx + x * kmax_x;
      float r = 0.0f, g = 0.0f, b = 0.0f;
      for (int j = 0; j < kx; ++j) {
        const float* px = row + (int64_t)(x0 + j) * 3;
        r += w[j] * px[0];
        g += w[j] * px[1];
        b += w[j] * px[2];
      }
      dst[3 * x + 0] = clamp_u8(r);
      dst[3 * x + 1] = clamp_u8(g);
      dst[3 * x + 2] = clamp_u8(b);
    }
  }
  delete[] ys; delete[] wy; delete[] xs; delete[] wx; delete[] strip;
}

// ---------------------------------------------------------------------------
// color_jitter_u8: torchvision/PIL ColorJitter semantics, sequential ops in
// caller-supplied order (torchvision shuffles the op order per sample).
// op codes: 0 brightness, 1 contrast, 2 saturation, 3 hue, -1 skip.
// Factors: enhance factor for 0-2; hue shift in [-0.5, 0.5] for 3 (applied
// as the uint8-HSV +int(dh*255) mod 256 shift, matching the PIL-path
// python implementation in data/transforms.py).
// ---------------------------------------------------------------------------

static inline uint8_t luma_u8(uint8_t r, uint8_t g, uint8_t b) {
  // PIL "L" conversion: (299R + 587G + 114B) / 1000, truncated
  return (uint8_t)((299 * (int)r + 587 * (int)g + 114 * (int)b) / 1000);
}

static void rgb_to_hsv_u8(uint8_t r, uint8_t g, uint8_t b, uint8_t* h,
                          uint8_t* s, uint8_t* v) {
  // PIL's RGB->HSV (ImagingConvert rgb2hsv_row): uint8 arithmetic
  uint8_t maxc = r > g ? (r > b ? r : b) : (g > b ? g : b);
  uint8_t minc = r < g ? (r < b ? r : b) : (g < b ? g : b);
  *v = maxc;
  if (minc == maxc) {
    *h = 0;
    *s = 0;
    return;
  }
  const int delta = (int)maxc - (int)minc;
  *s = (uint8_t)((255 * delta) / maxc);
  int hh;
  if (r == maxc) {
    hh = (int)g - (int)b;
    if (hh < 0) hh += 6 * delta;          // keep positive before division
  } else if (g == maxc) {
    hh = 2 * delta + (int)b - (int)r;
  } else {
    hh = 4 * delta + (int)r - (int)g;
  }
  // scale sector position (0..6*delta) to 0..255
  *h = (uint8_t)(((int64_t)hh * 255) / (6 * delta) & 0xff);
}

static void hsv_to_rgb_u8(uint8_t h, uint8_t s, uint8_t v, uint8_t* r,
                          uint8_t* g, uint8_t* b) {
  // PIL's HSV->RGB (hsv2rgb): float sector math, round-half-up
  if (s == 0) {
    *r = *g = *b = v;
    return;
  }
  float fh = (float)h / 255.0f * 6.0f;
  int i = (int)fh;
  float f = fh - (float)i;
  float fs = (float)s / 255.0f;
  float fv = (float)v;
  uint8_t p = (uint8_t)(fv * (1.0f - fs) + 0.5f);
  uint8_t q = (uint8_t)(fv * (1.0f - fs * f) + 0.5f);
  uint8_t t = (uint8_t)(fv * (1.0f - fs * (1.0f - f)) + 0.5f);
  switch (i % 6) {
    case 0: *r = v; *g = t; *b = p; break;
    case 1: *r = q; *g = v; *b = p; break;
    case 2: *r = p; *g = v; *b = t; break;
    case 3: *r = p; *g = q; *b = v; break;
    case 4: *r = t; *g = p; *b = v; break;
    default: *r = v; *g = p; *b = q; break;
  }
}

void color_jitter_u8(uint8_t* img, int64_t h, int64_t w, const int* ops,
                     const float* factors, int n_ops) {
  const int64_t n = h * w;
  for (int k = 0; k < n_ops; ++k) {
    const int op = ops[k];
    const float f = factors[k];
    if (op == 0) {  // brightness: blend with black
      for (int64_t i = 0; i < 3 * n; ++i)
        img[i] = clamp_u8((float)img[i] * f);
    } else if (op == 1) {  // contrast: blend with mean-of-L gray
      int64_t sum = 0;
      for (int64_t i = 0; i < n; ++i)
        sum += luma_u8(img[3 * i], img[3 * i + 1], img[3 * i + 2]);
      const float mean = (float)((int)((double)sum / (double)n + 0.5));
      for (int64_t i = 0; i < 3 * n; ++i)
        img[i] = clamp_u8(mean + ((float)img[i] - mean) * f);
    } else if (op == 2) {  // saturation: blend with per-pixel gray
      for (int64_t i = 0; i < n; ++i) {
        const float L =
            (float)luma_u8(img[3 * i], img[3 * i + 1], img[3 * i + 2]);
        for (int c = 0; c < 3; ++c) {
          const float vv = (float)img[3 * i + c];
          img[3 * i + c] = clamp_u8(L + (vv - L) * f);
        }
      }
    } else if (op == 3) {  // hue: uint8-HSV shift
      const int dh = (int)(f * 255.0f);
      for (int64_t i = 0; i < n; ++i) {
        uint8_t hh, ss, vv;
        rgb_to_hsv_u8(img[3 * i], img[3 * i + 1], img[3 * i + 2], &hh, &ss,
                      &vv);
        hh = (uint8_t)(((int)hh + dh) & 0xff);
        hsv_to_rgb_u8(hh, ss, vv, &img[3 * i], &img[3 * i + 1],
                      &img[3 * i + 2]);
      }
    }
  }
}

}  // extern "C"
