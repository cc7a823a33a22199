// Native pixel pipeline for the host data loader.
//
// The reference's preprocessing runs through PIL + torchvision transform
// objects with an intermediate allocation per stage
// (/root/reference/stylex/stylex_train.py:531-539). Here the hot path after
// JPEG/PNG decode — antialiased resize, center crop, uint8 -> float32
// normalisation — is one fused C++ pass writing straight into the
// preallocated batch buffer the TPU transfer reads from.
//
// The resize implements the same separable triangle (bilinear) filter with
// ratio-scaled support that PIL uses for Image.resize(..., BILINEAR), so
// outputs match the PIL path to quantisation error.
//
// Exposed via a C ABI for ctypes; no Python.h dependency.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct FilterWeights {
  // For each output pixel: first source index and a span of weights.
  std::vector<int> first;
  std::vector<int> count;
  std::vector<float> weights;  // ragged, max_count stride
  int max_count = 0;
};

// Triangle filter with antialiasing support (support = max(1, in/out)),
// matching PIL's precompute_coeffs for BILINEAR.
FilterWeights triangle_weights(int in_size, int out_size) {
  FilterWeights fw;
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = std::max(scale, 1.0);
  const double support = 1.0 * filterscale;
  const int max_count = static_cast<int>(std::ceil(support) * 2 + 1);
  fw.first.resize(out_size);
  fw.count.resize(out_size);
  fw.weights.assign(static_cast<size_t>(out_size) * max_count, 0.0f);
  fw.max_count = max_count;
  for (int xx = 0; xx < out_size; ++xx) {
    const double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    double total = 0.0;
    std::vector<double> w(xmax - xmin);
    for (int x = xmin; x < xmax; ++x) {
      double t = (x - center + 0.5) / filterscale;
      double v = 1.0 - std::abs(t);
      if (v < 0.0) v = 0.0;
      w[x - xmin] = v;
      total += v;
    }
    fw.first[xx] = xmin;
    fw.count[xx] = xmax - xmin;
    for (int i = 0; i < xmax - xmin; ++i) {
      fw.weights[static_cast<size_t>(xx) * max_count + i] =
          total > 0.0 ? static_cast<float>(w[i] / total) : 0.0f;
    }
  }
  return fw;
}

}  // namespace

extern "C" {

// Fused: antialiased resize (in_h, in_w, ch; uint8) -> (out_h, out_w),
// then center-crop to (crop, crop), then normalise to [0,1] float32 with
// optional per-channel (mean, std). dst must hold crop*crop*ch floats.
// hflip mirrors horizontally. Returns 0 on success.
int resize_crop_normalize_u8(
    const uint8_t* src, int in_h, int in_w, int ch,
    int out_h, int out_w, int crop_h, int crop_w,
    const float* mean, const float* stddev, int hflip,
    float* dst) {
  if (crop_h > out_h || crop_w > out_w || ch <= 0 || ch > 8) return 1;

  const FilterWeights wy = triangle_weights(in_h, out_h);
  const FilterWeights wx = triangle_weights(in_w, out_w);

  const int y0 = (out_h - crop_h) / 2;
  const int x0 = (out_w - crop_w) / 2;

  // horizontal pass over the rows the vertical pass needs
  // rows needed: union of spans for output rows [y0, y0+crop_h)
  int row_lo = in_h, row_hi = 0;
  for (int oy = y0; oy < y0 + crop_h; ++oy) {
    row_lo = std::min(row_lo, wy.first[oy]);
    row_hi = std::max(row_hi, wy.first[oy] + wy.count[oy]);
  }
  const int n_rows = row_hi - row_lo;
  std::vector<float> hpass(static_cast<size_t>(n_rows) * crop_w * ch);

  for (int y = 0; y < n_rows; ++y) {
    const uint8_t* srow = src + static_cast<size_t>(row_lo + y) * in_w * ch;
    float* drow = hpass.data() + static_cast<size_t>(y) * crop_w * ch;
    for (int ox = 0; ox < crop_w; ++ox) {
      const int sx = hflip ? (x0 + crop_w - 1 - ox) : (x0 + ox);
      const int first = wx.first[sx];
      const int count = wx.count[sx];
      const float* w = &wx.weights[static_cast<size_t>(sx) * wx.max_count];
      for (int c = 0; c < ch; ++c) {
        float acc = 0.0f;
        for (int i = 0; i < count; ++i) {
          acc += w[i] * srow[(first + i) * ch + c];
        }
        drow[ox * ch + c] = acc;
      }
    }
  }

  // vertical pass + normalisation
  const float inv255 = 1.0f / 255.0f;
  for (int oy = 0; oy < crop_h; ++oy) {
    const int sy = y0 + oy;
    const int first = wy.first[sy] - row_lo;
    const int count = wy.count[sy];
    const float* w = &wy.weights[static_cast<size_t>(sy) * wy.max_count];
    float* drow = dst + static_cast<size_t>(oy) * crop_w * ch;
    for (int ox = 0; ox < crop_w; ++ox) {
      for (int c = 0; c < ch; ++c) {
        float acc = 0.0f;
        for (int i = 0; i < count; ++i) {
          acc += w[i] * hpass[(static_cast<size_t>(first + i) * crop_w + ox) * ch + c];
        }
        // PIL rounds to uint8 between resize and ToTensor; replicate.
        float v = std::min(std::max(acc, 0.0f), 255.0f);
        v = std::nearbyint(v) * inv255;
        if (mean != nullptr && stddev != nullptr) {
          v = (v - mean[c]) / stddev[c];
        }
        drow[ox * ch + c] = v;
      }
    }
  }
  return 0;
}

// Plain uint8 HWC -> float32 [0,1] with optional normalisation and hflip.
int normalize_u8(const uint8_t* src, int h, int w, int ch,
                 const float* mean, const float* stddev, int hflip, float* dst) {
  const float inv255 = 1.0f / 255.0f;
  for (int y = 0; y < h; ++y) {
    const uint8_t* srow = src + static_cast<size_t>(y) * w * ch;
    float* drow = dst + static_cast<size_t>(y) * w * ch;
    for (int x = 0; x < w; ++x) {
      const int sx = hflip ? (w - 1 - x) : x;
      for (int c = 0; c < ch; ++c) {
        float v = srow[sx * ch + c] * inv255;
        if (mean != nullptr && stddev != nullptr) v = (v - mean[c]) / stddev[c];
        drow[x * ch + c] = v;
      }
    }
  }
  return 0;
}

}  // extern "C"
