// golden.cpp — bit-exact INT8 golden models (native host runtime).
//
// Same numerical contract as resnet_accel_tpu/golden (and the reference's
// hw/sim/cpp/src/golden_models.cpp semantics): int8 x int8 -> int32
// accumulation, float32 round-half-even requantization, saturating casts,
// C-truncation average pooling.  Cross-checked bit-for-bit against the
// Python goldens in tests/test_native.py.

#include <algorithm>
#include <cfenv>
#include <cmath>
#include <cstring>
#include <vector>

#include "rat_native.h"

extern "C" {

void rat_matmul_int8(const int8_t* a, const int8_t* b, int32_t* c,
                     int64_t m, int64_t k, int64_t n) {
  for (int64_t i = 0; i < m; ++i) {
    for (int64_t j = 0; j < n; ++j) {
      int32_t acc = 0;
      for (int64_t kk = 0; kk < k; ++kk) {
        acc += static_cast<int32_t>(a[i * k + kk]) *
               static_cast<int32_t>(b[kk * n + j]);
      }
      c[i * n + j] = acc;
    }
  }
}

void rat_bsr_matmul_int8(const int8_t* a, const int8_t* blocks,
                         const int32_t* row_ptr, const int32_t* col_idx,
                         int32_t* c, int64_t m, int64_t k, int64_t n,
                         int64_t bh, int64_t bw, int64_t num_block_rows) {
  for (int64_t br = 0; br < num_block_rows; ++br) {
    for (int32_t idx = row_ptr[br]; idx < row_ptr[br + 1]; ++idx) {
      const int64_t bc = col_idx[idx];
      const int8_t* block = blocks + static_cast<int64_t>(idx) * bh * bw;
      for (int64_t mm = 0; mm < m; ++mm) {
        for (int64_t j = 0; j < bw; ++j) {
          const int64_t col = bc * bw + j;
          if (col >= n) continue;
          int32_t acc = 0;
          for (int64_t i = 0; i < bh; ++i) {
            const int64_t kk = br * bh + i;
            if (kk >= k) continue;
            acc += static_cast<int32_t>(a[mm * k + kk]) *
                   static_cast<int32_t>(block[i * bw + j]);
          }
          c[mm * n + col] += acc;
        }
      }
    }
  }
}

void rat_bsr_matmul_int8_wt(const int8_t* a, const int8_t* blocks,
                            const int32_t* row_ptr,
                            const int32_t* col_idx, int32_t* c,
                            int64_t m, int64_t k, int64_t n_out,
                            int64_t bh, int64_t bw,
                            int64_t num_block_rows) {
  for (int64_t br = 0; br < num_block_rows; ++br) {
    for (int32_t idx = row_ptr[br]; idx < row_ptr[br + 1]; ++idx) {
      const int64_t bc = col_idx[idx];
      const int8_t* block = blocks + static_cast<int64_t>(idx) * bh * bw;
      for (int64_t mm = 0; mm < m; ++mm) {
        for (int64_t hh = 0; hh < bh; ++hh) {
          const int64_t row = br * bh + hh;
          if (row >= n_out) continue;
          int32_t acc = 0;
          for (int64_t ww = 0; ww < bw; ++ww) {
            const int64_t kk = bc * bw + ww;
            if (kk >= k) continue;
            acc += static_cast<int32_t>(a[mm * k + kk]) *
                   static_cast<int32_t>(block[hh * bw + ww]);
          }
          c[mm * n_out + row] += acc;
        }
      }
    }
  }
}

void rat_relu_int8(int8_t* data, int64_t size) {
  for (int64_t i = 0; i < size; ++i)
    if (data[i] < 0) data[i] = 0;
}

void rat_relu_int32(int32_t* data, int64_t size) {
  for (int64_t i = 0; i < size; ++i)
    if (data[i] < 0) data[i] = 0;
}

void rat_relu6_int8(int8_t* data, int64_t size, float scale) {
  const int8_t max_val = static_cast<int8_t>(6.0f / scale);
  for (int64_t i = 0; i < size; ++i) {
    if (data[i] < 0) data[i] = 0;
    if (data[i] > max_val) data[i] = max_val;
  }
}

static inline int8_t saturate_i8(int32_t v) {
  if (v > 127) return 127;
  if (v < -128) return -128;
  return static_cast<int8_t>(v);
}

void rat_requantize_int32_to_int8(const int32_t* in, int8_t* out,
                                  int64_t size, float in_scale,
                                  float out_scale) {
  std::fesetround(FE_TONEAREST);
  const float factor = in_scale / out_scale;
  for (int64_t i = 0; i < size; ++i) {
    const float scaled = static_cast<float>(in[i]) * factor;
    out[i] = saturate_i8(static_cast<int32_t>(std::nearbyintf(scaled)));
  }
}

void rat_requantize_q16(const int32_t* in, int8_t* out, int64_t size,
                        uint32_t scale_q16, int relu) {
  // Bit-exact model of output_accumulator.sv quantize_relu: the RTL
  // multiplies by the zero-extended LOW 16 bits of the Q16.16 register
  // only, with a 64-bit product and arithmetic right shift.
  const int64_t frac = static_cast<int64_t>(scale_q16 & 0xFFFFu);
  for (int64_t i = 0; i < size; ++i) {
    int64_t v = in[i];
    if (relu && v < 0) v = 0;
    const int64_t scaled = (v * frac) >> 16;
    if (scaled > 127) {
      out[i] = 127;
    } else if (scaled < -128) {
      out[i] = -128;
    } else {
      out[i] = static_cast<int8_t>(scaled);
    }
  }
}

void rat_requantize_per_channel(const int32_t* in, int8_t* out,
                                int64_t size, const float* factors,
                                int64_t channels, int64_t inner) {
  std::fesetround(FE_TONEAREST);
  for (int64_t i = 0; i < size; ++i) {
    const int64_t ch = (i / inner) % channels;
    const float scaled = static_cast<float>(in[i]) * factors[ch];
    out[i] = saturate_i8(static_cast<int32_t>(std::nearbyintf(scaled)));
  }
}

void rat_add_residual_int8(const int8_t* main_path, const int8_t* residual,
                           int8_t* out, int64_t size, float main_scale,
                           float residual_scale, float out_scale) {
  std::fesetround(FE_TONEAREST);
  for (int64_t i = 0; i < size; ++i) {
    const float sum = static_cast<float>(main_path[i]) * main_scale +
                      static_cast<float>(residual[i]) * residual_scale;
    out[i] =
        saturate_i8(static_cast<int32_t>(std::nearbyintf(sum / out_scale)));
  }
}

void rat_maxpool2d_int8(const int8_t* in, int8_t* out, int64_t c,
                        int64_t h, int64_t w, int64_t pool, int64_t stride,
                        int64_t padding) {
  const int64_t h_out = (h + 2 * padding - pool) / stride + 1;
  const int64_t w_out = (w + 2 * padding - pool) / stride + 1;
  for (int64_t ch = 0; ch < c; ++ch) {
    for (int64_t oh = 0; oh < h_out; ++oh) {
      for (int64_t ow = 0; ow < w_out; ++ow) {
        int8_t best = -128;
        for (int64_t ph = 0; ph < pool; ++ph) {
          for (int64_t pw = 0; pw < pool; ++pw) {
            const int64_t ih = oh * stride + ph - padding;
            const int64_t iw = ow * stride + pw - padding;
            if (ih < 0 || ih >= h || iw < 0 || iw >= w) continue;
            const int8_t v = in[ch * h * w + ih * w + iw];
            if (v > best) best = v;
          }
        }
        out[ch * h_out * w_out + oh * w_out + ow] = best;
      }
    }
  }
}

void rat_avgpool_global_int8(const int8_t* in, int8_t* out, int64_t c,
                             int64_t h, int64_t w) {
  const int64_t hw = h * w;
  for (int64_t ch = 0; ch < c; ++ch) {
    int64_t sum = 0;
    for (int64_t i = 0; i < hw; ++i) sum += in[ch * hw + i];
    // C truncating division (matters for negative sums).
    const int64_t avg = (sum + hw / 2) / hw;
    out[ch] = saturate_i8(static_cast<int32_t>(avg));
  }
}

void rat_im2col_int8(const int8_t* in, int8_t* cols, int64_t c, int64_t h,
                     int64_t w, int64_t kernel, int64_t stride,
                     int64_t padding) {
  const int64_t h_out = (h + 2 * padding - kernel) / stride + 1;
  const int64_t w_out = (w + 2 * padding - kernel) / stride + 1;
  const int64_t n_cols = h_out * w_out;
  int64_t col = 0;
  for (int64_t oh = 0; oh < h_out; ++oh) {
    for (int64_t ow = 0; ow < w_out; ++ow) {
      int64_t row = 0;
      for (int64_t ch = 0; ch < c; ++ch) {
        for (int64_t kh = 0; kh < kernel; ++kh) {
          for (int64_t kw = 0; kw < kernel; ++kw) {
            const int64_t ih = oh * stride + kh - padding;
            const int64_t iw = ow * stride + kw - padding;
            int8_t v = 0;
            if (ih >= 0 && ih < h && iw >= 0 && iw < w)
              v = in[ch * h * w + ih * w + iw];
            cols[row * n_cols + col] = v;
            ++row;
          }
        }
      }
      ++col;
    }
  }
}

void rat_conv2d_int8(const int8_t* in, const int8_t* weight,
                     const int32_t* bias, int32_t* out, int64_t c_in,
                     int64_t h, int64_t w, int64_t c_out, int64_t kernel,
                     int64_t stride, int64_t padding) {
  const int64_t h_out = (h + 2 * padding - kernel) / stride + 1;
  const int64_t w_out = (w + 2 * padding - kernel) / stride + 1;
  const int64_t patch = c_in * kernel * kernel;
  const int64_t n_cols = h_out * w_out;
  std::vector<int8_t> cols(patch * n_cols);
  rat_im2col_int8(in, cols.data(), c_in, h, w, kernel, stride, padding);
  rat_matmul_int8(weight, cols.data(), out, c_out, patch, n_cols);
  if (bias != nullptr) {
    for (int64_t co = 0; co < c_out; ++co)
      for (int64_t i = 0; i < n_cols; ++i) out[co * n_cols + i] += bias[co];
  }
}

}  // extern "C"
