// bsr_packer.cpp — dense <-> BSR packing + wire serializations.
//
// Native counterpart of resnet_accel_tpu/sparse (and the role of the
// reference's bsr_packer.hpp): partial-edge-block zero padding, CSR
// invariants, and the two wire formats (hardware stream + DMA image).

#include <cstring>
#include <new>

#include "rat_native.h"

namespace {

inline int64_t cdiv(int64_t a, int64_t b) { return (a + b - 1) / b; }

bool block_nonzero(const int8_t* dense, int64_t h, int64_t w, int64_t br,
                   int64_t bc, int64_t bh, int64_t bw) {
  const int64_t r0 = br * bh, c0 = bc * bw;
  for (int64_t r = r0; r < r0 + bh && r < h; ++r) {
    for (int64_t c = c0; c < c0 + bw && c < w; ++c) {
      if (dense[r * w + c] != 0) return true;
    }
  }
  return false;
}

}  // namespace

extern "C" {

int64_t rat_bsr_pack_count(const int8_t* dense, int64_t h, int64_t w,
                           int64_t bh, int64_t bw) {
  const int64_t nbr = cdiv(h, bh), nbc = cdiv(w, bw);
  int64_t nnz = 0;
  for (int64_t br = 0; br < nbr; ++br)
    for (int64_t bc = 0; bc < nbc; ++bc)
      if (block_nonzero(dense, h, w, br, bc, bh, bw)) ++nnz;
  return nnz;
}

int64_t rat_bsr_pack_fill(const int8_t* dense, int64_t h, int64_t w,
                          int64_t bh, int64_t bw, int8_t* blocks,
                          int32_t* row_ptr, int32_t* col_idx) {
  const int64_t nbr = cdiv(h, bh), nbc = cdiv(w, bw);
  int64_t nnz = 0;
  row_ptr[0] = 0;
  for (int64_t br = 0; br < nbr; ++br) {
    for (int64_t bc = 0; bc < nbc; ++bc) {
      if (!block_nonzero(dense, h, w, br, bc, bh, bw)) continue;
      int8_t* blk = blocks + nnz * bh * bw;
      // Copy with zero padding for edge blocks.
      for (int64_t r = 0; r < bh; ++r) {
        for (int64_t c = 0; c < bw; ++c) {
          const int64_t gr = br * bh + r, gc = bc * bw + c;
          blk[r * bw + c] =
              (gr < h && gc < w) ? dense[gr * w + gc] : 0;
        }
      }
      col_idx[nnz] = static_cast<int32_t>(bc);
      ++nnz;
    }
    row_ptr[br + 1] = static_cast<int32_t>(nnz);
  }
  return nnz;
}

void rat_bsr_unpack(const int8_t* blocks, const int32_t* row_ptr,
                    const int32_t* col_idx, int8_t* dense,
                    int64_t num_block_rows, int64_t num_block_cols,
                    int64_t bh, int64_t bw) {
  const int64_t wp = num_block_cols * bw;
  std::memset(dense, 0, num_block_rows * bh * wp);
  for (int64_t br = 0; br < num_block_rows; ++br) {
    for (int32_t idx = row_ptr[br]; idx < row_ptr[br + 1]; ++idx) {
      const int64_t bc = col_idx[idx];
      const int8_t* blk = blocks + static_cast<int64_t>(idx) * bh * bw;
      for (int64_t r = 0; r < bh; ++r) {
        std::memcpy(dense + (br * bh + r) * wp + bc * bw, blk + r * bw,
                    bw);
      }
    }
  }
}

int64_t rat_bsr_serialize_hw_size(int64_t nnz, int64_t num_block_rows,
                                  int64_t bh, int64_t bw) {
  return 12 + (num_block_rows + 1) * 2 + nnz * 2 + nnz * bh * bw;
}

int64_t rat_bsr_serialize_hw(const int8_t* blocks, const int32_t* row_ptr,
                             const int32_t* col_idx, uint8_t* buf,
                             int64_t nnz, int64_t num_block_rows,
                             int64_t num_block_cols, int64_t bh,
                             int64_t bw) {
  if (row_ptr[num_block_rows] > 65535) return -1;  // u16 overflow
  for (int64_t i = 0; i < nnz; ++i)
    if (col_idx[i] > 65535) return -1;
  uint8_t* p = buf;
  const uint32_t header[3] = {static_cast<uint32_t>(nnz),
                              static_cast<uint32_t>(num_block_rows),
                              static_cast<uint32_t>(num_block_cols)};
  std::memcpy(p, header, 12);
  p += 12;
  for (int64_t i = 0; i <= num_block_rows; ++i) {
    const uint16_t v = static_cast<uint16_t>(row_ptr[i]);
    std::memcpy(p, &v, 2);
    p += 2;
  }
  for (int64_t i = 0; i < nnz; ++i) {
    const uint16_t v = static_cast<uint16_t>(col_idx[i]);
    std::memcpy(p, &v, 2);
    p += 2;
  }
  std::memcpy(p, blocks, nnz * bh * bw);
  p += nnz * bh * bw;
  return p - buf;
}

int64_t rat_bsr_pack_dma_size(int64_t nnz, int64_t num_block_rows,
                              int64_t bh, int64_t bw) {
  return (num_block_rows + 1) * 4 + nnz * 2 + nnz * bh * bw;
}

int64_t rat_bsr_pack_dma(const int8_t* blocks, const int32_t* row_ptr,
                         const int32_t* col_idx, uint8_t* buf,
                         int64_t nnz, int64_t num_block_rows, int64_t bh,
                         int64_t bw) {
  uint8_t* p = buf;
  for (int64_t i = 0; i <= num_block_rows; ++i) {
    const uint32_t v = static_cast<uint32_t>(row_ptr[i]);
    std::memcpy(p, &v, 4);
    p += 4;
  }
  for (int64_t i = 0; i < nnz; ++i) {
    const uint16_t v = static_cast<uint16_t>(col_idx[i]);
    std::memcpy(p, &v, 2);
    p += 2;
  }
  std::memcpy(p, blocks, nnz * bh * bw);
  p += nnz * bh * bw;
  return p - buf;
}

}  // extern "C"
