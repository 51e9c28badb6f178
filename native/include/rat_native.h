/* rat_native.h — C ABI for the resnet_accel_tpu native host runtime.
 *
 * TPU-host re-implementation of the reference's C++ stack
 * (hw/sim/cpp/include: golden_models.hpp, bsr_packer.hpp,
 * memory_manager.hpp, npy_loader.hpp).  The compute path of the
 * framework is JAX/XLA/Pallas; this library is the native host side:
 * bit-exact golden models for verification, the BSR packer/serializers
 * used at artifact-preparation time, im2col, and an aligned arena
 * allocator.  Exposed as a plain C ABI so Python binds via ctypes
 * (pybind11 is not available in this environment).
 */

#ifndef RAT_NATIVE_H_
#define RAT_NATIVE_H_

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* ---------------------------------------------------------------------
 * Golden models (semantics of golden_models.cpp; verified bit-exact
 * against the Python goldens in tests/test_native.py)
 * ------------------------------------------------------------------- */

/* C[M,N] = A[M,K] @ B[K,N], int8 x int8 -> int32. */
void rat_matmul_int8(const int8_t* a, const int8_t* b, int32_t* c,
                     int64_t m, int64_t k, int64_t n);

/* Sparse C[M,N] = A[M,K] @ B_bsr[K,N]; B blocks are [bh, bw] over
 * (K, N); edge blocks masked.  C must be pre-zeroed by the caller. */
void rat_bsr_matmul_int8(const int8_t* a, const int8_t* blocks,
                         const int32_t* row_ptr, const int32_t* col_idx,
                         int32_t* c, int64_t m, int64_t k, int64_t n,
                         int64_t bh, int64_t bw, int64_t num_block_rows);

/* Sparse C[M,N] = A[M,K] @ W^T; W[N,K] in BSR (artifact orientation). */
void rat_bsr_matmul_int8_wt(const int8_t* a, const int8_t* blocks,
                            const int32_t* row_ptr,
                            const int32_t* col_idx, int32_t* c,
                            int64_t m, int64_t k, int64_t n_out,
                            int64_t bh, int64_t bw,
                            int64_t num_block_rows);

void rat_relu_int8(int8_t* data, int64_t size);
void rat_relu_int32(int32_t* data, int64_t size);
void rat_relu6_int8(int8_t* data, int64_t size, float scale);

/* Round-half-to-even requantization with saturation. */
void rat_requantize_int32_to_int8(const int32_t* in, int8_t* out,
                                  int64_t size, float in_scale,
                                  float out_scale);

/* Hardware-exact Q16.16 requantization (output_accumulator.sv:397-426):
 * out = sat8((relu(acc) * (scale_q16 & 0xFFFF)) >> 16), 64-bit product,
 * arithmetic (floor) shift.  The RTL uses only the fraction bits of the
 * Q16.16 register. */
void rat_requantize_q16(const int32_t* in, int8_t* out, int64_t size,
                        uint32_t scale_q16, int relu);

/* Per-channel variant: factors[c] = in_scale[c]/out_scale precomputed;
 * channel = (i / inner) % channels for row-major layouts. */
void rat_requantize_per_channel(const int32_t* in, int8_t* out,
                                int64_t size, const float* factors,
                                int64_t channels, int64_t inner);

void rat_add_residual_int8(const int8_t* main_path,
                           const int8_t* residual, int8_t* out,
                           int64_t size, float main_scale,
                           float residual_scale, float out_scale);

/* CHW pooling. */
void rat_maxpool2d_int8(const int8_t* in, int8_t* out, int64_t c,
                        int64_t h, int64_t w, int64_t pool,
                        int64_t stride, int64_t padding);
void rat_avgpool_global_int8(const int8_t* in, int8_t* out, int64_t c,
                             int64_t h, int64_t w);

/* im2col: CHW int8 -> [C*K*K, H_out*W_out]. */
void rat_im2col_int8(const int8_t* in, int8_t* cols, int64_t c,
                     int64_t h, int64_t w, int64_t kernel,
                     int64_t stride, int64_t padding);

/* Direct conv: CHW in, OIHW weights, int32 bias (may be NULL). */
void rat_conv2d_int8(const int8_t* in, const int8_t* weight,
                     const int32_t* bias, int32_t* out, int64_t c_in,
                     int64_t h, int64_t w, int64_t c_out,
                     int64_t kernel, int64_t stride, int64_t padding);

/* ---------------------------------------------------------------------
 * BSR packer (bsr_packer.hpp parity)
 * ------------------------------------------------------------------- */

/* Count nonzero blocks of a dense [H, W] int8 matrix at (bh, bw). */
int64_t rat_bsr_pack_count(const int8_t* dense, int64_t h, int64_t w,
                           int64_t bh, int64_t bw);

/* Fill caller-allocated blocks [nnz, bh, bw], row_ptr [nbr+1],
 * col_idx [nnz] (sizes from rat_bsr_pack_count).  Edge blocks are
 * zero-padded.  Returns nnz actually written. */
int64_t rat_bsr_pack_fill(const int8_t* dense, int64_t h, int64_t w,
                          int64_t bh, int64_t bw, int8_t* blocks,
                          int32_t* row_ptr, int32_t* col_idx);

/* Reconstruct dense (padded) [nbr*bh, nbc*bw] from BSR. */
void rat_bsr_unpack(const int8_t* blocks, const int32_t* row_ptr,
                    const int32_t* col_idx, int8_t* dense,
                    int64_t num_block_rows, int64_t num_block_cols,
                    int64_t bh, int64_t bw);

/* Hardware stream serialization (bsr_packer.hpp:492-575):
 * [12B header: nnz,nbr,nbc u32 LE][row_ptr u16][col_idx u16][blocks i8].
 * Returns the byte size; rat_bsr_serialize_hw writes into buf. */
int64_t rat_bsr_serialize_hw_size(int64_t nnz, int64_t num_block_rows,
                                  int64_t bh, int64_t bw);
int64_t rat_bsr_serialize_hw(const int8_t* blocks, const int32_t* row_ptr,
                             const int32_t* col_idx, uint8_t* buf,
                             int64_t nnz, int64_t num_block_rows,
                             int64_t num_block_cols, int64_t bh,
                             int64_t bw);

/* DMA image (sw/host/memory.py pack_for_dma):
 * [row_ptr u32][col_idx u16][blocks i8]. */
int64_t rat_bsr_pack_dma_size(int64_t nnz, int64_t num_block_rows,
                              int64_t bh, int64_t bw);
int64_t rat_bsr_pack_dma(const int8_t* blocks, const int32_t* row_ptr,
                         const int32_t* col_idx, uint8_t* buf,
                         int64_t nnz, int64_t num_block_rows, int64_t bh,
                         int64_t bw);

/* ---------------------------------------------------------------------
 * Arena allocator (memory_manager.hpp parity, host-side)
 * ------------------------------------------------------------------- */

typedef struct rat_arena rat_arena;

rat_arena* rat_arena_create(int64_t capacity_bytes);
/* Aligned bump allocation; returns NULL when exhausted. */
void* rat_arena_alloc(rat_arena* arena, int64_t size, int64_t align);
int64_t rat_arena_used(const rat_arena* arena);
int64_t rat_arena_capacity(const rat_arena* arena);
void rat_arena_reset(rat_arena* arena);
void rat_arena_destroy(rat_arena* arena);

/* ---------------------------------------------------------------------
 * Threaded batch loader (the host-side act_dma / ping-pong buffer role:
 * background workers gather, normalize and INT8-quantize batches into a
 * bounded ring so device dispatch never waits on host preprocessing)
 * ------------------------------------------------------------------- */

typedef struct rat_loader rat_loader;

/* images: [n, item_len] uint8, channel-major (CHW flattened); labels:
 * [n] int32 (may be NULL).  Per batch j, workers produce
 *   out[i] = clip(rint(((u8/255) - mean[c]) / std[c] / quant_scale))
 * as int8, c = channel of element i (item_len % channels == 0).
 * shuffle != 0 reshuffles deterministically every epoch from seed.
 * depth = ring slots (>= 2 for overlap); n_threads >= 1.
 * The loader keeps its own copy of images/labels/mean/std. */
rat_loader* rat_loader_create(const uint8_t* images, int64_t n,
                              int64_t item_len, const int32_t* labels,
                              int64_t batch, int64_t channels,
                              const float* mean, const float* std_dev,
                              float quant_scale, int shuffle,
                              uint64_t seed, int n_threads, int depth);

/* Blocking: copy the next batch (in sequence order) into out_images
 * [batch, item_len] int8 and out_labels [batch] int32 (may be NULL).
 * Returns the batch's sequence number (0, 1, 2, ...). */
int64_t rat_loader_next(rat_loader* ld, int8_t* out_images,
                        int32_t* out_labels);

int64_t rat_loader_batches_per_epoch(const rat_loader* ld);
void rat_loader_destroy(rat_loader* ld);

/* Library version / self test. */
const char* rat_version(void);
int rat_self_test(void);

#ifdef __cplusplus
} /* extern "C" */
#endif

#endif /* RAT_NATIVE_H_ */
