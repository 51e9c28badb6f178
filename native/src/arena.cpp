// arena.cpp — aligned bump arena (memory_manager.hpp role, host-side).
//
// The reference carves DDR regions with explicit base addresses and
// alignment (memory_manager.hpp:55-62, DMABuffer RAII).  On the TPU host
// the device memory is managed by the runtime; what remains native is the
// staging-arena discipline for artifact preparation: one big aligned
// allocation, bump-allocated, reset between layers.  Includes version and
// a built-in self test (bsr_packer.hpp round-trip self-test parity).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "rat_native.h"

struct rat_arena {
  uint8_t* base;
  int64_t capacity;
  int64_t used;
};

extern "C" {

rat_arena* rat_arena_create(int64_t capacity_bytes) {
  if (capacity_bytes <= 0) return nullptr;
  auto* a = static_cast<rat_arena*>(std::malloc(sizeof(rat_arena)));
  if (!a) return nullptr;
  // 64-byte alignment: cache line / typical DMA burst alignment.
  a->base = static_cast<uint8_t*>(std::aligned_alloc(
      64, static_cast<size_t>((capacity_bytes + 63) / 64 * 64)));
  if (!a->base) {
    std::free(a);
    return nullptr;
  }
  a->capacity = capacity_bytes;
  a->used = 0;
  return a;
}

void* rat_arena_alloc(rat_arena* arena, int64_t size, int64_t align) {
  if (!arena || size <= 0 || align <= 0 || (align & (align - 1)) != 0)
    return nullptr;
  const int64_t start = (arena->used + align - 1) & ~(align - 1);
  if (start + size > arena->capacity) return nullptr;
  arena->used = start + size;
  return arena->base + start;
}

int64_t rat_arena_used(const rat_arena* arena) {
  return arena ? arena->used : 0;
}

int64_t rat_arena_capacity(const rat_arena* arena) {
  return arena ? arena->capacity : 0;
}

void rat_arena_reset(rat_arena* arena) {
  if (arena) arena->used = 0;
}

void rat_arena_destroy(rat_arena* arena) {
  if (arena) {
    std::free(arena->base);
    std::free(arena);
  }
}

const char* rat_version(void) { return "resnet_accel_tpu-native 0.1.0"; }

int rat_self_test(void) {
  // BSR pack/unpack round trip on a small known matrix.
  const int64_t h = 20, w = 30, bh = 8, bw = 8;
  std::vector<int8_t> dense(h * w, 0);
  for (int64_t i = 0; i < h; ++i) dense[i * w + (i % w)] = int8_t(i + 1);
  const int64_t nnz = rat_bsr_pack_count(dense.data(), h, w, bh, bw);
  if (nnz <= 0) return 1;
  const int64_t nbr = (h + bh - 1) / bh, nbc = (w + bw - 1) / bw;
  std::vector<int8_t> blocks(nnz * bh * bw);
  std::vector<int32_t> row_ptr(nbr + 1), col_idx(nnz);
  if (rat_bsr_pack_fill(dense.data(), h, w, bh, bw, blocks.data(),
                        row_ptr.data(), col_idx.data()) != nnz)
    return 2;
  std::vector<int8_t> back(nbr * bh * nbc * bw);
  rat_bsr_unpack(blocks.data(), row_ptr.data(), col_idx.data(),
                 back.data(), nbr, nbc, bh, bw);
  for (int64_t r = 0; r < h; ++r)
    for (int64_t c = 0; c < w; ++c)
      if (back[r * nbc * bw + c] != dense[r * w + c]) return 3;
  // Requantize banker's-rounding spot checks: 1*0.5 -> 0, 3*0.5 -> 2.
  const int32_t in[2] = {1, 3};
  int8_t out[2];
  rat_requantize_int32_to_int8(in, out, 2, 1.0f, 2.0f);
  if (out[0] != 0 || out[1] != 2) return 4;
  // Arena sanity.
  rat_arena* a = rat_arena_create(1024);
  if (!a) return 5;
  void* p1 = rat_arena_alloc(a, 100, 64);
  void* p2 = rat_arena_alloc(a, 100, 64);
  const bool ok = p1 && p2 && (reinterpret_cast<uintptr_t>(p2) % 64 == 0);
  rat_arena_destroy(a);
  return ok ? 0 : 6;
}

}  // extern "C"
