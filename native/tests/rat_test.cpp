// rat_test — C++ unit tests for the native runtime (assert-based,
// mirroring hw/sim/cpp/tests/test_golden_models.cpp /
// test_bsr_packer.cpp coverage).

#include <cassert>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <vector>

#include "rat_native.h"

static int failures = 0;
#define CHECK(cond)                                               \
  do {                                                            \
    if (!(cond)) {                                                \
      std::printf("FAIL %s:%d: %s\n", __FILE__, __LINE__, #cond); \
      ++failures;                                                 \
    }                                                             \
  } while (0)

static void test_matmul() {
  const int8_t a[4] = {1, 2, 3, 4};
  const int8_t b[4] = {5, 6, 7, 8};
  int32_t c[4];
  rat_matmul_int8(a, b, c, 2, 2, 2);
  CHECK(c[0] == 19 && c[1] == 22 && c[2] == 43 && c[3] == 50);
}

static void test_requantize_bankers() {
  const int32_t in[6] = {1, 3, 5, -1, -3, -5};
  int8_t out[6];
  rat_requantize_int32_to_int8(in, out, 6, 1.0f, 2.0f);
  CHECK(out[0] == 0 && out[1] == 2 && out[2] == 2);
  CHECK(out[3] == 0 && out[4] == -2 && out[5] == -2);
  const int32_t big[2] = {100000, -100000};
  int8_t sat[2];
  rat_requantize_int32_to_int8(big, sat, 2, 1.0f, 1.0f);
  CHECK(sat[0] == 127 && sat[1] == -128);
}

static void test_residual() {
  const int8_t m[1] = {100}, r[1] = {40};
  int8_t out[1];
  rat_add_residual_int8(m, r, out, 1, 0.03f, 0.05f, 0.05f);
  CHECK(out[0] == 100);
}

static void test_bsr_roundtrip_and_gemm() {
  // 28x28 matrix with one zero block.
  std::vector<int8_t> dense(28 * 28);
  for (int i = 0; i < 28 * 28; ++i)
    dense[i] = static_cast<int8_t>((i * 7) % 255 - 127);
  for (int r = 0; r < 14; ++r)
    for (int c = 14; c < 28; ++c) dense[r * 28 + c] = 0;

  const int64_t nnz = rat_bsr_pack_count(dense.data(), 28, 28, 14, 14);
  CHECK(nnz == 3);
  std::vector<int8_t> blocks(nnz * 196);
  std::vector<int32_t> row_ptr(3), col_idx(nnz);
  rat_bsr_pack_fill(dense.data(), 28, 28, 14, 14, blocks.data(),
                    row_ptr.data(), col_idx.data());
  CHECK(row_ptr[0] == 0 && row_ptr[1] == 1 && row_ptr[2] == 3);

  std::vector<int8_t> back(28 * 28);
  rat_bsr_unpack(blocks.data(), row_ptr.data(), col_idx.data(),
                 back.data(), 2, 2, 14, 14);
  CHECK(std::memcmp(back.data(), dense.data(), 28 * 28) == 0);

  // Sparse GEMM (W^T orientation) vs dense reference.
  std::vector<int8_t> act(28);
  for (int i = 0; i < 28; ++i) act[i] = static_cast<int8_t>(i - 14);
  std::vector<int32_t> c_sparse(28, 0), c_dense(28, 0);
  rat_bsr_matmul_int8_wt(act.data(), blocks.data(), row_ptr.data(),
                         col_idx.data(), c_sparse.data(), 1, 28, 28, 14,
                         14, 2);
  // dense: C = act @ W^T
  for (int n = 0; n < 28; ++n) {
    int32_t acc = 0;
    for (int k = 0; k < 28; ++k)
      acc += int32_t(act[k]) * int32_t(dense[n * 28 + k]);
    c_dense[n] = acc;
  }
  CHECK(std::memcmp(c_sparse.data(), c_dense.data(), 28 * 4) == 0);
}

static void test_serialization() {
  std::vector<int8_t> dense(16 * 16, 1);
  const int64_t nnz = rat_bsr_pack_count(dense.data(), 16, 16, 8, 8);
  std::vector<int8_t> blocks(nnz * 64);
  std::vector<int32_t> row_ptr(3), col_idx(nnz);
  rat_bsr_pack_fill(dense.data(), 16, 16, 8, 8, blocks.data(),
                    row_ptr.data(), col_idx.data());
  const int64_t sz = rat_bsr_serialize_hw_size(nnz, 2, 8, 8);
  std::vector<uint8_t> buf(sz);
  const int64_t written =
      rat_bsr_serialize_hw(blocks.data(), row_ptr.data(), col_idx.data(),
                           buf.data(), nnz, 2, 2, 8, 8);
  CHECK(written == sz);
  uint32_t hdr[3];
  std::memcpy(hdr, buf.data(), 12);
  CHECK(hdr[0] == uint32_t(nnz) && hdr[1] == 2 && hdr[2] == 2);
}

static void test_pool_conv() {
  // maxpool with padding: single positive value survives.
  std::vector<int8_t> x(1 * 4 * 4, -5);
  x[5] = 7;
  std::vector<int8_t> out(1 * 3 * 3);
  rat_maxpool2d_int8(x.data(), out.data(), 1, 4, 4, 2, 2, 1);
  CHECK(out[0] == -5 || out[0] == 7);  // window (p area)
  // avgpool trunc toward zero on negative sums.
  std::vector<int8_t> neg(1 * 2 * 2, -25);
  int8_t avg;
  rat_avgpool_global_int8(neg.data(), &avg, 1, 2, 2);
  CHECK(avg == (-100 + 2) / 4);

  // conv identity kernel.
  std::vector<int8_t> img(1 * 3 * 3);
  for (int i = 0; i < 9; ++i) img[i] = static_cast<int8_t>(i);
  std::vector<int8_t> w(1 * 1 * 3 * 3, 0);
  w[4] = 1;
  std::vector<int32_t> y(9);
  rat_conv2d_int8(img.data(), w.data(), nullptr, y.data(), 1, 3, 3, 1, 3,
                  1, 1);
  for (int i = 0; i < 9; ++i) CHECK(y[i] == i);
}

static void test_arena() {
  rat_arena* a = rat_arena_create(256);
  CHECK(a != nullptr);
  void* p = rat_arena_alloc(a, 100, 64);
  CHECK(p != nullptr);
  CHECK(rat_arena_alloc(a, 100, 64) != nullptr);
  CHECK(rat_arena_alloc(a, 100, 64) == nullptr);  // exhausted
  rat_arena_reset(a);
  CHECK(rat_arena_used(a) == 0);
  CHECK(rat_arena_alloc(a, 100, 64) != nullptr);
  rat_arena_destroy(a);
}

static void test_loader() {
  // 10 items of 4 bytes (2 channels x inner 2), batch 3 -> bpe 3.
  const int64_t n = 10, item = 4, batch = 3;
  std::vector<uint8_t> imgs(n * item);
  std::vector<int32_t> labels(n);
  for (int64_t i = 0; i < n; ++i) {
    labels[i] = static_cast<int32_t>(100 + i);
    for (int64_t j = 0; j < item; ++j)
      imgs[i * item + j] = static_cast<uint8_t>(i * 16 + j);
  }
  const float mean[2] = {0.0f, 0.5f}, stdv[2] = {1.0f, 0.5f};
  const float scale = 0.02f;

  // Reference for one sample, no shuffle.
  auto expect = [&](int64_t s, int64_t j) {
    const int64_t c = j / 2;
    float f = ((imgs[s * item + j] / 255.0f) - mean[c]) / stdv[c] / scale;
    float r = std::nearbyint(f);
    return static_cast<int8_t>(r < -128 ? -128 : (r > 127 ? 127 : r));
  };

  // Many threads vs one thread: identical in-order streams.
  for (int threads : {1, 4}) {
    rat_loader* ld = rat_loader_create(
        imgs.data(), n, item, labels.data(), batch, 2, mean, stdv,
        scale, /*shuffle=*/0, /*seed=*/7, threads, /*depth=*/2);
    CHECK(ld != nullptr);
    CHECK(rat_loader_batches_per_epoch(ld) == 3);
    std::vector<int8_t> out(batch * item);
    std::vector<int32_t> lab(batch);
    for (int64_t b = 0; b < 7; ++b) {  // crosses an epoch boundary
      CHECK(rat_loader_next(ld, out.data(), lab.data()) == b);
      const int64_t off = (b % 3) * batch;  // no-shuffle order
      for (int64_t i = 0; i < batch; ++i) {
        CHECK(lab[i] == labels[off + i]);
        for (int64_t j = 0; j < item; ++j)
          CHECK(out[i * item + j] == expect(off + i, j));
      }
    }
    rat_loader_destroy(ld);
  }

  // Shuffled: same seed -> same stream; each epoch is a permutation.
  rat_loader* a = rat_loader_create(imgs.data(), n, item, labels.data(),
                                    batch, 2, mean, stdv, scale, 1, 42,
                                    3, 4);
  rat_loader* b2 = rat_loader_create(imgs.data(), n, item, labels.data(),
                                     batch, 2, mean, stdv, scale, 1, 42,
                                     1, 2);
  std::vector<int8_t> oa(batch * item), ob(batch * item);
  std::vector<int32_t> la(batch), lb(batch);
  for (int64_t k = 0; k < 6; ++k) {
    rat_loader_next(a, oa.data(), la.data());
    rat_loader_next(b2, ob.data(), lb.data());
    CHECK(std::memcmp(oa.data(), ob.data(), oa.size()) == 0);
    CHECK(std::memcmp(la.data(), lb.data(),
                      la.size() * sizeof(int32_t)) == 0);
  }
  rat_loader_destroy(a);
  rat_loader_destroy(b2);

  // Invalid configs refuse.
  CHECK(rat_loader_create(nullptr, n, item, nullptr, batch, 2, mean,
                          stdv, scale, 0, 0, 1, 2) == nullptr);
  CHECK(rat_loader_create(imgs.data(), n, item, nullptr, n + 1, 2, mean,
                          stdv, scale, 0, 0, 1, 2) == nullptr);
  CHECK(rat_loader_create(imgs.data(), n, 3, nullptr, batch, 2, mean,
                          stdv, scale, 0, 0, 1, 2) == nullptr);
}

int main() {
  test_matmul();
  test_requantize_bankers();
  test_residual();
  test_bsr_roundtrip_and_gemm();
  test_serialization();
  test_pool_conv();
  test_arena();
  test_loader();
  if (failures == 0) {
    std::printf("rat_test: ALL PASS\n");
    return 0;
  }
  std::printf("rat_test: %d FAILURES\n", failures);
  return 1;
}
