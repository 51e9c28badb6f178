// rat_tool — native host CLI for BSR artifacts and golden verification.
//
// The native counterpart of the reference's C++ main.cpp subcommands:
//   pack    dense .npy -> BSR artifact dir (weights.bsr/row_ptr/col_idx)
//   unpack  BSR artifact dir -> dense .npy
//   golden  run the golden BSR GEMM on an artifact with the e2e test's
//           activation pattern ((i%256)-128), print/dump int32 outputs
//   selftest run the built-in library self test
//
// Artifact layout matches resnet_accel_tpu.sparse.io (and the reference's
// export_bsr_14x14 export): weights.bsr raw blocks + row_ptr.npy (i4) +
// col_idx.npy (i4); geometry via --bh/--bw or inferred.

#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

#include "npy.hpp"
#include "rat_native.h"

namespace {

std::vector<int8_t> read_raw(const std::string& path) {
  std::ifstream f(path, std::ios::binary | std::ios::ate);
  if (!f) throw std::runtime_error("cannot open " + path);
  const auto size = f.tellg();
  f.seekg(0);
  std::vector<int8_t> buf(static_cast<size_t>(size));
  f.read(reinterpret_cast<char*>(buf.data()), size);
  return buf;
}

int cmd_pack(int argc, char** argv) {
  std::string in_path, out_dir;
  int64_t bh = 14, bw = 14;
  for (int i = 0; i < argc; ++i) {
    if (!std::strcmp(argv[i], "--input")) in_path = argv[++i];
    else if (!std::strcmp(argv[i], "--output")) out_dir = argv[++i];
    else if (!std::strcmp(argv[i], "--bh")) bh = std::stoll(argv[++i]);
    else if (!std::strcmp(argv[i], "--bw")) bw = std::stoll(argv[++i]);
  }
  if (in_path.empty() || out_dir.empty()) {
    std::fprintf(stderr, "pack --input w.npy --output dir [--bh N --bw N]\n");
    return 2;
  }
  auto arr = rat_npy::load(in_path);
  if (arr.dtype != "i1" || arr.shape.size() != 2) {
    std::fprintf(stderr, "pack: need 2-D int8 .npy\n");
    return 2;
  }
  const int64_t h = arr.shape[0], w = arr.shape[1];
  const int8_t* dense = arr.as<int8_t>();
  const int64_t nnz = rat_bsr_pack_count(dense, h, w, bh, bw);
  const int64_t nbr = (h + bh - 1) / bh;
  std::vector<int8_t> blocks(nnz * bh * bw);
  std::vector<int32_t> row_ptr(nbr + 1), col_idx(nnz ? nnz : 1);
  rat_bsr_pack_fill(dense, h, w, bh, bw, blocks.data(), row_ptr.data(),
                    col_idx.data());

  std::ofstream bf(out_dir + "/weights.bsr", std::ios::binary);
  bf.write(reinterpret_cast<const char*>(blocks.data()), blocks.size());
  bf.close();
  rat_npy::save(out_dir + "/row_ptr.npy", "i4", {nbr + 1}, row_ptr.data(),
                (nbr + 1) * 4);
  rat_npy::save(out_dir + "/col_idx.npy", "i4", {nnz}, col_idx.data(),
                nnz * 4);
  const int64_t total = nbr * ((w + bw - 1) / bw);
  std::printf("packed %s: %lld/%lld blocks (%.1f%% sparse) -> %s\n",
              in_path.c_str(), (long long)nnz, (long long)total,
              100.0 * (1.0 - double(nnz) / double(total)),
              out_dir.c_str());
  return 0;
}

int cmd_unpack(int argc, char** argv) {
  std::string dir, out_path;
  int64_t bh = 14, bw = 14, nbc = -1;
  for (int i = 0; i < argc; ++i) {
    if (!std::strcmp(argv[i], "--artifact")) dir = argv[++i];
    else if (!std::strcmp(argv[i], "--output")) out_path = argv[++i];
    else if (!std::strcmp(argv[i], "--bh")) bh = std::stoll(argv[++i]);
    else if (!std::strcmp(argv[i], "--bw")) bw = std::stoll(argv[++i]);
    else if (!std::strcmp(argv[i], "--nbc")) nbc = std::stoll(argv[++i]);
  }
  if (dir.empty() || out_path.empty()) {
    std::fprintf(stderr,
                 "unpack --artifact dir --output w.npy [--bh --bw --nbc]\n");
    return 2;
  }
  auto row_ptr = rat_npy::load(dir + "/row_ptr.npy");
  auto col_idx = rat_npy::load(dir + "/col_idx.npy");
  auto blocks = read_raw(dir + "/weights.bsr");
  const int64_t nbr = row_ptr.elems() - 1;
  const int32_t* ci = col_idx.as<int32_t>();
  if (nbc < 0) {
    nbc = 0;
    for (int64_t i = 0; i < col_idx.elems(); ++i)
      if (ci[i] + 1 > nbc) nbc = ci[i] + 1;
  }
  std::vector<int8_t> dense(nbr * bh * nbc * bw);
  rat_bsr_unpack(blocks.data(), row_ptr.as<int32_t>(), ci, dense.data(),
                 nbr, nbc, bh, bw);
  rat_npy::save(out_path, "i1", {nbr * bh, nbc * bw}, dense.data(),
                dense.size());
  std::printf("unpacked %s -> %s [%lld x %lld]\n", dir.c_str(),
              out_path.c_str(), (long long)(nbr * bh),
              (long long)(nbc * bw));
  return 0;
}

int cmd_golden(int argc, char** argv) {
  std::string dir, out_path;
  int64_t bh = 14, bw = 14;
  for (int i = 0; i < argc; ++i) {
    if (!std::strcmp(argv[i], "--artifact")) dir = argv[++i];
    else if (!std::strcmp(argv[i], "--output")) out_path = argv[++i];
    else if (!std::strcmp(argv[i], "--bh")) bh = std::stoll(argv[++i]);
    else if (!std::strcmp(argv[i], "--bw")) bw = std::stoll(argv[++i]);
  }
  if (dir.empty()) {
    std::fprintf(stderr, "golden --artifact dir [--output out.npy]\n");
    return 2;
  }
  auto row_ptr = rat_npy::load(dir + "/row_ptr.npy");
  auto col_idx = rat_npy::load(dir + "/col_idx.npy");
  auto blocks = read_raw(dir + "/weights.bsr");
  const int64_t nbr = row_ptr.elems() - 1;
  const int32_t* ci = col_idx.as<int32_t>();
  int64_t nbc = 0;
  for (int64_t i = 0; i < col_idx.elems(); ++i)
    if (ci[i] + 1 > nbc) nbc = ci[i] + 1;
  const int64_t k = nbc * bw, n_out = nbr * bh;

  // The reference e2e test's activation pattern (golden_fc1_test.py:130).
  std::vector<int8_t> act(k);
  for (int64_t i = 0; i < k; ++i)
    act[i] = static_cast<int8_t>((i % 256) - 128);
  std::vector<int32_t> out(n_out, 0);
  rat_bsr_matmul_int8_wt(act.data(), blocks.data(), row_ptr.as<int32_t>(),
                         ci, out.data(), 1, k, n_out, bh, bw, nbr);
  std::printf("golden output[:8]:");
  for (int64_t i = 0; i < 8 && i < n_out; ++i)
    std::printf(" %d", out[i]);
  std::printf("\n");
  if (!out_path.empty()) {
    rat_npy::save(out_path, "i4", {1, n_out}, out.data(), n_out * 4);
    std::printf("saved %s\n", out_path.c_str());
  }
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr,
                 "usage: rat_tool <pack|unpack|golden|selftest> ...\n");
    return 2;
  }
  const std::string cmd = argv[1];
  try {
    if (cmd == "pack") return cmd_pack(argc - 2, argv + 2);
    if (cmd == "unpack") return cmd_unpack(argc - 2, argv + 2);
    if (cmd == "golden") return cmd_golden(argc - 2, argv + 2);
    if (cmd == "selftest") {
      const int rc = rat_self_test();
      std::printf("%s selftest: %s (code %d)\n", rat_version(),
                  rc == 0 ? "PASS" : "FAIL", rc);
      return rc;
    }
  } catch (const std::exception& e) {
    std::fprintf(stderr, "error: %s\n", e.what());
    return 1;
  }
  std::fprintf(stderr, "unknown subcommand %s\n", cmd.c_str());
  return 2;
}
