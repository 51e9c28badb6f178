// npy.hpp — minimal .npy v1/v2 reader/writer (npy_loader.hpp role).
//
// Supports C-contiguous little-endian int8/int32/float32/uint8 arrays,
// which covers every artifact in the BSR/INT8 pipeline.

#ifndef RAT_NPY_HPP_
#define RAT_NPY_HPP_

#include <cstdint>
#include <cstring>
#include <fstream>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace rat_npy {

struct Array {
  std::string dtype;             // "i1", "i4", "f4", "u1"
  std::vector<int64_t> shape;
  std::vector<uint8_t> data;

  int64_t elems() const {
    int64_t n = 1;
    for (auto d : shape) n *= d;
    return n;
  }
  template <typename T>
  const T* as() const {
    return reinterpret_cast<const T*>(data.data());
  }
};

inline Array load(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) throw std::runtime_error("npy: cannot open " + path);
  char magic[6];
  f.read(magic, 6);
  if (std::memcmp(magic, "\x93NUMPY", 6) != 0)
    throw std::runtime_error("npy: bad magic in " + path);
  uint8_t ver[2];
  f.read(reinterpret_cast<char*>(ver), 2);
  uint32_t header_len = 0;
  if (ver[0] == 1) {
    uint16_t hl;
    f.read(reinterpret_cast<char*>(&hl), 2);
    header_len = hl;
  } else {
    f.read(reinterpret_cast<char*>(&header_len), 4);
  }
  std::string header(header_len, '\0');
  f.read(header.data(), header_len);

  Array out;
  // Parse "'descr': '<i1'"
  auto dpos = header.find("'descr'");
  auto q1 = header.find('\'', dpos + 7);
  auto q2 = header.find('\'', q1 + 1);
  std::string descr = header.substr(q1 + 1, q2 - q1 - 1);
  if (!descr.empty() && (descr[0] == '<' || descr[0] == '|'))
    descr = descr.substr(1);
  if (descr != "i1" && descr != "i4" && descr != "f4" && descr != "u1" &&
      descr != "i8")
    throw std::runtime_error("npy: unsupported dtype " + descr);
  out.dtype = descr;
  if (header.find("'fortran_order': True") != std::string::npos)
    throw std::runtime_error("npy: fortran order unsupported");
  auto spos = header.find("'shape'");
  auto p1 = header.find('(', spos);
  auto p2 = header.find(')', p1);
  std::stringstream ss(header.substr(p1 + 1, p2 - p1 - 1));
  std::string tok;
  while (std::getline(ss, tok, ',')) {
    if (tok.find_first_not_of(" \t") == std::string::npos) continue;
    out.shape.push_back(std::stoll(tok));
  }
  if (out.shape.empty()) out.shape.push_back(1);

  const int64_t itemsize = (descr == "i1" || descr == "u1") ? 1
                           : (descr == "i8") ? 8 : 4;
  out.data.resize(out.elems() * itemsize);
  f.read(reinterpret_cast<char*>(out.data.data()), out.data.size());
  if (!f) throw std::runtime_error("npy: truncated " + path);
  return out;
}

inline void save(const std::string& path, const std::string& descr,
                 const std::vector<int64_t>& shape, const void* data,
                 int64_t bytes) {
  std::ostringstream hs;
  hs << "{'descr': '<" << descr << "', 'fortran_order': False, 'shape': (";
  for (size_t i = 0; i < shape.size(); ++i) {
    hs << shape[i];
    if (shape.size() == 1 || i + 1 < shape.size()) hs << ",";
    if (i + 1 < shape.size()) hs << " ";
  }
  hs << "), }";
  std::string header = hs.str();
  const size_t total = 10 + header.size() + 1;
  header += std::string(64 - (total % 64 == 0 ? 64 : total % 64), ' ');
  header += '\n';
  std::ofstream f(path, std::ios::binary);
  f.write("\x93NUMPY\x01\x00", 8);
  const uint16_t hl = static_cast<uint16_t>(header.size());
  f.write(reinterpret_cast<const char*>(&hl), 2);
  f.write(header.data(), header.size());
  f.write(static_cast<const char*>(data), bytes);
}

}  // namespace rat_npy

#endif  // RAT_NPY_HPP_
