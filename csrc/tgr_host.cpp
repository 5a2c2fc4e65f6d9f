// Host-side native primitives for taichi_gaussian_rasterizer_tpu.
//
// The reference's native layer (taichi_splatting/cuda_lib/) wraps CUB
// *device* sort/scan; on TPU those live on-device as XLA/Pallas ops
// (ops/mapper.py). What remains genuinely host-side — dataset loading and
// preprocessing of multi-million-point scenes before device upload — is
// implemented here in C++: multithreaded radix sort-pairs with a bit
// window (cuda_lib/radix_sort_pairs.cu analog), exclusive cumsum with
// grand total (cuda_lib/full_cumsum.cu analog), segmented sort
// (cuda_lib/segmented_sort_pairs.cu analog), 3D Morton encoding
// (misc/morton_sort.py analog), and a binary-PLY 3DGS point-cloud reader
// (the data-loader role). Bound via ctypes (io/native.py).
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread
//            tgr_host.cpp -o libtgr_host.so

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr int kRadixBits = 8;
constexpr int kBuckets = 1 << kRadixBits;

int hardware_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n ? static_cast<int>(n) : 4;
}

// Parallel LSD radix sort of (key, value) pairs over [begin_bit, end_bit).
template <typename K>
void radix_sort_pairs(K* keys, int32_t* values, int64_t n, int begin_bit,
                      int end_bit) {
  if (n <= 1) return;
  std::vector<K> keys_tmp(n);
  std::vector<int32_t> vals_tmp(n);
  K* k_in = keys;
  int32_t* v_in = values;
  K* k_out = keys_tmp.data();
  int32_t* v_out = vals_tmp.data();

  const int n_threads = std::min<int64_t>(hardware_threads(), (n + 65535) / 65536);
  const int64_t chunk = (n + n_threads - 1) / n_threads;

  for (int shift = begin_bit; shift < end_bit; shift += kRadixBits) {
    const int bits = std::min(kRadixBits, end_bit - shift);
    const int buckets = 1 << bits;
    const K mask = static_cast<K>(buckets - 1);

    // per-thread histograms
    std::vector<std::vector<int64_t>> hist(n_threads,
                                           std::vector<int64_t>(buckets, 0));
    auto count = [&](int t) {
      const int64_t lo = t * chunk, hi = std::min<int64_t>(n, lo + chunk);
      auto& h = hist[t];
      for (int64_t i = lo; i < hi; ++i)
        ++h[(k_in[i] >> shift) & mask];
    };
    std::vector<std::thread> ts;
    for (int t = 0; t < n_threads; ++t) ts.emplace_back(count, t);
    for (auto& th : ts) th.join();
    ts.clear();

    // exclusive scan over (bucket-major, thread-minor)
    int64_t sum = 0;
    for (int b = 0; b < buckets; ++b)
      for (int t = 0; t < n_threads; ++t) {
        int64_t c = hist[t][b];
        hist[t][b] = sum;
        sum += c;
      }

    auto scatter = [&](int t) {
      const int64_t lo = t * chunk, hi = std::min<int64_t>(n, lo + chunk);
      auto& h = hist[t];
      for (int64_t i = lo; i < hi; ++i) {
        const int b = (k_in[i] >> shift) & mask;
        const int64_t dst = h[b]++;
        k_out[dst] = k_in[i];
        v_out[dst] = v_in[i];
      }
    };
    for (int t = 0; t < n_threads; ++t) ts.emplace_back(scatter, t);
    for (auto& th : ts) th.join();

    std::swap(k_in, k_out);
    std::swap(v_in, v_out);
  }

  if (k_in != keys) {
    std::memcpy(keys, k_in, n * sizeof(K));
    std::memcpy(values, v_in, n * sizeof(int32_t));
  }
}

}  // namespace

extern "C" {

void tgr_radix_sort_pairs_u32(uint32_t* keys, int32_t* values, int64_t n,
                              int begin_bit, int end_bit) {
  radix_sort_pairs(keys, values, n, begin_bit, end_bit);
}

void tgr_radix_sort_pairs_u64(uint64_t* keys, int32_t* values, int64_t n,
                              int begin_bit, int end_bit) {
  radix_sort_pairs(keys, values, n, begin_bit, end_bit);
}

// (N) -> (N+1) exclusive scan; returns the grand total (the reference's
// host-returned full_cumsum total, cuda_lib/full_cumsum.cu:41-46).
int64_t tgr_full_cumsum_i32(const int32_t* in, int64_t* out, int64_t n) {
  int64_t sum = 0;
  for (int64_t i = 0; i < n; ++i) {
    out[i] = sum;
    sum += in[i];
  }
  out[n] = sum;
  return sum;
}

// Sort pairs independently within segments given by (n_segs+1) offsets
// (cuda_lib/segmented_sort_pairs.cu analog), threaded over segments.
void tgr_segmented_sort_pairs_u32(uint32_t* keys, int32_t* values,
                                  const int64_t* offsets, int64_t n_segs) {
  const int n_threads = hardware_threads();
  std::atomic<int64_t> next(0);
  auto work = [&]() {
    for (;;) {
      int64_t s = next.fetch_add(1);
      if (s >= n_segs) return;
      int64_t lo = offsets[s], hi = offsets[s + 1];
      if (hi - lo <= 1) continue;
      std::vector<int64_t> idx(hi - lo);
      for (int64_t i = 0; i < hi - lo; ++i) idx[i] = i;
      std::stable_sort(idx.begin(), idx.end(), [&](int64_t a, int64_t b) {
        return keys[lo + a] < keys[lo + b];
      });
      std::vector<uint32_t> k(hi - lo);
      std::vector<int32_t> v(hi - lo);
      for (int64_t i = 0; i < hi - lo; ++i) {
        k[i] = keys[lo + idx[i]];
        v[i] = values[lo + idx[i]];
      }
      std::memcpy(keys + lo, k.data(), k.size() * sizeof(uint32_t));
      std::memcpy(values + lo, v.data(), v.size() * sizeof(int32_t));
    }
  };
  std::vector<std::thread> ts;
  for (int t = 0; t < n_threads; ++t) ts.emplace_back(work);
  for (auto& th : ts) th.join();
}

// 30-bit 3D Morton codes from quantized cells (misc/morton_sort.py:13-30).
static inline uint32_t spread10(uint32_t x) {
  x &= 0x3ff;
  x = (x | (x << 16)) & 0x030000FF;
  x = (x | (x << 8)) & 0x0300F00F;
  x = (x | (x << 4)) & 0x030C30C3;
  x = (x | (x << 2)) & 0x09249249;
  return x;
}

void tgr_morton3d(const float* xyz, int64_t n, const float* lower,
                  const float* inv_cell, uint32_t* codes) {
  const int n_threads = hardware_threads();
  const int64_t chunk = (n + n_threads - 1) / n_threads;
  auto work = [&](int t) {
    const int64_t lo = t * chunk, hi = std::min<int64_t>(n, lo + chunk);
    for (int64_t i = lo; i < hi; ++i) {
      uint32_t c[3];
      for (int a = 0; a < 3; ++a) {
        float v = (xyz[i * 3 + a] - lower[a]) * inv_cell[a];
        int64_t q = static_cast<int64_t>(v);
        c[a] = static_cast<uint32_t>(std::min<int64_t>(std::max<int64_t>(q, 0), 1023));
      }
      codes[i] = spread10(c[0]) | (spread10(c[1]) << 1) | (spread10(c[2]) << 2);
    }
  };
  std::vector<std::thread> ts;
  for (int t = 0; t < n_threads; ++t) ts.emplace_back(work, t);
  for (auto& th : ts) th.join();
}

// ---------------------------------------------------------------------
// Binary little-endian PLY reader for 3DGS point clouds (the data-loader
// role of the native layer). Extracts the named float properties of the
// `vertex` element into a dense row-major (n, n_props) buffer.
// Two-call protocol:
//   tgr_ply_info(path, &n_vertices, names_buf, names_cap) -> 0 on success
//   tgr_ply_read(path, out, n_props) -> 0 on success
// ---------------------------------------------------------------------

static bool parse_header(std::ifstream& f, int64_t& n_vertices,
                         std::vector<std::string>& props,
                         int64_t& data_offset) {
  std::string line;
  if (!std::getline(f, line) || line.rfind("ply", 0) != 0) return false;
  bool binary_le = false;
  bool in_vertex = false;
  n_vertices = 0;
  while (std::getline(f, line)) {
    if (!line.empty() && line.back() == '\r') line.pop_back();
    std::istringstream ss(line);
    std::string tok;
    ss >> tok;
    if (tok == "format") {
      std::string fmt;
      ss >> fmt;
      binary_le = (fmt == "binary_little_endian");
    } else if (tok == "element") {
      std::string name;
      int64_t count;
      ss >> name >> count;
      in_vertex = (name == "vertex");
      if (in_vertex) n_vertices = count;
    } else if (tok == "property" && in_vertex) {
      std::string type, name;
      ss >> type >> name;
      if (type != "float" && type != "float32") return false;
      props.push_back(name);
    } else if (tok == "end_header") {
      data_offset = f.tellg();
      return binary_le && n_vertices > 0 && !props.empty();
    }
  }
  return false;
}

int tgr_ply_info(const char* path, int64_t* n_vertices, char* names_buf,
                 int64_t names_cap) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return -1;
  std::vector<std::string> props;
  int64_t off;
  if (!parse_header(f, *n_vertices, props, off)) return -2;
  std::string joined;
  for (size_t i = 0; i < props.size(); ++i) {
    if (i) joined += ",";
    joined += props[i];
  }
  if (static_cast<int64_t>(joined.size()) + 1 > names_cap) return -3;
  std::memcpy(names_buf, joined.c_str(), joined.size() + 1);
  return 0;
}

int tgr_ply_read(const char* path, float* out, int64_t n_props_expected) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return -1;
  int64_t n;
  std::vector<std::string> props;
  int64_t off;
  if (!parse_header(f, n, props, off)) return -2;
  if (static_cast<int64_t>(props.size()) != n_props_expected) return -3;
  f.seekg(off);
  const int64_t want = n * n_props_expected *
                       static_cast<int64_t>(sizeof(float));
  f.read(reinterpret_cast<char*>(out), want);
  // a truncated file must be an error, not silent garbage in the tail
  if (f.gcount() != want) return -4;
  return f.bad() ? -4 : 0;
}

}  // extern "C"
