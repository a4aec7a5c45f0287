// Native host runtime for model_matching_tpu.
//
// The reference implements its entire offline pipeline in C++ (the O(M^2)
// PPF map build, src/stocs.cpp:63-78; PLY parsing via PCL). The TPU compute
// path here is JAX/XLA, but the host-side heavy lifting keeps a native tier:
//   * mm_ppf_pair_keys: packed exact-bin PPF keys for all ordered point
//     pairs, threaded over rows (the dominant cost of model preprocessing);
//   * mm_parse_floats: bulk ascii float parsing for PLY bodies.
// Exposed as a plain C ABI for ctypes; built by native/Makefile.

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kAngleRadix = 64;
constexpr double kRad2Deg = 57.29577951308232;

inline int closest_bin(int value, int disc) {
  const int lower = value - (value % disc);
  const int upper = lower + disc;
  return (value - lower < upper - value) ? lower : upper;
}

inline int32_t pack_exact(int b0, int b1, int b2, int b3, int tr, int rot) {
  if (b0 < 0 || b1 < 0 || b2 < 0 || b3 < 0) return -1;
  const int64_t q0 = b0 / tr;
  const int64_t q1 = b1 / rot;
  const int64_t q2 = b2 / rot;
  const int64_t q3 = b3 / rot;
  if (q1 >= kAngleRadix || q2 >= kAngleRadix || q3 >= kAngleRadix) return -1;
  const int64_t key =
      ((q0 * kAngleRadix + q1) * kAngleRadix + q2) * kAngleRadix + q3;
  if (key > INT32_MAX) return -1;
  return static_cast<int32_t>(key);
}

inline float angle_deg(float ax, float ay, float az, float bx, float by,
                       float bz) {
  const float cx = ay * bz - az * by;
  const float cy = az * bx - ax * bz;
  const float cz = ax * by - ay * bx;
  const float s = std::sqrt(cx * cx + cy * cy + cz * cz);
  const float c = ax * bx + ay * by + az * bz;
  return static_cast<float>(std::atan2(s, c) * kRad2Deg);
}

}  // namespace

extern "C" {

// keys_out must hold m*m int32 (row-major over ordered pairs (i, j));
// entries with i == j are set to -1. Returns the max pairwise distance.
float mm_ppf_pair_keys(const float* pos, const float* nrm, int m, int tr,
                       int rot, int32_t* keys_out) {
  const unsigned hw = std::thread::hardware_concurrency();
  const int nthreads = static_cast<int>(hw ? (hw < 64 ? hw : 64) : 4);
  std::vector<std::thread> workers;
  std::vector<float> max_d(nthreads, 0.0f);
  std::atomic<int> next_row{0};

  auto work = [&](int tid) {
    float local_max = 0.0f;
    for (;;) {
      const int i = next_row.fetch_add(1);
      if (i >= m) break;
      const float p1x = pos[3 * i], p1y = pos[3 * i + 1], p1z = pos[3 * i + 2];
      const float n1x = nrm[3 * i], n1y = nrm[3 * i + 1], n1z = nrm[3 * i + 2];
      int32_t* row = keys_out + static_cast<int64_t>(i) * m;
      for (int j = 0; j < m; ++j) {
        if (j == i) {
          row[j] = -1;
          continue;
        }
        const float ux = p1x - pos[3 * j];
        const float uy = p1y - pos[3 * j + 1];
        const float uz = p1z - pos[3 * j + 2];
        const float d = std::sqrt(ux * ux + uy * uy + uz * uz);
        if (d > local_max) local_max = d;
        const int f0 = static_cast<int>(d * 1000.0f);
        const int f1 = static_cast<int>(angle_deg(n1x, n1y, n1z, ux, uy, uz));
        const int f2 = static_cast<int>(angle_deg(
            nrm[3 * j], nrm[3 * j + 1], nrm[3 * j + 2], ux, uy, uz));
        const int f3 = static_cast<int>(angle_deg(
            n1x, n1y, n1z, nrm[3 * j], nrm[3 * j + 1], nrm[3 * j + 2]));
        row[j] = pack_exact(closest_bin(f0, tr), closest_bin(f1, rot),
                            closest_bin(f2, rot), closest_bin(f3, rot), tr,
                            rot);
      }
    }
    max_d[tid] = local_max;
  };

  for (int t = 0; t < nthreads; ++t) workers.emplace_back(work, t);
  for (auto& w : workers) w.join();
  float out = 0.0f;
  for (float v : max_d) out = out > v ? out : v;
  return out;
}

// Expand each packed exact-bin key by the 128-way insertion fan-out
// (p1 in {f-tr, f}, angles in {f-2r, f-r, f, f+r}; rgbd.cpp:130-133) with
// the insert-side rejection (distance bin <= min_bin mm or negative
// angles, rgbd.cpp:135-136; min_bin = ops/ppf.py MIN_DISTANCE_BIN_MM).
// deltas: [128, 4] int32 quotient-space offsets. out: u * 128 int32 keys,
// -1 where rejected. Threaded over keys.
void mm_fanout_pack(const int32_t* keys, long u, int tr, int min_bin,
                    const int32_t* deltas, int32_t* out) {
  const unsigned hw = std::thread::hardware_concurrency();
  const int nthreads = static_cast<int>(hw ? (hw < 64 ? hw : 64) : 4);
  std::vector<std::thread> workers;
  std::atomic<long> next{0};
  constexpr long kBlock = 4096;

  auto work = [&]() {
    for (;;) {
      const long start = next.fetch_add(kBlock);
      if (start >= u) break;
      const long stop = start + kBlock < u ? start + kBlock : u;
      for (long i = start; i < stop; ++i) {
        int64_t k = keys[i];
        const int q4 = static_cast<int>(k % kAngleRadix);
        k /= kAngleRadix;
        const int q3 = static_cast<int>(k % kAngleRadix);
        k /= kAngleRadix;
        const int q2 = static_cast<int>(k % kAngleRadix);
        const int q1 = static_cast<int>(k / kAngleRadix);
        int32_t* row = out + i * 128;
        for (int d = 0; d < 128; ++d) {
          const int n1 = q1 + deltas[4 * d];
          const int n2 = q2 + deltas[4 * d + 1];
          const int n3 = q3 + deltas[4 * d + 2];
          const int n4 = q4 + deltas[4 * d + 3];
          if (n1 * tr <= min_bin || n2 < 0 || n3 < 0 || n4 < 0 ||
              n2 >= kAngleRadix || n3 >= kAngleRadix || n4 >= kAngleRadix) {
            row[d] = -1;
            continue;
          }
          const int64_t key =
              ((static_cast<int64_t>(n1) * kAngleRadix + n2) * kAngleRadix +
               n3) * kAngleRadix + n4;
          row[d] = key > INT32_MAX ? -1 : static_cast<int32_t>(key);
        }
      }
    }
  };

  for (int t = 0; t < nthreads; ++t) workers.emplace_back(work);
  for (auto& w : workers) w.join();
}

// Parse up to max_out whitespace-separated floats from buf; returns the
// number parsed.
long mm_parse_floats(const char* buf, long len, float* out, long max_out) {
  const char* p = buf;
  const char* end = buf + len;
  long count = 0;
  while (p < end && count < max_out) {
    char* next = nullptr;
    const float v = strtof(p, &next);
    if (next == p) {
      ++p;  // skip non-numeric byte
      continue;
    }
    out[count++] = v;
    p = next;
  }
  return count;
}

}  // extern "C"
