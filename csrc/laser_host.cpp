// laser_host: native host-side runtime helpers for laser-tpu.
//
// The reference embeds native code in three ways: the vendored cpuinfo C
// library, inline {.emit.} C in hot loops, and the photon_jit runtime
// assembler. On TPU the device-side analog of all three is the compiled
// Pallas kernel; the pieces that remain genuinely host-bound — data-loader
// style sampling and layout shuffling that feed the device — live here as
// real native code.
//
// Components:
//   * Fenwick (F+tree) multinomial sampler — the literal port target of
//     benchmarks/random_sampling/fenwicktree.nim + the NOMAD-LDA style
//     sampler the reference benchmarks (bench_multinomial_samplers.nim):
//     O(log n) sampling AND O(log n) weight update, which is what makes
//     without-replacement and evolving-weight sampling fast. The TPU-side
//     idiom (Gumbel top-k, ops/sampling.py) covers batched device sampling;
//     this covers host-side producers (data loaders, CPU-side token
//     sampling) where the tree's updatability wins.
//   * strided_copy_f32/d — rank-general strided -> row-major gather copy,
//     the host twin of the forEachStrided odometer loop
//     (laser/strided_iteration/foreach.nim:64-113), used for zero-copy-out
//     host tensors feeding device buffers.
//
// Build: g++ -O3 -march=native -shared -fPIC (driven by laser_tpu/host).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// splitmix64: tiny, seedable, statistically solid for sampling use.
struct SplitMix64 {
  uint64_t state;
  explicit SplitMix64(uint64_t seed) : state(seed) {}
  uint64_t next() {
    uint64_t z = (state += 0x9E3779B97F4A7C15ULL);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
    return z ^ (z >> 31);
  }
  // uniform double in [0, 1)
  double uniform() { return (next() >> 11) * 0x1.0p-53; }
};

struct Fenwick {
  // 1-based implicit binary indexed tree over n leaves; tree[i] holds the
  // sum of the 2^r leaves ending at i (r = number of trailing zeros of i).
  std::vector<double> tree;
  std::vector<double> leaf;  // current leaf weights (for clamping/updates)
  int n;
  int log2n;  // highest power of two <= n

  explicit Fenwick(const float* w, int n_) : tree(n_ + 1, 0.0), leaf(n_), n(n_) {
    for (int i = 0; i < n; ++i) leaf[i] = w[i] > 0 ? w[i] : 0.0;
    // O(n) build: tree[i] = leaf[i-1], then push partial sums to parents.
    for (int i = 1; i <= n; ++i) tree[i] += leaf[i - 1];
    for (int i = 1; i <= n; ++i) {
      int parent = i + (i & -i);
      if (parent <= n) tree[parent] += tree[i];
    }
    log2n = 1;
    while ((log2n << 1) <= n) log2n <<= 1;
  }

  double total() const {
    double s = 0.0;
    for (int i = n; i > 0; i -= i & -i) s += tree[i];
    return s;
  }

  double get(int i) const { return leaf[i]; }

  void update(int i, double w) {
    if (w < 0) w = 0;
    double delta = w - leaf[i];
    leaf[i] = w;
    for (int j = i + 1; j <= n; j += j & -j) tree[j] += delta;
  }

  // Descend the implicit tree: find smallest index with prefix_sum > u.
  // O(log n), no binary search over an explicit CDF (the F+tree trick the
  // reference benchmarks against CDF bisection).
  int sample(double u) const {
    int pos = 0;
    for (int mask = log2n; mask > 0; mask >>= 1) {
      int next = pos + mask;
      if (next <= n && tree[next] <= u) {
        u -= tree[next];
        pos = next;
      }
    }
    return pos < n ? pos : n - 1;
  }
};

}  // namespace

extern "C" {

void* laser_fenwick_create(const float* w, int n) {
  return new Fenwick(w, n);
}

void laser_fenwick_destroy(void* h) { delete static_cast<Fenwick*>(h); }

double laser_fenwick_total(void* h) { return static_cast<Fenwick*>(h)->total(); }

double laser_fenwick_get(void* h, int i) {
  return static_cast<Fenwick*>(h)->get(i);
}

void laser_fenwick_update(void* h, int i, double w) {
  static_cast<Fenwick*>(h)->update(i, w);
}

int laser_fenwick_sample_one(void* h, double u) {
  return static_cast<Fenwick*>(h)->sample(u);
}

namespace {

// With-replacement inner loop: the tree is read-only, so two levers apply
// that the reference's single-descent loop leaves on the table:
//   * INTERLEAVE: run W descents in lockstep per thread — each tree level
//     issues W independent loads instead of one latency-chained load
//     (the multi-accumulator trick of reductions_sse3.nim, applied to
//     pointer chasing).
//   * THREADS: chunk the output across cores; each chunk's RNG is seeded
//     from (seed, chunk) so results are deterministic for a given seed
//     regardless of thread count or timing.
constexpr int kInterleave = 8;

void sample_chunk(const Fenwick* f, double tot, uint64_t seed, int32_t* out,
                  int count) {
  SplitMix64 rng(seed);
  int s = 0;
  const int n = f->n;
  const auto* tree = f->tree.data();
  for (; s + kInterleave <= count; s += kInterleave) {
    double u[kInterleave];
    int pos[kInterleave];
    for (int w = 0; w < kInterleave; ++w) {
      u[w] = rng.uniform() * tot;
      pos[w] = 0;
    }
    for (int mask = f->log2n; mask > 0; mask >>= 1) {
      for (int w = 0; w < kInterleave; ++w) {
        int next = pos[w] + mask;
        if (next <= n && tree[next] <= u[w]) {
          u[w] -= tree[next];
          pos[w] = next;
        }
      }
    }
    for (int w = 0; w < kInterleave; ++w)
      out[s + w] = pos[w] < n ? pos[w] : n - 1;
  }
  for (; s < count; ++s) out[s] = f->sample(rng.uniform() * tot);
}

}  // namespace

// Draw `num` samples. replacement=0 zeroes each drawn weight (sampling
// without replacement with true weight updates — the case where the F+tree
// beats CDF rebuild by O(n/log n), reference results: 9.37 M/s vs 0.82 M/s).
// Restores weights afterwards so the sampler is reusable.
void laser_fenwick_sample(void* h, uint64_t seed, int num, int replacement,
                          int32_t* out) {
  Fenwick* f = static_cast<Fenwick*>(h);
  if (replacement) {
    double tot = f->total();
    unsigned hw = std::thread::hardware_concurrency();
    int nthreads = static_cast<int>(hw ? (hw > 16 ? 16 : hw) : 1);
    const int kMinPerThread = 1 << 15;
    if (nthreads > 1 && num / nthreads < kMinPerThread)
      nthreads = num / kMinPerThread > 1 ? num / kMinPerThread : 1;
    if (nthreads <= 1) {
      sample_chunk(f, tot, seed, out, num);
      return;
    }
    std::vector<std::thread> workers;
    int base = num / nthreads, rem = num % nthreads;
    int off = 0;
    for (int t = 0; t < nthreads; ++t) {
      int count = base + (t < rem ? 1 : 0);
      // per-chunk seed: deterministic for a given `seed` independent of
      // thread scheduling
      uint64_t cs = seed ^ (0xA5A5A5A5DEADBEEFULL + 0x9E3779B97F4A7C15ULL *
                            static_cast<uint64_t>(t + 1));
      workers.emplace_back(sample_chunk, f, tot, cs, out + off, count);
      off += count;
    }
    for (auto& w : workers) w.join();
    return;
  }
  // Without replacement: inherently sequential (each draw reweights the
  // tree), but the running total replaces the per-draw O(log n) total().
  SplitMix64 rng(seed);
  std::vector<std::pair<int, double>> drawn;
  drawn.reserve(num);
  double tot = f->total();
  for (int s = 0; s < num; ++s) {
    int idx = tot > 0 ? f->sample(rng.uniform() * tot) : 0;
    out[s] = idx;
    double w = f->get(idx);
    drawn.emplace_back(idx, w);
    f->update(idx, 0.0);
    tot -= w;
  }
  for (auto it = drawn.rbegin(); it != drawn.rend(); ++it)
    f->update(it->first, it->second);
}

// One-shot convenience: build + sample + destroy.
void laser_multinomial(const float* w, int n, uint64_t seed, int num,
                       int replacement, int32_t* out) {
  Fenwick f(w, n);
  laser_fenwick_sample(&f, seed, num, replacement, out);
}

}  // extern "C" (template below needs C++ linkage)

// ---------------------------------------------------------------------------
// Strided -> contiguous copy (rank-general odometer, f32/f64).
// shape/strides are element-granular; dst is row-major contiguous.
// ---------------------------------------------------------------------------

template <typename T>
static void strided_copy(const T* src, T* dst, int rank, const int64_t* shape,
                         const int64_t* strides, int64_t offset) {
  if (rank == 0) {
    dst[0] = src[offset];
    return;
  }
  int64_t size = 1;
  for (int d = 0; d < rank; ++d) size *= shape[d];
  if (size == 0) return;

  std::vector<int64_t> coord(rank, 0);
  int64_t src_idx = offset;
  const int last = rank - 1;
  const int64_t inner_n = shape[last];
  const int64_t inner_s = strides[last];
  int64_t written = 0;
  while (written < size) {
    // inner loop: contiguous-dst writes, strided-src reads
    if (inner_s == 1) {
      std::memcpy(dst + written, src + src_idx, inner_n * sizeof(T));
    } else {
      for (int64_t i = 0; i < inner_n; ++i)
        dst[written + i] = src[src_idx + i * inner_s];
    }
    written += inner_n;
    // odometer increment over the outer dims (foreach_common.nim:102-120)
    int d = last - 1;
    for (; d >= 0; --d) {
      src_idx += strides[d];
      if (++coord[d] < shape[d]) break;
      src_idx -= coord[d] * strides[d];
      coord[d] = 0;
    }
    if (d < 0) break;
  }
}

// ---------------------------------------------------------------------------
// f64 -> signed 7-bit digit planes (the Ozaki-slice extraction for the native
// f64 GEMM, laser_tpu/ops/gemm/f64_kernel.py). One pass per element computes
// every slice — ~10x the multi-temporary NumPy loop on the single-core host.
// Matches f64_digits_np bit-for-bit: frexp scale (|xs| <= 0.5), x128 +
// round-half-even (nearbyint under the default FE_TONEAREST) + exact
// subtract.
// ---------------------------------------------------------------------------

#include <cfenv>
#include <cmath>

static void f64_digits_impl(const double* x, int64_t rows, int64_t cols,
                            int axis, int slices, int8_t* digits,
                            int32_t* scales) {
  const int64_t n_scales = (axis == 1) ? rows : cols;
  const int64_t plane = rows * cols;
  // per-line max |x| along the contraction axis
  for (int64_t s = 0; s < n_scales; ++s) {
    double amax = 0.0;
    if (axis == 1) {
      for (int64_t j = 0; j < cols; ++j) {
        double a = std::fabs(x[s * cols + j]);
        if (a > amax) amax = a;
      }
    } else {
      for (int64_t i = 0; i < rows; ++i) {
        double a = std::fabs(x[i * cols + s]);
        if (a > amax) amax = a;
      }
    }
    int e;
    std::frexp(amax > 0.0 ? amax : 1.0, &e);
    scales[s] = e + 1;
  }
  // precompute 2^-scale per line: multiplying by an exact power of two is
  // the same correctly-rounded result as ldexp, without the libm call
  std::vector<double> inv(n_scales);
  for (int64_t s = 0; s < n_scales; ++s) inv[s] = std::ldexp(1.0, -scales[s]);
  // round-to-nearest-even via the 1.5*2^52 magic add (valid for |t| < 2^51;
  // here |t| <= 64.5) — matches nearbyint under FE_TONEAREST bit-for-bit.
  // Block over j so the slice loop runs data-parallel across a 256-wide
  // residual buffer (SIMD-izable) instead of a serial per-element chain.
  const double MAGIC = 6755399441055744.0;
  constexpr int64_t JB = 256;
  double t[JB];
  for (int64_t i = 0; i < rows; ++i) {
    const double* xr = x + i * cols;
    for (int64_t j0 = 0; j0 < cols; j0 += JB) {
      const int64_t w = std::min(JB, cols - j0);
      if (axis == 1) {
        const double iv = inv[i];
        for (int64_t j = 0; j < w; ++j) t[j] = xr[j0 + j] * iv;
      } else {
        for (int64_t j = 0; j < w; ++j) t[j] = xr[j0 + j] * inv[j0 + j];
      }
      int8_t* d = digits + i * cols + j0;
      for (int p = 0; p < slices; ++p, d += plane) {
        for (int64_t j = 0; j < w; ++j) {
          double tj = t[j] * 128.0;
          double r = (tj + MAGIC) - MAGIC;
          d[j] = static_cast<int8_t>(r);
          t[j] = tj - r;
        }
      }
    }
  }
}

extern "C" {

void laser_f64_digits(const double* x, int64_t rows, int64_t cols, int axis,
                      int slices, int8_t* digits, int32_t* scales) {
  f64_digits_impl(x, rows, cols, axis, slices, digits, scales);
}

void laser_strided_copy_f32(const float* src, float* dst, int rank,
                            const int64_t* shape, const int64_t* strides,
                            int64_t offset) {
  strided_copy<float>(src, dst, rank, shape, strides, offset);
}

void laser_strided_copy_f64(const double* src, double* dst, int rank,
                            const int64_t* shape, const int64_t* strides,
                            int64_t offset) {
  strided_copy<double>(src, dst, rank, shape, strides, offset);
}

int laser_host_abi_version() { return 1; }

}  // extern "C"
