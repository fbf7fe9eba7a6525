"""Native wide-dtype GEMMs: int64 (mod 2^64) and f64 (Ozaki slices).

Both require jax_enable_x64 — a global flag that would poison the rest of
the suite's dtype expectations — so the numerics run in a child process
(same pattern as test_gemm.py::test_int64_f64_paths_with_x64). The child
exercises the *native* limb kernels in interpret mode on CPU; oracles are
exact object-integer matmuls (int64) and NumPy f64 (f64).

Reference parity targets:
  int64: laser gemm_ukernel_avx512.nim:58-74 / gemm_ukernel_sse2.nim:67-120
         (wraparound mullo semantics), 19.8 GINTOP/s baseline.
  f64:   laser gemm_ukernel_avx512.nim:23-38, 441.5 GFLOP/s baseline.
"""

import subprocess
import sys

from laser_tpu.ops.gemm.limb_kernel import max_k_for


def test_limb_overflow_bounds():
    # 8 limbs x K x 2^14 must fit int32 with margin (int64 digits +-128)
    k = max_k_for(8)
    assert k == 8192
    assert 8 * k * 128 * 128 <= 2**31
    # f64 digits are +-64
    kf = max_k_for(8, digit_max=64)
    assert kf == 32768
    assert 8 * kf * 64 * 64 <= 2**31


_CHILD = r"""
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
import laser_tpu as lt
from laser_tpu.ops.gemm import int64_kernel, f64_kernel

rng = np.random.RandomState(0xDEADBEEF)


def oracle_mod64(a, b, alpha=1, beta=0, c=None):
    w = a.astype(object) @ b.astype(object)
    w = w * int(alpha)
    if c is not None:
        w = w + int(beta) * c.astype(object)
    return np.asarray([[int(x) % 2**64 for x in row] for row in w],
                      dtype=np.uint64).astype(np.int64)


# --- int64: full-range random, unaligned shape ---
a = rng.randint(-2**62, 2**62, (13, 31)).astype(np.int64)
b = rng.randint(-2**62, 2**62, (31, 9)).astype(np.int64)
got = np.asarray(int64_kernel.gemm_int64(jnp.asarray(a), jnp.asarray(b),
                                         interpret=True))
assert np.array_equal(got, oracle_mod64(a, b)), "int64 plain mismatch"

# --- int64: worst-case digits (all -128 planes), alpha/beta/c ---
aw = np.full((8, 16), np.int64(0x8080808080808080 - 2**64), np.int64)
bw = np.full((16, 8), np.int64(0x8080808080808080 - 2**64), np.int64)
cw = rng.randint(-2**62, 2**62, (8, 8)).astype(np.int64)
got = np.asarray(int64_kernel.gemm_int64(
    jnp.asarray(aw), jnp.asarray(bw), alpha=3, beta=-5, c=jnp.asarray(cw),
    interpret=True))
assert np.array_equal(got, oracle_mod64(aw, bw, 3, -5, cw)), "int64 abc"

# --- int64: K-chunk splitting (shrink the chunk to force >1 chunk) ---
int64_kernel._K_CHUNK = 128
ak = rng.randint(-2**62, 2**62, (8, 300)).astype(np.int64)
bk = rng.randint(-2**62, 2**62, (300, 8)).astype(np.int64)
got = np.asarray(int64_kernel.gemm_int64(jnp.asarray(ak), jnp.asarray(bk),
                                         interpret=True))
assert np.array_equal(got, oracle_mod64(ak, bk)), "int64 K-chunk"
int64_kernel._K_CHUNK = max(int64_kernel._K_CHUNK, 8192)

# --- int64 via the public gemm dispatch (uint64 too) ---
got = np.asarray(lt.gemm(a, b))
assert got.dtype == np.int64
assert np.array_equal(got, oracle_mod64(a, b)), "gemm int64 dispatch"
au, bu = a.astype(np.uint64), b.astype(np.uint64)
gotu = np.asarray(lt.gemm(au, bu))
assert gotu.dtype == np.uint64
assert np.array_equal(gotu.astype(np.int64), oracle_mod64(a, b)), "uint64"

# --- f64: mixed-exponent random, unaligned shape ---
K = 96
af = rng.randn(17, K) * np.exp2(rng.randint(-30, 30, (17, K)))
bf = rng.randn(K, 11) * np.exp2(rng.randint(-30, 30, (K, 11)))
want = af @ bf
got = np.asarray(f64_kernel.gemm_f64(jnp.asarray(af), jnp.asarray(bf),
                                     interpret=True))
scale = (np.abs(af).max(1)[:, None] * np.abs(bf).max(0)[None, :])
err = np.abs(got - want) / (K * scale)
assert err.max() < 2**-50, f"f64 error {err.max()} above classical bound"

# --- f64: alpha/beta/c + epilogue through the public api ---
cf = rng.randn(17, 11)
got = np.asarray(lt.gemm(jnp.asarray(af), jnp.asarray(bf), alpha=1.5,
                         beta=-0.5, c=jnp.asarray(cf), epilogue="tanh"))
want = np.tanh(1.5 * (af @ bf) - 0.5 * cf)
assert got.dtype == np.float64
assert np.abs(got - want).max() < 1e-9, "f64 epilogue path"

# --- f64 fast tier: 4 slices ~ 2^-28 relative ---
got4 = np.asarray(f64_kernel.gemm_f64(jnp.asarray(af), jnp.asarray(bf),
                                      slices=4, interpret=True))
err4 = np.abs(got4 - af @ bf) / (K * scale)
assert err4.max() < 2**-24, f"f64 slices=4 error {err4.max()}"
assert err4.max() > err.max(), "4-slice tier should be less accurate than 8"

# --- f64 host-orchestrated path (what runs on accelerators): NumPy in,
# device bucket GEMM + triple-f32 on-device combine, NumPy f64 out ---
gh = f64_kernel._gemm_f64_host(af, bf, 1.0, 0.0, None, None, None, 8, True)
assert isinstance(gh, np.ndarray) and gh.dtype == np.float64
errh = np.abs(gh - af @ bf) / (K * scale)
assert errh.max() < 2**-50, f"f64 host path error {errh.max()}"

# --- triple-f32 combine: exact against a big-float oracle ---
from fractions import Fraction
rb = rng.randint(-2**29, 2**29, (8, 4, 8)).astype(np.int32)
c3 = np.asarray(f64_kernel.combine_buckets_3f32(jnp.asarray(rb), 8))
got_c = c3[0].astype(np.float64) + c3[1] + c3[2]
w_exact = [Fraction(1, 128 ** (s + 2)) for s in range(8)]
for i in range(4):
    for j in range(8):
        exact = sum(Fraction(int(rb[s, i, j])) * w_exact[s]
                    for s in range(8))
        # bound: one f64 ulp of the result (leading magnitude <= 2^15
        # for +-2^29 buckets -> ulp 2^-37); the triple itself is tighter
        assert abs(Fraction(got_c[i, j]) - exact) <= Fraction(1, 2**36), \
            f"combine error at {i},{j}"

# --- f64: zero rows/columns (scale guard) ---
az = af.copy(); az[3, :] = 0.0
bz = bf.copy(); bz[:, 4] = 0.0
gz = np.asarray(f64_kernel.gemm_f64(jnp.asarray(az), jnp.asarray(bz),
                                    interpret=True))
wz = az @ bz
errz = np.abs(gz - wz) / (K * np.maximum(
    np.abs(az).max(1)[:, None] * np.abs(bz).max(0)[None, :], 1e-300))
assert np.all(gz[3, :] == 0.0) and np.all(gz[:, 4] == 0.0), "zero rows"
assert errz.max() < 2**-50

print("OK")
"""


def test_wide_gemm_numerics_x64_child():
    r = subprocess.run([sys.executable, "-c", _CHILD], capture_output=True,
                       text=True, timeout=600)
    assert r.returncode == 0 and "OK" in r.stdout, (
        r.stdout[-2000:] + "\n" + r.stderr[-4000:])
