"""GEMM property tests: cross-validation against a float64 oracle (the
analog of laser cross-validating OpenBLAS at 1e-5 mean relative error,
gemm_bench_float32.nim:356-367), plus dtype matrix / strides / epilogues."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import laser_tpu as lt
from laser_tpu.ops.gemm import GemmTiles, plan_tiles
from laser_tpu.utils import mean_relative_error


def oracle(a, b, alpha=1.0, beta=0.0, c=None):
    r = alpha * (a.astype(np.float64) @ b.astype(np.float64))
    if c is not None:
        r = r + beta * c.astype(np.float64)
    return r


class TestGemmF32:
    @pytest.mark.parametrize("mnk", [(8, 8, 8), (96, 80, 72), (130, 67, 259),
                                     (1, 1, 1), (257, 129, 384)])
    def test_vs_oracle(self, rng, mnk):
        M, N, K = mnk
        a = rng.randn(M, K).astype(np.float32)
        b = rng.randn(K, N).astype(np.float32)
        got = lt.gemm(a, b, backend="pallas")
        assert mean_relative_error(np.asarray(got), oracle(a, b)) < 1e-5

    def test_alpha_beta(self, rng):
        M, N, K = 64, 48, 32
        a = rng.randn(M, K).astype(np.float32)
        b = rng.randn(K, N).astype(np.float32)
        c = rng.randn(M, N).astype(np.float32)
        got = lt.gemm(a, b, alpha=2.5, beta=-0.5, c=c)
        assert mean_relative_error(np.asarray(got),
                                   oracle(a, b, 2.5, -0.5, c)) < 1e-5

    def test_small_tiles_multiblock_k(self, rng):
        # force a multi-step K loop to exercise accumulation + k-tail masking
        M, N, K = 100, 90, 300
        a = rng.randn(M, K).astype(np.float32)
        b = rng.randn(K, N).astype(np.float32)
        tiles = GemmTiles(bm=128, bn=128, bk=128, vmem_limit_bytes=1 << 24)
        got = lt.gemm(a, b, tiles=tiles, backend="pallas")
        assert mean_relative_error(np.asarray(got), oracle(a, b)) < 1e-5

    def test_epilogues(self, rng):
        M, N, K = 32, 40, 24
        a = rng.randn(M, K).astype(np.float32)
        b = rng.randn(K, N).astype(np.float32)
        bias = rng.randn(N).astype(np.float32)
        got = lt.gemm(a, b, bias=jnp.asarray(bias), epilogue="relu")
        want = np.maximum(oracle(a, b) + bias[None, :], 0)
        assert mean_relative_error(np.asarray(got), want) < 1e-5

        got_t = lt.gemm(a, b, epilogue="tanh")
        # fused epilogues use the VPU hardware approximations on TPU
        # (tanh ~4e-5 abs; the accurate tier lives in ops/vector_math)
        np.testing.assert_allclose(np.asarray(got_t), np.tanh(oracle(a, b)),
                                   rtol=1e-4, atol=1e-4)


class TestGemmDtypes:
    def test_bf16(self, rng):
        M, N, K = 128, 128, 128
        a = rng.randn(M, K).astype(np.float32)
        b = rng.randn(K, N).astype(np.float32)
        got = lt.gemm(jnp.asarray(a, jnp.bfloat16), jnp.asarray(b, jnp.bfloat16),
                      out_dtype=jnp.float32, backend="pallas")
        # bf16 inputs: tolerance matches bf16 rounding of inputs (~1e-2)
        want = (a.astype(jnp.bfloat16).astype(np.float64)
                @ np.asarray(jnp.asarray(b, jnp.bfloat16), np.float64))
        assert mean_relative_error(np.asarray(got), want) < 1e-6

    def test_int32_exact(self, rng):
        M, N, K = 65, 43, 77
        a = rng.randint(-50, 50, (M, K)).astype(np.int32)
        b = rng.randint(-50, 50, (K, N)).astype(np.int32)
        got = lt.gemm(a, b)
        np.testing.assert_array_equal(np.asarray(got),
                                      a.astype(np.int64) @ b.astype(np.int64))

    def test_int32_wraparound_semantics(self, rng):
        # overflowing products must wrap mod 2^32 exactly like the
        # reference's mullo ukernels (gemm_ukernel_avx512.nim:40-56); the
        # native path decomposes into signed base-256 limbs on the MXU
        M, N, K = 33, 129, 260
        a = rng.randint(-2**31, 2**31, (M, K), dtype=np.int64).astype(np.int32)
        b = rng.randint(-2**31, 2**31, (K, N), dtype=np.int64).astype(np.int32)
        got = np.asarray(lt.gemm(a, b))
        want = ((a.astype(np.int64) @ b.astype(np.int64)) % 2**32)
        want = want.astype(np.uint32).astype(np.int32)
        np.testing.assert_array_equal(got, want)

    def test_int32_alpha_beta_c(self, rng):
        M, N, K = 32, 48, 16
        a = rng.randint(-1000, 1000, (M, K)).astype(np.int32)
        b = rng.randint(-1000, 1000, (K, N)).astype(np.int32)
        c = rng.randint(-1000, 1000, (M, N)).astype(np.int32)
        got = np.asarray(lt.gemm(a, b, alpha=3, beta=-2, c=c))
        want = 3 * (a.astype(np.int64) @ b.astype(np.int64)) - 2 * c
        want = (want % 2**32).astype(np.uint32).astype(np.int32)
        np.testing.assert_array_equal(got, want)

    def test_uint32_exact(self, rng):
        M, N, K = 16, 24, 40
        a = rng.randint(0, 2**32, (M, K), dtype=np.uint64).astype(np.uint32)
        b = rng.randint(0, 2**32, (K, N), dtype=np.uint64).astype(np.uint32)
        got = np.asarray(lt.gemm(a, b))
        assert got.dtype == np.uint32
        want = ((a.astype(np.uint64) @ b.astype(np.uint64))
                % 2**32).astype(np.uint32)
        np.testing.assert_array_equal(got, want)

    def test_int64_f64_paths_with_x64(self):
        # int64/f64 require jax_enable_x64 (off by default, and a global
        # flag) — prove the XLA-fallback paths work in a child process.
        # TPU has no native f64/int64 arithmetic; these are the
        # exactness-preserving fallbacks (the reference's generic ukernel
        # analog), documented in PARITY.md.
        import subprocess
        import sys

        code = """
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")
import numpy as np
import laser_tpu as lt

rng = np.random.RandomState(0xDEADBEEF)
a = rng.randint(-2**40, 2**40, (16, 24)).astype(np.int64)
b = rng.randint(-2**40, 2**40, (24, 8)).astype(np.int64)
got = np.asarray(lt.gemm(a, b))
want_obj = a.astype(object) @ b.astype(object)
want = np.asarray([[int(x) % 2**64 for x in row] for row in want_obj],
                  dtype=np.uint64).astype(np.int64)
assert got.dtype == np.int64, got.dtype
assert np.array_equal(got, want), "int64 wraparound mismatch"

af = rng.randn(32, 16).astype(np.float64)
bf = rng.randn(16, 20).astype(np.float64)
gotf = np.asarray(lt.gemm(af, bf))
assert gotf.dtype == np.float64
assert np.abs(gotf - af @ bf).max() < 1e-12
print("OK")
"""
        r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=300)
        assert r.returncode == 0 and "OK" in r.stdout, r.stderr[-2000:]

    def test_int32_transposed_operands(self, rng):
        M, N, K = 20, 30, 40
        a = rng.randint(-100, 100, (M, K)).astype(np.int32)
        b = rng.randint(-100, 100, (K, N)).astype(np.int32)
        got = np.asarray(lt.gemm(np.ascontiguousarray(a.T), b,
                                 transpose_a=True))
        np.testing.assert_array_equal(
            got, a.astype(np.int64) @ b.astype(np.int64))

    def test_int8_to_int32(self, rng):
        M, N, K = 128, 128, 128
        a = rng.randint(-20, 20, (M, K)).astype(np.int8)
        b = rng.randint(-20, 20, (K, N)).astype(np.int8)
        got = lt.gemm(a, b, backend="pallas")
        assert got.dtype == jnp.int32
        np.testing.assert_array_equal(
            np.asarray(got), a.astype(np.int32) @ b.astype(np.int32))


class TestGemmStrided:
    def test_every_second_row(self, rng):
        # the README's strided flagship scenario (README.md:211-213):
        # multiply every-2nd-row slices without copies on the caller side
        M, N, K = 16, 12, 10
        abuf = rng.randn(2 * M, K).astype(np.float32)
        bbuf = rng.randn(K, N).astype(np.float32)
        got = lt.gemm_strided(M, N, K, 1.0,
                              abuf, 2 * K, 1,   # row stride 2*K = skip rows
                              bbuf, N, 1,
                              0.0, None, N, 1)
        assert mean_relative_error(np.asarray(got), oracle(abuf[::2], bbuf)) < 1e-5

    def test_transposed_b(self, rng):
        M, N, K = 24, 36, 48
        a = rng.randn(M, K).astype(np.float32)
        bt = rng.randn(N, K).astype(np.float32)  # row-major (N,K) = B^T
        got = lt.gemm_strided(M, N, K, 1.0, a, K, 1, bt, 1, K, 0.0, None, N, 1)
        assert mean_relative_error(np.asarray(got), oracle(a, bt.T)) < 1e-5

    def test_beta_accumulate(self, rng):
        M, N, K = 20, 20, 20
        a = rng.randn(M, K).astype(np.float32)
        b = rng.randn(K, N).astype(np.float32)
        c = rng.randn(M, N).astype(np.float32)
        got = lt.gemm_strided(M, N, K, 1.0, a, K, 1, b, N, 1, 1.0, c, N, 1)
        assert mean_relative_error(np.asarray(got), oracle(a, b, 1.0, 1.0, c)) < 1e-5


class TestPrepacked:
    def test_matches_unpacked(self, rng):
        M, N, K = 100, 120, 90
        a = rng.randn(M, K).astype(np.float32)
        b = rng.randn(K, N).astype(np.float32)
        tiles = plan_tiles(M, N, K, np.float32)
        pa = lt.gemm_prepack_a(jnp.asarray(a), tiles=tiles)
        pb = lt.gemm_prepack_b(jnp.asarray(b), tiles=tiles)
        got = lt.gemm_packed(1.0, pa, pb)
        assert mean_relative_error(np.asarray(got), oracle(a, b)) < 1e-5

    def test_reuse_across_multiplies(self, rng):
        K, N = 64, 80
        b = rng.randn(K, N).astype(np.float32)
        tiles = GemmTiles(bm=128, bn=128, bk=128, vmem_limit_bytes=1 << 24)
        pb = lt.gemm_prepack_b(jnp.asarray(b), tiles=tiles)
        for M in (32, 64):
            a = rng.randn(M, K).astype(np.float32)
            pa = lt.gemm_prepack_a(jnp.asarray(a), tiles=tiles)
            got = lt.gemm_packed(1.0, pa, pb)
            assert mean_relative_error(np.asarray(got), oracle(a, b)) < 1e-5


class TestTilePlanner:
    def test_alignment_and_fit(self):
        t = plan_tiles(4096, 4096, 4096, np.float32)
        assert t.bm % 128 == 0 and t.bn % 128 == 0 and t.bk % 128 == 0
        assert t.grid(4096, 4096, 4096)[0] >= 1

    def test_small_problem(self):
        t = plan_tiles(8, 8, 8, np.float32)
        assert t.bm == 128 and t.bn == 128  # rounded to MXU alignment


class TestTransposedOperands:
    """In-place transposed contraction (no HBM transpose materialization)."""

    def test_transpose_a(self, rng):
        M, N, K = 48, 40, 56
        at = rng.randn(K, M).astype(np.float32)  # stored (K, M)
        b = rng.randn(K, N).astype(np.float32)
        got = lt.gemm(at, b, transpose_a=True, backend="pallas")
        assert mean_relative_error(np.asarray(got), oracle(at.T, b)) < 1e-5

    def test_transpose_b(self, rng):
        M, N, K = 48, 40, 56
        a = rng.randn(M, K).astype(np.float32)
        bt = rng.randn(N, K).astype(np.float32)  # stored (N, K)
        got = lt.gemm(a, bt, transpose_b=True, backend="pallas")
        assert mean_relative_error(np.asarray(got), oracle(a, bt.T)) < 1e-5

    def test_both_with_tails(self, rng):
        M, N, K = 67, 43, 91
        at = rng.randn(K, M).astype(np.float32)
        bt = rng.randn(N, K).astype(np.float32)
        got = lt.gemm(at, bt, transpose_a=True, transpose_b=True, backend="pallas")
        assert mean_relative_error(np.asarray(got), oracle(at.T, bt.T)) < 1e-5

    def test_strided_colmajor_uses_transpose_path(self, rng):
        # gemm_strided with col-major B: strides (1, K) -> zero-copy path
        M, N, K = 24, 36, 48
        a = rng.randn(M, K).astype(np.float32)
        bt = rng.randn(N, K).astype(np.float32)
        got = lt.gemm_strided(M, N, K, 1.0, a, K, 1, bt, 1, K, 0.0, None, N, 1)
        assert mean_relative_error(np.asarray(got), oracle(a, bt.T)) < 1e-5

    def test_auto_dispatch(self, rng):
        # default backend: plain matmul -> XLA (faster on current Mosaic),
        # fused epilogue/bias/C -> Pallas; both must match the oracle
        M, N, K = 96, 64, 80
        a = rng.randn(M, K).astype(np.float32)
        b = rng.randn(K, N).astype(np.float32)
        bias = rng.randn(N).astype(np.float32)
        plain = lt.gemm(a, b)
        assert mean_relative_error(np.asarray(plain), oracle(a, b)) < 1e-5
        fused = lt.gemm(a, b, bias=jnp.asarray(bias), epilogue="relu")
        want = np.maximum(oracle(a, b) + bias[None, :], 0)
        assert mean_relative_error(np.asarray(fused), want) < 1e-5
        with pytest.raises(ValueError):
            lt.gemm(a, b, backend="mxu")

    def test_xla_backend_transposes(self, rng):
        M, N, K = 16, 20, 24
        at = rng.randn(K, M).astype(np.float32)
        b = rng.randn(K, N).astype(np.float32)
        got = lt.gemm(at, b, transpose_a=True, backend="xla")
        assert mean_relative_error(np.asarray(got), oracle(at.T, b)) < 1e-5

    def test_measured_dispatch_consults_autotune_record(self, rng, monkeypatch):
        # backend=None routes plain matmuls through the MEASURED winner
        # recorded by autotune_gemm (which races Pallas tiles vs the XLA
        # emitter), not a hardcoded heuristic
        from laser_tpu.ops.gemm import autotune
        from laser_tpu.device_info import detect

        M = N = K = 128
        gen = detect().generation
        key = f"{M}x{N}x{K}:float32:{gen}"
        tiles = GemmTiles(128, 128, 128, 64 * 1024 * 1024)
        monkeypatch.setitem(autotune._CACHE, key, (tiles, "pallas"))
        assert autotune.cached_backend(M, N, K, np.float32) == "pallas"
        assert autotune.cached_tiles(M, N, K, np.float32) is tiles

        calls = []
        real = autotune.cached_backend

        def spy(*a):
            r = real(*a)
            calls.append(r)
            return r

        monkeypatch.setattr("laser_tpu.ops.gemm.autotune.cached_backend", spy)
        a = rng.randn(M, K).astype(np.float32)
        b = rng.randn(K, N).astype(np.float32)
        got = lt.gemm(a, b)  # auto dispatch -> measured record -> pallas
        assert calls == ["pallas"]
        assert mean_relative_error(np.asarray(got), oracle(a, b)) < 1e-5
        # an "xla" record routes to the emitter; unknown shape -> default
        monkeypatch.setitem(autotune._CACHE, key, (tiles, "xla"))
        got2 = lt.gemm(a, b)
        assert calls[-1] == "xla"
        assert mean_relative_error(np.asarray(got2), oracle(a, b)) < 1e-5
