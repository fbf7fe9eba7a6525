"""Vector-math numerics tests.

The acceptance bar is SURVEY §6's: <= 1e-6 relative error vs the float64
libm oracle over the full clamp range including the ±88 boundaries, plus the
reference's special-value semantics (exp_log_avx2.nim:29-47 fast_clamp:
+inf -> huge, -inf -> ~0, NaN propagates)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import laser_tpu as lt
from laser_tpu.ops.vector_math import EXP_MAX, EXP_MIN
from laser_tpu.utils import max_relative_error


class TestExp:
    def test_accuracy_full_range(self):
        x = np.linspace(-87.0, 88.0, 200_001).astype(np.float32)
        got = np.asarray(lt.exp(x), np.float64)
        want = np.exp(x.astype(np.float64))
        assert max_relative_error(got, want) < 1e-6

    def test_accuracy_near_zero(self):
        x = np.linspace(-1e-3, 1e-3, 10_001).astype(np.float32)
        got = np.asarray(lt.exp(x), np.float64)
        assert max_relative_error(got, np.exp(x.astype(np.float64))) < 1e-7

    def test_boundaries_and_clamp(self):
        x = np.asarray([EXP_MIN, EXP_MAX, -100.0, 100.0, 0.0], np.float32)
        got = np.asarray(lt.exp(x))
        # beyond ±88 the reference clamps: exp(100) == exp(88), exp(-100) == exp(-88).
        # exp(-88) ~= 6.05e-39 is SUBNORMAL in f32: the VPU (like most
        # accelerators) flushes subnormal results to zero, so we accept either
        # the subnormal value or 0 (absolute error < 1e-38 — documented FTZ
        # semantics; the x86 reference produces the subnormal).
        np.testing.assert_allclose(got[3], np.float32(np.exp(88.0)), rtol=1e-6)
        assert abs(got[2] - np.exp(np.float64(-88.0))) < 1e-38
        assert abs(got[0] - np.exp(np.float64(-88.0))) < 1e-38
        assert got[4] == 1.0

    def test_specials(self):
        x = np.asarray([np.nan, np.inf, -np.inf], np.float32)
        got = np.asarray(lt.exp(x))
        assert np.isnan(got[0])
        assert got[1] == np.float32(np.exp(88.0))  # +inf -> clamp -> huge
        assert abs(got[2] - np.exp(np.float64(-88.0))) < 1e-38  # -inf -> ~0 (FTZ)

    def test_matches_reference_lut_algorithm(self):
        """Cross-validate against a NumPy port of the reference's ALGORITHM:
        the fmath-style 2^(1/1024)-grid LUT exp (exp_log_common.nim:26-46 +
        exp_log_avx2.nim:52-65). The port IS the reference computation —
        range reduction by 1024/ln2 with round-to-nearest (cvtps2dq), 10-bit
        mantissa LUT, exponent reassembly, linear remainder term — so this
        checks our polynomial core agrees with the reference's table method
        to the combined error budget (LUT algo ~1.5e-7 rel, ours <=1e-6)."""
        EXP_BITS = 10
        GRID = 1 << EXP_BITS                       # ExpBitsMask = 1024
        ln2 = np.float32(np.log(np.float32(2.0)))
        exp_a = np.float32(GRID) / ln2             # ExpA
        exp_b = ln2 / np.float32(GRID)             # ExpB
        # initExpLUT: mantissa bits of 2^(i/1024), f32
        i = np.arange(GRID, dtype=np.float32)
        lut = (np.float32(2.0) ** (i / np.float32(GRID))).view(np.int32) \
            & ((1 << 23) - 1)

        def lut_exp(x: np.ndarray) -> np.ndarray:
            x = np.clip(x, -88.0, 88.0).astype(np.float32)
            r = np.rint(x * exp_a).astype(np.int32)     # cvtps2dq: nearest
            t = x - r.astype(np.float32) * exp_b + np.float32(1.0)
            v = r & (GRID - 1)
            u = ((r + (127 << EXP_BITS)) >> EXP_BITS) << 23
            return t * (lut[v] | u).view(np.float32)

        # Measured error budget of the LUT algorithm itself (vs f64 exp):
        # 2.7e-7 rel for |x|<=1, but 4.1e-6 at large |x| — f32 cancellation
        # in the remainder x - r*ExpB (ulp(88)/2 ~ 3.8e-6). So: tight 1e-6
        # -class parity where the oracle is itself 1e-6-faithful, summed
        # budgets on the full range.
        x = np.linspace(-1.0, 1.0, 100_001).astype(np.float32)
        got = np.asarray(lt.exp(x), np.float64)
        want = lut_exp(x).astype(np.float64)
        assert max_relative_error(got, want) < 1.3e-6
        xf = np.linspace(-87.0, 88.0, 100_001).astype(np.float32)
        gotf = np.asarray(lt.exp(xf), np.float64)
        wantf = lut_exp(xf).astype(np.float64)
        assert max_relative_error(gotf, wantf) < 5.2e-6
        # the port is faithful to true exp within its own measured budget
        assert max_relative_error(wantf, np.exp(xf.astype(np.float64))) < 4.5e-6


class TestLog:
    def test_accuracy(self):
        x = np.concatenate([
            np.logspace(-37, 38, 100_001),
            np.linspace(0.5, 2.0, 50_001),  # dense around 1 where log -> 0
        ]).astype(np.float32)
        got = np.asarray(lt.log(x), np.float64)
        want = np.log(x.astype(np.float64))
        err = np.abs(got - want)
        rel = err / np.maximum(np.abs(want), 1e-30)
        # near log(x)=0 use absolute error (rel blows up at the root)
        assert np.all((rel < 1e-6) | (err < 1e-7))

    def test_specials(self):
        x = np.asarray([0.0, -1.0, np.inf, np.nan], np.float32)
        got = np.asarray(lt.log(x))
        assert got[0] == -np.inf
        assert np.isnan(got[1])
        assert got[2] == np.inf
        assert np.isnan(got[3])


class TestTanhSigmoid:
    def test_tanh(self):
        x = np.linspace(-30, 30, 100_001).astype(np.float32)
        got = np.asarray(lt.tanh(x), np.float64)
        want = np.tanh(x.astype(np.float64))
        assert np.max(np.abs(got - want)) < 1e-6  # |tanh|<=1: abs error bar

    def test_sigmoid(self):
        x = np.linspace(-30, 30, 100_001).astype(np.float32)
        got = np.asarray(lt.sigmoid(x), np.float64)
        want = 1 / (1 + np.exp(-x.astype(np.float64)))
        assert np.max(np.abs(got - want)) < 1e-6

    def test_sign_symmetry(self):
        x = np.linspace(0, 20, 1001).astype(np.float32)
        t = np.asarray(lt.tanh(np.concatenate([x, -x])))
        np.testing.assert_array_equal(t[:1001], -t[1001:])


class TestSoftmax:
    @pytest.mark.parametrize("shape", [(4, 128), (3, 1000), (17, 50), (2, 3, 40)])
    def test_vs_oracle(self, rng, shape):
        x = (rng.randn(*shape) * 5).astype(np.float32)
        got = np.asarray(lt.softmax(x), np.float64)
        e = np.exp(x.astype(np.float64) - x.max(-1, keepdims=True))
        want = e / e.sum(-1, keepdims=True)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)

    def test_rows_sum_to_one(self, rng):
        x = (rng.randn(33, 257) * 10).astype(np.float32)
        s = np.asarray(lt.softmax(x)).sum(-1)
        np.testing.assert_allclose(s, 1.0, rtol=1e-5)

    def test_large_negative_stability(self):
        x = np.full((8, 128), -1000.0, np.float32)
        got = np.asarray(lt.softmax(x))
        np.testing.assert_allclose(got, 1.0 / 128, rtol=1e-5)

    @pytest.mark.parametrize("shape", [(16, 1000), (9, 300), (8, 131149)])
    def test_online_blockwise_kernel(self, rng, shape):
        # the VMEM-overflow path: streaming (m, l) accumulation then a
        # second emit sweep — must match jax.nn.softmax on any row length,
        # including row and column tails
        from laser_tpu.ops.vector_math import _softmax_online

        R, C = shape
        x = (rng.randn(R, C) * 3).astype(np.float32)
        got = np.asarray(_softmax_online(jnp.asarray(x), R, C, True))
        want = np.asarray(jax.nn.softmax(jnp.asarray(x), axis=-1))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)

    def test_huge_rows_route_to_online(self, rng):
        # rows past the single-block VMEM budget must take the fused online
        # kernel (not an XLA fallback) and stay correct. On the cpu-sim
        # budget (11MB) a 65536-wide row overflows the single block.
        x = (rng.randn(4, 65536) * 3).astype(np.float32)
        got = np.asarray(lt.softmax(x))
        want = np.asarray(jax.nn.softmax(jnp.asarray(x), axis=-1))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


class TestBf16Smoke:
    def test_exp_bf16(self):
        x = jnp.asarray(np.linspace(-5, 5, 1024), jnp.bfloat16)
        got = np.asarray(lt.exp(x), np.float32)
        want = np.exp(np.asarray(x, np.float32))
        assert np.max(np.abs(got - want) / np.maximum(want, 1e-6)) < 0.02
