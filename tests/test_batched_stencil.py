"""Batched GEMM + stencil solver tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import laser_tpu as lt


class TestBatchedGemm:
    @pytest.mark.parametrize("shape", [(3, 32, 48, 16), (2, 100, 90, 70),
                                       (1, 8, 8, 8)])
    def test_vs_oracle(self, rng, shape):
        B, M, K, N = shape
        a = rng.randn(B, M, K).astype(np.float32)
        b = rng.randn(B, K, N).astype(np.float32)
        got = lt.gemm_batched(a, b)
        want = np.einsum("bmk,bkn->bmn", a.astype(np.float64), b)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-4)

    def test_bf16(self, rng):
        a = jnp.asarray(rng.randn(2, 64, 64), jnp.bfloat16)
        b = jnp.asarray(rng.randn(2, 64, 64), jnp.bfloat16)
        got = lt.gemm_batched(a, b, out_dtype=jnp.float32)
        want = np.einsum("bmk,bkn->bmn",
                         np.asarray(a, np.float64), np.asarray(b, np.float64))
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-2, atol=1e-2)

    def test_int_fallback(self, rng):
        a = rng.randint(-10, 10, (2, 16, 24)).astype(np.int32)
        b = rng.randint(-10, 10, (2, 24, 8)).astype(np.int32)
        got = lt.gemm_batched(a, b)
        want = np.einsum("bmk,bkn->bmn", a.astype(np.int64), b)
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_int8_defaults_to_accumulator_dtype(self, rng):
        # int8 inputs must NOT cast the int32 accumulator back to int8
        # (silent wraparound) when out_dtype is unspecified
        a = rng.randint(-128, 127, (2, 128, 128)).astype(np.int8)
        b = rng.randint(-128, 127, (2, 128, 128)).astype(np.int8)
        got = lt.gemm_batched(a, b)
        assert got.dtype == jnp.int32
        want = np.einsum("bmk,bkn->bmn", a.astype(np.int64), b)
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_shape_mismatch(self):
        with pytest.raises(ValueError):
            lt.gemm_batched(np.zeros((2, 4, 4), np.float32),
                            np.zeros((3, 4, 4), np.float32))


def np_sweep(u, f, method):
    """Numpy oracle for one sweep."""
    un = u.copy()
    R, C = u.shape
    if method == "jacobi":
        src = u
        for i in range(1, R - 1):
            for j in range(1, C - 1):
                un[i, j] = 0.25 * (src[i-1, j] + src[i+1, j] + src[i, j-1]
                                   + src[i, j+1] - f[i, j])
        return un
    # red-black: red first (i+j even) from old, then black from updated
    for parity in (0, 1):
        src = un.copy()
        for i in range(1, R - 1):
            for j in range(1, C - 1):
                if (i + j) % 2 == parity:
                    un[i, j] = 0.25 * (src[i-1, j] + src[i+1, j] + src[i, j-1]
                                       + src[i, j+1] - f[i, j])
    return un


class TestStencil:
    @pytest.mark.parametrize("method", ["jacobi", "redblack"])
    def test_one_sweep_vs_oracle(self, rng, method):
        u = rng.randn(12, 16).astype(np.float32)
        f = rng.randn(12, 16).astype(np.float32)
        got = np.asarray(lt.stencil_solve(u, f, iters=1, method=method))
        want = np_sweep(u.astype(np.float64), f.astype(np.float64), method)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_boundaries_fixed(self, rng):
        u = rng.randn(10, 10).astype(np.float32)
        got = np.asarray(lt.stencil_solve(u, iters=5))
        np.testing.assert_array_equal(got[0], u[0])
        np.testing.assert_array_equal(got[-1], u[-1])
        np.testing.assert_array_equal(got[:, 0], u[:, 0])
        np.testing.assert_array_equal(got[:, -1], u[:, -1])

    def test_converges_to_laplace_solution(self):
        # u=0 boundary, f=0 -> solution is 0 everywhere
        u = np.random.RandomState(0).randn(16, 16).astype(np.float32)
        u[0] = u[-1] = 0
        u[:, 0] = u[:, -1] = 0
        out = np.asarray(lt.stencil_solve(u, iters=500, method="redblack"))
        assert np.abs(out[1:-1, 1:-1]).max() < 1e-4

    def test_iters_compose(self, rng):
        u = rng.randn(12, 12).astype(np.float32)
        f = rng.randn(12, 12).astype(np.float32)
        two = np.asarray(lt.stencil_solve(u, f, iters=2))
        one_one = np.asarray(lt.stencil_solve(
            np.asarray(lt.stencil_solve(u, f, iters=1)), f, iters=1))
        np.testing.assert_allclose(two, one_one, rtol=1e-6, atol=1e-6)

    def test_bad_method(self):
        with pytest.raises(ValueError):
            lt.stencil_solve(np.zeros((4, 4), np.float32), method="wavefront")
