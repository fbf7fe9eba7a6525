"""Layout-kernel tests (swapaxes.nim coverage)."""

import jax.numpy as jnp
import numpy as np
import pytest

import laser_tpu as lt


class TestTranspose2D:
    @pytest.mark.parametrize("shape", [(128, 128), (256, 512), (100, 37),
                                       (7, 300), (1, 1)])
    def test_vs_numpy(self, rng, shape):
        x = rng.randn(*shape).astype(np.float32)
        got = lt.transpose2d(x)
        np.testing.assert_array_equal(np.asarray(got), x.T)

    def test_bf16(self, rng):
        x = jnp.asarray(rng.randn(64, 192), jnp.bfloat16)
        got = lt.transpose2d(x)
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(x, np.float32).T)


class TestBatched:
    @pytest.mark.parametrize("shape", [(4, 64, 64), (3, 100, 50), (1, 5, 7)])
    def test_vs_numpy(self, rng, shape):
        x = rng.randn(*shape).astype(np.float32)
        got = lt.transpose2d_batched(x)
        np.testing.assert_array_equal(np.asarray(got), x.transpose(0, 2, 1))


class TestLayoutConversions:
    def test_nchw2nhwc(self, rng):
        x = rng.randn(2, 3, 16, 20).astype(np.float32)
        got = lt.nchw2nhwc(x)
        np.testing.assert_array_equal(np.asarray(got), x.transpose(0, 2, 3, 1))

    def test_nhwc2nchw(self, rng):
        x = rng.randn(2, 16, 20, 3).astype(np.float32)
        got = lt.nhwc2nchw(x)
        np.testing.assert_array_equal(np.asarray(got), x.transpose(0, 3, 1, 2))

    def test_roundtrip(self, rng):
        x = rng.randn(2, 5, 9, 11).astype(np.float32)
        back = lt.nhwc2nchw(lt.nchw2nhwc(x))
        np.testing.assert_array_equal(np.asarray(back), x)


class TestTriangularIndexInversion:
    """The paired-swap kernel maps a flat pair index p -> (row, col) in the
    upper triangle via fp sqrt + integer correction; verify the formula is
    exact for every p at realistic block counts."""

    @pytest.mark.parametrize("nt", [1, 2, 3, 7, 16, 64, 181])
    def test_exact(self, nt):
        import math

        P = nt * (nt + 1) // 2
        want = [(r, c) for c in range(nt) for r in range(c + 1)]
        want = sorted((c * (c + 1) // 2 + r, (r, c)) for (r, c) in want)
        for p, (r_want, c_want) in want:
            pf = np.float32(p)
            i = int(np.floor((np.sqrt(8.0 * pf + 1.0) - 1.0) / 2.0))
            if (i + 1) * (i + 2) // 2 <= p:
                i += 1
            if i * (i + 1) // 2 > p:
                i -= 1
            row = p - i * (i + 1) // 2
            col = i
            assert (row, col) == (r_want, c_want), (p, row, col)
        assert len(want) == P


class TestInplacePipelined:
    """Software-pipelined in-place paired-swap kernel (double-buffered
    manual DMA): must match x.T bit-exactly for every tile/size combo."""

    @pytest.mark.parametrize("N,T", [(256, 128), (512, 256), (512, 512),
                                     (768, 256)])
    def test_matches_transpose(self, N, T):
        from laser_tpu.ops.transpose import _build_inplace_transpose_pipelined

        x = jnp.asarray(np.random.RandomState(0).randn(N, N), jnp.float32)
        got = _build_inplace_transpose_pipelined(N, T, "float32", True)(x)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(x).T)

    def test_single_block(self):
        # P == 1: the drain branch with no predecessor
        from laser_tpu.ops.transpose import _build_inplace_transpose_pipelined

        x = jnp.asarray(np.random.RandomState(1).randn(128, 128), jnp.float32)
        got = _build_inplace_transpose_pipelined(128, 128, "float32", True)(x)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(x).T)
