"""GEMM golden-value tests — the 8 matrices of the reference's self-test
suite, ported verbatim (gemm.nim:255-507). They cover M<N, M>N, N=K=M,
multiples of block size, float and int. All products are exact in f32/int32,
so equality is exact."""

import jax.numpy as jnp
import numpy as np
import pytest

import laser_tpu as lt

# (a, b, expected) triplets exactly as in gemm.nim:255-507.
FLOAT_CASES = [
    (
        [[1.0, 2, 3], [1.0, 1, 1], [1.0, 1, 1]],
        [[1.0, 1], [1.0, 1], [1.0, 1]],
        [[6.0, 6], [3.0, 3], [3.0, 3]],
    ),
    (
        [[1.0, 2, 3], [4.0, 5, 6], [7.0, 8, 9]],
        [[1.0, 1], [1.0, 1], [1.0, 1]],
        [[6.0, 6], [15.0, 15], [24.0, 24]],
    ),
    (
        [[1.0, 2, 3], [4.0, 5, 6]],
        [[7.0, 8], [9.0, 10], [11.0, 12]],
        [[58.0, 64], [139.0, 154]],
    ),
]

INT_CASES = [
    # (M x K) * (K x N) with M < N
    (
        [[-2, -3, -1], [3, 0, 4]],
        [[1, 5, 2, -1], [-3, 0, 3, 4], [6, -2, 7, -4]],
        [[1, -8, -20, -6], [27, 7, 34, -19]],
    ),
    # M > N and M > block size
    (
        [[5, 6, 5, 8], [8, 2, 8, 8], [0, 5, 4, 0], [4, 0, 5, 6], [4, 5, 0, 3]],
        [[5, 3, 6, 0], [5, 2, 3, 3], [8, 8, 2, 0], [7, 7, 0, 0]],
        [[151, 123, 58, 18], [170, 148, 70, 6], [57, 42, 23, 15],
         [102, 94, 34, 0], [66, 43, 39, 15]],
    ),
    # wide K
    (
        [[2, 4, 3, 1, 3, 1, 3, 1], [4, 3, 2, 4, 1, 0, 0, 0]],
        [[2, 2], [2, 1], [0, 3], [0, 1], [0, 2], [4, 3], [3, 3], [2, 1]],
        [[27, 37], [14, 23]],
    ),
    # tall output 8x8 from K=2
    (
        [[2, 1], [1, 3], [2, 1], [1, 0], [3, 4], [2, 4], [3, 1], [4, 0]],
        [[2, 2, 0, 4, 0, 0, 4, 2], [2, 1, 2, 1, 2, 4, 4, 1]],
        [[6, 5, 2, 9, 2, 4, 12, 5], [8, 5, 6, 7, 6, 12, 16, 5],
         [6, 5, 2, 9, 2, 4, 12, 5], [2, 2, 0, 4, 0, 0, 4, 2],
         [14, 10, 8, 16, 8, 16, 28, 10], [12, 8, 8, 12, 8, 16, 24, 8],
         [8, 7, 2, 13, 2, 4, 16, 7], [8, 8, 0, 16, 0, 0, 16, 8]],
    ),
    # (N x N) * (N x N) with N multiple of block size
    (
        [[2, 4, 3, 1, 3, 1, 3, 1], [1, 2, 1, 1, 2, 0, 4, 3],
         [2, 0, 0, 3, 0, 4, 4, 1], [1, 1, 4, 0, 3, 1, 3, 0],
         [3, 4, 1, 1, 4, 2, 3, 4], [2, 4, 0, 2, 3, 3, 3, 4],
         [3, 0, 0, 3, 1, 4, 3, 1], [4, 3, 2, 4, 1, 0, 0, 0]],
        [[2, 2, 0, 4, 0, 0, 4, 2], [2, 0, 0, 1, 1, 1, 3, 1],
         [0, 2, 2, 0, 2, 2, 3, 3], [0, 0, 1, 0, 4, 2, 4, 1],
         [0, 0, 1, 3, 4, 2, 4, 2], [4, 3, 4, 1, 4, 4, 0, 3],
         [3, 3, 0, 2, 1, 2, 3, 3], [2, 1, 2, 1, 2, 4, 4, 1]],
        [[27, 23, 16, 29, 35, 32, 58, 37], [24, 19, 11, 23, 26, 30, 49, 27],
         [34, 29, 21, 21, 34, 34, 36, 32], [17, 22, 15, 21, 28, 25, 40, 33],
         [39, 27, 23, 40, 45, 46, 72, 41], [41, 26, 25, 34, 47, 48, 65, 38],
         [33, 28, 22, 26, 37, 34, 41, 33], [14, 12, 9, 22, 27, 17, 51, 23]],
    ),
]


@pytest.mark.parametrize("case", FLOAT_CASES, ids=lambda c: f"f32_{len(c[0])}x{len(c[2][0])}x{len(c[1])}")
def test_golden_float(case):
    a, b, want = (np.asarray(x, np.float32) for x in case)
    M, K = a.shape
    _, N = b.shape
    got = lt.gemm_strided(M, N, K, 1.0, a, K, 1, b, N, 1, 0.0, None, N, 1)
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize("case", INT_CASES, ids=lambda c: f"i32_{len(c[0])}x{len(c[2][0])}x{len(c[1])}")
def test_golden_int(case):
    a, b, want = (np.asarray(x, np.int32) for x in case)
    M, K = a.shape
    _, N = b.shape
    got = lt.gemm_strided(M, N, K, 1, a, K, 1, b, N, 1, 0, None, N, 1)
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize("case", FLOAT_CASES[:2])
def test_golden_prepacked(case):
    # same matrices re-used for the prepacked API, mirroring
    # gemm_prepacked.nim:300-523's pack_and_test
    from laser_tpu.ops.gemm import GemmTiles

    a, b, want = (np.asarray(x, np.float32) for x in case)
    tiles = GemmTiles(bm=128, bn=128, bk=128, vmem_limit_bytes=1 << 24)
    pa = lt.gemm_prepack_a(jnp.asarray(a), tiles=tiles)
    pb = lt.gemm_prepack_b(jnp.asarray(b), tiles=tiles)
    got = lt.gemm_packed(1.0, pa, pb, 0.0)
    np.testing.assert_array_equal(np.asarray(got), want)
