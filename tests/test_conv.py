"""Convolution tests: the reference's two golden cases
(conv2d_common.nim:139-283) for BOTH the im2col and direct paths, plus
random cross-validation against lax.conv (the vendor-library oracle role
OpenBLAS plays in the reference benches)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import laser_tpu as lt
from laser_tpu.ops.conv import conv2d_out_shape, conv2d_required_ops

# Golden case 1 (conv2d_common.nim:146-186): 4x4 input, 3x3 kernel, pad 1, stride 1
G1_INPUT = np.asarray([[1, 2, 0, 0], [5, 3, 0, 4], [0, 0, 0, 7], [9, 3, 0, 0]],
                      np.float32).reshape(1, 1, 4, 4)
G1_KERNEL = np.asarray([[1, 1, 1], [1, 1, 0], [1, 0, 0]],
                       np.float32).reshape(1, 1, 3, 3)
G1_TARGET = np.asarray([[1, 8, 5, 0], [8, 11, 5, 4], [8, 17, 10, 11],
                        [9, 12, 10, 7]], np.float32).reshape(1, 1, 4, 4)

# Golden case 2 (conv2d_common.nim:188-283): 3-channel 5x5, 2 out-channels,
# 3x3 kernel, pad 1, stride 2
G2_INPUT = np.asarray([
    [[2, 2, 0, 2, 1], [0, 1, 1, 0, 2], [1, 2, 1, 2, 1], [2, 2, 0, 0, 2],
     [2, 1, 1, 1, 2]],
    [[2, 0, 1, 1, 1], [2, 2, 0, 0, 2], [2, 2, 1, 0, 0], [1, 1, 2, 2, 0],
     [2, 1, 1, 1, 0]],
    [[0, 1, 2, 2, 0], [1, 1, 1, 1, 0], [2, 1, 2, 2, 0], [0, 2, 2, 2, 1],
     [0, 0, 2, 2, 1]],
], np.float32).reshape(1, 3, 5, 5)
G2_KERNEL = np.asarray([
    [[[-1, -1, -1], [1, 0, 1], [0, -1, 0]],
     [[1, 0, -1], [1, -1, 1], [0, 1, 0]],
     [[0, 0, 1], [-1, -1, -1], [-1, 0, 0]]],
    [[[0, 1, 0], [1, -1, -1], [1, 1, -1]],
     [[-1, 0, 1], [-1, -1, 1], [1, 1, 0]],
     [[0, 1, 1], [-1, 1, -1], [-1, -1, 0]]],
], np.float32)
G2_TARGET = np.asarray([
    [[1, -3, -1], [-4, 1, -6], [-3, -2, -1]],
    [[-7, 1, 0], [3, -3, 2], [1, 3, -2]],
], np.float32).reshape(1, 2, 3, 3)


class TestShapes:
    def test_out_shape(self):
        assert conv2d_out_shape((1, 1, 4, 4), (1, 1, 3, 3), (1, 1), (1, 1)) == \
            (1, 1, 4, 4)
        assert conv2d_out_shape((1, 3, 5, 5), (2, 3, 3, 3), (1, 1), (2, 2)) == \
            (1, 2, 3, 3)

    def test_ops_formula(self):
        # N*C_out*kH*kW*C_in*oH*oW*2 (conv2d_common.nim:48-81)
        assert conv2d_required_ops((1, 1, 4, 4), (1, 1, 3, 3), (1, 1), (1, 1)) == \
            1 * 1 * 3 * 3 * 1 * 4 * 4 * 2


@pytest.mark.parametrize("conv", [lt.conv2d_im2col, lt.conv2d_direct],
                         ids=["im2col", "direct"])
class TestGolden:
    def test_case1(self, conv):
        got = conv(G1_INPUT, G1_KERNEL, padding=(1, 1), strides=(1, 1))
        np.testing.assert_array_equal(np.asarray(got), G1_TARGET)

    def test_case2_strided_multichannel(self, conv):
        got = conv(G2_INPUT, G2_KERNEL, padding=(1, 1), strides=(2, 2))
        np.testing.assert_array_equal(np.asarray(got), G2_TARGET)


class TestVsXLA:
    @pytest.mark.parametrize("cfg", [
        ((2, 3, 16, 16), (8, 3, 3, 3), (1, 1), (1, 1)),
        ((1, 4, 13, 17), (6, 4, 5, 5), (2, 2), (1, 1)),
        ((2, 8, 20, 20), (16, 8, 3, 3), (0, 0), (2, 2)),
    ])
    @pytest.mark.parametrize("conv", [lt.conv2d_im2col, lt.conv2d_direct],
                             ids=["im2col", "direct"])
    def test_random(self, rng, cfg, conv):
        ishape, kshape, padding, strides = cfg
        x = rng.randn(*ishape).astype(np.float32)
        w = rng.randn(*kshape).astype(np.float32)
        got = conv(x, w, padding=padding, strides=strides)
        want = jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), window_strides=strides,
            padding=[(padding[0], padding[0]), (padding[1], padding[1])],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=jax.lax.Precision.HIGHEST)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


class TestStridedDirect:
    """Phase-decomposed strided direct conv + the 1x1-conv-as-GEMM path."""

    @pytest.mark.parametrize("cfg", [
        ((2, 8, 20, 20), (16, 8, 3, 3), (1, 1), (2, 2)),
        ((1, 4, 17, 19), (6, 4, 5, 5), (2, 2), (3, 2)),
        ((2, 3, 33, 33), (8, 3, 3, 3), (1, 1), (2, 2)),
    ])
    def test_phases_vs_xla(self, rng, cfg):
        ishape, kshape, padding, strides = cfg
        x = rng.randn(*ishape).astype(np.float32)
        w = rng.randn(*kshape).astype(np.float32)
        got = lt.conv2d_direct(x, w, padding=padding, strides=strides)
        want = jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), strides,
            [(padding[0], padding[0]), (padding[1], padding[1])],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=jax.lax.Precision.HIGHEST)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_1x1_is_gemm(self, rng):
        x = rng.randn(2, 16, 8, 8).astype(np.float32)
        w = rng.randn(32, 16, 1, 1).astype(np.float32)
        got = lt.conv2d_direct(x, w)
        want = np.einsum("oc,nchw->nohw", w[:, :, 0, 0].astype(np.float64),
                         x.astype(np.float64))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


class TestTrainable:
    """conv2d_trainable: native forward; stride-1 backward is two more
    native convolutions (rotated-kernel dx, axis-swapped dw); strided
    backward routes through XLA's exact gradient."""

    @pytest.mark.parametrize("cfg", [
        ((2, 3, 12, 12), (8, 3, 3, 3), (0, 0), (1, 1)),
        ((1, 4, 11, 13), (6, 4, 5, 5), (2, 2), (1, 1)),
        ((2, 8, 10, 10), (4, 8, 3, 3), (1, 1), (1, 1)),
        ((2, 3, 16, 16), (8, 3, 3, 3), (1, 1), (2, 2)),  # strided: XLA bwd
    ])
    def test_grads_match_xla(self, rng, cfg):
        ishape, kshape, padding, strides = cfg
        x = jnp.asarray(rng.randn(*ishape), jnp.float32)
        w = jnp.asarray(rng.randn(*kshape), jnp.float32)

        def f(x, w):
            return jnp.sum(lt.conv2d_trainable(x, w, padding, strides) ** 2)

        def ref(x, w):
            return jnp.sum(jax.lax.conv_general_dilated(
                x, w, strides,
                [(padding[0], padding[0]), (padding[1], padding[1])],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                precision=jax.lax.Precision.HIGHEST) ** 2)

        got = jax.grad(f, argnums=(0, 1))(x, w)
        want = jax.grad(ref, argnums=(0, 1))(x, w)
        for gg, ww in zip(got, want):
            np.testing.assert_allclose(np.asarray(gg), np.asarray(ww),
                                       rtol=2e-4, atol=2e-4)

    def test_value_matches_direct(self, rng):
        x = jnp.asarray(rng.randn(2, 3, 12, 12), jnp.float32)
        w = jnp.asarray(rng.randn(8, 3, 3, 3), jnp.float32)
        got = lt.conv2d_trainable(x, w, (1, 1), (1, 1))
        want = lt.conv2d_direct(x, w, padding=(1, 1))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
