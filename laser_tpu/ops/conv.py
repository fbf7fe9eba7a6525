"""2D convolution: im2col+GEMM and direct Pallas paths.

Rebuild of the reference's convolution benchmarks-as-primitives
(benchmarks/convolution/conv2d_im2col.nim:10-102,
conv2d_direct_convolution.nim:8-74, shape/op formulas conv2d_common.nim:15-101).
Layout convention matches the reference: NCHW activations, OIHW kernels.

* ``conv2d_im2col``: lowers to one big MXU GEMM — patches matrix
  (N*oH*oW, C*kH*kW) x weights (C*kH*kW, c_out) — the path the reference
  found ~8x faster than direct on CPU (20.6 vs 2.59 GFLOP/s,
  conv2d_bench.nim:130-170); same story on TPU where it rides the flagship
  GEMM kernel.
* ``conv2d_direct``: a Pallas kernel computing the conv as kH*kW shifted
  (oH*oW, C_in)x(C_in, C_out) contractions accumulated in VMEM (stride-1
  fast path; strided convs take the im2col path, which is also what the
  reference benchmarks crown as the production choice).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import should_interpret
from ..registry import build_cache
from .gemm import gemm


def _rup(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def conv2d_out_shape(ishape, kshape, padding, strides) -> Tuple[int, int, int, int]:
    """(reference: conv2d_common.nim:15-46)"""
    n, c, h, w = ishape
    c_out, c_in, kh, kw = kshape
    ph, pw = padding
    sh, sw = strides
    oh = 1 + (h + 2 * ph - kh) // sh
    ow = 1 + (w + 2 * pw - kw) // sw
    return (n, c_out, oh, ow)


def conv2d_required_ops(ishape, kshape, padding, strides) -> int:
    """FLOP count formula (reference: conv2d_common.nim:48-81)."""
    n, c_in, _, _ = ishape
    c_out, _, kh, kw = kshape
    _, _, oh, ow = conv2d_out_shape(ishape, kshape, padding, strides)
    return n * c_out * kh * kw * c_in * oh * ow * 2


def _im2col(x: jax.Array, kh: int, kw: int, padding, strides) -> jax.Array:
    """Build the (N*oH*oW, C*kH*kW) patch matrix with kH*kW strided slices
    (the XLA-fused equivalent of the reference's im2col loop,
    conv2d_im2col.nim:10-57)."""
    N, C, H, W = x.shape
    ph, pw = padding
    sh, sw = strides
    xp = jnp.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw)))
    _, _, oh, ow = conv2d_out_shape((N, C, H, W), (1, C, kh, kw), padding, strides)
    cols = []
    for i in range(kh):
        for j in range(kw):
            sl = jax.lax.slice(
                xp, (0, 0, i, j),
                (N, C, i + (oh - 1) * sh + 1, j + (ow - 1) * sw + 1),
                (1, 1, sh, sw))  # (N, C, oH, oW)
            cols.append(sl)
    # (kH*kW, N, C, oH, oW) -> (N, oH, oW, C, kH*kW) -> (N*oH*oW, C*kH*kW)
    patches = jnp.stack(cols, axis=0).transpose(1, 3, 4, 2, 0)
    return patches.reshape(N * oh * ow, C * kh * kw), oh, ow


def conv2d_im2col(x: jax.Array, w: jax.Array, padding=(0, 0), strides=(1, 1),
                  **gemm_kwargs) -> jax.Array:
    """x: (N,C,H,W), w: (c_out, C, kH, kW) -> (N, c_out, oH, oW)."""
    x = jnp.asarray(x)
    w = jnp.asarray(w)
    N, C, H, W = x.shape
    c_out, c_in, kh, kw = w.shape
    assert c_in == C, f"channel mismatch {c_in} vs {C}"
    patches, oh, ow = _im2col(x, kh, kw, padding, strides)
    # weights (c_out, C, kH, kW) -> (C*kH*kW, c_out) matching patch layout
    wm = w.reshape(c_out, c_in, kh * kw).transpose(1, 2, 0).reshape(c_in * kh * kw, c_out)
    out = gemm(patches, wm, **gemm_kwargs)  # (N*oH*oW, c_out)
    return out.reshape(N, oh, ow, c_out).transpose(0, 3, 1, 2)


@build_cache
def _build_planewise_conv(N: int, C: int, HP: int, WP: int, c_out: int,
                          kh: int, kw: int, oh: int, ow: int, dtype: str,
                          interpret: bool):
    """Small-channel direct conv: NCHW planes, one VPU FMA per (co,ci,kh,kw)
    tap over the (oH,oW) plane.

    For C_in*kH*kW << 128 the MXU formulations waste the systolic array
    (3/128 lanes busy) and NHWC layouts lane-pad C to 128 (42x memory).
    Planewise keeps (H,W) as the tiled dims — zero padding waste — and runs
    taps*C_out shifted plane-FMAs; measured ~4x the XLA conv on the
    reference's N16 C3->20 224^2 config. This is the true analog of the
    reference's direct convolution loop nest (conv2d_direct_convolution.nim:
    8-74), vectorized over the image plane instead of the channel dim.
    """
    dt = jnp.dtype(dtype)

    def kernel(x_ref, w_ref, o_ref, acc_ref):
        # x_ref: (1, C, HP, WP); w_ref: (c_out, C, kh, kw) in SMEM scalars;
        # acc_ref: (c_out, oh, ow) f32 scratch.
        def per_co(co, _):
            acc = jnp.zeros((oh, ow), jnp.float32)
            for ci in range(C):
                for i in range(kh):
                    for j in range(kw):
                        plane = x_ref[0, ci, i:i + oh, j:j + ow]
                        acc = acc + w_ref[co, ci, i, j] * plane.astype(
                            jnp.float32)
            acc_ref[co] = acc
            return 0

        jax.lax.fori_loop(0, c_out, per_co, 0)
        o_ref[0] = acc_ref[:].astype(dt)

    return pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, C, HP, WP), lambda n: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, c_out, oh, ow), lambda n: (n, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, c_out, oh, ow), dt),
        scratch_shapes=[pltpu.VMEM((c_out, oh, ow), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * c_out * C * kh * kw * oh * ow,
            bytes_accessed=4 * N * (C * HP * WP + c_out * oh * ow),
            transcendentals=0),
        interpret=interpret,
    )


@build_cache
def _build_direct_conv(N: int, C: int, HP: int, WP: int, c_out: int,
                       kh: int, kw: int, oh: int, ow: int, dtype: str,
                       interpret: bool, patch_scratch: bool = True):
    """Stride-1 direct conv: grid over N, NHWC in-kernel.

    With ``patch_scratch`` (the in-kernel im2col): all kH*kW shifted windows
    are stacked into an (oH*oW, taps*C) VMEM patch and contracted against
    the (c_out, taps*C) weights with TRANSPOSED dimension numbers —
    output (c_out, oH*oW), which IS the NCHW plane (the host-side
    (N, c_out, oH, oW) reshape is free), with oH*oW on the 128 MXU lanes
    instead of c_out (c_out=64 left half the lanes idle: the transposed
    dot measures 25.2 vs 13.3 TFLOP/s resident at the ResNet mid-C shape,
    tools/conv_ceiling_probe.py). The grid runs one PIPELINE step per
    image plus one drain step: step n builds image n's patch into
    buf[n%2] while dotting buf[(n-1)%2] — independent buffers, so Mosaic
    interleaves the VPU window copies with the MXU dot (the flash-
    attention interleave trick; 12.3 vs 10.7 TFLOP/s zero-DMA). The
    residual ceiling is the patch build itself: C=64 rides the minor
    (lane) dim at half occupancy, an intrinsic layout fact for C<128.
    Without patch_scratch (scratch too large): one dot per tap, accumulated.
    """
    dt = jnp.dtype(dtype)
    prec = jax.lax.Precision.HIGHEST if dt == jnp.float32 else None
    taps = kh * kw

    def kernel_patch(x_ref, w_ref, o_ref, p0, p1):
        # p0/p1: (oH*oW, taps*C) flat patch matrices (tap-major columns,
        # matching w's (c_out, taps*C) column order). Mosaic's matmul
        # wants single contracting dims, so the tap axis flattens into K.
        n = pl.program_id(0)
        for par, p_ref in enumerate((p0, p1)):
            @pl.when((n % 2 == par) & (n < N))
            def _build():
                for t in range(taps):
                    i, j = divmod(t, kw)
                    p_ref[:, t * C:(t + 1) * C] = x_ref[
                        0, i:i + oh, j:j + ow, :].reshape(oh * ow, C)

            @pl.when((n % 2 != par) & (n > 0))
            def _dot():
                o_ref[0] = jax.lax.dot_general(
                    w_ref[...], p_ref[...], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec).astype(dt)

    def kernel_taps(x_ref, w_ref, o_ref):
        acc = jnp.zeros((oh, ow, c_out), jnp.float32)
        for i in range(kh):
            for j in range(kw):
                window = x_ref[0, i:i + oh, j:j + ow, :]  # (oH, oW, C)
                wij = w_ref[i * kw + j]  # (C, c_out)
                acc = acc + jax.lax.dot_general(
                    window, wij, (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec)
        o_ref[0] = acc.astype(dt)

    if patch_scratch:
        # N+1 pipeline steps; output for image n lands at step n+1, the
        # input fetch for the drain step clamps to the last image.
        return pl.pallas_call(
            kernel_patch,
            grid=(N + 1,),
            in_specs=[
                pl.BlockSpec((1, HP, WP, C),
                             lambda n: (jnp.minimum(n, N - 1), 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c_out, taps * C), lambda n: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, c_out, oh * ow),
                                   lambda n: (jnp.maximum(n - 1, 0), 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, c_out, oh * ow), dt),
            scratch_shapes=[pltpu.VMEM((oh * ow, taps * C), dt),
                            pltpu.VMEM((oh * ow, taps * C), dt)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )
    return pl.pallas_call(
        kernel_taps,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, HP, WP, C), lambda n: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((taps, C, c_out), lambda n: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, oh, ow, c_out), lambda n: (n, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, oh, ow, c_out), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def _strided_via_phases(x, w, padding, strides, interpret):
    """Strided conv = sum of s_h*s_w phase-decomposed stride-1 convs:
    out = sum_{p,q} conv1(x[p::s_h, q::s_w], w[:, :, p::s_h, q::s_w]) —
    each phase rides the stride-1 Pallas kernels (planewise / patch)."""
    sh, sw = strides
    ph, pw = padding
    xp = jnp.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw)))
    _, _, oh, ow = conv2d_out_shape(x.shape, w.shape, padding, strides)
    total = None
    for p in range(sh):
        for q in range(sw):
            wpq = w[:, :, p::sh, q::sw]
            if wpq.shape[2] == 0 or wpq.shape[3] == 0:
                continue
            xpq = xp[:, :, p::sh, q::sw]
            sub = conv2d_direct(xpq, wpq, padding=(0, 0), strides=(1, 1),
                                interpret=interpret)
            sub = sub[:, :, :oh, :ow]
            total = sub if total is None else total + sub
    return total


def conv2d_direct(x: jax.Array, w: jax.Array, padding=(0, 0), strides=(1, 1),
                  interpret: Optional[bool] = None) -> jax.Array:
    """Direct convolution (reference: conv2d_direct_convolution.nim:8-74).

    Stride-1 runs the Pallas direct kernels (planewise for small C,
    in-kernel-im2col otherwise); strided convs decompose into s_h*s_w
    stride-1 phase convs on subsampled inputs/kernels (same total FLOPs).
    """
    x = jnp.asarray(x)
    w = jnp.asarray(w)
    if strides != (1, 1):
        return _strided_via_phases(x, w, padding, strides, interpret)
    if w.shape[2] == 1 and w.shape[3] == 1 and padding == (0, 0):
        # a 1x1 conv IS a GEMM over channels (also the phase sub-kernels of
        # strided convs); the flagship kernel handles it best
        N, C, H, W = x.shape
        c_out = w.shape[0]
        xm = x.transpose(0, 2, 3, 1).reshape(N * H * W, C)
        out = gemm(xm, w.reshape(c_out, C), transpose_b=True,
                   interpret=interpret)
        return out.reshape(N, H, W, c_out).transpose(0, 3, 1, 2)
    N, C, H, W = x.shape
    c_out, c_in, kh, kw = w.shape
    assert c_in == C
    ph, pw = padding
    HP, WP = H + 2 * ph, W + 2 * pw
    _, _, oh, ow = conv2d_out_shape((N, C, H, W), w.shape, padding, strides)
    from ..device_info import vmem_budget_bytes

    budget = vmem_budget_bytes()
    interp = should_interpret() if interpret is None else interpret

    # Small-channel path (the reference's bench regime, C3->20): NCHW planes
    # + VPU shifted-plane FMAs. The MXU formulations waste the systolic array
    # here (C*kH*kW << 128 contraction) and NHWC lane-pads C to 128.
    plane_vmem = 4 * 2 * (C * _rup(HP, 8) * _rup(WP, 128)
                          + 2 * c_out * _rup(oh, 8) * _rup(ow, 128))
    if C * kh * kw <= 64 and plane_vmem <= budget:
        xp = jnp.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw)))
        call = _build_planewise_conv(N, C, HP, WP, c_out, kh, kw, oh, ow,
                                     jnp.dtype(x.dtype).name, interp)
        return call(xp, w.astype(jnp.float32))

    # Large-channel path: NHWC with per-tap MXU contractions. Mosaic pads the
    # minor (channel) dim to 128 lanes in VMEM; if the padded footprint
    # overflows, fall back to im2col+GEMM (the production choice in the
    # reference benches anyway).
    lane = 128
    itemsize = jnp.dtype(x.dtype).itemsize
    base = itemsize * 2 * (HP * WP * _rup(C, lane) + oh * ow * _rup(c_out, lane)) \
        + 4 * kh * kw * _rup(C, 8) * _rup(c_out, lane)
    # two patch buffers (the build/dot pipeline double-buffers them)
    patch_bytes = 2 * itemsize * kh * kw * _rup(oh * ow, 8) * _rup(C, lane)
    # the in-kernel (oH,oW,C)->(oH*oW,C) reshape is only a free bitcast when
    # ow is sublane-aligned; unaligned shapes crash/relayout — use per-tap
    patch_ok = base + patch_bytes <= budget and ow % 8 == 0
    if not patch_ok and base > budget:
        return conv2d_im2col(x, w, padding, strides)

    x_nhwc = jnp.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw))).transpose(0, 2, 3, 1)
    # weights flat (c_out, taps*C) for the patch path (the transposed-dot
    # orientation: tap-major columns match the patch), (taps, C, c_out) else
    w_t = w.transpose(2, 3, 1, 0).reshape(kh * kw, C, c_out)
    call = _build_direct_conv(N, C, HP, WP, c_out, kh, kw,
                              oh, ow, jnp.dtype(x.dtype).name, interp,
                              patch_scratch=patch_ok)
    if patch_ok:
        w_t = w_t.reshape(kh * kw * C, c_out).T
        out = call(x_nhwc, w_t)  # (N, c_out, oH*oW) == flat NCHW
        return out.reshape(N, c_out, oh, ow)
    out = call(x_nhwc, w_t)  # (N, oH, oW, c_out)
    return out.transpose(0, 3, 1, 2)


# ---------------------------------------------------------------------------
# Trainable convolution: native forward, native stride-1 backward.
# ---------------------------------------------------------------------------

import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv2d_trainable(x: jax.Array, w: jax.Array, padding=(0, 0),
                     strides=(1, 1)) -> jax.Array:
    """Differentiable conv2d on the native kernels.

    Forward = ``conv2d_direct``. Stride-1 backward is two more native
    convolutions (the classical identities):
        dx = conv2d(g, rot180(w).swap(Cin,Cout), padding=(k-1-p))
        dw = conv2d(x_pad.swap(N,C), g.swap(N,Cout)).swap back
    Strided backward falls back to the XLA transposed-conv gradient (our
    kernels have no input dilation; the phase decomposition covers the
    forward only).
    """
    return conv2d_direct(x, w, padding=padding, strides=strides)


def _conv_fwd(x, w, padding, strides):
    return conv2d_trainable(x, w, padding, strides), (x, w)


def _conv_bwd(padding, strides, res, g):
    x, w = res
    ph, pw = padding
    if strides != (1, 1):
        # input dilation needed: route through XLA's gradient (exact)
        _, vjp = jax.vjp(
            lambda xx, ww: jax.lax.conv_general_dilated(
                xx, ww, strides,
                [(ph, ph), (pw, pw)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                precision=jax.lax.Precision.HIGHEST), x, w)
        return vjp(g)
    kh, kw = w.shape[2], w.shape[3]
    # dx: full correlation of g with the rotated, channel-swapped kernel
    w_rot = jnp.flip(w, axis=(2, 3)).transpose(1, 0, 2, 3)  # (Cin,Cout,k,k)
    dx = conv2d_direct(g, w_rot, padding=(kh - 1 - ph, kw - 1 - pw))
    # dw: convolve the padded input (batch<->channel swapped) with g as the
    # kernel: out (Cin, Cout, kh, kw) -> swap to (Cout, Cin, kh, kw)
    xp = jnp.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw)))
    dw = conv2d_direct(xp.transpose(1, 0, 2, 3), g.transpose(1, 0, 2, 3))
    return dx.astype(x.dtype), dw.transpose(1, 0, 2, 3).astype(w.dtype)


conv2d_trainable.defvjp(_conv_fwd, _conv_bwd)
