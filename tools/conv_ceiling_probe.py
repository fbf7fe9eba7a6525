"""Zero-DMA conv ceiling probe (round-4 item #8, the GEMM methodology).

Round 3 shipped conv_direct_midC at 9.83 TFLOP/s = 30% of the f32-HIGHEST
roofline while winning 1.31x vs XLA — a weak comparator and unprobed
headroom. This decomposes the in-kernel-im2col design at the benched
ResNet shape (N16, C64, 56^2, k3 -> c_out 64, f32 HIGHEST):

  * dot_nhwc  — the production dot: (oHW=3136, tapsC=576) @ (576, 64),
                operands VMEM-resident. c_out=64 maps to the LANE dim: half
                of the 128 MXU lanes are idle by construction.
  * dot_nchw  — the transposed dot: (64, 576) @ (576, 3136). c_out rides
                sublanes (64 rows), oHW fills all 128 lanes. Output is
                (c_out, oHW) — which IS the NCHW plane layout, so a
                production kernel using it also deletes the output
                transpose.
  * patch_build — in-kernel im2col scratch build alone (9 shifted window
                copies), per image.
  * fused_nchw — patch build (transposed: (576, 3136)) + the nchw dot:
                the shippable variant's zero-DMA time.

Rooflines: v5e 197 TF bf16 / 6 = 32.83 TF for f32 HIGHEST.

Usage: python tools/conv_ceiling_probe.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from laser_tpu.bench.harness import chain_rate

PEAK6 = 197.0 / 6.0
C, CO, KH, KW = 64, 64, 3, 3
OH = OW = 56
OHW = OH * OW          # 3136
TC = KH * KW * C       # 576
HP = WP = OH + KH - 1  # 58 (padded input plane)
PREC = jax.lax.Precision.HIGHEST
ITERS = 16             # images per launch (matches the benched N=16)


def _time(fn, *args, label, flops):
    t0 = time.perf_counter()
    ms = chain_rate(fn, *args)
    tf = flops / (ms * 1e-3) / 1e12
    print(json.dumps({"probe": label, "ms": round(ms, 4),
                      "tflops": round(tf, 2),
                      "pct_6pass": round(100 * tf / PEAK6, 1),
                      "compile_s": round(time.perf_counter() - t0, 1)}),
          flush=True)


def drift(call):
    def step(*ops):
        o = call(*ops)
        return ops[0] + (jnp.sum(o) * 1e-30).astype(ops[0].dtype)
    return step


def main():
    rng = np.random.RandomState(0)
    dot_fl = 2 * OHW * TC * CO * ITERS

    # --- arm 1: production-orientation dot, resident operands
    p_nhwc = jnp.asarray(rng.randn(OHW, TC) * 0.1, jnp.float32)
    w_nhwc = jnp.asarray(rng.randn(TC, CO) * 0.1, jnp.float32)

    def k_nhwc(p_ref, w_ref, o_ref, acc_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jax.lax.dot_general(
            p_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=PREC)

        @pl.when(t == ITERS - 1)
        def _():
            o_ref[:] = acc_ref[:]

    call = pl.pallas_call(
        k_nhwc, grid=(ITERS,),
        in_specs=[pl.BlockSpec((OHW, TC), lambda t: (0, 0)),
                  pl.BlockSpec((TC, CO), lambda t: (0, 0))],
        out_specs=pl.BlockSpec((OHW, CO), lambda t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((OHW, CO), jnp.float32),
        scratch_shapes=[pltpu.VMEM((OHW, CO), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024))
    _time(drift(call), p_nhwc, w_nhwc, label="dot_nhwc_3136x576x64",
          flops=dot_fl)

    # --- arm 2: transposed dot — c_out on sublanes, oHW on lanes
    p_nchw = jnp.asarray(p_nhwc.T)   # (576, 3136)
    w_nchw = jnp.asarray(w_nhwc.T)   # (64, 576)

    def k_nchw(w_ref, p_ref, o_ref, acc_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jax.lax.dot_general(
            w_ref[:], p_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=PREC)

        @pl.when(t == ITERS - 1)
        def _():
            o_ref[:] = acc_ref[:]

    call = pl.pallas_call(
        k_nchw, grid=(ITERS,),
        in_specs=[pl.BlockSpec((CO, TC), lambda t: (0, 0)),
                  pl.BlockSpec((TC, OHW), lambda t: (0, 0))],
        out_specs=pl.BlockSpec((CO, OHW), lambda t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((CO, OHW), jnp.float32),
        scratch_shapes=[pltpu.VMEM((CO, OHW), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024))
    _time(drift(call), w_nchw, p_nchw, label="dot_nchw_64x576x3136",
          flops=dot_fl)

    # NOTE: a patch built directly in (taps*C, oHW) orientation is NOT
    # lane-legal — the (C, OH, OW) -> (C, OHW) window reshape merges a
    # 56-lane minor dim and Mosaic rejects the shape cast
    # ("infer-vector-layout: unsupported shape cast", measured). So the
    # shippable route keeps the production (oHW, taps*C) patch build
    # (free bitcast: OH,OW merge on the SUBLANE side, ow % 8 == 0) and
    # moves the transposition INTO the dot's dimension numbers.

    # --- arm 3: resident dot with transposed dimension numbers:
    # (CO, TC) @ (OHW, TC) contracting ((1,),(1,)) -> (CO, OHW). Same
    # operand layouts the production kernel can actually build; tests
    # whether Mosaic's rhs-transposed matmul keeps arm 2's rate.
    def k_dimnum(w_ref, p_ref, o_ref, acc_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jax.lax.dot_general(
            w_ref[:], p_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=PREC)

        @pl.when(t == ITERS - 1)
        def _():
            o_ref[:] = acc_ref[:]

    call = pl.pallas_call(
        k_dimnum, grid=(ITERS,),
        in_specs=[pl.BlockSpec((CO, TC), lambda t: (0, 0)),
                  pl.BlockSpec((OHW, TC), lambda t: (0, 0))],
        out_specs=pl.BlockSpec((CO, OHW), lambda t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((CO, OHW), jnp.float32),
        scratch_shapes=[pltpu.VMEM((CO, OHW), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024))
    _time(drift(call), w_nchw, p_nhwc, label="dot_rhsT_64x576x3136",
          flops=dot_fl)

    # --- arm 4: fused production-legal patch build + transposed-dimnum
    # dot, per image: the shippable variant's zero-DMA time. x arrives
    # NHWC (as production), patch lands (OHW, TC), output (CO, OHW) is
    # the NCHW plane — the host-side reshape to (CO, OH, OW) is free.
    x_nhwc = jnp.asarray(rng.randn(HP, WP, C) * 0.1, jnp.float32)

    def k_fused(x_ref, w_ref, o_ref, p_ref):
        for t in range(KH * KW):
            i, j = divmod(t, KW)
            p_ref[:, t * C:(t + 1) * C] = x_ref[i:i + OH, j:j + OW,
                                                :].reshape(OHW, C)
        o_ref[:] = jax.lax.dot_general(
            w_ref[:], p_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=PREC)

    call = pl.pallas_call(
        k_fused,
        in_specs=[pl.BlockSpec((HP, WP, C), lambda: (0, 0, 0)),
                  pl.BlockSpec((CO, TC), lambda: (0, 0))],
        out_specs=pl.BlockSpec((CO, OHW), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((CO, OHW), jnp.float32),
        scratch_shapes=[pltpu.VMEM((OHW, TC), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))
    _time(drift(call), x_nhwc, w_nchw, label="fused_patch_dotT_per_image",
          flops=dot_fl // ITERS)

    # --- arm 5: same fused shape but the production orientation dot
    # ((OHW, TC) @ (TC, CO) -> (OHW, CO)) for a like-for-like per-image
    # baseline of what ships today.
    def k_fused_prod(x_ref, w_ref, o_ref, p_ref):
        for t in range(KH * KW):
            i, j = divmod(t, KW)
            p_ref[:, t * C:(t + 1) * C] = x_ref[i:i + OH, j:j + OW,
                                                :].reshape(OHW, C)
        o_ref[:] = jax.lax.dot_general(
            p_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=PREC)

    call = pl.pallas_call(
        k_fused_prod,
        in_specs=[pl.BlockSpec((HP, WP, C), lambda: (0, 0, 0)),
                  pl.BlockSpec((TC, CO), lambda: (0, 0))],
        out_specs=pl.BlockSpec((OHW, CO), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((OHW, CO), jnp.float32),
        scratch_shapes=[pltpu.VMEM((OHW, TC), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))
    _time(drift(call), x_nhwc, w_nhwc, label="fused_patch_dot_prod_per_image",
          flops=dot_fl // ITERS)

    # --- arm 6: NO patch — per-tap rhs-transposed dots, accumulated in
    # values. K drops to C=64 per dot (half-width contraction) but the
    # 2x ~6.4 MB patch scratch round-trip disappears, and each window
    # reshape is the free sublane merge.
    w_taps = jnp.asarray(rng.randn(KH * KW, CO, C) * 0.1, jnp.float32)

    def k_pertap(x_ref, w_ref, o_ref):
        acc = jnp.zeros((CO, OHW), jnp.float32)
        for t in range(KH * KW):
            i, j = divmod(t, KW)
            win = x_ref[i:i + OH, j:j + OW, :].reshape(OHW, C)
            acc = acc + jax.lax.dot_general(
                w_ref[t], win, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=PREC)
        o_ref[:] = acc

    call = pl.pallas_call(
        k_pertap,
        in_specs=[pl.BlockSpec((HP, WP, C), lambda: (0, 0, 0)),
                  pl.BlockSpec((KH * KW, CO, C), lambda: (0, 0, 0))],
        out_specs=pl.BlockSpec((CO, OHW), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((CO, OHW), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))
    _time(drift(call), x_nhwc, w_taps, label="pertap_dotT_per_image",
          flops=dot_fl // ITERS)

    # --- arm 7: patch build with PAIRED tap writes — concat two (OHW, C)
    # windows on lanes and store one 128-aligned column block (tap
    # columns at t*64 are half-unaligned; this tests whether the build
    # cost is the lane rotation).
    def k_fused_pair(x_ref, w_ref, o_ref, p_ref):
        for t2 in range((KH * KW + 1) // 2):
            ta, tb = 2 * t2, 2 * t2 + 1
            ia, ja = divmod(ta, KW)
            wa = x_ref[ia:ia + OH, ja:ja + OW, :].reshape(OHW, C)
            if tb < KH * KW:
                ib, jb = divmod(tb, KW)
                wb = x_ref[ib:ib + OH, jb:jb + OW, :].reshape(OHW, C)
                p_ref[:, ta * C:(tb + 1) * C] = jnp.concatenate(
                    [wa, wb], axis=1)
            else:
                p_ref[:, ta * C:(ta + 1) * C] = wa
        o_ref[:] = jax.lax.dot_general(
            w_ref[:], p_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=PREC)

    call = pl.pallas_call(
        k_fused_pair,
        in_specs=[pl.BlockSpec((HP, WP, C), lambda: (0, 0, 0)),
                  pl.BlockSpec((CO, TC), lambda: (0, 0))],
        out_specs=pl.BlockSpec((CO, OHW), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((CO, OHW), jnp.float32),
        scratch_shapes=[pltpu.VMEM((OHW, TC), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))
    _time(drift(call), x_nhwc, w_nchw, label="fused_pairpatch_dotT_per_image",
          flops=dot_fl // ITERS)

    # --- arm 8: DMA patch build — local async copies instead of vector
    # load/store (no lane-layout cost; the DMA engine handles the strided
    # window<->patch-column moves).
    def k_dma(x_ref, w_ref, o_ref, p_ref, sems):
        # p_ref is the (OH, OW, TC) 3D view of the patch: each tap's DMA
        # is shape-matched (OH, OW, C) -> (OH, OW, C); the dot reads the
        # free (OH,OW)->OHW sublane merge.
        for t in range(KH * KW):
            i, j = divmod(t, KW)
            pltpu.make_async_copy(
                x_ref.at[i:i + OH, j:j + OW, :],
                p_ref.at[:, :, t * C:(t + 1) * C], sems.at[t]).start()
        for t in range(KH * KW):
            i, j = divmod(t, KW)
            pltpu.make_async_copy(
                x_ref.at[i:i + OH, j:j + OW, :],
                p_ref.at[:, :, t * C:(t + 1) * C], sems.at[t]).wait()
        o_ref[:] = jax.lax.dot_general(
            w_ref[:], p_ref[...].reshape(OHW, TC), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=PREC)

    try:
        call = pl.pallas_call(
            k_dma,
            in_specs=[pl.BlockSpec((HP, WP, C), lambda: (0, 0, 0)),
                      pl.BlockSpec((CO, TC), lambda: (0, 0))],
            out_specs=pl.BlockSpec((CO, OHW), lambda: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((CO, OHW), jnp.float32),
            scratch_shapes=[pltpu.VMEM((OH, OW, TC), jnp.float32),
                            pltpu.SemaphoreType.DMA((KH * KW,))],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024))
        _time(drift(call), x_nhwc, w_nchw, label="fused_dmapatch_dotT_per_image",
              flops=dot_fl // ITERS)
    except Exception as e:
        print(json.dumps({"probe": "fused_dmapatch_dotT_per_image",
                          "error": str(e)[:200]}), flush=True)

    # --- arm 9: software-pipelined build/dot interleave over a grid of
    # images (the flash-attention interleave trick): step n builds image
    # n's patch into buf[n%2] while dotting buf[(n-1)%2] — the VPU window
    # copies have no dependency on the MXU dot, so Mosaic can overlap.
    xs = jnp.asarray(rng.randn(ITERS, HP, WP, C) * 0.1, jnp.float32)

    def k_pipe(x_ref, w_ref, o_ref, p0, p1):
        n = pl.program_id(0)
        bufs = (p0, p1)
        for par in range(2):
            p = bufs[par]

            @pl.when((n % 2 == par) & (n < ITERS))
            def _build():
                for t in range(KH * KW):
                    i, j = divmod(t, KW)
                    p[:, t * C:(t + 1) * C] = x_ref[0, i:i + OH, j:j + OW,
                                                    :].reshape(OHW, C)

            @pl.when((n % 2 != par) & (n > 0))
            def _dot():
                o_ref[0] = jax.lax.dot_general(
                    w_ref[:], p[:], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=PREC)

    call = pl.pallas_call(
        k_pipe, grid=(ITERS + 1,),
        in_specs=[pl.BlockSpec((1, HP, WP, C),
                               lambda n: (jnp.minimum(n, ITERS - 1), 0, 0, 0)),
                  pl.BlockSpec((CO, TC), lambda n: (0, 0))],
        out_specs=pl.BlockSpec((1, CO, OHW),
                               lambda n: (jnp.maximum(n - 1, 0), 0, 0)),
        out_shape=jax.ShapeDtypeStruct((ITERS, CO, OHW), jnp.float32),
        scratch_shapes=[pltpu.VMEM((OHW, TC), jnp.float32),
                        pltpu.VMEM((OHW, TC), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024))
    _time(drift(call), xs, w_nchw, label="pipelined_builddot_16img",
          flops=dot_fl)


if __name__ == "__main__":
    main()
