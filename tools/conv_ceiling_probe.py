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

    # --- arm 3: patch build alone (NCHW orientation: rows are tap*C)
    x = jnp.asarray(rng.randn(C, HP, WP) * 0.1, jnp.float32)

    def k_patch(x_ref, o_ref, p_ref):
        for t in range(KH * KW):
            i, j = divmod(t, KW)
            # (C, OH, OW) window -> rows t*C:(t+1)*C of the patch matrix
            p_ref[t * C:(t + 1) * C, :] = x_ref[:, i:i + OH, j:j + OW
                                                ].reshape(C, OHW)
        o_ref[:] = p_ref[:CO, :]

    call = pl.pallas_call(
        k_patch,
        out_shape=jax.ShapeDtypeStruct((CO, OHW), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TC, OHW), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))
    _time(drift(call), x, label="patch_build_576x3136_per_image",
          flops=dot_fl // ITERS)  # nominal: report vs one image's dot flops

    # --- arm 4: fused build + transposed dot, per image
    def k_fused(x_ref, w_ref, o_ref, p_ref):
        for t in range(KH * KW):
            i, j = divmod(t, KW)
            p_ref[t * C:(t + 1) * C, :] = x_ref[:, i:i + OH, j:j + OW
                                                ].reshape(C, OHW)
        o_ref[:] = jax.lax.dot_general(
            w_ref[:], p_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=PREC)

    call = pl.pallas_call(
        k_fused,
        in_specs=[pl.BlockSpec((C, HP, WP), lambda: (0, 0, 0)),
                  pl.BlockSpec((CO, TC), lambda: (0, 0))],
        out_specs=pl.BlockSpec((CO, OHW), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((CO, OHW), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TC, OHW), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))
    _time(drift(call), x, w_nchw, label="fused_patch_dot_per_image",
          flops=dot_fl // ITERS)


if __name__ == "__main__":
    main()
