"""Weight-only int4 GEMM: in-kernel nibble unpack, group-wise scales.

Small-batch decode is weight-HBM-bound (the serving engine's own burst
breakdown, docs/PERF_NOTES.md "host-link economics"): every decoded token
streams every block linear's weight matrix once. int8 weight-only quant
(serving/engine.py) halves that traffic vs bf16; this kernel halves it
again — two int4 values ride per byte and are unpacked on the VPU *inside*
the kernel, so HBM sees only ceil(K/2)*N bytes plus the (K/group)*N f32
scales. The reference declared quantized GEMM as roadmap and never built it
(README.md:238-245); this is the TPU-native realization.

Quantization scheme (the standard weight-only recipe, per GPTQ/AWQ
practice): symmetric int4 in [-7, 7], one f32 scale per (row-group,
output-column); group size divides K and is even so a byte never straddles
a group boundary. Packing pairs CONSECUTIVE rows (2i, 2i+1) into one byte:
low nibble = row 2i, high nibble = row 2i+1 — sign-extension via
arithmetic shifts ((q << 4) >> 4 and q >> 4).

The kernel streams the packed block (bk//2, bn) int8 + its scale rows,
unpacks to (bk, bn) on the VPU (interleave via stack+reshape stays in
VMEM), dequantizes to the activation dtype, and issues the MXU dot. The
activation block (bm, bk) is resident across the N grid axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import get_config
from ...registry import build_cache
from ...utils import cdiv


def pack_int4(q):
    """(K, N) int8 in [-8, 7] -> (K//2, N) int8, two nibbles per byte."""
    lo = q[0::2].astype(jnp.uint8) & 0x0F
    hi = (q[1::2].astype(jnp.uint8) & 0x0F) << 4
    return (lo | hi).astype(jnp.int8)


def unpack_int4(p):
    """(K//2, N) packed -> (K, N) int8 in [-8, 7], rows re-interleaved.

    All arithmetic in int32: Mosaic has no int8 vector shifts (verified on
    hardware — `arith.shli` on vector<i8> fails to legalize), and the VPU
    lanes are 32-bit anyway. hi nibble = arithmetic >>4 of the sign-extended
    byte; lo nibble sign-extends via the (x ^ 8) - 8 identity."""
    p32 = p.astype(jnp.int32)
    hi = jnp.right_shift(p32, 4)              # sign-extension is free
    lo = ((p32 & 15) ^ 8) - 8
    K2, N = p.shape
    return jnp.stack([lo, hi], axis=1).reshape(2 * K2, N).astype(jnp.int8)


def quantize_int4(w, group: int = 64):
    """f32/bf16 (K, N) -> {"q4": (K//2, N) int8, "s4": (K//group, N) f32}.

    group must be even and divide K. Dequantized value of row k, col n is
    unpack(q4)[k, n] * s4[k // group, n]; |error| <= s4/2 elementwise.
    """
    K, N = w.shape
    if K % 2 or group % 2 or K % group:
        raise ValueError(f"int4 quant needs even group | K; got K={K}, "
                         f"group={group}")
    wf = jnp.asarray(w, jnp.float32).reshape(K // group, group, N)
    a = jnp.max(jnp.abs(wf), axis=1)
    s = jnp.where(a > 0, a / 7.0, 1.0)
    q = jnp.clip(jnp.round(wf / s[:, None, :]), -7, 7)
    return {"q4": pack_int4(q.reshape(K, N).astype(jnp.int8)),
            "s4": s.astype(jnp.float32)}


def dequantize_int4(wq):
    """{"q4","s4"} -> full-precision f32 (K, N) weight (the XLA fallback
    path and the test oracle)."""
    q = unpack_int4(wq["q4"]).astype(jnp.float32)
    G, N = wq["s4"].shape
    K = q.shape[0]
    group = K // G
    return (q.reshape(G, group, N) * wq["s4"][:, None, :]).reshape(K, N)


@build_cache
def build_w4_gemm(M: int, N: int, K: int, group: int, bm: int, bn: int,
                  bk: int, act_dtype: str, interpret: bool):
    """Build f(h, q4, s4) -> (M, N) in act_dtype.

    Grid (j over N, k over K) with the K axis innermost ("arbitrary"): the
    activation block rides VMEM across the whole sweep, the packed weight
    streams once. bk is a multiple of group so scale rows align to blocks.
    """
    grid = (cdiv(M, bm), cdiv(N, bn), cdiv(K, bk))
    nk = grid[2]
    act_dt = jnp.dtype(act_dtype)

    def kernel(h_ref, q_ref, s_ref, out_ref, acc_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        q = unpack_int4(q_ref[:]).astype(jnp.float32)  # (bk, bn)
        s = s_ref[:]                                   # (bk//group, bn)
        wd = (q.reshape(bk // group, group, bn) * s[:, None, :]
              ).reshape(bk, bn).astype(act_dt)
        # match the engine's int8 path: f32 activations dot at HIGHEST
        # (decode is HBM-bound; the extra MXU passes are free at small
        # batch). bf16 activations take the plain 1-pass MXU dot — Mosaic
        # rejects precision flags on bf16 matmuls.
        acc_ref[:] += jax.lax.dot_general(
            h_ref[:], wd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(jax.lax.Precision.HIGHEST
                       if act_dt == jnp.float32 else None))

        @pl.when(k == nk - 1)
        def _():
            out_ref[:] = acc_ref[:].astype(act_dt)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk // 2, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((bk // group, bn), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), act_dt),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * act_dt.itemsize + K * N // 2
            + (K // group) * N * 4 + M * N * act_dt.itemsize,
            transcendentals=0),
        interpret=interpret,
    )


def gemm_w4(h, wq, *, backend: "str | None" = None):
    """h (M, K) @ dequant(wq) -> (M, K_out) in h.dtype.

    wq is a quantize_int4 dict. Pallas streams the packed bytes and unpacks
    in-kernel (the HBM win); the XLA path dequantizes first (correct
    everywhere, used in interpret/CPU mode and as the numerics oracle).
    """
    interp = get_config().interpret or jax.default_backend() == "cpu"
    M, K = h.shape
    G, N = wq["s4"].shape
    group = K // G
    if backend == "xla" or interp:
        return jnp.dot(h, dequantize_int4(wq).astype(h.dtype),
                       precision=jax.lax.Precision.HIGHEST
                       if h.dtype == jnp.float32 else None)
    bm = min(max(16, M), 256)
    bn = min(N, 512)
    # bk must divide K (an unaligned K tail would stream padding through the
    # unpack+dot and poison the accumulator) and be a multiple of group (so
    # scale rows align to weight blocks): largest such divisor <= 1024.
    bk = group
    for mult in range(K // group, 0, -1):
        cand = mult * group
        if cand <= 1024 and K % cand == 0:
            bk = cand
            break
    fn = build_w4_gemm(M, N, K, group, bm, bn, bk, jnp.dtype(h.dtype).name,
                       False)
    return fn(h, wq["q4"], wq["s4"])
