"""Paged decode attention: one query token per sequence over block-table
indexed KV pages.

The serving-side analog of the flash kernel (ops/attention.py): where flash
streams contiguous K/V blocks, serving keeps each sequence's KV cache as a
list of fixed-size PAGES scattered through a shared pool, so sequences of
wildly different lengths batch together with no copying and no per-sequence
max-length reservation (the PagedAttention idea, done TPU-style: the block
table rides scalar prefetch (SMEM) and drives the BlockSpec index maps, so
Mosaic's pipeline fetches exactly the pages each grid step needs).

Layouts:
    q        (S, Hq, hd)        one decode token per active sequence slot
    k_pool   (P, Hkv, ps, hd)   P pages of ps tokens each, shared pool
    v_pool   (P, Hkv, ps, hd)
    tables   (S, max_pages)     page ids per sequence (row-padded with 0)
    lengths  (S,)               valid keys per sequence (0 = inactive slot)

GQA rides natively: Hq query heads fold to (Hkv, group, hd) and every dot
is batched over Hkv (same convention as the flash GQA path,
ops/attention.py kv_heads).

Grid: (S, max_pages), pages innermost ("arbitrary"): the online-softmax
state (m, l, acc) lives in VMEM scratch across a sequence's pages; pages at
or beyond a sequence's length are skipped via pl.when (near-zero cost), so
the cost per sequence is proportional to ITS length, not the batch max.

Reference frame: the reference has no serving layer at all (SURVEY.md §5);
this is parity-plus infrastructure. The kernel-capability mapping is the
gather/odometer machinery of forEachStrided (foreach.nim:64-113) — iterate
non-contiguous memory without materializing a contiguous copy.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import should_interpret
from ..registry import build_cache

_NEG_INF = -1e30

# Quantized-f32 compute tier: k/v convert to bf16 (exact: int8 fits
# bf16's 8 mantissa bits); q and p split into bf16 LIMBS, with the
# counts chosen PER DOT: "kXvY" = X limb passes for the q·k score dot, Y
# for the p·v dot. The kernel is MXU-PASS-bound once int8 shrinks the
# DMA ~3.7x, so fewer passes = proportionally faster. Round-5 probe
# (tools/paged_int8_probe.py on the chip, 8x4096 ps 256):
#
#   int8 STORAGE error alone (dequant oracle vs true-f32): 1.18e-4
#   base (HIGHEST, 6+6 passes)  0.2522 ms  274 GB/s  err 4.5e-8
#   k3v3 (round-3/4 shipped)    0.1829 ms  379 GB/s  err 4.5e-8
#   k2v2                        0.1570 ms  441 GB/s  err 6.1e-8
#   k3v1                        0.1693 ms  409 GB/s  err 3.2e-5
#   k2v1                        0.1535 ms  451 GB/s  err 3.2e-5
#   k1v1 (shipped default)      0.1369 ms  506 GB/s  err 3.1e-5
#   default (XLA 1-pass flag)   0.1404 ms  493 GB/s  err 3.1e-5
#
# Findings: the error is set by the V-dot limb count alone (k3v1 ==
# k1v1: the score dot's extra limbs buy nothing once p is rounded to
# bf16 for a 1-pass V dot), and every v1 mode stays ~4x under the
# storage floor that DEFINES the int8-KV quality class — so "k1v1" is
# the default tier (config.paged_quant_mode), 61.7% HBM, and "k3v3"
# remains the compute-exact tier for callers who quantize storage but
# want exact arithmetic on it. _PROBE_MODE (tools/paged_int8_probe.py)
# overrides the config; "base" = HIGHEST f32 dots, "default" = 1-pass
# via the precision flag, "bf16k"/"bf16k2" = legacy aliases.
_PROBE_MODE = None


def _quant_mode() -> str:
    if _PROBE_MODE is not None:
        return _PROBE_MODE
    from ..config import get_config

    return get_config().paged_quant_mode


def _parse_mode(mode: str):
    """-> (limbs_k, limbs_v) for a quantized-f32 limb mode string."""
    if mode == "bf16k":
        return 3, 3
    if mode == "bf16k2":
        return 2, 2
    m = re.fullmatch(r"k([123])v([123])", mode)
    if not m:
        raise ValueError(f"unknown paged-attention probe mode {mode!r}")
    return int(m.group(1)), int(m.group(2))


def _dot_limbs(a: jax.Array, b_bf16: jax.Array, dims,
               limbs: int = 3) -> jax.Array:
    """f32 x bf16-exact dot via 3 bf16 limb passes, f32 accumulation.

    b must hold values exactly representable in bf16 (here: int8 rows).
    Splitting only `a` into 3 bf16 limbs recovers full f32 accuracy of
    the product in 3 MXU passes — half of HIGHEST's 6 (which decomposes
    BOTH operands)."""
    f32 = jnp.float32
    parts = []
    r = a
    for _ in range(limbs):
        hi = r.astype(jnp.bfloat16)
        parts.append(hi)
        r = r - hi.astype(f32)
    out = None
    for hi in reversed(parts):       # smallest limb first: stable sum
        d = jax.lax.dot_general(hi, b_bf16, dims,
                                preferred_element_type=f32)
        out = d if out is None else out + d
    return out


@build_cache
def build_paged_attention(S: int, P: int, Hq: int, Hkv: int, ps: int,
                          hd: int, max_pages: int, scale: float,
                          dtype: str, quantized: bool, interpret: bool,
                          window=None, qmode: str = "k1v1"):
    dt = jnp.dtype(dtype)
    group = Hq // Hkv
    prec = jax.lax.Precision.HIGHEST if dt == jnp.float32 else None
    limbs = None
    if quantized and dt == jnp.float32:
        if qmode in ("default", "base"):
            if qmode == "default":
                prec = None
        else:
            limbs = _parse_mode(qmode)

    def kernel(tables_ref, lens_ref, *refs):
        if quantized:
            (q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref,
             m_ref, l_ref, acc_ref) = refs
        else:
            q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref = refs
        s_idx = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        length = lens_ref[s_idx]

        # pages holding no key in [length - window, length) are skipped:
        # decode cost becomes O(window), not O(length)
        run = j * ps < length
        if window is not None:
            run &= j * ps + ps - 1 >= length - window

        @pl.when(run)
        def _step():
            q = q_ref[0].reshape(Hkv, group, hd)      # (Hkv, g, hd)
            if quantized:
                # int8 rows + per-(token, head) f32 scales. Do NOT
                # dequantize the (ps, hd) rows — fold the scales into the
                # (g, ps) SCORES after the K dot and into the (g, ps)
                # probabilities before the V dot: hd-times less scale work
                # (measured: row dequant made int8 slower than f32)
                cdt = jnp.bfloat16 if limbs else dt
                k = k_ref[0].astype(cdt)
                v = v_ref[0].astype(cdt)
            else:
                k = k_ref[0]                           # (Hkv, ps, hd)
                v = v_ref[0]
            kdims = (((2,), (2,)), ((0,), (0,)))
            if limbs:
                s = _dot_limbs(q, k, kdims, limbs[0])
            else:
                s = jax.lax.dot_general(
                    q, k, kdims,
                    preferred_element_type=jnp.float32, precision=prec)
            s = s * scale                              # (Hkv, g, ps)
            if quantized:
                s = s * ks_ref[0][:, None, :]          # per-token K scale
            kpos = j * ps + jax.lax.broadcasted_iota(
                jnp.int32, (Hkv, group, ps), 2)
            valid = kpos < length
            if window is not None:
                # the decode query sits at position length - 1: it sees
                # keys in [length - window, length). The first processed
                # page always holds key max(0, length - window), so every
                # row keeps a real m_new (no p-mask needed, unlike the
                # flash kernel's per-row windows).
                valid &= kpos >= length - window
            s = jnp.where(valid, s, _NEG_INF)

            m_prev = m_ref[:]                          # (Hkv, g, 128)
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
            corr = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new[..., :1])            # (Hkv, g, ps)
            # page 0 always holds key 0 for any length >= 1, so every row
            # has a real m_new and masked lanes contribute exp(-inf) == 0
            l_ref[:] = l_ref[:] * corr + jnp.broadcast_to(
                jnp.sum(p, axis=-1, keepdims=True), corr.shape)
            if quantized:
                p = p * vs_ref[0][:, None, :]          # per-token V scale
            vdims = (((2,), (1,)), ((0,), (0,)))
            if limbs:
                pv = _dot_limbs(p, v, vdims, limbs[1])
            else:
                pv = jax.lax.dot_general(
                    p.astype(dt), v, vdims,
                    preferred_element_type=jnp.float32, precision=prec)
            acc_ref[:] = acc_ref[:] * corr[..., :hd] + pv
            m_ref[:] = m_new

        @pl.when(j == max_pages - 1)
        def _fin():
            lsafe = jnp.where(l_ref[..., :hd] > 0, l_ref[..., :hd], 1.0)
            o_ref[0] = (acc_ref[:] / lsafe).reshape(Hq, hd).astype(dt)

    grid = (S, max_pages)
    stat_lanes = max(hd, 128)

    def q_map(s, j, tbl, lens):
        return (s, j * 0, j * 0)

    def kv_map(s, j, tbl, lens):
        return (tbl[s, j], j * 0, j * 0, j * 0)

    def sc_map(s, j, tbl, lens):
        return (tbl[s, j], j * 0, j * 0)

    def o_map(s, j, tbl, lens):
        return (s, j * 0, j * 0)

    in_specs = [
        pl.BlockSpec((1, Hq, hd), q_map),
        pl.BlockSpec((1, Hkv, ps, hd), kv_map),
        pl.BlockSpec((1, Hkv, ps, hd), kv_map),
    ]
    if quantized:
        in_specs += [pl.BlockSpec((1, Hkv, ps), sc_map)] * 2

    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, Hq, hd), o_map),
            scratch_shapes=[
                pltpu.VMEM((Hkv, group, stat_lanes), jnp.float32),
                pltpu.VMEM((Hkv, group, stat_lanes), jnp.float32),
                pltpu.VMEM((Hkv, group, hd), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((S, Hq, hd), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )
    return call


def paged_attention(q: jax.Array, k_pool: jax.Array, v_pool: jax.Array,
                    tables: jax.Array, lengths: jax.Array, *,
                    k_scale: Optional[jax.Array] = None,
                    v_scale: Optional[jax.Array] = None,
                    scale: Optional[float] = None,
                    window: Optional[int] = None,
                    interpret: Optional[bool] = None) -> jax.Array:
    """Decode attention over paged KV. See module docstring for layouts.

    Slots with lengths[s] == 0 produce zeros (inactive). hd needs no
    128-lane padding: every block covers the FULL hd extent, which Mosaic
    accepts for any size (verified on TPU for hd 64/96/128) — so sub-128
    head dims cost neither pool copies nor extra HBM.

    int8 KV cache: pass int8 pools plus per-(page, head, token) f32
    ``k_scale``/``v_scale`` of shape (P, Hkv, ps) (from ``quantize_kv``);
    rows dequantize on read inside the kernel, so the HBM bill — what bounds
    decode — drops ~4x vs f32 pools.

    ``window``: sliding-window decode — the query (at position
    lengths[s] - 1) sees only the last ``window`` keys; pages entirely
    outside the window are skipped, so per-step cost is O(window)."""
    S, Hq, hd = q.shape
    P, Hkv, ps, hd_k = k_pool.shape
    if hd_k != hd or v_pool.shape != k_pool.shape:
        raise ValueError(f"pool shapes {k_pool.shape}/{v_pool.shape} "
                         f"inconsistent with q {q.shape}")
    if Hq % Hkv:
        raise ValueError(f"Hq {Hq} not a multiple of Hkv {Hkv}")
    quantized = k_pool.dtype == jnp.int8
    if quantized and (k_scale is None or v_scale is None):
        raise ValueError("int8 pools need k_scale/v_scale (P, Hkv, ps)")
    if scale is None:
        scale = 1.0 / (hd ** 0.5)
    if window is not None and int(window) < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    interp = should_interpret() if interpret is None else interpret

    max_pages = tables.shape[1]
    fn = build_paged_attention(S, P, Hq, Hkv, ps, hd, max_pages,
                               float(scale), jnp.dtype(q.dtype).name,
                               quantized, interp,
                               None if window is None else int(window),
                               _quant_mode())
    args = [tables.astype(jnp.int32), lengths.astype(jnp.int32),
            q, k_pool, v_pool]
    if quantized:
        args += [k_scale.astype(jnp.float32), v_scale.astype(jnp.float32)]
    return fn(*args)


@build_cache
def build_paged_window_attention(S: int, P: int, W: int, Hq: int, Hkv: int,
                                 ps: int, hd: int, max_pages: int,
                                 scale: float, dtype: str, quantized: bool,
                                 interpret: bool, window=None,
                                 qmode: str = "k1v1"):
    """W-query variant of the paged decode kernel (verify kernel).

    Query w of sequence s sits at position lengths[s] - W + w and attends
    causally over that sequence's pages. The (W, group) query rows are
    folded OUTSIDE the kernel into one (Hkv, W*group, hd) operand (no
    in-kernel transposes); causal masking recovers w = row // group from
    a row iota. Unlike the one-query kernel, a row can be fully masked
    within a processed page (pages beyond its position, or before its
    sliding window), so probabilities are explicitly zeroed on masked
    lanes rather than relying on exp(-inf)."""
    dt = jnp.dtype(dtype)
    group = Hq // Hkv
    G = W * group
    prec = jax.lax.Precision.HIGHEST if dt == jnp.float32 else None
    limbs = (_parse_mode(qmode)
             if quantized and dt == jnp.float32
             and qmode not in ("default", "base") else None)
    if quantized and dt == jnp.float32 and qmode == "default":
        prec = None

    def kernel(tables_ref, lens_ref, *refs):
        if quantized:
            (q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref,
             m_ref, l_ref, acc_ref) = refs
        else:
            q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref = refs
        s_idx = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        length = lens_ref[s_idx]
        run = j * ps < length
        if window is not None:
            # lowest key any query row needs: (length - W) - window + 1
            run &= j * ps + ps - 1 >= length - W - window + 1

        @pl.when(run)
        def _step():
            q = q_ref[0]                               # (Hkv, G, hd)
            if quantized:
                cdt = jnp.bfloat16 if limbs else dt
                k = k_ref[0].astype(cdt)
                v = v_ref[0].astype(cdt)
            else:
                k = k_ref[0]
                v = v_ref[0]
            kdims = (((2,), (2,)), ((0,), (0,)))
            if limbs:
                s = _dot_limbs(q, k, kdims, limbs[0])
            else:
                s = jax.lax.dot_general(
                    q, k, kdims,
                    preferred_element_type=jnp.float32, precision=prec)
            s = s * scale                              # (Hkv, G, ps)
            if quantized:
                s = s * ks_ref[0][:, None, :]
            kpos = j * ps + jax.lax.broadcasted_iota(
                jnp.int32, (Hkv, G, ps), 2)
            w = jax.lax.broadcasted_iota(
                jnp.int32, (Hkv, G, ps), 1) // group
            qpos = length - W + w
            valid = kpos <= qpos                       # causal (=> < length)
            if window is not None:
                valid &= kpos >= qpos - window + 1
            s = jnp.where(valid, s, _NEG_INF)

            m_prev = m_ref[:]                          # (Hkv, G, 128)
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
            corr = jnp.exp(m_prev - m_new)
            # fully-masked rows keep m_new == -inf: zero p explicitly
            p = jnp.where(valid, jnp.exp(s - m_new[..., :1]), 0.0)
            l_ref[:] = l_ref[:] * corr + jnp.broadcast_to(
                jnp.sum(p, axis=-1, keepdims=True), corr.shape)
            if quantized:
                p = p * vs_ref[0][:, None, :]
            vdims = (((2,), (1,)), ((0,), (0,)))
            if limbs:
                pv = _dot_limbs(p, v, vdims, limbs[1])
            else:
                pv = jax.lax.dot_general(
                    p.astype(dt), v, vdims,
                    preferred_element_type=jnp.float32, precision=prec)
            acc_ref[:] = acc_ref[:] * corr[..., :hd] + pv
            m_ref[:] = m_new

        @pl.when(j == max_pages - 1)
        def _fin():
            lsafe = jnp.where(l_ref[..., :hd] > 0, l_ref[..., :hd], 1.0)
            o_ref[0] = (acc_ref[:] / lsafe).astype(dt)

    grid = (S, max_pages)
    stat_lanes = max(hd, 128)

    def q_map(s, j, tbl, lens):
        return (s, j * 0, j * 0, j * 0)

    def kv_map(s, j, tbl, lens):
        return (tbl[s, j], j * 0, j * 0, j * 0)

    def sc_map(s, j, tbl, lens):
        return (tbl[s, j], j * 0, j * 0)

    in_specs = [
        pl.BlockSpec((1, Hkv, G, hd), q_map),
        pl.BlockSpec((1, Hkv, ps, hd), kv_map),
        pl.BlockSpec((1, Hkv, ps, hd), kv_map),
    ]
    if quantized:
        in_specs += [pl.BlockSpec((1, Hkv, ps), sc_map)] * 2

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, Hkv, G, hd), q_map),
            scratch_shapes=[
                pltpu.VMEM((Hkv, G, stat_lanes), jnp.float32),
                pltpu.VMEM((Hkv, G, stat_lanes), jnp.float32),
                pltpu.VMEM((Hkv, G, hd), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((S, Hkv, G, hd), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )


def paged_window_attention(q: jax.Array, k_pool: jax.Array,
                           v_pool: jax.Array, tables: jax.Array,
                           lengths: jax.Array, *,
                           k_scale: Optional[jax.Array] = None,
                           v_scale: Optional[jax.Array] = None,
                           scale: Optional[float] = None,
                           window: Optional[int] = None,
                           interpret: Optional[bool] = None) -> jax.Array:
    """Multi-query (window-verify) paged attention.

    q (S, W, Hq, hd): W query tokens per sequence; query w of sequence s
    sits at position lengths[s] - W + w and attends CAUSALLY to that
    sequence's paged KV (whose pages already hold the K/V rows for all
    lengths[s] positions, the W new ones included). Returns
    (S, W, Hq, hd).

    This is the verify kernel speculative decoding needs on a paged
    cache: after the draft's W tokens are appended to the pages, ONE
    call scores every draft position — the paged analog of the dense
    ``llama_window_step`` (models/llama.py). Slots with lengths[s] == 0
    return zeros; active slots need lengths[s] >= W. int8 pools +
    per-token scales and sliding ``window`` compose exactly as in
    ``paged_attention``."""
    S, W, Hq, hd = q.shape
    P, Hkv, ps, hd_k = k_pool.shape
    if hd_k != hd or v_pool.shape != k_pool.shape:
        raise ValueError(f"pool shapes {k_pool.shape}/{v_pool.shape} "
                         f"inconsistent with q {q.shape}")
    if Hq % Hkv:
        raise ValueError(f"Hq {Hq} not a multiple of Hkv {Hkv}")
    quantized = k_pool.dtype == jnp.int8
    if quantized and (k_scale is None or v_scale is None):
        raise ValueError("int8 pools need k_scale/v_scale (P, Hkv, ps)")
    if scale is None:
        scale = 1.0 / (hd ** 0.5)
    if window is not None and int(window) < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    interp = should_interpret() if interpret is None else interpret
    group = Hq // Hkv

    max_pages = tables.shape[1]
    fn = build_paged_window_attention(
        S, P, W, Hq, Hkv, ps, hd, max_pages, float(scale),
        jnp.dtype(q.dtype).name, quantized, interp,
        None if window is None else int(window), _quant_mode())
    # fold (W, Hq) -> (Hkv, W*group) outside the kernel: row = w*group + g
    qf = q.reshape(S, W, Hkv, group, hd).transpose(0, 2, 1, 3, 4)
    qf = qf.reshape(S, Hkv, W * group, hd)
    args = [tables.astype(jnp.int32), lengths.astype(jnp.int32),
            qf, k_pool, v_pool]
    if quantized:
        args += [k_scale.astype(jnp.float32), v_scale.astype(jnp.float32)]
    o = fn(*args)
    o = o.reshape(S, Hkv, W, group, hd).transpose(0, 2, 1, 3, 4)
    return o.reshape(S, W, Hq, hd)


def paged_window_attention_reference(q, k_pool, v_pool, tables, lengths, *,
                                     scale: Optional[float] = None,
                                     window: Optional[int] = None
                                     ) -> jax.Array:
    """Dense-gather oracle for ``paged_window_attention``."""
    S, W, Hq, hd = q.shape
    P, Hkv, ps, _ = k_pool.shape
    group = Hq // Hkv
    if scale is None:
        scale = 1.0 / (hd ** 0.5)
    k = k_pool[tables].transpose(0, 2, 1, 3, 4).reshape(S, Hkv, -1, hd)
    v = v_pool[tables].transpose(0, 2, 1, 3, 4).reshape(S, Hkv, -1, hd)
    qg = q.reshape(S, W, Hkv, group, hd)
    s = jnp.einsum("swhgd,shkd->shgwk", qg.astype(jnp.float32),
                   k.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST) * scale
    kpos = jnp.arange(s.shape[-1])[None, None, None, None, :]
    qpos = (lengths[:, None] - W + jnp.arange(W)[None, :])[
        :, None, None, :, None]
    valid = kpos <= qpos
    if window is not None:
        valid &= kpos >= qpos - window + 1
    s = jnp.where(valid, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.where(valid, jnp.exp(s - m), 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("shgwk,shkd->swhgd", p / jnp.maximum(l, 1e-37),
                   v.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
    o = jnp.where(lengths[:, None, None, None, None] > 0, o, 0.0)
    return o.reshape(S, W, Hq, hd).astype(q.dtype)


def quantize_kv(x: jax.Array):
    """Per-token-per-head symmetric int8 quantization for KV rows.

    x (..., hd) f32/bf16 -> (int8 rows, f32 scales (...,)). Used by the
    serving engine to quantize new K/V before the pool scatter."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    s = jnp.where(amax > 0, amax / 127.0, 1.0)
    qx = jnp.clip(jnp.round(x.astype(jnp.float32) / s[..., None]),
                  -127, 127).astype(jnp.int8)
    return qx, s


def paged_attention_reference(q, k_pool, v_pool, tables, lengths, *,
                              scale: Optional[float] = None,
                              window: Optional[int] = None) -> jax.Array:
    """Dense-gather oracle: materialize each sequence's pages and run
    masked softmax attention (for tests and as the XLA comparator)."""
    S, Hq, hd = q.shape
    P, Hkv, ps, _ = k_pool.shape
    group = Hq // Hkv
    if scale is None:
        scale = 1.0 / (hd ** 0.5)
    # gather: (S, max_pages) -> (S, Hkv, max_pages*ps, hd)
    k = k_pool[tables]                    # (S, mp, Hkv, ps, hd)
    v = v_pool[tables]
    k = k.transpose(0, 2, 1, 3, 4).reshape(S, Hkv, -1, hd)
    v = v.transpose(0, 2, 1, 3, 4).reshape(S, Hkv, -1, hd)
    qg = q.reshape(S, Hkv, group, hd)
    s = jnp.einsum("shgd,shkd->shgk", qg.astype(jnp.float32),
                   k.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST) * scale
    kpos = jnp.arange(s.shape[-1])[None, None, None, :]
    lens4 = lengths[:, None, None, None]
    s = jnp.where(kpos < lens4, s, _NEG_INF)
    if window is not None:
        s = jnp.where(kpos >= lens4 - window, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("shgk,shkd->shgd", p / jnp.maximum(l, 1e-37),
                   v.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
    o = jnp.where(lengths[:, None, None, None] > 0, o, 0.0)
    return o.reshape(S, Hq, hd).astype(q.dtype)
