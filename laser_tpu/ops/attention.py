"""Blockwise fused attention: softmax(Q K^T * scale [+ causal]) V.

SURVEY §5 stretch item ("blockwise softmax(QK^T)V using the fused map-reduce
machinery"): the reference's mechanism for a dimension too large for fast
memory is cache blocking with streamed panels (the GEMM kc loop,
gemm.nim:150); blockwise/flash attention is exactly that pattern with an
*online* softmax rescaling instead of a plain accumulation. This kernel is
the composition of the pieces already in this package: the K-streamed MXU
pipeline (ops/gemm/kernel.py), the exp core (ops/vector_math.py), and
lane-uniform running statistics (the multi-accumulator idea of
ops/reductions.py).

``attention_trainable`` pairs the flash forward with fused flash backward
kernels (ops/attention_bwd.py) — O(S) memory in both directions. Head dims
that are not lane multiples (64, 96, ...) are zero-padded to 128 for the
kernels: zero feature columns leave Q K^T, the softmax stats, and the first
D output/gradient columns exactly unchanged, so the flash path covers every
head dim (no O(S^2) fallback).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import should_interpret
from ..registry import build_cache
from ..utils import round_step_up

_NEG_INF = -1e30  # finite sentinel: keeps exp()/rescaling NaN-free


def attention_reference(q, k, v, *, causal: bool = False,
                        scale: Optional[float] = None,
                        window: Optional[int] = None) -> jax.Array:
    """XLA reference implementation (the test oracle, and the autodiff path)."""
    *_, S, D = q.shape
    scale = scale if scale is not None else 1.0 / math.sqrt(D)
    s = jnp.einsum("...qd,...kd->...qk", q, k,
                   precision=jax.lax.Precision.HIGHEST) * scale
    if causal:
        qi = jnp.arange(q.shape[-2])[:, None]
        ki = jnp.arange(k.shape[-2])[None, :]
        s = jnp.where(ki <= qi, s, -jnp.inf)
        if window is not None:
            s = jnp.where(qi - ki < window, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("...qk,...kd->...qd", p, v,
                      precision=jax.lax.Precision.HIGHEST)


@build_cache
def _build_flash(BH: int, S: int, SP: int, D: int, bq: int, bk: int,
                 causal: bool, scale: float, dtype: str, interpret: bool,
                 return_stats: bool = False, use_offsets: bool = False,
                 kv_heads: Optional[tuple] = None,
                 window: Optional[int] = None, chunk: Optional[int] = None):
    """``use_offsets``: the kernel takes two SMEM scalars (q_off, k_off) —
    global sequence positions of the local q/k chunks — and evaluates the
    causal mask in GLOBAL coordinates. One kernel then covers every ring
    step: a past chunk is fully visible, the diagonal chunk is triangular,
    and a future chunk's blocks are all skipped (near-zero cost).

    ``window`` (requires causal): sliding-window attention — row qi sees
    keys in (qi - window, qi]. Blocks entirely past the window are skipped
    like above-diagonal blocks, so cost is O(S * window), and the in-block
    p must be masked explicitly (the first processed block can have rows
    whose every key is already out of window)."""
    nq = SP // bq
    nk = SP // bk
    # In-body sub-chunking (chunk < bk): the k/v BLOCK still arrives as one
    # (bk, D) fetch, but the online softmax runs over unrolled (bq, chunk)
    # sub-chunks INSIDE the kernel body. Chunk c's VPU work (exp, rescale)
    # has no data dependency on chunk c+1's MXU s-dot, so Mosaic interleaves
    # them — measured 136.7 vs 121.8 TFLOP/s at the benched full-mask shape
    # (tools/attention_interleave_probe.py). Cross-grid-step chunking cannot
    # deliver this (each grid step's exp serializes against its own dots:
    # bk=512 with nk=4 grid steps measured 97 TF at the same shape).
    ck = chunk if chunk else bk
    if bk % ck:
        raise ValueError(f"chunk {ck} must divide block_k {bk}")
    nc = bk // ck
    dt = jnp.dtype(dtype)
    stat_lanes = max(D, 128)
    single = nk == 1 and not use_offsets  # value-only fast path, see kernel
    # f32 inputs: force the exact 6-pass path in both MXU contractions (the
    # TPU default silently runs 1-pass bf16, ~1e-3 error); bf16 runs native.
    prec = jax.lax.Precision.HIGHEST if dt == jnp.float32 else None

    def kernel(*refs):
        if use_offsets:
            qoff_ref, koff_ref, q_ref, k_ref, v_ref, *outs_and_scratch = refs
            q_off, k_off = qoff_ref[0], koff_ref[0]
        else:
            q_ref, k_ref, v_ref, *outs_and_scratch = refs
            q_off = k_off = 0
        if single:
            m_ref = l_ref = acc_ref = None  # value-only path, no scratch
            if return_stats:
                o_ref, mo_ref, lo_ref = outs_and_scratch
            else:
                o_ref, = outs_and_scratch
        elif return_stats:
            o_ref, mo_ref, lo_ref, m_ref, l_ref, acc_ref = outs_and_scratch
        else:
            o_ref, m_ref, l_ref, acc_ref = outs_and_scratch
        iq = pl.program_id(1)
        ik = pl.program_id(2)

        if not single:
            @pl.when(ik == 0)
            def _init():
                m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
                l_ref[:] = jnp.zeros_like(l_ref)
                acc_ref[:] = jnp.zeros_like(acc_ref)

        # Causal: blocks entirely above the (global) diagonal are skipped.
        q_start = iq * bq
        k_start = ik * bk

        def _sweep(m_run, l_run, acc):
            # Unrolled sub-chunk online softmax over carried VALUES (the
            # scheduler keeps them in registers where it can).
            def chunk_body(c, carry):
                m_run, l_run, acc = carry
                kc = k_ref[0, c * ck:(c + 1) * ck, :]
                vc = v_ref[0, c * ck:(c + 1) * ck, :]
                # native-dtype MXU dot with f32 accumulation (bf16 stays
                # 1-pass; upcasting would silently force the 6-pass path)
                s = jax.lax.dot_general(q_ref[0], kc,
                                        (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32,
                                        precision=prec)
                s = s * scale
                kpos = (k_start + c * ck
                        + jax.lax.broadcasted_iota(jnp.int32, (bq, ck), 1))
                valid = kpos < S  # sequence-padding mask (local coordinates)
                if causal:
                    qpos = q_start + jax.lax.broadcasted_iota(
                        jnp.int32, (bq, ck), 0)
                    valid = valid & (kpos + k_off <= qpos + q_off)
                    if window is not None:
                        valid = valid & (qpos + q_off - (kpos + k_off)
                                         < window)
                s = jnp.where(valid, s, _NEG_INF)

                m_cur = jnp.max(s, axis=-1, keepdims=True)       # (bq, 1)
                m_new = jnp.maximum(m_run,
                                    jnp.broadcast_to(m_cur, m_run.shape))
                corr = jnp.exp(m_run - m_new)       # (bq, 128)
                p = jnp.exp(s - m_new[:, :1])       # (bq, ck)
                # No explicit p-mask is needed WITHOUT a window: key chunk 0
                # is always processed first and holds >= 1 valid key for
                # every real query row (k_valid >= 1 is enforced; causal
                # rows always see key 0; a ring diagonal chunk's rows see
                # key k_off <= their global position; fully-future ring
                # chunks skip every block, leaving l == 0 for the epilogue
                # guard). So masked entries always have a REAL m_new and
                # exp(-1e30 - m_new) == 0 exactly. WITH a window, the first
                # processed chunk can have rows whose keys are all out of
                # window (m_new stays -1e30, p would be 1):
                if window is not None:
                    p = jnp.where(valid, p, 0.0)
                l_run = l_run * corr + jnp.broadcast_to(
                    jnp.sum(p, axis=-1, keepdims=True), corr.shape)
                acc = acc * corr[:, :D] + jax.lax.dot_general(
                    p.astype(dt), vc, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec)
                return m_new, l_run, acc

            # Chunks run UNCONDITIONALLY, even fully-masked causal ones.
            # Chunk-granular diagonal skipping via lax.cond over the carry
            # was raced and LOSES badly: the cond regions serialize the
            # interleave (causal bq1024/bk2048/ck512: 0.183 ms with conds
            # vs 0.117 without — the 25% flop saving costs 56% wall).
            # Block-granular skipping at the GRID level (pl.when around
            # _step) stays, and is free.
            carry = (m_run, l_run, acc)
            for c in range(nc):
                carry = chunk_body(c, carry)
            return carry

        if single:
            # Single k block, no ring offsets: every query row sees >= 1
            # valid key (causal rows always see key 0), so the whole online
            # softmax lives in values — no scratch init/read/write and no
            # separate _fin region. This is where the full-mask wide-panel
            # default lands (bk = S = 2048), and deleting the scratch
            # round-trips is worth ~7 TFLOP/s on top of the interleave
            # (tools/attention_interleave_probe.py vs the ref-carried
            # variant measured at the same geometry).
            m_run, l_run, acc = _sweep(
                jnp.full((bq, stat_lanes), _NEG_INF, jnp.float32),
                jnp.zeros((bq, stat_lanes), jnp.float32),
                jnp.zeros((bq, D), jnp.float32))
            lsafe = jnp.where(l_run[:, :D] > 0, l_run[:, :D], 1.0)
            o_ref[0] = (acc / lsafe).astype(dt)
            if return_stats:
                mo_ref[0] = m_run[:, :128]
                lo_ref[0] = l_run[:, :128]
            return

        def _step():
            # one scratch read/write per grid step, hoisted around _sweep
            m_run, l_run, acc = _sweep(m_ref[:], l_ref[:], acc_ref[:])
            m_ref[:] = m_run
            l_ref[:] = l_run
            acc_ref[:] = acc

        if causal:
            # blocks strictly above the (global) diagonal are skipped
            # entirely; with a window, so are blocks entirely PAST it
            cond = k_start + k_off <= q_start + q_off + bq - 1
            if window is not None:
                cond &= (q_start + q_off) - (k_start + k_off + bk - 1) < window
            pl.when(cond)(_step)
        else:
            _step()

        @pl.when(ik == nk - 1)
        def _fin():
            # guard rows that saw no valid keys (padded/skipped): l == 0
            lsafe = jnp.where(l_ref[:, :D] > 0, l_ref[:, :D], 1.0)
            o_ref[0] = (acc_ref[:] / lsafe).astype(dt)
            if return_stats:
                mo_ref[0] = m_ref[:, :128]
                lo_ref[0] = l_ref[:, :128]

    grid = (BH, nq, nk)
    offset_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
                    if use_offsets else [])
    if kv_heads is not None:
        # GQA: the flat grid dim b enumerates B*Hq query heads; the K/V
        # arrays hold only B*Hkv heads — translate b to its kv head
        # (group = Hq // Hkv consecutive q heads share one kv head).
        Hq, Hkv = kv_heads
        group = Hq // Hkv

        def kv_map(b, i, j):
            return ((b // Hq) * Hkv + (b % Hq) // group, j, 0)
    else:
        def kv_map(b, i, j):
            return (b, j, 0)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=offset_specs + [
            pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), kv_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), kv_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0),
                                memory_space=pltpu.VMEM)] + (
            [pl.BlockSpec((1, bq, 128), lambda b, i, j: (b, i, 0),
                          memory_space=pltpu.VMEM)] * 2 if return_stats else []),
        out_shape=[jax.ShapeDtypeStruct((BH, SP, D), dt)] + (
            [jax.ShapeDtypeStruct((BH, SP, 128), jnp.float32)] * 2
            if return_stats else []),
        scratch_shapes=[] if single else [
            pltpu.VMEM((bq, stat_lanes), jnp.float32),  # running max
            pltpu.VMEM((bq, stat_lanes), jnp.float32),  # running denom
            pltpu.VMEM((bq, D), jnp.float32),           # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # The default 16 MB scoped-VMEM budget is both too small for
            # the widest profitable panels (f32 stats-forward at bk=1024 =
            # 16.8 MB) and NONDETERMINISTIC at the edge: the identical
            # f32 bwd MLIR compiled in one session and scoped-OOMed in the
            # next. Every other kernel family here pins 96-100 MB.
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * SP * SP * D, transcendentals=BH * SP * SP,
            bytes_accessed=4 * BH * SP * D * dt.itemsize),
        interpret=interpret,
    )
    if not use_offsets:
        return call

    def with_offsets(q3, k3, v3, q_off, k_off):
        return call(jnp.asarray(q_off, jnp.int32).reshape(1),
                    jnp.asarray(k_off, jnp.int32).reshape(1), q3, k3, v3)

    return with_offsets


def attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
              causal: bool = False, scale: Optional[float] = None,
              window: Optional[int] = None,
              block_q: Optional[int] = None,
              block_k: Optional[int] = None,
              chunk: Optional[int] = None,
              interpret: Optional[bool] = None) -> jax.Array:
    """Fused blockwise attention over (..., S, D) tensors.

    Leading dims are batch/heads (flattened into the grid). Any head dim is
    supported: D is zero-padded up to a lane multiple (128) for the kernel —
    zero feature columns contribute nothing to Q K^T and produce zero output
    columns, which are sliced off. head_dim 64/96 therefore runs the flash
    path (never the O(S^2) reference). S is padded internally as well.

    ``window`` (requires causal): sliding-window attention — row i sees
    keys (i - window, i]. Out-of-window key blocks are skipped, so the
    cost is O(S * window) instead of O(S^2).
    """
    q, k, v = map(jnp.asarray, (q, k, v))
    if q.shape != k.shape or q.shape != v.shape:
        raise ValueError(f"attention shapes must match: {q.shape} {k.shape} "
                         f"{v.shape}")
    window = _check_window(window, causal)
    *lead, S, D = q.shape
    scale = scale if scale is not None else 1.0 / math.sqrt(D)
    interp = should_interpret() if interpret is None else interpret

    BH = int(np.prod(lead)) if lead else 1
    DP = round_step_up(D, 128)
    if block_k is None:
        block_k = _default_block_k(DP, q.dtype, window)
    if block_q is None:
        block_q = _default_block_q(DP, q.dtype, causal, window)
    bq = min(block_q, round_step_up(S, 8))
    bk = min(block_k, round_step_up(S, 128))
    # SP must let the grid COVER every row on both axes: (SP//bq)*bq >= S
    # and (SP//bk)*bk >= S. round_step_up(S, max(bq, bk)) violates this
    # when the smaller block doesn't divide the larger (bf16 S=1500 ->
    # bq=1024, bk=1536: SP=1536 leaves rows >= 1024 unvisited); the max of
    # per-axis roundings is a multiple of bq OR >= the bq-rounding, which
    # floor-covers S on each axis. SP is then rounded to a bq MULTIPLE:
    # bq-floor-covering S leaves rows in [floor(SP/bq)*bq, SP) unvisited —
    # padding for the output, but the saved softmax stats for them would
    # stay uninitialized and poison the backward (caught at S=1500 when
    # the causal bq=2048 default clamps to a non-dividing 1504).
    SP = round_step_up(max(round_step_up(S, bq), round_step_up(S, bk)), bq)
    # Sub-chunk the K panel in-body (see _build_flash): the unrolled chunked
    # online softmax lets Mosaic overlap each chunk's exp with the next
    # chunk's s-dot. Measured at B8 S2048 D128 bf16 (tools/
    # attention_interleave_probe.py + PERF_NOTES round-4 attention section):
    # full-mask 2048-panel with 1024-chunks 0.122 ms (was 0.141 unchunked);
    # causal 2048-panel with 512-chunks 0.117 ms (512 wins over 1024's
    # 0.124 — the finer unroll exposes more exp/dot overlap against the
    # mask's VPU work). f32 keeps nc=1 (the 6-pass dots already keep the
    # MXU busy; interleave unmeasured).
    if chunk is None:
        chunk = _default_chunk(bk, q.dtype, causal)
    chunk = min(chunk, bk)
    q3 = q.reshape(BH, S, D)
    k3 = k.reshape(BH, S, D)
    v3 = v.reshape(BH, S, D)
    if SP != S or DP != D:
        pad = ((0, 0), (0, SP - S), (0, DP - D))
        q3, k3, v3 = (jnp.pad(t, pad) for t in (q3, k3, v3))

    call = _build_flash(BH, S, SP, DP, bq, bk, causal, float(scale),
                        jnp.dtype(q.dtype).name, interp, window=window,
                        chunk=chunk)
    out = call(q3, k3, v3)[0]
    return out[:, :S, :D].reshape(*lead, S, D)


def _check_window(window, causal):
    if window is None:
        return None
    if not causal:
        raise ValueError("window requires causal=True (sliding-window "
                         "attention is a causal mask refinement)")
    window = int(window)
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    return window


def _default_block_k(DP: int, dtype, window) -> int:
    """Forward K-panel default: the widest panel VMEM affords (fewer
    online-softmax rescale passes, longer MXU chains, and at bk = S the
    scratch-free `single` kernel path). Round 3's "causal keeps 1024 for
    block skipping" rule is REFUTED by the round-4 interleave kernel:
    causal bk=2048/ck=512 runs 0.117 ms vs 0.124 at bk=1024 (B8 S2048
    D128 bf16) — the single-path + interleave savings beat the skipped
    diagonal block. Grid-level skipping still applies whenever S > bk.
    Windowed attention keeps sub-S blocks (its O(S*window) cost NEEDS
    block-granular skipping); wider rows (f32, or head dims padding past
    128 lanes) halve the panel to stay inside the 16 MB scoped-VMEM
    budget."""
    row_bytes = DP * jnp.dtype(dtype).itemsize
    return 1024 if (window is not None or row_bytes > 256) else 2048


def _default_block_q(DP: int, dtype, causal, window) -> int:
    """Forward q-block default. Round-5 end-to-end geometry race
    (tools/attention_block_race.py, B8 S2048 D128 bf16): CAUSAL wants the
    2048-row q block — (bq=2048, bk=2048, ck=512) runs 152.0 TF vs 147.6
    at (1024, 2048) — one stats init/finalize amortized over twice the
    math; FULL mask keeps 1024 (its (2048, 2048, 512) row is 146.1 vs
    151.1 at bq=1024). The ceiling probe's favored (bq=2048, bk=1024)
    does NOT transfer end to end (113.9-117.1 TF: narrower K panels
    double the online-softmax rescale traffic), resolving the round-4
    probe-vs-product discrepancy. Wider rows (f32 / head dims padded past
    128 lanes) and windowed masks keep 1024 (VMEM / unraced). The
    BACKWARD keeps its own 1024 (its dq/dkv accumulators, see _att_bwd).
    """
    row_bytes = DP * jnp.dtype(dtype).itemsize
    return 2048 if (causal and window is None and row_bytes <= 256) else 1024


def _default_chunk(bk: int, dtype, causal: bool) -> int:
    """In-body sub-chunk width (see _build_flash). Round-5 race (B8 S2048
    D128 bf16, tools/attention_block_race.py): 512-chunks win BOTH masks
    — full (1024, 2048, 512) 151.1 TF vs 143.4 at ck=1024 (round 4 had
    measured 1024 ahead; the finer unroll now wins on this toolchain),
    causal (2048, 2048, 512) 152.0 vs 147.7 at 1024; ck=256
    over-fragments (135-137). f32 keeps chunk = bk — the 6-pass dots
    already fill the MXU, so there is no idle VPU slot for the interleave
    to reclaim."""
    if jnp.dtype(dtype).itemsize == 4:
        return bk
    c = min(bk, 512)
    while bk % c:  # bk from round_step_up(S,128) may be e.g. 1536
        c //= 2
    return c


def attention_with_stats(q, k, v, *, causal: bool = False,
                         scale: Optional[float] = None,
                         k_valid: Optional[int] = None,
                         q_offset=None, k_offset=None,
                         window: Optional[int] = None,
                         block_q: Optional[int] = None,
                         block_k: Optional[int] = None,
                         interpret: Optional[bool] = None):
    """Flash attention that also returns the softmax residuals.

    Returns (out, m, l): out (..., S, D) normalized; m/l (..., S) the running
    max and denominator per query row — enough to merge partial attentions
    over disjoint key sets with the standard log-sum-exp combination. This is
    the building block for ring/sequence-parallel attention.

    ``k_valid`` masks keys beyond that count (defaults to k's length).
    ``q_offset``/``k_offset`` (traced int32 scalars) place the q/k chunks at
    global sequence positions for the causal mask — the single-kernel ring
    step: past chunks come out fully visible, the diagonal triangular, and
    future chunks all-skipped. ``window`` refines the causal mask to the
    sliding window (evaluated in the same global coordinates).
    """
    q, k, v = map(jnp.asarray, (q, k, v))
    window = _check_window(window, causal)
    *lead, S, D = q.shape
    Sk = k.shape[-2]
    scale = scale if scale is not None else 1.0 / math.sqrt(D)
    interp = should_interpret() if interpret is None else interpret
    if k_valid is not None and int(k_valid) <= 0:
        raise ValueError(f"k_valid must be positive, got {k_valid}")
    BH = int(np.prod(lead)) if lead else 1
    DP = round_step_up(D, 128)
    if block_k is None:
        # same policy as attention(): widest K panel unless a mask needs
        # block-granular skipping (causal incl. offset-causal ring chunks)
        # or the row width would blow the scoped-VMEM budget
        row_bytes = DP * jnp.dtype(q.dtype).itemsize
        block_k = 1024 if (causal or window is not None
                           or row_bytes > 256) else 2048
    if block_q is None:
        block_q = _default_block_q(DP, q.dtype, causal, window)
    bq = min(block_q, round_step_up(S, 8))
    bk = min(block_k, round_step_up(Sk, 128))
    SPq = round_step_up(S, bq)
    SPk = round_step_up(Sk, bk)
    SP = round_step_up(max(SPq, SPk), bq)  # bq-multiple (stats coverage)
    q3 = q.reshape(BH, S, D)
    k3 = k.reshape(BH, Sk, D)
    v3 = v.reshape(BH, Sk, D)
    if SP != S or DP != D:
        q3 = jnp.pad(q3, ((0, 0), (0, SP - S), (0, DP - D)))
    if SP != Sk or DP != D:
        k3 = jnp.pad(k3, ((0, 0), (0, SP - Sk), (0, DP - D)))
        v3 = jnp.pad(v3, ((0, 0), (0, SP - Sk), (0, DP - D)))
    kv = k_valid if k_valid is not None else Sk
    use_off = q_offset is not None or k_offset is not None
    call = _build_flash(BH, int(kv), SP, DP, bq, bk, causal, float(scale),
                        jnp.dtype(q.dtype).name, interp, return_stats=True,
                        use_offsets=use_off, window=window,
                        chunk=_default_chunk(bk, q.dtype, causal))
    if use_off:
        out, m, l = call(q3, k3, v3,
                         q_offset if q_offset is not None else 0,
                         k_offset if k_offset is not None else 0)
    else:
        out, m, l = call(q3, k3, v3)
    out = out[:, :S, :D].reshape(*lead, S, D)
    m = m[:, :S, 0].reshape(*lead, S)
    l = l[:, :S, 0].reshape(*lead, S)
    return out, m, l


# ---------------------------------------------------------------------------
# Trainable wrapper: flash forward, fused flash backward kernels.
# ---------------------------------------------------------------------------

def _flash_forward_padded(q, k, v, causal, scale, block_q, block_k,
                          interpret, window=None):
    """Run the stats-returning forward once, keeping the PADDED tensors as
    residuals for the backward kernels. ``block_k=None`` takes the
    forward's measured panel default — the saved stats are per-row, so
    the backward is free to run a DIFFERENT geometry over them. One
    carve-out: f32 halves the panel to 512. The stats variant carries the
    extra (m, l) row outputs on top of the inference forward's buffers,
    and at bk=1024 its f32 scoped-VMEM footprint is 16.8 MB vs the 16 MB
    limit (measured compile-fail, B8 S2048 D128); bk=512 fits and the
    backward — where f32's 6-pass dots put the time — is geometry-tuned
    independently anyway."""
    *lead, S, D = q.shape
    BH = int(np.prod(lead)) if lead else 1
    DP = round_step_up(D, 128)
    if block_k is None:
        if jnp.dtype(q.dtype).itemsize == 4:
            block_k = 512
        else:
            block_k = _default_block_k(DP, q.dtype, window)
    if block_q is None:
        block_q = _default_block_q(DP, q.dtype, causal, window)
    bq = min(block_q, round_step_up(S, 8))
    bk = min(block_k, round_step_up(S, 128))
    SP = round_step_up(max(round_step_up(S, bq), round_step_up(S, bk)),
                       bq)  # bq-multiple: see attention() (stats coverage)
    q3 = q.reshape(BH, S, D)
    k3 = k.reshape(BH, S, D)
    v3 = v.reshape(BH, S, D)
    if SP != S or DP != D:
        pad = ((0, 0), (0, SP - S), (0, DP - D))
        q3, k3, v3 = (jnp.pad(t, pad) for t in (q3, k3, v3))
    call = _build_flash(BH, S, SP, DP, bq, bk, causal, float(scale),
                        jnp.dtype(q.dtype).name, interpret, return_stats=True,
                        window=window,
                        chunk=_default_chunk(bk, q.dtype, causal))
    o3, m3, l3 = call(q3, k3, v3)
    out = o3[:, :S, :D].reshape(*lead, S, D)
    return out, (q3, k3, v3, o3, m3, l3), (BH, S, SP, DP, bq, bk)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _attention_ad(q, k, v, causal, scale, block_q, block_k, window=None):
    return attention(q, k, v, causal=causal, scale=scale, block_q=block_q,
                     block_k=block_k, window=window)


def _att_fwd(q, k, v, causal, scale, block_q, block_k, window=None):
    interp = should_interpret()
    out, padded, _ = _flash_forward_padded(q, k, v, causal, scale,
                                           block_q, block_k, interp, window)
    return out, padded


def _att_bwd(causal, scale, block_q, block_k, window, res, g):
    from .attention_bwd import flash_attention_bwd

    q3, k3, v3, o3, m3, l3 = res
    BH, SP, DP = q3.shape
    *lead, S, D = g.shape
    if block_k is None:
        # BACKWARD K-panel default, measured separately from the forward's
        # (tools/attention_bwd_race.py geometry sweep, B8 S2048 D128 bf16,
        # chunk 256): (bq, bk) = (1024, 1024) wins both masks — full 111.9
        # TF vs 102.4 at bk=512; causal 64.9 vs 57.3; 2048-wide panels
        # fail to compile (the two (bk, D) f32 accumulators + four panels
        # exceed VMEM). The forward prefers 2048 (one online-softmax pass);
        # the backward's dkv accumulators make 1024 the widest bf16 fit —
        # and f32's double-width panels push even 1024 past scoped VMEM
        # (measured compile-fail at B8 S2048 D128), so f32 keeps 512
        # (22.0 TF full / 14.1 causal, the round-3 geometry).
        block_k = 512 if jnp.dtype(q3.dtype).itemsize == 4 else 1024
    if block_q is None:
        # the backward keeps 1024 regardless of mask: its per-q-block
        # dq accumulator rides beside the dkv panels, and the forward's
        # causal 2048-row win was raced forward-only
        block_q = 1024
    bq = min(block_q, round_step_up(S, 8))
    bk = min(block_k, round_step_up(S, 128))
    g3 = g.reshape(BH, S, D)
    if SP != S or DP != D:
        # zero feature columns produce zero dq/dk/dv columns (sliced below)
        g3 = jnp.pad(g3, ((0, 0), (0, SP - S), (0, DP - D)))
    dq, dk, dv = flash_attention_bwd(
        q3, k3, v3, o3, m3, l3, g3, S=S, SP=SP, D=DP, bq=bq, bk=bk,
        causal=causal, scale=float(scale), interpret=should_interpret(),
        window=window)
    shape = (*lead, S, D)
    return (dq[:, :S, :D].reshape(shape), dk[:, :S, :D].reshape(shape),
            dv[:, :S, :D].reshape(shape))


_attention_ad.defvjp(_att_fwd, _att_bwd)


def attention_gqa(q: jax.Array, k: jax.Array, v: jax.Array, *,
                  causal: bool = False, scale: Optional[float] = None,
                  window: Optional[int] = None,
                  block_q: Optional[int] = None,
                  block_k: Optional[int] = None,
                  interpret: Optional[bool] = None) -> jax.Array:
    """Grouped-query attention: q (B, Hq, S, D), k/v (B, Hkv, S, D) with
    Hq a multiple of Hkv (MQA is Hkv=1). The kernel reads each K/V head
    once from HBM — the grid's head dimension maps consecutive q-head
    groups onto their shared kv head — so KV memory traffic is Hkv/Hq of
    the repeated-KV formulation (the whole point of GQA serving)."""
    q, k, v = map(jnp.asarray, (q, k, v))
    if q.ndim != 4 or k.ndim != 4:
        raise ValueError("attention_gqa expects (B, H, S, D) tensors")
    B, Hq, S, D = q.shape
    _, Hkv, Sk, Dk = k.shape
    if Sk != S or Dk != D or k.shape != v.shape:
        raise ValueError(f"k/v shape mismatch: {k.shape} {v.shape} vs "
                         f"q {q.shape}")
    if Hq % Hkv:
        raise ValueError(f"Hq={Hq} not a multiple of Hkv={Hkv}")
    window = _check_window(window, causal)
    if Hq == Hkv:
        return attention(q, k, v, causal=causal, scale=scale, window=window,
                         block_q=block_q, block_k=block_k,
                         interpret=interpret)
    scale = scale if scale is not None else 1.0 / math.sqrt(D)
    interp = should_interpret() if interpret is None else interpret
    DP = round_step_up(D, 128)
    if block_k is None:
        block_k = _default_block_k(DP, q.dtype, window)
    if block_q is None:
        block_q = _default_block_q(DP, q.dtype, causal, window)
    bq = min(block_q, round_step_up(S, 8))
    bk = min(block_k, round_step_up(S, 128))
    SP = round_step_up(max(round_step_up(S, bq), round_step_up(S, bk)),
                       bq)  # bq-multiple: see attention() (stats coverage)
    q3 = q.reshape(B * Hq, S, D)
    k3 = k.reshape(B * Hkv, S, D)
    v3 = v.reshape(B * Hkv, S, D)
    if SP != S or DP != D:
        pad = ((0, 0), (0, SP - S), (0, DP - D))
        q3, k3, v3 = (jnp.pad(t, pad) for t in (q3, k3, v3))
    call = _build_flash(B * Hq, S, SP, DP, bq, bk, causal, float(scale),
                        jnp.dtype(q.dtype).name, interp,
                        kv_heads=(Hq, Hkv), window=window,
                        chunk=_default_chunk(bk, q.dtype, causal))
    out = call(q3, k3, v3)[0]
    return out[:, :S, :D].reshape(B, Hq, S, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _gqa_ad(q, k, v, causal, scale, block_q, block_k, window=None):
    return attention_gqa(q, k, v, causal=causal, scale=scale,
                         block_q=block_q, block_k=block_k, window=window)


def _gqa_fwd(q, k, v, causal, scale, block_q, block_k, window=None):
    out = attention_gqa(q, k, v, causal=causal, scale=scale,
                        block_q=block_q, block_k=block_k, window=window)
    return out, (q, k, v)


def _gqa_bwd(causal, scale, block_q, block_k, window, res, g):
    # Backward via KV expansion: repeat K/V across the group, run the fused
    # MHA flash backward, then SUM dk/dv over each group (the exact VJP of
    # the broadcast). Pays group-x KV memory only in the backward.
    q, k, v = res
    B, Hq, S, D = q.shape
    Hkv = k.shape[1]
    grp = Hq // Hkv
    ke = jnp.repeat(k, grp, axis=1)
    ve = jnp.repeat(v, grp, axis=1)
    _, vjp = jax.vjp(
        lambda qq, kk, vv: _attention_ad(qq, kk, vv, causal, scale,
                                         block_q, block_k, window),
        q, ke, ve)
    dq, dke, dve = vjp(g)
    dk = dke.reshape(B, Hkv, grp, S, D).sum(2)
    dv = dve.reshape(B, Hkv, grp, S, D).sum(2)
    return dq, dk, dv


_gqa_ad.defvjp(_gqa_fwd, _gqa_bwd)


def attention_gqa_trainable(q, k, v, *, causal: bool = False,
                            scale: Optional[float] = None,
                            window: Optional[int] = None,
                            block_q: Optional[int] = None,
                            block_k: Optional[int] = None) -> jax.Array:
    """Differentiable GQA: native grouped flash forward; backward expands
    K/V across the group and group-sums dk/dv."""
    *_, D = q.shape
    return _gqa_ad(q, k, v, causal,
                   scale if scale is not None else 1.0 / math.sqrt(D),
                   block_q, block_k, _check_window(window, causal))


def attention_trainable(q, k, v, *, causal: bool = False,
                        scale: Optional[float] = None,
                        window: Optional[int] = None,
                        block_q: Optional[int] = None,
                        block_k: Optional[int] = None) -> jax.Array:
    """Differentiable attention: flash kernel forward AND fused flash
    backward kernels (O(S) memory in both directions; the S x S matrix is
    recomputed blockwise on the MXU in the backward). ``window`` gives
    sliding-window attention in BOTH directions (out-of-window blocks are
    skipped in forward, dq, and dk/dv passes)."""
    *_, D = q.shape
    return _attention_ad(q, k, v, causal,
                         scale if scale is not None else 1.0 / math.sqrt(D),
                         block_q, block_k, _check_window(window, causal))
