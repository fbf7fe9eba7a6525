"""Fused cross-entropy over logits — the LM-training loss as ONE kernel.

The jnp composition (``log_softmax`` then gather) materializes a second
(T, V) array and re-reads it: ~3x the HBM traffic of the information
actually needed (read logits once, write one scalar per row). This kernel
streams each row's vocabulary blocks once, carrying online logsumexp
statistics (the flash-attention trick, as in vector_math._softmax_online)
plus a masked-lane accumulator that picks out the target logit in the same
pass — no gather, no (T, V) intermediate.

Backward is a second single pass: dlogits = g * (exp(x - lse) - onehot),
recomputed from the saved per-row lse — O(T) residual instead of the
(T, V) softmax jax would keep alive.

Reference scope note: the reference is a kernel library without a loss
zoo; these ops exist because the LM model families train with them and
they are the canonical "fuse the vocab-sized intermediate away" TPU
kernels: ``cross_entropy`` fuses the log-softmax+gather given logits,
``lm_cross_entropy`` additionally fuses the unembedding projection so the
logits themselves never exist (vocab streamed in chunks, fwd and bwd).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import should_interpret
from ..registry import build_cache
from ..utils import cdiv, round_step_up
from .vector_math import _exp_expr, _log_expr


@build_cache
def _build_ce_fwd(T: int, V: int, bt: int, bv: int, dtype: str,
                  eps: float, interpret: bool):
    nt, nv = cdiv(T, bt), cdiv(V, bv)
    vpad = nv * bv != V
    tpad = nt * bt != T

    def kernel(x_ref, t_ref, loss_ref, lse_ref, m_ref, s_ref, tv_ref,
               sv_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            m_ref[:] = jnp.full_like(m_ref, -np.inf)
            s_ref[:] = jnp.zeros_like(s_ref)
            tv_ref[:] = jnp.zeros_like(tv_ref)
            if eps:
                sv_ref[:] = jnp.zeros_like(sv_ref)

        v = x_ref[:].astype(jnp.float32)
        cpos = j * bv + jax.lax.broadcasted_iota(jnp.int32, (bt, bv), 1)
        if vpad:
            v = jnp.where(cpos < V, v, -np.inf)
        if tpad:
            # tail rows beyond T hold undefined data; poison-proof them
            rpos = i * bt + jax.lax.broadcasted_iota(jnp.int32, (bt, bv), 0)
            v = jnp.where(rpos < T, v, -np.inf)

        m_prev = m_ref[:]
        m_cur = jnp.max(v, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
        msafe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        corr = jnp.where(jnp.isfinite(m_prev), _exp_expr(m_prev - msafe),
                         0.0)
        e = _exp_expr(v - msafe[:, :1])
        e = jnp.where(v == -jnp.inf, 0.0, e)
        s_ref[:] = s_ref[:] * corr + jnp.broadcast_to(
            jnp.sum(e, axis=-1, keepdims=True), corr.shape)
        m_ref[:] = m_new

        tmask = cpos == t_ref[:]  # (bt, bv), target col of each row
        tv_ref[:] += jnp.broadcast_to(
            jnp.sum(jnp.where(tmask, v, 0.0), axis=-1, keepdims=True),
            tv_ref.shape)
        if eps:  # label smoothing also needs the plain row sum of logits
            sv_ref[:] += jnp.broadcast_to(
                jnp.sum(jnp.where(v == -jnp.inf, 0.0, v), axis=-1,
                        keepdims=True), sv_ref.shape)

        @pl.when(j == nv - 1)
        def _emit():
            lse = m_ref[:, :1] + _log_expr(s_ref[:, :1])
            if eps:
                # q = (1-eps)*onehot + eps/V:  loss = lse - <q, x>
                loss_ref[:] = (lse - (1.0 - eps) * tv_ref[:, :1]
                               - (eps / V) * sv_ref[:, :1])
            else:
                loss_ref[:] = lse - tv_ref[:, :1]
            lse_ref[:] = lse

    return pl.pallas_call(
        kernel,
        grid=(nt, nv),
        in_specs=[
            pl.BlockSpec((bt, bv), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((T, 1), jnp.float32),
                   jax.ShapeDtypeStruct((T, 1), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((bt, 128), jnp.float32),
                        pltpu.VMEM((bt, 128), jnp.float32),
                        pltpu.VMEM((bt, 128), jnp.float32),
                        pltpu.VMEM((bt, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )


@build_cache
def _build_ce_bwd(T: int, V: int, bt: int, bv: int, dtype: str,
                  eps: float, interpret: bool):
    nt, nv = cdiv(T, bt), cdiv(V, bv)
    vpad = nv * bv != V
    dt = jnp.dtype(dtype)

    def kernel(x_ref, t_ref, lse_ref, g_ref, dx_ref):
        j = pl.program_id(1)
        v = x_ref[:].astype(jnp.float32)
        cpos = j * bv + jax.lax.broadcasted_iota(jnp.int32, (bt, bv), 1)
        p = _exp_expr(v - lse_ref[:])          # softmax via saved lse
        q = (cpos == t_ref[:]).astype(jnp.float32)  # soft target dist
        if eps:
            q = (1.0 - eps) * q + (eps / V)
            if vpad:  # smoothing mass only on real vocab columns
                q = jnp.where(cpos < V, q, 0.0)
        dx_ref[:] = (g_ref[:] * (p - q)).astype(dt)

    return pl.pallas_call(
        kernel,
        grid=(nt, nv),
        in_specs=[
            pl.BlockSpec((bt, bv), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, bv), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, V), dt),
        # dx aliases the logits buffer: the backward is a same-shape
        # read->write stream, and the aliased (donated) regime runs
        # ~590 GB/s where out-of-place serializes at ~310 (PERF_NOTES
        # "HBM streaming"). Safe under jit for ANY caller: XLA inserts a
        # copy iff the logits value is still live after this call, which
        # just restores the out-of-place cost. In jax.grad(loss)(x) the
        # residual dies here, so training steps get the fast path.
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )


@build_cache
def _build_ce_fused_grad(T: int, V: int, bt: int, dtype: str, eps: float,
                         interpret: bool):
    """ONE-pass value+grad: read each (bt, V) row block once, emit the
    per-row loss AND the unit-cotangent gradient dxu = softmax(x) - q in
    the same kernel, dxu ALIASING the logits buffer.

    Round-5 rationale (VERDICT #6): the two-kernel VJP (online-lse
    forward + recompute backward) moves 3 logits-sized HBM passes; under
    jit XLA's own composed grad fuses to ~2 passes and was beating it
    0.71x even after the dx aliasing. With the whole vocabulary row
    RESIDENT (bt rows x V lanes in VMEM — 16 MB covers V up to ~512k at
    bt=8), the lse needs no online carry, so value and gradient cost ONE
    read + one aliased write: the information-theoretic floor for this
    op. Used only inside the VJP forward rule — value-only callers keep
    the online kernel and never pay the dxu write."""
    nt = cdiv(T, bt)
    tpad = nt * bt != T
    dt = jnp.dtype(dtype)

    def kernel(x_ref, t_ref, loss_ref, dx_ref):
        i = pl.program_id(0)
        v = x_ref[:].astype(jnp.float32)                  # (bt, V)
        cpos = jax.lax.broadcasted_iota(jnp.int32, (bt, V), 1)
        if tpad:  # tail rows hold undefined data; poison-proof them
            rpos = i * bt + jax.lax.broadcasted_iota(jnp.int32, (bt, V), 0)
            v = jnp.where(rpos < T, v, 0.0)
        m = jnp.max(v, axis=-1, keepdims=True)
        e = _exp_expr(v - m)
        s = jnp.sum(e, axis=-1, keepdims=True)
        lse = m + _log_expr(s)
        tmask = cpos == t_ref[:]
        tv = jnp.sum(jnp.where(tmask, v, 0.0), axis=-1, keepdims=True)
        if eps:
            sv = jnp.sum(v, axis=-1, keepdims=True)
            loss_ref[:] = lse - (1.0 - eps) * tv - (eps / V) * sv
        else:
            loss_ref[:] = lse - tv
        p = e / s
        q = tmask.astype(jnp.float32)
        if eps:
            q = (1.0 - eps) * q + (eps / V)
        dx_ref[:] = (p - q).astype(dt)

    return pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((bt, V), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, V), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((T, 1), jnp.float32),
                   jax.ShapeDtypeStruct((T, V), dt)],
        input_output_aliases={0: 1},  # dxu overwrites the dead logits
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )


def _fused_grad_bt(T: int, V: int) -> Optional[int]:
    """Row-block height for the one-pass value+grad kernel, or None when
    a (bt, V) f32 row block cannot fit the 16 MB working budget (then the
    online two-kernel path handles the — pathological — vocabulary)."""
    Vp = round_step_up(V, 128)
    bt = min(round_step_up(T, 8), ((4 * 1024 * 1024) // (4 * Vp)) // 8 * 8)
    return bt if bt >= 8 else None


def _plan_blocks(T: int, V: int, itemsize: int):
    """~2 MB input blocks, LANE-MAJOR: the widest V block first (long
    contiguous DMA runs — a (256, 2048) block of a 50k-wide array reads
    8 KB runs at 200 KB pitch and measured 188 GB/s; (8, 50k) full-row
    blocks stream at the softmax kernel's rate), then as many 8-aligned
    rows as the ~2 MB budget affords."""
    bv = min(round_step_up(V, 128), 64 * 1024)
    bt = max(8, min(round_step_up(T, 8),
                    (2 * 1024 * 1024 // itemsize) // bv))
    bt = max(8, (bt // 8) * 8)
    return bt, bv


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _ce_rows(logits, targets, eps, interpret):
    loss, _ = _ce_fwd_impl(logits, targets, eps, interpret)
    return loss


def _ce_fwd_impl(logits, targets, eps, interpret):
    T, V = logits.shape
    bt, bv = _plan_blocks(T, V, jnp.dtype(logits.dtype).itemsize)
    call = _build_ce_fwd(T, V, bt, bv, jnp.dtype(logits.dtype).name,
                         eps, interpret)
    loss2, lse2 = call(logits, targets.astype(jnp.int32).reshape(T, 1))
    return loss2[:, 0], lse2


def _ce_fwd_vjp(logits, targets, eps, interpret):
    T, V = logits.shape
    bt = _fused_grad_bt(T, V)
    if bt is not None:
        # one-pass value+grad: the residual is the UNIT gradient (which
        # replaces — and buffer-aliases — the logits residual the
        # two-kernel path would have kept; peak memory unchanged)
        call = _build_ce_fused_grad(T, V, bt,
                                    jnp.dtype(logits.dtype).name,
                                    eps, interpret)
        loss2, dxu = call(logits, targets.astype(jnp.int32).reshape(T, 1))
        return loss2[:, 0], (dxu, None, None)
    loss, lse = _ce_fwd_impl(logits, targets, eps, interpret)
    return loss, (None, (logits, targets, lse), None)


def _ce_bwd_vjp(eps, interpret, res, g):
    dxu, online, _ = res
    if dxu is not None:
        # per-row cotangent scale; XLA fuses this elementwise multiply
        # into dx's consumer (optimizer update / matmul read)
        return (g.astype(jnp.float32)[:, None] * dxu.astype(jnp.float32)
                ).astype(dxu.dtype), None
    logits, targets, lse = online
    T, V = logits.shape
    bt, bv = _plan_blocks(T, V, jnp.dtype(logits.dtype).itemsize)
    call = _build_ce_bwd(T, V, bt, bv, jnp.dtype(logits.dtype).name,
                         eps, interpret)
    dx = call(logits, targets.astype(jnp.int32).reshape(T, 1), lse,
              g.astype(jnp.float32).reshape(T, 1))
    return dx, None


_ce_rows.defvjp(_ce_fwd_vjp, _ce_bwd_vjp)


def cross_entropy(logits: jax.Array, targets: jax.Array, *,
                  reduction: str = "mean", label_smoothing: float = 0.0,
                  ignore_index: Optional[int] = None,
                  interpret: Optional[bool] = None) -> jax.Array:
    """Cross-entropy from raw logits, fused: loss_t = lse(x_t) - x_t[y_t].

    logits (..., V) float, targets (...) int — leading dims are flattened
    into rows. ``reduction``: "mean" | "sum" | "none" (per-row losses in
    the input's leading shape). Differentiable (custom VJP, one fused
    backward pass; the (T, V) softmax is never materialized).

    ``label_smoothing`` ε targets q = (1-ε)·onehot + ε/V (the row sum of
    logits rides the same pass as the logsumexp). Rows whose target equals
    ``ignore_index`` contribute zero loss and zero gradient; "mean"
    divides by the count of contributing rows.
    """
    if reduction not in ("mean", "sum", "none"):
        raise ValueError(f"unknown reduction {reduction!r}")
    eps = float(label_smoothing)
    if not 0.0 <= eps < 1.0:
        raise ValueError(f"label_smoothing must be in [0, 1); got {eps}")
    *lead, V = logits.shape
    if tuple(targets.shape) != tuple(lead):
        raise ValueError(f"targets shape {targets.shape} != logits leading "
                         f"dims {tuple(lead)}")
    T = int(np.prod(lead)) if lead else 1
    interp = should_interpret() if interpret is None else interpret
    targets = targets.reshape(T)
    valid = None
    if ignore_index is not None:
        valid = targets != ignore_index
        targets = jnp.where(valid, targets, 0)  # any in-range stand-in
    loss = _ce_rows(logits.reshape(T, V), targets, eps, interp)
    return _reduce_rows(loss, valid, reduction, lead)


def _reduce_rows(loss, valid, reduction, lead):
    if valid is not None:
        # zeroing the row also zeroes its cotangent → dx rows vanish
        loss = jnp.where(valid, loss, 0.0)
    if reduction == "none":
        return loss.reshape(*lead) if lead else loss[0]
    if reduction == "sum":
        return jnp.sum(loss)
    if valid is not None:  # mean over the contributing rows only
        return jnp.sum(loss) / jnp.maximum(jnp.sum(valid), 1)
    return jnp.mean(loss)


# ---------------------------------------------------------------------------
# LM-head fused cross-entropy: output projection + loss with the (T, V)
# logits never materialized. For llama-3-scale vocabularies the logits are
# the training-step memory peak (T=8192, V=128k f32 = 4 GB; doubled by the
# saved log-softmax residual); chunking the vocabulary bounds that peak at
# O(T·block_v) while the MXU still sees large (T, D)x(D, block_v) matmuls.
# The plain-matmul chunks deliberately ride XLA's emitter per the measured
# GEMM dispatch policy (docs/PERF_NOTES.md "MXU matmul ceiling").
# ---------------------------------------------------------------------------


def _emb_pad(emb, V, nc, bv, transb):
    if nc * bv == V:
        return emb
    pad = ((0, nc * bv - V), (0, 0)) if transb else ((0, 0), (0, nc * bv - V))
    return jnp.pad(emb, pad)


def _emb_chunk(embp, c, bv, D, transb):
    """The c-th vocab chunk of the (padded) unembedding: (bv, D) rows when
    transb (tied (V, D) layout) else (D, bv) columns ((D, V) layout)."""
    if transb:
        return jax.lax.dynamic_slice(embp, (c * bv, 0), (bv, D))
    return jax.lax.dynamic_slice(embp, (0, c * bv), (D, bv))


def _lm_prec(dt):
    """f32 inputs pin HIGHEST: TPU's default f32 dot is 1-pass bf16, which
    would silently break lm_cross_entropy's numeric interchangeability
    with cross_entropy (caught by the hardware test matrix — the CPU
    interpreter hides it). bf16 inputs keep the native 1-pass path."""
    return (jax.lax.Precision.HIGHEST
            if jnp.dtype(dt) == jnp.float32 else None)


def _chunk_logits(h, rows, transb):
    dims = (((1,), (1,)), ((), ())) if transb else (((1,), (0,)), ((), ()))
    return jax.lax.dot_general(h, rows, dims,
                               preferred_element_type=jnp.float32,
                               precision=_lm_prec(h.dtype))


def _lmce_fwd_impl(h, emb, targets, eps, bv, transb):
    T, D = h.shape
    V = emb.shape[0] if transb else emb.shape[1]
    nc = cdiv(V, bv)
    embp = _emb_pad(emb, V, nc, bv, transb)
    tgt = targets.astype(jnp.int32)

    def body(c, carry):
        m, s, tv, sv = carry
        rows = _emb_chunk(embp, c, bv, D, transb)
        lg = _chunk_logits(h, rows, transb)
        pos = c * bv + jax.lax.iota(jnp.int32, bv)
        lg = jnp.where((pos < V)[None, :], lg, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(lg, axis=-1))
        corr = jnp.where(jnp.isfinite(m), jnp.exp(m - m_new), 0.0)
        e = jnp.exp(lg - m_new[:, None])
        e = jnp.where(lg == -jnp.inf, 0.0, e)
        s = s * corr + jnp.sum(e, axis=-1)
        tmask = pos[None, :] == tgt[:, None]
        tv = tv + jnp.sum(jnp.where(tmask, lg, 0.0), axis=-1)
        if eps:
            sv = sv + jnp.sum(jnp.where(lg == -jnp.inf, 0.0, lg), axis=-1)
        return m_new, s, tv, sv

    init = (jnp.full((T,), -np.inf, jnp.float32),
            jnp.zeros((T,), jnp.float32), jnp.zeros((T,), jnp.float32),
            jnp.zeros((T,), jnp.float32))
    m, s, tv, sv = jax.lax.fori_loop(0, nc, body, init)
    lse = m + jnp.log(s)
    if eps:
        loss = lse - (1.0 - eps) * tv - (eps / V) * sv
    else:
        loss = lse - tv
    return loss, lse


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _lmce_rows(h, emb, targets, eps, bv, transb):
    loss, _ = _lmce_fwd_impl(h, emb, targets, eps, bv, transb)
    return loss


def _lmce_fwd_vjp(h, emb, targets, eps, bv, transb):
    loss, lse = _lmce_fwd_impl(h, emb, targets, eps, bv, transb)
    return loss, (h, emb, targets, lse)


def _lmce_bwd_vjp(eps, bv, transb, res, g):
    h, emb, targets, lse = res
    T, D = h.shape
    V = emb.shape[0] if transb else emb.shape[1]
    nc = cdiv(V, bv)
    embp = _emb_pad(emb, V, nc, bv, transb)
    tgt = targets.astype(jnp.int32)
    gr = g.astype(jnp.float32)

    def body(c, carry):
        dh, demb = carry
        rows = _emb_chunk(embp, c, bv, D, transb)
        lg = _chunk_logits(h, rows, transb)
        pos = c * bv + jax.lax.iota(jnp.int32, bv)
        p = jnp.exp(lg - lse[:, None])       # softmax via saved lse
        q = (pos[None, :] == tgt[:, None]).astype(jnp.float32)
        if eps:
            q = (1.0 - eps) * q + (eps / V)
        dl = gr[:, None] * (p - q)
        dl = jnp.where((pos < V)[None, :], dl, 0.0)  # pad rows: no signal
        rows32 = rows.astype(jnp.float32)
        if transb:
            dh = dh + jax.lax.dot_general(          # (T,bv)·(bv,D)
                dl, rows32, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_lm_prec(h.dtype))
            drows = jax.lax.dot_general(            # (bv,D) chunk grad
                dl, h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_lm_prec(h.dtype))
            demb = jax.lax.dynamic_update_slice(demb, drows, (c * bv, 0))
        else:
            dh = dh + jax.lax.dot_general(          # (T,bv)·(D,bv)ᵀ
                dl, rows32, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_lm_prec(h.dtype))
            dcols = jax.lax.dot_general(            # (D,bv) chunk grad
                h, dl, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_lm_prec(h.dtype))
            demb = jax.lax.dynamic_update_slice(demb, dcols, (0, c * bv))
        return dh, demb

    dh0 = jnp.zeros((T, D), jnp.float32)
    demb0 = jnp.zeros((nc * bv, D) if transb else (D, nc * bv), jnp.float32)
    dh, demb = jax.lax.fori_loop(0, nc, body, (dh0, demb0))
    demb = demb[:V] if transb else demb[:, :V]
    return dh.astype(h.dtype), demb.astype(emb.dtype), None


_lmce_rows.defvjp(_lmce_fwd_vjp, _lmce_bwd_vjp)


def lm_cross_entropy(hidden: jax.Array, embed: jax.Array,
                     targets: jax.Array, *, transb: bool = True,
                     reduction: str = "mean",
                     label_smoothing: float = 0.0,
                     ignore_index: Optional[int] = None,
                     block_v: int = 8192,
                     memory_budget_bytes: Optional[int] = 1024 ** 3
                     ) -> jax.Array:
    """Cross-entropy of the unembedding projection.

    hidden (..., D) float, targets (...) int. ``transb=True`` (default):
    embed is (V, D) — the tied-embedding row layout, logits = hidden @
    embed.T (``gemm(x, embed, transb=True)``). ``transb=False``: embed is
    (D, V) — the untied column layout (llama's ``unembed``), logits =
    hidden @ embed. Same ``reduction`` / ``label_smoothing`` /
    ``ignore_index`` semantics as :func:`cross_entropy`, and numerically
    interchangeable with it.

    MEMORY-BUDGET DISPATCH (round-5 VERDICT #6; the same measured-winner
    policy as the GEMM backend dispatch): when the (T, V) logits fit
    ``memory_budget_bytes``, the projection MATERIALIZES and the loss
    rides :func:`cross_entropy`'s one-pass fused value+grad kernel — the
    backward then reuses the stored unit gradient instead of recomputing
    every chunk's logits, deleting the chunked path's ~33% extra GEMM
    FLOPs (measured 0.68x XLA at (2048, 32k, D4096) for chunked vs ~1x
    materialized). The 1 GiB default keeps (2048, 32k) f32 materialized
    (0.54 GB live) while a llama-3 vocabulary at the same batch
    (2048 x 128256 = 2.1 GB) streams. Shapes past the budget stream the
    vocabulary in
    ``block_v`` chunks with online-logsumexp carries: peak live memory
    O(T·block_v) instead of O(T·V), forward AND backward (the custom VJP
    recomputes each chunk's logits from the saved per-row lse).
    ``memory_budget_bytes=None`` forces the chunked path.
    """
    if reduction not in ("mean", "sum", "none"):
        raise ValueError(f"unknown reduction {reduction!r}")
    eps = float(label_smoothing)
    if not 0.0 <= eps < 1.0:
        raise ValueError(f"label_smoothing must be in [0, 1); got {eps}")
    *lead, D = hidden.shape
    if transb:
        V, De = embed.shape
        if De != D:
            raise ValueError(f"embed shape {embed.shape} is not (V, {D}); "
                             "pass the (V, D) row layout (or transb=False)")
    else:
        De, V = embed.shape
        if De != D:
            raise ValueError(f"embed shape {embed.shape} is not ({D}, V); "
                             "pass the (D, V) column layout (or transb=True)")
    if tuple(targets.shape) != tuple(lead):
        raise ValueError(f"targets shape {targets.shape} != hidden leading "
                         f"dims {tuple(lead)}")
    T = int(np.prod(lead)) if lead else 1
    Vp = round_step_up(V, 128)
    if (memory_budget_bytes is not None
            and 2 * T * Vp * jnp.dtype(hidden.dtype).itemsize
            <= memory_budget_bytes):
        # materialized path: logits + the saved unit-grad residual both
        # fit the budget (hence the factor 2)
        from .gemm.autodiff import gemm_ad

        logits = gemm_ad(hidden.reshape(T, D), embed, None, False,
                         bool(transb))
        return cross_entropy(
            logits, targets.reshape(T), reduction=reduction,
            label_smoothing=eps, ignore_index=ignore_index
        ).reshape(*lead) if reduction == "none" else cross_entropy(
            logits, targets.reshape(T), reduction=reduction,
            label_smoothing=eps, ignore_index=ignore_index)
    bv = max(128, min(round_step_up(block_v, 128), round_step_up(V, 128)))
    targets = targets.reshape(T)
    valid = None
    if ignore_index is not None:
        valid = targets != ignore_index
        targets = jnp.where(valid, targets, 0)
    loss = _lmce_rows(hidden.reshape(T, D), embed, targets, eps, bv,
                      bool(transb))
    return _reduce_rows(loss, valid, reduction, lead)
