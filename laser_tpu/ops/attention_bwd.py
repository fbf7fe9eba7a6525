"""Fused flash-attention backward kernels.

Completes the training story for ops/attention.py with O(S) memory: the
forward saves only (O, m, l); the backward recomputes each score block on
the MXU and streams the gradients, never materializing the S x S matrix.

Math (per batch-head; i = query block, j = key block; all f32 in-kernel):
    p_ij  = exp(scale * q_i k_j^T - m_i) / l_i        (recomputed, masked)
    dv_j  = sum_i p_ij^T dO_i
    dp_ij = dO_i v_j^T
    ds_ij = scale * p_ij * (dp_ij - D_i),  D_i = rowsum(dO_i * O_i)
    dq_i  = sum_j ds_ij k_j
    dk_j  = sum_i ds_ij^T q_i

Two kernels: dQ streams over j with a (bq, D) accumulator; dK/dV stream over
i with (bk, D) accumulators. Causal blocks above the diagonal are skipped in
both (the same block gate as the forward).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..registry import build_cache

_NEG_INF = -1e30


def _block_p_ds(q, k, v, do, m, l, dvec, *, scale, S, q_start, k_start,
                causal, bq, bk, prec, q_off=0, k_off=0, window=None):
    """Recompute (p, ds) for one (i, j) block pair. All operands f32.
    q_off/k_off are global chunk offsets for the ring (sequence-parallel)
    backward: the causal mask is evaluated in global coordinates.
    ``window``: sliding-window refinement of the causal mask (matches the
    forward kernel's masking exactly)."""
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec) * scale
    kpos = k_start + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    valid = kpos < S
    if causal:
        qpos = q_start + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        valid = valid & (kpos + k_off <= qpos + q_off)
        if window is not None:
            valid = valid & (qpos + q_off - (kpos + k_off) < window)
    s = jnp.where(valid, s, _NEG_INF)
    lsafe = jnp.where(l > 0, l, 1.0)
    p = jnp.exp(s - m) / lsafe
    p = jnp.where(valid, p, 0.0)
    # padded q rows carry (m=-inf, l=0) from the forward: their exp overflows
    # to inf and must be zeroed (their dO is zero, but inf*0 = NaN)
    p = jnp.where(l > 0, p, 0.0)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=prec)
    ds = scale * p * (dp - dvec)
    return p, ds


def _chunks(total: int, chunk) -> int:
    """Number of in-body sub-chunks for a streamed panel (1 = unchunked)."""
    ck = chunk if chunk else total
    if total % ck:
        raise ValueError(f"chunk {ck} must divide panel {total}")
    return total // ck


@build_cache
def _build_bwd_dq(BH: int, S: int, SP: int, D: int, bq: int, bk: int,
                  causal: bool, scale: float, dtype: str, interpret: bool,
                  use_offsets: bool = False, window=None, chunk=None):
    """``chunk``: in-body sub-chunk width over the streamed K panel — the
    same interleave lever as the forward's (ops/attention.py _sweep):
    chunk c's VPU work (exp, ds) has no dependency on chunk c+1's s/dp
    dots, so Mosaic overlaps them. None = unchunked (one block pair per
    grid step)."""
    dt = jnp.dtype(dtype)
    nk = SP // bk
    nc = _chunks(bk, chunk)
    ck = bk // nc
    prec = jax.lax.Precision.HIGHEST if dt == jnp.float32 else None

    def kernel(*refs):
        if use_offsets:
            (qoff_ref, koff_ref, q_ref, k_ref, v_ref, do_ref, m_ref, l_ref,
             d_ref, dq_ref, acc_ref) = refs
            q_off, k_off = qoff_ref[0], koff_ref[0]
        else:
            (q_ref, k_ref, v_ref, do_ref, m_ref, l_ref, d_ref, dq_ref,
             acc_ref) = refs
            q_off = k_off = 0
        i = pl.program_id(1)
        j = pl.program_id(2)

        @pl.when(j == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        q_start = i * bq
        k_start = j * bk

        def _step():
            qf = q_ref[0].astype(jnp.float32)
            dof = do_ref[0].astype(jnp.float32)
            m = m_ref[0, :, :1]
            l = l_ref[0, :, :1]
            d = d_ref[0, :, :1]
            acc = acc_ref[:]
            # in-body sub-chunks run UNCONDITIONALLY (chunk-granular causal
            # skipping via cond serializes the interleave — measured loss,
            # see the forward); block-granular skipping stays at the grid.
            for c in range(nc):
                kc = k_ref[0, c * ck:(c + 1) * ck, :].astype(jnp.float32)
                vc = v_ref[0, c * ck:(c + 1) * ck, :].astype(jnp.float32)
                _, ds = _block_p_ds(
                    qf, kc, vc, dof, m, l, d,
                    scale=scale, S=S, q_start=q_start,
                    k_start=k_start + c * ck,
                    causal=causal, bq=bq, bk=ck, prec=prec, q_off=q_off,
                    k_off=k_off, window=window)
                acc = acc + jax.lax.dot_general(
                    ds, kc, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec)
            acc_ref[:] = acc

        if causal:
            cond = k_start + k_off <= q_start + q_off + bq - 1
            if window is not None:
                cond &= (q_start + q_off) - (k_start + k_off + bk - 1) < window
            pl.when(cond)(_step)
        else:
            _step()

        @pl.when(j == nk - 1)
        def _fin():
            dq_ref[0] = acc_ref[:].astype(dt)

    stat = pl.BlockSpec((1, bq, 128), lambda b, i, j: (b, i, 0),
                        memory_space=pltpu.VMEM)
    offset_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
                    if use_offsets else [])
    return pl.pallas_call(
        kernel,
        grid=(BH, SP // bq, nk),
        in_specs=offset_specs + [
            pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            stat, stat, stat,
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, SP, D), dt),
        scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # see _build_flash: the 16 MB default is nondeterministic at
            # the edge and bars the measured-winning wide geometries
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


@build_cache
def _build_bwd_dkv(BH: int, S: int, SP: int, D: int, bq: int, bk: int,
                   causal: bool, scale: float, dtype: str, interpret: bool,
                   use_offsets: bool = False, window=None, chunk=None):
    """``chunk``: in-body sub-chunk width over the streamed Q panel (the
    dq kernel's interleave, mirrored — see _build_bwd_dq)."""
    dt = jnp.dtype(dtype)
    nq = SP // bq
    nc = _chunks(bq, chunk)
    cq = bq // nc
    prec = jax.lax.Precision.HIGHEST if dt == jnp.float32 else None

    def kernel(*refs):
        if use_offsets:
            (qoff_ref, koff_ref, q_ref, k_ref, v_ref, do_ref, m_ref, l_ref,
             d_ref, dk_ref, dv_ref, acck_ref, accv_ref) = refs
            q_off, k_off = qoff_ref[0], koff_ref[0]
        else:
            (q_ref, k_ref, v_ref, do_ref, m_ref, l_ref, d_ref, dk_ref,
             dv_ref, acck_ref, accv_ref) = refs
            q_off = k_off = 0
        j = pl.program_id(1)  # key block (parallel)
        i = pl.program_id(2)  # query block (streamed)

        @pl.when(i == 0)
        def _init():
            acck_ref[:] = jnp.zeros_like(acck_ref)
            accv_ref[:] = jnp.zeros_like(accv_ref)

        q_start = i * bq
        k_start = j * bk

        def _step():
            kf = k_ref[0].astype(jnp.float32)
            vf = v_ref[0].astype(jnp.float32)
            acck = acck_ref[:]
            accv = accv_ref[:]
            for c in range(nc):
                qc = q_ref[0, c * cq:(c + 1) * cq, :].astype(jnp.float32)
                doc = do_ref[0, c * cq:(c + 1) * cq, :].astype(jnp.float32)
                p, ds = _block_p_ds(
                    qc, kf, vf, doc,
                    m_ref[0, c * cq:(c + 1) * cq, :1],
                    l_ref[0, c * cq:(c + 1) * cq, :1],
                    d_ref[0, c * cq:(c + 1) * cq, :1],
                    scale=scale, S=S, q_start=q_start + c * cq,
                    k_start=k_start, causal=causal, bq=cq, bk=bk, prec=prec,
                    q_off=q_off, k_off=k_off, window=window)
                accv = accv + jax.lax.dot_general(
                    p, doc, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec)
                acck = acck + jax.lax.dot_general(
                    ds, qc, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec)
            acck_ref[:] = acck
            accv_ref[:] = accv

        if causal:
            cond = q_start + q_off + bq - 1 >= k_start + k_off
            if window is not None:
                cond &= (q_start + q_off) - (k_start + k_off + bk - 1) < window
            pl.when(cond)(_step)
        else:
            _step()

        @pl.when(i == nq - 1)
        def _fin():
            dk_ref[0] = acck_ref[:].astype(dt)
            dv_ref[0] = accv_ref[:].astype(dt)

    stat = pl.BlockSpec((1, bq, 128), lambda b, j, i: (b, i, 0),
                        memory_space=pltpu.VMEM)
    offset_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
                    if use_offsets else [])
    return pl.pallas_call(
        kernel,
        grid=(BH, SP // bk, nq),
        in_specs=offset_specs + [
            pl.BlockSpec((1, bq, D), lambda b, j, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, D), lambda b, j, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            stat, stat, stat,
        ],
        out_specs=[
            pl.BlockSpec((1, bk, D), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((BH, SP, D), dt)] * 2,
        scratch_shapes=[pltpu.VMEM((bk, D), jnp.float32),
                        pltpu.VMEM((bk, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # see _build_flash: the 16 MB default is nondeterministic at
            # the edge and bars the measured-winning wide geometries
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def _default_bwd_chunk(panel: int, dtype, causal: bool) -> "int | None":
    """In-body sub-chunk width for the backward's streamed panels. Measured
    at B8 S2048 D128 at the winning geometry bq=bk=1024 (tools/
    attention_bwd_race.py geometry x chunk sweep, both kernels chunked
    together): bf16 chunk 256 wins BOTH masks — full 111.9 TF (vs 108.2 at
    512, 106.6 at 128, 105.7 unchunked), causal 64.9 (vs 63.7 at 128,
    61.3 at 512, 60.3 unchunked) — the interleave hides the VPU exp/ds
    under the next chunk's independent dots. f32 is flat across chunks
    (+-0.5%): its 6-pass dots already dominate the step, so the panel
    stays whole."""
    if jnp.dtype(dtype).itemsize == 4:
        return None
    return 256 if (panel > 256 and panel % 256 == 0) else None


def flash_attention_bwd(q3, k3, v3, o3, m3, l3, g3, *, S: int, SP: int,
                        D: int, bq: int, bk: int, causal: bool, scale: float,
                        interpret: bool, q_off=None, k_off=None, dvec=None,
                        window=None, chunk="auto"):
    """All inputs padded to (BH, SP, D) / stats (BH, SP, 128).
    Returns (dq, dk, dv) padded — caller slices to S.

    q_off/k_off (traced int32 scalars) place the chunks at global sequence
    positions for the ring backward; ``dvec`` overrides the locally-computed
    rowsum(dO*O) when the caller holds the GLOBAL softmax statistics.
    ``chunk``: in-body interleave sub-chunk for both kernels' streamed
    panels ("auto" = measured default, None = unchunked)."""
    BH = q3.shape[0]
    dt = jnp.dtype(q3.dtype).name
    if chunk == "auto":
        ck_k = _default_bwd_chunk(bk, q3.dtype, causal)
        ck_q = _default_bwd_chunk(bq, q3.dtype, causal)
    else:
        ck_k = ck_q = chunk
    if dvec is None:
        dvec = jnp.sum(g3.astype(jnp.float32) * o3.astype(jnp.float32),
                       axis=-1)
    d3 = jnp.broadcast_to(dvec[..., None], (BH, SP, 128)).astype(jnp.float32)
    use_off = q_off is not None or k_off is not None
    if use_off:
        qo = jnp.asarray(q_off if q_off is not None else 0,
                         jnp.int32).reshape(1)
        ko = jnp.asarray(k_off if k_off is not None else 0,
                         jnp.int32).reshape(1)
        dq = _build_bwd_dq(BH, S, SP, D, bq, bk, causal, scale, dt,
                           interpret, use_offsets=True, window=window,
                           chunk=ck_k)(
            qo, ko, q3, k3, v3, g3, m3, l3, d3)
        dk, dv = _build_bwd_dkv(BH, S, SP, D, bq, bk, causal, scale, dt,
                                interpret, use_offsets=True, window=window,
                                chunk=ck_q)(
            qo, ko, q3, k3, v3, g3, m3, l3, d3)
        return dq, dk, dv
    dq = _build_bwd_dq(BH, S, SP, D, bq, bk, causal, scale, dt, interpret,
                       window=window, chunk=ck_k)(q3, k3, v3, g3, m3, l3, d3)
    dk, dv = _build_bwd_dkv(BH, S, SP, D, bq, bk, causal, scale, dt,
                            interpret, window=window, chunk=ck_q)(
        q3, k3, v3, g3, m3, l3, d3)
    return dq, dk, dv
