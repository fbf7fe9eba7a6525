"""Fused elementwise / map-reduce kernel builders.

TPU-native rebuild of the reference's strided-iteration macro layer:
  * ``for_each``  <- forEach / forEachContiguous / forEachStrided
    (reference: laser/strided_iteration/foreach.nim:39-264) — N operands, one
    fused expression, a contiguous fast path and a strided fallback chosen at
    call time exactly like foreach.nim:180-189 emits both bodies behind an
    ``is_C_contiguous`` test.
  * ``for_each_staged`` / ``map_reduce`` <- forEachStaged's
    before/in/after-loop stages with thread-local accumulators merged under a
    critical section (reference: laser/strided_iteration/foreach_staged.nim:18-346,
    examples/ex05_tensor_parallel_reduction.nim:15-59). On TPU the "threads"
    are grid steps, the thread-local accumulator is a VMEM partial, and the
    critical-section merge is a deterministic second-stage tree combine — so,
    unlike the reference (reductions.nim:58-63 documents run-to-run
    non-determinism), results are bit-stable across runs.

The CPU grain-size gating (omp_parallel_if, openmp.nim:160-216) maps to block
sizing: below ``elementwise_grain`` we use a single grid step (one "thread").
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import get_config, should_interpret
from ..tensor import TensorView, as_view
from ..utils import cdiv, round_step_up

# Lane count of one VPU row.
LANES = 128
# Wide flat layout: big streams use 4096-lane rows — measured on v5e, narrow
# 128-lane blocks sustain only ~212 GB/s on >=256MB aliased streams while
# 4096-lane blocks hold ~600 GB/s (docs/PERF_NOTES.md).
WIDE = 4096
# Row granularity that satisfies every dtype's min sublane tile (f32 8,
# bf16 16, int8 32 — device_info.SUBLANES_BY_ITEMSIZE).
ROW_ALIGN = 32


def _flat_width(size: int) -> int:
    return WIDE if size >= ROW_ALIGN * WIDE else LANES


def _native_2d(shape, size: int):
    """(rows, cols) if the operands can be viewed as a 2D matrix WITHOUT a
    relayout. On TPU, arrays are tiled over the last two dims; a reshape that
    changes the second-minor dim (e.g. (8192,8192)->(16384,4096)) is a full
    HBM relayout copy (measured ~0.85 ms per 256MB direction on v5e), so big
    elementwise streams must keep their native minor dims."""
    if len(shape) < 2:
        return None
    L = shape[-1]
    if L % LANES or L * ROW_ALIGN * 4 > 8 * 1024 * 1024:
        return None  # odd lanes, or one row-group alone would blow the block
    R = size // L
    if R % ROW_ALIGN:
        return None
    if len(shape) > 2 and shape[-2] % 8:
        return None  # collapsing leading dims would cross tile boundaries
    return R, L


def _prepare_flat(operands: Sequence[TensorView], pad_value=0):
    """Materialize operands as matching (rows, width) matrices.

    Fast path: native-2D view (free reshape). Fallback: flatten + pad to a
    (rows, width) matrix — correct for any shape, but pays the relayout.
    """
    shape = operands[0].shape
    for op in operands[1:]:
        if op.shape != shape:
            raise ValueError(f"operand shape mismatch: {op.shape} vs {shape}")
    size = operands[0].size

    nat = _native_2d(shape, size)
    if nat is not None and all(op.is_c_contiguous() for op in operands):
        R, L = nat
        mats = [op.materialize().reshape(R, L) for op in operands]
        return mats, shape, size, R, L

    width = _flat_width(size)
    rows = round_step_up(max(cdiv(size, width), 1), ROW_ALIGN)
    padded = rows * width

    mats = []
    for op in operands:
        flat = op.materialize().reshape(-1)
        if padded != size:
            flat = jnp.pad(flat, (0, padded - size), constant_values=pad_value)
        mats.append(flat.reshape(rows, width))
    return mats, shape, size, rows, width


def _block_rows(rows: int, width: int, n_operands: int) -> int:
    """Pick rows-per-block from the elementwise grain (openmp grain analog)."""
    cfg = get_config()
    target_elems = max(cfg.elementwise_grain // max(n_operands, 1), width)
    br = max(ROW_ALIGN, min(rows, target_elems // width))
    return round_step_up(br, ROW_ALIGN)


def for_each(fn: Callable, *operands, out_dtype=None, interpret: Optional[bool] = None,
             pad_value=0, donate: bool = False) -> jax.Array:
    """Apply ``fn`` elementwise over N same-shaped operands in ONE fused kernel.

    ``fn`` takes N block arrays and returns one block array, e.g.
    ``for_each(lambda x, y, z: x + y - jnp.sin(z), a, b, c)`` — the reference's
    headline fusion demo (foreach.nim README example, iter_bench_prod.nim:25-45).

    Contiguous operands flow through zero-copy (the contiguous branch).
    Regular strided ``TensorView`` operands (sliced / every-k-th / offset /
    leading-axis-reversed windows) lower to ONE fused XLA kernel via
    basic-index fusion (ops/strided.py — forEachStrided's never-slower-
    than-copy contract, foreach.nim:64-113; measured fastest at every
    stride on v5e); irregular views materialize first (the gather
    fallback).

    ``donate=True`` aliases the first operand's buffer as the output (the
    RawMutableView analog — caller must not reuse that operand). This is a
    2x bandwidth lever on TPU: out-of-place elementwise streams measure
    ~310 GB/s on v5e while in-place reaches ~600 GB/s, because output DMA to
    fresh HBM pages serializes against the input stream.
    """
    views = [as_view(op) for op in operands]
    interp = should_interpret() if interpret is None else interpret
    if any(not v.is_c_contiguous() for v in views):
        # in-kernel strided branch (single pass, no materialization)
        from .strided import strided_for_each

        out_dt = out_dtype or jnp.result_type(*[v.dtype for v in views])
        out = strided_for_each(fn, views, out_dt, interp)
        if out is not None:
            return out
    mats, shape, size, rows, width = _prepare_flat(views, pad_value)
    out_dtype = out_dtype or jnp.result_type(*[m.dtype for m in mats])

    br = _block_rows(rows, width, len(mats))
    grid = (cdiv(rows, br),)

    def kernel(*refs):
        out_ref = refs[-1]
        out_ref[:] = fn(*[r[:] for r in refs[:-1]]).astype(out_dtype)

    alias = {}
    if donate and jnp.dtype(mats[0].dtype) == jnp.dtype(out_dtype):
        alias = {0: 0}
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((br, width), lambda i: (i, 0), memory_space=pltpu.VMEM)
                  for _ in mats],
        out_specs=pl.BlockSpec((br, width), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, width), out_dtype),
        input_output_aliases=alias,
        interpret=interp,
    )(*mats)
    if rows * width == size:
        # No pad: plain reshape (free). A full-range slice is NOT free — XLA
        # materializes a copy for slice+reshape chains inside loops (measured
        # 3x slowdown), so only slice when padding actually happened.
        return out.reshape(shape)
    return out.reshape(-1)[:size].reshape(shape)


def for_each_multi(fn: Callable, *operands, out_dtypes=None,
                   interpret: Optional[bool] = None, pad_value=0):
    """Like ``for_each`` but ``fn`` returns a TUPLE of block arrays — one
    fused kernel produces every output in a single pass over the operands
    (the multi-output fusion the reference's forEach body allows by writing
    to several tensors in one loop)."""
    views = [as_view(op) for op in operands]
    interp = should_interpret() if interpret is None else interpret
    mats, shape, size, rows, width = _prepare_flat(views, pad_value)
    probe = jax.eval_shape(
        lambda *bs: fn(*bs),
        *[jax.ShapeDtypeStruct((8, width), m.dtype) for m in mats])
    if not isinstance(probe, (tuple, list)):
        raise TypeError("for_each_multi fn must return a tuple of blocks")
    n_out = len(probe)
    out_dts = ([jnp.dtype(d) for d in out_dtypes] if out_dtypes
               else [p.dtype for p in probe])

    br = _block_rows(rows, width, len(mats) + n_out)
    grid = (cdiv(rows, br),)

    def kernel(*refs):
        outs = refs[-n_out:]
        vals = fn(*[r[:] for r in refs[:-n_out]])
        for o_ref, v, dt in zip(outs, vals, out_dts):
            o_ref[:] = v.astype(dt)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((br, width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM) for _ in mats],
        out_specs=[pl.BlockSpec((br, width), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
                   for _ in range(n_out)],
        out_shape=[jax.ShapeDtypeStruct((rows, width), dt) for dt in out_dts],
        interpret=interp,
    )(*mats)
    res = []
    for o in outs:
        if rows * width == size:
            res.append(o.reshape(shape))
        else:
            res.append(o.reshape(-1)[:size].reshape(shape))
    return tuple(res)


def row_reduce(map_fn: Callable, *operands, reduce_fn: Callable = jnp.sum,
               identity=0.0, out_dtype=None,
               interpret: Optional[bool] = None):
    """Fused map + last-axis reduction: ONE kernel computes
    reduce(map_fn(*ops), axis=-1) for 2-D same-shaped operands whose rows
    fit VMEM (caller falls back to XLA otherwise — see lux lowering)."""
    views = [as_view(op) for op in operands]
    shape = views[0].shape
    for v in views[1:]:
        if v.shape != shape:
            raise ValueError("row_reduce operand shape mismatch")
    if len(shape) != 2:
        raise ValueError("row_reduce expects 2-D operands")
    rows, cols = shape
    interp = should_interpret() if interpret is None else interpret
    cp = round_step_up(cols, LANES)
    rp = round_step_up(rows, 8)
    from ..device_info import vmem_budget_bytes

    itemsize = max(v.dtype.itemsize for v in views)
    if 8 * cp * itemsize * (len(views) + 2) * 4 > vmem_budget_bytes():
        return None  # rows overflow VMEM; caller uses the XLA path
    mats = []
    for v in views:
        m = v.materialize()
        if (rp, cp) != (rows, cols):
            m = jnp.pad(m, ((0, rp - rows), (0, cp - cols)))
        mats.append(m)
    out_dt = jnp.dtype(out_dtype) if out_dtype else jnp.result_type(
        *[m.dtype for m in mats])
    br = max(8, min(rp, (2 * 1024 * 1024 // max(cp * itemsize, 1)) // 8 * 8))
    col_tail = cp != cols

    def kernel(*refs):
        o_ref = refs[-1]
        v = map_fn(*[r[:] for r in refs[:-1]])
        if col_tail:
            # mask the MAPPED values (map_fn(0) need not be the identity)
            cpos = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
            v = jnp.where(cpos < cols, v, jnp.asarray(identity, v.dtype))
        o_ref[:] = jnp.broadcast_to(
            reduce_fn(v, axis=-1, keepdims=True), o_ref.shape).astype(out_dt)

    out = pl.pallas_call(
        kernel,
        grid=(cdiv(rp, br),),
        in_specs=[pl.BlockSpec((br, cp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM) for _ in mats],
        out_specs=pl.BlockSpec((br, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, LANES), out_dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interp,
    )(*mats)
    return out[:rows, 0]


def map_reduce(map_fn: Callable, *operands, reduce_fn: Callable = jnp.sum,
               combine_fn: Optional[Callable] = None, identity=0.0,
               out_dtype=None, acc_dtype=None,
               interpret: Optional[bool] = None) -> jax.Array:
    """Fused map + deterministic reduction to a scalar.

    Stage layout mirrors forEachStaged (foreach_staged.nim:318):
      before_loop  -> per-block accumulator init (``identity``)
      in_loop      -> ``map_fn`` over the block + ``reduce_fn`` within block
      after_loop   -> cross-block ``combine_fn`` (default: ``reduce_fn``),
                      accumulated in grid order into one VMEM-resident
                      (8, width) accumulator (zero partial HBM traffic)

    Every grid step reduces its block on the VPU with a pairwise tree
    (better-than-reference accuracy: laser uses 4 striped accumulators,
    reductions_sse3.nim:31-49; a full tree is strictly finer-grained pairing).
    """
    views = [as_view(op) for op in operands]
    mats, _, size, rows, width = _prepare_flat(views, identity)
    acc_dtype = acc_dtype or jnp.result_type(*[m.dtype for m in mats])
    out_dtype = out_dtype or acc_dtype
    combine_fn = combine_fn or reduce_fn
    interp = should_interpret() if interpret is None else interpret

    _BINOPS = {jnp.sum: jnp.add, jnp.min: jnp.minimum, jnp.max: jnp.maximum}
    rbinop = _BINOPS.get(reduce_fn)
    cbinop = _BINOPS.get(combine_fn)

    cfg = get_config()
    # Scratch-accumulator path (known binops): the cross-block combine rides
    # a SINGLE VMEM-resident (8, width) accumulator — the output BlockSpec is
    # constant across grid steps so Mosaic flushes it once at the end, and no
    # per-block partial ever touches HBM. Measured on hardware
    # (tools/reduce_scratch_probe.py): 733 GB/s vs 709 for the per-block
    # partial design and 732 for jnp.sum — the 6.25% partial write WAS the
    # 0.956x gap. Optimum block is half the partial-design grain (the freed
    # write slot shifts the DMA balance toward smaller, deeper pipelining).
    grain = cfg.reduction_grain // (2 if rbinop is not None else 1)
    br = max(ROW_ALIGN, min(rows, grain // width))
    br = round_step_up(br, ROW_ALIGN)
    nblocks = cdiv(rows, br)
    # Padded tail rows beyond `rows` are filled by Pallas with undefined data;
    # mask them to the identity inside the kernel.
    needs_mask = rows % br != 0

    def _block_lanes(refs, i):
        # Each grid step reduces its block only along the sublane axis into an
        # (8, width) vreg-shaped partial — the multi-accumulator trick of the
        # reference (reductions_sse3.nim:31-49: defer the horizontal sum) at
        # VPU scale: no cross-lane shuffles in the hot loop.
        blocks = [r[:] for r in refs]
        if needs_mask:
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (br, width), 0)
            valid = (i * br + row_ids) < rows
            blocks = [jnp.where(valid, b, jnp.asarray(identity, b.dtype))
                      for b in blocks]
        mapped = map_fn(*blocks).astype(acc_dtype)
        m = mapped.reshape(br // 8, 8, width)
        # Pairwise fold along the group axis: a true binary tree (error
        # O(log n) vs O(n) for a running chain), fully vectorized adds.
        if rbinop is None:
            return reduce_fn(m, axis=0)
        g = m.shape[0]
        p = 1 << max(g - 1, 0).bit_length()
        if p != g:
            m = jnp.concatenate(
                [m, jnp.full((p - g, 8, width), identity, m.dtype)], 0)
        while m.shape[0] > 1:
            h = m.shape[0] // 2
            m = rbinop(m[:h], m[h:])
        return m[0]

    if rbinop is not None and cbinop is not None:
        def kernel(*refs):
            out_ref = refs[-1]
            i = pl.program_id(0)
            lanes = _block_lanes(refs[:-1], i)

            @pl.when(i == 0)
            def _init():
                out_ref[...] = lanes

            @pl.when(i > 0)
            def _accumulate():
                out_ref[...] = cbinop(out_ref[...], lanes)

        partials = pl.pallas_call(
            kernel,
            grid=(nblocks,),
            in_specs=[pl.BlockSpec((br, width), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM) for _ in mats],
            out_specs=pl.BlockSpec((8, width), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, width), acc_dtype),
            interpret=interp,
        )(*mats)
    else:
        def kernel(*refs):
            out_ref = refs[-1]
            i = pl.program_id(0)
            out_ref[0] = _block_lanes(refs[:-1], i)

        partials = pl.pallas_call(
            kernel,
            grid=(nblocks,),
            in_specs=[pl.BlockSpec((br, width), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM) for _ in mats],
            out_specs=pl.BlockSpec((1, 8, width), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nblocks, 8, width), acc_dtype),
            interpret=interp,
        )(*mats)
    # Final horizontal combine on the tiny (8, width) accumulator (or, on the
    # generic path, the per-block partials) — pairwise, so the whole
    # reduction is deterministic: in-block binary trees chained in grid order.
    if cbinop is None:
        return combine_fn(partials).astype(out_dtype)
    binop = cbinop
    v = partials.reshape(-1)
    n = v.shape[0]
    p = 1 << max(n - 1, 0).bit_length()
    if p != n:
        v = jnp.concatenate([v, jnp.full((p - n,), identity, v.dtype)])
    while v.shape[0] > 1:
        h = v.shape[0] // 2
        v = binop(v[:h], v[h:])
    return v[0].astype(out_dtype)


def for_each_staged(*operands, before_loop=None, in_loop: Callable,
                    after_loop: Callable = jnp.sum, identity=0.0, **kw):
    """Thin name-parity wrapper over ``map_reduce`` using the reference's
    stage vocabulary (foreach_staged.nim:318)."""
    del before_loop  # accumulator init is the `identity` element on TPU
    return map_reduce(in_loop, *operands, reduce_fn=after_loop,
                      identity=identity, **kw)


# ---------------------------------------------------------------------------
# General staged reduction: arbitrary accumulator pytrees + combine fns.
# The full forEachStaged contract (foreach_staged.nim:318, ex05 thread-local
# accumulators): each "thread" (grid step) folds its block into a private
# accumulator of ANY structure; a user combine merges them. Unlike the
# reference's omp_critical merge, the cross-block combine here is a fixed
# pairwise tree -> deterministic.
# ---------------------------------------------------------------------------

class StageCtx:
    """Per-block context handed to ``block_fn``: a validity mask (True for
    in-range elements, None when the whole block is valid) and the flat
    element offset of the block's first element (row-major over the logical
    array) — enough to build global indices (argmax) or counts (mean/var)."""

    def __init__(self, valid, offset, width):
        self.valid = valid
        self.offset = offset
        self.width = width

    def flat_indices(self, shape):
        """(br, width) int32 global flat indices for this block."""
        r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        c = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        return self.offset + r * self.width + c


def map_reduce_staged(block_fn: Callable, *operands, combine: Callable,
                      interpret: Optional[bool] = None):
    """Fused block-fold + deterministic tree combine over an accumulator
    pytree of SCALAR leaves.

    block_fn(ctx, *blocks) -> pytree of scalars  (one block's accumulator)
    combine(acc_a, acc_b)  -> pytree of scalars  (associative merge)

    Examples built on this: single-pass mean+variance (Chan's parallel
    Welford combine) and argmax with global-index carry — the reference's
    ex05 class of kernels that the plain ``map_reduce`` (identity+binop
    only) cannot express.
    """
    views = [as_view(op) for op in operands]
    mats, _, size, rows, width = _prepare_flat(views, 0)
    interp = should_interpret() if interpret is None else interpret

    cfg = get_config()
    br = max(ROW_ALIGN, min(rows, cfg.reduction_grain // width))
    br = round_step_up(br, ROW_ALIGN)
    nblocks = cdiv(rows, br)
    padded_tail = rows * width != size or rows % br != 0

    # Probe the accumulator structure with abstract values.
    probe_blocks = [jax.ShapeDtypeStruct((br, width), m.dtype) for m in mats]
    acc_struct = jax.eval_shape(
        lambda *bs: block_fn(StageCtx(
            jnp.ones((br, width), jnp.bool_) if padded_tail else None,
            jnp.int32(0), width), *bs), *probe_blocks)
    leaves_struct, treedef = jax.tree_util.tree_flatten(acc_struct)
    for l in leaves_struct:
        if l.shape != ():
            raise ValueError("map_reduce_staged accumulator leaves must be "
                             f"scalars, got shape {l.shape}")
    n_leaves = len(leaves_struct)

    def kernel(*refs):
        out_refs = refs[-n_leaves:]
        blocks = [r[:] for r in refs[:-n_leaves]]
        i = pl.program_id(0)
        offset = i * br * width
        valid = None
        if padded_tail:
            ids = offset + jax.lax.broadcasted_iota(
                jnp.int32, (br, width), 0) * width + jax.lax.broadcasted_iota(
                jnp.int32, (br, width), 1)
            valid = ids < size
        acc = block_fn(StageCtx(valid, offset, width), *blocks)
        leaves = jax.tree_util.tree_leaves(acc)
        for ref, leaf, st in zip(out_refs, leaves, leaves_struct):
            ref[0] = jnp.full((8, 128), leaf, st.dtype)

    partial_leaves = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((br, width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM) for _ in mats],
        out_specs=[pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
                   for _ in range(n_leaves)],
        out_shape=[jax.ShapeDtypeStruct((nblocks, 8, 128), l.dtype)
                   for l in leaves_struct],
        interpret=interp,
    )(*mats)

    # Deterministic pairwise combine over the per-block accumulators.
    accs = treedef.unflatten([p[:, 0, 0] for p in partial_leaves])
    n = nblocks
    while n > 1:
        h = n // 2
        lo = jax.tree_util.tree_map(lambda a: a[:h], accs)
        hi = jax.tree_util.tree_map(lambda a: a[h:2 * h], accs)
        merged = combine(lo, hi)
        if n % 2:
            tail = jax.tree_util.tree_map(lambda a: a[2 * h:], accs)
            merged = jax.tree_util.tree_map(
                lambda m, t: jnp.concatenate([m, t]), merged, tail)
            n = h + 1
        else:
            n = h
        accs = merged
    return jax.tree_util.tree_map(lambda a: a[0], accs)
