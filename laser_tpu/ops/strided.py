"""Strided iteration: fused elementwise computation over strided views.

TPU-native rebuild of the reference's ``forEachStrided`` branch
(laser/strided_iteration/foreach.nim:64-113 — odometer walk with
backstrides, no materialization pass). Round-1 routed every non-contiguous
view through ``TensorView.materialize()`` (an XLA gather copy) before the
fused kernel. Round 2 built the in-kernel dense-embed Pallas path. Round 3
MEASURED both against XLA basic-index fusion and made that the default
dispatch: the same dense-reshape planning now emits a slice/int-index/rev
expression that XLA fuses into the elementwise kernel — one HBM pass, and
it beats the in-kernel DMA at every phase count (see strided_for_each).

Mechanism. A strided view whose strides are monotone and nested
(st_i % st_{i+1} == 0) is exactly a *dense reshape* of its buffer with some
dims acting as the view's axes and the rest as constant-index "skip" dims:

    base[1::2, :]  of (M, C)  ==  buffer.reshape(M//2, 2, C)[:, 1, :]

The reshape is free (row-major), so one Pallas kernel can stream the view
directly: skip dims ABOVE the last-two-dims region ride the BlockSpec index
map as constant block indices (block size 1 — zero extra traffic); a skip
dim INSIDE the last-two region is FOLDED INTO THE LANE AXIS when the lane
extent is a 128-multiple ((R, G, C) reloaded as (R, G*C), lane block C,
digit = lane block index): the DMA then fetches only the selected phase —
1x traffic. (The sublane dim must be 8-divisible or full, so the fold has
to go through the lane dim.) When C is not a 128-multiple the dim is
loaded at full extent and the digit selected on the VPU (G x reads, still
beating materialize's gather+write+re-read). Either way the strided-pitch
DMA tops out near ~210 GB/s billed on v5e (measured: the pitch halves HBM
read efficiency; block size does not move it) — which is why the Pallas
path is now the backend="pallas" strategy row rather than the default.
Offsets fold into index-map digits; negative strides on index-map-only axes
fold into reversed index maps.

Out of scope (falls back to materialize in the caller): lane-axis
irregularity (inner stride != 1, reversed lanes — Mosaic has no lane-strided
selects or `rev`), non-monotone (transposed) views — those route to the
dedicated transpose kernels — and offset digits on the two blocked axes.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..tensor import TensorView
from ..utils import cdiv, round_step_up

# role tags for dense dims
LEAD = "lead"        # a leading view axis: block 1, index map = coord (+digit)
ROW = "row"          # the blocked view axis (second-minor): block br
LANE = "lane"        # the minor view axis: block = full dense extent
SKIP = "skip"        # skip dim above the last-two region: block 1, digit map
SKIPFULL = "skipfull"  # skip dim between row and lane: full load + VPU select


@dataclasses.dataclass(frozen=True)
class DenseDim:
    extent: int
    role: str
    # LEAD: (leading_axis_index, digit, flipped); SKIP/SKIPFULL: digit
    param: object = None


@dataclasses.dataclass(frozen=True)
class StridedEmbed:
    """A view expressed as dense_shape + per-dim roles over its flat buffer."""

    dense_shape: Tuple[int, ...]
    dims: Tuple[DenseDim, ...]
    logical_shape: Tuple[int, ...]  # squeezed view shape (lead..., R, C)


def _squeeze(view: TensorView):
    dims = [(sh, st) for sh, st in zip(view.shape, view.strides) if sh != 1]
    return dims


def plan_embedding(view: TensorView) -> Optional[StridedEmbed]:
    """Express ``view`` as a free dense reshape + roles, or None if the view
    is outside the regular class (caller then materializes)."""
    dims = _squeeze(view)
    if len(dims) < 2:
        return None  # 1-D strided: lane stride != 1 unsupported; contiguous
        # 1-D is already the fast path upstream
    offset = view.offset
    flips = [False] * len(dims)
    norm = []
    for i, (sh, st) in enumerate(dims):
        if st < 0:
            offset += (sh - 1) * st
            st = -st
            flips[i] = True
        if st == 0:
            return None  # broadcast views unsupported
        norm.append((sh, st))
    # monotone check (transposes route to the transpose kernels instead)
    for (sa, a), (sb, b) in zip(norm, norm[1:]):
        if a <= b:
            return None
    # lane axis must be truly contiguous, not flipped
    if norm[-1][1] != 1 or flips[-1]:
        return None
    # the blocked row axis cannot be flipped (no sublane `rev` on TPU)
    if flips[-2]:
        return None

    # Build dense dims minor -> major, peeling offset digits as we go.
    # A stride gap between axis and axis+1 becomes a skip dim: SKIPFULL when
    # it is wedged between the blocked row axis and the lane axis (it then
    # lives in Mosaic's constrained last-two region and must be loaded at
    # full extent + VPU-selected), SKIP otherwise (block 1, digit index map).
    rev_dims: List[DenseDim] = []
    acc = 1
    lane_axis = len(norm) - 1
    row_axis = len(norm) - 2
    for axis in range(lane_axis, -1, -1):
        sh, st = norm[axis]
        if st % acc:
            return None
        gap = st // acc
        if gap > 1:
            digit = (offset // acc) % gap
            role = SKIPFULL if axis == row_axis else SKIP
            rev_dims.append(DenseDim(int(gap), role, int(digit)))
            acc *= gap
        digit = (offset // acc) % sh
        if axis == lane_axis:
            if digit:
                return None  # lane window offsets unsupported
            rev_dims.append(DenseDim(sh, LANE))
        elif axis == row_axis:
            if digit:
                return None  # row start must be block-aligned (digit 0)
            rev_dims.append(DenseDim(sh, ROW))
        else:
            if digit:
                # a digit on a view axis would index past its dense extent
                # (the extent IS the view span); such offsets belong to skip
                # dims — fall back. Pure leading slices never reach here
                # (they are contiguous-with-offset).
                return None
            rev_dims.append(DenseDim(sh, LEAD, (axis, 0, flips[axis])))
        acc *= sh
    # top-level gap: whatever remains of the buffer above the view's span
    top_digit = offset // acc
    remaining = view.buffer.size // acc
    if view.buffer.size % acc:
        return None  # dense reshape would need a copying slice
    if remaining > 1:
        rev_dims.append(DenseDim(int(remaining), SKIP, int(top_digit)))
    elif top_digit:
        return None

    # verify the offset decomposition reconstructs exactly
    rec = 0
    stride = 1
    for d in rev_dims:
        if d.role in (SKIP, SKIPFULL):
            rec += d.param * stride
        elif d.role == LEAD:
            rec += d.param[1] * stride
        stride *= d.extent
    if rec != offset:
        return None

    dims_maj = tuple(reversed(rev_dims))
    dense_shape = tuple(d.extent for d in dims_maj)
    logical = tuple(sh for sh, _ in norm)
    return StridedEmbed(dense_shape, dims_maj, logical)


def _fold_skipfull(e: StridedEmbed) -> StridedEmbed:
    """Fold a SKIPFULL dim into the lane axis when the lane extent is a
    128-multiple: (…, R, G, C) reloads as (…, R, G*C) with lane block C and
    the skip digit as the lane BLOCK INDEX — Mosaic's lane-dim blocks only
    need 128-divisibility (it is the sublane dim that must be 8-divisible
    or full), so the DMA then fetches ONLY the selected phase instead of
    loading all G phases and selecting on the VPU (1x traffic vs G x)."""
    C = e.logical_shape[-1]
    if C % 128:
        return e
    dims = list(e.dims)
    for i, d in enumerate(dims):
        if d.role == SKIPFULL:
            assert dims[i + 1].role == LANE
            merged = DenseDim(d.extent * C, LANE, int(d.param))
            dims = dims[:i] + [merged]
            return dataclasses.replace(
                e, dims=tuple(dims),
                dense_shape=tuple(x.extent for x in dims))
    return e


def _kernel_cost_ok(embeds: Sequence[StridedEmbed], itemsizes,
                    budget: int) -> Optional[int]:
    """Pick rows-per-block br (or None if even br=8 blows the VMEM budget)."""
    logical = embeds[0].logical_shape
    C = logical[-1]
    span = []
    for e, isz in zip(embeds, itemsizes):
        s = C * isz
        for d in e.dims:
            if d.role == SKIPFULL:
                s *= d.extent
        span.append(s)
    # x2: Mosaic double-buffers every streamed block
    per_row = 2 * (sum(span) + C * max(itemsizes))
    br = (budget // max(per_row, 1)) // 8 * 8
    if br < 8:
        return None
    return int(min(br, round_step_up(logical[-2], 8), 512))


def build_strided_foreach(fn: Callable, views: Sequence[TensorView],
                          embeds: Sequence[StridedEmbed], out_dtype,
                          interpret: bool) -> jax.Array:
    """Run ``fn`` over the strided views in ONE kernel, return the dense
    result with the views' logical (unsqueezed) shape."""
    logical = embeds[0].logical_shape
    for e in embeds[1:]:
        if e.logical_shape != logical:
            raise ValueError("strided operands disagree on squeezed shape")
    lead = logical[:-2]
    R, C = logical[-2], logical[-1]
    embeds = [_fold_skipfull(e) for e in embeds]
    from ..device_info import vmem_budget_bytes

    # elementwise streams gain nothing from giant blocks; 32MB of blocks
    # keeps the pipeline deep and far from the scoped-vmem ceiling
    budget = min(vmem_budget_bytes(), 32 * 1024 * 1024)
    br = _kernel_cost_ok(embeds, [v.dtype.itemsize for v in views], budget)
    if br is None:
        return None  # caller falls back
    g0 = int(np.prod(lead)) if lead else 1
    grid = (g0, cdiv(R, br))

    def make_imap(e: StridedEmbed):
        def imap(gl, gr):
            coords = []
            rem = gl
            for n in reversed(lead):
                coords.append(rem % n)
                rem = rem // n
            coords.reverse()
            out = []
            for d in e.dims:
                if d.role == LEAD:
                    ax, digit, flipped = d.param
                    c = coords[ax]
                    if flipped:
                        c = lead[ax] - 1 - c
                    out.append(c + digit)
                elif d.role == ROW:
                    out.append(gr)
                elif d.role == LANE:
                    # a folded skip digit is the lane BLOCK index
                    out.append(d.param or 0)
                elif d.role == SKIPFULL:
                    out.append(0)
                else:  # SKIP above the blocked region: digit IS the block idx
                    out.append(d.param)
            return tuple(out)
        return imap

    def block_shape(e: StridedEmbed):
        bs = []
        for d in e.dims:
            if d.role == ROW:
                bs.append(br)
            elif d.role == LANE:
                bs.append(C)  # == extent unless a skip digit was folded in
            elif d.role == SKIPFULL:
                bs.append(d.extent)
            else:
                bs.append(1)
        return tuple(bs)

    def extract(x, e: StridedEmbed):
        # x: loaded block; drop block-1 dims, select SKIPFULL digits
        idx = []
        for d in e.dims:
            if d.role in (ROW, LANE):
                idx.append(slice(None))
            elif d.role == SKIPFULL:
                idx.append(d.param)
            else:
                idx.append(0)
        return x[tuple(idx)]

    def kernel(*refs):
        out_ref = refs[-1]
        blocks = [extract(r[:], e) for r, e in zip(refs[:-1], embeds)]
        out_ref[0] = fn(*blocks).astype(out_dtype)

    in_specs = [pl.BlockSpec(block_shape(e), make_imap(e),
                             memory_space=pltpu.VMEM) for e in embeds]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, br, C), lambda gl, gr: (gl, gr, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g0, R, C), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(*[v.buffer.reshape(e.dense_shape) for v, e in zip(views, embeds)])
    return out.reshape(*lead, R, C) if lead else out.reshape(R, C)


def plan_xla_view(view: TensorView):
    """Layout-friendly basic-indexing plan for the XLA fusion backend, or
    None outside its class.

    Returns (merged_shape, index, flip_axes, logical_shape) such that
    buffer.reshape(merged_shape)[index], flipped on flip_axes, equals the
    squeezed view. Each stride gap g merges into the view dim ABOVE it —
    (R, G, C)[:, d, :] becomes (R*G, C)[d::G, :] — so merged_shape is the
    view's NATIVE enclosing shape (the reshape cancels against the caller's
    flatten; indexing the raw rank-(n+k) dense reshape instead measured 142
    GB/s because a sub-8 sublane dim forces a padded relayout) and every
    phase select is a strided slice XLA fuses into the elementwise kernel.

    The class is STRICTLY BROADER than the Pallas embedding's: lane strides
    > 1 (every-k-th column), flips on ANY axis (lax.rev is free in XLA;
    Mosaic has no sublane/lane rev), and 1-D strided views are all in;
    transposed (non-monotone) and broadcast (stride-0) views are not."""
    dims = _squeeze(view)
    if not dims:
        return None  # 0/1-element views are contiguous upstream
    offset = view.offset
    flips: List[int] = []
    norm = []
    for i, (sh, st) in enumerate(dims):
        if st < 0:
            offset += (sh - 1) * st
            st = -st
            flips.append(i)
        if st == 0:
            return None  # broadcast views unsupported
        norm.append((sh, st))
    if offset < 0:
        return None
    for (sa, a), (sb, b) in zip(norm, norm[1:]):
        if a <= b:
            return None  # transposed: route to the transpose kernels
    merged_rev: List[int] = []
    index_rev: List = []
    acc = 1
    for axis in range(len(norm) - 1, -1, -1):
        sh, st = norm[axis]
        if st % acc:
            return None
        g = st // acc
        d = (offset // acc) % g if g > 1 else 0
        if (offset // (acc * g)) % sh:
            return None  # within-axis offset digit: fall back
        merged_rev.append(sh * g)
        index_rev.append(slice(d, None, g) if g > 1 else slice(None))
        acc *= sh * g
    if view.buffer.size % acc:
        return None
    remaining = view.buffer.size // acc
    top_digit = offset // acc
    if remaining > 1:
        merged_rev.append(int(remaining))
        index_rev.append(int(top_digit))
    elif top_digit:
        return None
    # the digit decomposition must reconstruct the offset exactly
    rec, stride = 0, 1
    for ext, idx in zip(merged_rev, index_rev):
        rec += (idx.start or 0 if isinstance(idx, slice) else idx) * stride
        stride *= ext
    if rec != offset:
        return None
    return (tuple(reversed(merged_rev)), tuple(reversed(index_rev)),
            tuple(flips), tuple(sh for sh, _ in norm))


def _xla_apply(fn, plans, out_dtype, bufs):
    ops = []
    for b, (merged, index, flips, logical) in zip(bufs, plans):
        x = b.reshape(merged)[index]
        for ax in flips:
            # after the int index on a top skip dim (if any) the result
            # rank equals len(logical), so flip axes apply directly
            x = jnp.flip(x, axis=ax)
        ops.append(x.reshape(logical))
    return fn(*ops).astype(out_dtype)


_XLA_JIT_CACHE: dict = {}


def strided_for_each(fn: Callable, views: Sequence[TensorView], out_dtype,
                     interpret: bool, backend: str = "xla"
                     ) -> Optional[jax.Array]:
    """Fused iteration over strided views; None if the views fall outside
    the regular class (caller materializes).

    Default backend is XLA BASIC-INDEX FUSION: the view becomes a free
    dense reshape + slice/int-index/rev expression that XLA fuses INTO the
    elementwise kernel — one pass over HBM, no gather materialization.
    Measured (tools/strided_policy_probe.py + bench shape, v5e, 16384x4096
    f32 every-G-th row): this path records 440 GB/s useful at G=2 — 1.70x
    the XLA slice+multiply comparator (259) and 2.1x the round-2 in-kernel
    Pallas record (213). The raced alternatives: Pallas lane-folded pitched
    DMA 213 / 128 / 76 at G=2/4/8, full-phase load + VPU select 185 / 101 /
    183 — Mosaic bills strided window DMA at roughly half streaming rate
    and the penalty compounds with pitch, so the in-kernel path loses
    everywhere. The reference's forEachStrided contract ("never slower
    than the copy path", foreach.nim:64-113) picks XLA. The expression
    must use the MERGED layout-friendly form (_merged_expr) — indexing the
    raw rank-(n+k) dense reshape measured 142 GB/s (sub-8 sublane dims
    force a padded relayout). backend="pallas" keeps the in-kernel
    dense-embed path for the strategy bench and as the substrate for cases
    XLA cannot express (multi-output pytree staging rides foreach.py)."""
    shape = views[0].shape
    for v in views[1:]:
        if v.shape != shape:
            raise ValueError(f"operand shape mismatch: {v.shape} vs {shape}")
    if backend == "xla":
        plans = []
        for v in views:
            p = plan_xla_view(v)
            if p is None:
                return None
            plans.append(p)
        if any(p[3] != plans[0][3] for p in plans):
            return None
        bufs = [v.buffer for v in views]
        if any(isinstance(b, jax.core.Tracer) for b in bufs):
            # already under a trace: the caller's jit fuses the expression
            out = _xla_apply(fn, plans, out_dtype, bufs)
        else:
            # eager: jit once per (fn, view geometry, dtypes) so slicing +
            # compute still land in ONE fused XLA kernel
            key = (fn, tuple((v.shape, v.strides, v.offset, v.buffer.size,
                              v.dtype.name) for v in views),
                   jnp.dtype(out_dtype).name)
            applier = _XLA_JIT_CACHE.get(key)
            if applier is None:
                applier = jax.jit(partial(_xla_apply, fn, plans, out_dtype))
                _XLA_JIT_CACHE[key] = applier
            out = applier(bufs)
        return out.reshape(views[0].shape)
    embeds = []
    for v in views:
        e = plan_embedding(v)
        if e is None:
            return None
        embeds.append(e)
    if any(e.logical_shape != embeds[0].logical_shape for e in embeds):
        return None
    out = build_strided_foreach(fn, views, embeds, out_dtype, interpret)
    if out is None:
        return None
    # restore the original (unsqueezed) shape
    return out.reshape(views[0].shape)
