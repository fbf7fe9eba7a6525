"""Strided tensor views over JAX arrays.

TPU-native analog of the reference's ``Tensor[T]`` + ``MatrixView`` machinery
(reference: laser/tensor/datatypes.nim:18-102, gemm_utils.nim:36-60,
laser/tensor/initialization.nim:24-202). JAX arrays are logically contiguous
and immutable, so a "view" here is a host-side descriptor
(shape/strides/offset over a flat buffer) that kernels consume either through
a zero-copy fast path (contiguous / pure-transpose layouts) or an explicit
materialization pass — the analog of laser packing a strided matrix before
hitting the SIMD microkernel.

The reference's mutability-typed raw access (RawImmutableView/RawMutableView,
datatypes.nim:76-102) maps onto JAX's functional semantics: every view is
immutable; "mutation" is donation/aliasing at the jit boundary, which we keep
as an explicit ``donate`` flag on the ops that support it.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import LASER_MAXRANK


def row_major_strides(shape: Sequence[int]) -> Tuple[int, ...]:
    """Row-major stride computation (reference: initialization.nim:24-40)."""
    strides = [0] * len(shape)
    acc = 1
    for i in range(len(shape) - 1, -1, -1):
        strides[i] = acc
        acc *= shape[i]
    return tuple(strides)


@dataclasses.dataclass(frozen=True)
class TensorView:
    """A (shape, strides, offset) window over a flat device buffer.

    ``buffer`` is always a rank-1 jax.Array; strides are in elements.
    """

    buffer: jax.Array
    shape: Tuple[int, ...]
    strides: Tuple[int, ...]
    offset: int = 0

    def __post_init__(self):
        if len(self.shape) != len(self.strides):
            raise ValueError("shape/strides rank mismatch")
        if len(self.shape) > LASER_MAXRANK:
            raise ValueError(f"rank > LASER_MAXRANK={LASER_MAXRANK}")

    # -- metadata (reference: datatypes.nim:32-47) --------------------------

    @property
    def rank(self) -> int:
        return len(self.shape)

    @property
    def size(self) -> int:
        return int(np.prod(self.shape)) if self.shape else 1

    @property
    def dtype(self):
        return self.buffer.dtype

    def is_c_contiguous(self) -> bool:
        """Contiguity check ignoring size-1 dims (reference: datatypes.nim:38-47)."""
        z = 1
        for sh, st in zip(reversed(self.shape), reversed(self.strides)):
            if sh != 1:
                if st != z:
                    return False
                z *= sh
        return True

    # -- constructors --------------------------------------------------------

    @staticmethod
    def from_array(a: jax.Array) -> "TensorView":
        a = jnp.asarray(a)
        return TensorView(a.reshape(-1), tuple(a.shape), row_major_strides(a.shape), 0)

    @staticmethod
    def matrix(buffer: jax.Array, rows: int, cols: int, row_stride: int,
               col_stride: int, offset: int = 0) -> "TensorView":
        """MatrixView analog (reference: gemm_utils.nim:36-46)."""
        return TensorView(jnp.asarray(buffer).reshape(-1), (rows, cols),
                          (row_stride, col_stride), offset)

    # -- view algebra ---------------------------------------------------------

    def transpose(self, axes: Optional[Sequence[int]] = None) -> "TensorView":
        axes = tuple(axes) if axes is not None else tuple(range(self.rank))[::-1]
        return TensorView(self.buffer,
                          tuple(self.shape[a] for a in axes),
                          tuple(self.strides[a] for a in axes),
                          self.offset)

    def slice(self, *spec: slice) -> "TensorView":
        """Basic (start:stop:step) slicing producing a strided view."""
        shape, strides, offset = [], [], self.offset
        for dim, s in enumerate(spec):
            start, stop, step = s.indices(self.shape[dim])
            n = max(0, -(-(stop - start) // step)) if step > 0 else \
                max(0, -(-(start - stop) // -step))
            offset += start * self.strides[dim]
            shape.append(n)
            strides.append(self.strides[dim] * step)
        for dim in range(len(spec), self.rank):
            shape.append(self.shape[dim])
            strides.append(self.strides[dim])
        return TensorView(self.buffer, tuple(shape), tuple(strides), offset)

    # -- materialization -------------------------------------------------------

    def _flat_indices(self) -> jax.Array:
        """Flat buffer indices for every logical element (odometer as iota sum)."""
        idx = jnp.full(self.shape, self.offset, dtype=jnp.int32)
        for d in range(self.rank):
            ar = jax.lax.broadcasted_iota(jnp.int32, self.shape, d)
            idx = idx + ar * jnp.int32(self.strides[d])
        return idx

    def materialize(self) -> jax.Array:
        """Produce a contiguous array with this view's logical contents.

        Fast paths avoid any data movement; the general path is a gather —
        the analog of laser's strided `forEachStrided` copy
        (reference: initialization.nim:68-75).
        """
        if self.is_c_contiguous():
            flat = jax.lax.dynamic_slice(self.buffer, (self.offset,), (self.size,)) \
                if (self.offset != 0 or self.size != self.buffer.size) else self.buffer
            return flat.reshape(self.shape)
        # Pure permutation of a contiguous block: transpose without gather.
        perm = _as_permutation(self.shape, self.strides)
        if perm is not None and self.offset == 0 and self.size == self.buffer.size:
            inv = np.argsort(perm)
            src_shape = tuple(self.shape[p] for p in inv)
            return self.buffer.reshape(src_shape).transpose(perm)
        return self.buffer[self._flat_indices().reshape(-1)].reshape(self.shape)

    def to_array(self) -> jax.Array:
        return self.materialize()


def _as_permutation(shape, strides) -> Optional[Tuple[int, ...]]:
    """If (shape,strides) is exactly a permuted dense layout, return the axes
    permutation p such that dense.transpose(p) == this view; else None."""
    order = sorted(range(len(shape)), key=lambda d: -strides[d])
    acc = 1
    for d in reversed(order):
        if strides[d] != acc:
            return None
        acc *= shape[d]
    # order maps "position in dense source" -> "axis in view".
    inv = [0] * len(shape)
    for pos, ax in enumerate(order):
        inv[ax] = pos
    return tuple(inv)


def as_view(x) -> TensorView:
    return x if isinstance(x, TensorView) else TensorView.from_array(x)


# -- tensor construction (reference: initialization.nim:34-202) ----------------

def zeros(shape, dtype=jnp.float32) -> jax.Array:
    return jnp.zeros(shape, dtype)


def from_nested(nested, dtype=None) -> jax.Array:
    """toTensor analog: nested Python lists -> device array
    (reference: initialization.nim:168-202, private/nested_containers.nim)."""
    return jnp.asarray(np.asarray(nested, dtype=dtype))


def copy_from_raw(flat, shape, dtype=None) -> jax.Array:
    """copyFromRaw analog (reference: initialization.nim:112-128)."""
    a = jnp.asarray(flat, dtype=dtype).reshape(-1)
    if a.size != math.prod(shape):
        raise ValueError("length mismatch")
    return a.reshape(shape)


def deep_copy(x) -> jax.Array:
    """deepCopy analog (reference: initialization.nim:42-75): contiguous
    result regardless of the source view's strides. Contiguous sources are
    already safe to share (immutable); regular strided views stream through
    ONE fused kernel (ops/strided.py — the forEachStrided copy the reference
    uses for deepCopy, initialization.nim:68); irregular views gather."""
    v = as_view(x)
    if not v.is_c_contiguous():
        from .ops.strided import strided_for_each
        from .config import should_interpret

        out = strided_for_each(lambda b: b, [v], v.dtype, should_interpret())
        if out is not None:
            return out
    return v.materialize()


def set_zero(x) -> jax.Array:
    """setZero analog (reference: initialization.nim:130-154) — functional:
    returns a zeroed array of the same shape/dtype."""
    v = as_view(x)
    return jnp.zeros(v.shape, v.dtype)


def copy_from(dst, src) -> jax.Array:
    """copyFrom analog (reference: initialization.nim:77-110): returns dst's
    shape/dtype filled with src's (materialized) values."""
    d = as_view(dst)
    s = as_view(src)
    if d.shape != s.shape:
        raise ValueError(f"copy_from shape mismatch {d.shape} vs {s.shape}")
    return s.materialize().astype(d.dtype)
