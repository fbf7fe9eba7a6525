"""kops: the named kernel-op vocabulary used inside Pallas kernels.

The reference's kernel generators are parameterized over a named SIMD op set
— setZero / broadcast / load / store / mul / add / fma per ISA
(gemm_ukernel_generator.nim:103-132, simd.nim) — so that one generator stamps
out kernels for every (ISA, dtype). SURVEY C1 asks for the same capability
vocabulary on the VPU/MXU so kernel builders are parameterized identically.
These are thin, but they are the *contract*: kernel-builder code in this
package calls these names, never raw jnp, for the operations that have
hardware-semantics footguns on TPU (masked memory ops, iota rank, matmul
precision, bit casts).

All functions are safe both in compiled Mosaic kernels and in interpret mode.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# -- register-style value ops (simd.nim analog) -------------------------------


def set_zero(shape, dtype=jnp.float32):
    """mm_setzero_* (simd.nim:49)."""
    return jnp.zeros(shape, dtype)


def broadcast(value, shape, dtype=None):
    """mm_set1_* — scalar -> full vector."""
    v = jnp.asarray(value, dtype)
    return jnp.broadcast_to(v, shape)


def fma(a, b, c):
    """Fused multiply-add a*b + c (mm256_fmadd_ps). XLA contracts this to a
    single VPU FMA; keep the canonical a*b+c form so it can."""
    return a * b + c


def mul_add_unfused(a, b, c):
    """The AVX2-integer 'unfused' mul+add the reference documents
    (README.md:216-233) — explicit two-op form for integer dtypes."""
    return (a * b) + c


def iota(shape: Tuple[int, ...], dimension: int, dtype=jnp.int32):
    """Index generation. TPU requires >=2D iota; this is the safe spelling
    (broadcasted_iota) for any rank."""
    return jax.lax.broadcasted_iota(dtype, shape, dimension)


def bitcast(x, dtype):
    """Reinterpret bits (same width). Works compiled + interpreted."""
    return jax.lax.bitcast_convert_type(x, dtype)


# -- memory ops (masked load/store = the edge-ukernel capability) -------------


def load(ref, idx=None):
    """Unmasked block load (mm_load_ps analog)."""
    return ref[...] if idx is None else ref[idx]


def store(ref, value, idx=None):
    if idx is None:
        ref[...] = value
    else:
        ref[idx] = value


def masked_load(ref, mask, other=0):
    """maskload analog: out-of-range lanes get ``other``. The select form
    lowers to a predicated load in Mosaic and works in interpret mode."""
    return jnp.where(mask, ref[...], jnp.asarray(other, ref.dtype))


def masked_store(ref, value, mask):
    """maskstore analog (read-modify-write select; Mosaic predicates it)."""
    ref[...] = jnp.where(mask, value, ref[...])


# -- matmul (the MXU issue op, C13's jnp.dot contract) ------------------------


def mxu_matmul(a, b, *, acc_dtype=jnp.float32, precision: Optional[str] = None):
    """One MXU contraction with the package-wide precision contract:
    f32 inputs default to HIGHEST (6-pass, exact-path), everything else
    native single-pass. ALWAYS sets preferred_element_type."""
    prec = None
    if jnp.result_type(a.dtype, b.dtype) == jnp.float32:
        prec = {None: jax.lax.Precision.HIGHEST,
                "default": jax.lax.Precision.DEFAULT,
                "high": jax.lax.Precision.HIGH,
                "highest": jax.lax.Precision.HIGHEST}[precision]
    return jnp.dot(a, b, preferred_element_type=jnp.dtype(acc_dtype),
                   precision=prec)


# -- reductions (multi-accumulator contract, C21) ------------------------------


def lane_partials(x, reduce_fn=jnp.sum):
    """Reduce an (R, 128) block to an (8, 128) vreg-shaped partial without
    cross-lane traffic (the striped-accumulator trick,
    reductions_sse3.nim:31-49)."""
    r = x.shape[0]
    return reduce_fn(x.reshape(r // 8, 8, x.shape[-1]), axis=0)


def pairwise_fold(x, binop, identity):
    """Deterministic binary-tree fold along axis 0."""
    n = x.shape[0]
    p = 1 << max(n - 1, 0).bit_length()
    if p != n:
        pad_shape = (p - n,) + x.shape[1:]
        x = jnp.concatenate([x, jnp.full(pad_shape, identity, x.dtype)], 0)
    while x.shape[0] > 1:
        h = x.shape[0] // 2
        x = binop(x[:h], x[h:])
    return x[0]
