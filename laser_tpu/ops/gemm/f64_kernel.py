"""Native float64 GEMM on the MXU — Ozaki-style int8 slice decomposition.

Parity component for the reference's f64 microkernels
(laser/primitives/matrix_multiplication/gemm_ukernel_avx512.nim:23-38 f64x8,
gemm_ukernel_sse2.nim:13-17), benchmarked at 441.5 GFLOP/s on 18 AVX512
cores (benchmarks/gemm/gemm_bench_float64.nim:234-258).

The TPU has no f64 ALU — and its X64 emulation mode stores f64 as a *lossy*
f32 pair (~2^-49 precision, overflows above f32 range; measured in
docs/PERF_NOTES.md). So exact f64 cannot even live in device memory. The
exact path that remains is integer: slice each f64 into signed 7-bit digits
of its mantissa (relative to a per-row / per-column power-of-two scale) and
reconstruct the product from exact int8 x int8 -> int32 cross-products on
the MXU — the Ozaki splitting scheme, reformulated for signed digits:

    A[i,:] = 2^(sa_i) * sum_p dA_p[i,:] * 128^-(p+1)      dA in [-64, 64]
    B[:,j] = 2^(sb_j) * sum_q dB_q[:,j] * 128^-(q+1)

    C[i,j] = 2^(sa_i + sb_j) * sum_s S_s[i,j] * 128^-(s+2)
    S_s    = sum_{p+q=s} dA_p @ dB_q                      (int32, exact)

Every step is exact except (a) the digit tails beyond ``slices`` planes
(<= 2^(-7*slices) relative to the row/col scale) and (b) the final f64
combine (one rounding per bucket). With the default 8 slices and buckets
s < 8 (36 int8 MXU matmuls), the worst-case error bound is slightly
*tighter* than the classical f64 inner-product bound K*u*|a||b| — verified
against a NumPy f64 oracle in tests. ``slices=4`` gives a fast tier
(10 matmuls, ~2^-28 relative error: f32-grade accuracy at f64 dynamic range).

Execution model (dtype-driven, like every laser dispatch):
  * CPU backend (tests, interpret mode): pure JAX end to end — jittable.
  * TPU backend: host-orchestrated. Digit extraction and the f64 combine run
    in NumPy on the host (IEEE-exact), only the bucketed int8 GEMM runs on
    the device. The result is a host ndarray — by construction, since the
    device cannot represent it. Not jittable on TPU (a tracer cannot leave
    the device); ``gemm(backend="xla")`` keeps a jittable (lossy, emulated)
    path available.

Finite inputs only (like every Ozaki-scheme implementation): Inf/NaN would
need to propagate through integer digits.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import round_step_up
from .limb_kernel import gemm_limbs, max_k_for

_DEFAULT_SLICES = 8

_NP_EPILOGUES = {
    None: lambda r: r,
    "none": lambda r: r,
    "relu": lambda r: np.maximum(r, 0),
    "tanh": np.tanh,
    "sigmoid": lambda r: 1.0 / (1.0 + np.exp(-r)),
    "gelu": lambda r: 0.5 * r * (1.0 + np.tanh(
        0.7978845608028654 * (r + 0.044715 * r ** 3))),
}


def f64_digits(x: jax.Array, axis: int, slices: int):
    """Decompose (R, C) f64 into (slices, R, C) int8 digits + int32 scales
    (pure JAX; exact only where f64 arithmetic is IEEE, i.e. on CPU).

    ``axis`` is the contraction axis (1 for A, 0 for B): the power-of-two
    scale is shared along it, one per row of A / column of B.
    sum_p digits[p] * 128^-(p+1) == ldexp(x, -scale) up to 2^(-7*slices).
    """
    amax = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    # amax = m * 2^e with m in [0.5, 1); scale = e + 1 puts |xs| <= 0.5 so
    # every digit fits [-64, 64].
    _, e = jnp.frexp(jnp.where(amax > 0, amax, 1.0))
    scale = (e + 1).astype(jnp.int32)
    t = jnp.ldexp(x, -scale)
    digits = []
    for _ in range(slices):
        t = t * 128.0
        d = jnp.round(t)
        t = t - d
        digits.append(d.astype(jnp.int8))
    return jnp.stack(digits), jnp.squeeze(scale, axis)


def _extract_host(x: np.ndarray, axis: int, slices: int):
    """Host extraction: the single-pass C++ kernel when the native runtime
    builds (csrc/laser_host.cpp:laser_f64_digits, ~10x NumPy on this path),
    else the NumPy twin. Both are bit-identical."""
    from ... import host

    # fall back to NumPy only when the native runtime cannot BUILD (no
    # toolchain); real extraction errors must surface, not silently switch
    # implementations
    if host.available():
        return host.f64_digits(x, axis, slices)
    return f64_digits_np(x, axis, slices)


def f64_digits_np(x: np.ndarray, axis: int, slices: int):
    """NumPy twin of ``f64_digits`` — the host-exact extraction used when
    the accelerator cannot hold f64 (see module docstring)."""
    amax = np.max(np.abs(x), axis=axis, keepdims=True)
    _, e = np.frexp(np.where(amax > 0, amax, 1.0))
    scale = (e + 1).astype(np.int32)
    t = np.ldexp(x, -scale)
    digits = np.empty((slices,) + x.shape, np.int8)
    for p in range(slices):
        t *= 128.0
        d = np.rint(t)
        t -= d
        digits[p] = d.astype(np.int8)
    return digits, np.squeeze(scale, axis)


def gemm_f64(a, b, *, alpha=1.0, beta=0.0, c=None, bias=None,
             epilogue: Optional[str] = None, slices: int = _DEFAULT_SLICES,
             interpret: bool = False):
    """epilogue(alpha * (a @ b) + beta * c + bias) in f64 via int8 MXU
    slice products. Returns a jax array on CPU backends, a host ndarray on
    accelerators (which cannot represent f64)."""
    is_tracer = isinstance(a, jax.core.Tracer) or isinstance(b, jax.core.Tracer)
    on_cpu = jax.default_backend() == "cpu"
    if is_tracer and not on_cpu:
        raise NotImplementedError(
            "f64 gemm cannot run under jit on TPU: the device stores f64 as "
            "lossy f32 pairs. Call it eagerly (host-orchestrated exact path) "
            "or use gemm(..., backend='xla') for the lossy emulated path.")
    if is_tracer or on_cpu:
        return _gemm_f64_jax(a, b, alpha, beta, c, bias, epilogue, slices,
                             interpret)
    return _gemm_f64_host(np.asarray(a), np.asarray(b), alpha, beta,
                          None if c is None else np.asarray(c),
                          None if bias is None else np.asarray(bias),
                          epilogue, slices, interpret)


def _bucket_weights(n_buckets: int):
    return [2.0 ** (-7 * (s + 2)) for s in range(n_buckets)]


def _two_sum(a, b):
    """Error-free transform: s + e == a + b exactly (Knuth, branch-free).
    Relies on IEEE round-to-nearest f32 add/sub — true of the VPU and of
    XLA:CPU; XLA performs no unsafe reassociation."""
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


@partial(jax.jit, static_argnums=(1,))
def combine_buckets_3f32(buckets: jax.Array, n_buckets: int) -> jax.Array:
    """Device-side combine of int32 bucket planes into an unevaluated
    triple-f32 sum: out[0]+out[1]+out[2] (evaluated in f64 on the host)
    equals sum_s buckets[s] * 128^-(s+2) to within one f64 ulp of the
    result (measured 2^-38 absolute at 2^15 leading magnitude, i.e. the
    final rounding itself) — tighter than the 8 per-bucket f64 roundings
    of a host combine.

    Each int32 plane splits exactly into hi/lo f32 (|S_s| <= 2^30 with the
    max_k_for margin, so |S_s - fl(S_s)| <= 64: both parts exact), the
    power-of-two weights scale exactly, and two TwoSum distillation passes
    push all but O(u^2) of the mass into the first two components.

    Purpose: the result of the f64 GEMM leaves the device ONCE per K-chunk;
    3 f32 planes instead of ``n_buckets`` int32 planes cuts that transfer
    (the dominant end-to-end cost through a thin host link) by
    ``n_buckets``/1.5x, and moves the O(M*N*n_buckets) combine arithmetic
    from the (single-core) host onto the VPU.
    """
    w = _bucket_weights(n_buckets)
    hi = buckets.astype(jnp.float32)
    lo = (buckets - hi.astype(jnp.int32)).astype(jnp.float32)
    terms = []
    for s in range(n_buckets):
        terms += [hi[s] * np.float32(w[s]), lo[s] * np.float32(w[s])]
    # distillation pass 1: c0 + sum(errs) == sum(terms) exactly
    c0 = terms[0]
    errs = []
    for t in terms[1:]:
        c0, e = _two_sum(c0, t)
        errs.append(e)
    # distillation pass 2: c1 + sum(errs2) == sum(errs) exactly
    c1 = errs[0]
    errs2 = []
    for e in errs[1:]:
        c1, e2 = _two_sum(c1, e)
        errs2.append(e2)
    c2 = errs2[0]
    for e2 in errs2[1:]:  # naive: |sum(errs2)| <= 2^-43, below every bound
        c2 = c2 + e2
    return jnp.stack([c0, c1, c2])


def _gemm_f64_host(a, b, alpha, beta, c, bias, epilogue, slices, interpret):
    M, K = a.shape
    N = b.shape[1]
    Mp, Kp, Np = (round_step_up(M, 32), round_step_up(K, 128),
                  round_step_up(N, 128))
    if (Mp, Kp, Np) != (M, K, N):
        a = np.pad(a, ((0, Mp - M), (0, Kp - K)))
        b = np.pad(b, ((0, Kp - K), (0, Np - N)))

    k_chunk = max_k_for(slices, digit_max=64)
    out = np.zeros((Mp, Np), np.float64)
    for k0 in range(0, Kp, k_chunk):
        k1 = min(k0 + k_chunk, Kp)
        da, sa = _extract_host(a[:, k0:k1], 1, slices)
        db, sb = _extract_host(b[k0:k1, :], 0, slices)
        # buckets combine on device into 3 f32 planes (exact to 2^-43):
        # the download shrinks slices/1.5x and the combine rides the VPU
        tri = np.asarray(combine_buckets_3f32(
            gemm_limbs(jnp.asarray(da), jnp.asarray(db), slices,
                       interpret=interpret), slices))
        part = (tri[0].astype(np.float64) + tri[1].astype(np.float64)
                + tri[2].astype(np.float64))
        out += np.ldexp(part, sa[:, None] + sb[None, :])

    out = out[:M, :N] * np.float64(alpha)
    if c is not None:
        out = out + np.float64(beta) * c
    if bias is not None:
        out = out + bias.astype(np.float64).reshape(1, -1)
    return _NP_EPILOGUES[epilogue](out)


def _gemm_f64_jax(a, b, alpha, beta, c, bias, epilogue, slices, interpret):
    from .kernel import _EPILOGUES

    a = jnp.asarray(a)
    b = jnp.asarray(b)
    M, K = a.shape
    N = b.shape[1]
    Mp, Kp, Np = (round_step_up(M, 32), round_step_up(K, 128),
                  round_step_up(N, 128))
    if (Mp, Kp, Np) != (M, K, N):
        a = jnp.pad(a, ((0, Mp - M), (0, Kp - K)))
        b = jnp.pad(b, ((0, Kp - K), (0, Np - N)))

    k_chunk = max_k_for(slices, digit_max=64)
    w = _bucket_weights(slices)
    out = None
    for k0 in range(0, Kp, k_chunk):
        k1 = min(k0 + k_chunk, Kp)
        da, sa = f64_digits(a[:, k0:k1], 1, slices)
        db, sb = f64_digits(b[k0:k1, :], 0, slices)
        buckets = gemm_limbs(da, db, slices, interpret=interpret)
        part = buckets[0].astype(jnp.float64) * w[0]
        for s in range(1, slices):
            part = part + buckets[s].astype(jnp.float64) * w[s]
        part = jnp.ldexp(part, sa[:, None] + sb[None, :])
        out = part if out is None else out + part

    out = out[:M, :N] * jnp.float64(alpha)
    if c is not None:
        out = out + jnp.float64(beta) * c
    if bias is not None:
        out = out + bias.astype(jnp.float64).reshape(1, -1)
    return _EPILOGUES[epilogue](out)


