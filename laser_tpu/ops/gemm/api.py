"""Public GEMM API: ``gemm`` (array-level) and ``gemm_strided`` (view-level).

API parity with the reference driver
(laser/primitives/matrix_multiplication/gemm.nim:184-247):

  * ``gemm_strided(M, N, K, alpha, A, rsA, csA, B, rsB, csB, beta, C, rsC, csC)``
    keeps the exact BLAS-like signature over flat buffers + strides; being
    functional, it *returns* the new C instead of mutating.
  * the dtype x ISA static dispatch table (gemm.nim:228-247) becomes a dtype ->
    kernel-path dispatch: f32/bf16/f16 -> MXU Pallas kernel; int8 -> MXU int8
    path (native on v5e+, the TPU-idiomatic bonus); int32/int64 -> native
    limb-decomposed MXU kernels, exact mod 2^32/2^64 (int32_kernel.py,
    int64_kernel.py); f64 -> native Ozaki-slice MXU kernel (f64_kernel.py).
    The XLA dot_general fallback remains reachable via backend="xla" (the
    analog of laser's generic ukernel).
  * arbitrary strides: contiguous and pure-transpose layouts are zero-copy;
    anything else goes through one materialization pass (the packing analog —
    laser also repacks every operand before the microkernel ever sees it,
    gemm_packing.nim:24-94).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...config import get_config, should_interpret
from ...tensor import TensorView
from .kernel import build_gemm
from .tiling import GemmTiles, plan_tiles

_MXU_DTYPES = {"float32", "bfloat16", "float16", "int8"}


def _dispatch(in_dtype: np.dtype) -> str:
    name = jnp.dtype(in_dtype).name
    if name in _MXU_DTYPES:
        return "mxu"
    if name in ("int32", "uint32"):
        return "int32"  # native limb-decomposed MXU kernel (int32_kernel.py)
    if name in ("int64", "uint64"):
        return "int64"  # native 8-limb MXU kernel (int64_kernel.py)
    if name == "float64":
        return "f64"  # native Ozaki-slice MXU kernel (f64_kernel.py)
    raise NotImplementedError(f"gemm: unsupported dtype {name}")


def _acc_dtype(in_dtype) -> jnp.dtype:
    d = jnp.dtype(in_dtype)
    if d == jnp.int8 or d == jnp.uint8:
        return jnp.dtype(jnp.int32)
    if jnp.issubdtype(d, jnp.integer):
        return d
    if d == jnp.float64:
        return d
    return jnp.dtype(jnp.float32)


def gemm(a: jax.Array, b: jax.Array, *, alpha=1.0, beta=0.0,
         c: Optional[jax.Array] = None, bias: Optional[jax.Array] = None,
         epilogue: Optional[str] = None, out_dtype=None, acc_dtype=None,
         tiles: Optional[GemmTiles] = None, backend: Optional[str] = None,
         transpose_a: bool = False, transpose_b: bool = False,
         interpret: Optional[bool] = None) -> jax.Array:
    """out = epilogue(alpha * (op(a) @ op(b)) + beta * c + bias).

    a: (M,K) — or (K,M) with ``transpose_a``; b: (K,N) — or (N,K) with
    ``transpose_b``. Transposed operands are contracted in place on the MXU
    (no HBM transpose). The fused ``epilogue``/``bias`` implements the
    reference's declared roadmap feature (README.md:238-245).

    backend: None (default) picks automatically — plain matmuls (no
    epilogue/bias/C) dispatch to XLA's matmul, which outruns Mosaic's
    matmul codegen on current toolchains (~94% vs ~82% roofline on v5e;
    docs/PERF_NOTES.md), exactly as the reference dispatches per-ISA to the
    fastest ukernel (gemm.nim:228-247) and judges itself against vendor
    BLAS rather than purity (README.md:209-210). Every fused case runs the
    Pallas MXU kernel, where fusion beats XLA's unfused epilogue. Pass
    "pallas" or "xla" to force a path.
    """
    if backend not in (None, "auto", "pallas", "xla"):
        raise ValueError(
            f"gemm backend must be None/'auto'/'pallas'/'xla', got {backend!r}")
    if backend == "auto":
        backend = None

    # f64 on an accelerator must branch BEFORE jnp.asarray: the TPU stores
    # f64 as a lossy f32 pair (values beyond 2^128 become inf), so the exact
    # path keeps operands on the host and ships only int8 digits to the MXU
    # (f64_kernel.py). Gated on jax_enable_x64 to preserve JAX's standard
    # silent-downcast semantics when the flag is off.
    dts = [getattr(x, "dtype", None) for x in (a, b)]
    if (jax.config.jax_enable_x64 and backend != "xla"
            and jax.default_backend() != "cpu"
            and any(d is not None and jnp.dtype(d) == jnp.float64
                    for d in dts)):
        if any(isinstance(x, jax.core.Tracer) for x in (a, b)):
            raise NotImplementedError(
                "f64 gemm cannot run under jit on TPU: the device stores "
                "f64 as lossy f32 pairs. Call it eagerly (host-orchestrated "
                "exact path) or use gemm(..., backend='xla').")
        from .f64_kernel import gemm_f64

        a_np = np.asarray(a, np.float64)
        b_np = np.asarray(b, np.float64)
        if transpose_a:
            a_np = a_np.T
        if transpose_b:
            b_np = b_np.T
        if a_np.ndim != 2 or b_np.ndim != 2 or a_np.shape[1] != b_np.shape[0]:
            raise ValueError(
                f"gemm shape mismatch: {a_np.shape} x {b_np.shape}")
        r = gemm_f64(a_np, b_np, alpha=alpha, beta=beta,
                     c=None if c is None else np.asarray(c, np.float64),
                     bias=None if bias is None else np.asarray(bias),
                     epilogue=epilogue,
                     interpret=should_interpret() if interpret is None
                     else interpret)
        if out_dtype is not None and jnp.dtype(out_dtype) != jnp.float64:
            r = r.astype(jnp.dtype(out_dtype))
        return r

    a = jnp.asarray(a)
    b = jnp.asarray(b)
    ka = a.shape[0] if transpose_a else a.shape[1]
    kb = b.shape[1] if transpose_b else b.shape[0]
    if a.ndim != 2 or b.ndim != 2 or ka != kb:
        raise ValueError(f"gemm shape mismatch: {a.shape} x {b.shape} "
                         f"(transpose_a={transpose_a}, transpose_b={transpose_b})")
    M = a.shape[1] if transpose_a else a.shape[0]
    K = ka
    N = b.shape[0] if transpose_b else b.shape[1]
    in_dtype = jnp.result_type(a.dtype, b.dtype)
    a = a.astype(in_dtype)
    b = b.astype(in_dtype)
    acc_dt = jnp.dtype(acc_dtype) if acc_dtype else _acc_dtype(in_dtype)
    out_dt = jnp.dtype(out_dtype) if out_dtype else (
        jnp.dtype(in_dtype) if not jnp.issubdtype(jnp.dtype(in_dtype), jnp.integer)
        else acc_dt)
    has_c = c is not None
    if has_c:
        c = jnp.asarray(c)
        if c.shape != (M, N):
            raise ValueError(f"c shape {c.shape} != {(M, N)}")

    path = _dispatch(in_dtype)
    if path == "xla" or backend == "xla" or M == 0 or N == 0 or K == 0:
        return _gemm_xla(a, b, alpha, beta, c, bias, epilogue, acc_dt, out_dt,
                         transpose_a, transpose_b)
    interp = should_interpret() if interpret is None else interpret

    if path in ("int32", "int64"):
        # native limb-decomposed MXU kernels; exotic combos (bias/activation
        # on integers, mixed dtypes) keep the generic fallback
        native_ok = (bias is None
                     and epilogue in (None, "none")
                     and out_dt == jnp.dtype(in_dtype)
                     and acc_dt == jnp.dtype(in_dtype)
                     and (c is None or c.dtype == jnp.dtype(in_dtype)))
        if native_ok:
            at = jnp.swapaxes(a, 0, 1) if transpose_a else a
            bt = jnp.swapaxes(b, 0, 1) if transpose_b else b
            if path == "int32":
                from .int32_kernel import gemm_int32

                return gemm_int32(at, bt, alpha=alpha, beta=beta, c=c,
                                  tiles=tiles, interpret=interp)
            from .int64_kernel import gemm_int64

            return gemm_int64(at, bt, alpha=alpha, beta=beta, c=c,
                              interpret=interp)
        return _gemm_xla(a, b, alpha, beta, c, bias, epilogue, acc_dt, out_dt,
                         transpose_a, transpose_b)

    if path == "f64":
        # Ozaki-slice MXU kernel (exact-digit int8 cross products); the
        # epilogue/bias tail is a cheap f64 elementwise pass on the combined
        # result. Finite inputs only — backend="xla" keeps the IEEE-complete
        # emulated path.
        from .f64_kernel import gemm_f64

        at = jnp.swapaxes(a, 0, 1) if transpose_a else a
        bt = jnp.swapaxes(b, 0, 1) if transpose_b else b
        r = gemm_f64(at, bt, alpha=alpha, beta=beta,
                     c=c.astype(jnp.float64) if c is not None else None,
                     bias=bias, epilogue=epilogue, interpret=interp)
        if jnp.dtype(out_dt) != jnp.float64:
            r = np.asarray(r).astype(out_dt) if isinstance(r, np.ndarray) \
                else r.astype(out_dt)
        return r

    if backend is None:
        fused = epilogue is not None or bias is not None or c is not None
        is_int8 = jnp.dtype(in_dtype).itemsize == 1
        if fused or is_int8:
            # fusion beats XLA's unfused epilogue; int8 Pallas (76% of peak)
            # beats XLA int8 (48%) — both measured, docs/PERF_NOTES.md
            backend = "pallas"
        else:
            # plain float matmul: MEASURED dispatch. An autotune record for
            # this (shape, dtype, generation) — which races Pallas tile
            # configs against the XLA emitter, autotune.py — wins; with no
            # record, the measured-default prior is XLA (~94% vs ~82%
            # roofline on large square bf16, docs/PERF_NOTES.md). Run
            # autotune_gemm(M, N, K, dtype) at warmup to populate.
            from .autotune import cached_backend, cached_tiles

            backend = cached_backend(M, N, K, in_dtype) or "xla"
            if backend == "pallas" and tiles is None:
                tiles = cached_tiles(M, N, K, in_dtype)
    if backend == "xla":
        return _gemm_xla(a, b, alpha, beta, c, bias, epilogue, acc_dt, out_dt,
                         transpose_a, transpose_b)
    tiles = tiles or plan_tiles(M, N, K, in_dtype, acc_dt, has_c_input=has_c)
    fn = build_gemm(M, N, K, tiles.bm, tiles.bn, tiles.bk,
                    jnp.dtype(in_dtype).name, out_dt.name, acc_dt.name,
                    has_c, bias is not None, epilogue,
                    get_config().matmul_precision, interp,
                    tiles.vmem_limit_bytes, transpose_a, transpose_b)
    return fn(alpha, beta, a, b, c, bias)


def _gemm_xla(a, b, alpha, beta, c, bias, epilogue, acc_dt, out_dt,
              transpose_a=False, transpose_b=False):
    """Generic fallback path (analog of the scalar generic ukernel,
    gemm_ukernel_generic.nim:21-35): exact for int32/int64 (XLA integer dot
    has wraparound semantics matching the reference's mullo path) and for f64.
    """
    from .kernel import _EPILOGUES

    r = jax.lax.dot_general(a, b, (((0,) if transpose_a else (1,),
                                    (1,) if transpose_b else (0,)), ((), ())),
                            preferred_element_type=acc_dt,
                            precision=jax.lax.Precision.HIGHEST
                            if not jnp.issubdtype(acc_dt, jnp.integer) else None)
    r = r * jnp.asarray(alpha, acc_dt)
    if c is not None:
        r = r + jnp.asarray(beta, acc_dt) * c.astype(acc_dt)
    if bias is not None:
        r = r + bias.astype(acc_dt).reshape(1, -1)
    return _EPILOGUES[epilogue](r).astype(out_dt)


def gemm_strided(M: int, N: int, K: int, alpha,
                 A, rsA: int, csA: int,
                 B, rsB: int, csB: int,
                 beta,
                 C, rsC: int, csC: int,
                 **kwargs) -> jax.Array:
    """Signature-parity port of ``gemm_strided`` (gemm.nim:184-193).

    A/B/C are flat buffers (or anything array-like); rs*/cs* are row/column
    strides in elements. Returns the updated C buffer contents as an (M,N)
    array materialized in row-major order (functional semantics: the caller
    rebinds C). When beta == 0, C is never read (matching the reference's
    beta==0 epilogue specialization, gemm_ukernel_generator.nim:76-85).
    """
    a, ta = _as_operand(jnp.asarray(A), M, K, rsA, csA)
    b, tb = _as_operand(jnp.asarray(B), K, N, rsB, csB)
    kwargs.setdefault("transpose_a", ta)
    kwargs.setdefault("transpose_b", tb)
    beta_is_zero = isinstance(beta, (int, float)) and beta == 0
    c = None
    if not beta_is_zero:
        if C is None:
            raise ValueError("gemm_strided: beta != 0 requires a C buffer to read")
        c = TensorView.matrix(jnp.asarray(C), M, N, rsC, csC).materialize()
    return gemm(a, b, alpha=alpha, beta=beta, c=c, **kwargs)


def _as_operand(buf, rows, cols, rs, cs):
    """View a flat buffer as a (rows, cols) operand without copying when the
    layout is row-major OR col-major (the latter handed to the kernel as an
    in-place transposed contraction); everything else materializes (the
    packing analog)."""
    v = TensorView.matrix(buf, rows, cols, rs, cs)
    flat = v.buffer
    if v.offset == 0 and rows * cols == flat.size:
        if rs == cols and cs == 1:  # row-major
            return flat.reshape(rows, cols), False
        if rs == 1 and cs == rows:  # col-major == transposed row-major
            return flat.reshape(cols, rows), True
    return v.materialize(), False
