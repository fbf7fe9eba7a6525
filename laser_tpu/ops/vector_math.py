"""VPU vector math: exp / log / tanh / sigmoid / softmax.

Rebuild of the reference's SIMD math layer
(laser/primitives/simd_math/exp_log_{common,fallback,sse2,avx2,avx512}.nim).
The reference computes expf by range reduction on a 2^(1/1024) grid + a
1024-entry mantissa LUT + IEEE754 exponent stuffing (exp_log_common.nim:26-46)
— on the TPU VPU per-lane gathers are expensive, so we keep the *same
structure* (range reduce -> cheap core approx -> exponent stuffing via bit
ops) but replace the LUT with a polynomial core evaluated in registers, which
is the speed-of-light formulation for a 8x128-lane vector unit. Accuracy is
validated against float64 references at <= 1e-6 relative error over the full
clamp range including the ±88 boundaries (the bar set by SURVEY §6 / the
reference's LUT algorithm error of ~6e-8).

The clamp constants ExpMin/ExpMax = ±88 mirror exp_log_common.nim:35-36; the
NaN/±inf handling mirrors the AVX2 fast_clamp semantics
(exp_log_avx2.nim:29-47: +inf -> expMax -> huge, -inf -> expMin -> ~0,
NaN propagates).

log/tanh/sigmoid/softmax are the reference's declared in-development set
(README.md:170-181) — implemented here, softmax as ONE fused kernel
(max-reduce + exp + sum-reduce + normalize) built on the same machinery.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import should_interpret
from ..utils import cdiv, round_step_up
from .foreach import LANES, for_each

# Clamp range (reference: exp_log_common.nim:35-36).
EXP_MAX = 88.0
EXP_MIN = -88.0

_LOG2E = 1.4426950408889634
# Cody-Waite split of ln2 in f32: hi has ~12 trailing zero bits so n*hi is exact.
_LN2_HI = np.float32(0.693359375)
_LN2_LO = np.float32(-2.12194440e-4)


# Classic expf minimax coefficients (cephes-family degree-5 Remez fit for
# (e^r - 1 - r)/r^2 on |r| <= ln2/2; public-domain constants).
_EXP_P = tuple(np.float32(v) for v in (
    1.9875691500e-4, 1.3981999507e-3, 8.3334519073e-3,
    4.1665795894e-2, 1.6666665459e-1, 5.0000001201e-1))


def _exp_expr(x):
    """expf core: n = round(x*log2e); r = x - n*ln2 (two-step Cody-Waite);
    (1 + r + r^2*P(r)) * 2^n with 2^n built by SINGLE-factor exponent
    stuffing. Measured max rel err 7.9e-8 vs f64 libm over ±88.

    Single vs two-factor stuffing (tools/exp_core_probe.py, v5e, 256MB
    donated stream): 538.6 vs 509.1 GB/s — and the representable behavior
    is identical under the VPU's flush-to-zero: the single factor yields 0
    exactly when p < 1 with n = -126, i.e. x < ln(2^-126) = -87.3365, which
    is precisely where the true result goes subnormal and the two-factor
    product (p*s1)*s2 gets flushed anyway. (On CPU/interpret runs the
    two-factor core produced gradual subnormals in that last 0.3-wide
    window; the documented semantics — FTZ below x ~ -87.3,
    test_vector_math.py:30-41 — never relied on them.) Estrin pairing of
    the same polynomial measured SLOWER (487.9: the VPU stream is
    throughput-bound, not latency-bound) and an 8-entry mux-table
    quarter-octave reduction landed between (523.5) — both recorded in
    docs/PERF_NOTES.md."""
    orig_dt = x.dtype
    dt = jnp.float32  # core always runs in f32, matching the reference kernels
    x = x.astype(dt)
    xc = jnp.clip(x, EXP_MIN, EXP_MAX)  # propagates NaN: clip(NaN)=NaN
    n = jnp.round(xc * _LOG2E)
    r = xc - n * _LN2_HI
    r = r - n * _LN2_LO
    p = _EXP_P[0]
    for coef in _EXP_P[1:]:
        p = p * r + coef
    p = p * (r * r) + r + jnp.asarray(1.0, dt)
    ni = n.astype(jnp.int32)
    s = jax.lax.bitcast_convert_type(
        jnp.left_shift(jnp.maximum(ni + 127, 0), 23), jnp.float32)
    return (p * s).astype(orig_dt)


_SQRT2_OVER_2 = np.float32(0.7071067811865476)
# musl logf polynomial coefficients (public-domain constants of the classic
# Remez fit for log1p on [sqrt(2)/2-1, sqrt(2)-1]).
_LG1 = np.float32(0.66666662693)
_LG2 = np.float32(0.40000972152)
_LG3 = np.float32(0.28498786688)
_LG4 = np.float32(0.24279078841)


def _log_expr(x):
    """logf by bitfield range reduction to m in [sqrt(1/2), sqrt(2)) and the
    classic atanh-form core: s = f/(2+f), log(1+f) = f - f^2/2 + s*(f^2/2 + R)
    with R a Remez polynomial in s^2 (the musl-family formulation)."""
    xf = x.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(xf, jnp.int32)
    # Re-center exponent so the mantissa lands in [sqrt(1/2), sqrt(2)):
    # 0x3f3504f3 is the bit pattern of sqrt(2)/2.
    shifted = bits + (jnp.int32(0x3F800000) - jnp.int32(0x3F3504F3))
    k = (jnp.right_shift(shifted, 23) - 127).astype(jnp.float32)
    mant_bits = jnp.bitwise_and(shifted, 0x007FFFFF) + jnp.int32(0x3F3504F3)
    m = jax.lax.bitcast_convert_type(mant_bits, jnp.float32)
    f = m - jnp.float32(1.0)
    s = f / (jnp.float32(2.0) + f)
    z = s * s
    w = z * z
    t1 = w * (_LG2 + w * _LG4)
    t2 = z * (_LG1 + w * _LG3)
    r = t2 + t1
    hfsq = jnp.float32(0.5) * f * f
    res = k * _LN2_HI + (s * (hfsq + r) + k * _LN2_LO + f - hfsq)
    # Specials: x<=0 -> -inf at 0, NaN below; +inf -> +inf; NaN -> NaN.
    res = jnp.where(xf == 0, -jnp.inf, res)
    res = jnp.where(xf < 0, jnp.nan, res)
    res = jnp.where(jnp.isinf(xf) & (xf > 0), jnp.inf, res)
    res = jnp.where(jnp.isnan(xf), jnp.nan, res)
    return res.astype(x.dtype)


def _tanh_expr(x):
    """tanh via the exp core: sign(x) * (1 - 2/(e^{2|x|}+1)); exact saturation
    past 20 where f32 tanh == ±1."""
    a = jnp.abs(x)
    e = _exp_expr(jnp.minimum(jnp.asarray(2.0, x.dtype) * a, 40.0))
    t = 1.0 - 2.0 / (e + 1.0)
    return (jnp.sign(x) * t).astype(x.dtype)


def _sigmoid_expr(x):
    """Numerically-stable logistic on top of the exp core."""
    e = _exp_expr(-jnp.abs(x))
    pos = 1.0 / (1.0 + e)
    return jnp.where(x >= 0, pos, 1.0 - pos).astype(x.dtype)


# Two algorithm tiers, mirroring the accuracy/speed axis the reference
# benchmarks explicitly (accurate LUT kernel vs Schraudolph approximation,
# bench_exp_avx2.nim results):
#   "accurate": our polynomial cores, <=1e-6 of f64 libm (the parity bar);
#   "fast":     the VPU's hardware transcendental approximations via the
#               jnp op inside the same fused kernel (measured ~1e-5..4e-5
#               abs/rel error on v5e — faster, HBM-bound).
_ALGO_EXPRS = {
    "exp": {"accurate": _exp_expr, "fast": jnp.exp},
    "log": {"accurate": _log_expr, "fast": jnp.log},
    "tanh": {"accurate": _tanh_expr, "fast": jnp.tanh},
    "sigmoid": {"accurate": _sigmoid_expr, "fast": jax.nn.sigmoid},
}


def _pick(name: str, algorithm: Optional[str]):
    from ..config import get_config

    algo = algorithm or getattr(get_config(), "vector_math_algorithm", "accurate")
    try:
        return _ALGO_EXPRS[name][algo]
    except KeyError:
        raise ValueError(f"{name}: unknown algorithm {algo!r} "
                         f"(want 'accurate' or 'fast')") from None


def exp(x, *, algorithm: Optional[str] = None, donate: bool = False,
        interpret: Optional[bool] = None) -> jax.Array:
    """Elementwise expf (reference: exp_log_avx2.nim AVX2 prod kernel).

    ``donate=True`` reuses x's buffer for the output (2x HBM bandwidth; x
    must not be used afterwards) — same for log/tanh/sigmoid below."""
    return for_each(_pick("exp", algorithm), x, interpret=interpret,
                    donate=donate)


def log(x, *, algorithm: Optional[str] = None, donate: bool = False,
        interpret: Optional[bool] = None) -> jax.Array:
    return for_each(_pick("log", algorithm), x, interpret=interpret,
                    pad_value=1, donate=donate)


def tanh(x, *, algorithm: Optional[str] = None, donate: bool = False,
         interpret: Optional[bool] = None) -> jax.Array:
    return for_each(_pick("tanh", algorithm), x, interpret=interpret,
                    donate=donate)


def sigmoid(x, *, algorithm: Optional[str] = None, donate: bool = False,
            interpret: Optional[bool] = None) -> jax.Array:
    return for_each(_pick("sigmoid", algorithm), x, interpret=interpret,
                    donate=donate)


def _softmax_online(x2, rows: int, cols: int, interp: bool) -> jax.Array:
    """Blockwise (online) row softmax for rows that overflow VMEM.

    The flash-attention statistics trick applied to a bare softmax: stream
    the row in column blocks keeping running (m, l); a second sweep over the
    same blocks emits exp(x - m)/l. One kernel, grid (rows, 2*ncols): the
    phase flag is just the column-step index. Column tails are masked
    in-kernel (no padded copy of a multi-GB array); row tails (rows % 8)
    pay one pad copy — rare and cheap relative to the stream.
    """
    dt = x2.dtype
    rp = round_step_up(rows, 8)
    if rp != rows:
        x2 = jnp.pad(x2, ((0, rp - rows), (0, 0)), constant_values=-np.inf)
    bc = 64 * 1024  # 8 rows x 64k lanes x 4B = 2MB per block
    bc = min(bc, round_step_up(cols, LANES))
    nc = cdiv(cols, bc)
    cpad = nc * bc != cols  # last block reads past the row edge
    br = 8

    def kernel(x_ref, o_ref, m_ref, l_ref):
        k = pl.program_id(1)
        j = k % nc

        @pl.when(k == 0)
        def _init():
            m_ref[:] = jnp.full_like(m_ref, -np.inf)
            l_ref[:] = jnp.zeros_like(l_ref)

        v = x_ref[:].astype(jnp.float32)
        if cpad:
            cpos = j * bc + jax.lax.broadcasted_iota(jnp.int32, (br, bc), 1)
            v = jnp.where(cpos < cols, v, -np.inf)

        @pl.when(k < nc)
        def _accumulate():
            m_prev = m_ref[:]
            m_cur = jnp.max(v, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
            msafe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
            corr = jnp.where(jnp.isfinite(m_prev), _exp_expr(m_prev - msafe), 0.0)
            e = _exp_expr(v - msafe[:, :1])
            e = jnp.where(v == -jnp.inf, 0.0, e)
            l_ref[:] = l_ref[:] * corr + jnp.broadcast_to(
                jnp.sum(e, axis=-1, keepdims=True), corr.shape)
            m_ref[:] = m_new

        @pl.when(k >= nc)
        def _emit():
            msafe = jnp.where(jnp.isfinite(m_ref[:, :1]), m_ref[:, :1], 0.0)
            e = _exp_expr(v - msafe)
            e = jnp.where(v == -jnp.inf, 0.0, e)
            lsafe = jnp.where(l_ref[:, :1] > 0, l_ref[:, :1], 1.0)
            o_ref[:] = (e / lsafe).astype(dt)

    out = pl.pallas_call(
        kernel,
        grid=(rp // br, 2 * nc),
        in_specs=[pl.BlockSpec((br, bc), lambda i, k: (i, k % nc),
                               memory_space=pltpu.VMEM)],
        # during the accumulate phase every step maps to out block (i, 0);
        # its garbage content is overwritten by the first emit step (k == nc)
        out_specs=pl.BlockSpec(
            (br, bc), lambda i, k: (i, jnp.maximum(k - nc, 0)),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, cols), dt),
        scratch_shapes=[pltpu.VMEM((br, LANES), jnp.float32),
                        pltpu.VMEM((br, LANES), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interp,
    )(x2)
    return out[:rows, :cols]


def softmax(x, *, axis: int = -1, donate: bool = False,
            interpret: Optional[bool] = None) -> jax.Array:
    """Fused row softmax: ONE kernel doing max-reduce, exp, sum-reduce, scale.

    Rows live fully in VMEM (tiled over the leading dims); padded tail columns
    are driven to -inf so they contribute exp(-inf)=0 to the row sum.
    """
    x = jnp.asarray(x)
    if axis != -1 and axis != x.ndim - 1:
        x = jnp.moveaxis(x, axis, -1)
    orig_shape = x.shape
    cols = orig_shape[-1]
    rows = int(np.prod(orig_shape[:-1])) if len(orig_shape) > 1 else 1
    x2 = x.reshape(rows, cols)

    cp = round_step_up(cols, LANES)
    rp = round_step_up(rows, 8)
    # Rows too large for a single VMEM block stream through the blockwise
    # online-softmax kernel instead (two reads + one write, vs XLA's
    # three-pass reduce/exp-sum/divide).
    from ..device_info import vmem_budget_bytes

    interp_early = should_interpret() if interpret is None else interpret
    # Single-block footprint: (in + out) x double-buffer x f32 temps measures
    # ~32 bytes per lane-element at br=8 (scoped-vmem report on v5e).
    if 8 * cp * 32 > vmem_budget_bytes():
        out = _softmax_online(x2, rows, cols, interp_early)
        out = out.reshape(orig_shape)
        if axis != -1 and axis != len(orig_shape) - 1:
            out = jnp.moveaxis(out, -1, axis)
        return out
    if (rp, cp) != (rows, cols):
        x2 = jnp.pad(x2, ((0, rp - rows), (0, cp - cols)),
                     constant_values=-np.inf)

    # Row block: keep block bytes ~2MB.
    br = max(8, min(rp, (2 * 1024 * 1024 // 4) // cp))
    br = max(8, (br // 8) * 8)
    interp = should_interpret() if interpret is None else interpret
    # Alias in->out when the input is our own padded temp (always safe) or
    # the caller donated x: out-of-place HBM streams run at half bandwidth.
    alias = {0: 0} if ((rp, cp) != (rows, cols) or donate) else {}

    def kernel(x_ref, o_ref):
        v = x_ref[:]
        m = jnp.max(v, axis=-1, keepdims=True)
        # Guard all--inf (fully padded) rows: exp(-inf - -inf) would be NaN.
        m = jnp.where(jnp.isfinite(m), m, 0.0)
        e = _exp_expr(v - m)
        e = jnp.where(v == -jnp.inf, 0.0, e)  # exact zero for padded columns
        s = jnp.sum(e, axis=-1, keepdims=True)
        o_ref[:] = (e / s).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(cdiv(rp, br),),
        in_specs=[pl.BlockSpec((br, cp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((br, cp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, cp), x2.dtype),
        input_output_aliases=alias,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interp,
    )(x2)
    if (rp, cp) != (rows, cols):
        out = out[:rows, :cols]
    out = out.reshape(orig_shape)
    if axis != -1 and axis != len(orig_shape) - 1:
        out = jnp.moveaxis(out, -1, axis)
    return out
