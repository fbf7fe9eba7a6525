"""exp accurate-tier core experiments (VERDICT r2 weak #8).

The shipped accurate core (vector_math._exp_expr: Cody-Waite + degree-5
Horner + two-factor exponent stuffing, ~20 VPU ops/elem) records ~510 GB/s
= 0.81x the fast tier's 630. Candidates raced here, all holding the <=1e-6
bar on [-87, 88]:

  horner5_2s   the shipped core (baseline)
  estrin5_2s   same polynomial, Estrin pairing (shorter dependency chain,
               ~2 extra muls -> wins only if the VPU is latency-bound)
  horner5_1s   single-factor exponent stuffing: saves ~5 ops; 2^n is built
               in ONE bitcast so results below 2^-126 (x in [-87.34, -87.0))
               flush to 0 a window earlier than the two-factor core. The
               documented FTZ semantics already accept flush-to-zero below
               x ~ -87.3 (test_vector_math.py:30-41).
  estrin5_1s   both of the above
  mux8_deg3    the "register-resident table" idea at its cheapest: n =
               round(x*8/ln2), e^x = 2^(n>>3) * 2^((n&7)/8) * P3(r) with the
               8-entry 2^(j/8) table as 3 multiplicative vselects. Fewer
               polynomial FMAs, more selects/bit ops.

Accuracy is checked on-host vs f64; timing is the 256MB donate=True fused
stream, the bench.py vector_math methodology. Results land in
docs/PERF_NOTES.md; the winner (if any) replaces _exp_expr.

Usage: PYTHONPATH=. python tools/exp_core_probe.py
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

import laser_tpu as lt
from laser_tpu.bench.harness import chain_rate
from laser_tpu.ops.foreach import for_each
from laser_tpu.ops.vector_math import (_EXP_P, _LN2_HI, _LN2_LO, _LOG2E,
                                       EXP_MAX, EXP_MIN, _exp_expr)

_LN2_8_HI = np.float32(0.693359375 / 8)  # ln2/8 Cody-Waite split (exact /8)
_LN2_8_LO = np.float32(-2.12194440e-4 / 8)
# least-squares degree-3 for e^r on |r| <= ln2/16 (tools fit, 4.2e-8)
_D3 = tuple(np.float32(v) for v in (0.16667883, 0.50005586))

_TWO18 = np.float32(2 ** 0.125)
_TWO14 = np.float32(2 ** 0.25)
_TWO12 = np.float32(2 ** 0.5)


def _estrin_p(r):
    c0, c1, c2, c3, c4, c5 = _EXP_P
    r2 = r * r
    r4 = r2 * r2
    return (c0 * r + c1) * r4 + ((c2 * r + c3) * r2 + (c4 * r + c5))


def _stuff2(p, n):
    ni = n.astype(jnp.int32)
    nh = jnp.right_shift(ni, 1)
    s1 = jax.lax.bitcast_convert_type(
        jnp.left_shift(nh + 127, 23), jnp.float32)
    s2 = jax.lax.bitcast_convert_type(
        jnp.left_shift(ni - nh + 127, 23), jnp.float32)
    return (p * s1) * s2


def _stuff1(p, n):
    ni = n.astype(jnp.int32)
    s = jax.lax.bitcast_convert_type(
        jnp.left_shift(jnp.maximum(ni + 127, 0), 23), jnp.float32)
    return p * s


def _core(poly, stuff):
    def expr(x):
        xc = jnp.clip(x.astype(jnp.float32), EXP_MIN, EXP_MAX)
        n = jnp.round(xc * _LOG2E)
        r = xc - n * _LN2_HI
        r = r - n * _LN2_LO
        p = poly(r)
        p = p * (r * r) + r + jnp.float32(1.0)
        return stuff(p, n).astype(x.dtype)
    return expr


def _horner_p(r):
    p = _EXP_P[0]
    for coef in _EXP_P[1:]:
        p = p * r + coef
    return p


def _mux8_expr(x):
    xc = jnp.clip(x.astype(jnp.float32), EXP_MIN, EXP_MAX)
    n = jnp.round(xc * jnp.float32(8 * _LOG2E))
    r = xc - n * _LN2_8_HI
    r = r - n * _LN2_8_LO
    d0, d1 = _D3
    p = (d0 * r + d1) * (r * r) + r + jnp.float32(1.0)
    ni = n.astype(jnp.int32)
    e = jnp.right_shift(ni, 3)
    j = jnp.bitwise_and(ni, 7)
    one = jnp.float32(1.0)
    t = jnp.where(jnp.bitwise_and(j, 1) != 0, _TWO18, one)
    t = t * jnp.where(jnp.bitwise_and(j, 2) != 0, _TWO14, one)
    t = t * jnp.where(jnp.bitwise_and(j, 4) != 0, _TWO12, one)
    s = jax.lax.bitcast_convert_type(
        jnp.left_shift(jnp.maximum(e + 127, 0), 23), jnp.float32)
    return ((p * t) * s).astype(x.dtype)


VARIANTS = {
    "horner5_2s": _exp_expr,
    "estrin5_2s": _core(_estrin_p, _stuff2),
    "horner5_1s": _core(_horner_p, _stuff1),
    "estrin5_1s": _core(_estrin_p, _stuff1),
    "mux8_deg3": _mux8_expr,
}


def accuracy(expr) -> dict:
    x = np.linspace(-87.0, 88.0, 400_001).astype(np.float32)
    got = np.asarray(jax.jit(expr)(jnp.asarray(x)), np.float64)
    want = np.exp(x.astype(np.float64))
    rel = np.abs(got - want) / want
    # FTZ window: ignore where true value is subnormal-adjacent (< 2^-125)
    mask = want > 2.0 ** -125
    return {"max_rel": float(rel[mask].max()),
            "max_rel_x": float(x[mask][rel[mask].argmax()])}


def speed(expr) -> dict:
    x = jnp.asarray(np.random.RandomState(0).rand(8192, 8192) * 2 - 1,
                    jnp.float32)
    nbytes = 2 * 4 * x.size
    ms = chain_rate(lambda v: for_each(expr, v, donate=True), x)
    return {"ms": round(ms, 3),
            "GBps": round(nbytes / (ms * 1e-3) / 1e9, 1)}


if __name__ == "__main__":
    # comparators
    x = jnp.asarray(np.random.RandomState(0).rand(8192, 8192) * 2 - 1,
                    jnp.float32)
    ms = chain_rate(lambda v: lt.exp(v, algorithm="fast", donate=True), x)
    print(json.dumps({"variant": "fast_tier", "ms": round(ms, 3),
                      "GBps": round(2 * 4 * x.size / (ms * 1e-3) / 1e9, 1)}),
          flush=True)
    for name, expr in VARIANTS.items():
        row = {"variant": name}
        row.update(accuracy(expr))
        row.update(speed(expr))
        print(json.dumps(row), flush=True)
