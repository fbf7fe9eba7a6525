"""Iterative 2D stencil solvers: Jacobi and red-black Gauss-Seidel.

Rebuild of the reference's gauss_seidel benchmark
(benchmarks/gauss_seidel/gauss_seidel.nim:1-60: serial / OpenMP-parallel /
tiled-parallel wavefront sweeps). The classic Gauss-Seidel dependency chain
(each cell needs the freshly-updated left/up neighbors) is hostile to both
SIMD and TPUs; the standard parallel reformulations are:

  * Jacobi: update from the previous iterate only — embarrassingly parallel;
  * red-black Gauss-Seidel: checkerboard coloring, two half-sweeps per
    iteration, same convergence class as wavefront Gauss-Seidel.

TPU-native twist: for grids that fit VMEM, ``ITERS`` sweeps run inside ONE
Pallas kernel with the grid resident on-chip — zero HBM traffic between
sweeps (measured on v5e: loop-resident arrays stream at ~6x HBM rate).
That is the accelerator analog of the reference's cache-tiled wavefront.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import should_interpret
from ..device_info import vmem_budget_bytes
from ..registry import build_cache


def _neighbor_sum(u):
    """Sum of 4-neighbors for interior cells, zeros outside (non-wrapping)."""
    up = jnp.pad(u[:-1, :], ((1, 0), (0, 0)))
    down = jnp.pad(u[1:, :], ((0, 1), (0, 0)))
    left = jnp.pad(u[:, :-1], ((0, 0), (1, 0)))
    right = jnp.pad(u[:, 1:], ((0, 0), (0, 1)))
    return up + down + left + right


def _interior_mask(shape):
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return (r > 0) & (r < shape[0] - 1) & (c > 0) & (c < shape[1] - 1)


def _checkerboard(shape):
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return (r + c) % 2 == 0


@build_cache
def _build_sweeps(rows: int, cols: int, iters: int, method: str, dtype: str,
                  interpret: bool):
    dt = jnp.dtype(dtype)

    def kernel(u_ref, f_ref, o_ref):
        interior = _interior_mask((rows, cols))
        red = _checkerboard((rows, cols))
        f = f_ref[:]

        def jacobi(_, u):
            new = 0.25 * (_neighbor_sum(u) - f)
            return jnp.where(interior, new, u)

        def redblack(_, u):
            new = 0.25 * (_neighbor_sum(u) - f)
            u = jnp.where(interior & red, new, u)
            new = 0.25 * (_neighbor_sum(u) - f)
            return jnp.where(interior & ~red, new, u)

        body = jacobi if method == "jacobi" else redblack
        o_ref[:] = jax.lax.fori_loop(0, iters, body, u_ref[:]).astype(dt)

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, cols), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def _xla_sweeps(u, f, iters, method):
    interior = _interior_mask(u.shape)
    red = _checkerboard(u.shape)

    def jacobi(_, u):
        return jnp.where(interior, 0.25 * (_neighbor_sum(u) - f), u)

    def redblack(_, u):
        u = jnp.where(interior & red, 0.25 * (_neighbor_sum(u) - f), u)
        return jnp.where(interior & ~red, 0.25 * (_neighbor_sum(u) - f), u)

    return jax.lax.fori_loop(0, iters, jacobi if method == "jacobi" else
                             redblack, u)


def stencil_solve(u: jax.Array, f: Optional[jax.Array] = None, *,
                  iters: int = 1, method: str = "redblack",
                  interpret: Optional[bool] = None) -> jax.Array:
    """Run ``iters`` sweeps of the 5-point Poisson stencil
    u[i,j] <- (u[i-1,j]+u[i+1,j]+u[i,j-1]+u[i,j+1] - f[i,j]) / 4
    with Dirichlet boundaries (edge cells fixed).

    method: "jacobi" | "redblack" (Gauss-Seidel-class convergence).
    Grids that fit in VMEM run fully on-chip in one kernel.
    """
    if method not in ("jacobi", "redblack"):
        raise ValueError(f"unknown stencil method {method!r}")
    u = jnp.asarray(u)
    if u.ndim != 2:
        raise ValueError("stencil_solve expects a 2D grid")
    f = jnp.zeros_like(u) if f is None else jnp.asarray(f).astype(u.dtype)
    interp = should_interpret() if interpret is None else interpret
    rows, cols = u.shape
    # ~10 same-size temporaries live during a sweep; stay well under budget.
    if 10 * u.size * u.dtype.itemsize <= vmem_budget_bytes() and not interp:
        call = _build_sweeps(rows, cols, int(iters), method,
                             jnp.dtype(u.dtype).name, interp)
        return call(u, f)
    if interp:
        call = _build_sweeps(rows, cols, int(iters), method,
                             jnp.dtype(u.dtype).name, interp)
        return call(u, f)
    return _xla_sweeps(u, f, int(iters), method)
