"""Benchmark harness: warmup + RunningStat + analytic roofline accounting.

Rebuild of the reference's benchmark pattern, used identically in every
bench file (gemm_bench_float32.nim:8-40): ``warmup()`` spin, per-sample
timing into a RunningStat (mean/stddev/min/max), GFLOP/s computed from
analytic op counts (gemm_common.nim:20-31, conv2d_common.nim:47-101), and a
"% of theoretical peak" printout (gemm_bench_float32.nim:64-65, 335-339).
On TPU the peaks come from the device_info generation table: MXU TFLOP/s for
compute-bound kernels, HBM GB/s for memory-bound ones.
"""

from __future__ import annotations

import dataclasses
import itertools
import math
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..device_info import detect


class RunningStat:
    """Welford mean/variance + min/max (the std RunningStat the reference
    takes from Nim's stats module)."""

    def __init__(self):
        self.n = 0
        self._mean = 0.0
        self._m2 = 0.0
        self.min = math.inf
        self.max = -math.inf

    def push(self, x: float):
        self.n += 1
        d = x - self._mean
        self._mean += d / self.n
        self._m2 += d * (x - self._mean)
        self.min = min(self.min, x)
        self.max = max(self.max, x)

    @property
    def mean(self) -> float:
        return self._mean

    @property
    def std(self) -> float:
        return math.sqrt(self._m2 / self.n) if self.n > 1 else 0.0


@dataclasses.dataclass
class BenchResult:
    name: str
    mean_ms: float
    min_ms: float
    max_ms: float
    std_ms: float
    reps: int
    flops: Optional[int] = None
    bytes_moved: Optional[int] = None

    @property
    def gflops(self) -> Optional[float]:
        # Rates use the min time: the least-perturbed sample, the same
        # convention the reference's result blocks quote for peak numbers.
        return self.flops / (self.min_ms * 1e6) if self.flops else None

    @property
    def gbps(self) -> Optional[float]:
        return self.bytes_moved / (self.min_ms * 1e6) if self.bytes_moved else None

    def as_dict(self) -> dict:
        d = dataclasses.asdict(self)
        if self.gflops is not None:
            d["gflops"] = round(self.gflops, 2)
        if self.gbps is not None:
            d["gbps"] = round(self.gbps, 2)
        return d


def bench_fn(name: str, fn: Callable, *args, warmup: int = 2, reps: int = 10,
             flops: Optional[int] = None, bytes_moved: Optional[int] = None
             ) -> BenchResult:
    """Time ``fn(*args)`` with device-synchronized samples.

    fn must return jax arrays (or pytrees thereof); we block on them, which
    is the TPU analog of the reference printing output[0] to defeat DCE.
    """
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    stat = RunningStat()
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        stat.push((time.perf_counter() - t0) * 1e3)
    return BenchResult(name, stat.mean, stat.min, stat.max, stat.std, reps,
                       flops, bytes_moved)


def gemm_flops(M: int, N: int, K: int) -> int:
    """(reference: gemm_common.nim:20-31)"""
    return 2 * M * N * K


# ---------------------------------------------------------------------------
# Device-loop (chained) timing
#
# Host-side timing of single dispatches is unusable on a tunneled/remote TPU:
# (a) per-call round trips cost ~20-40 ms with high jitter, and (b) the
# runtime may memoize executions of an identical (executable, args) pair, so
# repeated same-input calls report physically impossible rates. The robust
# scheme — the TPU analog of the reference's warmup+RunningStat loop
# (gemm_bench_float32.nim:8-40) under these constraints — is:
#   * put the repetition loop ON DEVICE (lax.fori_loop inside one jit),
#   * make every iteration DATA-DEPENDENT on the previous one (the output
#     feeds the next input) so nothing can be hoisted or cached,
#   * perturb the initial input per measurement so no two dispatches are
#     identical,
#   * size the loop so total runtime >= ~1 s, making the fixed round-trip
#     overhead <3%.
# ---------------------------------------------------------------------------

_UNIQ = itertools.count(1)


def _perturb(x0: jax.Array) -> jax.Array:
    eps = jnp.asarray(next(_UNIQ) * 1e-6, x0.dtype) if jnp.issubdtype(
        x0.dtype, jnp.floating) else jnp.asarray(next(_UNIQ) % 7, x0.dtype)
    return (x0 + eps).block_until_ready()


def chain_rate(step_fn: Callable, x0: jax.Array, *extra,
               target_seconds: float = 1.0, trials: int = 2,
               pilot_reps: int = 64, max_reps: int = 200_000) -> float:
    """Milliseconds per iteration of ``x = step_fn(x, *extra)``.

    step_fn must map x -> array of the same shape/dtype (the dependency
    chain). Returns the min over ``trials`` full measurements.

    An optimization_barrier separates iterations: XLA is otherwise free to
    fuse consecutive elementwise iterations into one register-resident loop
    (measured >4x HBM bandwidth — great compiler work, but it no longer
    measures the per-call kernel the user would run).
    """

    def make_loop(reps):
        @jax.jit
        def loop(x, *e):
            def body(i, x):
                return jax.lax.optimization_barrier(step_fn(x, *e))
            return jax.lax.fori_loop(0, reps, body, x)
        return loop

    def run(loop, x):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(loop(x, *extra)[(0,) * x0.ndim]))
        return time.perf_counter() - t0

    pilot = make_loop(pilot_reps)
    run(pilot, _perturb(x0))  # compile
    t_est = run(pilot, _perturb(x0)) / pilot_reps
    reps = int(min(max(pilot_reps, target_seconds / max(t_est, 1e-9)), max_reps))
    loop = make_loop(reps)
    run(loop, _perturb(x0))  # compile
    best = min(run(loop, _perturb(x0)) for _ in range(trials))
    return best / reps * 1e3


def chain_result(name: str, step_fn: Callable, x0: jax.Array, *extra,
                 flops: Optional[int] = None, bytes_moved: Optional[int] = None,
                 **kw) -> BenchResult:
    ms = chain_rate(step_fn, x0, *extra, **kw)
    return BenchResult(name, ms, ms, ms, 0.0, 1, flops, bytes_moved)


def roofline_report(result: BenchResult, dtype, *, bound: str = "compute") -> dict:
    """Attach %-of-peak numbers (the reference's 'Theoretical peak' lines)."""
    spec = detect()
    out = result.as_dict()
    out["device"] = spec.generation
    if bound == "compute" and result.gflops:
        peak = spec.matmul_peak_tflops(dtype) * 1e3
        out["peak_gflops"] = peak
        out["pct_peak"] = round(100.0 * result.gflops / peak, 2)
    elif bound == "memory" and result.gbps:
        out["peak_gbps"] = spec.hbm_gbps
        out["pct_peak"] = round(100.0 * result.gbps / spec.hbm_gbps, 2)
    return out
