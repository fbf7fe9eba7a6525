"""Probe: can reduce_sum reach >=1.0x jnp.sum by deleting the per-block
partial write?

The shipped map_reduce (ops/foreach.py) writes an (8, width) partial per
grid block to HBM and combines them in a second pass: at br=128 that is
8/128 = 6.25% extra write traffic + a small second-pass read, and the
committed record shows 700.6 GB/s = 0.956x jnp.sum (docs/BENCH_ROUND3.json).

Variant raced here: keep the output BlockSpec constant across grid steps
(index map (0,0)) so Mosaic keeps ONE (8, width) accumulator resident in
VMEM, add each block's pairwise-tree partial into it in grid order, and
flush once at the end. Still deterministic (fixed order: chain across
blocks of in-block pairwise trees); zero partial traffic.

Run: python tools/reduce_scratch_probe.py   (from repo root, TPU backend)
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import laser_tpu as lt
from laser_tpu.bench.harness import chain_rate
from laser_tpu.utils import cdiv


def make_scratch_reduce(rows, width, br, fold="reshape"):
    nblocks = cdiv(rows, br)

    def kernel(x_ref, out_ref):
        i = pl.program_id(0)
        m = x_ref[:].astype(jnp.float32)
        if fold == "reshape":
            m = m.reshape(br // 8, 8, width)
            while m.shape[0] > 1:
                h = m.shape[0] // 2
                m = m[:h] + m[h:]
            lanes = m[0]
        else:  # slice fold straight on the (br, width) block
            while m.shape[0] > 8:
                h = m.shape[0] // 2
                m = m[:h] + m[h:]
            lanes = m

        @pl.when(i == 0)
        def _():
            out_ref[...] = lanes

        @pl.when(i > 0)
        def _():
            out_ref[...] += lanes

    call = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((br, width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, width), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, width), jnp.float32),
    )

    def f(x):
        v = call(x).reshape(-1)
        while v.shape[0] > 1:
            h = v.shape[0] // 2
            v = v[:h] + v[h:]
        return v[0]

    return f


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8192, 8192), jnp.float32)
    nbytes = 4 * x.size

    # correctness first
    want = float(np.asarray(x, np.float64).sum())
    for fold in ("reshape", "slice"):
        for br in (64, 128):
            got = float(make_scratch_reduce(8192, 8192, br, fold)(x))
            rel = abs(got - want) / abs(want)
            assert rel < 1e-4, (fold, br, got, want)
    print("correctness ok")

    t_drift = chain_rate(jax.jit(lambda v: v + jnp.float32(1e-30)), x)
    rows = []

    def row(name, fn):
        t = max(chain_rate(fn, x) - t_drift, 1e-6)
        rows.append((name, nbytes / t / 1e6))
        print(f"{name:28s} {nbytes / t / 1e6:7.1f} GB/s")

    row("xla_jnp_sum", jax.jit(lambda v: v + jnp.sum(v) * 1e-30))
    row("shipped_map_reduce", lambda v: v + lt.reduce_sum(v) * 1e-30)
    for fold in ("reshape", "slice"):
        for br in (64, 128, 256):
            try:
                f = make_scratch_reduce(8192, 8192, br, fold)
                row(f"scratch_{fold}_br{br}",
                    lambda v, f=f: v + f(v) * 1e-30)
            except Exception as e:  # VMEM OOM at large br is expected
                print(f"scratch_{fold}_br{br}: {type(e).__name__}: "
                      f"{str(e)[:100]}")


if __name__ == "__main__":
    main()
