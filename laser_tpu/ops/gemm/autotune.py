"""GEMM tile autotuner.

The reference fixes its blocking analytically from cache sizes
(partitionMNK, gemm_tiling.nim:276-310) because CPU cache behavior is
predictable; on TPU the Mosaic pipeline depth / DMA overlap interaction is
not, so we keep the analytic plan as the prior (tiling.plan_tiles) and sweep
a small neighborhood on-device — the "config autotune sweep" SURVEY §7 calls
for. Results are cached per (M, N, K, dtype, generation) in-process and
optionally persisted to a JSON file so later runs skip the sweep.
"""

from __future__ import annotations

import json
import os
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...device_info import detect
from .api import gemm
from .tiling import GemmTiles, plan_tiles

_CACHE: dict = {}
_CACHE_FILE = os.environ.get("LASER_AUTOTUNE_CACHE",
                             os.path.join(os.path.dirname(__file__), "..", "..", "..",
                                          ".laser_autotune.json"))
_TOOLCHAIN: "str | None" = None


def _toolchain() -> str:
    """Compiler-stack fingerprint: jax + jaxlib + backend platform version
    (the libtpu/Mosaic build on TPU). A measured Pallas-vs-XLA verdict is a
    fact about a *toolchain*, not about the chip — Mosaic's ~82% bf16 matmul
    ceiling (docs/PERF_NOTES.md "MXU matmul ceiling") could move on any
    upgrade, so disk records carry this string and records from a different
    toolchain are treated as absent (re-raced on next autotune_gemm)."""
    global _TOOLCHAIN
    if _TOOLCHAIN is None:
        parts = [jax.__version__]
        try:
            import jaxlib

            parts.append(jaxlib.__version__)
        except Exception:  # pragma: no cover
            pass
        try:
            # `jax.extend` is not re-exported by bare `import jax`; a plain
            # `import jax.extend` here would shadow the module-level `jax`.
            from jax.extend import backend as _jx_backend

            pv = _jx_backend.get_backend().platform_version
            # Compact the whole string: the version-bearing lines (libtpu
            # build date, compile-cache rev, compat level) are after line 1.
            parts.append(" ".join(pv.split())[:200])
        except Exception:
            pass
        _TOOLCHAIN = "|".join(parts)
    return _TOOLCHAIN


def _disk_get(disk: dict, key: str) -> "dict | None":
    """A disk record is only valid for the toolchain that measured it."""
    rec = disk.get(key)
    if rec is None or rec.get("toolchain") != _toolchain():
        return None
    return {k: v for k, v in rec.items() if k != "toolchain"}


def _candidates(M: int, N: int, K: int, dtype) -> List[Tuple[int, int, int]]:
    """Short list around the analytic plan (measured good on v5e); each
    candidate costs a fresh Mosaic compile, so keep this tight."""
    base = plan_tiles(M, N, K, dtype)
    kr = ((K + 127) // 128) * 128
    raw = [
        (base.bm, base.bn, base.bk),
        (512, 1024, 512), (1024, 1024, 512), (2048, 1024, 512),
        (512, 1024, min(4096, kr)), (1024, 512, min(4096, kr)),
        (512, 512, 1024),
        (256, 512, 512), (256, 256, 1024), (128, 512, 512),
    ]
    # small-problem full-residency candidates: when A+B+C fit the VMEM
    # budget, full-K single-j blocks WIN — measured 81.5% vs XLA's 75.9% at
    # f32 1024^3 (tools/gemm_f32_resident_probe.py, /tmp/f32probe_1024.log
    # committed to docs/PERF_NOTES.md). The old heuristic ("keep the grid
    # >= 8 steps for pipeline overlap") is refuted by that probe: at tiny
    # problems the grid is all prologue anyway and deeper per-dot K beats
    # overlap.
    itemsize = jnp.dtype(dtype).itemsize
    if M * K * itemsize + K * N * itemsize <= 24 * 1024 * 1024:
        raw += [(min(512, _rnd(M)), _rnd(N), kr),
                (min(256, _rnd(M)), _rnd(N), kr),
                (_rnd(M), _rnd(N), kr)]
    if M != N:
        # rectangle-aware: follow the long output axis with the big tile
        raw += [(256, 1024, 512), (1024, 256, 512),
                (128, 1024, min(2048, kr)), (1024, 128, min(2048, kr))]
    cands = []
    for bm, bn, bk in raw:
        c = (min(bm, _rnd(M)), min(bn, _rnd(N)), min(bk, kr))
        if c not in cands:
            cands.append(c)
    return cands


def _rnd(x: int) -> int:
    return ((x + 127) // 128) * 128


def autotune_gemm(M: int, N: int, K: int, dtype=jnp.bfloat16, *,
                  persist: bool = True, verbose: bool = False) -> GemmTiles:
    """Return the fastest measured GemmTiles for this problem on this chip.

    Square problems chain the output straight back as the next input; a
    non-square problem is timed with a DRIFT CHAIN — x = x + sum(out)*eps
    keeps the dependency through the kernel while shapes stay fixed, and
    the drift add's own cost cancels in the candidate ranking (every
    candidate pays the identical tail)."""
    from ...bench.harness import chain_rate

    gen = detect().generation
    key = f"{M}x{N}x{K}:{jnp.dtype(dtype).name}:{gen}"
    if key in _CACHE:
        hit = _CACHE[key]
        return hit[0] if isinstance(hit, tuple) else hit
    disk = _load_disk()
    rec = _disk_get(disk, key)
    if rec is not None:
        rec = dict(rec)
        backend = rec.pop("backend", None)
        t = GemmTiles(**rec)
        _CACHE[key] = (t, backend) if backend else t
        return t
    if jnp.issubdtype(jnp.dtype(dtype), jnp.integer):
        return plan_tiles(M, N, K, dtype)

    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(M, K) * 0.05, dtype)
    b = jnp.asarray(rng.randn(K, N) * 0.05, dtype)
    square = M == N == K
    best, best_t = None, float("inf")
    # Candidate list = Pallas tile configs + the XLA emitter. The winner's
    # BACKEND is cached alongside the tiles, and gemm()'s auto dispatch
    # consults it (measured dispatch, not an assumed heuristic — the
    # reference's standard: race your kernel against the vendor and ship
    # whichever wins per shape, gemm_bench_float32.nim:404-443).
    cands = [(t, "pallas") for t in _candidates(M, N, K, dtype)]
    cands.append((None, "xla"))
    for tile_dims, backend in cands:
        if backend == "pallas":
            bm, bn, bk = tile_dims
            tiles = GemmTiles(bm, bn, bk,
                              plan_tiles(M, N, K, dtype).vmem_limit_bytes)
        else:
            tiles = None

        if square:
            def step(x, y, tiles=tiles, backend=backend):
                return gemm(x, y, alpha=0.05, tiles=tiles, out_dtype=dtype,
                            backend=backend)
        else:
            def step(x, y, tiles=tiles, backend=backend):
                o = gemm(x, y, alpha=0.05, tiles=tiles, out_dtype=dtype,
                         backend=backend)
                return x + (jnp.sum(o.astype(jnp.float32))
                            * jnp.float32(1e-30)).astype(x.dtype)
        try:
            ms = chain_rate(step, a, b, target_seconds=0.5, trials=1)
        except Exception as e:  # Mosaic rejects configs over VMEM; skip them
            if verbose:
                print(f"  {tile_dims or backend}: rejected ({type(e).__name__})")
            continue
        if verbose:
            print(f"  {tile_dims or backend}: {ms:.3f} ms  "
                  f"{2*M*N*K/(ms*1e6):.0f} GFLOP/s")
        if ms < best_t:
            best, best_t = (tiles, backend), ms
    if best is None:
        best = (plan_tiles(M, N, K, dtype), "pallas")
    tiles, backend = best
    if tiles is None:
        tiles = plan_tiles(M, N, K, dtype)
    _CACHE[key] = (tiles, backend)
    if persist:
        disk[key] = {"bm": tiles.bm, "bn": tiles.bn, "bk": tiles.bk,
                     "vmem_limit_bytes": tiles.vmem_limit_bytes,
                     "backend": backend, "toolchain": _toolchain()}
        _save_disk(disk)
    return tiles


def cached_backend(M: int, N: int, K: int, dtype) -> "str | None":
    """Measured auto-dispatch winner for this shape, or None if never tuned.

    Consulted by gemm()'s backend=None path: a disk/in-process autotune
    record beats the static heuristic. Never measures — call autotune_gemm
    (offline or at warmup) to populate."""
    gen = detect().generation
    key = f"{M}x{N}x{K}:{jnp.dtype(dtype).name}:{gen}"
    hit = _CACHE.get(key)
    if hit is not None:
        return hit[1] if isinstance(hit, tuple) else None
    rec = _disk_get(_load_disk(), key)
    if rec is not None and "backend" in rec:
        _CACHE[key] = (GemmTiles(**{k: v for k, v in rec.items()
                                    if k != "backend"}), rec["backend"])
        return rec["backend"]
    return None


def cached_tiles(M: int, N: int, K: int, dtype) -> "GemmTiles | None":
    gen = detect().generation
    key = f"{M}x{N}x{K}:{jnp.dtype(dtype).name}:{gen}"
    hit = _CACHE.get(key)
    if isinstance(hit, tuple):
        return hit[0]
    return hit


def _load_disk() -> dict:
    try:
        with open(_CACHE_FILE) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return {}


def _save_disk(d: dict):
    try:
        with open(_CACHE_FILE, "w") as f:
            json.dump(d, f, indent=1, sort_keys=True)
    except OSError:
        pass
