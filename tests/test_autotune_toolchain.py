"""Autotune records are toolchain-scoped (VERDICT r3 #7).

A measured Pallas-vs-XLA dispatch verdict is a property of the compiler
stack (Mosaic/XLA build), not the chip; a jaxlib/libtpu upgrade must
invalidate the cached record so the race reruns instead of fossilizing the
old winner. These tests prove the invalidation path without touching
hardware: records written under one toolchain string are invisible under
another, and a re-tune persists a fresh record stamped with the new string.
"""

import json

import jax.numpy as jnp
import pytest

from laser_tpu.device_info import detect
from laser_tpu.ops.gemm import autotune
from laser_tpu.ops.gemm.tiling import GemmTiles


@pytest.fixture
def scratch_cache(tmp_path, monkeypatch):
    path = tmp_path / "autotune.json"
    monkeypatch.setattr(autotune, "_CACHE_FILE", str(path))
    monkeypatch.setattr(autotune, "_CACHE", {})
    return path


def _write(path, key, backend, toolchain):
    rec = {"bm": 128, "bn": 128, "bk": 128,
           "vmem_limit_bytes": 1 << 20, "backend": backend}
    if toolchain is not None:
        rec["toolchain"] = toolchain
    path.write_text(json.dumps({key: rec}))


def _key(M, N, K, dtype):
    return f"{M}x{N}x{K}:{jnp.dtype(dtype).name}:{detect().generation}"


def test_matching_toolchain_record_is_served(scratch_cache, monkeypatch):
    monkeypatch.setattr(autotune, "_TOOLCHAIN", "tc-A")
    _write(scratch_cache, _key(64, 64, 64, jnp.float32), "pallas", "tc-A")
    assert autotune.cached_backend(64, 64, 64, jnp.float32) == "pallas"
    t = autotune.cached_tiles(64, 64, 64, jnp.float32)
    assert isinstance(t, GemmTiles) and t.bm == 128


def test_toolchain_bump_invalidates_record(scratch_cache, monkeypatch):
    monkeypatch.setattr(autotune, "_TOOLCHAIN", "tc-B-upgraded")
    _write(scratch_cache, _key(64, 64, 64, jnp.float32), "pallas", "tc-A")
    # The stale verdict must NOT be consulted by gemm()'s dispatch path.
    assert autotune.cached_backend(64, 64, 64, jnp.float32) is None
    assert autotune.cached_tiles(64, 64, 64, jnp.float32) is None


def test_legacy_record_without_toolchain_is_stale(scratch_cache, monkeypatch):
    monkeypatch.setattr(autotune, "_TOOLCHAIN", "tc-A")
    _write(scratch_cache, _key(64, 64, 64, jnp.float32), "xla", None)
    assert autotune.cached_backend(64, 64, 64, jnp.float32) is None


def test_retune_persists_fresh_toolchain_stamp(scratch_cache, monkeypatch):
    monkeypatch.setattr(autotune, "_TOOLCHAIN", "tc-NEW")
    key = _key(32, 48, 32, jnp.float32)
    _write(scratch_cache, key, "pallas", "tc-OLD")
    # Race only two cheap candidates so the CPU re-tune stays fast.
    monkeypatch.setattr(autotune, "_candidates", lambda M, N, K, d: [(128, 128, 128)])
    tiles = autotune.autotune_gemm(32, 48, 32, jnp.float32, verbose=False)
    assert isinstance(tiles, GemmTiles)
    rec = json.loads(scratch_cache.read_text())[key]
    assert rec["toolchain"] == "tc-NEW"
    assert rec["backend"] in ("pallas", "xla")
