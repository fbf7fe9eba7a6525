"""Kernel registry + build cache.

TPU-native analog of two reference mechanisms:
  * the compile-time ukernel dispatch table keyed (dtype, ISA)
    (reference: gemm_ukernel_dispatch.nim:46-81, gemm.nim:228-247), which
    becomes a runtime registry keyed (op, dtype, generation, variant);
  * photon_jit's "cache generated code by spec hash" design notes
    (reference: photon_jit/photon_types.nim:195-298) — here "generated code"
    is a closed-over ``pl.pallas_call`` whose Mosaic compilation XLA caches;
    we memoize the *construction* so tracing work is also amortized.
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Any, Callable, Dict, Tuple

logger = logging.getLogger("laser_tpu")

_REGISTRY: Dict[Tuple[str, ...], Callable] = {}


def register(op: str, **keys) -> Callable[[Callable], Callable]:
    """Register a kernel factory under (op, sorted key=value pairs)."""

    def deco(fn: Callable) -> Callable:
        _REGISTRY[_key(op, keys)] = fn
        return fn

    return deco


def lookup(op: str, **keys) -> Callable:
    k = _key(op, keys)
    if k not in _REGISTRY:
        raise KeyError(f"no kernel registered for {k}; "
                       f"have {[x for x in _REGISTRY if x[0] == op]}")
    return _REGISTRY[k]


def try_lookup(op: str, **keys):
    return _REGISTRY.get(_key(op, keys))


def _key(op: str, keys: Dict[str, Any]) -> Tuple[str, ...]:
    return (op,) + tuple(f"{k}={v}" for k, v in sorted(keys.items()))


def build_cache(fn: Callable) -> Callable:
    """Memoize a kernel-builder on its (hashable) static arguments.

    Cache misses (fresh kernel constructions) are logged at DEBUG on the
    ``laser_tpu`` logger — the 'compilation logs' the reference lists as a
    TODO (lux_types.nim:250-251); enable via profiling.log_kernel_builds().
    """
    cached = functools.lru_cache(maxsize=None)(fn)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        misses = cached.cache_info().misses
        t0 = time.perf_counter()
        out = cached(*args, **kwargs)
        if cached.cache_info().misses > misses:
            logger.debug("built kernel %s%r in %.3fs", fn.__name__, args,
                         time.perf_counter() - t0)
        return out

    wrapper.cache_info = cached.cache_info  # type: ignore[attr-defined]
    wrapper.cache_clear = cached.cache_clear  # type: ignore[attr-defined]
    return wrapper
