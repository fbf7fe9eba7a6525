"""Profiling and observability helpers.

SURVEY §5: the reference has no tracer — its 'profiling' is the bench
harness pattern (warmup/RunningStat/roofline printouts), which lives in
harness.py. The TPU build adds what the platform gives for free:

  * ``trace(dir)`` — jax.profiler trace context producing a TensorBoard-
    loadable device trace (per-kernel device times, DMA activity);
  * ``device_memory_stats()`` — live HBM usage per device;
  * ``log_kernel_builds()`` — observability into kernel construction (the
    reference's 'compilation logs' TODO, lux_types.nim:250-251).
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Iterator, Optional

import jax

logger = logging.getLogger("laser_tpu")


@contextlib.contextmanager
def trace(log_dir: str, *, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a device profile under ``log_dir`` (TensorBoard/perfetto)."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device: Optional[object] = None) -> dict:
    """Live per-device memory statistics (bytes), where the backend reports
    them; empty dict otherwise."""
    d = device or jax.devices()[0]
    stats = getattr(d, "memory_stats", lambda: None)()
    return dict(stats) if stats else {}


@contextlib.contextmanager
def log_kernel_builds() -> Iterator[None]:
    """Surface kernel-construction logs (registry.build_cache emits a DEBUG
    line per cache miss) on stderr while the context is active."""
    handler = logging.StreamHandler()
    handler.setFormatter(logging.Formatter("[laser_tpu] %(message)s"))
    logger.addHandler(handler)
    old_level = logger.level
    logger.setLevel(logging.DEBUG)
    try:
        yield
    finally:
        logger.removeHandler(handler)
        logger.setLevel(old_level)
