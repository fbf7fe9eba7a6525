"""TPU generation / topology detection.

TPU-native equivalent of the reference's cpuinfo wrapper
(reference: laser/cpuinfo.nim:262-371 — core counts, L1d/L2/L3 cache geometry,
ISA feature predicates), which feeds laser's cache-blocking tile calculator
(gemm_tiling.nim:276-310). Here the "caches" are VMEM, the "ISA features" are
the TPU generation's dtype capabilities, and the "core count" is the number of
attached TensorCores / devices. Everything is queried from ``jax.devices()``
with a static per-generation capability table (the analog of cpuinfo's
microarchitecture database).

Numbers are public figures (cloud.google.com TPU docs / the scaling book) and
are intentionally approximate: they are used for roofline accounting and
VMEM-budget planning, never for correctness.
"""

from __future__ import annotations

import dataclasses
import functools
import re
from typing import Optional, Tuple

MXU_DIM = 128  # systolic array edge, constant across generations we target
VPU_SHAPE = (8, 128)  # sublanes x lanes

# Minimum native tile (sublane count) per dtype — the TPU analog of the SIMD
# register width tables in gemm_tiling.nim:89-109.
SUBLANES_BY_ITEMSIZE = {4: 8, 2: 16, 1: 32}


def min_tile(dtype) -> Tuple[int, int]:
    """Minimum (sublane, lane) tile for a dtype, e.g. (8,128) f32, (16,128) bf16."""
    import numpy as np

    itemsize = np.dtype(dtype).itemsize
    return (SUBLANES_BY_ITEMSIZE.get(itemsize, 8), 128)


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    """Per-TensorCore capability record (cpuinfo-processor-record analog)."""

    generation: str
    bf16_tflops: float  # peak dense matmul, bf16 in / f32 acc
    f32_tflops: float  # effective f32 matmul peak (MXU passes)
    int8_tops: float  # 0 if no native int8 MXU path
    hbm_gbps: float  # HBM bandwidth per chip
    hbm_bytes: int
    vmem_bytes: int  # per TensorCore
    num_cores_per_chip: int
    ici_gbps: float  # per-link interconnect bandwidth (0 for cpu-sim)
    mxu_dim: int = MXU_DIM
    vpu_shape: Tuple[int, int] = VPU_SHAPE

    def matmul_peak_tflops(self, dtype) -> float:
        import numpy as np

        d = np.dtype(dtype)
        if d == np.float32 or d == np.float64:
            return self.f32_tflops
        if d.itemsize == 2:
            return self.bf16_tflops
        if d.itemsize == 1 and self.int8_tops:
            return self.int8_tops
        return self.f32_tflops


GiB = 1024**3
MiB = 1024**2

# Capability table. bf16 TFLOPs & HBM figures from public TPU spec sheets;
# f32 is the ~1/2-rate multi-pass figure; VMEM per core.
    # f32 figure = bf16/6: full-precision f32 matmul runs as the 6-pass bf16
    # decomposition on the MXU (measured exact on v5e: 32.9 of 32.8 TFLOP/s).
GENERATION_TABLE = {
    "v4": ChipSpec("v4", 275.0, 45.8, 275.0, 1228.0, 32 * GiB, 16 * MiB, 2, 50.0),
    "v5e": ChipSpec("v5e", 197.0, 32.8, 394.0, 819.0, 16 * GiB, 128 * MiB, 1, 50.0),
    "v5p": ChipSpec("v5p", 459.0, 76.5, 918.0, 2765.0, 95 * GiB, 128 * MiB, 2, 100.0),
    "v6e": ChipSpec("v6e", 918.0, 153.0, 1836.0, 1640.0, 32 * GiB, 128 * MiB, 1, 100.0),
    # Interpreter / CPU-simulated mesh: conservative stand-in numbers so the
    # tile planner still produces sane shapes in tests.
    "cpu-sim": ChipSpec("cpu-sim", 1.0, 0.5, 1.0, 50.0, 8 * GiB, 16 * MiB, 1, 0.0),
}

_KIND_PATTERNS = [
    (re.compile(r"v6|trillium", re.I), "v6e"),
    (re.compile(r"v5p", re.I), "v5p"),
    (re.compile(r"v5 ?lite|v5e", re.I), "v5e"),
    (re.compile(r"v4", re.I), "v4"),
]


def classify_device_kind(kind: str) -> str:
    for pat, gen in _KIND_PATTERNS:
        if pat.search(kind):
            return gen
    return "cpu-sim"


@functools.lru_cache(maxsize=None)
def detect(device: Optional[object] = None) -> ChipSpec:
    """Detect the chip we will compile for (cpuinfo_get_processor analog)."""
    import jax

    if device is None:
        devices = jax.devices()
        if not devices:
            return GENERATION_TABLE["cpu-sim"]
        device = devices[0]
    kind = getattr(device, "device_kind", "cpu")
    return GENERATION_TABLE[classify_device_kind(str(kind))]


def num_devices() -> int:
    """cpuinfo_get_cores_count analog (reference: laser/cpuinfo.nim:262)."""
    import jax

    return jax.device_count()


def vmem_budget_bytes(frac: Optional[float] = None) -> int:
    """Plannable VMEM per kernel, honoring config.vmem_budget_frac."""
    from .config import get_config

    spec = detect()
    f = frac if frac is not None else get_config().vmem_budget_frac
    return int(spec.vmem_bytes * f)
