"""Global configuration for laser-tpu.

TPU-native analog of the reference's compile-time define system
(reference: laser/compiler_optim_hints.nim:6 LASER_MEM_ALIGN,
laser/openmp.nim:57-86 OMP_MEMORY_BOUND_GRAIN_SIZE / OMP_NON_CONTIGUOUS_SCALE_FACTOR,
laser/dynamic_stack_arrays.nim:6 LASER_MAXRANK). Where the reference fixes these at
compile time with -d: flags, we keep a small runtime dataclass: JAX re-traces (and
Mosaic recompiles) per distinct config, so runtime mutation is still "compile time"
from the kernel's point of view.
"""

from __future__ import annotations

import contextlib
import dataclasses
import os
from typing import Optional

# Maximum tensor rank supported by the strided-view machinery.
# Mirrors LASER_MAXRANK=6 (reference: laser/dynamic_stack_arrays.nim:6).
LASER_MAXRANK = 6


@dataclasses.dataclass
class LaserConfig:
    """Runtime knobs for kernel construction.

    interpret: run Pallas kernels in interpreter mode. ``None`` = auto: interpret
        when the default JAX backend is not TPU (the analog of the reference's
        generic no-SIMD fallback ukernel, gemm_ukernel_generic.nim:21-35, which
        lets every test run on any machine).
    elementwise_grain: minimum number of elements per grid step for elementwise
        kernels — the analog of OMP_MEMORY_BOUND_GRAIN_SIZE=1024
        (reference: laser/openmp.nim:57-80), scaled for a TensorCore instead of
        a CPU core.
    reduction_grain: elements per partial-accumulator block in reductions
        (reference: laser/primitives/reductions.nim:83 omp_parallel_if gate).
    vmem_budget_frac: fraction of per-core VMEM the GEMM tiler may plan for
        (the L1/L2-occupancy reasoning of gemm_tiling.nim:276-310 transplanted).
    matmul_precision: jax.lax.Precision for in-kernel dots on f32 inputs.
    """

    interpret: Optional[bool] = None
    # vector-math default tier: "accurate" (polynomial cores, <=1e-6 of f64
    # libm — the reference-parity bar) or "fast" (VPU hardware approx).
    vector_math_algorithm: str = "accurate"
    elementwise_grain: int = 8 * 128 * 256
    # 8*128*1024 elements = 128 rows at width 8192 (4 MB f32 blocks): the
    # round-3 grain sweep measured 64 -> 686 GB/s, 128 -> 700, 256 -> VMEM
    # OOM (the in-kernel pairwise-tree reshape doubles the block footprint)
    reduction_grain: int = 8 * 128 * 1024
    vmem_budget_frac: float = 0.7
    matmul_precision: str = "highest"
    # int8-KV paged-attention compute tier, a "kXvY" limb-mode string
    # (X bf16 limb passes for the q.k score dot, Y for the p.v dot; see
    # ops/paged_attention.py). Round-5 probe on the chip (8x4096, ps 256):
    # int8 STORAGE error alone = 1.18e-4 vs true-f32 attention; compute
    # adds 3.1e-5 at v=1 modes and <=6e-8 at v>=2. "k1v1" (default) runs
    # 0.137 ms = 505.6 GB/s = 61.7% HBM vs exact "k3v3"'s 0.183 — the
    # fast tier's added error stays ~4x under the storage floor that
    # defines the int8-KV quality class. "k3v3" = the compute-exact tier
    # (certified adversarially in test_serving int8 magnitude-spread).
    paged_quant_mode: str = "k1v1"
    # Pipeline/autotune defaults for the GEMM tiler; None = derive from device.
    gemm_bm: Optional[int] = None
    gemm_bn: Optional[int] = None
    gemm_bk: Optional[int] = None


_config = LaserConfig()


def get_config() -> LaserConfig:
    return _config


def set_config(**kwargs) -> LaserConfig:
    for k, v in kwargs.items():
        if not hasattr(_config, k):
            raise AttributeError(f"unknown laser config field: {k}")
        setattr(_config, k, v)
    return _config


def should_interpret() -> bool:
    """Resolve the interpret tri-state against the live backend."""
    if _config.interpret is not None:
        return _config.interpret
    if os.environ.get("LASER_FORCE_INTERPRET"):
        return True
    import jax

    return jax.default_backend() != "tpu"


@contextlib.contextmanager
def config_override(**kwargs):
    old = {k: getattr(_config, k) for k in kwargs}
    try:
        set_config(**kwargs)
        yield _config
    finally:
        set_config(**old)
