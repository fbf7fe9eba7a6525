from .api import gemm, gemm_strided
from .autodiff import gemm_ad, linear
from .batched import gemm_batched
from .int32_kernel import gemm_int32, int32_limbs
from .kernel import build_gemm, epilogue_names
from .prepacked import PackedMatrix, gemm_packed, gemm_prepack_a, gemm_prepack_b
from .tiling import GemmTiles, plan_tiles

__all__ = [
    "gemm",
    "gemm_ad",
    "gemm_batched",
    "gemm_int32",
    "int32_limbs",
    "gemm_strided",
    "linear",
    "gemm_packed",
    "gemm_prepack_a",
    "gemm_prepack_b",
    "PackedMatrix",
    "GemmTiles",
    "plan_tiles",
    "build_gemm",
    "epilogue_names",
]
