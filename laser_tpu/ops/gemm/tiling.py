"""GEMM tile-size planning: the VMEM-blocking analog of Goto cache blocking.

Rebuild of the reference's tiling configurator
(laser/primitives/matrix_multiplication/gemm_tiling.nim:199-341): where
``partitionMNK`` sizes mc/kc so an A-panel lives in L2 and a B-panel in L1
per the GotoBLAS paper, we size (bm, bn, bk) so that the double-buffered
A/B input blocks plus the f32 accumulator tile fit the per-core VMEM budget,
with every dimension aligned to the MXU (128) and the dtype's sublane tile.

The reference's register-budget tables (MR/NR per ISA,
gemm_tiling.nim:147-197) have no direct analog — Mosaic allocates vector
registers — so the "microkernel shape" here is the (8,128)x(128,128) MXU
issue shape, which we only need to respect via alignment.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from ...config import get_config
from ...device_info import MXU_DIM, detect, min_tile, vmem_budget_bytes
from ...utils import cdiv, round_step_up


@dataclasses.dataclass(frozen=True)
class GemmTiles:
    bm: int
    bn: int
    bk: int
    vmem_limit_bytes: int

    def grid(self, M: int, N: int, K: int) -> Tuple[int, int, int]:
        return (cdiv(M, self.bm), cdiv(N, self.bn), cdiv(K, self.bk))


def _align_for(dtype) -> int:
    """Block-edge alignment: MXU dim, but never below the dtype sublane tile."""
    sub, _ = min_tile(dtype)
    return max(MXU_DIM, sub)


# Per-generation measured tile defaults: (bm, bn, kc_cap) keyed by
# (generation, itemsize-class). The analog of the reference's per-ISA
# register-budget tables (gemm_tiling.nim:147-197), but MEASURED, not
# derived: wide-N tiles win on v5e because the MXU streams B's lanes
# (512x1024 at >=2 bytes); int8 is launch-overhead-sensitive and prefers
# the largest K block (75.9% of int8 peak at 1024x512x4096 vs 63.7% at
# 512x1024x2048). Generations without measurements inherit the v5e row —
# the sweep in autotune.py refines per shape and persists.
GENERATION_TILE_DEFAULTS = {
    ("v5e", 1): (1024, 512, 4096),
    ("v5e", 2): (512, 1024, 2048),
    ("v5e", 4): (512, 1024, 2048),
}


def _generation_defaults(itemsize: int):
    gen = detect().generation
    cls = itemsize if itemsize in (1, 2, 4) else 4
    for g in (gen, "v5e"):
        if (g, cls) in GENERATION_TILE_DEFAULTS:
            return GENERATION_TILE_DEFAULTS[(g, cls)]
    return (512, 1024, 2048)


def plan_tiles(M: int, N: int, K: int, in_dtype, acc_dtype=np.float32,
               *, n_inputs: int = 2, has_c_input: bool = False,
               overrides: Optional[Tuple[Optional[int], Optional[int], Optional[int]]] = None
               ) -> GemmTiles:
    """Choose (bm, bn, bk) for an (M,K)x(K,N) matmul.

    Strategy (partitionMNK reasoning transplanted, gemm_tiling.nim:276-310):
      * bm, bn start at the largest of {512, 256, 128} not exceeding the
        (rounded-up) problem dims — big tiles amortize the K-loop overhead
        and keep the MXU busy, like mc=min(768/sizeof(T), M).
      * bk then takes the largest 128-multiple (cap 2048, like kc<=2048/sizeof)
        such that 2x(bm*bk + bk*bn)*itemsize + bm*bn*acc_itemsize fits the
        VMEM budget (factor 2 = Mosaic's automatic double buffering of the
        streamed input blocks — the packing-buffer pair of gemm_packing.nim).
    """
    cfg = get_config()
    itemsize = np.dtype(in_dtype).itemsize
    acc_itemsize = np.dtype(acc_dtype).itemsize
    align = _align_for(in_dtype)
    budget = vmem_budget_bytes()

    def fit(bm: int, bn: int, bk: int) -> bool:
        inputs = n_inputs * 2 * (bm * bk + bk * bn) * itemsize
        acc = bm * bn * acc_itemsize
        out = bm * bn * acc_itemsize * 2
        cin = bm * bn * itemsize * 2 if has_c_input else 0
        return inputs + acc + out + cin <= budget

    o_bm = overrides[0] if overrides else cfg.gemm_bm
    o_bn = overrides[1] if overrides else cfg.gemm_bn
    o_bk = overrides[2] if overrides else cfg.gemm_bk

    Mr = round_step_up(max(M, 1), align)
    Nr = round_step_up(max(N, 1), align)
    Kr = round_step_up(max(K, 1), align)

    d_bm, d_bn, kc_cap = _generation_defaults(itemsize)
    bm = o_bm or min(d_bm, Mr)
    bn = o_bn or min(d_bn, Nr)
    bm = round_step_up(bm, align)
    bn = round_step_up(bn, align)

    if o_bk:
        bk = round_step_up(o_bk, align)
    else:
        bk = round_step_up(min(kc_cap, Kr), align)
        while bk > align and not fit(bm, bn, bk):
            bk -= align
    # If even the minimum bk doesn't fit, shrink bm/bn.
    while not fit(bm, bn, bk) and (bm > align or bn > align):
        if bn >= bm and bn > align:
            bn -= align
        elif bm > align:
            bm -= align
    vmem_limit = min(detect().vmem_bytes,
                     int(vmem_budget_bytes(1.0)))
    return GemmTiles(bm=bm, bn=bn, bk=bk, vmem_limit_bytes=vmem_limit)
