"""Runtime host-code JIT: specialized C++ generated from a declarative spec.

The reference's photon_jit assembles x86-64 machine code at runtime from a
declarative opcode table (photon_jit/x86_64_ops.nim:24-97, the assembler
pipeline photon_jit/photon_types.nim:79-163). The TPU-era translation keeps
the architecture — declarative op table -> code generation -> executable
cached by content hash -> called in-process — but emits SPECIALIZED C++ and
lets g++ be the instruction selector: on a modern superscalar host the payoff
of hand-picked encodings is gone, while the payoff of SPECIALIZATION
(constant shapes/strides folded into the instruction stream, fixed-depth
loop nests the compiler fully unrolls and vectorizes) is exactly what the
reference's JIT bought for its strided inner loops.

Pipeline:
  HostKernelSpec (op, dtype, shape, per-input strides/offsets)
    -> emit_cpp(spec): C++ source, every bound and stride a literal
    -> host.compile_cpp: hash-cached g++ -O3 -march=native build
    -> ctypes entry point, wrapped in a NumPy-facing callable

Ops come from _OP_TABLE — the opcode-table analog. Adding an op is one
table row, like adding an instruction to x86_64_ops.nim.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from typing import Dict, Sequence, Tuple

import numpy as np

from . import compile_cpp

# ---------------------------------------------------------------------------
# Opcode table (x86_64_ops.nim:24-97 analog): name -> (arity, C++ expression
# over in0..in{arity-1} and the runtime scalar `alpha`).
# ---------------------------------------------------------------------------
_OP_TABLE: Dict[str, Tuple[int, str]] = {
    "copy": (1, "in0"),
    "neg": (1, "-in0"),
    "abs": (1, "in0 < 0 ? -in0 : in0"),
    "scale": (1, "alpha * in0"),
    "exp": (1, "std::exp(in0)"),
    "log": (1, "std::log(in0)"),
    "sqrt": (1, "std::sqrt(in0)"),
    "relu": (1, "in0 > 0 ? in0 : T(0)"),
    "add": (2, "in0 + in1"),
    "sub": (2, "in0 - in1"),
    "mul": (2, "in0 * in1"),
    "div": (2, "in0 / in1"),
    "max": (2, "in0 > in1 ? in0 : in1"),
    "min": (2, "in0 < in1 ? in0 : in1"),
    "axpy": (2, "alpha * in0 + in1"),
    "fma": (3, "in0 * in1 + in2"),
    "lerp": (3, "in0 + alpha * (in1 - in0) * in2"),
}

_CTYPE = {"float32": "float", "float64": "double",
          "int32": "int32_t", "int64": "int64_t"}


@dataclass(frozen=True)
class HostKernelSpec:
    """Everything static about one kernel: folded into the generated code."""

    op: str
    dtype: str
    shape: Tuple[int, ...]
    strides: Tuple[Tuple[int, ...], ...]  # per input, in ELEMENTS
    offsets: Tuple[int, ...] = field(default=())

    def __post_init__(self):
        if self.op not in _OP_TABLE:
            raise ValueError(f"unknown host op {self.op!r}; "
                             f"table has {sorted(_OP_TABLE)}")
        if self.dtype not in _CTYPE:
            raise TypeError(f"host jit: unsupported dtype {self.dtype}")
        arity = _OP_TABLE[self.op][0]
        if len(self.strides) != arity:
            raise ValueError(f"{self.op} takes {arity} inputs, got "
                             f"{len(self.strides)} stride tuples")
        if any(len(s) != len(self.shape) for s in self.strides):
            raise ValueError("stride rank != shape rank")
        if self.offsets and len(self.offsets) != arity:
            raise ValueError("offsets must match arity")


def emit_cpp(spec: HostKernelSpec) -> str:
    """Generate the specialized translation unit for ``spec``.

    Loop bounds, strides, and offsets are literals; the loop nest has the
    exact rank of the spec. The innermost body indexes each input by its
    innermost stride so g++ vectorizes unit-stride cases and strength-
    reduces the rest — the work the reference's JIT did by emitting MOVAPS
    vs MOVUPS vs scalar loads per stride pattern (x86_64_ops.nim).
    """
    arity, expr = _OP_TABLE[spec.op]
    T = _CTYPE[spec.dtype]
    rank = len(spec.shape)
    offsets = spec.offsets or (0,) * arity
    lines = [
        "#include <cmath>",
        "#include <cstdint>",
        f"using T = {T};",
        "extern \"C\" void kern(const T* const* ins, T* dst, T alpha) {",
    ]
    for a in range(arity):
        lines.append(f"  const T* base{a} = ins[{a}] + {offsets[a]}L;")
    lines.append("  int64_t o = 0;")
    indent = "  "
    # outer loops with per-level hoisted pointers: p{input}_{level} carries
    # the partial stride sum so the innermost body is a single indexed load
    for d in range(rank - 1):
        lines.append(f"{indent}for (int64_t i{d} = 0; i{d} < "
                     f"{spec.shape[d]}L; ++i{d}) {{")
        for a in range(arity):
            prev = f"base{a}" if d == 0 else f"p{a}_{d - 1}"
            lines.append(f"{indent}  const T* p{a}_{d} = {prev} + "
                         f"i{d} * {spec.strides[a][d]}L;")
        indent += "  "
    last = rank - 1
    lines.append(f"{indent}for (int64_t i{last} = 0; i{last} < "
                 f"{spec.shape[last]}L; ++i{last}) {{")
    loads = []
    for a in range(arity):
        src = f"base{a}" if rank == 1 else f"p{a}_{last - 1}"
        loads.append(f"{indent}  const T in{a} = "
                     f"{src}[i{last} * {spec.strides[a][last]}L];")
    lines += loads
    lines.append(f"{indent}  dst[o++] = {expr};")
    lines.append(f"{indent}}}")
    for d in range(rank - 1):
        indent = indent[:-2]
        lines.append(f"{indent}}}")
    lines.append("}")
    lines.append("extern \"C\" int abi() { return 1; }")
    return "\n".join(lines) + "\n"


_KERNEL_CACHE: Dict[HostKernelSpec, "HostKernel"] = {}
_CACHE_LOCK = threading.Lock()


class HostKernel:
    """A compiled, loaded, callable specialized kernel."""

    def __init__(self, spec: HostKernelSpec):
        import ctypes

        self.spec = spec
        self.source = emit_cpp(spec)
        self._lib = compile_cpp(self.source, f"photon_{spec.op}")
        c_elem = {"float32": ctypes.c_float, "float64": ctypes.c_double,
                  "int32": ctypes.c_int32, "int64": ctypes.c_int64}[spec.dtype]
        self._elem = c_elem
        self._pp = ctypes.POINTER(c_elem)
        self._lib.kern.argtypes = [ctypes.POINTER(self._pp), self._pp, c_elem]
        self._lib.kern.restype = None
        self._ctypes = ctypes

    def __call__(self, *arrays: np.ndarray, alpha: float = 1.0) -> np.ndarray:
        ct = self._ctypes
        spec = self.spec
        arity = _OP_TABLE[spec.op][0]
        if len(arrays) != arity:
            raise ValueError(f"{spec.op} takes {arity} arrays")
        flats = []
        for a, arr in enumerate(arrays):
            f = np.ascontiguousarray(arr).reshape(-1)
            if f.dtype != np.dtype(spec.dtype):
                raise TypeError(f"input {a}: dtype {f.dtype} != {spec.dtype}")
            off = spec.offsets[a] if spec.offsets else 0
            hi = off + sum((d - 1) * s for d, s in
                           zip(spec.shape, spec.strides[a]) if s > 0)
            lo = off + sum((d - 1) * s for d, s in
                           zip(spec.shape, spec.strides[a]) if s < 0)
            if lo < 0 or hi >= f.size:
                raise ValueError(
                    f"input {a}: {f.size} elems < required view span "
                    f"[{lo}, {hi}]")
            flats.append(f)
        ptrs = (self._pp * arity)(
            *[f.ctypes.data_as(self._pp) for f in flats])
        out = np.empty(spec.shape, np.dtype(spec.dtype))
        a_val = int(alpha) if spec.dtype in ("int32", "int64") else alpha
        self._lib.kern(ptrs, out.ctypes.data_as(self._pp), self._elem(a_val))
        return out


def host_kernel(op: str, dtype, shape: Sequence[int],
                strides: Sequence[Sequence[int]],
                offsets: Sequence[int] = ()) -> HostKernel:
    """Build (or fetch) the specialized host kernel for this spec.

    >>> k = host_kernel("axpy", np.float32, (4, 8), [(8, 1), (8, 1)])
    >>> y = k(x1, x2, alpha=2.0)          # y = 2*x1 + x2, shapes (4, 8)

    Negative strides walk backward (pair them with an offset at the last
    element, as TensorView does); inputs are flat buffers viewed through
    (shape, strides, offset) exactly like the reference's strided iteration.
    """
    spec = HostKernelSpec(
        op, np.dtype(dtype).name, tuple(int(x) for x in shape),
        tuple(tuple(int(s) for s in ss) for ss in strides),
        tuple(int(o) for o in offsets))
    with _CACHE_LOCK:
        k = _KERNEL_CACHE.get(spec)
        if k is None:
            k = _KERNEL_CACHE[spec] = HostKernel(spec)
    return k
