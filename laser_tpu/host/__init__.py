"""Native host-side runtime (C++), built lazily and loaded via ctypes.

See csrc/laser_host.cpp for what lives here and why. The build is a single
g++ invocation cached next to the source (the photon_jit spirit: generate
native code at runtime, cache by content hash — photon_types.nim:195-298).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                    "laser_host.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None


class HostBuildError(RuntimeError):
    pass


def compile_cpp(source_text: str, tag: str) -> ctypes.CDLL:
    """Compile C++ source text to a shared object and ctypes-load it.

    The shared build path for BOTH the fixed runtime (csrc/laser_host.cpp)
    and runtime-GENERATED kernels (host/jit.py): content-hash the source,
    g++ -O3 -march=native into csrc/.build/<tag>_<hash>.so, cache by hash —
    the photon_jit pipeline (photon_types.nim:195-298) with g++ standing in
    for the in-process assembler."""
    digest = hashlib.sha256(source_text.encode()).hexdigest()[:16]
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(_SRC)), ".build")
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"{tag}_{digest}.so")
    if not os.path.exists(so_path):
        cpp_path = os.path.join(cache_dir, f"{tag}_{digest}.cpp")
        with open(cpp_path, "w") as f:
            f.write(source_text)
        tmp = so_path + f".tmp{os.getpid()}"
        cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
               "-fPIC", "-pthread", cpp_path, "-o", tmp]
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            msg = getattr(e, "stderr", str(e))
            raise HostBuildError(f"host kernel build failed: {msg}") from e
        os.replace(tmp, so_path)
    return ctypes.CDLL(so_path)


def _build_and_load() -> ctypes.CDLL:
    with open(os.path.abspath(_SRC)) as f:
        lib = compile_cpp(f.read(), "laser_host")
    _declare(lib)
    if lib.laser_host_abi_version() != 1:
        raise HostBuildError("laser_host ABI mismatch")
    return lib


def _declare(lib: ctypes.CDLL):
    c = ctypes
    lib.laser_fenwick_create.restype = c.c_void_p
    lib.laser_fenwick_create.argtypes = [c.POINTER(c.c_float), c.c_int]
    lib.laser_fenwick_destroy.argtypes = [c.c_void_p]
    lib.laser_fenwick_total.restype = c.c_double
    lib.laser_fenwick_total.argtypes = [c.c_void_p]
    lib.laser_fenwick_get.restype = c.c_double
    lib.laser_fenwick_get.argtypes = [c.c_void_p, c.c_int]
    lib.laser_fenwick_update.argtypes = [c.c_void_p, c.c_int, c.c_double]
    lib.laser_fenwick_sample_one.restype = c.c_int
    lib.laser_fenwick_sample_one.argtypes = [c.c_void_p, c.c_double]
    lib.laser_fenwick_sample.argtypes = [
        c.c_void_p, c.c_uint64, c.c_int, c.c_int, c.POINTER(c.c_int32)]
    lib.laser_multinomial.argtypes = [
        c.POINTER(c.c_float), c.c_int, c.c_uint64, c.c_int, c.c_int,
        c.POINTER(c.c_int32)]
    lib.laser_strided_copy_f32.argtypes = [
        c.POINTER(c.c_float), c.POINTER(c.c_float), c.c_int,
        c.POINTER(c.c_int64), c.POINTER(c.c_int64), c.c_int64]
    lib.laser_strided_copy_f64.argtypes = [
        c.POINTER(c.c_double), c.POINTER(c.c_double), c.c_int,
        c.POINTER(c.c_int64), c.POINTER(c.c_int64), c.c_int64]
    lib.laser_f64_digits.argtypes = [
        c.POINTER(c.c_double), c.c_int64, c.c_int64, c.c_int, c.c_int,
        c.POINTER(c.c_int8), c.POINTER(c.c_int32)]
    lib.laser_host_abi_version.restype = c.c_int


def get_lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        with _LOCK:
            if _LIB is None:
                _LIB = _build_and_load()
    return _LIB


def available() -> bool:
    try:
        get_lib()
        return True
    except HostBuildError:
        return False


class FenwickSampler:
    """F+tree multinomial sampler (reference: fenwicktree.nim + NOMAD-LDA
    sampler in bench_multinomial_samplers.nim).

    O(log n) sample, O(log n) weight update; `sample(..., replacement=False)`
    temporarily zeroes drawn weights and restores them.
    """

    def __init__(self, weights):
        w = np.ascontiguousarray(np.asarray(weights, np.float32))
        if w.ndim != 1:
            raise ValueError("weights must be rank-1")
        self._lib = get_lib()
        self._n = len(w)
        self._h = self._lib.laser_fenwick_create(
            w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), self._n)

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.laser_fenwick_destroy(h)
            self._h = None

    @property
    def total(self) -> float:
        return self._lib.laser_fenwick_total(self._h)

    def __getitem__(self, i: int) -> float:
        return self._lib.laser_fenwick_get(self._h, int(i))

    def update(self, i: int, weight: float):
        self._lib.laser_fenwick_update(self._h, int(i), float(weight))

    def sample(self, num: int, *, seed: int = 0, replacement: bool = True
               ) -> np.ndarray:
        out = np.empty(num, np.int32)
        self._lib.laser_fenwick_sample(
            self._h, ctypes.c_uint64(seed), int(num), int(replacement),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out


def multinomial(weights, num: int, *, seed: int = 0,
                replacement: bool = True) -> np.ndarray:
    """One-shot host-side multinomial draw."""
    w = np.ascontiguousarray(np.asarray(weights, np.float32))
    out = np.empty(num, np.int32)
    get_lib().laser_multinomial(
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(w),
        ctypes.c_uint64(seed), int(num), int(replacement),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def strided_copy(src: np.ndarray, shape, strides, offset: int = 0,
                 specialize: bool = False) -> np.ndarray:
    """Gather a strided view of ``src`` (flat f32/f64 array, element strides)
    into a fresh row-major array — the native twin of
    TensorView.materialize() for host tensors.

    ``specialize=True`` routes through the runtime host-code JIT (host/jit.py):
    a C++ kernel with this exact (shape, strides, offset) folded into the
    instruction stream is generated, hash-cache compiled, and reused —
    faster for hot repeated layouts, one-time g++ cost on first use (the
    photon_jit trade, photon_types.nim:79-163)."""
    if specialize:
        from .jit import host_kernel

        k = host_kernel("copy", np.asarray(src).dtype, tuple(shape),
                        [tuple(strides)], offsets=[int(offset)])
        return k(src)
    src = np.ascontiguousarray(src).reshape(-1)
    shape = np.asarray(shape, np.int64)
    strides_a = np.asarray(strides, np.int64)
    out = np.empty(tuple(shape.tolist()), src.dtype)
    lib = get_lib()
    if src.dtype == np.float32:
        fn, ptr = lib.laser_strided_copy_f32, ctypes.POINTER(ctypes.c_float)
    elif src.dtype == np.float64:
        fn, ptr = lib.laser_strided_copy_f64, ctypes.POINTER(ctypes.c_double)
    else:
        raise TypeError(f"strided_copy: unsupported dtype {src.dtype}")
    fn(src.ctypes.data_as(ptr), out.ctypes.data_as(ptr), len(shape),
       shape.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
       strides_a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
       int(offset))
    return out


def f64_digits(x: np.ndarray, axis: int, slices: int):
    """Single-pass Ozaki digit extraction (native twin of
    ops/gemm/f64_kernel.f64_digits_np): (R, C) f64 -> ((slices, R, C) int8,
    per-line int32 scales along ``axis``)."""
    x = np.ascontiguousarray(x, np.float64)
    rows, cols = x.shape
    digits = np.empty((slices, rows, cols), np.int8)
    scales = np.empty((rows if axis == 1 else cols,), np.int32)
    get_lib().laser_f64_digits(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rows, cols, int(axis), int(slices),
        digits.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        scales.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return digits, scales
