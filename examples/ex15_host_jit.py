"""Runtime host-code generation (reference: examples/e06_jit_fn.nim +
e07_jit_brainfuck_vm.nim — photon_jit assembling x86-64 at runtime).

laser-tpu's analog (laser_tpu/host/jit.py) generates SPECIALIZED C++ from a
declarative spec — every shape/stride/offset folded into the emitted loop
nest as a literal — compiles it with the hash-cached g++ pipeline, and
ctypes-loads the entry point. Same architecture as photon (declarative op
table -> codegen -> cached executable), with g++ as the instruction
selector."""

import numpy as np

from laser_tpu.host import strided_copy
from laser_tpu.host.jit import host_kernel

# --- a specialized kernel: y = alpha*x_view + y over strided views --------
x = np.random.RandomState(0).randn(16, 64).astype(np.float32)
y = np.random.RandomState(1).randn(8, 32).astype(np.float32)

# x_view = x[::2, ::2]: shape (8, 32), element strides (128, 2)
k = host_kernel("axpy", np.float32, (8, 32), [(128, 2), (32, 1)])
out = k(x, y, alpha=2.0)
print("axpy ok:", np.allclose(out, 2.0 * x[::2, ::2] + y))

# --- the generated code is inspectable, like photon's disassembly ---------
print("\n--- generated translation unit (specialized, all-literal) ---")
print(k.source)

# --- cache behavior: same spec -> same object; new spec -> new codegen ----
k2 = host_kernel("axpy", np.float32, (8, 32), [(128, 2), (32, 1)])
print("spec-keyed cache hit:", k2 is k)

# --- reversal via negative stride + offset (photon's pointer tricks) ------
a = np.arange(10, dtype=np.float64)
rev = host_kernel("copy", np.float64, (10,), [(-1,)], offsets=[9])
print("reversed:", rev(a))

# --- strided_copy(specialize=True): the library rides the same JIT --------
m = np.arange(24, dtype=np.float32).reshape(4, 6)
t = strided_copy(m, (6, 4), (1, 6), specialize=True)
print("jit transpose == m.T:", np.array_equal(t, m.T))
