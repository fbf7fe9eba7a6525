"""Query the chip we're compiling for (reference: examples/ex01 cpuinfo)."""

import laser_tpu as lt

spec = lt.detect()
print(f"generation      : {spec.generation}")
print(f"MXU             : {spec.mxu_dim}x{spec.mxu_dim}")
print(f"VPU             : {spec.vpu_shape}")
print(f"VMEM / core     : {spec.vmem_bytes / 2**20:.0f} MiB")
print(f"HBM             : {spec.hbm_bytes / 2**30:.0f} GiB @ {spec.hbm_gbps} GB/s")
print(f"bf16 peak       : {spec.bf16_tflops} TFLOP/s")
print(f"f32 peak (6-pass): {spec.f32_tflops} TFLOP/s")
print(f"devices         : {lt.num_devices()}")
print(f"min tile f32    : {lt.min_tile('float32')}")
print(f"min tile bf16   : {lt.min_tile('bfloat16')}")
