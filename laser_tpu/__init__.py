"""laser-tpu: a TPU-native high-performance kernel library.

A ground-up JAX/Pallas rebuild of the capabilities of mratsim/laser
(see SURVEY.md at the repo root): BLIS-style GEMM -> MXU-tiled Pallas matmul,
forEach/forEachStaged strided iteration -> fused elementwise / map-reduce
kernel builders, AVX exp/log -> VPU vector-math kernels, cache-blocked
transpose -> VMEM-tiled layout kernels, OpenMP -> Pallas grids + shard_map
over device meshes.
"""

from . import config, device_info, registry, tensor, utils
from .config import LaserConfig, config_override, get_config, set_config
from .device_info import ChipSpec, detect, min_tile, num_devices
from .tensor import TensorView, as_view, from_nested, row_major_strides, zeros

__version__ = "0.1.0"

# Ops are imported lazily by submodule to keep import light; the common entry
# points are re-exported here once defined.
from .ops import (  # noqa: E402
    for_each,
    for_each_staged,
    map_reduce,
    map_reduce_staged,
    mean_var,
    argmax,
    argmin,
    reduce_max,
    reduce_mean,
    reduce_min,
    reduce_sum,
)
from .ops.gemm import (  # noqa: E402
    gemm,
    gemm_ad,
    gemm_batched,
    gemm_packed,
    gemm_prepack_a,
    gemm_prepack_b,
    gemm_strided,
    linear,
)
from .ops.stencil import stencil_solve  # noqa: E402
from .ops.attention import (attention, attention_gqa,  # noqa: E402
                            attention_gqa_trainable, attention_reference,
                            attention_trainable, attention_with_stats)
from .ops.paged_attention import (paged_attention,  # noqa: E402
                                  paged_attention_reference)
from .ops.norm import layer_norm, rms_norm  # noqa: E402
from .ops.optim import (adamw_init, adamw_step,  # noqa: E402
                        accumulated_value_and_grad, clip_by_global_norm,
                        global_norm, inverse_sqrt_lr, sgd_momentum_step,
                        warmup_cosine_lr)
from .ops.quant import dequantize_int8, gemm_quantized, quantize_int8  # noqa: E402
from .ops.vector_math import exp, log, sigmoid, softmax, tanh  # noqa: E402
from .ops.transpose import nchw2nhwc, nhwc2nchw, transpose2d, transpose2d_batched  # noqa: E402
from .ops.conv import conv2d_direct, conv2d_im2col, conv2d_trainable  # noqa: E402
from .ops.sampling import (sample_logits, sample_logits_batch,  # noqa: E402
                           sample_multinomial, sample_multinomial_batch)
from .ops.loss import cross_entropy, lm_cross_entropy  # noqa: E402
