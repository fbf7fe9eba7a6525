from .gemm_sharded import gemm_sharded
from .mesh import (copy_fwd_psum_bwd, make_mesh, psum_fwd_copy_bwd,
                   replicate, shard_array, sharding)
from .pipeline import pipeline_forward, spmd_pipeline
from .moe import init_moe, moe_forward_dense, moe_layer, moe_layer_sparse
from .ring_attention import ring_attention

__all__ = ["gemm_sharded", "make_mesh", "shard_array", "sharding",
           "copy_fwd_psum_bwd", "psum_fwd_copy_bwd",
           "replicate", "pipeline_forward", "spmd_pipeline",
           "ring_attention", "moe_layer", "moe_layer_sparse", "init_moe",
           "moe_forward_dense"]
