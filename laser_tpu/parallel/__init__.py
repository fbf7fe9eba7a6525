from .gemm_sharded import gemm_sharded
from .mesh import make_mesh, replicate, shard_array, sharding

__all__ = ["gemm_sharded", "make_mesh", "shard_array", "sharding", "replicate"]
