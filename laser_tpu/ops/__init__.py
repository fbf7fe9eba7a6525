from .foreach import for_each, for_each_staged, map_reduce
from .reductions import reduce_max, reduce_mean, reduce_min, reduce_sum

__all__ = [
    "for_each",
    "for_each_staged",
    "map_reduce",
    "reduce_sum",
    "reduce_min",
    "reduce_max",
    "reduce_mean",
]
