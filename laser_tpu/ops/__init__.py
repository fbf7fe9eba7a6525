from .foreach import for_each, for_each_staged, map_reduce, map_reduce_staged
from .reductions import (argmax, argmin, mean_var, reduce_max, reduce_mean,
                         reduce_min, reduce_sum)

__all__ = [
    "for_each",
    "for_each_staged",
    "map_reduce",
    "map_reduce_staged",
    "reduce_sum",
    "reduce_min",
    "reduce_max",
    "reduce_mean",
    "mean_var",
    "argmax",
    "argmin",
]
