from .dsl import (LuxNode, Schedule, generate, lux_abs, lux_exp, lux_log,
                  lux_max, lux_sigmoid, lux_sin, lux_sum, lux_tanh)

__all__ = ["generate", "Schedule", "LuxNode", "lux_sin", "lux_exp",
           "lux_log", "lux_tanh", "lux_sigmoid", "lux_abs", "lux_sum",
           "lux_max"]
