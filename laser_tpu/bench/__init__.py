from .harness import (BenchResult, RunningStat, bench_fn, chain_rate,
                      chain_result, gemm_flops, roofline_report)

__all__ = ["BenchResult", "RunningStat", "bench_fn", "chain_rate",
           "chain_result", "gemm_flops", "roofline_report"]
