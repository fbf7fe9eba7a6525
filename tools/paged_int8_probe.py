#!/usr/bin/env python
"""Probe: what bounds the int8 paged-attention kernel at f32 dt?

The committed record (docs/BENCH_ROUND3.json paged_attention_int8_8x4096)
shows 0.246 ms/step = 1.54x f32, while the byte ratio (int8 rows + f32
scales vs f32 rows) is ~3.7x — so the quantized kernel is NOT DMA-bound.
Candidates: (a) the 6-pass HIGHEST f32 dots (hidden behind 4x the DMA in
the f32 kernel, exposed once bytes shrink), (b) the int8->f32 convert on
the VPU, (c) fixed per-page grid cost.

Variants raced here (all on the real chip):
  base       — shipped kernel (HIGHEST f32 dots)
  default    — same kernel, precision=DEFAULT (1-pass bf16): the time
               floor if MXU passes are the bound
  bf16k      — k/v dequantized to bf16 (exact: int8 fits in bf16),
               q/p split into 3 bf16 limbs -> 3 exact passes per dot
Prints ms + max|err| vs the dequantized-f32 oracle for each.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, ".")

from laser_tpu.bench import chain_rate  # noqa: E402
from laser_tpu.ops.paged_attention import (  # noqa: E402
    paged_attention, paged_attention_reference, quantize_kv)


def main():
    rng = np.random.RandomState(0)
    S, H, hd, ps = 8, 8, 128, 256
    seq_len = 4096
    mp = seq_len // ps
    P = S * mp + 1
    q = jnp.asarray(rng.randn(S, H, hd) * 0.3, jnp.float32)
    kp = jnp.asarray(rng.randn(P, H, ps, hd) * 0.3, jnp.float32)
    vp = jnp.asarray(rng.randn(P, H, ps, hd) * 0.3, jnp.float32)
    tables = jnp.asarray(np.arange(S * mp).reshape(S, mp), jnp.int32)
    lengths = jnp.full((S,), seq_len, jnp.int32)
    kq, ks = quantize_kv(kp)
    vq, vs = quantize_kv(vp)
    kd = kq.astype(jnp.float32) * ks[..., None]
    vd = vq.astype(jnp.float32) * vs[..., None]
    oracle = np.asarray(paged_attention_reference(q, kd, vd, tables,
                                                  lengths))
    nbytes_q = (2 * S * seq_len * H * hd) + 2 * S * seq_len * H * 4

    import laser_tpu.ops.paged_attention as pa

    def race(tag, mode):
        pa._PROBE_MODE = mode
        pa.build_paged_attention.cache_clear()
        fn = lambda qq, k, v, s1, s2: paged_attention(
            qq, k, v, tables, lengths, k_scale=s1, v_scale=s2)
        got = np.asarray(fn(q, kq, vq, ks, vs))
        err = np.abs(got - oracle).max()
        t = chain_rate(fn, q, kq, vq, ks, vs)
        print(f"{tag:10s} {t:7.4f} ms  {nbytes_q/t/1e6:6.1f} GB/s  "
              f"maxerr={err:.2e}", flush=True)

    # the QUALITY CLASS floor: how far int8 STORAGE quantization alone
    # moves the output from true-f32 attention (no compute error at all:
    # the oracle runs the dequantized rows in f32). Any compute mode whose
    # added error is well below this is "free" within the int8-KV class.
    true_f32 = np.asarray(paged_attention_reference(q, kp, vp, tables,
                                                    lengths))
    print(f"int8 STORAGE error (dequant oracle vs true-f32 attention): "
          f"{np.abs(oracle - true_f32).max():.2e}", flush=True)

    race("base", "base")        # HIGHEST f32 dots (pre-round-3 shipped)
    race("default", "default")  # 1-pass bf16 both dots: the time floor
    race("k3v3", "bf16k")       # 3 limbs both (round-3/4 shipped)
    race("k2v2", "bf16k2")      # 2 limbs both
    # asymmetric (round 5): softmax is exponentially sensitive to SCORE
    # error, the V dot is linear in p -> spend limbs on the K dot only
    race("k3v1", "k3v1")
    race("k2v1", "k2v1")
    race("k1v1", "k1v1")
    pa._PROBE_MODE = None
    pa.build_paged_attention.cache_clear()


if __name__ == "__main__":
    main()
