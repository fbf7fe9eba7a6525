"""Device-side timing of the serving engine's decode-burst executable.

Separates the three contributions to serving_engine_b8's ms/token-step:
tunnel round trip (once per burst), host bookkeeping, and the device
lax.scan itself — then breaks the device step down by op family by
racing variants of the scan body (attention-only, no-sampler, ...).

Usage: python tools/serving_burst_probe.py [--burst 32]
"""
import argparse
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from laser_tpu.models.transformer import init_transformer
from laser_tpu.serving import ServingConfig, ServingEngine
from laser_tpu.serving.engine import _decode_burst_scan


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--burst", type=int, default=32)
    args = ap.parse_args()
    k = args.burst

    key = jax.random.PRNGKey(0)
    params = init_transformer(key, n_layers=2, d_model=256, n_heads=4,
                              d_ff=512, vocab=1024)
    cfg = ServingConfig(page_size=64, n_pages=128, max_seqs=8,
                        max_pages_per_seq=16, prefill_buckets=(512,),
                        decode_burst=k)
    eng = ServingEngine(params, n_heads=4, cfg=cfg)
    rng = np.random.RandomState(0)
    for _ in range(8):
        eng.add_request(rng.randint(0, 1024, 512).astype(np.int32), 480)
    for _ in range(2):
        eng.step()  # admit + warm the burst executable

    # --- end-to-end engine step (tunnel + host + device) ---
    n = 6
    t0 = time.perf_counter()
    for _ in range(n):
        eng.step()
    e2e = (time.perf_counter() - t0) / n
    print(f"engine.step() end-to-end: {e2e*1e3:.2f} ms/burst "
          f"({e2e/k*1e3:.3f} ms/token-step, {8*k/e2e:.0f} tok/s)")

    # --- device-only: dispatch the same burst executable back-to-back ---
    S = cfg.max_seqs
    state = eng.cache.state
    tables = jnp.asarray(eng.cache.tables)
    lengths = jnp.asarray(eng.cache.lengths)
    tokens = jnp.asarray(eng._tokens)
    remaining = jnp.full((S,), 10**6, jnp.int32)
    eos = jnp.full((S,), -1, jnp.int32)
    z = jnp.zeros((S,), jnp.float32)
    zi = jnp.zeros((S,), jnp.int32)
    one = jnp.ones((S,), jnp.float32)

    def run_variant(name, body_fn, greedy=True):
        fn = jax.jit(partial(body_fn, decode_fn=eng._decode_raw, k=k,
                             page_size=cfg.page_size,
                             trash_page=cfg.n_pages - 1))
        temps = z if greedy else jnp.full((S,), 0.8)
        kv, toks, lives = fn(params, state, tables, lengths, tokens,
                             remaining, eos, zi, temps, zi, one)
        jax.block_until_ready(toks)
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            kv2, toks, lives = fn(params, state, tables, lengths,
                                  tokens, remaining, eos, zi, temps,
                                  zi, one)
            jax.block_until_ready(toks)
        dt = (time.perf_counter() - t0) / n
        print(f"{name:34s}: {dt*1e3:7.2f} ms/burst "
              f"({dt/k*1e3:6.3f} ms/step, {8*k/dt:7.0f} tok/s)")
        return dt

    print(f"\n-- device dispatch (burst {k}, incl. one RTT each) --")
    run_variant("full scan (greedy)", _decode_burst_scan)
    run_variant("full scan (sampled t=0.8)", _decode_burst_scan,
                greedy=False)

    # attention-free variant: replace paged attention result with q itself
    import laser_tpu.serving.engine as E

    real_attend = E._kv_attend

    def fake_attend(kv, li, q, tables, att_len, window=None):
        return q
    E._kv_attend = fake_attend
    try:
        run_variant("scan minus paged attention", _decode_burst_scan)
    finally:
        E._kv_attend = real_attend

    real_write = E._kv_write_token

    def fake_write(kv, li, wp, row, kk, vv):
        return kv
    E._kv_write_token = fake_write
    try:
        run_variant("scan minus kv scatter", _decode_burst_scan)
    finally:
        E._kv_write_token = real_write

    # sampler-free: argmax only
    import laser_tpu.ops.sampling as SM
    real_sample = SM.sample_logits_batch

    def fake_sample(seeds, positions, logits, temps, top_ks, top_ps):
        return jnp.argmax(logits, -1).astype(jnp.int32)
    import laser_tpu.serving.engine as E2
    # _decode_burst_scan imports inside the function; patch the module attr
    SM.sample_logits_batch = fake_sample
    try:
        run_variant("scan minus sampler (raw argmax)", _decode_burst_scan)
    finally:
        SM.sample_logits_batch = real_sample


if __name__ == "__main__":
    main()
