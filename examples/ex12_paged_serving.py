"""Continuous-batching serving with a paged KV cache.

Requests of different lengths stream through a fixed pool of KV pages:
new requests join the running batch the moment a slot frees (continuous
batching), finished requests return their pages instantly, and decode
attention gathers each sequence's pages through its block table inside one
Pallas kernel (laser_tpu/ops/paged_attention.py).

Also shown: automatic prefix caching (requests sharing a prompt prefix
reuse its KV pages zero-copy and prefill only their suffix), chunked
prefill (a prompt longer than the largest bucket), and per-request
sampling (greedy and temperature/top-p requests share the batch; one
batched device call samples every slot with its own parameters).

Run:  python examples/ex12_paged_serving.py
"""

import jax
import numpy as np

from laser_tpu.models.transformer import init_transformer
from laser_tpu.serving import ServingConfig, ServingEngine


def main():
    rng = np.random.RandomState(0)
    vocab = 1024
    params = init_transformer(jax.random.PRNGKey(0), n_layers=2, d_model=256,
                              n_heads=4, d_ff=512, vocab=vocab)

    cfg = ServingConfig(page_size=64, n_pages=64, max_seqs=4,
                        max_pages_per_seq=8, prefill_buckets=(64, 128, 256),
                        prefix_cache=True)
    engine = ServingEngine(params, n_heads=4, cfg=cfg)

    # eight requests through four slots: continuous batching in action.
    # the last three share a 128-token prefix (a "system prompt") — the
    # engine prefills it once and shares its pages; the 300-token prompt
    # exceeds the largest bucket and prefills in chunks
    system = rng.randint(0, vocab, 128).astype(np.int32)
    prompts = [rng.randint(0, vocab, n).astype(np.int32)
               for n in (30, 64, 120, 17, 300)]
    prompts += [np.concatenate([system,
                                rng.randint(0, vocab, n).astype(np.int32)])
                for n in (40, 90, 10)]
    ids = [engine.add_request(p, max_new_tokens=16) for p in prompts[:-1]]
    # the last request samples instead of greedy decoding
    ids.append(engine.add_request(prompts[-1], max_new_tokens=16,
                                  temperature=0.8, top_p=0.9, seed=42))

    step = 0
    while engine.has_work():
        engine.step()
        step += 1
        active = sum(r is not None for r in engine.running)
        print(f"step {step:3d}: active={active} queued={len(engine.queue)} "
              f"free_pages={engine.cache.n_free()}")

    results = engine.finished
    for rid, p in zip(ids, prompts):
        print(f"req {rid} (prompt {len(p)} tokens) -> {results[rid]}")
    print(f"prefix cache: {engine.stats['prefix_hits']} hits, "
          f"{engine.stats['prefix_tokens_reused']} prompt tokens reused")


if __name__ == "__main__":
    main()
