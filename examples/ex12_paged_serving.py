"""Continuous-batching serving with a paged KV cache.

Requests of different lengths stream through a fixed pool of KV pages:
new requests join the running batch the moment a slot frees (continuous
batching), finished requests return their pages instantly, and decode
attention gathers each sequence's pages through its block table inside one
Pallas kernel (laser_tpu/ops/paged_attention.py).

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
                        max_pages_per_seq=8, prefill_buckets=(64, 128, 256))
    engine = ServingEngine(params, n_heads=4, cfg=cfg)

    # eight requests through four slots: continuous batching in action
    prompts = [rng.randint(0, vocab, n).astype(np.int32)
               for n in (30, 64, 120, 17, 200, 90, 45, 128)]
    ids = [engine.add_request(p, max_new_tokens=16) for p in prompts]

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


if __name__ == "__main__":
    main()
