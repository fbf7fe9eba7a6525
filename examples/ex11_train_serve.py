"""End-to-end training + serving on the laser kernels.

Training: flash-attention transformer forward/backward (fused Pallas
kernels), fused AdamW update. Serving: ONE flash-prefill forward fills the
KV cache, then incremental decode steps.
"""

import jax
import jax.numpy as jnp

import laser_tpu as lt
from laser_tpu.models.transformer import (greedy_decode_cached,
                                          init_transformer,
                                          transformer_forward)

key = jax.random.PRNGKey(0)
VOCAB, HEADS = 512, 4  # head_dim 64: the lane-padded flash path
params = init_transformer(key, n_layers=2, d_model=256, n_heads=HEADS,
                          d_ff=512, vocab=VOCAB)
tokens = jax.random.randint(jax.random.fold_in(key, 1), (4, 128), 0, VOCAB)


def loss_fn(p, toks):
    logits = transformer_forward(p, toks, n_heads=HEADS, causal=True)
    logp = jax.nn.log_softmax(logits[:, :-1])
    tgt = toks[:, 1:]
    return -jnp.take_along_axis(logp, tgt[..., None], -1).mean()


m, v = lt.adamw_init(params)


@jax.jit
def train_step(p, m, v, step, toks):
    loss, grads = jax.value_and_grad(loss_fn)(p, toks)
    p, m, v = lt.adamw_step(p, grads, m, v, step, lr=3e-4, weight_decay=0.01)
    return p, m, v, loss


for step in range(1, 6):
    params, m, v, loss = train_step(params, m, v, step, tokens)
    print(f"step {step}: loss {float(loss):.4f}")

# Serving: flash prefill + KV-cached greedy decode.
prompt = tokens[:1, :32]
out = greedy_decode_cached(params, prompt, n_heads=HEADS, max_new_tokens=16)
print("decoded:", out[0, 32:].tolist())
