"""LLaMA-class pretraining: fused AdamW, chunked-vocab loss, dp scaling.

The modern decoder family (models/llama.py: RMSNorm + RoPE + GQA flash
attention + SwiGLU) trained end to end on the laser kernels. The loss is
ops/loss.py:lm_cross_entropy — the unembedding projection is fused INTO
the cross entropy, streaming the vocabulary in chunks, so the (B·S, vocab)
logits are never materialized in a training step (forward or backward):
at llama-3 scale (T=8192, V=128k, f32) that removes a 4 GB live tensor
plus its saved log-softmax residual.

The single-device phase turns on every production knob at once: cosine
LR schedule (traced scalar — never retraces), global-norm clipping,
gradient accumulation (microbatch scan), and per-block remat.

The same step then runs data-parallel over a mesh: batch sharded on dp,
gradients pmean'd over ICI AFTER value_and_grad (no collective is ever
differentiated), reproducing the single-device step. Finally ZeRO-1
shards the optimizer state 1/n per device (reduce_scatter grads ->
owner-shard update -> all_gather params) — same ICI bytes as one
all-reduce, (n-1)/n of the optimizer HBM freed, identical arithmetic.

Run on any host: set XLA_FLAGS=--xla_force_host_platform_device_count=4
JAX_PLATFORMS=cpu for a virtual mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np

from laser_tpu.models.llama import (init_llama, llama_lm_loss,
                                    llama_train_init,
                                    llama_train_init_zero1,
                                    llama_train_step, llama_train_step_dp,
                                    llama_train_step_zero1)
from laser_tpu.ops.optim import warmup_cosine_lr
from laser_tpu.parallel import make_mesh

key = jax.random.PRNGKey(0)
n_dev = jax.device_count()
H, HKV = 4, 2
params = init_llama(key, n_layers=2, d_model=128, n_heads=H,
                    n_kv_heads=HKV, d_ff=256, vocab=512, max_len=64)
tokens = jax.random.randint(jax.random.fold_in(key, 1),
                            (max(4, n_dev), 32), 0, 512)

# -- single-device AdamW pretraining -------------------------------------
# the production knobs in one step: cosine-schedule lr (traced — schedule
# values never retrace), global-norm clipping, gradient accumulation
# (2 sequentially-scanned microbatches), per-block rematerialization
opt = llama_train_init(params)
step = jax.jit(lambda p, o, t, i, lr: llama_train_step(
    p, o, t, i, n_heads=H, n_kv_heads=HKV, lr=lr, label_smoothing=0.1,
    clip_norm=1.0, accum=2, remat=True))
p, o = params, opt
print(f"initial loss: "
      f"{float(llama_lm_loss(p, tokens, n_heads=H, n_kv_heads=HKV)):.4f}")
for i in range(5):
    lr = warmup_cosine_lr(i + 1, peak_lr=3e-3, warmup_steps=2,
                          total_steps=50)
    p, o, loss = step(p, o, tokens, i + 1, lr)
print(f"after 5 AdamW steps: {float(loss):.4f}")

# -- the same step, data-parallel over dp ---------------------------------
if n_dev >= 2:
    mesh = make_mesh({"dp": n_dev})
    p_ref, _, l_ref = llama_train_step(params, opt, tokens, 1, n_heads=H,
                                       n_kv_heads=HKV, lr=3e-3)
    p_dp, _, l_dp = llama_train_step_dp(params, opt, tokens, 1, mesh,
                                        n_heads=H, n_kv_heads=HKV, lr=3e-3)
    drift = max(float(jnp.abs(a - b).max()) for a, b in
                zip(jax.tree_util.tree_leaves(p_dp),
                    jax.tree_util.tree_leaves(p_ref)))
    print(f"dp={n_dev} step loss {float(l_dp):.4f} == single-device "
          f"{float(l_ref):.4f}; max param drift {drift:.2e}")
    assert abs(float(l_dp) - float(l_ref)) < 1e-4

    # -- ZeRO-1: shard the optimizer state over dp ------------------------
    # reduce_scatter(grads) -> each device AdamW-updates only its 1/n param
    # slice -> all_gather(params). Same ICI bytes as one all-reduce, 1/n of
    # the optimizer HBM, identical arithmetic to the full-batch step.
    oz = llama_train_init_zero1(params, mesh)
    p_z, oz2, l_z = llama_train_step_zero1(params, oz, tokens, 1, mesh,
                                           n_heads=H, n_kv_heads=HKV,
                                           lr=3e-3)
    drift = max(float(jnp.abs(a - b).max()) for a, b in
                zip(jax.tree_util.tree_leaves(p_z),
                    jax.tree_util.tree_leaves(p_ref)))
    per_dev = sum(l.size for l in jax.tree_util.tree_leaves(oz2)) // n_dev
    full = 2 * sum(l.size for l in jax.tree_util.tree_leaves(
        {k: v for k, v in params.items()
         if k not in ("rope_cos", "rope_sin")}))
    print(f"zero1 dp={n_dev}: params match full-batch step "
          f"(drift {drift:.2e}); opt state per device {per_dev} elems "
          f"vs {full} replicated (1/{n_dev})")
    assert drift < 1e-3
else:
    print("single device: skipping the dp demo")
