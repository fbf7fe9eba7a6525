"""Production pretraining, end to end: packed data -> ZeRO-1 mixed precision.

Every piece of the round-3 training stack in one script:

  1. ``PackedTokenDataset``: variable-length documents packed into fixed
     LM rows (bins mode — no document spans two rows, pad slots carry
     ignore_index so the loss skips them; .efficiency reports the waste).
  2. ``DataLoader``: deterministic epoch shuffling + background device
     prefetch, batches placed dp-sharded on the mesh.
  3. ``llama_cast`` + ``llama_train_init_zero1(master_dtype=f32)``:
     bf16 compute params (bf16 MXU matmuls, half the HBM), f32 master
     weights and moments sharded 1/n per device — the ZeRO-1
     mixed-precision recipe; the all_gather wire carries bf16.
  4. ``warmup_cosine_lr`` schedule + global-norm clipping + loss masking
     (ignore_index) in the ZeRO-1 step.
  5. Checkpoint/resume: save_checkpoint writes logical layout;
     restore_shardings re-places the loaded state — resume is EXACT.

Run anywhere: XLA_FLAGS=--xla_force_host_platform_device_count=4
JAX_PLATFORMS=cpu for a virtual mesh.
"""

import numpy as np

import jax
import jax.numpy as jnp

from laser_tpu.data.loader import DataLoader, PackedTokenDataset
from laser_tpu.models.checkpoint import (load_checkpoint, restore_shardings,
                                         save_checkpoint)
from laser_tpu.models.llama import (init_llama, llama_cast,
                                    llama_train_init_zero1,
                                    llama_train_step_zero1)
from laser_tpu.ops.optim import warmup_cosine_lr
from laser_tpu.parallel import make_mesh, sharding

VOCAB, EOS, SEQ = 128, 127, 32
rng = np.random.RandomState(0)

# -- 1. pack documents --------------------------------------------------------
docs = [rng.randint(0, 100, rng.randint(5, 30)).astype(np.int32)
        for _ in range(64)]
ds = PackedTokenDataset(docs, SEQ, EOS, mode="bins")
print(f"packed {len(docs)} docs -> {len(ds)} rows of {SEQ + 1}, "
      f"efficiency {ds.efficiency:.2f}")

# -- 2. loader: dp-sharded batches, prefetched --------------------------------
mesh = make_mesh({"dp": jax.device_count()})
B = jax.device_count() * 2
dl = DataLoader(ds, B, seed=1, prefetch=2,
                sharding=sharding(mesh, "dp"))

# -- 3. model: bf16 compute + ZeRO-1 f32 masters ------------------------------
params = llama_cast(init_llama(jax.random.PRNGKey(0), n_layers=2,
                               d_model=128, n_heads=4, n_kv_heads=2,
                               d_ff=256, vocab=VOCAB, max_len=SEQ + 1))
opt = llama_train_init_zero1(params, mesh, master_dtype=jnp.float32)
n_master = sum(l.size for l in jax.tree_util.tree_leaves(opt[2]))
print(f"opt state: f32 master+moments sharded over dp="
      f"{mesh.shape['dp']} ({n_master} master elems total, "
      f"{n_master // mesh.shape['dp']} per device)")

# -- 4. train with schedule + clipping + loss masking -------------------------
step_i = 0
for epoch in range(2):
    for (rows,) in dl.epoch_iter(epoch):
        step_i += 1
        lr = warmup_cosine_lr(step_i, peak_lr=1e-2, warmup_steps=4,
                              total_steps=32)
        params, opt, loss = llama_train_step_zero1(
            params, opt, rows, step_i, mesh, n_heads=4, n_kv_heads=2,
            lr=lr, clip_norm=1.0, ignore_index=ds.ignore_index)
    print(f"epoch {epoch}: loss {float(loss):.4f}")

# -- 5. exact resume ----------------------------------------------------------
save_checkpoint("/tmp/ex18_state.npz", {"p": params, "o": opt}, step=step_i)
state = load_checkpoint("/tmp/ex18_state.npz", {"p": params, "o": opt})
rp = restore_shardings(state["p"], params)
ro = restore_shardings(state["o"], opt)

(rows,) = next(iter(dl.epoch_iter(2)))
_, _, l_cont = llama_train_step_zero1(params, opt, rows, step_i + 1, mesh,
                                      n_heads=4, n_kv_heads=2, lr=1e-3,
                                      clip_norm=1.0,
                                      ignore_index=ds.ignore_index)
_, _, l_res = llama_train_step_zero1(rp, ro, rows, step_i + 1, mesh,
                                     n_heads=4, n_kv_heads=2, lr=1e-3,
                                     clip_norm=1.0,
                                     ignore_index=ds.ignore_index)
assert float(l_cont) == float(l_res), (l_cont, l_res)
print(f"checkpoint resume: next-step loss identical ({float(l_res):.4f})")
print("ex18 ok")
