"""Distributed training-state checkpointing: exact resume.

save_checkpoint always writes plain logical layout (sharded leaves
gathered to host); restore_shardings re-places a loaded tree with a live
state's shardings — certified bit-exact for the production config
(bf16 params + ZeRO-1 f32 sharded masters).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest




class TestDistributedResume:
    @pytest.mark.devices(4)
    def test_zero1_mp_exact_resume(self, tmp_path, rng):
        """The production config (bf16 params, ZeRO-1 f32 masters sharded
        over dp) checkpoints and resumes EXACTLY: step-2 losses and
        params match a never-interrupted run bit-for-bit."""
        from jax.sharding import Mesh
        from laser_tpu.models.checkpoint import (load_checkpoint,
                                                 restore_shardings,
                                                 save_checkpoint)
        from laser_tpu.models.llama import (init_llama, llama_cast,
                                            llama_train_init_zero1,
                                            llama_train_step_zero1)

        mesh = Mesh(np.array(jax.devices()[:4]), ("dp",))
        params = llama_cast(init_llama(
            jax.random.PRNGKey(40), n_layers=1, d_model=64, n_heads=2,
            n_kv_heads=1, d_ff=96, vocab=64, max_len=32))
        toks = jnp.asarray(rng.randint(0, 64, (4, 16)))
        o = llama_train_init_zero1(params, mesh, master_dtype=jnp.float32)

        p1, o1, _ = llama_train_step_zero1(params, o, toks, 1, mesh,
                                           n_heads=2, n_kv_heads=1,
                                           lr=1e-2, clip_norm=1.0)
        path = str(tmp_path / "state.npz")
        save_checkpoint(path, {"params": p1, "opt": o1}, step=1)

        # uninterrupted continuation
        p2, _, l2 = llama_train_step_zero1(p1, o1, toks, 2, mesh,
                                           n_heads=2, n_kv_heads=1,
                                           lr=1e-2, clip_norm=1.0)

        # resume: load host arrays, re-place with a live layout's shardings
        state = load_checkpoint(path, {"params": p1, "opt": o1})
        fresh = llama_train_init_zero1(params, mesh,
                                       master_dtype=jnp.float32)
        rp = restore_shardings(state["params"], p1)
        ro = restore_shardings(state["opt"], fresh)
        p2r, _, l2r = llama_train_step_zero1(rp, ro, toks, 2, mesh,
                                             n_heads=2, n_kv_heads=1,
                                             lr=1e-2, clip_norm=1.0)
        np.testing.assert_array_equal(np.asarray(l2r, np.float32),
                                      np.asarray(l2, np.float32))
        for a, b in zip(jax.tree_util.tree_leaves(p2r),
                        jax.tree_util.tree_leaves(p2)):
            assert a.dtype == b.dtype
            np.testing.assert_array_equal(np.asarray(a, np.float32),
                                          np.asarray(b, np.float32))
