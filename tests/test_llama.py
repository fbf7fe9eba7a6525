"""Modern decoder family (RMSNorm + RoPE + GQA + SwiGLU) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laser_tpu.models.llama import (init_llama, init_llama_cache,
                                    llama_decode_step, llama_forward,
                                    llama_generate, llama_lm_loss,
                                    llama_prefill, llama_train_init,
                                    llama_train_step)
from laser_tpu.ops.rope import apply_rope, rope_tables

CFG = dict(n_layers=2, d_model=128, n_heads=4, n_kv_heads=2, d_ff=96,
           vocab=19, max_len=64)
H, HKV = CFG["n_heads"], CFG["n_kv_heads"]


class TestRope:
    def test_rotation_preserves_norm(self, rng):
        cos, sin = rope_tables(32, 16)
        x = jnp.asarray(rng.randn(2, 32, 16), jnp.float32)
        y = apply_rope(x, cos, sin)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(y), axis=-1),
                                   np.linalg.norm(np.asarray(x), axis=-1),
                                   rtol=1e-5)

    def test_relative_property(self, rng):
        # <rope(q,m), rope(k,n)> depends only on (m - n)
        cos, sin = rope_tables(64, 16)
        q = jnp.asarray(rng.randn(16), jnp.float32)
        k = jnp.asarray(rng.randn(16), jnp.float32)

        def dot_at(m, n):
            qr = apply_rope(q[None, None, :], cos, sin, position_offset=m)
            kr = apply_rope(k[None, None, :], cos, sin, position_offset=n)
            return float(jnp.sum(qr * kr))

        np.testing.assert_allclose(dot_at(5, 2), dot_at(13, 10), rtol=1e-5)
        np.testing.assert_allclose(dot_at(0, 0), dot_at(31, 31), rtol=1e-5)

    def test_offset_matches_slice(self, rng):
        cos, sin = rope_tables(64, 16)
        x = jnp.asarray(rng.randn(1, 8, 16), jnp.float32)
        full = apply_rope(jnp.tile(x, (1, 1, 1)), cos, sin,
                          position_offset=jnp.int32(5))
        # same values as rotating inside a longer window at positions 5..12
        big = apply_rope(jnp.pad(x, ((0, 0), (5, 64 - 13), (0, 0))), cos, sin)
        np.testing.assert_allclose(np.asarray(full), np.asarray(big[:, 5:13]),
                                   rtol=1e-5, atol=1e-6)


class TestLlama:
    def test_forward_and_grads(self, rng):
        params = init_llama(jax.random.PRNGKey(0), **CFG)
        toks = jnp.asarray(rng.randint(0, CFG["vocab"], (2, 16)))

        def loss(p):
            lg = llama_forward(p, toks, n_heads=H, n_kv_heads=HKV)
            return jnp.mean(lg ** 2)

        l, g = jax.value_and_grad(loss)(params)
        assert np.isfinite(float(l))
        flat = jax.tree_util.tree_leaves(
            {k: v for k, v in g.items() if k != "rope_cos" and k != "rope_sin"})
        assert all(bool(jnp.isfinite(x).all()) for x in flat)
        assert float(jnp.abs(g["blocks"][0]["wq"]).max()) > 0

    def test_lm_loss_matches_materialized_logits(self, rng):
        params = init_llama(jax.random.PRNGKey(3), **CFG)
        toks = jnp.asarray(rng.randint(0, CFG["vocab"], (2, 16)))
        got = float(llama_lm_loss(params, toks, n_heads=H, n_kv_heads=HKV))
        lg = llama_forward(params, toks, n_heads=H, n_kv_heads=HKV)
        logp = jax.nn.log_softmax(lg[:, :-1].astype(jnp.float32), axis=-1)
        want = -jnp.mean(jnp.take_along_axis(logp, toks[:, 1:, None], -1))
        np.testing.assert_allclose(got, float(want), rtol=1e-5)

    def test_train_step_learns_and_keeps_rope(self, rng):
        params = init_llama(jax.random.PRNGKey(4), **CFG)
        opt = llama_train_init(params)
        toks = jnp.asarray(rng.randint(0, CFG["vocab"], (2, 16)))
        rope0 = np.asarray(params["rope_cos"])

        step = jax.jit(lambda p, o, t, i: llama_train_step(
            p, o, t, i, n_heads=H, n_kv_heads=HKV, lr=3e-3))
        losses = []
        for i in range(8):
            params, opt, loss = step(params, opt, toks, i + 1)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.8, losses
        np.testing.assert_array_equal(np.asarray(params["rope_cos"]), rope0)
        # grads flowed into every trainable leaf class
        assert not np.allclose(np.asarray(params["unembed"]).mean(), 0.02)

    @pytest.mark.devices(8)
    def test_train_step_dp_matches_single_device(self, rng):
        """dp=8 sharded-batch AdamW step == one full-batch step: same loss
        AND same updated params (grad pmean of equal shards is exact up to
        summation order)."""
        from jax.sharding import Mesh
        from laser_tpu.models.llama import llama_train_step_dp

        mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
        params = init_llama(jax.random.PRNGKey(6), **CFG)
        opt = llama_train_init(params)
        toks = jnp.asarray(rng.randint(0, CFG["vocab"], (8, 16)))

        p_ref, o_ref, l_ref = llama_train_step(params, opt, toks, 1,
                                               n_heads=H, n_kv_heads=HKV,
                                               lr=3e-3)
        p_dp, o_dp, l_dp = llama_train_step_dp(params, opt, toks, 1, mesh,
                                               n_heads=H, n_kv_heads=HKV,
                                               lr=3e-3)
        np.testing.assert_allclose(float(l_dp), float(l_ref), rtol=1e-5)
        # pmean-vs-full summation order shifts tiny second moments;
        # AdamW's rsqrt amplifies that on isolated near-zero-v elements
        # (same class as the accum test below)
        for a, b in zip(jax.tree_util.tree_leaves(p_dp),
                        jax.tree_util.tree_leaves(p_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=5e-5)

    def test_train_step_window(self, rng):
        params = init_llama(jax.random.PRNGKey(5), **CFG)
        opt = llama_train_init(params)
        toks = jnp.asarray(rng.randint(0, CFG["vocab"], (1, 16)))
        _, _, loss = llama_train_step(params, opt, toks, 1, n_heads=H,
                                      n_kv_heads=HKV, window=4,
                                      label_smoothing=0.1)
        assert np.isfinite(float(loss))

    def test_prefill_matches_stepwise(self, rng):
        params = init_llama(jax.random.PRNGKey(1), **CFG)
        prompt = jnp.asarray(rng.randint(0, CFG["vocab"], (2, 6)))
        B, S0 = prompt.shape
        cache0 = init_llama_cache(params, B, 10, n_heads=H, n_kv_heads=HKV)
        lg_p, cache_p = llama_prefill(params, prompt, cache0, n_heads=H,
                                      n_kv_heads=HKV)
        cache_s = cache0
        for i in range(S0):
            lg_s, cache_s = llama_decode_step(params, cache_s, prompt[:, i],
                                              jnp.int32(i), n_heads=H,
                                              n_kv_heads=HKV)
        np.testing.assert_allclose(np.asarray(cache_p[:, :, :, :S0]),
                                   np.asarray(cache_s[:, :, :, :S0]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(lg_p), np.asarray(lg_s),
                                   rtol=1e-3, atol=1e-4)

    def test_generate_greedy_matches_full_recompute(self, rng):
        params = init_llama(jax.random.PRNGKey(2), **CFG)
        prompt = jnp.asarray(rng.randint(0, CFG["vocab"], (1, 5)))
        out = llama_generate(params, prompt, jax.random.PRNGKey(0),
                             n_heads=H, n_kv_heads=HKV, max_new_tokens=4,
                             temperature=0.0)
        # replay: each generated token must be the argmax of the full
        # causal forward at its position
        lg = llama_forward(params, out, n_heads=H, n_kv_heads=HKV)
        for i in range(5, 9):
            assert int(out[0, i]) == int(np.asarray(lg)[0, i - 1].argmax())


class TestTrainStepVariants:
    """clip/accum/remat knobs and the ZeRO-1 sharded-optimizer step."""

    def test_remat_matches_plain(self, rng):
        """jax.checkpoint per block changes memory, not math: loss and
        grads equal the non-remat step."""
        params = init_llama(jax.random.PRNGKey(7), **CFG)
        toks = jnp.asarray(rng.randint(0, CFG["vocab"], (2, 16)))
        from laser_tpu.models.llama import _llama_loss_grads

        _, _, l0, g0 = _llama_loss_grads(params, toks, n_heads=H,
                                         n_kv_heads=HKV, window=None,
                                         label_smoothing=0.0)
        _, _, l1, g1 = _llama_loss_grads(params, toks, n_heads=H,
                                         n_kv_heads=HKV, window=None,
                                         label_smoothing=0.0, remat=True)
        np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g0)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)

    def test_accum_matches_full_batch(self, rng):
        params = init_llama(jax.random.PRNGKey(8), **CFG)
        opt = llama_train_init(params)
        toks = jnp.asarray(rng.randint(0, CFG["vocab"], (4, 16)))
        p0, _, l0 = llama_train_step(params, opt, toks, 1, n_heads=H,
                                     n_kv_heads=HKV, lr=3e-3)
        p1, _, l1 = llama_train_step(params, opt, toks, 1, n_heads=H,
                                     n_kv_heads=HKV, lr=3e-3, accum=2,
                                     remat=True)
        np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
        # microbatch summation order shifts tiny second moments; AdamW's
        # rsqrt amplifies that on isolated elements (losses match to
        # 1e-5; the round-5 one-pass CE grad kernel redrew the epsilon
        # lottery and pushed the worst element 2e-5 past the old bar)
        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(p0)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=5e-5)

    def test_clip_norm_caps_update(self, rng):
        """With clip_norm tiny, the update direction is preserved but the
        effective gradient norm is bounded; the step still runs jitted
        with a scheduled lr."""
        import laser_tpu as lt

        params = init_llama(jax.random.PRNGKey(9), **CFG)
        opt = llama_train_init(params)
        toks = jnp.asarray(rng.randint(0, CFG["vocab"], (2, 16)))
        lr = lt.warmup_cosine_lr(1, peak_lr=3e-3, warmup_steps=4,
                                 total_steps=100)
        step = jax.jit(lambda p, o, t, i, lr: llama_train_step(
            p, o, t, i, n_heads=H, n_kv_heads=HKV, lr=lr, clip_norm=1e-3))
        p1, _, loss = step(params, opt, toks, 1, lr)
        assert np.isfinite(float(loss))
        # params moved, but by a bounded amount
        d = max(float(jnp.abs(a - b).max()) for a, b in
                zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(params))
                if a.shape == b.shape)
        assert 0 < d < 1e-2

    @pytest.mark.devices(4)
    def test_zero1_matches_single_device(self, rng):
        """ZeRO-1 (sharded optimizer state, reduce_scatter + all_gather)
        == the plain full-batch AdamW step: same loss, same params. The
        optimizer state comes back SHARDED (1/n per device)."""
        from jax.sharding import Mesh
        from laser_tpu.models.llama import (llama_train_init_zero1,
                                            llama_train_step_zero1)

        mesh = Mesh(np.array(jax.devices()[:4]), ("dp",))
        params = init_llama(jax.random.PRNGKey(10), **CFG)
        toks = jnp.asarray(rng.randint(0, CFG["vocab"], (4, 16)))

        opt = llama_train_init(params)
        p_ref, _, l_ref = llama_train_step(params, opt, toks, 1, n_heads=H,
                                           n_kv_heads=HKV, lr=3e-3,
                                           weight_decay=0.01)
        oz = llama_train_init_zero1(params, mesh)
        p_z, oz2, l_z = llama_train_step_zero1(
            params, oz, toks, 1, mesh, n_heads=H, n_kv_heads=HKV, lr=3e-3,
            weight_decay=0.01)
        np.testing.assert_allclose(float(l_z), float(l_ref), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(p_z),
                        jax.tree_util.tree_leaves(p_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-5)
        # moments live flattened+sharded: each leaf 1-D, padded to n
        for leaf in jax.tree_util.tree_leaves(oz2[0]):
            assert leaf.ndim == 1 and leaf.shape[0] % 4 == 0

    @pytest.mark.devices(4)
    def test_zero1_second_step_and_clip(self, rng):
        """Two chained ZeRO-1 steps (state threading) with clipping stay
        equal to the single-device trajectory."""
        from jax.sharding import Mesh
        from laser_tpu.models.llama import (llama_train_init_zero1,
                                            llama_train_step_zero1)

        mesh = Mesh(np.array(jax.devices()[:4]), ("dp",))
        params = init_llama(jax.random.PRNGKey(11), **CFG)
        toks = jnp.asarray(rng.randint(0, CFG["vocab"], (4, 16)))

        p_r, o_r = params, llama_train_init(params)
        p_z, o_z = params, llama_train_init_zero1(params, mesh)
        for i in (1, 2):
            p_r, o_r, l_r = llama_train_step(p_r, o_r, toks, i, n_heads=H,
                                             n_kv_heads=HKV, lr=3e-3,
                                             clip_norm=0.5)
            p_z, o_z, l_z = llama_train_step_zero1(
                p_z, o_z, toks, i, mesh, n_heads=H, n_kv_heads=HKV,
                lr=3e-3, clip_norm=0.5)
            np.testing.assert_allclose(float(l_z), float(l_r), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(p_z),
                        jax.tree_util.tree_leaves(p_r)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-6)


@pytest.mark.devices(4)
class TestLlamaTensorParallel:
    """Megatron dp x tp training (llama_train_step_tp) vs the single-device
    oracle. The TP layout splits wkv into wk/wv (contiguous head shards);
    llama_tp_merge re-fuses for comparison."""

    def _mesh22(self):
        from laser_tpu.parallel import make_mesh
        return make_mesh({"dp": 2, "tp": 2}, devices=jax.devices()[:4])

    def test_tp_step_matches_single_device(self, rng):
        from laser_tpu.models.llama import (llama_tp_merge, llama_tp_params,
                                            llama_train_step_tp)

        mesh = self._mesh22()
        params = init_llama(jax.random.PRNGKey(12), **CFG)
        toks = jnp.asarray(rng.randint(0, CFG["vocab"], (4, 16)))

        opt = llama_train_init(params)
        p_ref, _, l_ref = llama_train_step(params, opt, toks, 1, n_heads=H,
                                           n_kv_heads=HKV, lr=3e-3,
                                           weight_decay=0.01)

        ptp = llama_tp_params(params, mesh)
        otp = llama_train_init(ptp)
        p_tp, _, l_tp = llama_train_step_tp(
            ptp, otp, toks, 1, mesh, n_heads=H, n_kv_heads=HKV, lr=3e-3,
            weight_decay=0.01)
        np.testing.assert_allclose(float(l_tp), float(l_ref), rtol=1e-5)
        merged = llama_tp_merge(p_tp)
        for (ka, a), (kb, b) in zip(
                jax.tree_util.tree_flatten_with_path(merged)[0],
                jax.tree_util.tree_flatten_with_path(p_ref)[0]):
            assert str(ka) == str(kb)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-5,
                                       err_msg=str(ka))

    def test_tp_two_steps_clip_remat(self, rng):
        """Chained TP steps with clipping + remat track the single-device
        trajectory (clip norm = replicated + psum(tp) shard partials)."""
        from laser_tpu.models.llama import (llama_tp_merge, llama_tp_params,
                                            llama_train_step_tp)

        mesh = self._mesh22()
        params = init_llama(jax.random.PRNGKey(13), **CFG)
        toks = jnp.asarray(rng.randint(0, CFG["vocab"], (4, 16)))

        p_r, o_r = params, llama_train_init(params)
        ptp = llama_tp_params(params, mesh)
        p_t, o_t = ptp, llama_train_init(ptp)
        for i in (1, 2):
            p_r, o_r, l_r = llama_train_step(p_r, o_r, toks, i, n_heads=H,
                                             n_kv_heads=HKV, lr=3e-3,
                                             clip_norm=0.5, remat=True)
            p_t, o_t, l_t = llama_train_step_tp(
                p_t, o_t, toks, i, mesh, n_heads=H, n_kv_heads=HKV,
                lr=3e-3, clip_norm=0.5, remat=True)
            np.testing.assert_allclose(float(l_t), float(l_r), rtol=1e-5)
        merged = llama_tp_merge(p_t)
        for (ka, a), (kb, b) in zip(
                jax.tree_util.tree_flatten_with_path(merged)[0],
                jax.tree_util.tree_flatten_with_path(p_r)[0]):
            # two clipped AdamW steps: the clip scale differs in the last
            # ulp between summation orders and rsqrt amplifies it on
            # near-zero grad elements — atol rides just above that
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=2e-4,
                                       err_msg=str(ka))

    def test_tp_rejects_bad_head_split(self):
        from laser_tpu.models.llama import (llama_tp_params,
                                            llama_train_step_tp)
        from laser_tpu.parallel import make_mesh

        mesh = make_mesh({"dp": 1, "tp": 4}, devices=jax.devices()[:4])
        params = init_llama(jax.random.PRNGKey(14), **CFG)
        ptp = llama_tp_params(params, mesh)
        with pytest.raises(ValueError, match="divide"):
            llama_train_step_tp(ptp, llama_train_init(ptp),
                                jnp.zeros((4, 16), jnp.int32), 1, mesh,
                                n_heads=H, n_kv_heads=HKV)  # HKV=2 % 4 != 0


class TestLlamaMixedPrecision:
    """bf16 compute tree + f32 master weights (llama_cast /
    llama_train_init_mp / llama_train_step_mp) and the ZeRO-1
    mixed-precision composition (master_dtype=...)."""

    def test_mp_step_exact_vs_building_blocks(self, rng):
        """One MP step == grads-from-bf16-tree upcast to f32 -> fused
        AdamW on the f32 masters -> recast. Exact, not approximate."""
        from laser_tpu.models.llama import (_llama_loss_grads, llama_cast,
                                            llama_train_init_mp,
                                            llama_train_step_mp)
        from laser_tpu.ops.optim import adamw_init, adamw_step

        params = llama_cast(init_llama(jax.random.PRNGKey(20), **CFG))
        toks = jnp.asarray(rng.randint(0, CFG["vocab"], (2, 16)))
        opt = llama_train_init_mp(params)
        p1, (m2, v2, master2), loss = llama_train_step_mp(
            params, opt, toks, 1, n_heads=H, n_kv_heads=HKV, lr=3e-3,
            weight_decay=0.01)

        # dtype invariants: compute tree stays bf16, masters/moments f32
        for leaf in jax.tree_util.tree_leaves(
                {k: v for k, v in p1.items()}):
            assert leaf.dtype == jnp.bfloat16
        for leaf in jax.tree_util.tree_leaves((m2, v2, master2)):
            assert leaf.dtype == jnp.float32

        _, train, l0, g = _llama_loss_grads(params, toks, n_heads=H,
                                            n_kv_heads=HKV, window=None,
                                            label_smoothing=0.0)
        g32 = jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), g)
        master0 = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.float32), train)
        zm, zv = adamw_init(master0)
        want_master, _, _ = adamw_step(master0, g32, zm, zv, 1, lr=3e-3,
                                       weight_decay=0.01)
        np.testing.assert_allclose(float(loss), float(l0), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(master2),
                        jax.tree_util.tree_leaves(want_master)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-8)

    def test_mp_trains(self, rng):
        """5 bf16 MP steps reduce the loss (the end-to-end smoke that
        matters: bf16 fwd/bwd + f32 integration converges)."""
        from laser_tpu.models.llama import (llama_cast, llama_train_init_mp,
                                            llama_train_step_mp)

        params = llama_cast(init_llama(jax.random.PRNGKey(21), **CFG))
        toks = jnp.asarray(rng.randint(0, CFG["vocab"], (4, 16)))
        opt = llama_train_init_mp(params)
        p, o = params, opt
        losses = []
        for i in range(5):
            p, o, loss = llama_train_step_mp(p, o, toks, i + 1, n_heads=H,
                                             n_kv_heads=HKV, lr=1e-2,
                                             clip_norm=1.0)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.8, losses

    def test_zero1_mp_exact_on_one_device(self, rng):
        """ZeRO-1 with master_dtype on a 1-device mesh == the plain MP
        step exactly (psum_scatter/all_gather are identities; what's
        left is precisely the master-weight mechanics)."""
        from jax.sharding import Mesh
        from laser_tpu.models.llama import (llama_cast, llama_train_init_mp,
                                            llama_train_init_zero1,
                                            llama_train_step_mp,
                                            llama_train_step_zero1)

        mesh = Mesh(np.array(jax.devices()[:1]), ("dp",))
        params = llama_cast(init_llama(jax.random.PRNGKey(22), **CFG))
        toks = jnp.asarray(rng.randint(0, CFG["vocab"], (2, 16)))

        p_m, (m_m, v_m, ma_m), l_m = llama_train_step_mp(
            params, llama_train_init_mp(params), toks, 1, n_heads=H,
            n_kv_heads=HKV, lr=3e-3, weight_decay=0.01)
        oz = llama_train_init_zero1(params, mesh,
                                    master_dtype=jnp.float32)
        p_z, oz2, l_z = llama_train_step_zero1(
            params, oz, toks, 1, mesh, n_heads=H, n_kv_heads=HKV,
            lr=3e-3, weight_decay=0.01)
        assert len(oz2) == 3
        np.testing.assert_allclose(float(l_z), float(l_m), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(p_z),
                        jax.tree_util.tree_leaves(p_m)):
            assert a.dtype == b.dtype
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-6, atol=1e-8)
        # masters stay f32 and flattened-sharded
        for leaf in jax.tree_util.tree_leaves(oz2[2]):
            assert leaf.dtype == jnp.float32 and leaf.ndim == 1

    @pytest.mark.devices(4)
    def test_zero1_mp_trains_dp4(self, rng):
        """4-way ZeRO-1 mixed precision: bf16 params replicated, f32
        master/moment shards 1/4 per device; loss decreases and the
        state threads across steps."""
        from jax.sharding import Mesh
        from laser_tpu.models.llama import (llama_cast,
                                            llama_train_init_zero1,
                                            llama_train_step_zero1)

        mesh = Mesh(np.array(jax.devices()[:4]), ("dp",))
        params = llama_cast(init_llama(jax.random.PRNGKey(23), **CFG))
        toks = jnp.asarray(rng.randint(0, CFG["vocab"], (4, 16)))
        o = llama_train_init_zero1(params, mesh, master_dtype=jnp.float32)
        p = params
        losses = []
        for i in range(3):
            p, o, loss = llama_train_step_zero1(
                p, o, toks, i + 1, mesh, n_heads=H, n_kv_heads=HKV,
                lr=1e-2, clip_norm=1.0)
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses
        for leaf in jax.tree_util.tree_leaves(p):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                assert leaf.dtype == jnp.bfloat16


@pytest.mark.devices(4)
class TestLlamaPipelineParallel:
    """GPipe pipeline training (llama_train_step_pp) vs the single-device
    oracle: blocks stage-sharded over pp, microbatched schedule, exact
    backward through ppermute + the conjugate broadcast."""

    def test_pp_step_matches_single_device(self, rng):
        from laser_tpu.models.llama import (llama_pp_merge, llama_pp_params,
                                            llama_train_init_pp,
                                            llama_train_step_pp)
        from laser_tpu.parallel import make_mesh

        cfg = dict(CFG, n_layers=4)
        mesh = make_mesh({"pp": 4}, devices=jax.devices()[:4])
        params = init_llama(jax.random.PRNGKey(30), **cfg)
        toks = jnp.asarray(rng.randint(0, cfg["vocab"], (4, 16)))

        p_ref, _, l_ref = llama_train_step(
            params, llama_train_init(params), toks, 1, n_heads=H,
            n_kv_heads=HKV, lr=3e-3, weight_decay=0.01)

        ppp = llama_pp_params(params, mesh)
        p_pp, _, l_pp = llama_train_step_pp(
            ppp, llama_train_init_pp(ppp), toks, 1, mesh, n_micro=2,
            n_heads=H, n_kv_heads=HKV, lr=3e-3, weight_decay=0.01)
        np.testing.assert_allclose(float(l_pp), float(l_ref), rtol=1e-5)
        merged = llama_pp_merge(p_pp)
        # atol 3e-4: the microbatched schedule reorders f32 grad sums and
        # AdamW's step-1 rsqrt amplifies that on near-zero elements
        for (ka, a), (kb, b) in zip(
                jax.tree_util.tree_flatten_with_path(merged)[0],
                jax.tree_util.tree_flatten_with_path(p_ref)[0]):
            assert str(ka) == str(kb)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=3e-4,
                                       err_msg=str(ka))

    def test_pp_two_layers_per_stage(self, rng):
        from laser_tpu.models.llama import (llama_pp_merge, llama_pp_params,
                                            llama_train_init_pp,
                                            llama_train_step_pp)
        from laser_tpu.parallel import make_mesh

        cfg = dict(CFG, n_layers=4)
        mesh = make_mesh({"pp": 2}, devices=jax.devices()[:2])
        params = init_llama(jax.random.PRNGKey(31), **cfg)
        toks = jnp.asarray(rng.randint(0, cfg["vocab"], (4, 16)))

        p_ref, _, l_ref = llama_train_step(
            params, llama_train_init(params), toks, 1, n_heads=H,
            n_kv_heads=HKV, lr=3e-3)
        ppp = llama_pp_params(params, mesh)
        p_pp, _, l_pp = llama_train_step_pp(
            ppp, llama_train_init_pp(ppp), toks, 1, mesh, n_micro=4,
            n_heads=H, n_kv_heads=HKV, lr=3e-3)
        np.testing.assert_allclose(float(l_pp), float(l_ref), rtol=1e-5)
        merged = llama_pp_merge(p_pp)
        for (ka, a), (kb, b) in zip(
                jax.tree_util.tree_flatten_with_path(merged)[0],
                jax.tree_util.tree_flatten_with_path(p_ref)[0]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=3e-4,
                                       err_msg=str(ka))

    def test_pp_rejects_bad_layer_split(self):
        from laser_tpu.models.llama import llama_pp_params
        from laser_tpu.parallel import make_mesh

        mesh = make_mesh({"pp": 3}, devices=jax.devices()[:3])
        params = init_llama(jax.random.PRNGKey(32), **CFG)  # 2 layers
        with pytest.raises(ValueError, match="divide"):
            llama_pp_params(params, mesh)


@pytest.mark.devices(8)
class TestLlama3D:
    """dp x tp x pp in ONE training step vs the single-device oracle."""

    def test_3d_step_matches_single_device(self, rng):
        from laser_tpu.models.llama import (llama_3d_merge, llama_3d_params,
                                            llama_train_init_3d,
                                            llama_train_step_3d)
        from laser_tpu.parallel import make_mesh

        mesh = make_mesh({"dp": 2, "tp": 2, "pp": 2},
                         devices=jax.devices()[:8])
        params = init_llama(jax.random.PRNGKey(50), **CFG)  # 2 layers
        toks = jnp.asarray(rng.randint(0, CFG["vocab"], (4, 16)))

        p_ref, _, l_ref = llama_train_step(
            params, llama_train_init(params), toks, 1, n_heads=H,
            n_kv_heads=HKV, lr=3e-3, weight_decay=0.01, clip_norm=1.0)

        p3 = llama_3d_params(params, mesh)
        p_3d, _, l_3d = llama_train_step_3d(
            p3, llama_train_init_3d(p3), toks, 1, mesh, n_micro=2,
            n_heads=H, n_kv_heads=HKV, lr=3e-3, weight_decay=0.01,
            clip_norm=1.0)
        np.testing.assert_allclose(float(l_3d), float(l_ref), rtol=1e-5)
        merged = llama_3d_merge(p_3d)
        for (ka, a), (kb, b) in zip(
                jax.tree_util.tree_flatten_with_path(merged)[0],
                jax.tree_util.tree_flatten_with_path(p_ref)[0]):
            assert str(ka) == str(kb)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=3e-4,
                                       err_msg=str(ka))

    def test_3d_second_step_threads_state(self, rng):
        from laser_tpu.models.llama import (llama_3d_merge, llama_3d_params,
                                            llama_train_init_3d,
                                            llama_train_step_3d)
        from laser_tpu.parallel import make_mesh

        mesh = make_mesh({"dp": 2, "tp": 2, "pp": 2},
                         devices=jax.devices()[:8])
        params = init_llama(jax.random.PRNGKey(51), **CFG)
        toks = jnp.asarray(rng.randint(0, CFG["vocab"], (4, 16)))

        p_r, o_r = params, llama_train_init(params)
        p3 = llama_3d_params(params, mesh)
        p_t, o_t = p3, llama_train_init_3d(p3)
        for i in (1, 2):
            p_r, o_r, l_r = llama_train_step(p_r, o_r, toks, i, n_heads=H,
                                             n_kv_heads=HKV, lr=3e-3)
            p_t, o_t, l_t = llama_train_step_3d(
                p_t, o_t, toks, i, mesh, n_micro=2, n_heads=H,
                n_kv_heads=HKV, lr=3e-3)
            np.testing.assert_allclose(float(l_t), float(l_r), rtol=1e-5)
        merged = llama_3d_merge(p_t)
        for (ka, a), (kb, b) in zip(
                jax.tree_util.tree_flatten_with_path(merged)[0],
                jax.tree_util.tree_flatten_with_path(p_r)[0]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=5e-4,
                                       err_msg=str(ka))
