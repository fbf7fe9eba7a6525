"""Fused optimizer kernel tests vs reference implementations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import laser_tpu as lt


def ref_adamw(p, g, m, v, t, lr, b1, b2, eps, wd):
    m2 = b1 * m + (1 - b1) * g
    v2 = b2 * v + (1 - b2) * g * g
    mh = m2 / (1 - b1**t)
    vh = v2 / (1 - b2**t)
    p2 = p - lr * (mh / (np.sqrt(vh) + eps) + wd * p)
    return p2, m2, v2


class TestAdamW:
    @pytest.mark.parametrize("backend", ["xla", "pallas"])
    def test_matches_reference(self, rng, backend):
        tree = {"w": rng.randn(37, 130).astype(np.float32),
                "b": rng.randn(129).astype(np.float32)}
        grads = jax.tree_util.tree_map(
            lambda a: rng.randn(*a.shape).astype(np.float32), tree)
        m, v = lt.adamw_init(tree)
        p2, m2, v2 = lt.adamw_step(tree, grads, m, v, 1, lr=1e-2,
                                   weight_decay=0.01, backend=backend)
        for k in tree:
            rp, rm, rv = ref_adamw(tree[k].astype(np.float64), grads[k],
                                   0.0, 0.0, 1, 1e-2, 0.9, 0.999, 1e-8, 0.01)
            np.testing.assert_allclose(np.asarray(p2[k]), rp, rtol=1e-5,
                                       atol=1e-6)
            np.testing.assert_allclose(np.asarray(m2[k]), rm, rtol=1e-5,
                                       atol=1e-7)
            np.testing.assert_allclose(np.asarray(v2[k]), rv, rtol=1e-5,
                                       atol=1e-9)

    @pytest.mark.parametrize("backend", ["xla", "pallas"])
    def test_multi_step_convergence(self, rng, backend):
        # minimize ||p||^2: AdamW must drive p toward 0
        p = {"x": jnp.asarray(rng.randn(64, 128), jnp.float32)}
        m, v = lt.adamw_init(p)
        for t in range(1, 40):
            g = jax.tree_util.tree_map(lambda a: 2 * a, p)
            p, m, v = lt.adamw_step(p, g, m, v, t, lr=0.1, backend=backend)
        assert float(jnp.abs(p["x"]).mean()) < 0.3

    def test_backends_agree(self, rng):
        p = {"x": jnp.asarray(rng.randn(48, 256), jnp.float32)}
        g = {"x": jnp.asarray(rng.randn(48, 256), jnp.float32)}
        m, v = lt.adamw_init(p)
        a = lt.adamw_step(p, g, m, v, 2, lr=1e-3, weight_decay=0.1,
                          backend="xla")
        b = lt.adamw_step(p, g, m, v, 2, lr=1e-3, weight_decay=0.1,
                          backend="pallas")
        for ta, tb in zip(a, b):
            np.testing.assert_allclose(np.asarray(ta["x"]),
                                       np.asarray(tb["x"]), rtol=1e-6,
                                       atol=1e-7)

    def test_traced_lr_no_retrace(self, rng):
        # lr as a traced scalar inside jit (schedule) must work
        p = {"x": jnp.ones((32, 128), jnp.float32)}
        m, v = lt.adamw_init(p)

        @jax.jit
        def step(p, m, v, lr):
            g = jax.tree_util.tree_map(jnp.ones_like, p)
            return lt.adamw_step(p, g, m, v, 1, lr=lr)

        p1, _, _ = step(p, m, v, jnp.float32(0.1))
        p2, _, _ = step(p, m, v, jnp.float32(0.2))
        assert float(p1["x"][0, 0]) != float(p2["x"][0, 0])


class TestSGDM:
    def test_matches_reference(self, rng):
        p = rng.randn(100).astype(np.float32)
        g = rng.randn(100).astype(np.float32)
        mom = rng.randn(100).astype(np.float32)
        p2, m2 = lt.sgd_momentum_step(p, g, mom, lr=0.1, mu=0.9,
                                      backend="pallas")
        m_ref = np.float32(0.9) * mom + g  # f32 arithmetic like the kernel
        np.testing.assert_allclose(np.asarray(m2), m_ref, rtol=1e-6,
                                   atol=1e-7)
        np.testing.assert_allclose(np.asarray(p2), p - np.float32(0.1) * m_ref,
                                   rtol=1e-5, atol=1e-6)

    def test_nesterov(self, rng):
        p = rng.randn(50).astype(np.float32)
        g = rng.randn(50).astype(np.float32)
        mom = np.zeros(50, np.float32)
        p2, m2 = lt.sgd_momentum_step(p, g, mom, lr=0.1, mu=0.9,
                                      nesterov=True)
        m_ref = g
        np.testing.assert_allclose(np.asarray(p2), p - 0.1 * (g + 0.9 * m_ref),
                                   rtol=1e-5, atol=1e-6)


class TestTrainUtils:
    """Schedules, clipping, gradient accumulation (ops/optim.py additions).

    Parity-plus production-training surface; oracles are NumPy f64 math
    and the unaccumulated value_and_grad."""

    def test_global_norm_matches_numpy(self, rng):
        tree = {"a": rng.randn(13, 7).astype(np.float32),
                "b": [rng.randn(5).astype(np.float32),
                      rng.randn(2, 2, 2).astype(np.float32)]}
        want = np.sqrt(sum(
            np.sum(np.square(l.astype(np.float64)))
            for l in jax.tree_util.tree_leaves(tree)))
        np.testing.assert_allclose(float(lt.global_norm(tree)), want,
                                   rtol=1e-6)

    def test_clip_identity_below_bound(self, rng):
        g = {"w": (rng.randn(8, 8) * 1e-3).astype(np.float32)}
        clipped, norm = lt.clip_by_global_norm(g, 10.0)
        # scale is exactly 1 on the common path: bitwise identity
        np.testing.assert_array_equal(np.asarray(clipped["w"]), g["w"])
        assert float(norm) < 10.0

    def test_clip_scales_to_bound(self, rng):
        g = {"w": rng.randn(64, 32).astype(np.float32) * 100.0}
        clipped, norm = lt.clip_by_global_norm(g, 1.0)
        assert float(norm) > 1.0
        np.testing.assert_allclose(float(lt.global_norm(clipped)), 1.0,
                                   rtol=1e-5)
        # direction preserved
        np.testing.assert_allclose(
            np.asarray(clipped["w"]) * float(norm), g["w"], rtol=1e-4,
            atol=1e-5)

    def test_warmup_cosine_shape(self):
        lr = lambda s: float(lt.warmup_cosine_lr(
            s, peak_lr=1e-3, warmup_steps=10, total_steps=110, end_lr=1e-5))
        assert lr(0) == 0.0
        np.testing.assert_allclose(lr(5), 5e-4, rtol=1e-6)   # mid warmup
        np.testing.assert_allclose(lr(10), 1e-3, rtol=1e-6)  # peak
        np.testing.assert_allclose(lr(60), (1e-3 + 1e-5) / 2, rtol=1e-5)
        np.testing.assert_allclose(lr(110), 1e-5, rtol=1e-4)  # floor
        np.testing.assert_allclose(lr(500), 1e-5, rtol=1e-4)  # clamped past
        vals = [lr(s) for s in range(0, 11)]
        assert all(b >= a for a, b in zip(vals, vals[1:]))  # monotone warmup

    def test_inverse_sqrt_shape(self):
        lr = lambda s: float(lt.inverse_sqrt_lr(
            s, peak_lr=1e-3, warmup_steps=16))
        np.testing.assert_allclose(lr(8), 5e-4, rtol=1e-6)
        np.testing.assert_allclose(lr(16), 1e-3, rtol=1e-6)
        np.testing.assert_allclose(lr(64), 1e-3 * np.sqrt(16 / 64), rtol=1e-6)

    def test_accumulated_matches_full_batch(self, rng):
        """accum=4 microbatch scan == one full-batch value_and_grad for a
        mean-reduced loss (equal microbatches)."""
        W = jnp.asarray(rng.randn(12, 5), jnp.float32)
        x = jnp.asarray(rng.randn(16, 12), jnp.float32)
        y = jnp.asarray(rng.randn(16, 5), jnp.float32)

        def loss(w, xb, yb):
            return jnp.mean((xb @ w - yb) ** 2)

        l_ref, g_ref = jax.value_and_grad(loss)(W, x, y)
        l_acc, g_acc = jax.jit(lt.accumulated_value_and_grad(loss, 4))(
            W, x, y)
        np.testing.assert_allclose(float(l_acc), float(l_ref), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g_acc), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-6)

    def test_accumulated_rejects_indivisible(self, rng):
        def loss(w, xb):
            return jnp.mean(w * xb)

        with pytest.raises(ValueError, match="divisible"):
            lt.accumulated_value_and_grad(loss, 3)(
                jnp.ones(()), jnp.ones((8, 2)))
