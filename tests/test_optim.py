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
