"""MoE transformer model family: forward oracle, training, EP sharding.

The contract mirrors the other model families' tests: the kernel-composed
model must match a pure-jnp oracle, the training step must descend, and the
expert-parallel step over the CPU mesh must reproduce the single-device
step exactly (loss AND updated parameters) — the custom-VJP collective
boundary in models/moe.py:_ep_moe_ffn is what that equality certifies.
"""

import jax
import jax.numpy as jnp
import os

import numpy as np
import pytest

from laser_tpu.models.moe import (init_moe_transformer, load_balance_loss,
                                  moe_lm_loss, moe_train_step,
                                  moe_train_step_ep,
                                  moe_transformer_forward)
from laser_tpu.parallel import make_mesh

CFG = dict(n_layers=2, d_model=32, n_heads=2, d_ff=48, vocab=64,
           n_experts=4)


@pytest.fixture(scope="module")
def params():
    return init_moe_transformer(jax.random.PRNGKey(7), **CFG)


@pytest.fixture(scope="module")
def mesh_ep4():
    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    return make_mesh({"ep": 4}, devices=jax.devices()[:4])


def _oracle_forward(params, tokens, n_heads, top_k):
    """Pure-jnp reimplementation (no laser kernels). Matmuls pinned to
    HIGHEST: the product path pins f32 precision, and TPU's default dot
    is 1-pass bf16 — unpinned the 2e-4 bars fail on hardware while
    passing in the CPU interpreter (PERF_NOTES "precision semantics")."""
    with jax.default_matmul_precision("highest"):
        return _oracle_forward_body(params, tokens, n_heads, top_k)


def _oracle_forward_body(params, tokens, n_heads, top_k):
    def ln(x, g, b):
        m = x.mean(-1, keepdims=True)
        v = ((x - m) ** 2).mean(-1, keepdims=True)
        return (x - m) / jnp.sqrt(v + 1e-6) * g + b

    x = params["embed"][tokens]
    B, S, D = x.shape
    hd = D // n_heads
    aux = 0.0
    for blk in params["blocks"]:
        h = ln(x, blk["ln1_g"], blk["ln1_b"])
        qkv = h.reshape(B * S, D) @ blk["wqkv"] + blk["bqkv"]
        q, k, v = jnp.split(qkv.reshape(B, S, 3 * D), 3, axis=-1)

        def heads(t):
            return t.reshape(B, S, n_heads, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(q), heads(k), heads(v)
        s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / np.sqrt(hd)
        mask = jnp.tril(jnp.ones((S, S), bool))
        s = jnp.where(mask, s, -jnp.inf)
        o = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), vh)
        o = o.transpose(0, 2, 1, 3).reshape(B * S, D)
        x = x + (o @ blk["wo"] + blk["bo"]).reshape(B, S, D)

        h = ln(x, blk["ln2_g"], blk["ln2_b"]).reshape(B * S, D)
        moe = blk["moe"]
        logits = h @ moe["router"]
        vals, _ = jax.lax.top_k(logits, 2)
        masked = jnp.where(logits >= vals[:, -1:], logits, -jnp.inf)
        gates = jax.nn.softmax(masked, -1)
        out = jnp.zeros_like(h)
        for e in range(moe["router"].shape[1]):
            he = jnp.maximum(h @ moe["w1"][e], 0) @ moe["w2"][e]
            out = out + gates[:, e:e + 1] * he
        aux = aux + load_balance_loss(logits, gates)
        x = x + out.reshape(B, S, D)
    x = ln(x, params["lnf_g"], params["lnf_b"])
    return (x.reshape(B * S, D) @ params["embed"].T).reshape(B, S, -1), \
        aux / len(params["blocks"])


class TestMoEModel:
    def test_forward_matches_oracle(self, rng, params):
        tokens = jnp.asarray(rng.randint(0, CFG["vocab"], (2, 16)), jnp.int32)
        got, aux = moe_transformer_forward(params, tokens, n_heads=2)
        want, aux_w = _oracle_forward(params, tokens, 2, 2)
        # chip bar: flash-vs-dense attention and kernel-vs-einsum f32
        # differences compound to ~1e-3 max at one position (measured
        # round 5: max 1.03e-3, mean 8e-5, aux within 5e-5; no expert
        # flip) - interpret mode keeps the strict 2e-4
        tol = 4e-3 if os.environ.get("LASER_TEST_BACKEND") == "tpu" else 2e-4
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=tol, atol=tol)
        np.testing.assert_allclose(float(aux), float(aux_w),
                                   rtol=(5e-4 if tol > 2e-4 else 1e-5))

    def test_aux_loss_uniform_router_is_one(self):
        # a perfectly uniform router: f_e = 1/E (ties broken by argmax are
        # fine — every token picks expert 0), p_e = 1/E -> loss == 1
        T, E = 64, 8
        logits = jnp.zeros((T, E))
        gates = jax.nn.softmax(logits, -1)
        v = float(load_balance_loss(logits, gates))
        assert abs(v - 1.0) < 1e-6

    def test_train_step_descends(self, rng, params):
        tokens = jnp.asarray(rng.randint(0, CFG["vocab"], (4, 16)),
                             jnp.int32)
        p = params
        l0 = float(moe_lm_loss(p, tokens, n_heads=2))
        for _ in range(3):
            p, loss = moe_train_step(p, tokens, n_heads=2, lr=5e-2)
        l1 = float(moe_lm_loss(p, tokens, n_heads=2))
        assert l1 < l0

    def test_gradients_flow_to_every_param(self, rng, params):
        tokens = jnp.asarray(rng.randint(0, CFG["vocab"], (2, 8)),
                             jnp.int32)
        grads = jax.grad(moe_lm_loss)(params, tokens, n_heads=2)
        flat, _ = jax.tree_util.tree_flatten(grads)
        # router + experts + attention all receive nonzero gradient
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)
        gb = grads["blocks"][0]
        for name in ("wqkv", "wo"):
            assert float(jnp.abs(gb[name]).max()) > 0
        assert float(jnp.abs(gb["moe"]["router"]).max()) > 0
        assert float(jnp.abs(gb["moe"]["w1"]).max()) > 0


class TestMoEExpertParallel:
    def test_ep_step_matches_single_device(self, rng, params, mesh_ep4):
        tokens = jnp.asarray(rng.randint(0, CFG["vocab"], (2, 16)),
                             jnp.int32)
        new_ref, loss_ref = moe_train_step(params, tokens, n_heads=2,
                                           lr=1e-2)
        new_ep, loss_ep = moe_train_step_ep(params, tokens, mesh_ep4,
                                            n_heads=2, lr=1e-2)
        np.testing.assert_allclose(float(loss_ep), float(loss_ref),
                                   rtol=1e-5)
        ref_flat, treedef = jax.tree_util.tree_flatten(new_ref)
        ep_flat, treedef2 = jax.tree_util.tree_flatten(new_ep)
        assert treedef == treedef2
        for a, b in zip(ref_flat, ep_flat):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-4, atol=2e-5)

    def test_ep_rejects_indivisible_experts(self, params, mesh_ep4):
        bad = init_moe_transformer(jax.random.PRNGKey(1), n_layers=1,
                                   d_model=32, n_heads=2, d_ff=48,
                                   vocab=64, n_experts=6)
        with pytest.raises(ValueError, match="not divisible"):
            moe_train_step_ep(bad, jnp.zeros((1, 8), jnp.int32), mesh_ep4,
                              n_heads=2)


class TestClipNorm:
    def test_ep_clip_matches_single_device(self, params, mesh_ep4, rng):
        """Gradient clipping under expert sharding: the mixed
        replicated+psum global norm must reproduce the single-device
        clipped step (every element counted exactly once)."""
        toks = jnp.asarray(rng.randint(0, CFG["vocab"], (2, 16)))
        new_ref, l_ref = moe_train_step(params, toks, n_heads=2, lr=1e-2,
                                        clip_norm=0.05)
        new_ep, l_ep = moe_train_step_ep(params, toks, mesh_ep4, n_heads=2,
                                         lr=1e-2, clip_norm=0.05)
        np.testing.assert_allclose(float(l_ep), float(l_ref), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(new_ep),
                        jax.tree_util.tree_leaves(new_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-5)
