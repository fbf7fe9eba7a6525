"""Paged attention + continuous-batching serving engine.

Gold property: the engine's generated tokens for every request match the
dense ``greedy_decode`` on that request alone — regardless of how requests
interleave, which slots they land in, or how pages are recycled.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laser_tpu.models.transformer import greedy_decode, init_transformer
from laser_tpu.ops.paged_attention import (paged_attention,
                                           paged_attention_reference)
from laser_tpu.serving import ServingConfig, ServingEngine


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(0xDEADBEEF)


class TestPagedAttention:
    def test_vs_reference_mixed_lengths(self, rng):
        S, Hq, hd, ps, P, mp = 4, 8, 64, 16, 32, 6
        q = jnp.asarray(rng.randn(S, Hq, hd), jnp.float32)
        kp = jnp.asarray(rng.randn(P, Hq, ps, hd), jnp.float32)
        vp = jnp.asarray(rng.randn(P, Hq, ps, hd), jnp.float32)
        tables = jnp.asarray(rng.permutation(P)[:S * mp].reshape(S, mp),
                             jnp.int32)
        lengths = jnp.asarray([0, 1, 37, 96], jnp.int32)
        got = paged_attention(q, kp, vp, tables, lengths)
        want = paged_attention_reference(q, kp, vp, tables, lengths)
        assert np.abs(np.asarray(got - want)).max() < 1e-5
        # inactive slot produces zeros
        assert np.all(np.asarray(got)[0] == 0.0)

    def test_gqa(self, rng):
        S, Hq, Hkv, hd, ps, P, mp = 3, 8, 2, 64, 16, 24, 4
        q = jnp.asarray(rng.randn(S, Hq, hd), jnp.float32)
        kp = jnp.asarray(rng.randn(P, Hkv, ps, hd), jnp.float32)
        vp = jnp.asarray(rng.randn(P, Hkv, ps, hd), jnp.float32)
        tables = jnp.asarray(rng.permutation(P)[:S * mp].reshape(S, mp),
                             jnp.int32)
        lengths = jnp.asarray([5, 64, 33], jnp.int32)
        got = paged_attention(q, kp, vp, tables, lengths)
        want = paged_attention_reference(q, kp, vp, tables, lengths)
        assert np.abs(np.asarray(got - want)).max() < 1e-5

    def test_int8_quantized_pools(self, rng):
        # the EXACT tier (paged_quant_mode="k3v3"): kernel(int8 pools +
        # scales) must match the f32 reference run on the DEQUANTIZED
        # pools to kernel arithmetic tolerance
        from laser_tpu.config import config_override
        from laser_tpu.ops.paged_attention import quantize_kv

        S, H, hd, ps, P, mp = 3, 8, 64, 16, 24, 4
        q = jnp.asarray(rng.randn(S, H, hd), jnp.float32)
        kp = jnp.asarray(rng.randn(P, H, ps, hd), jnp.float32)
        vp = jnp.asarray(rng.randn(P, H, ps, hd), jnp.float32)
        kq, ks = quantize_kv(kp)
        vq, vs = quantize_kv(vp)
        tables = jnp.asarray(rng.permutation(P)[:S * mp].reshape(S, mp),
                             jnp.int32)
        lengths = jnp.asarray([3, 40, 64], jnp.int32)
        with config_override(paged_quant_mode="k3v3"):
            got = paged_attention(q, kq, vq, tables, lengths,
                                  k_scale=ks, v_scale=vs)
        kd = kq.astype(jnp.float32) * ks[..., None]
        vd = vq.astype(jnp.float32) * vs[..., None]
        want = paged_attention_reference(q, kd, vd, tables, lengths)
        assert np.abs(np.asarray(got - want)).max() < 1e-5
        # and the dequantized result is close to the unquantized one
        full = paged_attention_reference(q, kp, vp, tables, lengths)
        assert np.abs(np.asarray(got - full)).max() < 0.05

    def test_int8_fast_tier_error_budget(self, rng):
        # the DEFAULT tier ("k1v1", round-5 probe): its compute error
        # must stay well under the int8 STORAGE error that defines the
        # quality class (measured on-chip: 3.1e-5 compute vs 1.18e-4
        # storage at the bench shape). Certified here relatively: the
        # fast tier sits within half the storage error of the exact tier.
        from laser_tpu.config import config_override
        from laser_tpu.ops.paged_attention import quantize_kv

        S, H, hd, ps, P, mp = 3, 8, 64, 16, 24, 4
        q = jnp.asarray(rng.randn(S, H, hd), jnp.float32)
        kp = jnp.asarray(rng.randn(P, H, ps, hd), jnp.float32)
        vp = jnp.asarray(rng.randn(P, H, ps, hd), jnp.float32)
        kq, ks = quantize_kv(kp)
        vq, vs = quantize_kv(vp)
        tables = jnp.asarray(rng.permutation(P)[:S * mp].reshape(S, mp),
                             jnp.int32)
        lengths = jnp.asarray([5, 64, 33], jnp.int32)
        fast = paged_attention(q, kq, vq, tables, lengths,
                               k_scale=ks, v_scale=vs)
        with config_override(paged_quant_mode="k3v3"):
            exact = paged_attention(q, kq, vq, tables, lengths,
                                    k_scale=ks, v_scale=vs)
        full = paged_attention_reference(q, kp, vp, tables, lengths)
        storage_err = np.abs(np.asarray(exact - full)).max()
        compute_err = np.abs(np.asarray(fast - exact)).max()
        assert compute_err < 0.5 * storage_err, (compute_err, storage_err)

    def test_int8_pools_magnitude_spread(self, rng):
        # the EXACT tier runs 3-limb bf16 dots (exact: int8 rows fit
        # bf16; q split into 3 bf16 limbs covers f32's 24 mantissa
        # bits). Adversarial q with a wide exponent spread must still
        # match the dequantized-f32 oracle at kernel tolerance.
        from laser_tpu.config import config_override
        from laser_tpu.ops.paged_attention import quantize_kv

        S, H, hd, ps, P, mp = 2, 4, 64, 16, 12, 3
        mag = 10.0 ** rng.uniform(-3, 2, (S, H, hd))
        q = jnp.asarray(rng.randn(S, H, hd) * mag * 0.05, jnp.float32)
        kp = jnp.asarray(rng.randn(P, H, ps, hd), jnp.float32)
        vp = jnp.asarray(rng.randn(P, H, ps, hd), jnp.float32)
        kq, ks = quantize_kv(kp)
        vq, vs = quantize_kv(vp)
        tables = jnp.asarray(rng.permutation(P)[:S * mp].reshape(S, mp),
                             jnp.int32)
        lengths = jnp.asarray([17, 48], jnp.int32)
        with config_override(paged_quant_mode="k3v3"):
            got = paged_attention(q, kq, vq, tables, lengths,
                                  k_scale=ks, v_scale=vs)
        kd = kq.astype(jnp.float32) * ks[..., None]
        vd = vq.astype(jnp.float32) * vs[..., None]
        want = paged_attention_reference(q, kd, vd, tables, lengths)
        assert np.abs(np.asarray(got - want)).max() < 1e-5

    def test_shared_pages_between_sequences(self, rng):
        # two sequences whose tables point at the SAME pages (prefix
        # sharing): outputs must agree where lengths agree
        S, H, hd, ps, P = 2, 8, 128, 16, 8
        q1 = rng.randn(1, H, hd).astype(np.float32)
        q = jnp.asarray(np.concatenate([q1, q1]))
        kp = jnp.asarray(rng.randn(P, H, ps, hd), jnp.float32)
        vp = jnp.asarray(rng.randn(P, H, ps, hd), jnp.float32)
        tables = jnp.asarray([[2, 5], [2, 5]], jnp.int32)
        lengths = jnp.asarray([30, 30], jnp.int32)
        got = np.asarray(paged_attention(q, kp, vp, tables, lengths))
        assert np.array_equal(got[0], got[1])


def _make_model(rng):
    key = jax.random.PRNGKey(7)
    params = init_transformer(key, n_layers=2, d_model=128, n_heads=8,
                              d_ff=256, vocab=97)
    return params


class TestPagedWindowAttention:
    """W-query verify kernel over paged KV (speculative verify on pages)."""

    @pytest.fixture
    def rng(self):
        return np.random.RandomState(7)

    def _mk(self, rng, S, H, Hkv, hd, ps, P, mp):
        kp = jnp.asarray(rng.randn(P, Hkv, ps, hd), jnp.float32)
        vp = jnp.asarray(rng.randn(P, Hkv, ps, hd), jnp.float32)
        tables = jnp.asarray(rng.permutation(P)[:S * mp].reshape(S, mp),
                             jnp.int32)
        return kp, vp, tables

    def test_matches_oracle_mha(self, rng):
        from laser_tpu.ops.paged_attention import (
            paged_window_attention, paged_window_attention_reference)

        S, H, hd, ps, P, mp, W = 3, 4, 64, 16, 18, 4, 4
        kp, vp, tables = self._mk(rng, S, H, H, hd, ps, P, mp)
        q = jnp.asarray(rng.randn(S, W, H, hd), jnp.float32)
        # length == W (pure prefill-verify), mid, full; 0 = inactive
        lengths = jnp.asarray([4, 37, 64], jnp.int32)
        got = paged_window_attention(q, kp, vp, tables, lengths)
        want = paged_window_attention_reference(q, kp, vp, tables, lengths)
        assert np.abs(np.asarray(got - want)).max() < 1e-5

    def test_inactive_slot_zeros(self, rng):
        from laser_tpu.ops.paged_attention import paged_window_attention

        S, H, hd, ps, P, mp, W = 2, 4, 64, 16, 12, 3, 4
        kp, vp, tables = self._mk(rng, S, H, H, hd, ps, P, mp)
        q = jnp.asarray(rng.randn(S, W, H, hd), jnp.float32)
        lengths = jnp.asarray([20, 0], jnp.int32)
        got = np.asarray(paged_window_attention(q, kp, vp, tables, lengths))
        assert np.all(got[1] == 0)

    def test_gqa(self, rng):
        from laser_tpu.ops.paged_attention import (
            paged_window_attention, paged_window_attention_reference)

        S, Hq, Hkv, hd, ps, P, mp, W = 2, 8, 2, 64, 16, 12, 3, 3
        kp, vp, tables = self._mk(rng, S, Hq, Hkv, hd, ps, P, mp)
        q = jnp.asarray(rng.randn(S, W, Hq, hd), jnp.float32)
        lengths = jnp.asarray([11, 48], jnp.int32)
        got = paged_window_attention(q, kp, vp, tables, lengths)
        want = paged_window_attention_reference(q, kp, vp, tables, lengths)
        assert np.abs(np.asarray(got - want)).max() < 1e-5

    def test_w_wider_than_page(self, rng):
        # W > ps: a query's own page span covers several pages; late rows
        # are fully masked in early pages (the explicit p-zeroing path)
        from laser_tpu.ops.paged_attention import (
            paged_window_attention, paged_window_attention_reference)

        S, H, hd, ps, P, mp, W = 2, 4, 64, 8, 14, 6, 12
        kp, vp, tables = self._mk(rng, S, H, H, hd, ps, P, mp)
        q = jnp.asarray(rng.randn(S, W, H, hd), jnp.float32)
        lengths = jnp.asarray([12, 45], jnp.int32)
        got = paged_window_attention(q, kp, vp, tables, lengths)
        want = paged_window_attention_reference(q, kp, vp, tables, lengths)
        assert np.abs(np.asarray(got - want)).max() < 1e-5

    def test_sliding_window(self, rng):
        from laser_tpu.ops.paged_attention import (
            paged_window_attention, paged_window_attention_reference)

        S, H, hd, ps, P, mp, W = 2, 4, 64, 16, 12, 3, 4
        kp, vp, tables = self._mk(rng, S, H, H, hd, ps, P, mp)
        q = jnp.asarray(rng.randn(S, W, H, hd), jnp.float32)
        lengths = jnp.asarray([29, 48], jnp.int32)
        for win in (5, 17, 40):
            got = paged_window_attention(q, kp, vp, tables, lengths,
                                         window=win)
            want = paged_window_attention_reference(
                q, kp, vp, tables, lengths, window=win)
            assert np.abs(np.asarray(got - want)).max() < 1e-5, win

    def test_int8_pools(self, rng):
        from laser_tpu.ops.paged_attention import (
            paged_window_attention, paged_window_attention_reference,
            quantize_kv)

        S, H, hd, ps, P, mp, W = 2, 4, 64, 16, 12, 3, 4
        kp, vp, tables = self._mk(rng, S, H, H, hd, ps, P, mp)
        kq, ks = quantize_kv(kp)
        vq, vs = quantize_kv(vp)
        q = jnp.asarray(rng.randn(S, W, H, hd), jnp.float32)
        lengths = jnp.asarray([17, 48], jnp.int32)
        from laser_tpu.config import config_override
        with config_override(paged_quant_mode="k3v3"):  # exact tier
            got = paged_window_attention(q, kq, vq, tables, lengths,
                                         k_scale=ks, v_scale=vs)
        kd = kq.astype(jnp.float32) * ks[..., None]
        vd = vq.astype(jnp.float32) * vs[..., None]
        want = paged_window_attention_reference(q, kd, vd, tables, lengths)
        assert np.abs(np.asarray(got - want)).max() < 1e-5

    def test_w1_equals_single_query(self, rng):
        from laser_tpu.ops.paged_attention import paged_window_attention

        S, H, hd, ps, P, mp = 3, 4, 64, 16, 18, 4
        kp, vp, tables = self._mk(rng, S, H, H, hd, ps, P, mp)
        q1 = jnp.asarray(rng.randn(S, H, hd), jnp.float32)
        lengths = jnp.asarray([5, 33, 64], jnp.int32)
        got = paged_window_attention(q1[:, None], kp, vp, tables, lengths)
        want = paged_attention(q1, kp, vp, tables, lengths)
        assert np.abs(np.asarray(got[:, 0] - want)).max() < 1e-6


class TestServingEngine:
    def test_tokens_match_dense_decode(self, rng):
        params = _make_model(rng)
        cfg = ServingConfig(page_size=16, n_pages=64, max_seqs=3,
                            max_pages_per_seq=8,
                            prefill_buckets=(16, 32, 64))
        eng = ServingEngine(params, n_heads=8, cfg=cfg)
        prompts = [rng.randint(0, 97, n).astype(np.int32)
                   for n in (5, 17, 31, 9, 16)]
        new = [6, 4, 5, 7, 3]
        ids = [eng.add_request(p, m) for p, m in zip(prompts, new)]
        out = eng.run()
        assert set(out) == set(ids)
        for p, m, rid in zip(prompts, new, ids):
            want = np.asarray(greedy_decode(
                params, jnp.asarray(p[None]), n_heads=8, max_new_tokens=m))
            assert out[rid] == list(want[0, len(p):]), (
                f"req {rid}: {out[rid]} != {list(want[0, len(p):])}")

    def test_continuous_batching_reuses_slots_and_pages(self, rng):
        params = _make_model(rng)
        cfg = ServingConfig(page_size=16, n_pages=16, max_seqs=2,
                            max_pages_per_seq=4, prefill_buckets=(16, 32))
        eng = ServingEngine(params, n_heads=8, cfg=cfg)
        # 5 requests through 2 slots and a 15-page pool forces slot reuse
        # and page recycling
        prompts = [rng.randint(0, 97, n).astype(np.int32)
                   for n in (14, 30, 8, 16, 25)]
        ids = [eng.add_request(p, 4) for p in prompts]
        out = eng.run()
        assert set(out) == set(ids)
        assert eng.cache.n_free() == cfg.n_pages - 1  # all pages returned
        for p, rid in zip(prompts, ids):
            want = np.asarray(greedy_decode(
                params, jnp.asarray(p[None]), n_heads=8, max_new_tokens=4))
            assert out[rid] == list(want[0, len(p):])

    def test_kv_quant_engine(self, rng):
        # int8 KV cache end to end: every request completes, pages recycle,
        # and generations stay close to the f32-cache engine (greedy argmax
        # may legitimately flip under quantization on a random tiny model,
        # so compare prefix agreement, not strict equality)
        params = _make_model(rng)
        cfg = ServingConfig(page_size=16, n_pages=32, max_seqs=2,
                            max_pages_per_seq=6, prefill_buckets=(16, 32),
                            kv_quant=True)
        eng = ServingEngine(params, n_heads=8, cfg=cfg)
        assert eng.cache.state["pools"].dtype == jnp.int8
        prompts = [rng.randint(0, 97, n).astype(np.int32)
                   for n in (9, 20, 30)]
        ids = [eng.add_request(p, 4) for p in prompts]
        out = eng.run()
        assert set(out) == set(ids)
        assert eng.cache.n_free() == cfg.n_pages - 1
        agree = total = 0
        for p, rid in zip(prompts, ids):
            want = np.asarray(greedy_decode(
                params, jnp.asarray(p[None]), n_heads=8,
                max_new_tokens=4))[0, len(p):]
            # the FIRST token comes from the unquantized prefill forward
            # and must agree exactly
            assert out[rid][0] == int(want[0])
            agree += sum(int(a) == int(b) for a, b in zip(out[rid], want))
            total += len(want)
        assert agree / total > 0.7, f"only {agree}/{total} tokens agree"

    def test_weight_quant_engine(self, rng):
        # weight-only int8: per-output-column scales on every block linear;
        # generations close to the full-precision engine (same agreement-
        # rate bar as kv_quant: int8 weight error can flip near-tie argmax)
        params = _make_model(rng)
        cfg = ServingConfig(page_size=16, n_pages=32, max_seqs=2,
                            max_pages_per_seq=6, prefill_buckets=(16, 32),
                            weight_quant=True)
        eng = ServingEngine(params, n_heads=8, cfg=cfg)
        assert eng.params["blocks"][0]["wqkv"]["q"].dtype == jnp.int8
        assert eng.params["embed"].dtype == jnp.float32  # not quantized
        prompts = [rng.randint(0, 97, n).astype(np.int32)
                   for n in (9, 20, 30)]
        ids = [eng.add_request(p, 4) for p in prompts]
        out = eng.run()
        assert set(out) == set(ids)
        assert eng.cache.n_free() == cfg.n_pages - 1
        agree = total = 0
        for p, rid in zip(prompts, ids):
            want = np.asarray(greedy_decode(
                params, jnp.asarray(p[None]), n_heads=8,
                max_new_tokens=4))[0, len(p):]
            agree += sum(int(a) == int(b) for a, b in zip(out[rid], want))
            total += len(want)
        assert agree / total > 0.7, f"only {agree}/{total} tokens agree"

    def test_weight_quant_dequant_error_bound(self, rng):
        from laser_tpu.serving.engine import _quantize_weight

        w = jnp.asarray(rng.randn(64, 96), jnp.float32)
        qd = _quantize_weight(w)
        back = qd["q"].astype(jnp.float32) * qd["s"][None, :]
        # symmetric int8: error <= scale/2 = colmax/254 per element
        bound = np.abs(np.asarray(w)).max(0) / 254.0 + 1e-8
        assert np.all(np.abs(np.asarray(back - w)) <= bound[None, :])

    def test_llama_family_gqa_rope(self, rng):
        # modern decoder schema: RoPE positions differ per slot under
        # continuous batching; GQA pools hold Hkv < Hq heads
        from laser_tpu.models.llama import init_llama, llama_generate

        params = init_llama(jax.random.PRNGKey(3), n_layers=2, d_model=128,
                            n_heads=8, n_kv_heads=2, d_ff=256, vocab=97,
                            max_len=256)
        cfg = ServingConfig(page_size=16, n_pages=32, max_seqs=2,
                            max_pages_per_seq=6, prefill_buckets=(16, 32, 64))
        eng = ServingEngine(params, n_heads=8, cfg=cfg, model="llama")
        assert eng.n_kv_heads == 2
        prompts = [rng.randint(0, 97, n).astype(np.int32)
                   for n in (7, 21, 40)]
        ids = [eng.add_request(p, 5) for p in prompts]
        out = eng.run()
        for p, rid in zip(prompts, ids):
            want = np.asarray(llama_generate(
                params, jnp.asarray(p[None]), jax.random.PRNGKey(0),
                n_heads=8, n_kv_heads=2, max_new_tokens=5, temperature=0.0))
            assert out[rid] == list(want[0, len(p):]), (
                f"req {rid}: {out[rid]} != {list(want[0, len(p):])}")

    @pytest.mark.devices(4)
    def test_tensor_parallel_llama_serving(self, rng):
        # megatron-split llama decode over a tp mesh: token-identical to
        # the single-device engine (and thus to dense llama_generate)
        from laser_tpu.models.llama import init_llama, llama_generate
        from laser_tpu.parallel.mesh import make_mesh

        params = init_llama(jax.random.PRNGKey(5), n_layers=2, d_model=128,
                            n_heads=8, n_kv_heads=4, d_ff=256, vocab=97,
                            max_len=256)
        mesh = make_mesh({"tp": 4}, devices=jax.devices()[:4])
        cfg = ServingConfig(page_size=16, n_pages=32, max_seqs=2,
                            max_pages_per_seq=6, prefill_buckets=(16, 32, 64))
        eng = ServingEngine(params, n_heads=8, cfg=cfg, model="llama",
                            mesh=mesh)
        prompts = [rng.randint(0, 97, n).astype(np.int32)
                   for n in (9, 26, 40)]
        ids = [eng.add_request(p, 5) for p in prompts]
        out = eng.run()
        for p, rid in zip(prompts, ids):
            want = np.asarray(llama_generate(
                params, jnp.asarray(p[None]), jax.random.PRNGKey(0),
                n_heads=8, n_kv_heads=4, max_new_tokens=5, temperature=0.0))
            assert out[rid] == list(want[0, len(p):]), (
                f"req {rid}: {out[rid]} != {list(want[0, len(p):])}")

    def test_preemption_under_page_pressure(self, rng):
        # two growing sequences overflow a 4-page pool: the engine must
        # preempt (requeue with prompt+generated) instead of crashing, and
        # still produce exact greedy outputs
        params = _make_model(rng)
        cfg = ServingConfig(page_size=16, n_pages=5, max_seqs=2,
                            max_pages_per_seq=4, prefill_buckets=(16, 32, 64))
        eng = ServingEngine(params, n_heads=8, cfg=cfg)
        prompts = [rng.randint(0, 97, 16).astype(np.int32) for _ in range(2)]
        ids = [eng.add_request(p, 40) for p in prompts]
        out = eng.run()
        assert eng.stats.get("preemptions", 0) > 0, "no preemption triggered"
        assert eng.cache.n_free() == cfg.n_pages - 1
        for p, rid in zip(prompts, ids):
            want = np.asarray(greedy_decode(
                params, jnp.asarray(p[None]), n_heads=8, max_new_tokens=40))
            assert out[rid] == list(want[0, 16:]), f"req {rid} mismatch"

    def test_request_validation(self, rng):
        params = _make_model(rng)
        cfg = ServingConfig(page_size=16, n_pages=8, max_seqs=2,
                            max_pages_per_seq=3, prefill_buckets=(16, 32))
        eng = ServingEngine(params, n_heads=8, cfg=cfg)
        with pytest.raises(ValueError, match="empty prompt"):
            eng.add_request(np.zeros(0, np.int32), 4)
        with pytest.raises(ValueError, match="max_pages_per_seq"):
            eng.add_request(np.zeros(49, np.int32), 4)  # 4 pages > 3
        with pytest.raises(ValueError, match="max_pages_per_seq"):
            eng.add_request(np.zeros(16, np.int32), 40)
        with pytest.raises(ValueError, match="not multiples of page_size"):
            ServingEngine(params, n_heads=8, cfg=ServingConfig(
                page_size=64, prefill_buckets=(16, 32)))

    def test_eos_stops_early(self, rng):
        params = _make_model(rng)
        cfg = ServingConfig(page_size=16, n_pages=32, max_seqs=2,
                            max_pages_per_seq=4, prefill_buckets=(16,))
        eng = ServingEngine(params, n_heads=8, cfg=cfg)
        p = rng.randint(0, 97, 7).astype(np.int32)
        want = np.asarray(greedy_decode(
            params, jnp.asarray(p[None]), n_heads=8, max_new_tokens=8))[0, 7:]
        eos = int(want[2])  # third generated token becomes the eos
        rid = eng.add_request(p, 8, eos_id=eos)
        out = eng.run()
        # expected: tokens up to and including the FIRST occurrence of eos
        stop = list(want).index(eos) + 1
        assert out[rid] == list(want[:stop])
        assert len(out[rid]) < 8  # actually stopped early


class TestPrefixCaching:
    """Automatic prefix caching: full prompt pages are shared (refcounted,
    zero-copy) between requests; suffix prefills cross-attend the cached
    pages through a stats-merged flash pass. Gold property unchanged:
    tokens match the dense decode of each request alone."""

    def test_shared_prefix_token_identity(self, rng):
        params = _make_model(rng)
        cfg = ServingConfig(page_size=16, n_pages=64, max_seqs=2,
                            max_pages_per_seq=8,
                            prefill_buckets=(16, 32, 64),
                            prefix_cache=True)
        eng = ServingEngine(params, n_heads=8, cfg=cfg)
        shared = rng.randint(0, 97, 32).astype(np.int32)  # 2 full pages
        prompts = [
            np.concatenate([shared, rng.randint(0, 97, 7).astype(np.int32)]),
            np.concatenate([shared, rng.randint(0, 97, 13).astype(np.int32)]),
            np.concatenate([shared, rng.randint(0, 97, 2).astype(np.int32)]),
            shared.copy(),  # the prefix itself as a prompt
        ]
        ids = [eng.add_request(p, 5) for p in prompts]
        out = eng.run()
        assert eng.stats["prefix_hits"] >= 2
        assert eng.stats["prefix_tokens_reused"] >= 2 * 32
        for p, rid in zip(prompts, ids):
            want = np.asarray(greedy_decode(
                params, jnp.asarray(p[None]), n_heads=8, max_new_tokens=5))
            assert out[rid] == list(want[0, len(p):]), (
                f"req {rid}: {out[rid]} != {list(want[0, len(p):])}")

    def test_cache_survives_across_runs(self, rng):
        # registry holds pages after requests finish: a later run() reuses
        # them without re-prefilling the prefix
        params = _make_model(rng)
        cfg = ServingConfig(page_size=16, n_pages=64, max_seqs=2,
                            max_pages_per_seq=8, prefill_buckets=(16, 32, 64),
                            prefix_cache=True)
        eng = ServingEngine(params, n_heads=8, cfg=cfg)
        shared = rng.randint(0, 97, 32).astype(np.int32)
        p1 = np.concatenate([shared, rng.randint(0, 97, 5).astype(np.int32)])
        r1 = eng.add_request(p1, 4)
        out1 = eng.run()
        held = cfg.n_pages - 1 - eng.cache.n_free()
        assert held > 0  # registry keeps prompt pages alive
        p2 = np.concatenate([shared, rng.randint(0, 97, 9).astype(np.int32)])
        r2 = eng.add_request(p2, 4)
        out2 = eng.run()
        assert eng.stats["prefix_hits"] >= 1
        for p, rid, out in ((p1, r1, out1), (p2, r2, out2)):
            want = np.asarray(greedy_decode(
                params, jnp.asarray(p[None]), n_heads=8, max_new_tokens=4))
            assert out[rid] == list(want[0, len(p):])

    def test_eviction_under_pressure_and_refcounts(self, rng):
        # a pool too small to also hoard prefixes: the engine evicts LRU
        # registry entries instead of deadlocking, and every page returns
        # once the registry is drained
        params = _make_model(rng)
        cfg = ServingConfig(page_size=16, n_pages=9, max_seqs=2,
                            max_pages_per_seq=4, prefill_buckets=(16, 32, 64),
                            prefix_cache=True)
        eng = ServingEngine(params, n_heads=8, cfg=cfg)
        prompts = [rng.randint(0, 97, 32).astype(np.int32) for _ in range(4)]
        ids = [eng.add_request(p, 4) for p in prompts]
        out = eng.run()
        assert set(out) == set(ids)
        assert eng.stats["prefix_evictions"] > 0
        for p, rid in zip(prompts, ids):
            want = np.asarray(greedy_decode(
                params, jnp.asarray(p[None]), n_heads=8, max_new_tokens=4))
            assert out[rid] == list(want[0, len(p):])
        # drain the registry: every pool page must come back exactly once
        while eng._evict_one_prefix():
            pass
        assert eng.cache.n_free() == cfg.n_pages - 1
        assert np.all(eng.cache.page_refs[:cfg.n_pages - 1] == 0)

    def test_llama_prefix_rope_offset(self, rng):
        # llama family: suffix RoPE positions must start after the cached
        # prefix; GQA cross-attention repeats KV heads
        from laser_tpu.models.llama import init_llama, llama_generate

        params = init_llama(jax.random.PRNGKey(3), n_layers=2, d_model=128,
                            n_heads=8, n_kv_heads=2, d_ff=256, vocab=97,
                            max_len=256)
        cfg = ServingConfig(page_size=16, n_pages=64, max_seqs=2,
                            max_pages_per_seq=8, prefill_buckets=(16, 32, 64),
                            prefix_cache=True)
        eng = ServingEngine(params, n_heads=8, cfg=cfg, model="llama")
        shared = rng.randint(0, 97, 32).astype(np.int32)
        prompts = [
            np.concatenate([shared, rng.randint(0, 97, 9).astype(np.int32)]),
            np.concatenate([shared, rng.randint(0, 97, 3).astype(np.int32)]),
        ]
        ids = [eng.add_request(p, 5) for p in prompts]
        out = eng.run()
        assert eng.stats["prefix_hits"] >= 1
        for p, rid in zip(prompts, ids):
            want = np.asarray(llama_generate(
                params, jnp.asarray(p[None]), jax.random.PRNGKey(0),
                n_heads=8, n_kv_heads=2, max_new_tokens=5, temperature=0.0))
            assert out[rid] == list(want[0, len(p):]), (
                f"req {rid}: {out[rid]} != {list(want[0, len(p):])}")

    def test_kv_quant_prefix_completes(self, rng):
        # int8 KV + prefix cache: the cross-attention dequantizes the
        # gathered pages; agreement bar as in the plain kv_quant test
        params = _make_model(rng)
        cfg = ServingConfig(page_size=16, n_pages=64, max_seqs=2,
                            max_pages_per_seq=8, prefill_buckets=(16, 32, 64),
                            kv_quant=True, prefix_cache=True)
        eng = ServingEngine(params, n_heads=8, cfg=cfg)
        shared = rng.randint(0, 97, 32).astype(np.int32)
        prompts = [
            np.concatenate([shared, rng.randint(0, 97, 5).astype(np.int32)]),
            np.concatenate([shared, rng.randint(0, 97, 8).astype(np.int32)]),
        ]
        ids = [eng.add_request(p, 4) for p in prompts]
        out = eng.run()
        assert set(out) == set(ids)
        assert eng.stats["prefix_hits"] >= 1
        agree = total = 0
        for p, rid in zip(prompts, ids):
            want = np.asarray(greedy_decode(
                params, jnp.asarray(p[None]), n_heads=8,
                max_new_tokens=4))[0, len(p):]
            agree += sum(int(a) == int(b) for a, b in zip(out[rid], want))
            total += len(want)
        assert agree / total > 0.7, f"only {agree}/{total} tokens agree"



class TestServingSampling:
    """Per-request sampling in the engine: one batched device call per step
    samples every slot with its own temperature/top_k/top_p/seed; keys fold
    on the absolute token index (llama_generate's schedule), so sampled
    decoding is deterministic, replayable after preemption, and — for a
    single request with matching params — token-identical to the dense
    generator."""

    def test_batched_sampler_row_parity(self, rng):
        from laser_tpu.ops.sampling import sample_logits, sample_logits_batch

        V = 97
        logits = jnp.asarray(rng.randn(4, V) * 3, jnp.float32)
        seeds = np.array([3, 3, 9, 11], np.int32)
        pos = np.array([5, 6, 5, 0], np.int32)
        temps = np.array([0.0, 0.7, 1.3, 1.0], np.float32)
        top_ks = np.array([0, 20, 5, 0], np.int32)
        top_ps = np.array([1.0, 0.9, 1.0, 0.5], np.float32)
        got = np.asarray(sample_logits_batch(
            jnp.asarray(seeds), jnp.asarray(pos), logits,
            jnp.asarray(temps), jnp.asarray(top_ks), jnp.asarray(top_ps)))
        for b in range(4):
            key = jax.random.fold_in(jax.random.PRNGKey(int(seeds[b])),
                                     int(pos[b]))
            want = np.asarray(sample_logits(
                key, logits[b:b + 1], temperature=float(temps[b]),
                top_k=int(top_ks[b]), top_p=float(top_ps[b])))[0]
            assert got[b] == want, f"row {b}: {got[b]} != {want}"

    def test_sampled_request_matches_llama_generate(self, rng):
        from laser_tpu.models.llama import init_llama, llama_generate

        params = init_llama(jax.random.PRNGKey(3), n_layers=2, d_model=128,
                            n_heads=8, n_kv_heads=2, d_ff=256, vocab=97,
                            max_len=256)
        cfg = ServingConfig(page_size=16, n_pages=32, max_seqs=2,
                            max_pages_per_seq=6, prefill_buckets=(16, 32))
        eng = ServingEngine(params, n_heads=8, cfg=cfg, model="llama")
        p = rng.randint(0, 97, 11).astype(np.int32)
        rid = eng.add_request(p, 6, temperature=0.7, top_k=20, top_p=0.9,
                              seed=5)
        out = eng.run()
        want = np.asarray(llama_generate(
            params, jnp.asarray(p[None]), jax.random.PRNGKey(5), n_heads=8,
            n_kv_heads=2, max_new_tokens=6, temperature=0.7, top_k=20,
            top_p=0.9))
        assert out[rid] == list(want[0, len(p):]), (
            f"{out[rid]} != {list(want[0, len(p):])}")

    def test_mixed_batch_greedy_and_sampled(self, rng):
        # a greedy request sharing the batch with sampled ones still matches
        # the dense greedy oracle exactly; same-seed reruns are identical
        params = _make_model(rng)
        cfg = ServingConfig(page_size=16, n_pages=64, max_seqs=3,
                            max_pages_per_seq=6, prefill_buckets=(16, 32))
        prompts = [rng.randint(0, 97, n).astype(np.int32)
                   for n in (9, 14, 20)]

        def serve():
            eng = ServingEngine(params, n_heads=8, cfg=cfg)
            rids = [eng.add_request(prompts[0], 5),  # greedy
                    eng.add_request(prompts[1], 5, temperature=0.8, seed=1),
                    eng.add_request(prompts[2], 5, temperature=0.8, seed=2)]
            return rids, eng.run()

        ids1, out1 = serve()
        ids2, out2 = serve()
        assert [out1[i] for i in ids1] == [out2[i] for i in ids2]  # replay
        want = np.asarray(greedy_decode(
            params, jnp.asarray(prompts[0][None]), n_heads=8,
            max_new_tokens=5))
        assert out1[ids1[0]] == list(want[0, len(prompts[0]):])
        # different seeds on the same prompt should (overwhelmingly) differ
        assert out1[ids1[1]] != out1[ids1[2]] or prompts[1].tolist() == \
            prompts[2].tolist()


class TestChunkedPrefill:
    """Prompts longer than the largest bucket prefill in chunks: each chunk
    is a suffix prefill cross-attending the pages written so far. The only
    length limits left are the page-capacity ones."""

    def test_long_prompt_token_identity(self, rng):
        params = _make_model(rng)
        cfg = ServingConfig(page_size=16, n_pages=64, max_seqs=2,
                            max_pages_per_seq=8, prefill_buckets=(16, 32))
        eng = ServingEngine(params, n_heads=8, cfg=cfg)
        prompts = [rng.randint(0, 97, n).astype(np.int32)
                   for n in (33, 80, 95)]  # all above the 32 bucket
        ids = [eng.add_request(p, 4) for p in prompts]
        out = eng.run()
        for p, rid in zip(prompts, ids):
            want = np.asarray(greedy_decode(
                params, jnp.asarray(p[None]), n_heads=8, max_new_tokens=4))
            assert out[rid] == list(want[0, len(p):]), (
                f"len {len(p)}: {out[rid]} != {list(want[0, len(p):])}")

    def test_long_prompt_llama(self, rng):
        from laser_tpu.models.llama import init_llama, llama_generate

        params = init_llama(jax.random.PRNGKey(3), n_layers=2, d_model=128,
                            n_heads=8, n_kv_heads=2, d_ff=256, vocab=97,
                            max_len=256)
        cfg = ServingConfig(page_size=16, n_pages=64, max_seqs=2,
                            max_pages_per_seq=8, prefill_buckets=(16, 32))
        eng = ServingEngine(params, n_heads=8, cfg=cfg, model="llama")
        p = rng.randint(0, 97, 70).astype(np.int32)
        rid = eng.add_request(p, 5)
        out = eng.run()
        want = np.asarray(llama_generate(
            params, jnp.asarray(p[None]), jax.random.PRNGKey(0), n_heads=8,
            n_kv_heads=2, max_new_tokens=5, temperature=0.0))
        assert out[rid] == list(want[0, len(p):])

    def test_long_prompt_with_prefix_cache(self, rng):
        # a long shared prefix: the second request reuses MORE pages than
        # one bucket covers, and its chunked suffix starts past them
        params = _make_model(rng)
        cfg = ServingConfig(page_size=16, n_pages=64, max_seqs=2,
                            max_pages_per_seq=8, prefill_buckets=(16, 32),
                            prefix_cache=True)
        eng = ServingEngine(params, n_heads=8, cfg=cfg)
        shared = rng.randint(0, 97, 64).astype(np.int32)  # 4 pages, 2 chunks
        prompts = [
            np.concatenate([shared, rng.randint(0, 97, 5).astype(np.int32)]),
            np.concatenate([shared, rng.randint(0, 97, 40).astype(np.int32)]),
        ]
        ids = [eng.add_request(p, 4) for p in prompts]
        out = eng.run()
        assert eng.stats["prefix_hits"] >= 1
        assert eng.stats["prefix_tokens_reused"] >= 64
        for p, rid in zip(prompts, ids):
            want = np.asarray(greedy_decode(
                params, jnp.asarray(p[None]), n_heads=8, max_new_tokens=4))
            assert out[rid] == list(want[0, len(p):])

    def test_preempted_long_request_requeues(self, rng):
        # preemption requeues prompt+generated, which may exceed the
        # largest bucket — chunked prefill must pick it up exactly
        params = _make_model(rng)
        cfg = ServingConfig(page_size=16, n_pages=7, max_seqs=2,
                            max_pages_per_seq=6, prefill_buckets=(16, 32))
        eng = ServingEngine(params, n_heads=8, cfg=cfg)
        prompts = [rng.randint(0, 97, 30).astype(np.int32) for _ in range(2)]
        ids = [eng.add_request(p, 40) for p in prompts]
        out = eng.run()
        assert eng.stats.get("preemptions", 0) > 0, "no preemption triggered"
        for p, rid in zip(prompts, ids):
            want = np.asarray(greedy_decode(
                params, jnp.asarray(p[None]), n_heads=8, max_new_tokens=40))
            assert out[rid] == list(want[0, len(p):]), f"req {rid} mismatch"


class TestPagedWindow:
    """Sliding-window decode: the query at position L-1 sees only the last
    ``window`` keys; pages entirely outside the window are skipped."""

    @pytest.mark.parametrize("window", [1, 10, 16, 50, 1000])
    def test_vs_reference(self, rng, window):
        S, H, hd, ps, P, mp = 4, 4, 64, 16, 32, 6
        q = jnp.asarray(rng.randn(S, H, hd), jnp.float32)
        kp = jnp.asarray(rng.randn(P, H, ps, hd), jnp.float32)
        vp = jnp.asarray(rng.randn(P, H, ps, hd), jnp.float32)
        tables = jnp.asarray(rng.permutation(P)[:S * mp].reshape(S, mp),
                             jnp.int32)
        lengths = jnp.asarray([0, 7, 48, 96], jnp.int32)
        got = paged_attention(q, kp, vp, tables, lengths, window=window)
        want = paged_attention_reference(q, kp, vp, tables, lengths,
                                         window=window)
        assert np.abs(np.asarray(got - want)).max() < 1e-5
        assert np.all(np.asarray(got)[0] == 0.0)

    def test_window_gqa_quantized(self, rng):
        from laser_tpu.ops.paged_attention import quantize_kv

        S, Hq, Hkv, hd, ps, P, mp = 3, 8, 2, 64, 16, 24, 4
        q = jnp.asarray(rng.randn(S, Hq, hd), jnp.float32)
        kp = jnp.asarray(rng.randn(P, Hkv, ps, hd), jnp.float32)
        vp = jnp.asarray(rng.randn(P, Hkv, ps, hd), jnp.float32)
        kq, ks = quantize_kv(kp)
        vq, vs = quantize_kv(vp)
        tables = jnp.asarray(rng.permutation(P)[:S * mp].reshape(S, mp),
                             jnp.int32)
        lengths = jnp.asarray([5, 40, 64], jnp.int32)
        from laser_tpu.config import config_override
        with config_override(paged_quant_mode="k3v3"):  # exact tier
            got = paged_attention(q, kq, vq, tables, lengths, window=20,
                                  k_scale=ks, v_scale=vs)
        kd = kq.astype(jnp.float32) * ks[..., None]
        vd = vq.astype(jnp.float32) * vs[..., None]
        want = paged_attention_reference(q, kd, vd, tables, lengths,
                                         window=20)
        assert np.abs(np.asarray(got - want)).max() < 1e-5

    def test_window_one_is_self_value(self, rng):
        # window=1: output is exactly the value row of the newest key
        S, H, hd, ps, P = 2, 4, 64, 16, 8
        q = jnp.asarray(rng.randn(S, H, hd), jnp.float32)
        kp = jnp.asarray(rng.randn(P, H, ps, hd), jnp.float32)
        vp = jnp.asarray(rng.randn(P, H, ps, hd), jnp.float32)
        tables = jnp.asarray([[1, 2], [3, 4]], jnp.int32)
        lengths = jnp.asarray([20, 31], jnp.int32)
        got = np.asarray(paged_attention(q, kp, vp, tables, lengths,
                                         window=1))
        vpn = np.asarray(vp)
        for s, L in enumerate([20, 31]):
            pg = int(np.asarray(tables)[s, (L - 1) // ps])
            want = vpn[pg, :, (L - 1) % ps, :]
            np.testing.assert_allclose(got[s], want, rtol=1e-5, atol=1e-5)

    def test_window_validation(self, rng):
        q = jnp.zeros((1, 4, 64), jnp.float32)
        kp = jnp.zeros((4, 4, 16, 64), jnp.float32)
        with pytest.raises(ValueError, match=">= 1"):
            paged_attention(q, kp, kp, jnp.zeros((1, 2), jnp.int32),
                            jnp.ones((1,), jnp.int32), window=0)


class TestServingWindow:
    """Sliding-window serving (mistral-style llama): decode attends only
    the last ``window`` keys via page skipping; prefill applies the same
    mask. Oracle: llama_generate(window=W)."""

    def _params(self):
        from laser_tpu.models.llama import init_llama

        return init_llama(jax.random.PRNGKey(3), n_layers=2, d_model=128,
                          n_heads=8, n_kv_heads=2, d_ff=256, vocab=97,
                          max_len=256)

    def test_decode_crosses_window(self, rng):
        from laser_tpu.models.llama import llama_generate

        params = self._params()
        cfg = ServingConfig(page_size=16, n_pages=32, max_seqs=2,
                            max_pages_per_seq=6, prefill_buckets=(16, 32))
        W = 24
        eng = ServingEngine(params, n_heads=8, cfg=cfg, model="llama",
                            window=W)
        prompts = [rng.randint(0, 97, n).astype(np.int32) for n in (11, 30)]
        # generate far past the window so decode steps mask old pages
        ids = [eng.add_request(p, 20) for p in prompts]
        out = eng.run()
        for p, rid in zip(prompts, ids):
            want = np.asarray(llama_generate(
                params, jnp.asarray(p[None]), jax.random.PRNGKey(0),
                n_heads=8, n_kv_heads=2, max_new_tokens=20,
                temperature=0.0, window=W))
            assert out[rid] == list(want[0, len(p):]), (
                f"req {rid}: {out[rid]} != {list(want[0, len(p):])}")

    def test_window_with_chunked_prefill_and_prefix_cache(self, rng):
        from laser_tpu.models.llama import llama_generate

        params = self._params()
        cfg = ServingConfig(page_size=16, n_pages=64, max_seqs=2,
                            max_pages_per_seq=8, prefill_buckets=(16, 32),
                            prefix_cache=True)
        W = 40
        eng = ServingEngine(params, n_heads=8, cfg=cfg, model="llama",
                            window=W)
        shared = rng.randint(0, 97, 48).astype(np.int32)  # 3 pages, chunked
        prompts = [
            np.concatenate([shared, rng.randint(0, 97, 9).astype(np.int32)]),
            np.concatenate([shared, rng.randint(0, 97, 21).astype(np.int32)]),
        ]
        ids = [eng.add_request(p, 8) for p in prompts]
        out = eng.run()
        assert eng.stats["prefix_hits"] >= 1
        for p, rid in zip(prompts, ids):
            want = np.asarray(llama_generate(
                params, jnp.asarray(p[None]), jax.random.PRNGKey(0),
                n_heads=8, n_kv_heads=2, max_new_tokens=8,
                temperature=0.0, window=W))
            assert out[rid] == list(want[0, len(p):]), (
                f"req {rid}: {out[rid]} != {list(want[0, len(p):])}")

    def test_window_validation(self, rng):
        params = _make_model(rng)
        with pytest.raises(ValueError, match="window must be >= 1"):
            ServingEngine(params, n_heads=8, window=0)

    def test_transformer_family_window(self, rng):
        # window now spans BOTH families: transformer engine generations
        # must match greedy_decode(window=W), crossing the window boundary
        params = _make_model(rng)
        W = 24
        cfg = ServingConfig(page_size=8, n_pages=64, max_seqs=2,
                            max_pages_per_seq=16, prefill_buckets=(16, 32))
        eng = ServingEngine(params, n_heads=8, cfg=cfg, window=W)
        prompts = [rng.randint(0, 97, n).astype(np.int32) for n in (13, 30)]
        ids = [eng.add_request(p, 20) for p in prompts]
        out = eng.run()
        for p, rid in zip(prompts, ids):
            want = np.asarray(greedy_decode(
                params, jnp.asarray(p[None]), n_heads=8, max_new_tokens=20,
                window=W))
            assert out[rid] == list(want[0, len(p):]), (
                f"req {rid}: {out[rid]} != {list(want[0, len(p):])}")

    def test_llama_forward_window_grad(self, rng):
        # dense family: window threads through the trainable kernels
        from laser_tpu.models.llama import llama_forward

        params = self._params()
        toks = jnp.asarray(rng.randint(0, 97, (2, 40)), jnp.int32)

        def loss(p):
            lg = llama_forward(p, toks, n_heads=8, n_kv_heads=2, window=16)
            return jnp.sum(lg ** 2) * 1e-6

        g = jax.grad(loss)(params)
        flat = jax.tree.leaves(g)
        assert all(bool(jnp.all(jnp.isfinite(x))) for x in flat)
        # window must CHANGE the logits vs full causal
        lg_w = llama_forward(params, toks, n_heads=8, n_kv_heads=2, window=8)
        lg_f = llama_forward(params, toks, n_heads=8, n_kv_heads=2)
        assert not np.allclose(np.asarray(lg_w), np.asarray(lg_f))

    def test_out_of_window_pages_recycle(self, rng):
        # long windowed generation must hold O(window) pages: a pool too
        # small for the FULL sequence still completes without preemption
        from laser_tpu.models.llama import llama_generate

        params = self._params()
        # total sequence = 16 prompt + 64 generated = 80 tokens = 5 pages,
        # but the pool has only 4 usable pages -> only works if
        # out-of-window pages recycle
        cfg = ServingConfig(page_size=16, n_pages=5, max_seqs=1,
                            max_pages_per_seq=6, prefill_buckets=(16,))
        W = 24
        eng = ServingEngine(params, n_heads=8, cfg=cfg, model="llama",
                            window=W)
        p = rng.randint(0, 97, 16).astype(np.int32)
        rid = eng.add_request(p, 64)
        out = eng.run()
        assert eng.stats.get("window_pages_freed", 0) > 0
        assert eng.stats.get("preemptions", 0) == 0
        assert eng.cache.n_free() == cfg.n_pages - 1  # all returned
        want = np.asarray(llama_generate(
            params, jnp.asarray(p[None]), jax.random.PRNGKey(0), n_heads=8,
            n_kv_heads=2, max_new_tokens=64, temperature=0.0, window=W))
        assert out[rid] == list(want[0, 16:])


class TestTPWeightQuant:
    @pytest.mark.devices(4)
    def test_tp_weight_quant_matches_single_device(self, rng):
        # int8 weights shard with their per-output-column scales: the
        # column-parallel dequant multiply commutes with the row-parallel
        # psum, so the tp engine matches the single-device quant engine
        # token for token
        from laser_tpu.models.llama import init_llama
        from laser_tpu.parallel.mesh import make_mesh

        params = init_llama(jax.random.PRNGKey(5), n_layers=2, d_model=128,
                            n_heads=8, n_kv_heads=4, d_ff=256, vocab=97,
                            max_len=256)
        cfg = ServingConfig(page_size=16, n_pages=32, max_seqs=2,
                            max_pages_per_seq=6, prefill_buckets=(16, 32),
                            weight_quant=True)
        prompts = [rng.randint(0, 97, n).astype(np.int32) for n in (9, 26)]

        def serve(mesh):
            eng = ServingEngine(params, n_heads=8, cfg=cfg, model="llama",
                                mesh=mesh)
            rids = [eng.add_request(p, 5) for p in prompts]
            out = eng.run()
            return [out[r] for r in rids]

        single = serve(None)
        mesh = make_mesh({"tp": 4}, devices=jax.devices()[:4])
        tp = serve(mesh)
        assert tp == single, f"{tp} != {single}"

    @pytest.mark.devices(4)
    def test_tp_prefix_cache_matches_single_device(self, rng):
        # the prefix gather runs on each shard's LOCAL Hkv heads inside
        # shard_map, so prefix caching composes with tensor parallelism;
        # token-identical to the single-device prefix-cache engine
        from laser_tpu.models.llama import init_llama
        from laser_tpu.parallel.mesh import make_mesh

        params = init_llama(jax.random.PRNGKey(5), n_layers=2, d_model=128,
                            n_heads=8, n_kv_heads=4, d_ff=256, vocab=97,
                            max_len=256)
        cfg = ServingConfig(page_size=16, n_pages=64, max_seqs=2,
                            max_pages_per_seq=8, prefill_buckets=(16, 32),
                            prefix_cache=True)
        shared = rng.randint(0, 97, 32).astype(np.int32)
        prompts = [
            np.concatenate([shared, rng.randint(0, 97, 7).astype(np.int32)]),
            np.concatenate([shared, rng.randint(0, 97, 12).astype(np.int32)]),
        ]

        def serve(mesh):
            eng = ServingEngine(params, n_heads=8, cfg=cfg, model="llama",
                                mesh=mesh)
            rids = [eng.add_request(p, 5) for p in prompts]
            out = eng.run()
            assert eng.stats["prefix_hits"] >= 1
            return [out[r] for r in rids]

        single = serve(None)
        mesh = make_mesh({"tp": 4}, devices=jax.devices()[:4])
        tp = serve(mesh)
        assert tp == single, f"{tp} != {single}"


class TestBatchedPrefill:
    def test_same_bucket_requests_prefill_in_one_call(self, rng):
        # 3 same-bucket requests admitted together: ONE device prefill
        # (stats["prefills"] counts device calls), tokens unchanged
        params = _make_model(rng)
        cfg = ServingConfig(page_size=16, n_pages=64, max_seqs=4,
                            max_pages_per_seq=6, prefill_buckets=(16, 32))
        eng = ServingEngine(params, n_heads=8, cfg=cfg)
        prompts = [rng.randint(0, 97, n).astype(np.int32)
                   for n in (20, 25, 31)]  # all bucket 32
        ids = [eng.add_request(p, 4) for p in prompts]
        eng.step()  # one admit wave
        assert eng.stats["prefills"] == 1, eng.stats
        out = eng.run()
        for p, rid in zip(prompts, ids):
            want = np.asarray(greedy_decode(
                params, jnp.asarray(p[None]), n_heads=8, max_new_tokens=4))
            assert out[rid] == list(want[0, len(p):])

    def test_mixed_buckets_group_separately(self, rng):
        params = _make_model(rng)
        cfg = ServingConfig(page_size=16, n_pages=64, max_seqs=4,
                            max_pages_per_seq=6, prefill_buckets=(16, 32))
        eng = ServingEngine(params, n_heads=8, cfg=cfg)
        prompts = [rng.randint(0, 97, n).astype(np.int32)
                   for n in (9, 14, 20, 30)]  # buckets 16,16,32,32
        ids = [eng.add_request(p, 3) for p in prompts]
        eng.step()
        assert eng.stats["prefills"] == 2, eng.stats  # one per bucket
        out = eng.run()
        for p, rid in zip(prompts, ids):
            want = np.asarray(greedy_decode(
                params, jnp.asarray(p[None]), n_heads=8, max_new_tokens=3))
            assert out[rid] == list(want[0, len(p):])


class TestDecodeBurst:
    """decode_burst=k runs k decode+sample steps per dispatch (device-side
    lax.scan with in-loop stop detection) — the continuous-batching engine
    stays token-identical to single-step decode in every composition."""

    def _run_pair(self, rng, make_engine, prompts, max_new, **req_kw):
        eng1 = make_engine(1)
        engk = make_engine(4)
        ids1 = [eng1.add_request(p, m, **req_kw)
                for p, m in zip(prompts, max_new)]
        idsk = [engk.add_request(p, m, **req_kw)
                for p, m in zip(prompts, max_new)]
        out1, outk = eng1.run(), engk.run()
        for i1, ik in zip(ids1, idsk):
            assert out1[i1] == outk[ik], (out1[i1], outk[ik])
        return eng1, engk, out1, ids1

    def test_burst_matches_single_step_and_dense(self, rng):
        params = _make_model(rng)

        def mk(burst):
            cfg = ServingConfig(page_size=16, n_pages=64, max_seqs=3,
                                max_pages_per_seq=8,
                                prefill_buckets=(16, 32, 64),
                                decode_burst=burst)
            return ServingEngine(params, n_heads=8, cfg=cfg)

        prompts = [rng.randint(0, 97, n).astype(np.int32)
                   for n in (9, 26, 40)]
        _, engk, out1, ids1 = self._run_pair(rng, mk, prompts, (7, 5, 9))
        assert engk.stats.get("decode_bursts", 0) > 0
        for p, rid in zip(prompts, ids1):
            want = np.asarray(greedy_decode(
                params, jnp.asarray(p[None]), n_heads=8,
                max_new_tokens={ids1[0]: 7, ids1[1]: 5, ids1[2]: 9}[rid]))
            assert out1[rid] == list(want[0, len(p):])

    def test_burst_eos_mid_burst(self, rng):
        # force an early eos: generate once, then replay with eos_id set to
        # a token the model emits mid-burst — both engines must cut there
        params = _make_model(rng)

        def mk(burst):
            cfg = ServingConfig(page_size=16, n_pages=64, max_seqs=2,
                                max_pages_per_seq=8,
                                prefill_buckets=(16, 32),
                                decode_burst=burst)
            return ServingEngine(params, n_heads=8, cfg=cfg)

        p = rng.randint(0, 97, 20).astype(np.int32)
        probe = mk(1)
        rid = probe.add_request(p, 8)
        full = probe.run()[rid]
        eos = full[2]  # third emitted token = mid-burst for k=4
        self._run_pair(rng, mk, [p], (8,), eos_id=int(eos))

    def test_burst_with_sampling(self, rng):
        params = _make_model(rng)

        def mk(burst):
            cfg = ServingConfig(page_size=16, n_pages=64, max_seqs=2,
                                max_pages_per_seq=8,
                                prefill_buckets=(16, 32),
                                decode_burst=burst)
            return ServingEngine(params, n_heads=8, cfg=cfg)

        prompts = [rng.randint(0, 97, n).astype(np.int32) for n in (9, 17)]
        self._run_pair(rng, mk, prompts, (6, 6),
                       temperature=0.9, top_k=11, top_p=0.9, seed=7)

    def test_burst_pool_pressure_falls_back(self, rng):
        # pool too small to pre-allocate a burst: engine must fall back to
        # single-step (which can preempt) and still finish everything
        params = _make_model(rng)
        cfg = ServingConfig(page_size=16, n_pages=5, max_seqs=2,
                            max_pages_per_seq=4, prefill_buckets=(16, 32),
                            decode_burst=4)
        eng = ServingEngine(params, n_heads=8, cfg=cfg)
        prompts = [rng.randint(0, 97, n).astype(np.int32) for n in (20, 25)]
        ids = [eng.add_request(p, 30) for p in prompts]
        out = eng.run()
        for p, rid in zip(prompts, ids):
            want = np.asarray(greedy_decode(
                params, jnp.asarray(p[None]), n_heads=8, max_new_tokens=30))
            assert out[rid] == list(want[0, len(p):])

    def test_burst_llama_window(self, rng):
        from laser_tpu.models.llama import init_llama, llama_generate

        params = init_llama(jax.random.PRNGKey(3), n_layers=2, d_model=128,
                            n_heads=8, n_kv_heads=4, d_ff=256, vocab=97,
                            max_len=256)

        def mk(burst):
            cfg = ServingConfig(page_size=16, n_pages=32, max_seqs=2,
                                max_pages_per_seq=8,
                                prefill_buckets=(16, 32, 64),
                                decode_burst=burst)
            return ServingEngine(params, n_heads=8, cfg=cfg, model="llama",
                                 window=24)
        p = rng.randint(0, 97, 40).astype(np.int32)
        _, _, out1, ids1 = self._run_pair(rng, mk, [p], (10,))
        want = np.asarray(llama_generate(
            params, jnp.asarray(p[None]), jax.random.PRNGKey(0), n_heads=8,
            n_kv_heads=4, max_new_tokens=10, temperature=0.0, window=24))
        assert out1[ids1[0]] == list(want[0, len(p):])

    @pytest.mark.devices(4)
    def test_burst_tensor_parallel(self, rng):
        from laser_tpu.models.llama import init_llama, llama_generate
        from laser_tpu.parallel.mesh import make_mesh

        params = init_llama(jax.random.PRNGKey(5), n_layers=2, d_model=128,
                            n_heads=8, n_kv_heads=4, d_ff=256, vocab=97,
                            max_len=256)
        mesh = make_mesh({"tp": 4}, devices=jax.devices()[:4])
        cfg = ServingConfig(page_size=16, n_pages=32, max_seqs=2,
                            max_pages_per_seq=6, prefill_buckets=(16, 32, 64),
                            decode_burst=4)
        eng = ServingEngine(params, n_heads=8, cfg=cfg, model="llama",
                            mesh=mesh)
        prompts = [rng.randint(0, 97, n).astype(np.int32) for n in (9, 26)]
        ids = [eng.add_request(p, 5) for p in prompts]
        out = eng.run()
        for p, rid in zip(prompts, ids):
            want = np.asarray(llama_generate(
                params, jnp.asarray(p[None]), jax.random.PRNGKey(0),
                n_heads=8, n_kv_heads=4, max_new_tokens=5, temperature=0.0))
            assert out[rid] == list(want[0, len(p):])


class TestPipelinedBursts:
    """pipeline_bursts=True dispatches burst n+1 before harvesting burst n
    (the harvest RTT overlaps device compute). Must stay token-identical:
    the scan's device-side stop detection makes the speculative burst
    safe, and the engine flushes the pending burst before any structural
    change (admission, fallback, preemption)."""

    def _mk(self, params, burst, pipeline, **kw):
        cfg = ServingConfig(page_size=16, n_pages=64, max_seqs=3,
                            max_pages_per_seq=8,
                            prefill_buckets=(16, 32, 64),
                            decode_burst=burst, pipeline_bursts=pipeline,
                            **kw)
        return ServingEngine(params, n_heads=8, cfg=cfg)

    def test_pipelined_matches_single_step(self, rng):
        params = _make_model(rng)
        prompts = [rng.randint(0, 97, n).astype(np.int32)
                   for n in (9, 26, 40)]
        outs = {}
        for tag, (burst, pipe) in {"single": (1, False),
                                   "burst": (4, False),
                                   "pipelined": (4, True)}.items():
            eng = self._mk(params, burst, pipe)
            ids = [eng.add_request(p, m)
                   for p, m in zip(prompts, (7, 5, 9))]
            got = eng.run()
            outs[tag] = [got[i] for i in ids]
        assert outs["pipelined"] == outs["single"] == outs["burst"]

    def test_pipelined_eos_mid_burst(self, rng):
        params = _make_model(rng)
        p = rng.randint(0, 97, 20).astype(np.int32)
        probe = self._mk(params, 1, False)
        rid = probe.add_request(p, 8)
        full = probe.run()[rid]
        eos = full[2]  # mid-burst for k=4 (cut earlier if it repeats)
        want = full[:full.index(eos) + 1]
        for pipe in (False, True):
            eng = self._mk(params, 4, pipe)
            rid2 = eng.add_request(p, 8, eos_id=int(eos))
            assert eng.run()[rid2] == want

    def test_pipelined_with_sampling(self, rng):
        params = _make_model(rng)
        prompts = [rng.randint(0, 97, n).astype(np.int32) for n in (9, 17)]
        outs = []
        for pipe in (False, True):
            eng = self._mk(params, 4, pipe)
            ids = [eng.add_request(p, 6, temperature=0.9, top_k=11,
                                   top_p=0.9, seed=7) for p in prompts]
            got = eng.run()
            outs.append([got[i] for i in ids])
        assert outs[0] == outs[1]

    def test_pipelined_staggered_admission(self, rng):
        # a request queued while a speculative burst is in flight: the
        # engine must flush the pending burst before reusing/attributing
        # slots (step()'s flush-before-admit path)
        params = _make_model(rng)
        prompts = [rng.randint(0, 97, n).astype(np.int32)
                   for n in (9, 26, 40, 13)]
        outs = []
        for pipe in (False, True):
            eng = self._mk(params, 4, pipe)
            ids = [eng.add_request(p, 9) for p in prompts[:3]]
            eng.step()   # admit + first burst
            eng.step()   # speculative burst in flight (pipelined)
            ids.append(eng.add_request(prompts[3], 9))
            got = eng.run()
            outs.append([got[i] for i in ids])
        assert outs[0] == outs[1]

    def test_pipelined_pool_pressure_falls_back(self, rng):
        params = _make_model(rng)
        cfg = ServingConfig(page_size=16, n_pages=5, max_seqs=2,
                            max_pages_per_seq=4, prefill_buckets=(16, 32),
                            decode_burst=4, pipeline_bursts=True)
        eng = ServingEngine(params, n_heads=8, cfg=cfg)
        prompts = [rng.randint(0, 97, n).astype(np.int32) for n in (20, 25)]
        ids = [eng.add_request(p, 30) for p in prompts]
        out = eng.run()
        for p, rid in zip(prompts, ids):
            want = np.asarray(greedy_decode(
                params, jnp.asarray(p[None]), n_heads=8, max_new_tokens=30))
            assert out[rid] == list(want[0, len(p):])


class TestTransformerWindow:
    """Sliding-window serving for the transformer family (round 3: was
    llama-only). Oracle: greedy_decode(window=W) — the dense forward with
    the same mask."""

    def test_decode_crosses_window(self, rng):
        params = _make_model(rng)
        cfg = ServingConfig(page_size=16, n_pages=32, max_seqs=2,
                            max_pages_per_seq=6, prefill_buckets=(16, 32))
        W = 24
        eng = ServingEngine(params, n_heads=8, cfg=cfg, window=W)
        prompts = [rng.randint(0, 97, n).astype(np.int32) for n in (11, 30)]
        ids = [eng.add_request(p, 20) for p in prompts]
        out = eng.run()
        assert eng.stats.get("window_pages_freed", 0) > 0
        for p, rid in zip(prompts, ids):
            want = np.asarray(greedy_decode(
                params, jnp.asarray(p[None]), n_heads=8, max_new_tokens=20,
                window=W))
            assert out[rid] == list(want[0, len(p):]), (
                f"req {rid}: {out[rid]} != {list(want[0, len(p):])}")

    def test_window_with_prefix_cache_and_burst(self, rng):
        params = _make_model(rng)
        cfg = ServingConfig(page_size=16, n_pages=64, max_seqs=2,
                            max_pages_per_seq=8, prefill_buckets=(16, 32),
                            prefix_cache=True, decode_burst=4)
        W = 40
        eng = ServingEngine(params, n_heads=8, cfg=cfg, window=W)
        shared = rng.randint(0, 97, 48).astype(np.int32)
        prompts = [
            np.concatenate([shared, rng.randint(0, 97, 9).astype(np.int32)]),
            np.concatenate([shared, rng.randint(0, 97, 21).astype(np.int32)]),
        ]
        ids = [eng.add_request(p, 8) for p in prompts]
        out = eng.run()
        assert eng.stats["prefix_hits"] >= 1
        for p, rid in zip(prompts, ids):
            want = np.asarray(greedy_decode(
                params, jnp.asarray(p[None]), n_heads=8, max_new_tokens=8,
                window=W))
            assert out[rid] == list(want[0, len(p):]), (
                f"req {rid}: {out[rid]} != {list(want[0, len(p):])}")
