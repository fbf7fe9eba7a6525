"""Speculative decoding inside the ServingEngine (round-4 VERDICT #4).

The contract under test (serving/engine.py:_spec_burst_scan):
  * GREEDY slots are token-IDENTICAL to the non-speculative engine for ANY
    draft — good, bad, or quantized — because acceptance keeps exactly the
    target-argmax prefix. This is the strongest cheap certification: a
    wrong verify step, rollback, or page mask would break identity.
  * SAMPLED slots are marginally EXACT for plain temperature sampling via
    the rejection scheme (ops/sampling.py:speculative_accept, certified at
    the op level in tests/test_speculative.py); here we certify the engine
    wiring statistically and via the sharp-temperature collapse.
  * The machinery composes with the engine's other features: decode
    bursts, burst pipelining, int8 KV pages, quantized drafts, prefix
    caching, eos mid-window, preemption fallback.

Reference frame: the reference is a compute library with no serving layer
(SURVEY.md §5); this subsystem is parity-plus.
"""

import os

import numpy as np
import pytest

import jax

from laser_tpu.models.llama import init_llama
from laser_tpu.models.transformer import init_transformer
from laser_tpu.serving import ServingConfig, ServingEngine

V = 97


@pytest.fixture(scope="module")
def tparams():
    return init_transformer(jax.random.PRNGKey(0), n_layers=2, d_model=64,
                            n_heads=4, d_ff=128, vocab=V)


@pytest.fixture(scope="module")
def tdraft():
    # a DIFFERENT (smaller) random model: acceptance is near zero, so the
    # identity assertions exercise heavy rejection + bonus-token paths
    return init_transformer(jax.random.PRNGKey(9), n_layers=1, d_model=32,
                            n_heads=2, d_ff=64, vocab=V)


@pytest.fixture(scope="module")
def lparams():
    return init_llama(jax.random.PRNGKey(1), n_layers=2, d_model=64,
                      n_heads=4, n_kv_heads=2, d_ff=128, vocab=V,
                      max_len=256)


def _prompts(seed, n=4, lo=5, hi=40):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, V, rng.randint(lo, hi)).astype(np.int32)
            for _ in range(n)]


def _run(params, *, model="transformer", n_heads=4, draft=None,
         draft_n_heads=None, gamma=3, burst=8, kv_quant=False,
         pipeline=False, prefix_cache=False, dwq=False, n_pages=64,
         max_new=20, eos=None, prompts=None, **req_kw):
    cfg = ServingConfig(page_size=16, n_pages=n_pages, max_seqs=4,
                        max_pages_per_seq=8, prefill_buckets=(16, 32, 64),
                        decode_burst=burst, kv_quant=kv_quant,
                        pipeline_bursts=pipeline, prefix_cache=prefix_cache,
                        spec_gamma=gamma if draft is not None else 0,
                        draft_weight_quant=dwq)
    eng = ServingEngine(params, n_heads=n_heads, cfg=cfg, model=model,
                        draft_params=draft, draft_n_heads=draft_n_heads)
    for p in prompts:
        eng.add_request(p, max_new, eos_id=eos, **req_kw)
    return eng.run(), eng.stats


class TestGreedyIdentity:
    def test_self_draft_identity_and_acceptance(self, tparams):
        """draft == target: near-total acceptance, identical tokens."""
        prompts = _prompts(0)
        base, _ = _run(tparams, prompts=prompts)
        spec, st = _run(tparams, draft=tparams, prompts=prompts)
        assert base == spec
        alpha = (st["spec_tokens"] / st["spec_live_rounds"] - 1) / 3
        # window-vs-decode numerics can flip near-tie argmaxes and tail
        # rounds truncate at max_new_tokens, so not exactly 1.0
        assert alpha > 0.6, f"self-draft acceptance {alpha}"

    def test_bad_draft_still_identical(self, tparams, tdraft):
        """A draft with ~zero agreement changes THROUGHPUT, never TOKENS."""
        prompts = _prompts(1)
        base, _ = _run(tparams, prompts=prompts)
        spec, st = _run(tparams, draft=tdraft, draft_n_heads=2,
                        prompts=prompts)
        assert base == spec
        assert st["spec_live_rounds"] > 0

    def test_quantized_self_draft_identity(self, tparams):
        """int8 weight-only self-draft (the production cheap-draft setup):
        quantization may flip proposals; acceptance must filter them."""
        prompts = _prompts(2)
        base, _ = _run(tparams, prompts=prompts)
        spec, _ = _run(tparams, draft=tparams, dwq="int8", prompts=prompts)
        assert base == spec

    def test_llama_family(self, lparams):
        prompts = _prompts(3)
        base, _ = _run(lparams, model="llama", prompts=prompts)
        spec, _ = _run(lparams, model="llama", draft=lparams,
                       prompts=prompts)
        assert base == spec

    def test_llama_int8kv_pipelined(self, lparams):
        prompts = _prompts(4)
        base, _ = _run(lparams, model="llama", kv_quant=True,
                       prompts=prompts)
        spec, _ = _run(lparams, model="llama", draft=lparams,
                       kv_quant=True, pipeline=True, prompts=prompts)
        assert base == spec

    def test_gamma_sweep(self, tparams):
        prompts = _prompts(5, n=2)
        base, _ = _run(tparams, prompts=prompts)
        for gamma in (1, 2, 5):
            spec, _ = _run(tparams, draft=tparams, gamma=gamma,
                           prompts=prompts)
            assert base == spec, f"gamma={gamma}"


class TestStopConditions:
    def test_eos_mid_window(self, tparams):
        """Pick an eos that fires mid-generation: the spec engine must
        truncate at the same token as the plain engine (the eos may land
        anywhere inside an accepted window)."""
        prompts = _prompts(6, n=2)
        base, _ = _run(tparams, prompts=prompts)
        eos = base[0][len(base[0]) // 2]  # a token known to appear
        base_e, _ = _run(tparams, prompts=prompts, eos=eos)
        spec_e, _ = _run(tparams, draft=tparams, prompts=prompts, eos=eos)
        assert base_e == spec_e
        assert any(out and out[-1] == eos for out in base_e.values())

    def test_max_new_tokens_exact(self, tparams):
        """Budgets that are not multiples of gamma+1 truncate exactly."""
        prompts = _prompts(7, n=2)
        for mnt in (1, 2, 7):
            base, _ = _run(tparams, prompts=prompts, max_new=mnt)
            spec, _ = _run(tparams, draft=tparams, prompts=prompts,
                           max_new=mnt)
            assert base == spec
            assert all(len(v) == mnt for v in spec.values())


class TestSampled:
    def test_sharp_temperature_matches_greedy(self, tparams):
        """temperature -> 0+ collapses p and q to argmax one-hots: the
        sampled spec engine must emit what the greedy plain engine does."""
        prompts = _prompts(8, n=2)
        base, _ = _run(tparams, prompts=prompts)
        spec, _ = _run(tparams, draft=tparams, prompts=prompts,
                       temperature=1e-6, seed=3)
        assert base == spec

    def test_filters_rejected(self, tparams):
        cfg = ServingConfig(spec_gamma=2)
        eng = ServingEngine(tparams, n_heads=4, cfg=cfg,
                            draft_params=tparams)
        with pytest.raises(ValueError, match="temperature"):
            eng.add_request(np.array([1, 2, 3], np.int32), 4,
                            temperature=0.8, top_k=5)

    @pytest.mark.skipif(os.environ.get("LASER_TEST_BACKEND") == "tpu",
                        reason="statistical property independent of the "
                        "backend; 300 engine runs through the device "
                        "tunnel would dominate the hardware matrix")
    def test_marginal_distribution(self):
        """Empirical marginal of the first SPECULATIVE token (the second
        generated token: the first comes from the prefill sampler, shared
        with the plain path) vs the plain engine's, over request seeds.
        A deliberately DIFFERENT draft forces real rejections. Small vocab
        so two n-sample empirical draws of the SAME distribution sit well
        inside the tolerance (E[TV] ~ 0.5*sqrt(4V/(pi*n)) ~ 0.17 here)."""
        sv = 13
        target = init_transformer(jax.random.PRNGKey(20), n_layers=1,
                                  d_model=32, n_heads=2, d_ff=64, vocab=sv)
        draft = init_transformer(jax.random.PRNGKey(21), n_layers=1,
                                 d_model=32, n_heads=2, d_ff=64, vocab=sv)
        prompt = np.array([5, 3, 8, 2, 4], np.int32)
        n = 150

        def marginal(use_draft):
            # ONE engine serves all n requests (continuous batching): the
            # executables compile once, each request samples with its own
            # seed, and every request's tokens are claimed marginally
            # exact regardless of which slots it shared rounds with
            cfg = ServingConfig(page_size=16, n_pages=64, max_seqs=4,
                                max_pages_per_seq=4,
                                prefill_buckets=(16,), decode_burst=3,
                                spec_gamma=2 if use_draft else 0)
            eng = ServingEngine(target, n_heads=2, cfg=cfg,
                                draft_params=(draft if use_draft else None),
                                draft_n_heads=2)
            for i in range(n):
                eng.add_request(prompt, 2, temperature=1.0, seed=i)
            res = eng.run()
            return np.bincount([res[i][1] for i in range(n)],
                               minlength=sv) / n

        eb = marginal(False)
        es = marginal(True)
        # same-seed tokens differ (different randomness schedule) but the
        # marginals must agree
        tv = 0.5 * np.abs(eb - es).sum()
        assert tv < 0.35, f"TV distance {tv}"


class TestRobustness:
    def test_page_exhaustion_falls_back(self, tparams):
        """A pool too small for the whole working set: the spec path must
        refuse the burst, fall back to single-step (which preempts), and
        still produce the plain engine's tokens."""
        prompts = _prompts(9, n=4, lo=30, hi=60)
        base, _ = _run(tparams, prompts=prompts, n_pages=64, max_new=24)
        spec, st = _run(tparams, draft=tparams, prompts=prompts,
                        n_pages=13, max_new=24)
        assert base == spec
        assert st.get("preemptions", 0) > 0 or st["spec_bursts"] > 0

    def test_prefix_cache_composes(self, tparams):
        """Shared-prefix prompts: cache hits skip prefill for BOTH pools
        (the draft prefills the same pages); tokens unchanged."""
        rng = np.random.RandomState(10)
        stem = rng.randint(0, V, 32).astype(np.int32)
        prompts = [np.concatenate([stem, rng.randint(0, V, 7 + i)
                                   .astype(np.int32)]) for i in range(3)]
        base, _ = _run(tparams, prompts=prompts)
        spec, st = _run(tparams, draft=tparams, prefix_cache=True,
                        prompts=prompts)
        assert base == spec
        assert st["prefix_hits"] > 0

    def test_config_validation(self, tparams, lparams):
        with pytest.raises(ValueError, match="spec_gamma"):
            ServingEngine(tparams, n_heads=4,
                          cfg=ServingConfig(spec_gamma=0),
                          draft_params=tparams)
        with pytest.raises(ValueError, match="window"):
            ServingEngine(tparams, n_heads=4,
                          cfg=ServingConfig(spec_gamma=2),
                          draft_params=tparams, window=8)
        with pytest.raises(ValueError, match="vocab"):
            bad = init_transformer(jax.random.PRNGKey(2), n_layers=1,
                                   d_model=32, n_heads=2, d_ff=64,
                                   vocab=V + 1)
            ServingEngine(tparams, n_heads=4,
                          cfg=ServingConfig(spec_gamma=2),
                          draft_params=bad, draft_n_heads=2)
