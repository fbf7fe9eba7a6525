"""Weight-only int4 quantization: kernel numerics + serving engine + TP.

The int4 path (ops/gemm/int4_kernel.py) is the round-4 extension of the
serving engine's weight-only int8: packed nibbles stream at half the bytes
and unpack inside the matmul. The reference declared quantized GEMM as
roadmap and never built it (reference README.md:238-245); these tests hold
the TPU build to the same bars as the int8 path (test_serving.py):
dequant error bounds, generation agreement with the full-precision engine,
and token-identity between the tp-sharded and single-device engines.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laser_tpu.ops.gemm.int4_kernel import (build_w4_gemm, dequantize_int4,
                                            gemm_w4, pack_int4,
                                            quantize_int4, unpack_int4)
from laser_tpu.serving.engine import ServingConfig, ServingEngine


@pytest.fixture
def rng():
    return np.random.RandomState(11)


class TestInt4Kernel:
    def test_pack_unpack_roundtrip(self, rng):
        q = jnp.asarray(rng.randint(-8, 8, (64, 96)), jnp.int8)
        assert (np.asarray(unpack_int4(pack_int4(q))) == np.asarray(q)).all()

    def test_dequant_error_bound(self, rng):
        w = jnp.asarray(rng.randn(128, 96), jnp.float32)
        wq = quantize_int4(w, group=32)
        back = np.asarray(dequantize_int4(wq))
        # symmetric int4: |err| <= scale/2 = groupmax/14 per element
        gmax = np.abs(np.asarray(w)).reshape(4, 32, 96).max(1)
        err = np.abs(back - np.asarray(w)).reshape(4, 32, 96).max(1)
        assert (err <= gmax / 14.0 + 1e-7).all()

    def test_group_must_divide(self):
        w = jnp.zeros((100, 8), jnp.float32)
        with pytest.raises(ValueError):
            quantize_int4(w, group=64)

    def test_gemm_w4_matches_dequant_oracle(self, rng):
        w = jnp.asarray(rng.randn(256, 192), jnp.float32)
        wq = quantize_int4(w, group=64)
        h = jnp.asarray(rng.randn(8, 256), jnp.float32)
        want = np.asarray(h) @ np.asarray(dequantize_int4(wq))
        got = np.asarray(gemm_w4(h, wq))
        assert np.abs(got - want).max() < 1e-4

    def test_pallas_interpret_matches_oracle(self, rng):
        # drive the Pallas kernel explicitly (interpret=True on CPU), with
        # an M tail (M=10 < bm) and multiple K blocks
        w = jnp.asarray(rng.randn(256, 128), jnp.float32)
        wq = quantize_int4(w, group=32)
        h = jnp.asarray(rng.randn(10, 256), jnp.float32)
        fn = build_w4_gemm(10, 128, 256, 32, 16, 128, 64, "float32", True)
        want = np.asarray(h) @ np.asarray(dequantize_int4(wq))
        got = np.asarray(fn(h, wq["q4"], wq["s4"]))
        assert np.abs(got - want).max() < 1e-4


class TestInt4Engine:
    def test_int4_engine_generates(self, rng):
        from laser_tpu.models.transformer import greedy_decode, init_transformer

        params = init_transformer(jax.random.PRNGKey(7), n_layers=2,
                                  d_model=128, n_heads=8, d_ff=256, vocab=97)
        cfg = ServingConfig(page_size=16, n_pages=32, max_seqs=2,
                            max_pages_per_seq=6, prefill_buckets=(16, 32),
                            weight_quant="int4", weight_quant_group=32)
        eng = ServingEngine(params, n_heads=8, cfg=cfg)
        blk = eng.params["blocks"][0]
        assert blk["wqkv"]["q4"].dtype == jnp.int8
        assert blk["wqkv"]["q4"].shape[0] == 64  # 128 rows packed in half
        assert eng.params["embed"].dtype == jnp.float32  # not quantized
        prompts = [rng.randint(0, 97, n).astype(np.int32)
                   for n in (9, 20, 30)]
        ids = [eng.add_request(p, 4) for p in prompts]
        out = eng.run()
        assert set(out) == set(ids)
        assert eng.cache.n_free() == cfg.n_pages - 1
        # the right oracle is the DEQUANTIZED model (same weight values as
        # the engine computes with): random-init logits are near-uniform,
        # so comparing against the fp model only measures argmax ties, not
        # the engine. Against the dequantized oracle the residual is
        # paged-vs-dense fp ordering — the int8 test's agreement class.
        dq = dict(params)
        dq["blocks"] = [
            {k: (dequantize_int4(v) if isinstance(v, dict) else v)
             for k, v in blk.items()}
            for blk in eng.params["blocks"]]
        agree = total = 0
        for p, rid in zip(prompts, ids):
            want = np.asarray(greedy_decode(
                dq, jnp.asarray(p[None]), n_heads=8,
                max_new_tokens=4))[0, len(p):]
            assert out[rid][0] == int(want[0])  # prefill path: exact argmax
            agree += sum(int(a) == int(b) for a, b in zip(out[rid], want))
            total += len(want)
        assert agree / total > 0.7, f"only {agree}/{total} tokens agree"

    @pytest.mark.devices(4)
    def test_int4_llama_tp_matches_single_device(self, rng):
        from laser_tpu.models.llama import init_llama
        from laser_tpu.parallel.mesh import make_mesh

        params = init_llama(jax.random.PRNGKey(5), n_layers=2, d_model=128,
                            n_heads=8, n_kv_heads=4, d_ff=256, vocab=97,
                            max_len=256)
        cfg = ServingConfig(page_size=16, n_pages=32, max_seqs=2,
                            max_pages_per_seq=6, prefill_buckets=(16, 32),
                            weight_quant="int4", weight_quant_group=16)
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
