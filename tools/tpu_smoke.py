"""Curated TPU-compiled smoke suite (ROADMAP #18).

The full pytest matrix on hardware is slow (first compile of each fresh
kernel config costs 40-90 s through the dev tunnel), so CI runs interpret
mode everywhere and THIS script drives one compiled representative of every
kernel family on the real chip — the cheapest end-to-end "Mosaic still
accepts and computes every kernel class" check (compiles are cached, so a
warm re-run takes seconds).

Run:  python tools/tpu_smoke.py          (from the repo root, TPU backend)
Exit code 0 = all families passed; prints one PASS/FAIL line per family.
"""

import sys
import traceback

import numpy as np


def _gemm():
    import jax.numpy as jnp

    import laser_tpu as lt

    rng = np.random.RandomState(0)
    a = rng.randn(256, 192).astype(np.float32)
    b = rng.randn(192, 128).astype(np.float32)
    got = np.asarray(lt.gemm(a, b, epilogue="relu"))  # epilogue -> Pallas
    want = np.maximum(a.astype(np.float64) @ b.astype(np.float64), 0)
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-5


def _gemm_int8():
    import jax.numpy as jnp

    import laser_tpu as lt

    rng = np.random.RandomState(0)
    a = rng.randint(-100, 100, (256, 256), np.int8)
    b = rng.randint(-100, 100, (256, 128), np.int8)
    got = np.asarray(lt.gemm(jnp.asarray(a), jnp.asarray(b)))
    want = a.astype(np.int32) @ b.astype(np.int32)
    assert np.array_equal(got, want)


def _wide_gemm():
    import jax.numpy as jnp

    from laser_tpu.ops.gemm.f64_kernel import gemm_f64

    rng = np.random.RandomState(0)
    a = rng.randn(64, 96)
    b = rng.randn(96, 64)
    got = np.asarray(gemm_f64(a, b))
    want = a @ b
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-12


def _foreach_vector_math():
    import jax.numpy as jnp

    import laser_tpu as lt

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1024, 256), jnp.float32)
    got = np.asarray(lt.exp(x))
    assert np.abs(got - np.exp(np.asarray(x, np.float64))).max() < 1e-4
    got = np.asarray(lt.softmax(x))
    import jax

    want = np.asarray(jax.nn.softmax(x, axis=-1))
    assert np.abs(got - want).max() < 1e-5


def _reduction_transpose():
    import jax.numpy as jnp

    import laser_tpu as lt

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(512, 512), jnp.float32)
    assert abs(float(lt.reduce_sum(x))
               - float(np.asarray(x, np.float64).sum())) < 1e-2
    got = np.asarray(lt.transpose2d(x))
    assert np.array_equal(got, np.asarray(x).T)


def _attention():
    import jax.numpy as jnp

    from laser_tpu.ops.attention import attention, attention_reference

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, 256, 128), jnp.float32)
    k = jnp.asarray(rng.randn(2, 256, 128), jnp.float32)
    v = jnp.asarray(rng.randn(2, 256, 128), jnp.float32)
    got = attention(q, k, v, causal=True, window=60,
                    block_q=128, block_k=128)
    want = attention_reference(q, k, v, causal=True, window=60)
    assert np.abs(np.asarray(got - want)).max() < 2e-5


def _conv():
    import jax.numpy as jnp

    import laser_tpu as lt

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 32, 32), jnp.float32)   # NCHW
    w = jnp.asarray(rng.randn(16, 8, 3, 3), jnp.float32)
    got = np.asarray(lt.conv2d_direct(x, w))
    import jax

    # HIGHEST precision: the default comparator runs 1-pass bf16 on TPU
    want = np.asarray(jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def _serving():
    import jax
    import jax.numpy as jnp

    from laser_tpu.models.llama import init_llama, llama_generate
    from laser_tpu.serving import ServingConfig, ServingEngine

    params = init_llama(jax.random.PRNGKey(0), n_layers=1, d_model=128,
                        n_heads=2, n_kv_heads=1, d_ff=256, vocab=64,
                        max_len=128)
    cfg = ServingConfig(page_size=16, n_pages=16, max_seqs=2,
                        max_pages_per_seq=4, prefill_buckets=(16,))
    eng = ServingEngine(params, n_heads=2, cfg=cfg, model="llama")
    p = np.arange(1, 9, dtype=np.int32)
    rid = eng.add_request(p, 6)
    out = eng.run()
    want = np.asarray(llama_generate(
        params, jnp.asarray(p[None]), jax.random.PRNGKey(0), n_heads=2,
        n_kv_heads=1, max_new_tokens=6, temperature=0.0))
    assert out[rid] == list(want[0, len(p):])


FAMILIES = [
    ("gemm+epilogue", _gemm),
    ("gemm int8 MXU", _gemm_int8),
    ("wide-dtype gemm (f64 limbs)", _wide_gemm),
    ("foreach/vector math/softmax", _foreach_vector_math),
    ("reduction + transpose", _reduction_transpose),
    ("flash attention (windowed)", _attention),
    ("conv2d direct", _conv),
    ("paged serving (llama)", _serving),
]


def main():
    import jax

    backend = jax.default_backend()
    print(f"backend: {backend}")
    if backend != "tpu":
        print("WARNING: not on TPU — this smoke suite is for hardware")
    failed = 0
    for name, fn in FAMILIES:
        try:
            fn()
            print(f"PASS {name}")
        except Exception:
            failed += 1
            print(f"FAIL {name}")
            traceback.print_exc()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
