"""Chunked (interleaved) flash-attention backward == unchunked backward.

The in-body sub-chunk loop in ``_build_bwd_dq`` / ``_build_bwd_dkv``
(ops/attention_bwd.py) is a pure scheduling transform — the math per
(q-block, k-block) pair is identical, only the streamed panel is split so
Mosaic can overlap chunk c's VPU work (exp, ds) with chunk c+1's MXU dots.
These tests pin that equivalence on every mask shape the kernel supports.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laser_tpu.ops.attention import _flash_forward_padded
from laser_tpu.ops.attention_bwd import flash_attention_bwd
from laser_tpu.config import should_interpret


def _run_bwd(seed, *, S, D, causal, chunk, window=None, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((2, S, D)), dtype)
    k = jnp.asarray(rng.standard_normal((2, S, D)), dtype)
    v = jnp.asarray(rng.standard_normal((2, S, D)), dtype)
    g = jnp.asarray(rng.standard_normal((2, S, D)), dtype)
    scale = 1.0 / np.sqrt(D)
    interp = should_interpret()
    out, (q3, k3, v3, o3, m3, l3), (BH, S_, SP, DP, bq, bk) = (
        _flash_forward_padded(q, k, v, causal, scale, S, S, interp,
                              window=window))
    g3 = jnp.pad(g.reshape(BH, S, D), ((0, 0), (0, SP - S), (0, DP - D)))
    return flash_attention_bwd(
        q3, k3, v3, o3, m3, l3, g3, S=S, SP=SP, D=DP, bq=bq, bk=bk,
        causal=causal, scale=float(scale), interpret=interp, window=window,
        chunk=chunk)


@pytest.mark.parametrize("causal", [False, True])
def test_chunked_bwd_matches_unchunked(causal):
    # S=512 -> one (bq, bk) = (512, 512) block pair; chunk=128 runs the
    # 4-iteration in-body loop in both kernels.
    base = _run_bwd(7, S=512, D=64, causal=causal, chunk=None)
    got = _run_bwd(7, S=512, D=64, causal=causal, chunk=128)
    for b, g in zip(base, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_chunked_bwd_windowed():
    base = _run_bwd(7, S=512, D=64, causal=True, chunk=None, window=256)
    got = _run_bwd(7, S=512, D=64, causal=True, chunk=256, window=256)
    for b, g in zip(base, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_chunk_must_divide_panel():
    with pytest.raises(ValueError, match="divide"):
        _run_bwd(7, S=512, D=64, causal=False, chunk=96)
