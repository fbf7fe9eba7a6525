"""PackedTokenDataset: packing invariants + loss-masked training.

The pretraining input pipeline (data/loader.py): variable-length
documents -> fixed-length LM rows, either as one eos-joined stream (the
GPT/llama recipe) or first-fit-decreasing bins where no document spans
two rows and pad slots carry ignore_index for the loss to skip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from laser_tpu.data.loader import DataLoader, PackedTokenDataset

EOS = 99


def docs_fixture(rng, n=23, lo=3, hi=40, vocab=50):
    return [rng.randint(0, vocab, rng.randint(lo, hi)).astype(np.int32)
            for _ in range(n)]


class TestStreamMode:
    def test_every_token_once_and_eos_terminated(self, rng):
        docs = docs_fixture(rng)
        ds = PackedTokenDataset(docs, seq_len=16, eos_id=EOS)
        rows = ds.rows
        assert rows.shape[1] == 17
        stream = rows.reshape(-1)
        want = np.concatenate([np.concatenate([d, [EOS]]) for d in docs])
        np.testing.assert_array_equal(stream, want[:len(stream)])
        assert ds.efficiency == 1.0

    def test_seeded_shuffle_is_permutation(self, rng):
        docs = docs_fixture(rng)
        a = PackedTokenDataset(docs, 16, EOS, seed=7).rows
        b = PackedTokenDataset(docs, 16, EOS, seed=7).rows
        c = PackedTokenDataset(docs, 16, EOS, seed=8).rows
        np.testing.assert_array_equal(a, b)  # deterministic
        assert not np.array_equal(a, c)      # seed moves the order
        # same row geometry either way (the truncated tail depends on
        # the order, so token multisets legitimately differ)
        assert a.shape == c.shape

    def test_gather_feeds_loader(self, rng):
        docs = docs_fixture(rng)
        ds = PackedTokenDataset(docs, 16, EOS)
        dl = DataLoader(ds, 4, prefetch=0, shuffle=False)
        (batch,) = next(iter(dl.epoch_iter(0)))
        assert batch.shape == (4, 17)


class TestBinsMode:
    def test_no_doc_spans_rows_and_all_tokens_present(self, rng):
        docs = docs_fixture(rng, hi=15)
        ds = PackedTokenDataset(docs, seq_len=16, eos_id=EOS, mode="bins")
        rows = ds.rows
        # every document (+eos) appears contiguously inside exactly one row
        for d in docs:
            d_eos = np.concatenate([d, [EOS]])
            found = 0
            for r in rows:
                for s in range(0, rows.shape[1] - len(d_eos) + 1):
                    if np.array_equal(r[s:s + len(d_eos)], d_eos):
                        found += 1
                        break
            assert found >= 1, f"doc missing: {d_eos}"
        # pad slots are ignore_index, and only at row tails after content
        ii = ds.ignore_index
        for r in rows:
            pad = np.where(r == ii)[0]
            if len(pad):
                assert pad[0] + len(pad) == len(r)  # contiguous tail
        assert 0.5 < ds.efficiency <= 1.0

    def test_long_docs_are_chunked(self, rng):
        docs = [rng.randint(0, 50, 100).astype(np.int32)]
        ds = PackedTokenDataset(docs, seq_len=16, eos_id=EOS, mode="bins")
        content = ds.rows[ds.rows != ds.ignore_index]
        # 100 tokens + eos = 101 -> ceil(101/17) rows, all tokens kept
        assert (content != ds.ignore_index).all()
        assert len(content) == 101
        got = []
        for r in ds.rows:
            got.append(r[r != ds.ignore_index])
        # chunks, concatenated in *some* order, rebuild doc+eos
        assert sorted(np.concatenate(got).tolist()) == sorted(
            np.concatenate([docs[0], [EOS]]).tolist())

    def test_train_step_with_ignore_index(self, rng):
        """llama_train_step on bins rows: the masked loss equals the loss
        over only the real (non-pad) targets, and training runs."""
        from laser_tpu.models.llama import (init_llama, llama_lm_loss,
                                            llama_train_init,
                                            llama_train_step)

        docs = docs_fixture(rng, n=6, lo=4, hi=14, vocab=50)
        ds = PackedTokenDataset(docs, seq_len=16, eos_id=EOS, mode="bins")
        rows = jnp.asarray(ds.rows[:2])
        params = init_llama(jax.random.PRNGKey(0), n_layers=1, d_model=64,
                            n_heads=2, n_kv_heads=1, d_ff=96, vocab=100,
                            max_len=32)
        ii = ds.ignore_index
        loss = llama_lm_loss(params, rows, n_heads=2, n_kv_heads=1,
                             ignore_index=ii)
        # oracle: mean CE over real targets only, inputs clamped like the
        # model does
        from laser_tpu.models.llama import llama_forward
        clamped = jnp.where(rows == ii, 0, rows)
        lg = llama_forward(params, clamped, n_heads=2, n_kv_heads=1)
        logp = jax.nn.log_softmax(lg[:, :-1].astype(jnp.float32), -1)
        tgt = np.asarray(rows[:, 1:])
        mask = tgt != ii
        want = -np.asarray(logp)[
            np.arange(2)[:, None], np.arange(16)[None, :],
            np.where(mask, tgt, 0)][mask].mean()
        np.testing.assert_allclose(float(loss), float(want), rtol=1e-5)

        p, o, l1 = llama_train_step(params, llama_train_init(params), rows,
                                    1, n_heads=2, n_kv_heads=1, lr=1e-3,
                                    ignore_index=ii)
        assert np.isfinite(float(l1))

    def test_rejects_bad_mode(self):
        with pytest.raises(ValueError, match="mode"):
            PackedTokenDataset([np.arange(5)], 8, EOS, mode="wat")
        with pytest.raises(ValueError, match="documents"):
            PackedTokenDataset([], 8, EOS)
