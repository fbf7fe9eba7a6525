"""Data loading: determinism, windows, weighted sampling, prefetch, sharding."""

import collections

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laser_tpu.data import ArrayDataset, DataLoader, TokenDataset


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(0xDEADBEEF)


def test_epoch_determinism_and_coverage(rng):
    x = rng.randn(37, 4).astype(np.float32)
    y = np.arange(37, dtype=np.int32)
    ds = ArrayDataset(x, y)
    dl = DataLoader(ds, 8, seed=3, prefetch=0)
    e0a = [b[1].tolist() for b in dl.epoch_iter(0)]
    e0b = [b[1].tolist() for b in dl.epoch_iter(0)]
    e1 = [b[1].tolist() for b in dl.epoch_iter(1)]
    assert e0a == e0b            # same epoch -> same order
    assert e0a != e1             # different epoch -> reshuffled
    assert len(e0a) == 4         # 37 // 8 (drop_remainder)
    seen = [i for b in e0a for i in b]
    assert len(set(seen)) == 32  # no repeats within an epoch
    # rows stay aligned across arrays
    for bx, by in dl.epoch_iter(0):
        assert np.array_equal(bx, x[by])


def test_drop_remainder_off(rng):
    ds = ArrayDataset(np.arange(10, dtype=np.int32))
    dl = DataLoader(ds, 4, shuffle=False, drop_remainder=False, prefetch=0)
    sizes = [len(b[0]) for b in dl.epoch_iter(0)]
    assert sizes == [4, 4, 2]
    assert len(dl) == 3


def test_token_windows(tmp_path):
    toks = np.arange(100, dtype=np.int32)
    p = tmp_path / "toks.bin"
    toks.tofile(p)
    ds = TokenDataset(str(p), seq_len=8)
    assert len(ds) == 12  # starts 0,8,...,88: s + L + 1 <= 100
    x, y = ds.gather(np.array([0, 3]))
    assert np.array_equal(x[0], np.arange(8))
    assert np.array_equal(y[0], np.arange(1, 9))
    assert np.array_equal(x[1], np.arange(24, 32))
    assert np.array_equal(y[1], x[1] + 1)
    # overlapping windows
    ds2 = TokenDataset(toks, seq_len=8, stride=4)
    x2, _ = ds2.gather(np.array([1]))
    assert np.array_equal(x2[0], np.arange(4, 12))


def test_weighted_sampling_bias(rng):
    n = 64
    w = np.ones(n, np.float32)
    w[:8] = 50.0  # heavy head
    ds = ArrayDataset(np.arange(n, dtype=np.int32))
    dl = DataLoader(ds, 16, weights=w, seed=1, prefetch=0)
    counts = collections.Counter()
    for ep in range(20):
        for (b,) in dl.epoch_iter(ep):
            counts.update(b.tolist())
    head = sum(counts[i] for i in range(8))
    total = sum(counts.values())
    # heavy items carry 400/456 of the mass; allow wide slack
    assert head / total > 0.7


def test_weighted_without_replacement(rng):
    n = 32
    ds = ArrayDataset(np.arange(n, dtype=np.int32))
    dl = DataLoader(ds, 8, weights=np.ones(n, np.float32),
                    replacement=False, prefetch=0)
    seen = [i for (b,) in dl.epoch_iter(0) for i in b.tolist()]
    assert sorted(seen) == list(range(n))  # an epoch is a permutation


def test_prefetch_matches_host_path(rng):
    x = rng.randn(40, 3).astype(np.float32)
    ds = ArrayDataset(x)
    host = [b[0] for b in DataLoader(ds, 8, seed=5, prefetch=0).epoch_iter(2)]
    dev = [np.asarray(b[0]) for b in
           DataLoader(ds, 8, seed=5, prefetch=3).epoch_iter(2)]
    assert len(host) == len(dev)
    for h, d in zip(host, dev):
        assert np.array_equal(h, d)


def test_sharded_placement(rng):
    from laser_tpu.parallel.mesh import make_mesh, sharding

    if len(jax.devices()) < 4:  # single real chip: CI runs this on the
        pytest.skip("needs 4 devices")  # 8-device virtual CPU mesh
    mesh = make_mesh({"dp": 4}, devices=jax.devices()[:4])
    ds = ArrayDataset(rng.randn(64, 8).astype(np.float32))
    dl = DataLoader(ds, 16, prefetch=2, sharding=sharding(mesh, "dp"))
    for (b,) in dl.epoch_iter(0):
        assert isinstance(b, jax.Array)
        assert b.shape == (16, 8)
        assert len(b.sharding.device_set) == 4
        break


def test_abandoned_epoch_iter_reaps_stager_thread():
    """ADVICE r2: breaking out of epoch_iter mid-epoch must not leak the
    prefetch stager thread (it used to block forever on q.put)."""
    import threading
    import numpy as np
    from laser_tpu.data import ArrayDataset, DataLoader

    xs = np.arange(64, dtype=np.float32).reshape(32, 2)
    dl = DataLoader(ArrayDataset(xs), batch_size=2, prefetch=2, shuffle=False)
    before = threading.active_count()
    it = dl.epoch_iter(0)
    next(it)  # stager is now running and will fill the queue
    it.close()  # abandon the epoch (what a `break` in a for-loop does)
    deadline = 50
    while threading.active_count() > before and deadline:
        import time
        time.sleep(0.1)
        deadline -= 1
    assert threading.active_count() <= before, "stager thread leaked"
