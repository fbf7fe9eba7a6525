"""Host-side data loading: shuffle/sample -> batch -> prefetch to device.

The runtime component a training framework needs around the kernels (the
reference is a primitives library with no input pipeline; this is
parity-plus infrastructure, like serving/). Design rules:

  * The host's only jobs are index math and memcpy — batch assembly is
    NumPy row gathers over in-memory or memory-mapped storage; everything
    compute-shaped happens on device.
  * The device never waits for the host: a background thread stages the
    next ``prefetch`` batches onto the device (``jax.device_put`` is async)
    while the current step runs — the TPU analog of the reference's
    prefetch hints (compiler_optim_hints.nim:30-73), applied at the
    pipeline level where TPUs actually need it.
  * Determinism: epoch order is a pure function of (seed, epoch) — the
    same property the kernels guarantee for reductions.
  * Weighted sampling rides the native C++ F+tree sampler
    (csrc/laser_host.cpp, O(log n) draws, with/without replacement) when
    the host runtime builds, with a NumPy fallback.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Sequence, Tuple

import jax
import numpy as np


class ArrayDataset:
    """In-memory (or memory-mapped) aligned arrays; item i = row i of each."""

    def __init__(self, *arrays: np.ndarray):
        if not arrays:
            raise ValueError("ArrayDataset needs at least one array")
        n = len(arrays[0])
        if any(len(a) != n for a in arrays):
            raise ValueError("arrays must share the leading dimension")
        self.arrays = arrays

    def __len__(self) -> int:
        return len(self.arrays[0])

    def gather(self, idx: np.ndarray) -> Tuple[np.ndarray, ...]:
        return tuple(np.ascontiguousarray(a[idx]) for a in self.arrays)


class TokenDataset:
    """A flat token stream (path to a raw int dtype file, or an array) cut
    into language-model windows: item i = (tokens[s:s+L], tokens[s+1:s+L+1])
    at stride ``stride`` (defaults to L: disjoint windows)."""

    def __init__(self, tokens, seq_len: int, *, stride: Optional[int] = None,
                 dtype=np.int32):
        if isinstance(tokens, str):
            tokens = np.memmap(tokens, dtype=dtype, mode="r")
        self.tokens = tokens
        self.seq_len = seq_len
        self.stride = stride or seq_len
        n = (len(tokens) - seq_len - 1) // self.stride + 1
        if len(tokens) < seq_len + 1:
            n = 0
        self._n = max(n, 0)

    def __len__(self) -> int:
        return self._n

    def gather(self, idx: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        L = self.seq_len
        starts = idx.astype(np.int64) * self.stride
        x = np.empty((len(idx), L), self.tokens.dtype)
        y = np.empty((len(idx), L), self.tokens.dtype)
        for r, s in enumerate(starts):  # contiguous slices: pure memcpy
            x[r] = self.tokens[s:s + L]
            y[r] = self.tokens[s + 1:s + L + 1]
        return x, y


def _epoch_order(n: int, seed: int, epoch: int) -> np.ndarray:
    return np.random.RandomState(
        (seed * 0x9E3779B9 + epoch) & 0x7FFFFFFF).permutation(n)


class DataLoader:
    """Batching iterator with deterministic shuffling, optional weighted
    sampling, and background device prefetch.

    weights: per-item sampling weights -> each epoch draws len(dataset)
    items through the native F+tree sampler (replacement controls whether
    an epoch can repeat items). Otherwise epochs are seeded permutations.

    prefetch: number of batches staged onto the device ahead of the
    consumer (0 = host arrays, no staging). sharding: a NamedSharding to
    place each batch with (e.g. dp-sharded along the batch axis).
    """

    def __init__(self, dataset, batch_size: int, *, seed: int = 0,
                 shuffle: bool = True, drop_remainder: bool = True,
                 weights: Optional[Sequence[float]] = None,
                 replacement: bool = True,
                 prefetch: int = 2, sharding=None):
        if batch_size <= 0:
            raise ValueError("batch_size must be positive")
        if weights is not None and len(weights) != len(dataset):
            raise ValueError("weights length != dataset length")
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle = shuffle
        self.drop_remainder = drop_remainder
        self.weights = None if weights is None else np.asarray(
            weights, np.float32)
        self.replacement = replacement
        self.prefetch = prefetch
        self.sharding = sharding
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_remainder else \
            -(-n // self.batch_size)

    def _order(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        if self.weights is not None:
            from .. import host

            # fall back to NumPy only when the native runtime cannot BUILD
            # (no toolchain); real sampler errors (bad weights, bugs) must
            # surface, not silently change the data order
            if host.available():
                s = host.FenwickSampler(self.weights)
                return s.sample(n, seed=(self.seed << 20) ^ epoch,
                                replacement=self.replacement).astype(np.int64)
            rs = np.random.RandomState((self.seed + epoch) & 0x7FFFFFFF)
            p = self.weights / self.weights.sum()
            return rs.choice(n, size=n, replace=self.replacement, p=p)
        if self.shuffle:
            return _epoch_order(n, self.seed, epoch)
        return np.arange(n)

    def _host_batches(self, epoch: int) -> Iterator[Tuple[np.ndarray, ...]]:
        order = self._order(epoch)
        bs = self.batch_size
        stop = len(order) - (len(order) % bs if self.drop_remainder else 0)
        for i in range(0, stop, bs):
            yield self.dataset.gather(order[i:i + bs])

    def epoch_iter(self, epoch: Optional[int] = None):
        """One epoch of batches. With prefetch > 0, a daemon thread stages
        batches on device ``prefetch`` ahead; device_put is async, so the
        upload of batch k+1..k+p overlaps the consumer's step on batch k."""
        ep = self.epoch if epoch is None else epoch
        if epoch is None:
            self.epoch += 1
        it = self._host_batches(ep)
        if self.prefetch <= 0:
            yield from it
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        END = object()
        stop = threading.Event()

        def put(item) -> bool:
            # timed put + stop flag: if the consumer abandons the epoch
            # (breaks out of the loop), the stager must not block forever
            # on a full queue — it would leak the thread and pin up to
            # ``prefetch`` staged device batches for the process lifetime
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def stage():
            # exceptions in the stager must reach the CONSUMER — a silently
            # truncated epoch would train on incomplete data
            try:
                for batch in it:
                    if self.sharding is not None:
                        batch = tuple(jax.device_put(b, self.sharding)
                                      for b in batch)
                    else:
                        batch = tuple(jax.device_put(b) for b in batch)
                    if not put(batch):
                        return
                put(END)
            except BaseException as e:  # noqa: BLE001 — re-raised below
                put(e)

        t = threading.Thread(target=stage, daemon=True)
        t.start()
        try:
            while True:
                b = q.get()
                if b is END:
                    break
                if isinstance(b, BaseException):
                    t.join()
                    raise b
                yield b
            t.join()
        finally:
            # reached normally (thread already done) or via GeneratorExit/
            # error in the consumer: release a blocked stager and reap it
            stop.set()
            t.join(timeout=5)

    def __iter__(self):
        return self.epoch_iter()


class PackedTokenDataset:
    """Variable-length documents packed into fixed-length LM rows.

    The pretraining input pipeline for models/llama.py: item i is ONE row
    of ``seq_len + 1`` tokens (feed it straight to ``llama_lm_loss`` /
    ``llama_train_step``, which shift internally). Two packing modes:

    * ``mode="stream"`` (the GPT/llama recipe): every document is
      terminated with ``eos_id`` and the documents are concatenated into
      one stream, cut into disjoint rows. Zero padding waste; attention
      may cross document boundaries (the eos token is what the model
      learns to reset on).
    * ``mode="bins"``: first-fit-decreasing bin packing — no document
      ever spans two rows. Documents longer than a row are chunked
      first; the tail of each row is padded. Padded positions carry
      ``pad_id`` in the inputs and ``ignore_index`` in the row (so the
      shifted targets there contribute zero loss/grad — pass the same
      ``ignore_index`` to the train step). ``efficiency`` reports the
      non-pad fraction.

    Packing is deterministic (a pure function of the documents and
    ``seed`` — ``seed`` only shuffles the stream-mode document order).
    """

    def __init__(self, docs: Sequence[np.ndarray], seq_len: int,
                 eos_id: int, *, mode: str = "stream",
                 pad_id: int = 0, ignore_index: int = -100,
                 seed: Optional[int] = None, dtype=np.int32):
        if mode not in ("stream", "bins"):
            raise ValueError(f"unknown mode {mode!r}")
        if not docs:
            raise ValueError("no documents")
        L = seq_len + 1
        self.seq_len = seq_len
        self.mode = mode
        self.ignore_index = ignore_index
        docs = [np.asarray(d, dtype).reshape(-1) for d in docs]

        if mode == "stream":
            order = (np.random.RandomState(seed).permutation(len(docs))
                     if seed is not None else np.arange(len(docs)))
            stream = np.concatenate(
                [np.concatenate([docs[i], [np.asarray(eos_id, dtype)]])
                 for i in order])
            n = len(stream) // L
            self.rows = stream[:n * L].reshape(n, L)
            self.efficiency = 1.0
            return

        # bins: chunk long docs, then first-fit-decreasing
        pieces = []
        for d in docs:
            d = np.concatenate([d, [np.asarray(eos_id, dtype)]])
            for s in range(0, len(d), L):
                pieces.append(d[s:s + L])
        pieces.sort(key=len, reverse=True)
        bins: list = []   # list of lists of pieces
        space: list = []  # remaining capacity per bin
        for p in pieces:
            for b, free in enumerate(space):
                if len(p) <= free:
                    bins[b].append(p)
                    space[b] -= len(p)
                    break
            else:
                bins.append([p])
                space.append(L - len(p))
        rows = np.full((len(bins), L), pad_id, dtype)
        mask = np.zeros((len(bins), L), bool)
        for b, ps in enumerate(bins):
            row = np.concatenate(ps)
            rows[b, :len(row)] = row
            mask[b, :len(row)] = True
        # pad positions carry ignore_index so the SHIFTED targets skip
        # them; inputs at those positions are pad_id (never attended-to
        # by any loss-bearing position in practice, and loss-masked)
        self.rows = np.where(mask, rows, np.asarray(ignore_index, dtype))
        self._inputs = rows
        self.efficiency = float(mask.mean())

    def __len__(self) -> int:
        return len(self.rows)

    def gather(self, idx: np.ndarray) -> Tuple[np.ndarray]:
        """(rows,): (len(idx), seq_len+1) int tokens. In bins mode pad
        positions hold ``ignore_index``; clamp for embedding lookups with
        ``np.maximum(rows, 0)`` or feed the train step's ignore_index."""
        return (np.ascontiguousarray(self.rows[idx]),)
