"""Continuous-batching serving engine over a paged KV cache.

Parity-plus subsystem (the reference is a compute-primitives library with no
serving layer, SURVEY.md §5): production LLM serving on TPU needs
  * a PAGED KV cache — fixed-size pages in a shared pool, so sequences of
    different lengths batch without per-sequence max-length reservation and
    finished sequences return their memory instantly (no compaction), and
  * CONTINUOUS batching — new requests join the running batch the moment a
    slot frees up, instead of waiting for the whole batch to drain.

Split of labor (the same host/device split as the GEMM driver vs its
microkernels):
  * Host (this engine): request queue, slot + page allocation (a free list),
    block tables, stop conditions. O(batch) Python per step — negligible
    next to a device step.
  * Device (jitted `_decode_step` / per-bucket `_prefill`): one batched
    transformer step for every active slot — fused linears, paged-attention
    kernel (ops/paged_attention.py), KV scatter into the pool. Pools are
    donated, so the cache updates in place across steps.

Decode is token-identical to ``models.transformer.greedy_decode`` for every
request regardless of how requests interleave (tested).

Model family: the `models.transformer` parameter schema (wqkv/wo/w1/w2 +
layer norms, tied embeddings).
"""

from __future__ import annotations

import dataclasses
from collections import deque
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.gemm.autodiff import gemm_ad, linear
from ..ops.norm import layer_norm
from ..ops.paged_attention import paged_attention


@dataclasses.dataclass(frozen=True)
class ServingConfig:
    page_size: int = 64
    n_pages: int = 256          # shared pool size (last page is the trash
    # page for inactive slots' writes)
    max_seqs: int = 8           # concurrent sequences (decode batch)
    max_pages_per_seq: int = 16
    prefill_buckets: Tuple[int, ...] = (64, 128, 256, 512, 1024)
    kv_quant: bool = False      # int8 KV pages + per-token-head f32 scales:
    # ~4x less HBM per decoded token (decode is HBM-bound)
    weight_quant: "bool | str" = False  # weight-only quant on every block
    # linear: decode at small batch is WEIGHT-HBM-bound, so fewer weight
    # bytes is more tokens/s. True or "int8" = per-output-column int8
    # (~4x fewer bytes vs f32); "int4" = group-wise symmetric int4
    # (ops/gemm/int4_kernel.py) — two values per byte, unpacked on the VPU
    # inside the Pallas matmul, ~8x fewer weight bytes. Embeddings/unembed
    # stay full precision.
    weight_quant_group: int = 64  # int4 scale-group length along the
    # contraction axis (must divide every block linear's input width)
    prefix_cache: bool = False  # automatic prefix caching: FULL prompt
    # pages register in a prompt-hash index; a new request reuses the
    # longest page-aligned cached prefix (refcounted, zero copy) and
    # prefills only its suffix, attending to the cached pages through a
    # stats-merged flash pass. Entries evict LRU under page pressure.
    decode_burst: int = 1       # decode steps per device dispatch: a
    # lax.scan runs `decode_burst` decode+sample steps ON DEVICE with
    # in-loop stop detection (eos / max_new_tokens), so the host syncs
    # once per burst instead of once per token — the host round trip
    # (20-40 ms through a network-attached TPU) stops bounding decode
    # throughput. Token-identical to burst=1; admission/preemption/window
    # page recycling happen at burst boundaries. 1 = sync every token.
    spec_gamma: int = 0         # speculative decoding (0 = off): a DRAFT
    # model (ServingEngine(..., draft_params=...)) proposes `spec_gamma`
    # tokens per round with cheap cached decode steps; the target scores
    # the whole window in ONE paged W-query forward
    # (ops/paged_attention.py:paged_window_attention) and accepts a
    # prefix — greedy slots keep the longest argmax-matching prefix
    # (token-identical to non-speculative greedy), sampled slots use the
    # rejection scheme (ops/sampling.py:speculative_accept — every
    # emitted token marginally EXACTLY target-distributed). Rounds run
    # inside the decode-burst scan (~decode_burst/(gamma+1) rounds per
    # dispatch). Unsupported with window/mesh/top_k/top_p.
    draft_weight_quant: "bool | str" = False  # weight-only quant for the
    # DRAFT's block linears (False | "int8" | "int4"): the standard cheap
    # draft on a weight-HBM-bound target is the QUANTIZED SELF-DRAFT —
    # pass draft_params=params and let the draft stream 4-8x fewer bytes.
    pipeline_bursts: bool = False  # speculative burst pipelining: dispatch
    # burst n+1 BEFORE harvesting burst n's (toks, lives), so the host
    # round trip of the harvest overlaps the next burst's device compute
    # (wall per burst -> max(RTT, compute) instead of RTT + compute). The
    # scan's in-loop stop detection makes speculation correctness-safe: a
    # slot that finished in burst n is dead on device for burst n+1
    # (remaining==0 -> trash-page writes, lives=False), and the pending
    # burst is flushed before any structural change (admission, single-
    # step fallback, preemption). Token-identical to unpipelined; tokens
    # surface one step() later. Ignored when window is set (window page
    # recycling rewrites tables every burst).


class PagedKVCache:
    """Shared KV page pool + host-side allocator.

    state["pools"]: (L, 2, P, Hkv, ps, hd) device array (donated across
    steps); with kv_quant also state["scales"] (L, 2, P, Hkv, ps) f32.
    tables/lengths: host int32 mirrors shipped to the device each step.
    """

    def __init__(self, n_layers: int, n_kv_heads: int, head_dim: int,
                 cfg: ServingConfig, dtype=jnp.float32):
        self.cfg = cfg
        pool_dt = jnp.int8 if cfg.kv_quant else dtype
        # pools keep the NATIVE head dim: the paged-attention kernel's
        # blocks cover the full hd extent, which Mosaic accepts unpadded
        # for any hd (verified on TPU for 64/96/128) — no 128-lane padding,
        # no per-step pool copies, no extra HBM
        self.state = {"pools": jnp.zeros(
            (n_layers, 2, cfg.n_pages, n_kv_heads, cfg.page_size, head_dim),
            pool_dt)}
        if cfg.kv_quant:
            self.state["scales"] = jnp.zeros(
                (n_layers, 2, cfg.n_pages, n_kv_heads, cfg.page_size),
                jnp.float32)
        self.tables = np.zeros((cfg.max_seqs, cfg.max_pages_per_seq),
                               np.int32)
        self.lengths = np.zeros((cfg.max_seqs,), np.int32)
        # page n_pages-1 is the trash page: inactive slots' decode writes
        # land there so they can never corrupt a live page
        self.trash_page = cfg.n_pages - 1
        self.free_pages = deque(range(cfg.n_pages - 1))
        self.pages_of: List[List[int]] = [[] for _ in range(cfg.max_seqs)]
        # reference counts: a page is held by each slot whose table lists it
        # plus once per prefix-registry entry naming it; it returns to the
        # free list only at zero (prefix caching shares FULL prompt pages
        # between requests — full pages are never written after prefill, so
        # sharing needs no copy-on-write)
        self.page_refs = np.zeros((cfg.n_pages,), np.int32)

    def n_free(self) -> int:
        return len(self.free_pages)

    def alloc(self, slot: int, n: int) -> List[int]:
        if n > len(self.free_pages):
            raise RuntimeError("page pool exhausted")
        if len(self.pages_of[slot]) + n > self.cfg.max_pages_per_seq:
            raise RuntimeError(f"slot {slot} exceeds max_pages_per_seq")
        got = [self.free_pages.popleft() for _ in range(n)]
        self.page_refs[got] = 1
        base = len(self.pages_of[slot])
        self.pages_of[slot].extend(got)
        self.tables[slot, base:base + n] = got
        return got

    def attach(self, slot: int, pages: List[int]):
        """Share already-filled pages (a cached prompt prefix) with a slot."""
        if len(self.pages_of[slot]) + len(pages) > self.cfg.max_pages_per_seq:
            raise RuntimeError(f"slot {slot} exceeds max_pages_per_seq")
        for p in pages:
            self.page_refs[p] += 1
        base = len(self.pages_of[slot])
        self.pages_of[slot].extend(pages)
        self.tables[slot, base:base + len(pages)] = pages

    def decref(self, pages: List[int]):
        for p in pages:
            if p == self.trash_page:
                continue  # windowed slots hold trash placeholders
            self.page_refs[p] -= 1
            if self.page_refs[p] == 0:
                self.free_pages.append(p)

    def release(self, slot: int):
        self.decref(self.pages_of[slot])
        self.pages_of[slot] = []
        self.tables[slot, :] = 0
        self.lengths[slot] = 0

    def ensure_capacity(self, slot: int):
        """Allocate the next page iff the next token write crosses into it."""
        need = self.lengths[slot] // self.cfg.page_size + 1
        if len(self.pages_of[slot]) < need:
            self.alloc(slot, 1)


@dataclasses.dataclass
class _Request:
    req_id: int
    prompt: np.ndarray
    max_new_tokens: int
    eos_id: Optional[int]
    temperature: float = 0.0   # 0 = greedy
    top_k: int = 0             # 0 = off
    top_p: float = 1.0         # 1 = off
    seed: int = 0
    out: List[int] = dataclasses.field(default_factory=list)
    slot: int = -1


class ServingEngine:
    """``model``: "transformer" (models/transformer.py schema, MHA) or
    "llama" (models/llama.py schema: RoPE + GQA + SwiGLU; n_kv_heads is
    inferred from the wkv projection)."""

    def __init__(self, params: Dict, *, n_heads: int,
                 cfg: ServingConfig = ServingConfig(), dtype=None,
                 model: str = "transformer", mesh=None,
                 window: Optional[int] = None,
                 draft_params: Optional[Dict] = None,
                 draft_n_heads: Optional[int] = None):
        """``window``: sliding-window attention (both families) — decode
        attends only the last ``window`` keys (O(window) per step via page
        skipping) and prefill applies the same mask; generations match
        ``llama_generate(..., window=window)`` /
        ``greedy_decode(..., window=window)`` token for token."""
        if model not in ("transformer", "llama"):
            raise ValueError(f"unknown model family {model!r}")
        if window is not None:
            if int(window) < 1:
                raise ValueError(f"window must be >= 1, got {window}")
            window = int(window)
        self.window = window
        if mesh is not None and model != "llama":
            raise ValueError("tensor-parallel serving: llama family only")
        bad = [b for b in cfg.prefill_buckets if b % cfg.page_size]
        if bad:
            raise ValueError(f"prefill_buckets {bad} are not multiples of "
                             f"page_size {cfg.page_size} (prefill scatters "
                             f"whole pages)")
        self.n_heads = n_heads
        self.cfg = cfg
        self.model = model
        self.mesh = mesh
        D = params["embed"].shape[1]
        self.head_dim = D // n_heads
        if model == "llama":
            self.n_kv_heads = params["blocks"][0]["wkv"].shape[1] // (
                2 * self.head_dim)
            capacity = cfg.max_pages_per_seq * cfg.page_size
            if params["rope_cos"].shape[0] < capacity:
                raise ValueError(
                    f"rope table covers {params['rope_cos'].shape[0]} "
                    f"positions < per-sequence capacity {capacity} "
                    f"(max_pages_per_seq * page_size); re-init the model "
                    f"with a larger max_len")
        else:
            self.n_kv_heads = n_heads
        if cfg.weight_quant:
            params = quantize_block_weights(
                params, model,
                mode="int4" if cfg.weight_quant == "int4" else "int8",
                group=cfg.weight_quant_group)
        self.params = params
        dt = dtype or params["embed"].dtype
        self.cache = PagedKVCache(len(params["blocks"]), self.n_kv_heads,
                                  self.head_dim, cfg, dt)
        self.queue: deque[_Request] = deque()
        self.running: List[Optional[_Request]] = [None] * cfg.max_seqs
        self.finished: Dict[int, List[int]] = {}
        self._next_id = 0
        self._tokens = np.zeros((cfg.max_seqs,), np.int32)
        self.stats = {"decode_steps": 0, "prefills": 0, "tokens_out": 0,
                      "requests_done": 0, "peak_pages_in_use": 0,
                      "prefix_hits": 0, "prefix_tokens_reused": 0,
                      "prefix_evictions": 0}
        # prompt-prefix registry: chained page digest (see _prefix_keys)
        # -> page list (each entry holds one ref per page; evicted LRU-first)
        self._prefix_index: Dict[bytes, List[int]] = {}
        self._prefix_lru: List[bytes] = []
        # per-slot sampling parameters (mirrored to device each step);
        # sampling itself runs in ONE batched device call so slots with
        # different temperatures/filters/seeds coexist in a step
        from ..ops.sampling import sample_logits_batch

        self._samp = {"seed": np.zeros((cfg.max_seqs,), np.int32),
                      "temp": np.zeros((cfg.max_seqs,), np.float32),
                      "top_k": np.zeros((cfg.max_seqs,), np.int32),
                      "top_p": np.ones((cfg.max_seqs,), np.float32)}
        self._sampler = jax.jit(sample_logits_batch)
        if cfg.decode_burst < 1:
            raise ValueError(f"decode_burst must be >= 1, got "
                             f"{cfg.decode_burst}")
        decode_fn = _decode_step if model == "transformer" else \
            _llama_decode_step
        self._prefill_fn = _prefill_paged if model == "transformer" else \
            _llama_prefill_paged
        self._burst_fn = None  # built lazily on first burst dispatch
        # device-resident burst operands (tables/lengths/tokens/remaining/
        # eos/sampling params); None = host state changed, re-upload
        self._dev = None
        # speculative-pipelining state: the dispatched-but-unharvested
        # burst's (toks, lives) device futures + its active set and k
        self._pending = None
        if mesh is None:
            self._decode_raw = partial(decode_fn, n_heads=n_heads,
                                       page_size=cfg.page_size, window=window)
            self._decode = jax.jit(
                partial(decode_fn, n_heads=n_heads,
                        page_size=cfg.page_size, window=window),
                donate_argnums=(1,))
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            tp = mesh.shape["tp"]
            if n_heads % tp or self.n_kv_heads % tp:
                raise ValueError(
                    f"n_heads {n_heads} / n_kv_heads {self.n_kv_heads} "
                    f"not divisible by tp={tp}")
            self.params = _shard_llama_params(params, mesh, n_heads)
            pspecs, kv_specs = _llama_tp_specs(params, self.cache.state)
            self.cache.state = jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
                self.cache.state, kv_specs)
            self._tp_specs = (pspecs, kv_specs)
            rep = P()
            self._decode_raw = partial(_llama_decode_step,
                                       n_heads=n_heads // tp,
                                       page_size=cfg.page_size,
                                       window=window, tp_axis="tp")
            self._decode = jax.jit(jax.shard_map(
                self._decode_raw,
                mesh=mesh,
                in_specs=(pspecs, kv_specs, rep, rep, rep, rep),
                out_specs=(rep, kv_specs), check_vma=False),
                donate_argnums=(1,))
        self._prefills = {}

        # -- speculative decoding: draft model + its own KV pools ----------
        self.spec = draft_params is not None and cfg.spec_gamma >= 1
        if draft_params is not None and cfg.spec_gamma < 1:
            raise ValueError("draft_params given but cfg.spec_gamma < 1")
        if self.spec:
            if mesh is not None:
                raise ValueError("speculative serving: tp mesh unsupported")
            if window is not None:
                raise ValueError("speculative serving: sliding window "
                                 "unsupported")
            tv = (params["embed"].shape[0] if model == "transformer"
                  else params["unembed"].shape[1])
            dv = (draft_params["embed"].shape[0] if model == "transformer"
                  else draft_params["unembed"].shape[1])
            if tv != dv:
                raise ValueError(f"draft vocab {dv} != target vocab {tv}")
            dD = draft_params["embed"].shape[1]
            dH = draft_n_heads if draft_n_heads is not None else n_heads
            if dD % dH:
                raise ValueError(f"draft d_model {dD} not divisible by "
                                 f"draft_n_heads {dH}")
            d_hd = dD // dH
            if model == "llama":
                d_nkv = draft_params["blocks"][0]["wkv"].shape[1] // (
                    2 * d_hd)
                capacity = cfg.max_pages_per_seq * cfg.page_size
                if draft_params["rope_cos"].shape[0] < capacity:
                    raise ValueError(
                        "draft rope table shorter than per-sequence "
                        "capacity; re-init the draft with a larger max_len")
            else:
                d_nkv = dH
            if cfg.draft_weight_quant:
                draft_params = quantize_block_weights(
                    draft_params, model,
                    mode="int4" if cfg.draft_weight_quant == "int4"
                    else "int8", group=cfg.weight_quant_group)
            self.draft_params = draft_params
            self.draft_n_heads = dH
            self._vocab = tv
            # the draft's pools mirror the target's PAGE STRUCTURE — same
            # page ids, same tables/lengths mirrors, one allocator — so a
            # slot's draft KV lives at the same (page, row) as its target
            # KV and every allocation/eviction/prefix-share covers both
            pool_dt = jnp.int8 if cfg.kv_quant else dt
            self.draft_state = {"pools": jnp.zeros(
                (len(draft_params["blocks"]), 2, cfg.n_pages, d_nkv,
                 cfg.page_size, d_hd), pool_dt)}
            if cfg.kv_quant:
                self.draft_state["scales"] = jnp.zeros(
                    (len(draft_params["blocks"]), 2, cfg.n_pages, d_nkv,
                     cfg.page_size), jnp.float32)
            self._ddecode_raw = partial(decode_fn, n_heads=dH,
                                        page_size=cfg.page_size, window=None)
            self._ddecode = jax.jit(self._ddecode_raw, donate_argnums=(1,))
            self._window_raw = partial(
                _window_step if model == "transformer"
                else _llama_window_step,
                n_heads=n_heads, page_size=cfg.page_size)
            self._dprefills = {}
            self._spec_burst_fn = None
            # per-dispatch round count: keep the emitted-token budget per
            # burst comparable to the plain path's decode_burst
            self.spec_rounds = max(1, cfg.decode_burst // (cfg.spec_gamma
                                                           + 1))

    # -- request API -------------------------------------------------------
    def add_request(self, prompt, max_new_tokens: int,
                    eos_id: Optional[int] = None, *,
                    temperature: float = 0.0, top_k: int = 0,
                    top_p: float = 1.0, seed: int = 0) -> int:
        """temperature/top_k/top_p/seed: per-request sampling (defaults =
        greedy). The PRNG key for the token at absolute index i is
        fold_in(PRNGKey(seed), i) — the same schedule as
        models.llama.llama_generate, so a single request with matching
        parameters decodes token-identically to it; it also makes
        preempt-and-requeue replay the identical continuation."""
        prompt = np.asarray(prompt, np.int32).reshape(-1)
        if len(prompt) == 0:
            raise ValueError("empty prompt")
        if self.spec and (top_k > 0 or top_p < 1.0):
            # the rejection scheme is exact for plain temperature
            # sampling; filtered distributions would need the filters
            # applied to BOTH p and q per position — not implemented
            raise ValueError("speculative serving supports greedy and "
                             "plain temperature sampling only "
                             "(top_k/top_p off)")
        # prompts longer than the largest bucket prefill in CHUNKS (each
        # chunk a suffix prefill against the pages written so far) — the
        # only hard limits are the page-capacity ones below
        ps = self.cfg.page_size
        need = -(-(len(prompt) + max_new_tokens) // ps)
        if need > self.cfg.max_pages_per_seq:
            raise ValueError(
                f"prompt + max_new_tokens needs {need} pages > "
                f"max_pages_per_seq {self.cfg.max_pages_per_seq}")
        if self.window is not None:
            # windowed decode recycles out-of-window pages, so the pool
            # only ever holds: all prompt pages during prefill (+1 for the
            # first decode write), or the window's live span — whichever
            # peaks higher
            need_pool = max(-(-len(prompt) // ps) + 1,
                            -(-(self.window + ps) // ps) + 1)
            need_pool = min(need_pool, need)
        else:
            need_pool = need
        if need_pool > self.cfg.n_pages - 1:
            raise ValueError(
                f"request needs {need_pool} pages > pool size "
                f"{self.cfg.n_pages - 1}")
        rid = self._next_id
        self._next_id += 1
        self.queue.append(_Request(rid, prompt, max_new_tokens, eos_id,
                                   float(temperature), int(top_k),
                                   float(top_p), int(seed)))
        return rid

    def has_work(self) -> bool:
        return bool(self.queue) or any(r is not None for r in self.running)

    def run(self) -> Dict[int, List[int]]:
        """Drain everything; returns {req_id: generated tokens}."""
        while self.has_work():
            self.step()
        out, self.finished = self.finished, {}
        return out

    # -- engine loop -------------------------------------------------------
    def step(self):
        if self._pending is not None and self.queue:
            # admission reuses slots the pending burst may still be
            # attributing tokens to — land it first
            self._flush_pending()
        self._admit()
        active = [s for s, r in enumerate(self.running) if r is not None]
        if not active:
            return
        if self.spec:
            if self._step_burst_spec(active):
                return
        elif self.cfg.decode_burst > 1 and self._step_burst(active):
            return
        # the single-step path mutates lengths/tokens host-side per token
        self._flush_pending()
        self._dev = None
        ps = self.cfg.page_size
        # a decode step writes K/V at position lengths[s]: make sure the
        # page exists; inactive slots write to the trash page
        write_page = np.full((self.cfg.max_seqs,), self.cache.trash_page,
                             np.int32)
        for s in active[:]:
            if self.running[s] is None:
                continue  # preempted earlier in this loop
            try:
                self._ensure_capacity(s)
            except RuntimeError:
                # page pool exhausted: PREEMPT the youngest request — its
                # pages return to the pool and it re-enters the queue with
                # prompt + generated-so-far as the new prompt (decoding and
                # sampling are position-deterministic, so the continuation
                # is identical; chunked prefill serves requeued prompts of
                # any length).
                candidates = [t for t in active
                              if self.running[t] is not None]
                others = [t for t in candidates if t != s]
                if not others:
                    # s itself is the only preemptable request
                    self._preempt(s)
                    active.remove(s)
                    write_page[s] = self.cache.trash_page
                    continue
                victim = min(others, key=lambda t: len(self.running[t].out))
                self._preempt(victim)
                active.remove(victim)
                # the victim may have been processed earlier in this loop:
                # its write_page would point at a page just returned to the
                # free list (and possibly re-allocated below) — reset it
                write_page[victim] = self.cache.trash_page
                self._ensure_capacity(s)  # freed pages: must succeed
            write_page[s] = self.cache.pages_of[s][
                self.cache.lengths[s] // ps]
        if not active:
            return
        lengths = jnp.asarray(self.cache.lengths)
        logits, self.cache.state = self._decode(
            self.params, self.cache.state, jnp.asarray(self.cache.tables),
            lengths, jnp.asarray(write_page), jnp.asarray(self._tokens))
        if self.spec:
            # keep the draft's pools position-synced: its K/V row for this
            # step's input token, written at the same (page, row) — so a
            # later speculative burst resumes with a fully-populated draft
            # history (acceptance quality; correctness never depends on it)
            _, self.draft_state = self._ddecode(
                self.draft_params, self.draft_state,
                jnp.asarray(self.cache.tables), lengths,
                jnp.asarray(write_page), jnp.asarray(self._tokens))
        # absolute index of the token each slot emits this step (keys fold
        # on it, so sampling is position-deterministic)
        pos = np.zeros((self.cfg.max_seqs,), np.int32)
        for s in active:
            r = self.running[s]
            pos[s] = len(r.prompt) + len(r.out)
        nxt = np.asarray(self._sampler(
            jnp.asarray(self._samp["seed"]), jnp.asarray(pos), logits,
            jnp.asarray(self._samp["temp"]), jnp.asarray(self._samp["top_k"]),
            jnp.asarray(self._samp["top_p"])), np.int32)
        self.stats["decode_steps"] += 1
        self.stats["tokens_out"] += len(active)
        self.stats["peak_pages_in_use"] = max(
            self.stats["peak_pages_in_use"],
            self.cfg.n_pages - 1 - self.cache.n_free())
        for s in active:
            r = self.running[s]
            self.cache.lengths[s] += 1
            tok = int(nxt[s])
            r.out.append(tok)
            self._tokens[s] = tok
            done = (len(r.out) >= r.max_new_tokens
                    or (r.eos_id is not None and tok == r.eos_id))
            if done:
                self.stats["requests_done"] += 1
                prefix = getattr(self, "_requeued_prefix", {}).pop(
                    r.req_id, [])
                self.finished[r.req_id] = prefix + r.out
                self.cache.release(s)
                self.running[s] = None
            elif self.window is not None:
                self._free_out_of_window_pages(s)

    def _get_burst_fn(self):
        if self._burst_fn is None:
            k = self.cfg.decode_burst
            body = partial(_decode_burst_scan, decode_fn=self._decode_raw,
                           k=k, page_size=self.cfg.page_size,
                           trash_page=self.cache.trash_page)
            if self.mesh is None:
                self._burst_fn = jax.jit(body, donate_argnums=(1,))
            else:
                from jax.sharding import PartitionSpec as P

                pspecs, kv_specs = self._tp_specs
                rep = P()
                self._burst_fn = jax.jit(jax.shard_map(
                    body, mesh=self.mesh,
                    in_specs=(pspecs, kv_specs) + (rep,) * 9,
                    out_specs=(kv_specs,) + (rep,) * 5, check_vma=False),
                    donate_argnums=(1,))
        return self._burst_fn

    def _step_burst(self, active) -> bool:
        """Decode up to ``decode_burst`` tokens per slot in one dispatch.

        Pre-allocates every page the burst can write (so the device never
        needs host intervention mid-burst), then mirrors the device's
        in-loop stop bookkeeping from the returned (toks, lives) record.
        Returns False — caller falls back to the single-step path, which
        can preempt — when the pool can't cover the whole burst.

        With ``cfg.pipeline_bursts`` the harvest of burst n is deferred
        until burst n+1 is dispatched, overlapping the host round trip
        with device compute; any path that needs a coherent host view
        (device-state re-upload, allocation failure, admission,
        preemption) flushes the pending burst first."""
        k = self.cfg.decode_burst
        ok, any_work, alloc_happened = self._burst_prealloc(active, k)
        if not ok:
            return False
        if not any_work:
            # every remaining token is already covered by the pending burst
            self._flush_pending()
            return True
        S = self.cfg.max_seqs
        # Device-resident burst state: every operand the burst fn needs
        # besides params/KV lives in self._dev between bursts (the scan
        # returns its final token/length/remaining carries). In steady
        # state — no admission, finish, preemption, or page movement —
        # NOTHING is uploaded per burst; through a high-latency host link
        # each jnp.asarray here is a round trip, and uploads were costing
        # as much as the decode itself (measured 73 -> ~40 ms/burst, b8
        # burst 32). Any structural host-state change sets self._dev =
        # None and the next burst re-uploads everything.
        d = self._dev
        if d is None:
            remaining = np.zeros((S,), np.int32)
            eos = np.full((S,), -1, np.int32)
            for s in active:
                r = self.running[s]
                if r is None:
                    continue  # finished during a pending-burst flush
                remaining[s] = r.max_new_tokens - len(r.out)
                if r.eos_id is not None:
                    eos[s] = r.eos_id
            d = {"tables": jnp.asarray(self.cache.tables),
                 "lengths": jnp.asarray(self.cache.lengths),
                 "tokens": jnp.asarray(self._tokens),
                 "remaining": jnp.asarray(remaining),
                 "eos": jnp.asarray(eos),
                 "seed": jnp.asarray(self._samp["seed"]),
                 "temp": jnp.asarray(self._samp["temp"]),
                 "top_k": jnp.asarray(self._samp["top_k"]),
                 "top_p": jnp.asarray(self._samp["top_p"])}
        elif alloc_happened:
            d["tables"] = jnp.asarray(self.cache.tables)
        (self.cache.state, toks, lives, tok_f, len_f,
         rem_f) = self._get_burst_fn()(
            self.params, self.cache.state, d["tables"], d["lengths"],
            d["tokens"], d["remaining"], d["eos"], d["seed"], d["temp"],
            d["top_k"], d["top_p"])
        d["tokens"], d["lengths"], d["remaining"] = tok_f, len_f, rem_f
        self._dev = d
        self.stats["decode_steps"] += k
        self.stats["decode_bursts"] = self.stats.get("decode_bursts", 0) + 1
        self.stats["peak_pages_in_use"] = max(
            self.stats["peak_pages_in_use"],
            self.cfg.n_pages - 1 - self.cache.n_free())
        pend = {"toks": toks, "lives": lives, "active": list(active), "k": k}
        if self.cfg.pipeline_bursts and self.window is None:
            # defer this burst's harvest; land the previous one (its RTT
            # now overlaps the burst just dispatched)
            prev, self._pending = self._pending, pend
            if prev is not None:
                self._harvest_burst(prev)
            return True
        self._harvest_burst(pend)
        return True

    def _burst_prealloc(self, active, k):
        """Pre-allocate every page a ``k``-token-per-slot burst can write
        (shared by the plain and speculative burst paths). Returns
        (ok, any_work, alloc_happened); ok=False (pool short even after
        shedding prefix entries) flushes the pending burst so the caller
        can fall back to the single-step path, which can preempt."""
        ps = self.cfg.page_size
        if self._dev is None:
            # a structural change invalidated the device carries: the next
            # dispatch re-uploads host mirrors, which must include every
            # dispatched token — land the pending burst first
            self._flush_pending()
        pend_active = (set(self._pending["active"])
                       if self._pending is not None else set())
        pend_k = self._pending["k"] if self._pending is not None else 0
        alloc_happened = False
        any_work = False
        for s in active:
            r = self.running[s]
            if r is None:
                continue  # finished during the flush above
            # tokens already dispatched for s but not harvested: the device
            # may be up to `ahead` tokens past the host's length mirror
            ahead = (min(pend_k, r.max_new_tokens - len(r.out))
                     if s in pend_active else 0)
            kk = min(k, r.max_new_tokens - len(r.out) - ahead)
            if kk <= 0:
                continue
            any_work = True
            need = (int(self.cache.lengths[s]) + ahead + kk - 1) // ps + 1
            short = need - len(self.cache.pages_of[s])
            if short > 0:
                while (self.cache.n_free() < short
                       and self._evict_one_prefix()):
                    pass
                if short > self.cache.n_free():
                    self._flush_pending()
                    return False, any_work, alloc_happened
                self.cache.alloc(s, short)
                alloc_happened = True
        return True, any_work, alloc_happened

    def _get_spec_burst_fn(self):
        if self._spec_burst_fn is None:
            body = partial(_spec_burst_scan,
                           ddecode_fn=self._ddecode_raw,
                           window_fn=self._window_raw,
                           gamma=self.cfg.spec_gamma,
                           rounds=self.spec_rounds,
                           page_size=self.cfg.page_size,
                           trash_page=self.cache.trash_page,
                           vocab=self._vocab)
            self._spec_burst_fn = jax.jit(body, donate_argnums=(2, 3))
        return self._spec_burst_fn

    def _step_burst_spec(self, active) -> bool:
        """Speculative decode: ``spec_rounds`` draft-propose/target-verify
        rounds in ONE dispatch. Each round emits 1..gamma+1 tokens per live
        slot, so the worst-case advance is rounds*(gamma+1) — pages are
        pre-allocated for it like a plain burst of that depth (the scan's
        remaining-mask keeps every write inside the emission budget, so no
        overshoot page is ever needed). Harvest/pipelining reuse the plain
        burst machinery: the scan's per-round (W, S) emissions flatten to
        the (k, S) record ``_harvest_burst`` already consumes."""
        W = self.cfg.spec_gamma + 1
        R = self.spec_rounds
        ok, any_work, alloc_happened = self._burst_prealloc(active, R * W)
        if not ok:
            return False
        if not any_work:
            self._flush_pending()
            return True
        S = self.cfg.max_seqs
        d = self._dev
        if d is None:
            remaining = np.zeros((S,), np.int32)
            eos = np.full((S,), -1, np.int32)
            for s in active:
                r = self.running[s]
                if r is None:
                    continue
                remaining[s] = r.max_new_tokens - len(r.out)
                if r.eos_id is not None:
                    eos[s] = r.eos_id
            d = {"tables": jnp.asarray(self.cache.tables),
                 "lengths": jnp.asarray(self.cache.lengths),
                 "tokens": jnp.asarray(self._tokens),
                 "remaining": jnp.asarray(remaining),
                 "eos": jnp.asarray(eos),
                 "seed": jnp.asarray(self._samp["seed"]),
                 "temp": jnp.asarray(self._samp["temp"])}
        elif alloc_happened:
            d["tables"] = jnp.asarray(self.cache.tables)
        (self.cache.state, self.draft_state, toks, lives, tok_f, len_f,
         rem_f) = self._get_spec_burst_fn()(
            self.params, self.draft_params, self.cache.state,
            self.draft_state, d["tables"], d["lengths"], d["tokens"],
            d["remaining"], d["eos"], d["seed"], d["temp"])
        d["tokens"], d["lengths"], d["remaining"] = tok_f, len_f, rem_f
        self._dev = d
        self.stats["spec_bursts"] = self.stats.get("spec_bursts", 0) + 1
        self.stats["decode_steps"] += R * W
        self.stats["peak_pages_in_use"] = max(
            self.stats["peak_pages_in_use"],
            self.cfg.n_pages - 1 - self.cache.n_free())
        pend = {"toks": toks, "lives": lives, "active": list(active),
                "k": R * W, "spec_W": W}
        if self.cfg.pipeline_bursts:
            prev, self._pending = self._pending, pend
            if prev is not None:
                self._harvest_burst(prev)
            return True
        self._harvest_burst(pend)
        return True

    def _flush_pending(self):
        if self._pending is not None:
            pend, self._pending = self._pending, None
            self._harvest_burst(pend)

    def _harvest_burst(self, pend):
        """Apply a burst's (toks, lives) record to host bookkeeping."""
        toks, lives = jax.device_get((pend["toks"], pend["lives"]))
        toks = np.asarray(toks)
        lives = np.asarray(lives)
        k, active = pend["k"], pend["active"]
        if "spec_W" in pend:
            # measured acceptance: a live round always emits >= 1 token
            # (its row-0 emission), so live rounds = sum of row-0 lives and
            # alpha-hat = (tokens/round - 1) / gamma
            W = pend["spec_W"]
            self.stats["spec_live_rounds"] = (
                self.stats.get("spec_live_rounds", 0)
                + int(lives[::W, :].sum()))
            self.stats["spec_tokens"] = (self.stats.get("spec_tokens", 0)
                                         + int(lives.sum()))
        for t in range(k):
            for s in active:
                if not lives[t, s] or self.running[s] is None:
                    continue
                r = self.running[s]
                tok = int(toks[t, s])
                r.out.append(tok)
                self.cache.lengths[s] += 1
                self._tokens[s] = tok
                self.stats["tokens_out"] += 1
                if (len(r.out) >= r.max_new_tokens
                        or (r.eos_id is not None and tok == r.eos_id)):
                    self.stats["requests_done"] += 1
                    prefix = getattr(self, "_requeued_prefix", {}).pop(
                        r.req_id, [])
                    self.finished[r.req_id] = prefix + r.out
                    self.cache.release(s)
                    self.running[s] = None
                    self._dev = None  # request set changed
        if self.window is not None:
            for s in active:
                if self.running[s] is not None:
                    self._free_out_of_window_pages(s)
            self._dev = None  # window recycling rewrites table entries

    def _prefix_keys(self, prompt: np.ndarray) -> List[bytes]:
        """Registry key for every full-page prefix of ``prompt``.

        keys[p-1] covers prompt[:p*ps]. A hash CHAIN (page p's key digests
        page p-1's key + page p's bytes) so hashing a whole admission is
        O(len(prompt)) total — hashing each prefix from scratch would be
        O(pages * len(prompt)), quadratic for long prompts."""
        import hashlib

        ps = self.cfg.page_size
        keys: List[bytes] = []
        h = b""
        for p in range(1, len(prompt) // ps + 1):
            h = hashlib.blake2b(h + prompt[(p - 1) * ps:p * ps].tobytes(),
                                digest_size=16).digest()
            keys.append(h)
        return keys

    def _lookup_prefix(self, prompt: np.ndarray) -> Tuple[int, List[int]]:
        """Longest page-aligned cached prefix usable for ``prompt``.

        Capped at (len-1)//ps pages so at least one suffix token remains to
        prefill (the logits come from the last prompt position). For llama
        the RoPE table must also cover [p*ps, p*ps + suffix bucket)."""
        ps = self.cfg.page_size
        rope_len = (int(np.asarray(self.params["rope_cos"]).shape[0])
                    if self.model == "llama" else None)
        keys = self._prefix_keys(prompt)
        for p in range((len(prompt) - 1) // ps, 0, -1):
            key = keys[p - 1]
            pages = self._prefix_index.get(key)
            if pages is None:
                continue
            if (rope_len is not None
                    and self._max_rope_pos(len(prompt), p) > rope_len):
                continue
            self._prefix_lru.remove(key)
            self._prefix_lru.append(key)
            return p, pages
        return 0, []

    def _max_rope_pos(self, S0: int, p: int) -> int:
        """Largest position a (possibly chunked) prefill starting after
        ``p`` cached pages will rope: the last chunk's offset plus its
        bucket (padding included)."""
        B = max(self.cfg.prefill_buckets)
        off = p * self.cfg.page_size
        while S0 - off > B:
            off += B
        bucket = next(b for b in self.cfg.prefill_buckets if b >= S0 - off)
        return off + bucket

    def _register_prefixes(self, prompt: np.ndarray, slot: int):
        """Index every full-page prefix of a just-prefilled prompt. Full
        pages are never written again (decode writes land past the prompt),
        so entries stay valid for the pages' refcounted lifetime."""
        allp = self.cache.pages_of[slot]
        for p, key in enumerate(self._prefix_keys(prompt), start=1):
            if key in self._prefix_index:
                continue
            pages = list(allp[:p])
            for pg in pages:
                self.cache.page_refs[pg] += 1
            self._prefix_index[key] = pages
            self._prefix_lru.append(key)

    def _registrable_keys(self, prompt: np.ndarray):
        return set(self._prefix_keys(prompt))

    def _admit(self):
        """Admit queued requests, then prefill same-(bucket, n_prefix)
        admissions in ONE batched device call per group.

        With prefix caching on, admission stops at a request whose
        full-page prefix overlaps a PENDING (not yet prefilled) prompt's —
        it stays queued and hits the registered pages next step, exactly
        as it would have under sequential admission."""
        pending = []  # (slot, request, suffix_tokens, n_prefix_pages)
        pending_keys = set()
        while self.queue:
            slot = next((s for s, r in enumerate(self.running) if r is None),
                        None)
            if slot is None:
                break
            r = self.queue[0]
            S0 = len(r.prompt)
            ps = self.cfg.page_size
            n_total = -(-S0 // ps)
            if (self.cfg.prefix_cache
                    and self._registrable_keys(r.prompt) & pending_keys):
                break  # will hit the pending request's pages next step
            p0, cached = (self._lookup_prefix(r.prompt)
                          if self.cfg.prefix_cache else (0, []))
            n_new = n_total - p0
            if n_new > self.cache.n_free():
                while (self.cache.n_free() < n_new
                       and self._evict_one_prefix()):
                    pass
                # eviction may have dropped the matched entry (it is
                # LRU-touched, so it goes last) — re-resolve
                p0, cached = (self._lookup_prefix(r.prompt)
                              if self.cfg.prefix_cache else (0, []))
                n_new = n_total - p0
                if n_new > self.cache.n_free():
                    break  # backpressure: wait for pages
            self.queue.popleft()
            r.slot = slot
            self.running[slot] = r
            self._samp["seed"][slot] = r.seed
            self._samp["temp"][slot] = r.temperature
            self._samp["top_k"][slot] = r.top_k
            self._samp["top_p"][slot] = r.top_p
            if p0:
                self.cache.attach(slot, cached)
                self.stats["prefix_hits"] += 1
                self.stats["prefix_tokens_reused"] += p0 * ps
            self.cache.alloc(slot, n_new)
            # chunked prefill: prompts longer than the largest bucket run
            # as a sequence of suffix prefills, each attending everything
            # written so far through the merged-stats cross pass (chunks
            # depend on each other, so they run immediately, unbatched)
            B = max(self.cfg.prefill_buckets)
            off = p0 * ps
            while S0 - off > B:
                self._run_prefill_group(
                    [(slot, r.prompt[off:off + B], off // ps)], emit=False)
                off += B
            pending.append((slot, r, r.prompt[off:], off // ps))
            if self.cfg.prefix_cache:
                pending_keys |= self._registrable_keys(r.prompt)

        if pending:
            self._dev = None  # admission changed slots/samp/tables/lengths
        # one batched prefill per (bucket, n_prefix) group
        groups: Dict[Tuple[int, int], list] = {}
        for slot, r, suffix, npfx in pending:
            bucket = next(b for b in self.cfg.prefill_buckets
                          if b >= len(suffix))
            groups.setdefault((bucket, npfx), []).append((slot, r, suffix))
        for (bucket, npfx), grp in groups.items():
            firsts = self._run_prefill_group(
                [(slot, suffix, npfx) for slot, _, suffix in grp])
            for (slot, r, suffix), first in zip(grp, firsts):
                self.cache.lengths[slot] = len(r.prompt)
                if self.cfg.prefix_cache:
                    self._register_prefixes(r.prompt, slot)
                r.out.append(first)
                self._tokens[slot] = first
                if (len(r.out) >= r.max_new_tokens
                        or (r.eos_id is not None and first == r.eos_id)):
                    prefix = getattr(self, "_requeued_prefix", {}).pop(
                        r.req_id, [])
                    self.finished[r.req_id] = prefix + r.out
                    self.cache.release(slot)
                    self.running[slot] = None

    def _preempt(self, slot: int):
        r = self.running[slot]
        self.stats["preemptions"] = self.stats.get("preemptions", 0) + 1
        new_prompt = np.concatenate([r.prompt,
                                     np.asarray(r.out, np.int32)])
        req = _Request(r.req_id, new_prompt,
                       r.max_new_tokens - len(r.out), r.eos_id,
                       r.temperature, r.top_k, r.top_p, r.seed)
        req.out = []
        self._requeued_prefix = getattr(self, "_requeued_prefix", {})
        self._requeued_prefix[r.req_id] = (
            self._requeued_prefix.get(r.req_id, []) + r.out)
        self.queue.appendleft(req)
        self.cache.release(slot)
        self.running[slot] = None
        self._dev = None  # request set changed

    def _free_out_of_window_pages(self, slot: int):
        """Windowed decode never reads pages whose every key sits below
        lengths[slot] - window (the kernel's page-skip predicate), so hand
        them back: the slot's table entry becomes the trash page (keeping
        positional indexing intact — write_page indexes pages_of by
        position) and the page returns to the pool once unreferenced.
        Long windowed generation then holds O(window) pages, not O(length).
        """
        ps = self.cfg.page_size
        horizon = int(self.cache.lengths[slot]) - self.window
        pages = self.cache.pages_of[slot]
        trash = self.cache.trash_page
        for j in range((horizon // ps) if horizon > 0 else 0):
            if pages[j] != trash:
                self.cache.decref([pages[j]])
                pages[j] = trash
                self.cache.tables[slot, j] = trash
                self.stats["window_pages_freed"] = self.stats.get(
                    "window_pages_freed", 0) + 1

    def _evict_one_prefix(self) -> bool:
        """Drop the least-recently-used prefix entry; its pages return to
        the pool once no running slot holds them."""
        if not self._prefix_lru:
            return False
        key = self._prefix_lru.pop(0)
        self.cache.decref(self._prefix_index.pop(key))
        self.stats["prefix_evictions"] += 1
        return True

    def _ensure_capacity(self, slot: int):
        """ensure_capacity that sheds prefix-cache entries before giving up
        (a registry-held page is reclaimable memory, a running slot's is
        not — evicting is always cheaper than preempting)."""
        ps = self.cfg.page_size
        needs_page = (self.cache.lengths[slot] // ps + 1
                      > len(self.cache.pages_of[slot]))
        if needs_page:
            while self.cache.n_free() < 1 and self._evict_one_prefix():
                pass
        self.cache.ensure_capacity(slot)

    def _run_prefill_group(self, calls, emit: bool = True):
        """One BATCHED device prefill for K same-(bucket, n_prefix) calls.

        ``calls``: [(slot, suffix_tokens, n_prefix)] — every call's suffix
        fits the same bucket and shares n_prefix (the compiled fn is keyed
        on (bucket, n_prefix, K); n_prefix is static so the merged
        cross-attention has a static key count). Each slot's suffix pages
        come from its own table at positions [n_prefix, ...).
        ``emit=False`` (intermediate chunks of a chunked prefill) skips
        sampling and returns None; otherwise returns the K first tokens,
        sampled in one batched call with per-request parameters."""
        K = len(calls)
        n_prefix = calls[0][2]
        ps = self.cfg.page_size
        longest = max(len(suffix) for _, suffix, _ in calls)
        bucket = next((b for b in self.cfg.prefill_buckets if b >= longest),
                      None)
        if bucket is None:
            raise ValueError(f"prompt length {longest} exceeds the largest "
                             f"prefill bucket {self.cfg.prefill_buckets[-1]}")
        if self.model == "llama":
            rope_len = int(np.asarray(self.params["rope_cos"]).shape[0])
            if n_prefix * ps + bucket > rope_len:
                raise ValueError(
                    f"prefill positions reach {n_prefix * ps + bucket} but "
                    f"the rope table covers {rope_len}; re-init the model "
                    f"with a larger max_len")
        key = (bucket, n_prefix, K)
        if key not in self._prefills:
            if self.mesh is None:
                self._prefills[key] = jax.jit(
                    partial(self._prefill_fn, n_heads=self.n_heads,
                            page_size=ps, bucket=bucket,
                            n_prefix=n_prefix, window=self.window),
                    static_argnames=(), donate_argnums=(1,))
            else:
                from jax.sharding import PartitionSpec as P

                pspecs, kv_specs = self._tp_specs
                tp = self.mesh.shape["tp"]
                rep = P()
                self._prefills[key] = jax.jit(jax.shard_map(
                    partial(_llama_prefill_paged,
                            n_heads=self.n_heads // tp,
                            page_size=ps, bucket=bucket,
                            n_prefix=n_prefix, window=self.window,
                            tp_axis="tp"),
                    mesh=self.mesh,
                    in_specs=(pspecs, kv_specs, rep, rep, rep, rep),
                    out_specs=(rep, kv_specs), check_vma=False),
                    donate_argnums=(1,))
        n_pg = bucket // ps
        pad = np.zeros((K, bucket), np.int32)
        lens = np.zeros((K,), np.int32)
        page_vecs = np.full((K, n_pg), self.cache.trash_page, np.int32)
        prefix_vecs = np.full((K, max(n_prefix, 1)), self.cache.trash_page,
                              np.int32)
        for i, (slot, suffix, _) in enumerate(calls):
            pad[i, :len(suffix)] = suffix
            lens[i] = len(suffix)
            pages = self.cache.pages_of[slot][
                n_prefix:n_prefix + -(-len(suffix) // ps)]
            page_vecs[i, :len(pages)] = pages
            if n_prefix:
                prefix_vecs[i] = self.cache.pages_of[slot][:n_prefix]
        logits, self.cache.state = self._prefills[key](
            self.params, self.cache.state, jnp.asarray(pad),
            jnp.asarray(lens), jnp.asarray(page_vecs),
            jnp.asarray(prefix_vecs))
        if self.spec:
            # the draft prefills the SAME pages of its own pools (its
            # logits are discarded); prefix-cached pages therefore carry
            # draft KV too, so sharing covers both models
            if key not in self._dprefills:
                self._dprefills[key] = jax.jit(
                    partial(self._prefill_fn, n_heads=self.draft_n_heads,
                            page_size=ps, bucket=bucket,
                            n_prefix=n_prefix, window=None),
                    donate_argnums=(1,))
            _, self.draft_state = self._dprefills[key](
                self.draft_params, self.draft_state, jnp.asarray(pad),
                jnp.asarray(lens), jnp.asarray(page_vecs),
                jnp.asarray(prefix_vecs))
        self.stats["prefills"] += 1
        if not emit:
            return None
        self.stats["tokens_out"] += K
        reqs = [self.running[slot] for slot, _, _ in calls]
        toks = self._sampler(
            jnp.asarray([r.seed for r in reqs], jnp.int32),
            jnp.asarray([len(r.prompt) for r in reqs], jnp.int32), logits,
            jnp.asarray([r.temperature for r in reqs], jnp.float32),
            jnp.asarray([r.top_k for r in reqs], jnp.int32),
            jnp.asarray([r.top_p for r in reqs], jnp.float32))
        return [int(t) for t in np.asarray(toks)]


# ---------------------------------------------------------------------------
# Weight-only int8 quantization (per-output-column symmetric scales)
# ---------------------------------------------------------------------------

_QUANT_KEYS = {"transformer": ("wqkv", "wo", "w1", "w2"),
               "llama": ("wq", "wkv", "wo", "w_gate", "w_up", "w_down")}


def _quantize_weight(w):
    a = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    s = jnp.where(a > 0, a / 127.0, 1.0)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / s[None, :]),
                 -127, 127).astype(jnp.int8)
    return {"q": q, "s": s.astype(jnp.float32)}


def quantize_block_weights(params: Dict, model: str, mode: str = "int8",
                           group: int = 64) -> Dict:
    """Quantize every block linear; layer norms, biases, embeddings and the
    unembedding stay full precision. mode "int8" = per-output-column scales
    ({"q","s"} dicts); "int4" = group-wise packed nibbles ({"q4","s4"}
    dicts, ops/gemm/int4_kernel.py)."""
    if mode == "int4":
        from ..ops.gemm.int4_kernel import quantize_int4

        qfn = lambda w: quantize_int4(w, group=group)  # noqa: E731
    else:
        qfn = _quantize_weight
    out = dict(params)
    out["blocks"] = [
        {k: (qfn(v) if k in _QUANT_KEYS[model] else v)
         for k, v in blk.items()}
        for blk in params["blocks"]]
    return out


_Q_ACTS = {None: lambda x: x, "gelu": jax.nn.gelu}


def _w_out_dim(w) -> int:
    """Output width of a weight that may be quantized (dict) or plain."""
    if isinstance(w, dict):
        return w["q4"].shape[1] if "q4" in w else w["q"].shape[1]
    return w.shape[1]


def _linear_q(h, w, b=None, act=None):
    """linear() that also accepts a quantized weight dict. int8 ({"q","s"}):
    the weight streams from HBM (the decode bound) and dequantizes via one
    per-column scale multiply after the dot. int4 ({"q4","s4"}): the packed
    nibbles stream at half the bytes and unpack on the VPU inside the
    Pallas matmul (ops/gemm/int4_kernel.py)."""
    if isinstance(w, dict) and "q4" in w:
        from ..ops.gemm.int4_kernel import gemm_w4

        y = gemm_w4(h, w)
        if b is not None:
            y = y + b
        return _Q_ACTS[act](y)
    if isinstance(w, dict):
        y = jnp.dot(h, w["q"].astype(h.dtype),
                    precision=jax.lax.Precision.HIGHEST
                    if h.dtype == jnp.float32 else None)
        y = y * w["s"].astype(h.dtype)[None, :]
        if b is not None:
            y = y + b
        return _Q_ACTS[act](y)
    return linear(h, w, b, act)


# ---------------------------------------------------------------------------
# Tensor-parallel serving (llama family): megatron-split weights over a
# "tp" mesh axis, KV pools sharded on the kv-head axis, two psums per block.
# ---------------------------------------------------------------------------

def _llama_tp_specs(params, kv_state):
    """(param_specs, kv_specs) PartitionSpec pytrees for the llama schema.

    int8-quantized weights are {"q", "s"} dicts: the per-output-column
    scales shard WITH the output columns — column-parallel weights carry
    P("tp") scales, row-parallel (contraction-sharded) weights keep full
    outputs so their scales replicate. int4 {"q4", "s4"} dicts shard the
    same way: q4's packed rows are contraction/2 so they follow the weight's
    row spec; s4 (groups, out) follows (row, column) like the weight."""
    from jax.sharding import PartitionSpec as P

    col, rowp, rep = P(None, "tp"), P("tp", None), P()

    def wspec(w, spec, s_spec):
        if isinstance(w, dict) and "q4" in w:
            # s4 is (K/group, N): split its rows iff the weight's rows split
            return {"q4": spec, "s4": spec}
        return {"q": spec, "s": s_spec} if isinstance(w, dict) else spec

    blocks = [
        {"wq": wspec(b["wq"], col, P("tp")),
         "wkv": wspec(b["wkv"], col, P("tp")),
         "wo": wspec(b["wo"], rowp, rep),
         "w_gate": wspec(b["w_gate"], col, P("tp")),
         "w_up": wspec(b["w_up"], col, P("tp")),
         "w_down": wspec(b["w_down"], rowp, rep),
         "rms1": rep, "rms2": rep}
        for b in params["blocks"]]
    pspecs = {"embed": rep, "unembed": rep, "blocks": blocks,
              "rms_f": rep, "rope_cos": rep, "rope_sin": rep}
    kv_specs = {"pools": P(None, None, None, "tp", None, None)}
    if "scales" in kv_state:
        kv_specs["scales"] = P(None, None, None, "tp", None)
    return pspecs, kv_specs


def _shard_llama_params(params, mesh, n_heads: int):
    """Lay the llama weights out for tp sharding.

    wkv packs columns as (2, Hkv, hd) — a contiguous tp slice of that would
    mix K of one head with V of another, so reorder to (tp, 2, Hkv/tp, hd)
    first; every other weight's natural head-contiguous layout already
    shards correctly. Then device_put everything per _llama_tp_specs."""
    from jax.sharding import NamedSharding

    tp = mesh.shape["tp"]
    D = params["embed"].shape[1]
    hd = D // n_heads
    out = dict(params)
    blocks = []
    for blk in params["blocks"]:
        b = dict(blk)
        w = blk["wkv"]
        if isinstance(w, dict) and "q4" in w:  # int4: reorder columns of
            # the packed bytes (rows stay D/2-packed) and of every scale row
            Hkv = w["q4"].shape[1] // (2 * hd)
            G = w["s4"].shape[0]
            b["wkv"] = {
                "q4": (w["q4"].reshape(D // 2, 2, tp, Hkv // tp, hd)
                       .transpose(0, 2, 1, 3, 4).reshape(w["q4"].shape)),
                "s4": (w["s4"].reshape(G, 2, tp, Hkv // tp, hd)
                       .transpose(0, 2, 1, 3, 4).reshape(w["s4"].shape)),
            }
        elif isinstance(w, dict):  # int8: reorder columns of q AND s
            Hkv = w["q"].shape[1] // (2 * hd)
            b["wkv"] = {
                "q": (w["q"].reshape(D, 2, tp, Hkv // tp, hd)
                      .transpose(0, 2, 1, 3, 4).reshape(w["q"].shape)),
                "s": (w["s"].reshape(2, tp, Hkv // tp, hd)
                      .transpose(1, 0, 2, 3).reshape(w["s"].shape)),
            }
        else:
            Hkv = w.shape[1] // (2 * hd)
            b["wkv"] = (w.reshape(D, 2, tp, Hkv // tp, hd)
                        .transpose(0, 2, 1, 3, 4).reshape(w.shape))
        blocks.append(b)
    out["blocks"] = blocks
    pspecs, _ = _llama_tp_specs(params, {})
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), out, pspecs)


# ---------------------------------------------------------------------------
# Device steps
# ---------------------------------------------------------------------------

def _decode_burst_scan(params, kv, tables, lengths, tokens, remaining, eos,
                       seeds, temps, top_ks, top_ps, *, decode_fn, k: int,
                       page_size: int, trash_page: int):
    """Run ``k`` decode+sample steps in ONE dispatch (lax.scan).

    The host's per-token work — picking the write page, sampling, the stop
    checks — moves inside the loop so decode throughput is bound by the
    device step, not the host round trip. Per-slot liveness:
    ``remaining`` (tokens this slot may still emit; 0 = done) counts down
    and zeroes on eos, exactly mirroring the host's stop conditions, so a
    slot that finishes mid-burst stops writing KV (its write page becomes
    the trash page) and its later emissions are marked dead in ``lives``.

    Returns (kv, toks (k, S) int32, lives (k, S) bool). Token-identical to
    k dispatches of ``decode_fn`` + ``sample_logits_batch``: each live step
    samples at position == pre-increment length, the same fold-in schedule.
    """
    from ..ops.sampling import sample_logits_batch

    rows = jnp.arange(tokens.shape[0])

    def body(carry, _):
        kv, tokens, lengths, remaining = carry
        live = (lengths > 0) & (remaining > 0)
        l_arg = jnp.where(live, lengths, 0)
        wp = jnp.where(live, tables[rows, l_arg // page_size], trash_page)
        logits, kv = decode_fn(params, kv, tables, l_arg, wp, tokens)
        # the emitted token's absolute index: lengths counts prompt + KV of
        # already-written generated tokens (= len(out) - 1 of them), so the
        # token emitted now sits at lengths + 1 — the same
        # len(prompt) + len(out) the single-step host path folds into the key
        nxt = sample_logits_batch(seeds, lengths + 1, logits, temps,
                                  top_ks, top_ps)
        nxt = jnp.where(live, nxt, tokens)
        remaining = jnp.where(live, remaining - 1, remaining)
        remaining = jnp.where(live & (nxt == eos), 0, remaining)
        lengths = jnp.where(live, lengths + 1, lengths)
        return (kv, nxt, lengths, remaining), (nxt, live)

    (kv, tokens, lengths, remaining), (toks, lives) = jax.lax.scan(
        body, (kv, tokens, lengths, remaining), None, length=k)
    # the final carries come back so the host can keep them DEVICE-RESIDENT
    # for the next burst: in steady state (no admission/finish/preemption)
    # nothing is uploaded between bursts — see ServingEngine._step_burst
    return kv, toks, lives, tokens, lengths, remaining

def _spec_burst_scan(params, dparams, kv, dkv, tables, lengths, tokens,
                     remaining, eos, seeds, temps, *, ddecode_fn, window_fn,
                     gamma: int, rounds: int, page_size: int,
                     trash_page: int, vocab: int):
    """``rounds`` speculative propose/verify rounds in ONE dispatch.

    Per round and live slot: the draft runs ``gamma`` cached decode steps
    proposing tokens at positions l+1..l+gamma (plus one KV-completing
    step for the last proposal), the target scores the whole (gamma+1)
    window in one ``window_fn`` forward over the paged cache, and the
    acceptance rule emits 1..gamma+1 tokens — greedy slots keep the
    longest argmax-matching prefix (token-identical to plain greedy
    decode), sampled slots the rejection scheme
    (ops/sampling.py:speculative_accept; marginally EXACT for plain
    temperature sampling).

    Rollback is free on a paged cache (models/speculative.py's invariant):
    rejected positions' K/V rows — in BOTH pools — are overwritten the
    next time those positions are refilled, so the per-slot length is the
    only rollback state. Writes are REMAINING-MASKED: position l+i goes
    to its table page only while i < remaining (emittable), else to the
    trash page — queries at emitted indices never attend an unwritten
    row, and the burst never needs a page past the emission budget, so
    the plain burst's page-preallocation formula carries over unchanged.

    Returns (kv, dkv, toks (rounds*(gamma+1), S), lives (same), and the
    final token/length/remaining carries for device residency) — the toks/
    lives record is exactly what ``_harvest_burst`` consumes.
    """
    from ..ops.sampling import speculative_accept

    S = tokens.shape[0]
    W = gamma + 1
    rows = jnp.arange(S)
    inv_t = jnp.where(temps > 0, 1.0 / jnp.maximum(temps, 1e-8), 1.0)

    def round_body(carry, _):
        kv, dkv, tokens, lengths, remaining = carry
        live = (lengths > 0) & (remaining > 0)
        l_arg = jnp.where(live, lengths, 0)

        def page_at(i):
            return jnp.where(live & (i < remaining),
                             tables[rows, (l_arg + i) // page_size],
                             trash_page)

        # -- draft: gamma cached proposal steps --------------------------
        def dstep(i, c):
            dkv, tok, wtok, qbuf = c
            pos = l_arg + i
            dlog, dkv = ddecode_fn(dparams, dkv, tables,
                                   jnp.where(live, pos, 0), page_at(i),
                                   tok)
            lg32 = dlog.astype(jnp.float32) * inv_t[:, None]
            keys = jax.vmap(lambda sd, p: jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(sd), p), 7))(
                seeds, pos + 1)
            samp = jax.vmap(jax.random.categorical)(keys, lg32)
            nxt = jnp.where(temps > 0, samp.astype(jnp.int32),
                            jnp.argmax(dlog, -1).astype(jnp.int32))
            qbuf = jax.lax.dynamic_update_index_in_dim(
                qbuf, jax.nn.softmax(lg32, -1), i, 1)
            wtok = jax.lax.dynamic_update_index_in_dim(wtok, nxt, i + 1, 1)
            return dkv, nxt, wtok, qbuf

        wtok0 = jnp.zeros((S, W), jnp.int32).at[:, 0].set(tokens)
        qbuf0 = jnp.zeros((S, gamma, vocab), jnp.float32)
        dkv, lastp, wtok, qbuf = jax.lax.fori_loop(
            0, gamma, dstep, (dkv, tokens, wtok0, qbuf0))
        # one more draft step writes the LAST proposal's K/V, so after a
        # full accept the draft's history is complete up to the new length
        _, dkv = ddecode_fn(dparams, dkv, tables,
                            jnp.where(live, l_arg + gamma, 0),
                            page_at(gamma), lastp)

        # -- target: one W-query verify forward --------------------------
        wp = jnp.stack([page_at(i) for i in range(W)], 1)       # (S, W)
        wrow = jnp.stack([(l_arg + i) % page_size
                          for i in range(W)], 1)                # (S, W)
        tlog, kv = window_fn(params, kv, tables, l_arg, live, wp, wrow,
                             wtok)                              # (S, W, V)

        # -- acceptance ---------------------------------------------------
        prop = wtok[:, 1:]                                      # (S, gamma)
        gre = jnp.argmax(tlog, -1).astype(jnp.int32)            # (S, W)
        match = prop == gre[:, :gamma]
        n_acc_g = jnp.argmin(jnp.concatenate(
            [match, jnp.zeros((S, 1), bool)], 1), 1).astype(jnp.int32)
        p = jax.nn.softmax(tlog.astype(jnp.float32)
                           * inv_t[:, None, None], -1)
        akeys = jax.vmap(lambda sd, p0: jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(sd), p0), 11))(
            seeds, l_arg)
        n_acc_s, nxt_s = jax.vmap(speculative_accept)(akeys, p, qbuf, prop)
        samp_on = temps > 0
        n_acc = jnp.where(samp_on, n_acc_s, n_acc_g)
        nxt = jnp.where(samp_on, nxt_s, gre[rows, n_acc_g])

        # -- emission: accepted prefix + bonus, truncated by eos/budget ---
        idx = jnp.arange(W)[None, :]
        emit = jnp.where(idx == n_acc[:, None], nxt[:, None],
                         jnp.concatenate(
                             [prop, jnp.zeros((S, 1), jnp.int32)], 1))
        n_em = n_acc + 1
        is_eos = (emit == eos[:, None]) & (idx < n_em[:, None])
        first_eos = jnp.min(jnp.where(is_eos, idx, W), 1)
        n_em = jnp.minimum(n_em, first_eos + 1)
        n_em = jnp.minimum(n_em, remaining)
        n_em = jnp.where(live, n_em, 0)
        mask = idx < n_em[:, None]
        eos_hit = jnp.any(is_eos & mask, 1)
        lengths = lengths + n_em
        remaining = jnp.where(live, remaining - n_em, remaining)
        remaining = jnp.where(eos_hit, 0, remaining)
        last = emit[rows, jnp.maximum(n_em - 1, 0)]
        tokens = jnp.where(n_em > 0, last, tokens)
        return (kv, dkv, tokens, lengths, remaining), (emit, mask)

    (kv, dkv, tokens, lengths, remaining), (emits, masks) = jax.lax.scan(
        round_body, (kv, dkv, tokens, lengths, remaining), None,
        length=rounds)
    # (rounds, S, W) -> time-major (rounds*W, S): the _harvest_burst record
    toks = emits.transpose(0, 2, 1).reshape(rounds * W, S)
    lives = masks.transpose(0, 2, 1).reshape(rounds * W, S)
    return kv, dkv, toks, lives, tokens, lengths, remaining


def _kv_window_attend(kv, li, q, tables, att_len):
    """W-query paged attention over layer ``li``'s pools (verify kernel)."""
    from ..ops.paged_attention import paged_window_attention

    if "scales" in kv:
        return paged_window_attention(
            q, kv["pools"][li, 0], kv["pools"][li, 1], tables, att_len,
            k_scale=kv["scales"][li, 0], v_scale=kv["scales"][li, 1])
    return paged_window_attention(q, kv["pools"][li, 0], kv["pools"][li, 1],
                                  tables, att_len)


def _window_step(params, kv, tables, base, live, wp, wrow, wtok, *,
                 n_heads: int, page_size: int):
    """Speculative verify step, transformer family: score W window tokens
    per slot in one forward. wtok (S, W) holds the tokens at positions
    base..base+W-1; their K/V rows scatter to (wp, wrow) per position (the
    trash page beyond the emission budget), then ONE W-query paged
    attention per layer scores all W positions. Returns
    ((S, W, vocab) logits, kv). Logits at window index w predict position
    base+w+1 — the same contract as ``models/transformer.py``'s dense
    ``window_step`` (W=1 is the decode step)."""
    S, W = wtok.shape
    D = params["embed"].shape[1]
    H = n_heads
    hd = D // H
    att_len = jnp.where(live, base + W, 0)
    x = params["embed"][wtok]                                   # (S, W, D)

    for li, blk in enumerate(params["blocks"]):
        h = layer_norm(x, blk["ln1_g"], blk["ln1_b"])
        qkv = _linear_q(h.reshape(S * W, D), blk["wqkv"], blk["bqkv"])
        qkv = qkv.reshape(S, W, 3, H, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]      # (S,W,H,hd)
        for i in range(W):
            kv = _kv_write_token(kv, li, wp[:, i], wrow[:, i],
                                 k[:, i], v[:, i])
        o = _kv_window_attend(kv, li, q, tables, att_len)       # (S,W,H,hd)
        x = x + _linear_q(o.reshape(S * W, D), blk["wo"],
                          blk["bo"]).reshape(S, W, D)

        h = layer_norm(x, blk["ln2_g"], blk["ln2_b"])
        f = _linear_q(h.reshape(S * W, D), blk["w1"], blk["b1"], "gelu")
        x = x + _linear_q(f, blk["w2"], blk["b2"]).reshape(S, W, D)

    x = layer_norm(x, params["lnf_g"], params["lnf_b"])
    logits = gemm_ad(x.reshape(S * W, D), params["embed"], None, False,
                     True)
    return logits.reshape(S, W, -1), kv


def _llama_window_step(params, kv, tables, base, live, wp, wrow, wtok, *,
                       n_heads: int, page_size: int):
    """Speculative verify step, llama family (RoPE + GQA + SwiGLU): the
    paged analog of ``models/llama.py:llama_window_step``. See
    ``_window_step`` for the (wp, wrow, wtok) contract."""
    from ..ops.norm import rms_norm
    from ..ops.rope import apply_rope_at

    S, W = wtok.shape
    D = params["embed"].shape[1]
    H = n_heads
    hd = _w_out_dim(params["blocks"][0]["wq"]) // H
    Hkv = _w_out_dim(params["blocks"][0]["wkv"]) // (2 * hd)
    att_len = jnp.where(live, base + W, 0)
    cos, sin = params["rope_cos"], params["rope_sin"]
    posf = jnp.minimum(base[:, None] + jnp.arange(W)[None, :],
                       cos.shape[0] - 1).reshape(-1)            # (S*W,)
    x = params["embed"][wtok]                                   # (S, W, D)

    for li, blk in enumerate(params["blocks"]):
        h = rms_norm(x, blk["rms1"]).reshape(S * W, D)
        q = _linear_q(h, blk["wq"]).reshape(S * W, H, hd)
        kvp = _linear_q(h, blk["wkv"]).reshape(S * W, 2, Hkv, hd)
        k, v = kvp[:, 0], kvp[:, 1]
        q = apply_rope_at(q, cos, sin, posf).reshape(S, W, H, hd)
        k = apply_rope_at(k, cos, sin, posf).reshape(S, W, Hkv, hd)
        v = v.reshape(S, W, Hkv, hd)
        for i in range(W):
            kv = _kv_write_token(kv, li, wp[:, i], wrow[:, i],
                                 k[:, i], v[:, i])
        o = _kv_window_attend(kv, li, q, tables, att_len)       # (S,W,H,hd)
        x = x + _linear_q(o.reshape(S * W, H * hd),
                          blk["wo"]).reshape(S, W, D)

        h = rms_norm(x, blk["rms2"]).reshape(S * W, D)
        f = jax.nn.silu(_linear_q(h, blk["w_gate"])) * _linear_q(
            h, blk["w_up"])
        x = x + _linear_q(f, blk["w_down"]).reshape(S, W, D)

    x = rms_norm(x, params["rms_f"])
    logits = gemm_ad(x.reshape(S * W, D), params["unembed"], None, False,
                     False)
    return logits.reshape(S, W, -1), kv


def _kv_write_token(kv, li, write_page, row, k, v):
    """Scatter one new K/V row per slot into the pools (quantizing when the
    cache is int8): kv["pools"][li, 0][write_page[s], :, row[s], :] = k[s]."""
    from ..ops.paged_attention import quantize_kv

    pools = kv["pools"]
    if "scales" in kv:
        kq, ks = quantize_kv(k)
        vq, vs = quantize_kv(v)
        pools = pools.at[li, 0, write_page, :, row, :].set(kq)
        pools = pools.at[li, 1, write_page, :, row, :].set(vq)
        scales = kv["scales"]
        scales = scales.at[li, 0, write_page, :, row].set(ks)
        scales = scales.at[li, 1, write_page, :, row].set(vs)
        return {"pools": pools, "scales": scales}
    pools = pools.at[li, 0, write_page, :, row, :].set(k)
    pools = pools.at[li, 1, write_page, :, row, :].set(v)
    return {"pools": pools}


def _kv_write_pages(kv, li, page_vec, kp, vp):
    """Prefill scatter of whole pages: kp/vp (n_pg, Hkv, ps, hd)."""
    from ..ops.paged_attention import quantize_kv

    pools = kv["pools"]
    if "scales" in kv:
        kq, ks = quantize_kv(kp)
        vq, vs = quantize_kv(vp)
        pools = pools.at[li, 0, page_vec].set(kq)
        pools = pools.at[li, 1, page_vec].set(vq)
        scales = kv["scales"]
        scales = scales.at[li, 0, page_vec].set(ks)
        scales = scales.at[li, 1, page_vec].set(vs)
        return {"pools": pools, "scales": scales}
    pools = pools.at[li, 0, page_vec].set(kp)
    pools = pools.at[li, 1, page_vec].set(vp)
    return {"pools": pools}


def _gather_prefix_kv(kv, li, prefix_vecs, dtype):
    """Dense (K, Hkv, L0, hd) K/V of each request's cached prefix pages
    (dequantized when the cache is int8). A one-time gather per prefill
    layer — the suffix cross-attends these keys with full visibility."""
    kp = kv["pools"][li, 0, prefix_vecs]  # (K, p, Hkv, ps, hd)
    vp = kv["pools"][li, 1, prefix_vecs]
    if "scales" in kv:
        kp = kp.astype(jnp.float32) * kv["scales"][li, 0,
                                                   prefix_vecs][..., None]
        vp = vp.astype(jnp.float32) * kv["scales"][li, 1,
                                                   prefix_vecs][..., None]
    K, p, Hkv, ps, hd = kp.shape

    def dense(t):
        return (t.transpose(0, 2, 1, 3, 4).reshape(K, Hkv, p * ps, hd)
                .astype(dtype))

    return dense(kp), dense(vp)


def _attend_with_prefix(kv, li, qh, kh, vh, prefix_vec, groups,
                        window=None, q_pos0=0):
    """Prefix-cached prefill attention: suffix queries see the cached
    prefix (full visibility, it is entirely in their past) and themselves
    (causal); the two flash passes merge exactly via the log-sum-exp
    stats combination (ring_attention._merge). qh (1, H, S, hd);
    kh/vh (1, Hkv, S, hd); groups = H // Hkv (GQA repeat).

    ``window``: sliding-window masking in GLOBAL coordinates — the cross
    pass runs the offset-causal kernel at q_offset=q_pos0 (prefix keys sit
    at positions [0, n_prefix*ps), all causally visible, so causal+window
    there is exactly the windowed cross); the self pass windows locally
    (offsets cancel within the chunk)."""
    from ..ops.attention import attention_with_stats
    from ..parallel.ring_attention import _merge

    kd, vd = _gather_prefix_kv(kv, li, prefix_vec, qh.dtype)
    if groups > 1:
        kd = jnp.repeat(kd, groups, axis=1)
        vd = jnp.repeat(vd, groups, axis=1)
        kh = jnp.repeat(kh, groups, axis=1)
        vh = jnp.repeat(vh, groups, axis=1)
    if window is None:
        o1, m1, l1 = attention_with_stats(qh, kd, vd, causal=False)
        o2, m2, l2 = attention_with_stats(qh, kh, vh, causal=True)
    else:
        o1, m1, l1 = attention_with_stats(
            qh, kd, vd, causal=True, window=window,
            q_offset=jnp.int32(q_pos0), k_offset=jnp.int32(0))
        o2, m2, l2 = attention_with_stats(qh, kh, vh, causal=True,
                                          window=window)
    o, _, _ = _merge(o1, m1.astype(jnp.float32), l1.astype(jnp.float32),
                     o2, m2.astype(jnp.float32), l2.astype(jnp.float32))
    return o


def _kv_attend(kv, li, q, tables, att_len, window=None):
    if "scales" in kv:
        return paged_attention(q, kv["pools"][li, 0], kv["pools"][li, 1],
                               tables, att_len, window=window,
                               k_scale=kv["scales"][li, 0],
                               v_scale=kv["scales"][li, 1])
    return paged_attention(q, kv["pools"][li, 0], kv["pools"][li, 1],
                           tables, att_len, window=window)


def _decode_step(params, kv, tables, lengths, write_page, tokens, *,
                 n_heads: int, page_size: int, window=None):
    """One batched decode step for all slots.

    tokens (S,) int32 — last emitted token per slot. Writes each slot's new
    K/V at row lengths[s] % ps of write_page[s] (the trash page for inactive
    slots), then attends over lengths+1 keys. Returns (logits, kv)."""
    S = tokens.shape[0]
    D = params["embed"].shape[1]
    H = n_heads
    hd = D // H
    active = lengths > 0
    # inactive slots attend over 0 keys; active slots see their history
    # plus the key written this step
    att_len = jnp.where(active, lengths + 1, 0)
    row = lengths % page_size
    x = params["embed"][tokens][:, None, :]  # (S, 1, D)

    for li, blk in enumerate(params["blocks"]):
        h = layer_norm(x, blk["ln1_g"], blk["ln1_b"])
        qkv = _linear_q(h.reshape(S, D), blk["wqkv"], blk["bqkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(S, H, hd)
        k = k.reshape(S, H, hd)
        v = v.reshape(S, H, hd)
        kv = _kv_write_token(kv, li, write_page, row, k, v)
        o = _kv_attend(kv, li, q, tables, att_len, window)
        o = o.reshape(S, D)
        x = x + _linear_q(o, blk["wo"], blk["bo"]).reshape(S, 1, D)

        h = layer_norm(x, blk["ln2_g"], blk["ln2_b"])
        f = _linear_q(h.reshape(S, D), blk["w1"], blk["b1"], "gelu")
        x = x + _linear_q(f, blk["w2"], blk["b2"]).reshape(S, 1, D)

    x = layer_norm(x, params["lnf_g"], params["lnf_b"])
    logits = gemm_ad(x.reshape(S, D), params["embed"], None, False, True)
    return logits, kv


def _prefill_paged(params, kv, prompts, lengths, page_vecs, prefix_vecs, *,
                   n_heads: int, page_size: int, bucket: int,
                   n_prefix: int = 0, window=None):
    """BATCHED flash prefill that scatters K/V into pages: K same-bucket
    requests run in one device call (one dispatch, one big MXU batch).

    prompts (K, bucket) int32 zero-padded; lengths (K,) true suffix
    lengths; page_vecs (K, bucket/ps) page ids (trash for unused). Padded
    positions produce garbage K/V rows inside the last real page, but
    causality keeps them invisible to the consumed position (length-1) and
    the first decode step overwrites row ``length`` before it is ever
    attended. Returns ((K, vocab) logits at each request's last position,
    pools).

    Prefix caching (n_prefix > 0): each row of ``prompts`` is the SUFFIX
    after ``n_prefix`` cached pages (ids in ``prefix_vecs`` (K, n_prefix));
    suffix queries cross-attend the cached keys via the stats-merged flash
    pass."""
    from ..ops.attention import attention

    D = params["embed"].shape[1]
    H = n_heads
    hd = D // H
    K = prompts.shape[0]
    n_pg = bucket // page_size
    x = params["embed"][prompts]  # (K, bucket, D)

    for li, blk in enumerate(params["blocks"]):
        h = layer_norm(x, blk["ln1_g"], blk["ln1_b"])
        qkv = _linear_q(h.reshape(K * bucket, D), blk["wqkv"], blk["bqkv"])
        # row layout [q(D) | k(D) | v(D)], each D = H*hd
        qkv = qkv.reshape(K, bucket, 3, H, hd).transpose(2, 0, 3, 1, 4)
        qh, kh, vh = qkv[0], qkv[1], qkv[2]  # (K, H, bucket, hd)

        # scatter pages: (K, H, bucket, hd) -> (K*n_pg, H, ps, hd)
        def pages_of(t):
            return (t.reshape(K, H, n_pg, page_size, hd)
                    .transpose(0, 2, 1, 3, 4)
                    .reshape(K * n_pg, H, page_size, hd))
        kv = _kv_write_pages(kv, li, page_vecs.reshape(-1),
                             pages_of(kh), pages_of(vh))
        if n_prefix:
            o = _attend_with_prefix(kv, li, qh, kh, vh, prefix_vecs, 1,
                                    window=window,
                                    q_pos0=n_prefix * page_size)
        else:
            o = attention(qh, kh, vh, causal=True, window=window)
        o = o.transpose(0, 2, 1, 3)  # (K, bucket, H, hd)
        x = x + _linear_q(o.reshape(K * bucket, D), blk["wo"],
                          blk["bo"]).reshape(K, bucket, D)

        h = layer_norm(x, blk["ln2_g"], blk["ln2_b"])
        f = _linear_q(h.reshape(K * bucket, D), blk["w1"], blk["b1"], "gelu")
        x = x + _linear_q(f, blk["w2"], blk["b2"]).reshape(K, bucket, D)

    last = jnp.take_along_axis(
        x, jnp.clip(lengths - 1, 0, bucket - 1)[:, None, None], axis=1)[:, 0]
    last = layer_norm(last, params["lnf_g"], params["lnf_b"])
    logits = gemm_ad(last, params["embed"], None, False, True)
    return logits, kv


# ---------------------------------------------------------------------------
# Llama-family device steps (models/llama.py schema: RoPE + GQA + SwiGLU)
# ---------------------------------------------------------------------------

def _llama_decode_step(params, kv, tables, lengths, write_page, tokens, *,
                       n_heads: int, page_size: int, window=None,
                       tp_axis=None):
    """``tp_axis``: when set, this runs INSIDE shard_map with megatron-split
    weights — n_heads is the LOCAL head count, wq/wkv/w_gate/w_up arrive
    column-sharded, wo/w_down row-sharded, KV pools sharded on Hkv — and
    the two row-parallel projections psum over the axis."""
    from ..ops.norm import rms_norm
    from ..ops.rope import apply_rope_at

    S = tokens.shape[0]
    D = params["embed"].shape[1]
    H = n_heads
    hd = _w_out_dim(params["blocks"][0]["wq"]) // H  # local-shard safe
    Hkv = _w_out_dim(params["blocks"][0]["wkv"]) // (2 * hd)
    active = lengths > 0
    att_len = jnp.where(active, lengths + 1, 0)
    row = lengths % page_size
    cos, sin = params["rope_cos"], params["rope_sin"]
    # each slot rotates at ITS position (= its current length)
    pos = jnp.minimum(lengths, cos.shape[0] - 1)
    x = params["embed"][tokens][:, None, :]  # (S, 1, D)

    for li, blk in enumerate(params["blocks"]):
        h = rms_norm(x, blk["rms1"]).reshape(S, D)
        q = _linear_q(h, blk["wq"]).reshape(S, H, hd)
        kvp = _linear_q(h, blk["wkv"]).reshape(S, 2, Hkv, hd)
        k, v = kvp[:, 0], kvp[:, 1]
        q = apply_rope_at(q, cos, sin, pos)
        k = apply_rope_at(k, cos, sin, pos)
        kv = _kv_write_token(kv, li, write_page, row, k, v)
        o = _kv_attend(kv, li, q, tables, att_len, window)
        xo = _linear_q(o.reshape(S, H * hd), blk["wo"])
        if tp_axis:
            xo = jax.lax.psum(xo, tp_axis)
        x = x + xo.reshape(S, 1, D)

        h = rms_norm(x, blk["rms2"]).reshape(S, D)
        f = jax.nn.silu(_linear_q(h, blk["w_gate"])) * _linear_q(
            h, blk["w_up"])
        xf = _linear_q(f, blk["w_down"])
        if tp_axis:
            xf = jax.lax.psum(xf, tp_axis)
        x = x + xf.reshape(S, 1, D)

    x = rms_norm(x[:, 0, :], params["rms_f"])
    logits = gemm_ad(x, params["unembed"], None, False, False)
    return logits, kv


def _llama_prefill_paged(params, kv, prompts, lengths, page_vecs,
                         prefix_vecs, *, n_heads: int, page_size: int,
                         bucket: int, n_prefix: int = 0, window=None,
                         tp_axis=None):
    """Batched llama prefill: see ``_prefill_paged`` for the batching
    contract (prompts (K, bucket), lengths (K,), page_vecs (K, bucket/ps),
    prefix_vecs (K, n_prefix))."""
    from ..ops.attention import attention_gqa
    from ..ops.norm import rms_norm
    from ..ops.rope import apply_rope

    D = params["embed"].shape[1]
    H = n_heads
    hd = _w_out_dim(params["blocks"][0]["wq"]) // H  # local-shard safe
    Hkv = _w_out_dim(params["blocks"][0]["wkv"]) // (2 * hd)
    K = prompts.shape[0]
    n_pg = bucket // page_size
    cos, sin = params["rope_cos"], params["rope_sin"]
    # prefix caching: the suffix sits at global positions starting after
    # the cached pages; stored prefix K is already roped at its own
    # global positions, so cross-attention needs no further rotation
    pos0 = n_prefix * page_size
    x = params["embed"][prompts]  # (K, bucket, D)

    for li, blk in enumerate(params["blocks"]):
        h = rms_norm(x, blk["rms1"]).reshape(K * bucket, D)
        q = _linear_q(h, blk["wq"]).reshape(
            K, bucket, H, hd).transpose(0, 2, 1, 3)          # (K,H,bkt,hd)
        kvp = _linear_q(h, blk["wkv"]).reshape(K, bucket, 2, Hkv, hd)
        k = kvp[:, :, 0].transpose(0, 2, 1, 3)               # (K,Hkv,bkt,hd)
        v = kvp[:, :, 1].transpose(0, 2, 1, 3)
        q = apply_rope(q, cos, sin, position_offset=pos0)
        k = apply_rope(k, cos, sin, position_offset=pos0)

        def pages_of(t):  # (K, Hkv, bucket, hd) -> (K*n_pg, Hkv, ps, hd)
            return (t.reshape(K, Hkv, n_pg, page_size, hd)
                    .transpose(0, 2, 1, 3, 4)
                    .reshape(K * n_pg, Hkv, page_size, hd))
        kv = _kv_write_pages(kv, li, page_vecs.reshape(-1),
                             pages_of(k), pages_of(v))
        if n_prefix:
            o = _attend_with_prefix(kv, li, q, k, v, prefix_vecs, H // Hkv,
                                    window=window, q_pos0=pos0)
        else:
            o = attention_gqa(q, k, v, causal=True, window=window)
        o = o.transpose(0, 2, 1, 3).reshape(K * bucket, H * hd)
        xo = _linear_q(o, blk["wo"])
        if tp_axis:
            xo = jax.lax.psum(xo, tp_axis)
        x = x + xo.reshape(K, bucket, D)

        h = rms_norm(x, blk["rms2"]).reshape(K * bucket, D)
        f = jax.nn.silu(_linear_q(h, blk["w_gate"])) * _linear_q(
            h, blk["w_up"])
        xf = _linear_q(f, blk["w_down"])
        if tp_axis:
            xf = jax.lax.psum(xf, tp_axis)
        x = x + xf.reshape(K, bucket, D)

    last = jnp.take_along_axis(
        x, jnp.clip(lengths - 1, 0, bucket - 1)[:, None, None], axis=1)[:, 0]
    last = rms_norm(last, params["rms_f"])
    logits = gemm_ad(last, params["unembed"], None, False, False)
    return logits, kv
