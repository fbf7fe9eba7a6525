"""Modern decoder family (LLaMA-class block) built on the laser kernels.

The second transformer family (models/transformer.py is the classic
pre-LN MHA encoder/decoder): RMSNorm -> RoPE -> grouped-query flash
attention -> SwiGLU FFN, untied in/out embeddings. Exercises the round-2
kernel surface end to end: GQA (ops/attention.py:attention_gqa_trainable),
rotary embeddings (ops/rope.py), fused RMSNorm rows (ops/norm.py), the
flash prefill + KV-cached decode pattern, and the fused linear VJPs.
Training: llama_train_step — fused AdamW (ops/optim.py) over a loss whose
unembedding projection is fused into the chunked-vocab cross entropy
(ops/loss.py:lm_cross_entropy), so the (B·S, vocab) logits are never
materialized in a training step.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from ..ops.attention import attention_gqa_trainable
from ..ops.gemm.autodiff import gemm_ad, linear
from ..ops.loss import lm_cross_entropy
from ..ops.norm import rms_norm
from ..ops.optim import (accumulated_value_and_grad, adamw_init, adamw_step,
                         clip_by_global_norm)
from ..ops.rope import apply_rope, rope_tables

Params = Dict[str, jax.Array]


def init_llama(key: jax.Array, *, n_layers: int, d_model: int, n_heads: int,
               n_kv_heads: int, d_ff: int, vocab: int, max_len: int = 2048,
               dtype=jnp.float32) -> Dict:
    if d_model % n_heads or n_heads % n_kv_heads:
        raise ValueError("d_model % n_heads and n_heads % n_kv_heads must be 0")
    hd = d_model // n_heads
    keys = jax.random.split(key, 6 * n_layers + 2)
    s = jnp.sqrt(1.0 / d_model).astype(dtype)
    sf = jnp.sqrt(1.0 / d_ff).astype(dtype)
    blocks = []
    for i in range(n_layers):
        k = keys[6 * i: 6 * (i + 1)]
        blocks.append({
            "wq": jax.random.normal(k[0], (d_model, n_heads * hd), dtype) * s,
            "wkv": jax.random.normal(k[1], (d_model, 2 * n_kv_heads * hd),
                                     dtype) * s,
            "wo": jax.random.normal(k[2], (n_heads * hd, d_model), dtype) * s,
            "w_gate": jax.random.normal(k[3], (d_model, d_ff), dtype) * s,
            "w_up": jax.random.normal(k[4], (d_model, d_ff), dtype) * s,
            "w_down": jax.random.normal(k[5], (d_ff, d_model), dtype) * sf,
            "rms1": jnp.ones((d_model,), dtype),
            "rms2": jnp.ones((d_model,), dtype),
        })
    cos, sin = rope_tables(max_len, hd)
    return {
        "embed": jax.random.normal(keys[-2], (vocab, d_model), dtype) * 0.02,
        "unembed": jax.random.normal(keys[-1], (d_model, vocab), dtype) * s,
        "blocks": blocks,
        "rms_f": jnp.ones((d_model,), dtype),
        "rope_cos": cos, "rope_sin": sin,
    }


def _qkv(blk, x, B, S, H, Hkv, hd, cos, sin, pos=0):
    D = x.shape[-1]
    q = linear(x.reshape(B * S, D), blk["wq"], None)
    kv = linear(x.reshape(B * S, D), blk["wkv"], None)
    q = q.reshape(B, S, H, hd).transpose(0, 2, 1, 3)
    kv = kv.reshape(B, S, 2, Hkv, hd).transpose(2, 0, 3, 1, 4)
    k, v = kv[0], kv[1]
    q = apply_rope(q, cos, sin, position_offset=pos)
    k = apply_rope(k, cos, sin, position_offset=pos)
    return q, k, v


def llama_hidden(params: Dict, tokens: jax.Array, *, n_heads: int,
                 n_kv_heads: int, window=None,
                 remat: bool = False) -> jax.Array:
    """tokens (B, S) int32 -> final-RMSNorm hidden states (B, S, D).

    remat=True wraps each block in ``jax.checkpoint``: the backward pass
    recomputes block activations instead of saving them, cutting live
    training memory from O(layers) to O(1) blocks of activations at the
    cost of one extra forward — the standard TPU trade of FLOPs (MXU has
    headroom) for HBM (the binding resource at long sequence)."""
    H, Hkv = n_heads, n_kv_heads
    x = params["embed"][tokens]
    B, S, D = x.shape
    hd = D // H
    cos, sin = params["rope_cos"], params["rope_sin"]

    def block(x, blk):
        h = rms_norm(x, blk["rms1"])
        q, k, v = _qkv(blk, h, B, S, H, Hkv, hd, cos, sin)
        o = attention_gqa_trainable(q, k, v, causal=True, window=window)
        o = o.transpose(0, 2, 1, 3).reshape(B * S, H * hd)
        x = x + linear(o, blk["wo"], None).reshape(B, S, D)

        h = rms_norm(x, blk["rms2"])
        h2 = h.reshape(B * S, D)
        gate = linear(h2, blk["w_gate"], None)
        up = linear(h2, blk["w_up"], None)
        f = jax.nn.silu(gate) * up  # SwiGLU
        return x + linear(f, blk["w_down"], None).reshape(B, S, D)

    step = jax.checkpoint(block) if remat else block
    for blk in params["blocks"]:
        x = step(x, blk)
    return rms_norm(x, params["rms_f"])


def llama_forward(params: Dict, tokens: jax.Array, *, n_heads: int,
                  n_kv_heads: int, window=None) -> jax.Array:
    """tokens (B, S) int32 -> logits (B, S, vocab). Causal. Head counts are
    static call args (they must not live in the differentiable pytree).
    ``window``: sliding-window attention (mistral-style) — every position
    sees at most the previous ``window`` tokens; the flash kernels skip
    out-of-window blocks in forward AND backward."""
    x = llama_hidden(params, tokens, n_heads=n_heads, n_kv_heads=n_kv_heads,
                     window=window)
    B, S, D = x.shape
    logits = gemm_ad(x.reshape(B * S, D), params["unembed"], None,
                     False, False)
    return logits.reshape(B, S, -1)


# -- training: chunked-vocab LM loss + fused AdamW ----------------------------

_STATIC_KEYS = ("rope_cos", "rope_sin")  # precomputed tables, not trained


def llama_lm_loss(params: Dict, tokens: jax.Array, *, n_heads: int,
                  n_kv_heads: int, window=None,
                  label_smoothing: float = 0.0,
                  ignore_index=None,
                  remat: bool = False) -> jax.Array:
    """Next-token cross entropy. The unembedding projection and the loss
    run as ONE chunked-vocab pass (ops/loss.py:lm_cross_entropy,
    transb=False for the untied (D, vocab) layout): the (B·S, vocab)
    logits are never materialized, forward or backward.

    ignore_index: positions whose TARGET equals it contribute zero
    loss/grad (mean over the rest), and such tokens are clamped to 0
    before the embedding lookup — so rows from
    data/loader.py:PackedTokenDataset(mode="bins") (pad slots carry
    ignore_index) feed straight in."""
    targets = tokens[:, 1:]
    if ignore_index is not None:
        tokens = jnp.where(tokens == ignore_index, 0, tokens)
    x = llama_hidden(params, tokens, n_heads=n_heads,
                     n_kv_heads=n_kv_heads, window=window, remat=remat)
    return lm_cross_entropy(x[:, :-1], params["unembed"], targets,
                            transb=False, label_smoothing=label_smoothing,
                            ignore_index=ignore_index)


def llama_train_init(params: Dict):
    """AdamW state (m, v) for the trainable subset of ``params``."""
    train = {k: v for k, v in params.items() if k not in _STATIC_KEYS}
    return adamw_init(train)


def _llama_loss_grads(params, tokens, *, n_heads, n_kv_heads, window,
                      label_smoothing, accum: int = 1,
                      remat: bool = False, ignore_index=None):
    static = {k: params[k] for k in _STATIC_KEYS}
    train = {k: v for k, v in params.items() if k not in _STATIC_KEYS}

    def loss_fn(tp, toks):
        return llama_lm_loss({**tp, **static}, toks, n_heads=n_heads,
                             n_kv_heads=n_kv_heads, window=window,
                             label_smoothing=label_smoothing, remat=remat,
                             ignore_index=ignore_index)

    loss, grads = accumulated_value_and_grad(loss_fn, accum)(train, tokens)
    return static, train, loss, grads


def llama_train_step(params: Dict, opt_state, tokens: jax.Array,
                     step, *, n_heads: int, n_kv_heads: int,
                     lr=1e-3, weight_decay: float = 0.0, window=None,
                     label_smoothing: float = 0.0, clip_norm=None,
                     accum: int = 1, remat: bool = False,
                     ignore_index=None):
    """One AdamW step; returns (new_params, new_opt_state, loss). Jittable
    (``step`` is the 1-based count; ``lr`` may be a traced schedule value,
    e.g. ops/optim.py:warmup_cosine_lr). The rope tables ride along
    untouched — they are positional constants, not weights.

    clip_norm: global-L2 gradient clipping before the update.
    accum: split the batch into ``accum`` sequentially-scanned
    microbatches (gradient accumulation — one microbatch of activations
    live at a time). remat: recompute block activations in backward
    (jax.checkpoint per block)."""
    static, train, loss, grads = _llama_loss_grads(
        params, tokens, n_heads=n_heads, n_kv_heads=n_kv_heads,
        window=window, label_smoothing=label_smoothing, accum=accum,
        remat=remat, ignore_index=ignore_index)
    if clip_norm is not None:
        grads, _ = clip_by_global_norm(grads, clip_norm)
    m, v = opt_state
    new_train, m2, v2 = adamw_step(train, grads, m, v, step, lr=lr,
                                   weight_decay=weight_decay)
    return {**new_train, **static}, (m2, v2), loss


def llama_train_step_dp(params: Dict, opt_state, tokens: jax.Array,
                        step, mesh, *, axis: str = "dp", n_heads: int,
                        n_kv_heads: int, lr=1e-3,
                        weight_decay: float = 0.0, window=None,
                        label_smoothing: float = 0.0, clip_norm=None,
                        accum: int = 1, remat: bool = False,
                        ignore_index=None):
    """Data-parallel AdamW step over ``mesh[axis]``: the batch is sharded,
    params/optimizer state replicated, and gradients (and the reported
    loss) are pmean'd over ICI. The collective sits OUTSIDE the
    differentiated region — grads are averaged after value_and_grad — so
    no collective is ever differentiated through shard_map (the
    replicated-cotangent pitfall; see models/mlp.py:sharded_sgd_step).
    Clipping (when asked) uses the POST-pmean global norm, so it matches
    the single-device step. Every device then applies the identical AdamW
    update. Semantically one `llama_train_step` on the full batch (equal
    shard sizes)."""
    from jax.sharding import PartitionSpec as P

    def body(p, o, toks, i):
        static, train, loss, grads = _llama_loss_grads(
            p, toks, n_heads=n_heads, n_kv_heads=n_kv_heads,
            window=window, label_smoothing=label_smoothing, accum=accum,
            remat=remat, ignore_index=ignore_index)
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        if clip_norm is not None:
            grads, _ = clip_by_global_norm(grads, clip_norm)
        m, v = o
        new_train, m2, v2 = adamw_step(train, grads, m, v, i, lr=lr,
                                       weight_decay=weight_decay)
        return {**new_train, **static}, (m2, v2), loss

    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(axis), P()),
        out_specs=(P(), P(), P()),
        check_vma=False)  # Pallas calls don't carry vma metadata yet
    return mapped(params, opt_state, tokens,
                  jnp.asarray(step, jnp.int32))


# -- mixed precision: bf16 compute tree + f32 master weights ------------------


def llama_cast(params: Dict, dtype=jnp.bfloat16) -> Dict:
    """Cast every float leaf — INCLUDING the rope tables — to ``dtype``.

    The result is a compute tree: on TPU, bf16 params mean bf16 MXU
    matmuls (2× the f32 FLOPs) and half the weight/activation HBM. Keep
    the optimizer in f32 via ``llama_train_init_mp`` — bf16 has f32's
    exponent range (no loss scaling needed) but only 8 mantissa bits,
    too coarse to integrate small updates."""
    def c(x):
        return x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) \
            else x

    return jax.tree_util.tree_map(c, params)


def llama_train_init_mp(params: Dict, master_dtype=jnp.float32):
    """(m, v, master) for mixed-precision AdamW: f32 master weights
    upcast from the (bf16) compute tree, f32 moments."""
    train = {k: v for k, v in params.items() if k not in _STATIC_KEYS}
    master = jax.tree_util.tree_map(lambda p: p.astype(master_dtype), train)
    m, v = adamw_init(master)
    return m, v, master


def llama_train_step_mp(params: Dict, opt_state, tokens: jax.Array,
                        step, *, n_heads: int, n_kv_heads: int,
                        lr=1e-3, weight_decay: float = 0.0, window=None,
                        label_smoothing: float = 0.0, clip_norm=None,
                        accum: int = 1, remat: bool = False,
                        ignore_index=None):
    """Mixed-precision AdamW step. ``params`` is the COMPUTE tree
    (``llama_cast(params, bf16)``); ``opt_state`` = (m, v, master) from
    ``llama_train_init_mp``. Loss/grads run in the compute dtype, grads
    upcast to f32, the f32 masters take the fused-AdamW update, and the
    new compute params are the masters re-cast — so round-to-bf16 error
    never accumulates in the weights across steps. Same knobs as
    ``llama_train_step``."""
    static, train, loss, grads = _llama_loss_grads(
        params, tokens, n_heads=n_heads, n_kv_heads=n_kv_heads,
        window=window, label_smoothing=label_smoothing, accum=accum,
        remat=remat, ignore_index=ignore_index)
    grads = jax.tree_util.tree_map(
        lambda g: g.astype(jnp.float32), grads)
    if clip_norm is not None:
        grads, _ = clip_by_global_norm(grads, clip_norm)
    m, v, master = opt_state
    new_master, m2, v2 = adamw_step(master, grads, m, v, step, lr=lr,
                                    weight_decay=weight_decay)
    new_train = jax.tree_util.tree_map(
        lambda mw, old: mw.astype(old.dtype), new_master, train)
    return {**new_train, **static}, (m2, v2, new_master), loss


# -- ZeRO-1: optimizer state sharded over the data axis -----------------------


def llama_train_init_zero1(params: Dict, mesh, *, axis: str = "dp",
                           master_dtype=None):
    """AdamW (m, v) for ZeRO-1: each trainable leaf's moments live
    FLATTENED, zero-padded to a multiple of mesh[axis], and evenly sharded
    over that axis — every device owns 1/n of the optimizer state instead
    of a full replica (the round-off of DP memory: states are only ever
    read/written by their owner shard). Lay out with
    ``NamedSharding(mesh, P(axis))`` per leaf.

    master_dtype (e.g. jnp.float32 with bf16 ``params`` from
    ``llama_cast``): ALSO keep sharded f32 MASTER WEIGHTS — the state
    becomes (m, v, master) and the step updates masters, re-casting the
    replicated compute params each step (the standard mixed-precision
    recipe; the all_gather then moves bf16, half the ICI bytes)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.shape[axis]
    train = {k: v for k, v in params.items() if k not in _STATIC_KEYS}
    sh = NamedSharding(mesh, P(axis))
    mdt = master_dtype

    def z(p):
        pad = -p.size % n
        return jax.device_put(
            jnp.zeros((p.size + pad,), p.dtype if mdt is None else mdt), sh)

    m = jax.tree_util.tree_map(z, train)
    v = jax.tree_util.tree_map(z, train)
    if mdt is None:
        return m, v

    def mz(p):
        flat = p.reshape(-1).astype(mdt)
        return jax.device_put(jnp.pad(flat, (0, -p.size % n)), sh)

    return m, v, jax.tree_util.tree_map(mz, train)


def llama_train_step_zero1(params: Dict, opt_state, tokens: jax.Array,
                           step, mesh, *, axis: str = "dp", n_heads: int,
                           n_kv_heads: int, lr=1e-3,
                           weight_decay: float = 0.0, window=None,
                           label_smoothing: float = 0.0, clip_norm=None,
                           accum: int = 1, remat: bool = False,
                           ignore_index=None):
    """ZeRO-1 data-parallel AdamW step: batch sharded, params replicated,
    optimizer state SHARDED (``llama_train_init_zero1``). Per leaf:

      1. local grads -> ``psum_scatter`` over ICI (each device receives
         only ITS 1/n slice of the summed gradient — half the bytes of
         the all-reduce a plain DP step pays, and the only slice it needs),
      2. the owner updates its param/moment shard with the fused AdamW,
      3. ``all_gather`` rebuilds the full (replicated) params for the
         next forward.

    reduce_scatter + all_gather together move exactly what one all-reduce
    moves, so ZeRO-1 costs no extra ICI — it only deletes (n-1)/n of the
    optimizer-state HBM. Arithmetically identical to `llama_train_step`
    on the full batch (equal shards): the update is elementwise, so
    updating shards == updating the whole tensor. Gradient clipping uses
    the global norm (psum of owner-shard partials)."""
    from jax.sharding import PartitionSpec as P

    n = mesh.shape[axis]

    def body(p, o, toks, i):
        static, train, loss, grads = _llama_loss_grads(
            p, toks, n_heads=n_heads, n_kv_heads=n_kv_heads,
            window=window, label_smoothing=label_smoothing, accum=accum,
            remat=remat, ignore_index=ignore_index)
        loss = jax.lax.pmean(loss, axis)

        def scatter(g):
            flat = g.reshape(-1).astype(jnp.float32)
            pad = -flat.size % n
            if pad:
                flat = jnp.pad(flat, (0, pad))
            return jax.lax.psum_scatter(flat, axis, scatter_dimension=0,
                                        tiled=True) * (1.0 / n)

        gsh = jax.tree_util.tree_map(scatter, grads)
        if clip_norm is not None:
            # global norm from owner-shard partials: each element is owned
            # by exactly one device, so the psum of local squares is the
            # full squared norm (pad lanes carry zero grads)
            sq = jnp.sum(jnp.stack(
                [jnp.sum(jnp.square(l))
                 for l in jax.tree_util.tree_leaves(gsh)]))
            norm = jnp.sqrt(jax.lax.psum(sq, axis))
            scale = jnp.asarray(clip_norm, jnp.float32) / jnp.maximum(
                norm, clip_norm)
            gsh = jax.tree_util.tree_map(lambda g: g * scale, gsh)

        idx = jax.lax.axis_index(axis)

        def shard_of(pl):
            flat = pl.reshape(-1)
            pad = -flat.size % n
            if pad:
                flat = jnp.pad(flat, (0, pad))
            chunk = flat.size // n
            return jax.lax.dynamic_slice(flat, (idx * chunk,), (chunk,))

        # mixed precision (init with master_dtype=...): the opt state
        # carries sharded f32 masters — update those, not the bf16 params
        mp = len(o) == 3
        if mp:
            m, v, master = o
            psh = master
        else:
            m, v = o
            psh = jax.tree_util.tree_map(shard_of, train)
        new_psh, m2, v2 = adamw_step(psh, gsh, m, v, i, lr=lr,
                                     weight_decay=weight_decay)

        def gather(newp, old):
            # cast BEFORE the all_gather: in mixed precision the wire
            # then carries the compute dtype (bf16 = half the ICI bytes)
            full = jax.lax.all_gather(newp.astype(old.dtype), axis,
                                      tiled=True)
            return full[:old.size].reshape(old.shape)

        new_train = jax.tree_util.tree_map(gather, new_psh, train)
        new_o = (m2, v2, new_psh) if mp else (m2, v2)
        return {**new_train, **static}, new_o, loss

    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P()),
        out_specs=(P(), P(axis), P()),
        check_vma=False)  # Pallas calls don't carry vma metadata yet
    return mapped(params, opt_state, tokens,
                  jnp.asarray(step, jnp.int32))


# -- tensor parallel: megatron dp x tp training -------------------------------
#
# Column/row split per block (arXiv:1909.08053 §3, the layout Megatron-LM
# uses because it needs only TWO collectives per block per direction):
#   wq, wk, wv     (D, heads*hd)  column-parallel — each shard owns whole
#                                 heads, so attention is embarrassingly
#                                 head-parallel (no collective inside)
#   wo             (heads*hd, D)  row-parallel    — psum at the exit
#   w_gate, w_up   (D, d_ff)      column-parallel
#   w_down         (d_ff, D)      row-parallel    — psum at the exit
# Norms/embeddings replicated. The conjugate boundary operators
# (parallel/mesh.py: copy_fwd_psum_bwd / psum_fwd_copy_bwd) make the
# backward pass exact under shard_map(check_vma=False).

_TP_COL = ("wq", "wk", "wv", "w_gate", "w_up")  # sharded on dim 1
_TP_ROW = ("wo", "w_down")                      # sharded on dim 0


def _tp_leaf_kind(path) -> int:
    """0 = replicated, 1 = column-sharded, 2 = row-sharded."""
    name = getattr(path[-1], "key", None) if path else None
    if name in _TP_COL:
        return 1
    if name in _TP_ROW:
        return 2
    return 0


def _tp_spec_tree(tree, tp_axis: str):
    from jax.sharding import PartitionSpec as P

    def spec_of(path, leaf):
        kind = _tp_leaf_kind(path)
        if kind == 1:
            return P(None, tp_axis)
        if kind == 2:
            return P(tp_axis, None)
        return P()

    return jax.tree_util.tree_map_with_path(spec_of, tree)


def llama_tp_params(params: Dict, mesh, *, tp_axis: str = "tp") -> Dict:
    """Relayout ``init_llama`` params for megatron tensor parallelism.

    The fused ``wkv`` is split into separate ``wk``/``wv`` leaves (its
    column order is [all K heads | all V heads], so a single contiguous
    column shard would hand low shards only K and high shards only V),
    then every leaf is placed with its TP NamedSharding: whole q/kv heads
    per shard on the column side, matching row shards on the exit side,
    everything else replicated. ``llama_tp_merge`` is the inverse."""
    from jax.sharding import NamedSharding

    blocks = []
    for blk in params["blocks"]:
        b = dict(blk)
        wkv = b.pop("wkv")
        half = wkv.shape[1] // 2
        b["wk"], b["wv"] = wkv[:, :half], wkv[:, half:]
        blocks.append(b)
    tp = {**{k: v for k, v in params.items() if k != "blocks"},
          "blocks": blocks}
    specs = _tp_spec_tree(tp, tp_axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tp, specs)


def llama_tp_merge(params_tp: Dict) -> Dict:
    """Gather a TP param tree back to the single-device ``init_llama``
    layout (wk/wv re-fused into wkv). For checkpoints and oracle tests."""
    blocks = []
    for blk in params_tp["blocks"]:
        b = dict(blk)
        wk, wv = b.pop("wk"), b.pop("wv")
        b["wkv"] = jnp.concatenate([jnp.asarray(wk), jnp.asarray(wv)],
                                   axis=1)
        blocks.append(b)
    return {**{k: jnp.asarray(v) for k, v in params_tp.items()
               if k != "blocks"}, "blocks": blocks}


def _llama_tp_hidden(params: Dict, tokens: jax.Array, *, h_loc: int,
                     hkv_loc: int, head_dim: int, tp_axis: str,
                     window=None, remat: bool = False) -> jax.Array:
    """Per-shard block forward (runs INSIDE shard_map). Activations
    entering the residual stream are replicated over tp; only the
    head/d_ff dimension inside a block is sharded."""
    from ..parallel.mesh import copy_fwd_psum_bwd, psum_fwd_copy_bwd

    f = copy_fwd_psum_bwd(tp_axis)
    g = psum_fwd_copy_bwd(tp_axis)
    H, Hkv, hd = h_loc, hkv_loc, head_dim
    x = params["embed"][tokens]
    B, S, D = x.shape
    cos, sin = params["rope_cos"], params["rope_sin"]

    def block(x, blk):
        h = f(rms_norm(x, blk["rms1"]))
        h2 = h.reshape(B * S, D)
        q = linear(h2, blk["wq"], None).reshape(B, S, H, hd)
        k = linear(h2, blk["wk"], None).reshape(B, S, Hkv, hd)
        v = linear(h2, blk["wv"], None).reshape(B, S, Hkv, hd)
        q = apply_rope(q.transpose(0, 2, 1, 3), cos, sin)
        k = apply_rope(k.transpose(0, 2, 1, 3), cos, sin)
        o = attention_gqa_trainable(q, k, v.transpose(0, 2, 1, 3),
                                    causal=True, window=window)
        o = o.transpose(0, 2, 1, 3).reshape(B * S, H * hd)
        x = x + g(linear(o, blk["wo"], None)).reshape(B, S, D)

        h = f(rms_norm(x, blk["rms2"]))
        h2 = h.reshape(B * S, D)
        gate = linear(h2, blk["w_gate"], None)
        up = linear(h2, blk["w_up"], None)
        ffn = jax.nn.silu(gate) * up  # SwiGLU over the local d_ff shard
        return x + g(linear(ffn, blk["w_down"], None)).reshape(B, S, D)

    step = jax.checkpoint(block) if remat else block
    for blk in params["blocks"]:
        x = step(x, blk)
    return rms_norm(x, params["rms_f"])


def llama_train_step_tp(params: Dict, opt_state, tokens: jax.Array,
                        step, mesh, *, axes=("dp", "tp"), n_heads: int,
                        n_kv_heads: int, lr=1e-3,
                        weight_decay: float = 0.0, window=None,
                        label_smoothing: float = 0.0, clip_norm=None,
                        accum: int = 1, remat: bool = False,
                        ignore_index=None):
    """2D-sharded AdamW step: batch over ``axes[0]`` (dp), heads/d_ff over
    ``axes[1]`` (tp, megatron split — params from ``llama_tp_params``).

    Per block and direction the tp axis carries exactly two psums (after
    wo and after w_down) riding ICI; backward adds the two conjugate
    psums at the rms entries. Gradients are pmean'd over dp outside the
    differentiated region, sharded-leaf AdamW updates run on each shard's
    own columns/rows (elementwise — updating shards == updating the whole
    tensor), and the loss (replicated over tp: hidden and unembed are)
    is pmean'd over dp. Arithmetically one `llama_train_step` on the full
    batch; certified in tests/test_llama.py and dryrun_multichip.

    clip_norm uses the exact global norm: replicated leaves counted once
    + psum(tp) of sharded-leaf partials."""
    from jax.sharding import PartitionSpec as P

    dp_ax, tp_ax = axes
    ntp = mesh.shape[tp_ax]
    if n_heads % ntp or n_kv_heads % ntp:
        raise ValueError(f"n_heads={n_heads}/n_kv_heads={n_kv_heads} must "
                         f"divide by tp={ntp}")
    h_loc, hkv_loc = n_heads // ntp, n_kv_heads // ntp
    head_dim = params["embed"].shape[1] // n_heads

    def body(p, o, toks, i):
        static = {k: p[k] for k in _STATIC_KEYS}
        train = {k: v for k, v in p.items() if k not in _STATIC_KEYS}

        def loss_fn(tp_, toks_):
            targets = toks_[:, 1:]
            if ignore_index is not None:
                toks_ = jnp.where(toks_ == ignore_index, 0, toks_)
            x = _llama_tp_hidden({**tp_, **static}, toks_, h_loc=h_loc,
                                 hkv_loc=hkv_loc, head_dim=head_dim,
                                 tp_axis=tp_ax, window=window, remat=remat)
            return lm_cross_entropy(x[:, :-1], tp_["unembed"],
                                    targets, transb=False,
                                    label_smoothing=label_smoothing,
                                    ignore_index=ignore_index)

        loss, grads = accumulated_value_and_grad(loss_fn, accum)(train, toks)
        grads = jax.lax.pmean(grads, dp_ax)
        loss = jax.lax.pmean(loss, dp_ax)

        if clip_norm is not None:
            mask = jax.tree_util.tree_leaves(
                jax.tree_util.tree_map_with_path(
                    lambda path, _: _tp_leaf_kind(path) != 0, grads))
            sq = [jnp.sum(jnp.square(l.astype(jnp.float32)))
                  for l in jax.tree_util.tree_leaves(grads)]
            rep = sum((s for s, m_ in zip(sq, mask) if not m_),
                      jnp.float32(0))
            shd = sum((s for s, m_ in zip(sq, mask) if m_),
                      jnp.float32(0))
            norm = jnp.sqrt(rep + jax.lax.psum(shd, tp_ax))
            scale = jnp.asarray(clip_norm, jnp.float32) / jnp.maximum(
                norm, clip_norm)
            grads = jax.tree_util.tree_map(
                lambda g_: (g_.astype(jnp.float32) * scale).astype(g_.dtype),
                grads)

        m, v = o
        new_train, m2, v2 = adamw_step(train, grads, m, v, i, lr=lr,
                                       weight_decay=weight_decay)
        return {**new_train, **static}, (m2, v2), loss

    pspecs = _tp_spec_tree(params, tp_ax)
    tspecs = {k: v for k, v in pspecs.items() if k not in _STATIC_KEYS}
    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(pspecs, (tspecs, tspecs), P(dp_ax), P()),
        out_specs=(pspecs, (tspecs, tspecs), P()),
        check_vma=False)  # Pallas calls don't carry vma metadata yet
    return mapped(params, opt_state, tokens,
                  jnp.asarray(step, jnp.int32))


# -- pipeline parallel: GPipe training over stage-sharded blocks --------------


def llama_pp_params(params: Dict, mesh, *, axis: str = "pp") -> Dict:
    """Relayout ``init_llama`` params for pipeline parallelism: the blocks
    are STACKED into one pytree with leading dims (n_stages,
    layers_per_stage, ...) and sharded over ``mesh[axis]`` on dim 0 — each
    device owns one contiguous group of layers. Embeddings/final norm/rope
    stay replicated (they run outside the pipelined region).
    ``llama_pp_merge`` is the inverse."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    S = mesh.shape[axis]
    blocks = params["blocks"]
    if len(blocks) % S:
        raise ValueError(f"n_layers={len(blocks)} must divide by "
                         f"pp={S} stages")
    k = len(blocks) // S
    stages = jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls).reshape((S, k) + ls[0].shape), *blocks)
    rest = {kk: v for kk, v in params.items() if kk != "blocks"}
    out = {**rest, "stages": stages}
    spec = jax.tree_util.tree_map_with_path(
        lambda path, _: P(axis) if getattr(path[0], "key", None) == "stages"
        else P(), out)
    return jax.tree_util.tree_map(
        lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)), out, spec)


def llama_pp_merge(params_pp: Dict) -> Dict:
    """Gather a PP param tree back to the ``init_llama`` layout."""
    stages = params_pp["stages"]
    lead = jax.tree_util.tree_leaves(stages)[0].shape[:2]
    n_layers = lead[0] * lead[1]
    flat = jax.tree_util.tree_map(
        lambda l: jnp.asarray(l).reshape((n_layers,) + l.shape[2:]), stages)
    blocks = [jax.tree_util.tree_map(lambda l: l[i], flat)
              for i in range(n_layers)]
    return {**{kk: jnp.asarray(v) for kk, v in params_pp.items()
               if kk != "stages"}, "blocks": blocks}


def llama_train_init_pp(params_pp: Dict):
    """AdamW (m, v) matching the PP layout (zeros_like keeps shardings)."""
    train = {k: v for k, v in params_pp.items() if k not in _STATIC_KEYS}
    return adamw_init(train)


def llama_train_step_pp(params: Dict, opt_state, tokens: jax.Array,
                        step, mesh, *, axis: str = "pp", n_micro: int,
                        n_heads: int, n_kv_heads: int, lr=1e-3,
                        weight_decay: float = 0.0, window=None,
                        label_smoothing: float = 0.0,
                        ignore_index=None):
    """GPipe pipeline-parallel AdamW step (params from ``llama_pp_params``).

    The batch splits into ``n_micro`` microbatches; embedded microbatches
    enter at stage 0, hidden states hop stage-to-stage over ICI
    (``ppermute``, parallel/pipeline.py:spmd_pipeline), and the last
    stage's outputs broadcast back (conjugate-psum, so the backward pass
    through the whole schedule is exact). Embedding/final-norm/loss run
    replicated outside the pipelined region; their one subtlety is that
    the EMBEDDING's cotangent only materializes on stage 0 (only stage 0
    injects), so its gradient is psum'd over the axis after
    value_and_grad — every other replicated leaf's grad is already full
    and identical on all stages. Stage-owned block grads stay local.
    Arithmetically one `llama_train_step` on the full batch (GPipe is an
    exact schedule, not an approximation); certified in tests and
    dryrun_multichip."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.pipeline import spmd_pipeline

    S = mesh.shape[axis]
    head_dim = params["embed"].shape[1] // n_heads
    H, Hkv = n_heads, n_kv_heads

    def body(p, o, toks, i):
        static = {k: p[k] for k in _STATIC_KEYS}
        train = {k: v for k, v in p.items() if k not in _STATIC_KEYS}
        cos, sin = static["rope_cos"], static["rope_sin"]
        B, Sq = toks.shape
        if B % n_micro:
            raise ValueError(f"batch {B} % n_micro {n_micro} != 0")
        mb = B // n_micro
        D = p["embed"].shape[1]

        def block(x, blk):
            h = rms_norm(x, blk["rms1"])
            q, k_, v_ = _qkv(blk, h, mb, Sq, H, Hkv, head_dim, cos, sin)
            oatt = attention_gqa_trainable(q, k_, v_, causal=True,
                                           window=window)
            oatt = oatt.transpose(0, 2, 1, 3).reshape(mb * Sq, H * head_dim)
            x = x + linear(oatt, blk["wo"], None).reshape(mb, Sq, D)
            h2 = rms_norm(x, blk["rms2"]).reshape(mb * Sq, D)
            f = jax.nn.silu(linear(h2, blk["w_gate"], None)) * linear(
                h2, blk["w_up"], None)
            return x + linear(f, blk["w_down"], None).reshape(mb, Sq, D)

        def stage_fn(sp, x):
            k = jax.tree_util.tree_leaves(sp)[0].shape[0]
            for j in range(k):
                x = block(x, jax.tree_util.tree_map(lambda l: l[j], sp))
            return x

        pipe = spmd_pipeline(stage_fn, axis)

        def loss_fn(tp, toks_):
            targets = toks_[:, 1:]
            if ignore_index is not None:
                toks_ = jnp.where(toks_ == ignore_index, 0, toks_)
            x = tp["embed"][toks_]  # replicated; only stage 0's enters
            micro = x.reshape(n_micro, mb, Sq, D)
            # local stages leaf is (1, k, ...): drop the sharded dim
            sp = jax.tree_util.tree_map(lambda q: q[0], tp["stages"])
            hidden = pipe(sp, micro).reshape(B, Sq, D)
            hidden = rms_norm(hidden, tp["rms_f"])
            return lm_cross_entropy(hidden[:, :-1], tp["unembed"],
                                    targets, transb=False,
                                    label_smoothing=label_smoothing,
                                    ignore_index=ignore_index)

        loss, grads = jax.value_and_grad(loss_fn)(train, toks)
        # only stage 0's injection touches the embedding -> its grad lives
        # on stage 0 alone; make it whole (and replicated) explicitly
        grads["embed"] = jax.lax.psum(grads["embed"], axis)

        m, v = o
        new_train, m2, v2 = adamw_step(train, grads, m, v, i, lr=lr,
                                       weight_decay=weight_decay)
        return {**new_train, **static}, (m2, v2), loss

    pspec = jax.tree_util.tree_map_with_path(
        lambda path, _: P(axis) if getattr(path[0], "key", None) == "stages"
        else P(), params)
    tspec = {k: v for k, v in pspec.items() if k not in _STATIC_KEYS}
    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(pspec, (tspec, tspec), P(), P()),
        out_specs=(pspec, (tspec, tspec), P()),
        check_vma=False)  # Pallas calls don't carry vma metadata yet
    return mapped(params, opt_state, tokens, jnp.asarray(step, jnp.int32))


# -- 3D parallel: dp x tp x pp in one training step ---------------------------


def llama_3d_params(params: Dict, mesh, *, tp_axis: str = "tp",
                    pp_axis: str = "pp") -> Dict:
    """Relayout for 3D parallelism: blocks STACKED (n_stages,
    layers_per_stage, ...) and sharded over ``pp_axis`` on dim 0, with the
    megatron column/row split over ``tp_axis`` on the matmul dims (wkv
    split into wk/wv as in ``llama_tp_params``). Embeddings/final norm
    replicated. ``llama_3d_merge`` is the inverse."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    S = mesh.shape[pp_axis]
    blocks = params["blocks"]
    if len(blocks) % S:
        raise ValueError(f"n_layers={len(blocks)} must divide by "
                         f"pp={S} stages")
    k = len(blocks) // S
    split = []
    for blk in blocks:
        b = dict(blk)
        wkv = b.pop("wkv")
        half = wkv.shape[1] // 2
        b["wk"], b["wv"] = wkv[:, :half], wkv[:, half:]
        split.append(b)
    stages = jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls).reshape((S, k) + ls[0].shape), *split)
    out = {**{kk: v for kk, v in params.items() if kk != "blocks"},
           "stages": stages}

    def spec_of(path, leaf):
        if getattr(path[0], "key", None) != "stages":
            return P()
        name = getattr(path[-1], "key", None)
        if name in _TP_COL:
            return P(pp_axis, None, None, tp_axis)
        if name in _TP_ROW:
            return P(pp_axis, None, tp_axis, None)
        return P(pp_axis)

    specs = jax.tree_util.tree_map_with_path(spec_of, out)
    return jax.tree_util.tree_map(
        lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)), out,
        specs)


def llama_3d_merge(params_3d: Dict) -> Dict:
    """Gather a 3D param tree back to the ``init_llama`` layout."""
    stages = params_3d["stages"]
    lead = jax.tree_util.tree_leaves(stages)[0].shape[:2]
    n_layers = lead[0] * lead[1]
    flat = jax.tree_util.tree_map(
        lambda l: jnp.asarray(l).reshape((n_layers,) + l.shape[2:]), stages)
    blocks = []
    for i in range(n_layers):
        b = jax.tree_util.tree_map(lambda l: l[i], flat)
        b["wkv"] = jnp.concatenate([b.pop("wk"), b.pop("wv")], axis=1)
        blocks.append(b)
    return {**{kk: jnp.asarray(v) for kk, v in params_3d.items()
               if kk != "stages"}, "blocks": blocks}


def llama_train_init_3d(params_3d: Dict):
    """AdamW (m, v) matching the 3D layout (zeros_like keeps shardings)."""
    train = {k: v for k, v in params_3d.items() if k not in _STATIC_KEYS}
    return adamw_init(train)


def llama_train_step_3d(params: Dict, opt_state, tokens: jax.Array,
                        step, mesh, *, axes=("dp", "tp", "pp"),
                        n_micro: int, n_heads: int, n_kv_heads: int,
                        lr=1e-3, weight_decay: float = 0.0, window=None,
                        label_smoothing: float = 0.0, clip_norm=None,
                        ignore_index=None):
    """The full 3D-parallel AdamW step (params from ``llama_3d_params``):
    batch sharded over dp, megatron head/d_ff split over tp INSIDE each
    pipeline stage, GPipe microbatch schedule over pp. Composes the three
    certified-exact mechanisms: the conjugate f/g operators pin every tp
    boundary's backward, the pipeline broadcast's adjoint is pinned in
    spmd_pipeline, the stage-0-only embedding cotangent is psum'd whole
    over pp, gradients pmean over dp, and every shard updates its own
    params with the fused AdamW. Arithmetically one `llama_train_step`
    on the full batch; certified vs that oracle in tests and
    dryrun_multichip.

    clip_norm: exact global norm — stage leaves' square-sums psum over
    (tp, pp) (each element owned by exactly one shard), replicated
    leaves counted once."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import copy_fwd_psum_bwd, psum_fwd_copy_bwd
    from ..parallel.pipeline import spmd_pipeline

    dp_ax, tp_ax, pp_ax = axes
    ntp = mesh.shape[tp_ax]
    if n_heads % ntp or n_kv_heads % ntp:
        raise ValueError(f"n_heads={n_heads}/n_kv_heads={n_kv_heads} must "
                         f"divide by tp={ntp}")
    H, Hkv = n_heads // ntp, n_kv_heads // ntp
    hd = params["embed"].shape[1] // n_heads
    f = copy_fwd_psum_bwd(tp_ax)
    g = psum_fwd_copy_bwd(tp_ax)

    def body(p, o, toks, i):
        static = {k: p[k] for k in _STATIC_KEYS}
        train = {k: v for k, v in p.items() if k not in _STATIC_KEYS}
        cos, sin = static["rope_cos"], static["rope_sin"]
        B, Sq = toks.shape  # B = local dp shard
        if B % n_micro:
            raise ValueError(f"dp-local batch {B} % n_micro {n_micro} != 0")
        mb = B // n_micro
        D = p["embed"].shape[1]

        def block(x, blk):
            h = f(rms_norm(x, blk["rms1"]))
            h2 = h.reshape(mb * Sq, D)
            q = linear(h2, blk["wq"], None).reshape(mb, Sq, H, hd)
            k_ = linear(h2, blk["wk"], None).reshape(mb, Sq, Hkv, hd)
            v_ = linear(h2, blk["wv"], None).reshape(mb, Sq, Hkv, hd)
            q = apply_rope(q.transpose(0, 2, 1, 3), cos, sin)
            k_ = apply_rope(k_.transpose(0, 2, 1, 3), cos, sin)
            oatt = attention_gqa_trainable(q, k_, v_.transpose(0, 2, 1, 3),
                                           causal=True, window=window)
            oatt = oatt.transpose(0, 2, 1, 3).reshape(mb * Sq, H * hd)
            x = x + g(linear(oatt, blk["wo"], None)).reshape(mb, Sq, D)
            h = f(rms_norm(x, blk["rms2"]))
            h2 = h.reshape(mb * Sq, D)
            ffn = jax.nn.silu(linear(h2, blk["w_gate"], None)) * linear(
                h2, blk["w_up"], None)
            return x + g(linear(ffn, blk["w_down"], None)).reshape(
                mb, Sq, D)

        def stage_fn(sp, x):
            k = jax.tree_util.tree_leaves(sp)[0].shape[0]
            for j in range(k):
                x = block(x, jax.tree_util.tree_map(lambda l: l[j], sp))
            return x

        pipe = spmd_pipeline(stage_fn, pp_ax)

        def loss_fn(tp_, toks_):
            targets = toks_[:, 1:]
            if ignore_index is not None:
                toks_ = jnp.where(toks_ == ignore_index, 0, toks_)
            x = tp_["embed"][toks_]
            micro = x.reshape(n_micro, mb, Sq, D)
            sp = jax.tree_util.tree_map(lambda q: q[0], tp_["stages"])
            hidden = pipe(sp, micro).reshape(B, Sq, D)
            hidden = rms_norm(hidden, tp_["rms_f"])
            return lm_cross_entropy(hidden[:, :-1], tp_["unembed"],
                                    targets, transb=False,
                                    label_smoothing=label_smoothing,
                                    ignore_index=ignore_index)

        loss, grads = jax.value_and_grad(loss_fn)(train, toks)
        grads["embed"] = jax.lax.psum(grads["embed"], pp_ax)
        grads = jax.lax.pmean(grads, dp_ax)
        loss = jax.lax.pmean(loss, dp_ax)

        if clip_norm is not None:
            sq_rep = jnp.float32(0)
            for kk, gl in grads.items():
                if kk == "stages":
                    continue
                sq_rep += sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                              for l in jax.tree_util.tree_leaves(gl))
            sq_st = sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                        for l in jax.tree_util.tree_leaves(
                            grads["stages"]))
            norm = jnp.sqrt(sq_rep + jax.lax.psum(
                jax.lax.psum(sq_st, tp_ax), pp_ax))
            scale = jnp.asarray(clip_norm, jnp.float32) / jnp.maximum(
                norm, clip_norm)
            grads = jax.tree_util.tree_map(
                lambda g_: (g_.astype(jnp.float32) * scale).astype(
                    g_.dtype), grads)

        m, v = o
        new_train, m2, v2 = adamw_step(train, grads, m, v, i, lr=lr,
                                       weight_decay=weight_decay)
        return {**new_train, **static}, (m2, v2), loss

    def spec_of(path, leaf):
        if getattr(path[0], "key", None) != "stages":
            return P()
        name = getattr(path[-1], "key", None)
        if name in _TP_COL:
            return P(pp_ax, None, None, tp_ax)
        if name in _TP_ROW:
            return P(pp_ax, None, tp_ax, None)
        return P(pp_ax)

    pspec = jax.tree_util.tree_map_with_path(spec_of, params)
    tspec = {k: v for k, v in pspec.items() if k not in _STATIC_KEYS}
    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(pspec, (tspec, tspec), P(dp_ax), P()),
        out_specs=(pspec, (tspec, tspec), P()),
        check_vma=False)  # Pallas calls don't carry vma metadata yet
    return mapped(params, opt_state, tokens, jnp.asarray(step, jnp.int32))


# -- serving: flash prefill + KV-cached decode (GQA caches: Hkv heads) --------

def init_llama_cache(params: Dict, B: int, max_len: int, *, n_heads: int,
                     n_kv_heads: int):
    n_layers = len(params["blocks"])
    hd = params["embed"].shape[1] // n_heads
    return jnp.zeros((n_layers, 2, B * n_kv_heads, max_len, hd),
                     params["embed"].dtype)


def llama_prefill(params: Dict, prompt: jax.Array, cache: jax.Array, *,
                  n_heads: int, n_kv_heads: int, window=None):
    """One causal GQA flash forward over the prompt; writes K/V into the
    cache. Returns (last-position logits, cache)."""
    from ..ops.attention import attention_gqa

    H, Hkv = n_heads, n_kv_heads
    x = params["embed"][prompt]
    B, S, D = x.shape
    hd = D // H
    cos, sin = params["rope_cos"], params["rope_sin"]
    for li, blk in enumerate(params["blocks"]):
        h = rms_norm(x, blk["rms1"])
        q, k, v = _qkv(blk, h, B, S, H, Hkv, hd, cos, sin)
        cache = cache.at[li, 0, :, :S, :].set(k.reshape(B * Hkv, S, hd))
        cache = cache.at[li, 1, :, :S, :].set(v.reshape(B * Hkv, S, hd))
        o = attention_gqa(q, k, v, causal=True, window=window)
        o = o.transpose(0, 2, 1, 3).reshape(B * S, H * hd)
        x = x + linear(o, blk["wo"], None).reshape(B, S, D)
        h = rms_norm(x, blk["rms2"])
        h2 = h.reshape(B * S, D)
        f = jax.nn.silu(linear(h2, blk["w_gate"], None)) * linear(
            h2, blk["w_up"], None)
        x = x + linear(f, blk["w_down"], None).reshape(B, S, D)
    x = rms_norm(x[:, -1, :], params["rms_f"])
    logits = gemm_ad(x.reshape(B, D), params["unembed"], None, False, False)
    return logits, cache


def llama_decode_step(params: Dict, cache: jax.Array, token: jax.Array,
                      pos: jax.Array, *, n_heads: int, n_kv_heads: int,
                      window=None):
    """One incremental decode step (GQA masked matvec over the cache)."""
    H, Hkv = n_heads, n_kv_heads
    grp = H // Hkv
    B = token.shape[0]
    D = params["embed"].shape[1]
    hd = D // H
    scale = 1.0 / math.sqrt(hd)
    cos, sin = params["rope_cos"], params["rope_sin"]
    x = params["embed"][token][:, None, :]

    for li, blk in enumerate(params["blocks"]):
        h = rms_norm(x, blk["rms1"])
        q, k, v = _qkv(blk, h, B, 1, H, Hkv, hd, cos, sin, pos=pos)
        kc = jax.lax.dynamic_update_slice(
            cache[li, 0], k.reshape(B * Hkv, 1, hd), (0, pos, 0))
        vc = jax.lax.dynamic_update_slice(
            cache[li, 1], v.reshape(B * Hkv, 1, hd), (0, pos, 0))
        cache = cache.at[li, 0].set(kc).at[li, 1].set(vc)
        # (B, H, 1, hd) q against (B*Hkv, L, hd) caches: expand per group
        qf = q.reshape(B, Hkv, grp, hd)
        kcf = kc.reshape(B, Hkv, -1, hd)
        vcf = vc.reshape(B, Hkv, -1, hd)
        s = jnp.einsum("bhgd,bhkd->bhgk", qf, kcf,
                       precision=jax.lax.Precision.HIGHEST) * scale
        kpos = jnp.arange(kcf.shape[2])[None, None, None, :]
        s = jnp.where(kpos <= pos, s, -jnp.inf)
        if window is not None:
            s = jnp.where(kpos > pos - window, s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhgk,bhkd->bhgd", p, vcf,
                       precision=jax.lax.Precision.HIGHEST)
        o = o.reshape(B, H * hd)
        x = x + linear(o, blk["wo"], None).reshape(B, 1, D)
        h = rms_norm(x, blk["rms2"])
        h2 = h.reshape(B, D)
        f = jax.nn.silu(linear(h2, blk["w_gate"], None)) * linear(
            h2, blk["w_up"], None)
        x = x + linear(f, blk["w_down"], None).reshape(B, 1, D)
    x = rms_norm(x[:, 0, :], params["rms_f"])
    logits = gemm_ad(x, params["unembed"], None, False, False)
    return logits, cache


def llama_window_step(params: Dict, cache: jax.Array, tokens: jax.Array,
                      pos: jax.Array, *, n_heads: int, n_kv_heads: int,
                      window=None):
    """W-query GQA decode step: process a WINDOW of W tokens at positions
    [pos, pos+W), writing their K/V into the cache and attending each
    query causally over cache[0 .. pos+i] (optionally sliding-window
    masked). The verification forward of speculative decoding
    (W = gamma+1); ``llama_decode_step`` is the W=1 case.

    tokens (B, W) int32 -> (logits (B, W, vocab), cache)."""
    H, Hkv = n_heads, n_kv_heads
    grp = H // Hkv
    B, W = tokens.shape
    D = params["embed"].shape[1]
    hd = D // H
    scale = 1.0 / math.sqrt(hd)
    cos, sin = params["rope_cos"], params["rope_sin"]
    x = params["embed"][tokens]  # (B, W, D)

    for li, blk in enumerate(params["blocks"]):
        h = rms_norm(x, blk["rms1"])
        q, k, v = _qkv(blk, h, B, W, H, Hkv, hd, cos, sin, pos=pos)
        kc = jax.lax.dynamic_update_slice(
            cache[li, 0], k.reshape(B * Hkv, W, hd), (0, pos, 0))
        vc = jax.lax.dynamic_update_slice(
            cache[li, 1], v.reshape(B * Hkv, W, hd), (0, pos, 0))
        cache = cache.at[li, 0].set(kc).at[li, 1].set(vc)
        qf = q.reshape(B, Hkv, grp, W, hd)  # head h = kvh*grp + g
        kcf = kc.reshape(B, Hkv, -1, hd)
        vcf = vc.reshape(B, Hkv, -1, hd)
        s = jnp.einsum("bhgqd,bhkd->bhgqk", qf, kcf,
                       precision=jax.lax.Precision.HIGHEST) * scale
        kpos = jnp.arange(kcf.shape[2])[None, None, None, None, :]
        qpos = (pos + jnp.arange(W))[None, None, None, :, None]
        s = jnp.where(kpos <= qpos, s, -jnp.inf)
        if window is not None:
            s = jnp.where(kpos > qpos - window, s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhgqk,bhkd->bhgqd", p, vcf,
                       precision=jax.lax.Precision.HIGHEST)
        o = o.transpose(0, 3, 1, 2, 4).reshape(B * W, H * hd)
        x = x + linear(o, blk["wo"], None).reshape(B, W, D)
        h = rms_norm(x, blk["rms2"])
        h2 = h.reshape(B * W, D)
        f = jax.nn.silu(linear(h2, blk["w_gate"], None)) * linear(
            h2, blk["w_up"], None)
        x = x + linear(f, blk["w_down"], None).reshape(B, W, D)
    x = rms_norm(x, params["rms_f"])
    logits = gemm_ad(x.reshape(B * W, D), params["unembed"], None,
                     False, False)
    return logits.reshape(B, W, -1), cache


def _llama_spec_adapter(params: Dict, n_heads: int, n_kv_heads: int,
                        window=None) -> Dict:
    """models/speculative.py adapter for this family (GQA caches)."""
    return dict(
        vocab=params["unembed"].shape[1],
        init_cache=lambda B, cap: init_llama_cache(
            params, B, cap, n_heads=n_heads, n_kv_heads=n_kv_heads),
        prefill=lambda prompt, cache: llama_prefill(
            params, prompt, cache, n_heads=n_heads, n_kv_heads=n_kv_heads,
            window=window),
        decode=lambda cache, tok, pos: llama_decode_step(
            params, cache, tok, pos, n_heads=n_heads,
            n_kv_heads=n_kv_heads, window=window),
        window=lambda cache, toks, pos: llama_window_step(
            params, cache, toks, pos, n_heads=n_heads,
            n_kv_heads=n_kv_heads, window=window),
    )


def llama_speculative_decode_greedy(target_params: Dict, draft_params: Dict,
                                    prompt: jax.Array, *, n_heads: int,
                                    n_kv_heads: int, draft_n_heads: int,
                                    draft_n_kv_heads: int,
                                    max_new_tokens: int, gamma: int = 4,
                                    window=None) -> jax.Array:
    """Greedy speculative decoding for the llama family: token-IDENTICAL
    to ``llama_generate(temperature=0)`` on the target, for any draft.
    ``window`` applies mistral-style sliding-window attention to BOTH
    models. Loop: models/speculative.py:speculative_generate."""
    from .speculative import speculative_generate

    return speculative_generate(
        _llama_spec_adapter(target_params, n_heads, n_kv_heads, window),
        _llama_spec_adapter(draft_params, draft_n_heads, draft_n_kv_heads,
                            window),
        prompt, max_new_tokens=max_new_tokens, gamma=gamma, greedy=True)


def llama_speculative_decode(target_params: Dict, draft_params: Dict,
                             prompt: jax.Array, key: jax.Array, *,
                             n_heads: int, n_kv_heads: int,
                             draft_n_heads: int, draft_n_kv_heads: int,
                             max_new_tokens: int, gamma: int = 4,
                             temperature: float = 1.0,
                             window=None) -> jax.Array:
    """Sampled (rejection-scheme, arXiv:2211.17192) speculative decoding
    for the llama family: every emitted token marginally EXACTLY
    temperature-sampled from the target alone, for any draft. See
    models/speculative.py + ops/sampling.py:speculative_accept."""
    from .speculative import speculative_generate

    return speculative_generate(
        _llama_spec_adapter(target_params, n_heads, n_kv_heads, window),
        _llama_spec_adapter(draft_params, draft_n_heads, draft_n_kv_heads,
                            window),
        prompt, key, max_new_tokens=max_new_tokens, gamma=gamma,
        temperature=temperature)


def llama_generate(params: Dict, prompt: jax.Array, key, *,
                   n_heads: int, n_kv_heads: int, max_new_tokens: int,
                   temperature: float = 0.0, top_k: int = 0,
                   top_p: float = 1.0, window=None) -> jax.Array:
    """Flash prefill + KV-cached generation (greedy at temperature 0)."""
    from ..ops.sampling import sample_logits

    B, S0 = prompt.shape
    total = S0 + max_new_tokens
    cache = init_llama_cache(params, B, total, n_heads=n_heads,
                             n_kv_heads=n_kv_heads)
    tokens = jnp.zeros((B, total), jnp.int32).at[:, :S0].set(prompt)

    logits, cache = llama_prefill(params, prompt, cache, n_heads=n_heads,
                                  n_kv_heads=n_kv_heads, window=window)
    tokens = tokens.at[:, S0].set(sample_logits(
        jax.random.fold_in(key, S0), logits, temperature=temperature,
        top_k=top_k, top_p=top_p))

    def step(i, carry):
        tokens, cache = carry
        tok = jax.lax.dynamic_index_in_dim(tokens, i, axis=1, keepdims=False)
        logits, cache = llama_decode_step(params, cache, tok, i,
                                          n_heads=n_heads,
                                          n_kv_heads=n_kv_heads,
                                          window=window)
        nxt = sample_logits(jax.random.fold_in(key, i + 1), logits,
                            temperature=temperature, top_k=top_k, top_p=top_p)
        tokens = jax.lax.dynamic_update_index_in_dim(tokens, nxt, i + 1,
                                                     axis=1)
        return tokens, cache

    tokens, _ = jax.lax.fori_loop(S0, total - 1, step, (tokens, cache))
    return tokens
