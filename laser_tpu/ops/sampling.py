"""Multinomial sampling.

Rebuild of the reference's random-sampling benchmarks
(benchmarks/random_sampling/bench_multinomial_samplers.nim,
fenwicktree.nim:30-40): CDF binary search and an F+tree (Fenwick) sampler
with weight updates for sampling without replacement. The TPU idiom replaces
per-sample tree walks with batched primitives:

  * with replacement  -> inverse-CDF: one cumsum + vectorized searchsorted
    (all samples in parallel on the VPU);
  * without replacement -> Gumbel top-k, which is *distributionally
    identical* to sequential weighted sampling without replacement
    (Efraimidis-Spirakis) but embarrassingly parallel.

A host-side C++ Fenwick-tree sampler (the literal F+tree analog, for
host-bound producers like data loaders) lives in csrc/ and is exposed via
laser_tpu.host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_multinomial(key: jax.Array, weights: jax.Array, num_samples: int,
                       *, replacement: bool = True) -> jax.Array:
    """Draw ``num_samples`` category indices ~ weights (unnormalized).

    weights: (vocab,) nonnegative. Returns (num_samples,) int32.
    """
    weights = jnp.asarray(weights)
    if weights.ndim != 1:
        raise ValueError("weights must be rank-1")
    if replacement:
        cdf = jnp.cumsum(weights.astype(jnp.float32))
        total = cdf[-1]
        u = jax.random.uniform(key, (num_samples,), jnp.float32) * total
        return jnp.searchsorted(cdf, u, side="right").astype(jnp.int32)
    # Gumbel top-k == weighted sampling without replacement.
    logw = jnp.where(weights > 0, jnp.log(weights.astype(jnp.float32)), -jnp.inf)
    g = jax.random.gumbel(key, weights.shape, jnp.float32)
    _, idx = jax.lax.top_k(logw + g, num_samples)
    return idx.astype(jnp.int32)


def sample_multinomial_batch(key: jax.Array, weights: jax.Array,
                             num_samples: int, *, replacement: bool = True
                             ) -> jax.Array:
    """Batched variant: weights (B, vocab) -> (B, num_samples)."""
    keys = jax.random.split(key, weights.shape[0])
    return jax.vmap(lambda k, w: sample_multinomial(
        k, w, num_samples, replacement=replacement))(keys, weights)


def sample_logits(key: jax.Array, logits: jax.Array, *,
                  temperature: float = 1.0,
                  top_k: int = 0, top_p: float = 1.0) -> jax.Array:
    """Serving-grade token sampling from (B, vocab) logits.

    Order of operations (the standard serving stack): temperature scale →
    top-k filter → nucleus (top-p) filter → Gumbel-max draw. temperature=0
    is greedy argmax. All static shapes, fully jittable (the filters mask
    rather than gather, so no data-dependent shapes). Returns (B,) int32.
    """
    logits = jnp.asarray(logits)
    if logits.ndim != 2:
        raise ValueError("sample_logits expects (B, vocab) logits")
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    x = logits.astype(jnp.float32) / jnp.float32(temperature)

    if top_k and top_k < x.shape[-1]:
        # mask everything below the k-th largest logit
        kth = jax.lax.top_k(x, top_k)[0][:, -1:]
        x = jnp.where(x >= kth, x, -jnp.inf)

    if top_p < 1.0:
        # nucleus: keep the smallest prefix of the sorted distribution with
        # cumulative probability >= top_p (the first token always survives)
        sx = jnp.sort(x, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sx, axis=-1)
        csum = jnp.cumsum(probs, axis=-1)
        keep = csum - probs < top_p  # strictly-before mass below the cut
        cutoff = jnp.min(jnp.where(keep, sx, jnp.inf), axis=-1, keepdims=True)
        x = jnp.where(x >= cutoff, x, -jnp.inf)

    g = jax.random.gumbel(key, x.shape, jnp.float32)
    return jnp.argmax(x + g, axis=-1).astype(jnp.int32)


def sample_logits_batch(seeds: jax.Array, positions: jax.Array,
                        logits: jax.Array, temperature: jax.Array,
                        top_k: jax.Array, top_p: jax.Array) -> jax.Array:
    """Per-row heterogeneous ``sample_logits`` for continuous batching.

    Every slot of a serving batch samples with ITS OWN parameters in one
    device call: seeds/positions (B,) int32 derive row b's PRNG key as
    ``fold_in(PRNGKey(seeds[b]), positions[b])`` (positions = the absolute
    token index, so a preempted-and-requeued request replays identically);
    temperature (B,) f32 (0 = greedy argmax); top_k (B,) int32 (0 = off);
    top_p (B,) f32 (1 = off). Row-exact to ``sample_logits`` with the same
    key and parameters (same filter order and masking math, same Gumbel
    draw). Returns (B,) int32.
    """
    logits = jnp.asarray(logits)
    B, V = logits.shape
    temperature = jnp.asarray(temperature, jnp.float32)
    top_k = jnp.asarray(top_k, jnp.int32)
    top_p = jnp.asarray(top_p, jnp.float32)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    # Runtime fast paths (lax.cond executes ONE branch): the all-greedy
    # batch — the dominant serving configuration — pays a single argmax,
    # and a filter-free sampling batch skips both (B, V) bitonic sorts.
    # The decode-burst scan inherits this: its per-step sampler cost was
    # the two sorts, not the Gumbel draw.
    k_on_any = jnp.any((top_k > 0) & (top_k < V))
    p_on_any = jnp.any(top_p < 1.0)

    def do_sample(_):
        x = logits.astype(jnp.float32) / jnp.maximum(
            temperature, 1e-8)[:, None]

        def do_filters(x):
            # top-k: mask below the k-th largest (sorted take ==
            # lax.top_k's kth)
            sx = jnp.sort(x, axis=-1)[:, ::-1]
            kth = jnp.take_along_axis(
                sx, jnp.clip(top_k - 1, 0, V - 1)[:, None], axis=-1)
            k_on = ((top_k > 0) & (top_k < V))[:, None]
            x = jnp.where(k_on & (x < kth), -jnp.inf, x)

            # nucleus, on the post-top-k distribution (sample_logits order)
            sx = jnp.sort(x, axis=-1)[:, ::-1]
            probs = jax.nn.softmax(sx, axis=-1)
            csum = jnp.cumsum(probs, axis=-1)
            keep = csum - probs < top_p[:, None]
            cutoff = jnp.min(jnp.where(keep, sx, jnp.inf), axis=-1,
                             keepdims=True)
            p_on = (top_p < 1.0)[:, None]
            return jnp.where(p_on & (x < cutoff), -jnp.inf, x)

        x = jax.lax.cond(k_on_any | p_on_any, do_filters, lambda x: x, x)

        def g_row(s, p):
            key = jax.random.fold_in(jax.random.PRNGKey(s), p)
            return jax.random.gumbel(key, (V,), jnp.float32)

        g = jax.vmap(g_row)(seeds, positions)
        sampled = jnp.argmax(x + g, axis=-1).astype(jnp.int32)
        return jnp.where(temperature <= 0.0, greedy, sampled)

    return jax.lax.cond(jnp.any(temperature > 0.0), do_sample,
                        lambda _: greedy, None)


def speculative_accept(key: jax.Array, p: jax.Array, q: jax.Array,
                       proposals: jax.Array):
    """Rejection-sampling acceptance for speculative decoding.

    The exact-distribution rule of arXiv:2211.17192 (Leviathan et al.,
    thm. 3.5 / app. A): given draft proposals x_i ~ q_i and the target's
    distributions p_i over the SAME positions, accept the longest prefix
    where u_i·q_i(x_i) < p_i(x_i) (u ~ U[0,1) i.i.d.), then emit one
    extra token — from the normalized residual max(p−q, 0) at the first
    rejection, or from p_gamma after a full accept. Every emitted token
    is marginally distributed EXACTLY as if sampled from the target
    alone, for ANY draft (certified statistically in
    tests/test_speculative.py).

    p (gamma+1, V) target probs, q (gamma, V) draft probs, proposals
    (gamma,) int32 sampled from q. Returns (n_accepted int32 in
    [0, gamma], next_token int32) — the emitted tokens are
    proposals[:n_accepted] + [next_token].
    """
    gamma = q.shape[0]
    ka, kr = jax.random.split(key)
    rows = jnp.arange(gamma)
    p_at = p[rows, proposals]
    q_at = q[rows, proposals]
    u = jax.random.uniform(ka, (gamma,), jnp.float32)
    acc = u * q_at < p_at  # u < p/q without the division (q_at may be ~0)
    n_acc = jnp.argmin(jnp.concatenate(
        [acc, jnp.array([False])])).astype(jnp.int32)

    safe = jnp.minimum(n_acc, gamma - 1)
    resid = jnp.maximum(p[safe] - q[safe], 0.0)
    rsum = jnp.sum(resid)
    # rsum == 0 can only happen numerically (p <= q everywhere yet a
    # rejection fired on a rounding edge); fall back to the target row
    resid = jnp.where(rsum > 0, resid / rsum, p[safe])
    dist = jnp.where(n_acc == gamma, p[gamma], resid)
    nxt = jax.random.categorical(kr, jnp.log(dist + 1e-38)).astype(jnp.int32)
    return n_acc, nxt
