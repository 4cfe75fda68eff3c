"""Batched sampling, rwkv-pip-compatible (JAX, fully on device).

Algorithm order mirrors the reference's serving sampler
(/root/reference/chirrup/utils/samplers.py:171-255, itself a batched reproduction of
the rwkv pip package's PIPELINE.sample_logits):

  1. temperature == 0  ->  temperature = 1, top_p = 0 (greedy mode)
  2. probs = softmax(logits)            (NO pre-temperature scaling)
  3. top-p by cutoff VALUE: the prob at the first position where the sorted cumsum
     reaches top_p; everything below that value is zeroed
  4. top-k by sorted position, scattered back to vocab order
  5. probs = probs ** (1/T)             (temperature applied AFTER filtering)
  6. renormalize + categorical draw

Sampling uses the Gumbel-max trick on log-probs, which is exactly a multinomial draw
but stays fused on device (no cumsum+uniform inversion).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=())
def sample_logits_rwkv_pip_compatible(logits, temperature, top_p, top_k, rng_key):
    """logits: (B, V) f32; temperature/top_p: (B,) f32; top_k: (B,) int32.

    Returns (B,) int32 sampled token ids.
    """
    B, V = logits.shape
    logits = logits.astype(jnp.float32)
    temperature = temperature.reshape(B, 1).astype(jnp.float32)
    top_p = top_p.reshape(B, 1).astype(jnp.float32)
    top_k = top_k.reshape(B, 1).astype(jnp.int32)

    # temp=0 => greedy via top_p=0 (reference :193-197)
    zero_temp = temperature == 0.0
    temperature = jnp.where(zero_temp, 1.0, temperature)
    top_p = jnp.where(zero_temp, 0.0, top_p)

    probs = jax.nn.softmax(logits, axis=-1)

    sorted_probs, sorted_idx = jax.lax.sort_key_val(
        -probs, jax.lax.broadcasted_iota(jnp.int32, (B, V), 1), dimension=-1)
    sorted_probs = -sorted_probs
    cum = jnp.cumsum(sorted_probs, axis=-1)

    # first position where cum >= top_p  (torch.searchsorted semantics, :211)
    cutoff_pos = jnp.sum((cum < top_p).astype(jnp.int32), axis=-1, keepdims=True)
    cutoff_pos = jnp.clip(cutoff_pos, 0, V - 1)
    cutoff_val = jnp.take_along_axis(sorted_probs, cutoff_pos, axis=-1)
    probs = jnp.where(probs < cutoff_val, 0.0, probs)

    # top-k in sorted space, scattered back to vocab order (:224-240)
    ranks = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
    eff_k = jnp.where(top_k > 0, top_k, V)
    outside_sorted = ranks >= eff_k
    outside = jnp.zeros((B, V), bool)
    outside = jnp.put_along_axis(outside, sorted_idx, outside_sorted, axis=-1,
                                 inplace=False)
    probs = jnp.where(outside, 0.0, probs)

    # post-filter temperature (:242-250), then categorical via Gumbel-max
    logp = jnp.where(probs > 0, jnp.log(probs) / temperature, -jnp.inf)
    gumbel = jax.random.gumbel(rng_key, (B, V), jnp.float32)
    return jnp.argmax(logp + gumbel, axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k_max", "approx", "fallback_rows"))
def sample_logits_rwkv_pip_fast(logits, temperature, top_p, top_k, rng_key,
                                row_mask=None, k_max: int = 1024,
                                approx: bool = False, fallback_rows: int = 8):
    """Fast path: identical distribution to sample_logits_rwkv_pip_compatible, but
    operating on the top-k_max probabilities instead of a full 65536-wide sort
    (a ~10x step-time win — the full sort dominated the serving step).

    Exactness: the top-p cutoff position is inside the top-k_max set whenever the
    top-k_max cumulative mass reaches top_p, and the top-k filter is a rank mask.
    Rows where either assumption fails (top_p ~ 1.0 on a flat distribution, or
    top_k > k_max) are exact-resampled PER ROW: flagged rows are gathered into
    fixed (R=fallback_rows, V) buffers and run through the exact full-sort
    sampler, ceil(n_flagged / R) passes in a while_loop — adversarial requests
    (e.g. top_p=1.0, high temp) cost R-row sorts proportional to THEIR count,
    never a whole-batch 65536-wide sort, so hostile streams cannot degrade the
    other requests' step beyond their own row work. Correctness never depends
    on the heuristic.
    """
    B, V = logits.shape
    k_max = min(k_max, V)
    logits = logits.astype(jnp.float32)
    temperature = temperature.reshape(B, 1).astype(jnp.float32)
    top_p = top_p.reshape(B, 1).astype(jnp.float32)
    top_k = top_k.reshape(B, 1).astype(jnp.int32)

    zero_temp = temperature == 0.0
    temperature_eff = jnp.where(zero_temp, 1.0, temperature)
    top_p_eff = jnp.where(zero_temp, 0.0, top_p)

    # candidates from LOGITS (monotonic with probs), probabilities computed
    # only for the k_max kept entries — the full (B, V) softmax materialization
    # this replaces was a measurable slice of the decode step
    lse = jax.scipy.special.logsumexp(logits, axis=-1, keepdims=True)
    if approx:
        # TPU's exact top_k lowers to a full sort; approx_max_k is the hardware
        # path (recall ~0.95 deep in the tail of the kept set — a <1e-3
        # perturbation of the sampled distribution). Greedy rows stay exact via
        # the argmax blend below.
        top_lg, top_idx = jax.lax.approx_max_k(logits, k_max)
        order = jnp.argsort(-top_lg, axis=-1)
        top_lg = jnp.take_along_axis(top_lg, order, axis=-1)
        top_idx = jnp.take_along_axis(top_idx, order, axis=-1)
    else:
        top_lg, top_idx = jax.lax.top_k(logits, k_max)  # sorted descending
    top_vals = jnp.exp(top_lg - lse)
    cum = jnp.cumsum(top_vals, axis=-1)

    covered = cum[:, -1:] >= top_p_eff            # cutoff falls inside top-k_max
    k_ok = top_k <= k_max
    need = ~covered | ~k_ok
    if row_mask is not None:
        # rows not actually being sampled (masked slots with garbage logits/params)
        # must not force the exact path
        need = need & row_mask.reshape(B, 1)
    need_row = need[:, 0]                          # (B,) bool
    n_need = jnp.sum(need_row.astype(jnp.int32))
    R = min(fallback_rows, B)

    # fast-path sample for every row (flagged rows get overwritten below)
    cutoff_pos = jnp.sum((cum < top_p_eff).astype(jnp.int32), axis=-1,
                         keepdims=True)
    cutoff_pos = jnp.clip(cutoff_pos, 0, k_max - 1)
    cutoff_val = jnp.take_along_axis(top_vals, cutoff_pos, axis=-1)
    vals = jnp.where(top_vals < cutoff_val, 0.0, top_vals)
    ranks = jax.lax.broadcasted_iota(jnp.int32, (B, k_max), 1)
    eff_k = jnp.where(top_k > 0, top_k, k_max)
    vals = jnp.where(ranks >= eff_k, 0.0, vals)
    logp = jnp.where(vals > 0, jnp.log(vals) / temperature_eff, -jnp.inf)
    gumbel = jax.random.gumbel(rng_key, (B, k_max), jnp.float32)
    choice = jnp.argmax(logp + gumbel, axis=-1)
    picked = jnp.take_along_axis(top_idx, choice[:, None], axis=-1)[:, 0]
    # temp=0 rows: exact argmax (immune to approx top-k recall)
    greedy = jnp.argmax(logits, axis=-1)
    fast_tokens = jnp.where(zero_temp[:, 0], greedy, picked).astype(jnp.int32)

    def fix_rows(_):
        # flagged rows first (stable sort keeps row order); process them in
        # fixed (R, V) windows — ceil(n_need / R) exact passes, never a
        # whole-batch sort. dynamic_slice clamps the final window's start, so
        # it may revisit rows: revisited flagged rows are simply re-drawn
        # (same exact distribution, fresh fold_in key), unflagged keep=False.
        order = jnp.argsort(~need_row, stable=True)

        def cond(carry):
            j, _ = carry
            return j * R < n_need

        def body(carry):
            j, toks = carry
            idx = jax.lax.dynamic_slice(order, (j * R,), (R,))
            sub_key = jax.random.fold_in(rng_key, j + 1)
            sub = sample_logits_rwkv_pip_compatible(
                logits[idx], temperature[idx, 0], top_p[idx, 0],
                top_k[idx, 0], sub_key)
            keep = need_row[idx]
            toks = toks.at[idx].set(jnp.where(keep, sub, toks[idx]))
            return j + 1, toks

        return jax.lax.while_loop(cond, body, (jnp.int32(0), fast_tokens))[1]

    return jax.lax.cond(n_need > 0, fix_rows, lambda _: fast_tokens, None)


def apply_penalties(logits, occurrence, presence_vec, frequency_penalty):
    """logits -= presence_vec + occurrence * frequency_penalty
    (reference worker.py:724-728). Shapes: logits/occurrence/presence (B, V),
    frequency_penalty (B,)."""
    return logits - (presence_vec + occurrence * frequency_penalty[:, None])


def record_sampled_token(occurrence, presence_vec, tokens, presence_penalty,
                         update_mask):
    """Record a freshly sampled token into the penalty state
    (reference worker.py:527-547):

      occurrence[b, tokens[b]] += 1   where update_mask (no-penalty tokens excluded)
      presence_vec[b, tokens[b]] = presence_penalty[b]  where update_mask

    NOTE the reference ordering: occurrence decays at forward time (before the logit
    subtraction, worker.py:724) and the sampled token is added afterwards — so a new
    token is decayed once before it first penalizes. Callers must do
    `occurrence * penalty_decay` themselves before apply_penalties.

    Shapes: occurrence/presence_vec (B, V); tokens (B,) int32; presence_penalty (B,);
    update_mask (B,) bool.
    """
    B, V = occurrence.shape
    onehot = jax.nn.one_hot(tokens, V, dtype=occurrence.dtype) \
        * update_mask[:, None].astype(occurrence.dtype)
    occurrence = occurrence + onehot
    presence_vec = jnp.where(onehot > 0, presence_penalty[:, None], presence_vec)
    return occurrence, presence_vec
