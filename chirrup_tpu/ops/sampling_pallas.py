"""Fused penalty + sampling-candidate kernel for the decode tail.

The reference applies penalties and samples as a chain of separate GPU ops
(chirrup/worker.py:719-740 + utils/samplers.py): decay the occurrence
histogram, subtract presence/frequency penalties, softmax, top-k/top-p,
draw, then scatter the sampled token back into the penalty state. On TPU
that chain cost ~2.2 ms/step at B=384 (profiled): every op is a full
(B, V=65536) f32 HBM pass, and the approx-top-k lowering adds a (B, 4096)
sort plus two slow gathers.

This kernel collapses the (B, V)-sized work into ONE pass over
(logits, occurrence, presence):

  occ2  = (occ + onehot(last_tok)) * decay      [deferred record, see below]
  pres2 = set(last_tok -> presence_penalty)
  adj   = logits - pres2 - occ2 * freq
  + online logsumexp(adj) across tiles
  + per-CHUNK (128-lane) maxima of adj -> the top-k candidate set
  + occ2/pres2 written back in place (buffer-aliased)

Deferred record: the reference records the token sampled at step t into the
penalty state at the END of step t, then decays at the START of step t+1
(worker.py:527-547, 723-728). Applying `(occ + onehot) * decay` at step t+1
with `last_tok` = the device-resident previous sample is bit-identical —
rows only decay on decode steps in both schemes, so the (record, decay)
sequence each token observes is unchanged. Slots are reset/inserted with
last_tok = -1, which drops any pending record exactly when the reference
would have zeroed the histogram.

Candidates: the per-128-chunk maxima (V/128 = 512 buckets at the world
vocab) play approx_max_k's role (its TPU lowering uses 16-wide buckets, so
recall for deep candidates is somewhat lower here); the exact-coverage
guard in the sampler (cumulative candidate mass >= top_p, else a full-sort
exact resample of the flagged rows) is unchanged, so correctness never
depends on recall — greedy/argmax rows are exact by construction (a global
argmax IS the max of chunk maxima).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128  # candidate bucket width (one lane tile)


def penalty_tail_supported(V: int, W: int = 4096) -> bool:
    """The kernel needs the vocab to tile into W-lane grid steps of whole
    128-lane chunks. The serving vocab (65536) qualifies; tiny test vocabs
    fall back to the XLA path."""
    return V % W == 0 and W % CHUNK == 0 and V // CHUNK >= CHUNK


def _penalty_tail_kernel(logits_ref, occ_ref, pres_ref, decay_ref, freq_ref,
                         pp_ref, last_ref, upd_ref, dec_ref,
                         occ_out, pres_out, cval_ref, cidx_ref, lse_ref,
                         m_scr, s_scr, *, W, n_tiles):
    f32 = jnp.float32
    t = pl.program_id(0)
    B = logits_ref.shape[0]
    n_chunks = W // CHUNK

    decay = decay_ref[:].astype(f32)            # (B, 1)
    freq = freq_ref[:].astype(f32)
    pp = pp_ref[:].astype(f32)
    last = last_ref[:]                          # (B, 1) int32
    upd = upd_ref[:]                            # (B, 1) bool
    dec = dec_ref[:]                            # (B, 1) bool

    lane = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1) + t * W
    hit = (lane == last) & upd                  # (B, W)

    occ = occ_ref[:].astype(f32)
    pres = pres_ref[:].astype(f32)
    occ2 = jnp.where(dec, (occ + jnp.where(hit, 1.0, 0.0)) * decay, occ)
    pres2 = jnp.where(hit, pp, pres)
    occ_out[:] = occ2.astype(occ_out.dtype)
    pres_out[:] = pres2.astype(pres_out.dtype)

    adj = logits_ref[:].astype(f32) - pres2 - occ2 * freq

    # per-chunk maxima + first-argmax index (the candidate set). Outputs are
    # written TRANSPOSED as (n_chunks, B): a (B, n_chunks=32) block would
    # violate Mosaic's 128-lane rule for grid outputs, while (32, B) needs
    # only 8-sublane alignment on the chunk dim and keeps B as the full lane
    # dim (legal for any B).
    adj3 = adj.reshape(B, n_chunks, CHUNK)
    cmax = jnp.max(adj3, axis=-1)               # (B, n_chunks)
    in_lane = jax.lax.broadcasted_iota(jnp.int32, (B, n_chunks, CHUNK), 2)
    cidx_local = jnp.min(
        jnp.where(adj3 == cmax[:, :, None], in_lane, CHUNK), axis=-1)
    cval_ref[:] = cmax.T
    cidx_ref[:] = (t * W
                   + jax.lax.broadcasted_iota(jnp.int32, (B, n_chunks), 1)
                   * CHUNK + cidx_local).T

    # online logsumexp across tiles (scratch persists over the grid)
    @pl.when(t == 0)
    def _init():
        m_scr[:] = jnp.full((B, 1), -jnp.inf, f32)
        s_scr[:] = jnp.zeros((B, 1), f32)

    tile_m = jnp.max(cmax, axis=-1, keepdims=True)      # (B, 1)
    m_old = m_scr[:]
    m_new = jnp.maximum(m_old, tile_m)
    # exp(-inf - -inf) would be NaN; m_new >= tile elements keeps args <= 0
    neg_inf = jnp.float32(-jnp.inf)
    scale = jnp.where((m_old == neg_inf) & (m_new == neg_inf), 0.0,
                      jnp.exp(m_old - m_new))
    s_scr[:] = s_scr[:] * scale + jnp.sum(
        jnp.exp(adj - m_new[:, :1]), axis=-1, keepdims=True)
    m_scr[:] = m_new

    @pl.when(t == n_tiles - 1)
    def _fin():
        lse_ref[:] = m_scr[:] + jnp.log(s_scr[:])


@functools.partial(jax.jit, static_argnames=("W", "interpret"))
def penalty_tail(logits, occurrence, presence_vec, penalty_decay,
                 frequency_penalty, presence_penalty, last_tok, upd_mask,
                 decode_mask, *, W: int = 4096, interpret: bool = False):
    """One fused pass over the (B, V) decode tail.

    logits: (B, V) f32 pre-penalty. occurrence/presence_vec: (B, V) f32
    penalty state (returned updated; buffers aliased in place).
    penalty_decay/frequency_penalty/presence_penalty: (B,) f32.
    last_tok: (B,) int32 previous sampled token (-1 = none).
    upd_mask: (B,) bool — record last_tok (decode row, sampled before, not a
    no-penalty token). decode_mask: (B,) bool — rows whose histogram decays.

    Returns (occ2, pres2, chunk_val (B, V/128) f32, chunk_idx (B, V/128)
    int32, lse (B, 1) f32).
    """
    B, V = logits.shape
    assert penalty_tail_supported(V, W), (B, V, W)
    n_tiles = V // W
    n_chunks_total = V // CHUNK

    def vtile(width):
        return pl.BlockSpec((B, width), lambda t: (0, t))

    def rows():
        return pl.BlockSpec((B, 1), lambda t: (0, 0))

    kernel = functools.partial(_penalty_tail_kernel, W=W, n_tiles=n_tiles)
    f32 = jnp.float32
    occ2, pres2, cval, cidx, lse = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            vtile(W), vtile(W), vtile(W),           # logits, occ, pres
            rows(), rows(), rows(),                 # decay, freq, pp
            rows(), rows(), rows(),                 # last, upd, dec
        ],
        out_specs=[
            vtile(W), vtile(W),                     # occ2, pres2
            pl.BlockSpec((W // CHUNK, B), lambda t: (t, 0)),   # chunk vals^T
            pl.BlockSpec((W // CHUNK, B), lambda t: (t, 0)),   # chunk idx^T
            pl.BlockSpec((B, 1), lambda t: (0, 0)),            # lse
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, V), occurrence.dtype),
            jax.ShapeDtypeStruct((B, V), presence_vec.dtype),
            jax.ShapeDtypeStruct((n_chunks_total, B), f32),
            jax.ShapeDtypeStruct((n_chunks_total, B), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), f32),
        ],
        input_output_aliases={1: 0, 2: 1},          # occ, pres in place
        scratch_shapes=[pltpu.VMEM((B, 1), f32), pltpu.VMEM((B, 1), f32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=8 * B * V,
            bytes_accessed=3 * B * V * 4 + 2 * B * V * 4,
            transcendentals=B * V,
        ),
        interpret=interpret,
    )(logits, occurrence, presence_vec,
      penalty_decay.reshape(B, 1).astype(f32),
      frequency_penalty.reshape(B, 1).astype(f32),
      presence_penalty.reshape(B, 1).astype(f32),
      jnp.asarray(last_tok, jnp.int32).reshape(B, 1),
      jnp.asarray(upd_mask, bool).reshape(B, 1),
      jnp.asarray(decode_mask, bool).reshape(B, 1))
    return occ2, pres2, cval.T, cidx.T, lse


def penalty_tail_reference(logits, occurrence, presence_vec, penalty_decay,
                           frequency_penalty, presence_penalty, last_tok,
                           upd_mask, decode_mask):
    """Plain-XLA oracle for penalty_tail (tests + the non-pallas serving
    path composes the same math from record_sampled_token/apply_penalties)."""
    B, V = logits.shape
    f32 = jnp.float32
    lane = jnp.arange(V, dtype=jnp.int32)[None, :]
    hit = (lane == last_tok.reshape(B, 1)) & upd_mask.reshape(B, 1)
    occ = occurrence.astype(f32)
    occ2 = jnp.where(decode_mask.reshape(B, 1),
                     (occ + jnp.where(hit, 1.0, 0.0))
                     * penalty_decay.reshape(B, 1), occ)
    pres2 = jnp.where(hit, presence_penalty.reshape(B, 1),
                      presence_vec.astype(f32))
    adj = logits.astype(f32) - pres2 - occ2 * frequency_penalty.reshape(B, 1)
    n_chunks = V // CHUNK
    adj3 = adj.reshape(B, n_chunks, CHUNK)
    cval = jnp.max(adj3, axis=-1)
    cidx = (jnp.argmax(adj3, axis=-1).astype(jnp.int32)
            + jnp.arange(n_chunks, dtype=jnp.int32)[None, :] * CHUNK)
    lse = jax.scipy.special.logsumexp(adj, axis=-1, keepdims=True)
    return occ2, pres2, cval, cidx, lse


@functools.partial(jax.jit, static_argnames=("k_max", "fallback_rows"))
def sample_from_chunks(chunk_val, chunk_idx, lse, temperature, top_p, top_k,
                       rng_key, adj_args, row_mask=None, k_max: int = 128,
                       fallback_rows: int = 8):
    """rwkv-pip-compatible draw from the penalty_tail candidate set.

    Same algorithm/order as ops.sampling.sample_logits_rwkv_pip_fast, with
    candidates = the per-chunk maxima (already penalized) instead of
    approx_max_k over a dense adj. adj_args = (logits, pres2, occ2, freq):
    the exact fallback recomputes the penalized rows it needs INSIDE the
    cond branch (gathered R rows at a time), so the dense (B, V) adjusted
    logits are never materialized on the fast path.
    """
    logits_raw, pres2, occ2, freq = adj_args
    from chirrup_tpu.ops.sampling import sample_logits_rwkv_pip_compatible

    B, NC = chunk_val.shape
    k_max = min(k_max, NC)
    temperature = temperature.reshape(B, 1).astype(jnp.float32)
    top_p = top_p.reshape(B, 1).astype(jnp.float32)
    top_k = top_k.reshape(B, 1).astype(jnp.int32)

    zero_temp = temperature == 0.0
    temperature_eff = jnp.where(zero_temp, 1.0, temperature)
    top_p_eff = jnp.where(zero_temp, 0.0, top_p)

    # variadic sort carries the token ids WITH the values — the former
    # top_k + take_along_axis gather of (B, k_max) ids was a scalar-ish
    # 49k-element gather measured at 0.5 ms/step (B=384 xplane profile);
    # stable ascending sort of -val == top_k's ties-to-lower-index order
    sorted_neg, sorted_idx = jax.lax.sort(
        (-chunk_val, chunk_idx), dimension=-1, num_keys=1, is_stable=True)
    top_lg = -sorted_neg[:, :k_max]
    top_idx = sorted_idx[:, :k_max]
    top_vals = jnp.exp(top_lg - lse)
    cum = jnp.cumsum(top_vals, axis=-1)

    covered = cum[:, -1:] >= top_p_eff
    k_ok = top_k <= k_max
    need = ~covered | ~k_ok
    if row_mask is not None:
        need = need & row_mask.reshape(B, 1)
    need_row = need[:, 0]
    n_need = jnp.sum(need_row.astype(jnp.int32))
    R = min(fallback_rows, B)

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
    # temp=0 greedy: global argmax == max of chunk maxima — EXACT
    gchunk = jnp.argmax(chunk_val, axis=-1)
    greedy = jnp.take_along_axis(chunk_idx, gchunk[:, None], axis=-1)[:, 0]
    fast_tokens = jnp.where(zero_temp[:, 0], greedy, picked).astype(jnp.int32)

    def fix_rows(_):
        order = jnp.argsort(~need_row, stable=True)

        def cond(carry):
            j, _ = carry
            return j * R < n_need

        def body(carry):
            j, toks = carry
            idx = jax.lax.dynamic_slice(order, (j * R,), (R,))
            sub_key = jax.random.fold_in(rng_key, j + 1)
            # penalized rows recomputed HERE (R rows): occ2/pres2 are the
            # post-decay/post-record state, so this matches the kernel's adj
            adj_rows = (logits_raw[idx].astype(jnp.float32) - pres2[idx]
                        - occ2[idx] * freq[idx].reshape(R, 1))
            sub = sample_logits_rwkv_pip_compatible(
                adj_rows, temperature[idx, 0], top_p[idx, 0],
                top_k[idx, 0], sub_key)
            keep = need_row[idx]
            toks = toks.at[idx].set(jnp.where(keep, sub, toks[idx]))
            return j + 1, toks

        return jax.lax.while_loop(cond, body, (jnp.int32(0), fast_tokens))[1]

    return jax.lax.cond(n_need > 0, fix_rows, lambda _: fast_tokens, None)
