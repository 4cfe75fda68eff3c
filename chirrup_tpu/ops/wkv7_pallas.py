"""Pallas TPU kernel for the WKV7 recurrent state update.

Replaces the reference's fused CUDA kernel (Albatross/cuda/rwkv7_state_fwd_fp16.cu:
26-97, one thread-block per (batch, head), state in registers across the T loop) with
a TPU-native design:

- grid over batch TILES: each program owns Bt requests' full per-layer state as a
  (Bt, N, H*N) VMEM tile carried in fp32 across a fori_loop over the token chunk, so
  HBM sees exactly one read + one write of the state per chunk (the hot-loop
  bandwidth floor). Tiling Bt requests per program (vs one) keeps per-program
  dispatch overhead amortized and feeds the MXU (Bt*N)-row dots;
- the per-head segment reductions sa_i = sum_j a_j S_ij and y_i = sum_j r_j S_ij run
  on the MXU as one (N, H*N) x (H*N, H) matmul each against a constant 0/1 segment
  matrix; the per-head broadcasts (v_i, sa_i over a head's 64 lanes) are the matching
  (N, H) x (H, H*N) matmuls;
- v and y use an "i-on-sublane" (N, H) per-token layout so no in-kernel transposes
  are needed; the host-side wrapper does the cheap (T, H, N) <-> (T, N, H) transposes
  in XLA;
- the fp16 dither (rotator1, cuda kernel :20-23) is computed per token from the
  scalar-prefetched elapsed counter, matching reference semantics bit-for-bit in fp32;
- ragged chunks: a per-request `length` masks the state update and zeroes y beyond
  the valid tokens, so one fixed-shape program serves any mix of prefill progress
  (the reference instead re-batches to the min remaining length, rwkv7.py:263-280).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chirrup_tpu.ops.wkv7 import (HEAD_SIZE, _DITHER_MULT, _DITHER_SCALE,
                                   _EXP_NEG_HALF)

_N = HEAD_SIZE


def _dot32(x, y, precision=jax.lax.Precision.HIGHEST):
    """f32 matmul with f32 accumulation. TPU MXU (and its interpret-mode emulation)
    rounds f32 dot INPUTS to bf16 at default precision; HIGHEST runs multi-pass
    full-f32. Even the default exceeds the reference kernel's fp16 accumulation
    (cuda kernel :65-81), so serving may trade passes for speed."""
    return jnp.dot(x, y, preferred_element_type=jnp.float32, precision=precision)


def _seg_matrices(HN, H):
    """Constant 0/1 per-head segment matrices, built on the fly in-kernel
    (VPU iota compares): seg (HN, H) reduces j within a head; its transpose
    broadcasts a per-head value across the head's lanes."""
    lane_head = jax.lax.broadcasted_iota(jnp.int32, (HN, H), 0) // _N
    head_id = jax.lax.broadcasted_iota(jnp.int32, (HN, H), 1)
    seg = (lane_head == head_id).astype(jnp.float32)
    return seg, seg.T


def _parse_precision(precision: str, state_dtype):
    """precision string -> (lax dot precision, compute-in-state-dtype flag).

    "bf16" keeps the state tile in its stored bf16 dtype through the
    elementwise update (the VPU runs packed bf16 at 2x f32 throughput and the
    kernel is VPU-bound — docs/PERF.md); the recurrence then uses the DELTA
    form `S += S*d + v k^T + sa b^T` with d = decay-1+dither, exactly the
    reference fp16 kernel's scheme (cuda/rwkv7_state_fwd_fp16.cu:78: s_ij +=
    s_ij*w + ...) — multiplying by d1~1.0 directly in bf16 would quantize
    slow decays to ULP(1.0)=2^-8 steps, the delta form keeps rounding
    relative to the (small) per-step change."""
    if precision == "highest":
        return jax.lax.Precision.HIGHEST, False
    if precision == "bf16":
        return (jax.lax.Precision.DEFAULT,
                jnp.dtype(state_dtype) == jnp.bfloat16)
    return jax.lax.Precision.DEFAULT, False


def _decay_row(w_row, step_idx, use_dither):
    """Raw decay logits -> in-kernel multiplier `decay - 1 (+ fp16 dither)`.
    step_idx: (Bt, 1) int32 total-tokens counter (reference rotator1,
    cuda/rwkv7_state_fwd_fp16.cu:20-23, 59)."""
    d = jnp.exp(-_EXP_NEG_HALF * jax.nn.sigmoid(w_row)) - 1.0
    if use_dither:
        u = jnp.uint32(_DITHER_MULT) * step_idx.astype(jnp.uint32)
        d = d + (jax.lax.bitcast_convert_type(u, jnp.int32)
                 .astype(jnp.float32) * _DITHER_SCALE)[:, :, None]
    return d


def _token_update_pre(S, d1, r_row, k_row, a_row, b_row, v_nh, rk, rb,
                      seg, segT, precision, bf16_state=False):
    """_token_update with the tiny per-head row reductions (rk = <r,k>_head,
    rb = <r,b>_head, both (Bt, 1, H)) PRECOMPUTED — the fused chunk kernels
    batch them over an 8-token group in one wide dot, so the serialized
    per-token work shrinks to the three S-sized dots of the recurrence."""
    Bt, N, HN = S.shape
    d1r = d1 * r_row
    if bf16_state:
        cd = S.dtype
        sa_nh = _dot32((S * a_row.astype(cd)).reshape(Bt * N, HN),
                       seg.astype(cd), precision).reshape(Bt, N, -1)
        y1 = _dot32((S * d1r.astype(cd)).reshape(Bt * N, HN),
                    seg.astype(cd), precision).reshape(Bt, N, -1)
        BC = _dot32(
            jnp.concatenate([v_nh.astype(cd).reshape(Bt * N, -1),
                             sa_nh.astype(cd).reshape(Bt * N, -1)], axis=0),
            segT.astype(cd), precision).astype(cd)
        v_exp = BC[:Bt * N].reshape(Bt, N, HN)
        sa_exp = BC[Bt * N:].reshape(Bt, N, HN)
        d = (d1 - 1.0).astype(cd)
        S_new = S + (S * d + v_exp * k_row.astype(cd)
                     + sa_exp * b_row.astype(cd))
    else:
        sa_nh = _dot32((S * a_row).reshape(Bt * N, HN), seg, precision) \
            .reshape(Bt, N, -1)
        y1 = _dot32((S * d1r).reshape(Bt * N, HN), seg, precision) \
            .reshape(Bt, N, -1)
        BC = _dot32(jnp.concatenate([v_nh.reshape(Bt * N, -1),
                                     sa_nh.reshape(Bt * N, -1)], axis=0),
                    segT, precision)
        v_exp = BC[:Bt * N].reshape(Bt, N, HN)
        sa_exp = BC[Bt * N:].reshape(Bt, N, HN)
        S_new = S * d1 + v_exp * k_row + sa_exp * b_row
    y = y1 + v_nh * rk + sa_nh * rb
    return S_new, y


def _token_update(S, d1, r_row, k_row, a_row, b_row, v_nh, seg, segT,
                  precision, extra_rows=(), bf16_state=False):
    """One token of the WKV-7 recurrence on a (Bt, N, HN) f32 state tile.

    2-dot algebraic form (exact, ~6% faster than the naive 4-dot form): with
    d1 = 1 + decay and S_new = S*d1 + v k^T + sa b^T,
        y_i = sum_j S_new_ij r_j
            = sum_j S_ij d1_j r_j + v_i <k, r>_head + sa_i <b, r>_head
    so both per-head reductions (over S*a and S*(d1*r), plus the tiny
    <k,r>/<b,r> rows and any `extra_rows`) row-stack into ONE MXU dot against
    `seg`, and both per-head broadcasts (v, sa) into one dot against `segT`.

    Returns (S_new, y_nh, extras): y in (Bt, N, H) i-on-sublane layout, extras
    the (Bt, 1, H) per-head reductions of each extra (Bt, HN) row.

    Dot layout: the two big per-head reductions (over S*a and S*(d1*r)) run
    as SEPARATE dots rather than one concatenated dot — concatenating the two
    (Bt*N, HN) operands materialized both as copies (two extra full-state VPU
    passes per token; the kernel is VPU-bound). The tiny (Bt, HN) rows still
    share one dot. The per-head broadcasts (v, sa) keep their shared dot:
    their operands are (Bt, N, H) — 64x smaller, the copies are noise.

    bf16_state: keep the state tile in its stored bf16 dtype through every
    full-state elementwise pass (VPU packed bf16 = 2x f32 throughput; the
    kernel is VPU-bound) and apply the update in DELTA form
    `S += S*d + v k^T + sa b^T` with d = d1-1 — the reference fp16 kernel's
    own scheme (see _parse_precision). Row-sized math (d1, products with r)
    stays f32; only state-tile passes change dtype. At DEFAULT dot precision
    the MXU rounds f32 inputs to bf16 anyway, so the dots see essentially the
    same operands either way."""
    # NOTE: the op ORDER here (big S dots, then the tiny rows dot, then the
    # broadcast dot) is measured-load-bearing: hoisting the rows dot in
    # front of the S dots cost ~2% of decode throughput at B=384 (Mosaic
    # schedules the tiny dot into the big dots' pipeline gaps only in this
    # order). _token_update_pre intentionally duplicates the S-dot body for
    # the group-batched chunk path, which precomputes the rows dot per
    # 8-token group.
    Bt, N, HN = S.shape
    d1r = d1 * r_row
    if bf16_state:
        cd = S.dtype
        sa_nh = _dot32((S * a_row.astype(cd)).reshape(Bt * N, HN),
                       seg.astype(cd), precision).reshape(Bt, N, -1)
        y1 = _dot32((S * d1r.astype(cd)).reshape(Bt * N, HN),
                    seg.astype(cd), precision).reshape(Bt, N, -1)
    else:
        sa_nh = _dot32((S * a_row).reshape(Bt * N, HN), seg, precision) \
            .reshape(Bt, N, -1)
        y1 = _dot32((S * d1r).reshape(Bt * N, HN), seg, precision) \
            .reshape(Bt, N, -1)
    rows = jnp.concatenate([
        (r_row * k_row).reshape(Bt, HN),
        (r_row * b_row).reshape(Bt, HN),
        *[e.reshape(Bt, HN) for e in extra_rows]], axis=0)
    R = _dot32(rows, seg, precision)
    rk = R[:Bt].reshape(Bt, 1, -1)
    rb = R[Bt:2 * Bt].reshape(Bt, 1, -1)
    extras = tuple(R[(2 + i) * Bt:(3 + i) * Bt].reshape(Bt, 1, -1)
                   for i in range(len(extra_rows)))
    if bf16_state:
        cd = S.dtype
        # Mosaic requires 32-bit matmul accumulators; cast the f32 result to
        # bf16 immediately (fuses into the matmul's output stage) so the
        # state-sized delta math below runs at packed-bf16 VPU rate
        BC = _dot32(
            jnp.concatenate([v_nh.astype(cd).reshape(Bt * N, -1),
                             sa_nh.astype(cd).reshape(Bt * N, -1)], axis=0),
            segT.astype(cd), precision).astype(cd)
        v_exp = BC[:Bt * N].reshape(Bt, N, HN)
        sa_exp = BC[Bt * N:].reshape(Bt, N, HN)
        d = (d1 - 1.0).astype(cd)
        S_new = S + (S * d + v_exp * k_row.astype(cd)
                     + sa_exp * b_row.astype(cd))
    else:
        BC = _dot32(jnp.concatenate([v_nh.reshape(Bt * N, -1),
                                     sa_nh.reshape(Bt * N, -1)], axis=0),
                    segT, precision)
        v_exp = BC[:Bt * N].reshape(Bt, N, HN)
        sa_exp = BC[Bt * N:].reshape(Bt, N, HN)
        S_new = S * d1 + v_exp * k_row + sa_exp * b_row
    y = y1 + v_nh * rk + sa_nh * rb
    return S_new, y, extras


def _fused_tmix_token(S, r_row, w_row, k_raw, a_iclr, v_nh, kk_p, ka_p, rk_p,
                      lnw, lnb, elapsed_t, active, seg, segT, precision,
                      use_dither, bf16_state):
    """One token of the recurrence with the WHOLE TMix core fused around it
    (shared by the T=1 decode kernel and the T>1 chunk kernels).

    prologue (reference Albatross/rwkv7.py:628-631): kk = l2norm_per_head(
    k*k_k); k~ = k*(1+(a-1)*k_a); a_wkv = -kk; b_wkv = kk*a — two extra tiny
    seg-dots for the norm reduce/broadcast, everything else lane-wise on
    resident rows.
    epilogue (reference rwkv7.py:647-648): per-head GroupNorm(eps=64e-5) on y
    plus the ((r*k~*r_k) per-head sum) * v bonus — one extra X-dot row.

    r_row/w_row: (Bt, 1, HN); k_raw/a_iclr: (Bt, HN); v_nh: (Bt, N, H);
    kk_p/ka_p/rk_p: (1, HN); lnw/lnb: (N, H); elapsed_t: (Bt, 1) int32;
    active: (Bt, 1, 1) bool. Returns (S_new, y_out (Bt, N, H) post-GN+bonus).
    """
    kk_pre = k_raw * kk_p                               # (Bt, HN)
    norm2 = _dot32(kk_pre * kk_pre, seg, precision)     # (Bt, H)
    inv = 1.0 / jnp.maximum(jnp.sqrt(norm2), 1e-12)
    inv_lane = _dot32(inv, segT, precision)             # (Bt, HN)
    kk = kk_pre * inv_lane
    k_t = k_raw * (1.0 + (a_iclr - 1.0) * ka_p)
    a_row = (-kk)[:, None, :]                           # (Bt, 1, HN)
    b_row = (kk * a_iclr)[:, None, :]
    k_row = k_t[:, None, :]

    d1 = 1.0 + _decay_row(w_row, elapsed_t, use_dither)
    d1 = jnp.where(active, d1, 1.0)          # row-folded activity mask:
    k_row = jnp.where(active, k_row, 0.0)    # d1=1, k=0, b=0 => S_new == S,
    b_row = jnp.where(active, b_row, 0.0)    # no (Bt, N, HN) select pass
    S_new, y, (bonus,) = _token_update(
        S, d1, r_row, k_row, a_row, b_row, v_nh, seg, segT, precision,
        extra_rows=(r_row[:, 0] * k_t * rk_p,),         # bonus row
        bf16_state=bf16_state)

    mu = jnp.mean(y, axis=1, keepdims=True)             # (Bt, 1, H)
    var = jnp.mean(jnp.square(y - mu), axis=1, keepdims=True)
    y_gn = (y - mu) * jax.lax.rsqrt(var + 64e-5) \
        * lnw[None] + lnb[None]
    return S_new, y_gn + bonus * v_nh


def _decay_group(w_g, elapsed, base, use_dither):
    """Batched _decay_row for an 8-token group: w_g (Bt, G, HN),
    elapsed (Bt, 1) + base -> d1-1 (Bt, G, HN); per-token dither steps via a
    broadcast iota (bit-matches the per-token path)."""
    d = jnp.exp(-_EXP_NEG_HALF * jax.nn.sigmoid(w_g)) - 1.0
    if use_dither:
        G = w_g.shape[1]
        steps = elapsed + base + jax.lax.broadcasted_iota(
            jnp.int32, (1, G), 1)                       # (Bt, G)
        u = jnp.uint32(_DITHER_MULT) * steps.astype(jnp.uint32)
        d = d + (jax.lax.bitcast_convert_type(u, jnp.int32)
                 .astype(jnp.float32) * _DITHER_SCALE)[:, :, None]
    return d


def _fused_tmix_group(S, r_g, w_g, k_g, a_g, v_g, kk_p, ka_p, rk_p, lnw, lnb,
                      elapsed, base, length, seg, segT, precision, use_dither,
                      bf16_state):
    """Eight tokens of the fused TMix chunk with everything EXCEPT the
    recurrence batched over the group.

    The first fused-chunk cut ran _fused_tmix_token per token: the kk/k~
    prologue dots, decay/dither, tiny row reductions, and GroupNorm all
    landed INSIDE the sequential T-loop — ~2048 serialized token-steps per
    chunk each grew by several microseconds, giving back most of the DMA win
    (measured 247 -> 238 ms instead of the ~215 target). Here those pieces
    run ONCE per 8-token group as wide (Bt*8, ...) dots / VPU passes —
    8-way batch-parallel — and the inner loop serializes only
    _token_update_pre's three S-sized dots (the true recurrence).

    r_g/w_g/k_g/a_g: (Bt, 8, HN) raw rows; v_g: (Bt, 8, N, H) post-blend;
    kk_p/ka_p/rk_p: (1, HN); lnw/lnb: (N, H); elapsed: (Bt, 1) int32;
    base: int32 token offset of the group; length: (Bt, 1) int32.
    Returns (S_new, y_out (Bt, 8, N, H) post-GN+bonus, zero where inactive).
    """
    Bt, G, HN = r_g.shape
    # ---- batched prologue (reference Albatross/rwkv7.py:628-631)
    kk_pre = k_g * kk_p                                   # (Bt, G, HN)
    norm2 = _dot32((kk_pre * kk_pre).reshape(Bt * G, HN), seg, precision)
    inv = 1.0 / jnp.maximum(jnp.sqrt(norm2), 1e-12)
    inv_lane = _dot32(inv, segT, precision).reshape(Bt, G, HN)
    kk = kk_pre * inv_lane
    k_t = k_g * (1.0 + (a_g - 1.0) * ka_p)
    b_g = kk * a_g
    d1_g = 1.0 + _decay_group(w_g, elapsed, base, use_dither)
    # masks are BORN at their target rank (broadcasted_iota + compare):
    # expanding a (Bt, G) bool with [:, :, None] is an i1 minor-dim
    # relayout Mosaic only supports for 32-bit types
    actm = (base + jax.lax.broadcasted_iota(jnp.int32, (1, G, 1), 1)
            < length[:, :, None])                         # (Bt, G, 1)
    d1_g = jnp.where(actm, d1_g, 1.0)        # row-folded activity mask (see
    k_tm = jnp.where(actm, k_t, 0.0)         # _wkv7_kernel INVARIANT note)
    b_gm = jnp.where(actm, b_g, 0.0)
    # ---- batched tiny per-head reductions: rk, rb, bonus for all 8 tokens
    rows = jnp.concatenate([(r_g * k_tm).reshape(Bt * G, HN),
                            (r_g * b_gm).reshape(Bt * G, HN),
                            (r_g * k_t * rk_p).reshape(Bt * G, HN)], axis=0)
    R = _dot32(rows, seg, precision)
    H = R.shape[-1]
    rk8 = R[:Bt * G].reshape(Bt, G, 1, H)
    rb8 = R[Bt * G:2 * Bt * G].reshape(Bt, G, 1, H)
    bonus8 = R[2 * Bt * G:].reshape(Bt, G, 1, H)
    # ---- sequential recurrence (the only per-token serialized work)
    a_gm = -kk
    ys = []
    for i in range(G):
        S, y = _token_update_pre(
            S, d1_g[:, i:i + 1], r_g[:, i:i + 1], k_tm[:, i:i + 1],
            a_gm[:, i:i + 1], b_gm[:, i:i + 1], v_g[:, i],
            rk8[:, i], rb8[:, i], seg, segT, precision, bf16_state)
        ys.append(y[:, None])
    y8 = jnp.concatenate(ys, axis=1)                      # (Bt, G, N, H)
    # ---- batched epilogue (reference rwkv7.py:647-648)
    mu = jnp.mean(y8, axis=2, keepdims=True)              # (Bt, G, 1, H)
    var = jnp.mean(jnp.square(y8 - mu), axis=2, keepdims=True)
    y_gn = (y8 - mu) * jax.lax.rsqrt(var + 64e-5) \
        * lnw[None, None] + lnb[None, None]
    y_out = y_gn + bonus8 * v_g
    act4 = (base + jax.lax.broadcasted_iota(jnp.int32, (1, G, 1, 1), 1)
            < length[:, :, None, None])                   # (Bt, G, 1, 1)
    return S, jnp.where(act4, y_out, 0.0)


def _wkv7_kernel(li_ref, state_ref, r_ref, w_ref, k_ref, a_ref, b_ref, v2_ref,
                 elapsed_ref, length_ref, y2_ref, state_out_ref, *, T,
                 use_dither, precision, bf16_state=False):
    """Bt requests per program: per-request row broadcasts are elementwise on the
    (Bt, N, HN) state tile, and the per-head segment reductions run as single
    (Bt*N, HN) x (HN, H) MXU dots across the whole tile (the multiply by the
    request's own row happens before the shared 0/1-matrix reduction, so requests
    never mix)."""
    _, Bt, N, HN = state_ref.shape
    H = HN // _N
    f32 = jnp.float32
    seg, segT = _seg_matrices(HN, H)

    # (Bt, 1, 1) blocks (trailing unit dims keep Bt a leading dim — a 2-D
    # (Bt, 1) block would put Bt on the sublane, illegal for Bt < 8)
    elapsed = elapsed_ref[:].reshape(Bt, 1)           # int32
    length = length_ref[:].reshape(Bt, 1)             # int32

    S0 = state_ref[0] if bf16_state else state_ref[0].astype(f32)

    # Token rows are loaded in GROUPS of 8: a per-token dynamic load
    # r_ref[:, pl.ds(t, 1), :] indexes the SUBLANE dim of the (Bt, T, HN)
    # block at an unprovably-aligned offset — Mosaic rejects it for bf16
    # (packed sublanes). A pl.ds(g*8, 8) offset is provably 8-aligned; the
    # 8 tokens then unroll statically over the in-register group (and the
    # grouped DMA is cheaper than 8 row loads anyway). v2/y2 are 4-D with T
    # on an untiled leading dim, so their per-token dynamic indexing is legal.
    assert T % 8 == 0, T  # wrapper pads the chunk to a multiple of 8

    def group(g, S):
        base = g * 8
        r_g = r_ref[:, pl.ds(base, 8), :].astype(f32)      # (Bt, 8, HN)
        w_g = w_ref[:, pl.ds(base, 8), :].astype(f32)
        k_g = k_ref[:, pl.ds(base, 8), :].astype(f32)
        a_g = a_ref[:, pl.ds(base, 8), :].astype(f32)
        b_g = b_ref[:, pl.ds(base, 8), :].astype(f32)
        for i in range(8):
            t = base + i
            active = (t < length)[:, :, None]              # (Bt, 1, 1) bool
            r_row = r_g[:, i:i + 1, :]                     # (Bt, 1, HN)
            w_row = w_g[:, i:i + 1, :]
            k_row = k_g[:, i:i + 1, :]
            a_row = a_g[:, i:i + 1, :]
            b_row = b_g[:, i:i + 1, :]
            v_nh = v2_ref[:, pl.ds(t, 1)][:, 0].astype(f32)  # (Bt, N, H)

            d1 = 1.0 + _decay_row(w_row, elapsed + t, use_dither)
            # fold the activity mask into the cheap (Bt, 1, HN) rows (d1=1,
            # k=0, b=0 make S_new == S elementwise) instead of a full-state
            # (Bt, N, HN) select — the kernel is VPU-bound, every pass counts.
            # INVARIANT: this bit-preserves an inactive slot's state only
            # while its v/r/a rows are finite (0*Inf = NaN would poison it);
            # guaranteed because slots are reset/insert-zeroed on admission,
            # so inactive rows always carry previously-valid activations
            d1 = jnp.where(active, d1, 1.0)
            k_row = jnp.where(active, k_row, 0.0)
            b_row = jnp.where(active, b_row, 0.0)
            S, y, _ = _token_update(S, d1, r_row, k_row, a_row, b_row, v_nh,
                                    seg, segT, precision,
                                    bf16_state=bf16_state)
            y2_ref[:, pl.ds(t, 1)] = jnp.where(
                active, y, 0.0).astype(y2_ref.dtype)[:, None]
        return S

    S_fin = jax.lax.fori_loop(0, T // 8, group, S0)
    state_out_ref[0] = S_fin.astype(state_out_ref.dtype)


def _wkv7_kernel_tblocked(li_ref, state_ref, r_ref, w_ref, k_ref, a_ref,
                          b_ref, v2_ref, elapsed_ref, length_ref, y2_ref,
                          state_out_ref, s_scr, *, Tb, n_tb, use_dither,
                          precision, bf16_state=False):
    """T-BLOCKED chunk kernel: grid (batch_tiles, T/Tb) with the token-block
    axis minor; the state tile lives in VMEM SCRATCH across a batch tile's
    token blocks (loaded at tb==0, stored at tb==n_tb-1 — the out block
    flushes to HBM only when its index changes, the standard reduction-grid
    pattern).

    Why: the unblocked kernel double-buffers FULL-T row blocks
    (Bt, T, HN) x 5, so at chunk shapes only Bt <= 4 rows fit VMEM — the
    per-token segment dots collapse to (256, 4096)x(4096, 64) and the MXU
    runs at ~13% occupancy while every token serializes (profiled: 55
    us/token/layer, 40% of the whole prefill chunk). Blocking T to Tb=8
    shrinks the row windows 8x, so 4-8x more rows fit per tile and each
    sequential token's dots are 4-8x wider."""
    _, Bt, N, HN = state_ref.shape
    f32 = jnp.float32
    seg, segT = _seg_matrices(HN, HN // _N)
    tb = pl.program_id(1)

    elapsed = elapsed_ref[:].reshape(Bt, 1)
    length = length_ref[:].reshape(Bt, 1)

    @pl.when(tb == 0)
    def _load():
        s_scr[:] = state_ref[0] if bf16_state \
            else state_ref[0].astype(f32)

    S = s_scr[:]
    t0 = tb * Tb
    for g in range(Tb // 8):
        base = g * 8
        r_g = r_ref[:, pl.ds(base, 8), :].astype(f32)
        w_g = w_ref[:, pl.ds(base, 8), :].astype(f32)
        k_g = k_ref[:, pl.ds(base, 8), :].astype(f32)
        a_g = a_ref[:, pl.ds(base, 8), :].astype(f32)
        b_g = b_ref[:, pl.ds(base, 8), :].astype(f32)
        for i in range(8):
            t = t0 + base + i
            active = (t < length)[:, :, None]
            r_row = r_g[:, i:i + 1, :]
            w_row = w_g[:, i:i + 1, :]
            k_row = k_g[:, i:i + 1, :]
            a_row = a_g[:, i:i + 1, :]
            b_row = b_g[:, i:i + 1, :]
            v_nh = v2_ref[:, pl.ds(base + i, 1)][:, 0].astype(f32)
            d1 = 1.0 + _decay_row(w_row, elapsed + t, use_dither)
            d1 = jnp.where(active, d1, 1.0)
            k_row = jnp.where(active, k_row, 0.0)
            b_row = jnp.where(active, b_row, 0.0)
            S, y, _ = _token_update(S, d1, r_row, k_row, a_row, b_row, v_nh,
                                    seg, segT, precision,
                                    bf16_state=bf16_state)
            y2_ref[:, pl.ds(base + i, 1)] = jnp.where(
                active, y, 0.0).astype(y2_ref.dtype)[:, None]
    s_scr[:] = S

    @pl.when(tb == n_tb - 1)
    def _store():
        state_out_ref[0] = s_scr[:].astype(state_out_ref.dtype)


def _wkv7_kernel_chunk_fused(li_ref, state_ref, r_ref, w_ref, k_ref, a_ref,
                             v2_ref, kk_param_ref, ka_param_ref, rk_param_ref,
                             lnw_ref, lnb_ref, elapsed_ref, length_ref,
                             y2_ref, state_out_ref, *, T, use_dither,
                             precision, bf16_state=False):
    """T>1 chunk kernel with the WHOLE TMix core fused in (_fused_tmix_group):
    same grouped-8 row loads as _wkv7_kernel, but the inputs are RAW k and
    the iclr a (4 row streams instead of the 5 post-prologue r/w/k~/-kk/kk*a)
    and y comes out post-GroupNorm+bonus in the (Bt, T, N, H) nh layout —
    the XLA-side kk/k~ prologue, GroupNorm epilogue, and their
    (B,T,4096)<->(B,T,64,64) retiles (64-lane minor dims pad to 128)
    disappear from the chunk program entirely."""
    _, Bt, N, HN = state_ref.shape
    H = HN // _N
    f32 = jnp.float32
    seg, segT = _seg_matrices(HN, H)

    elapsed = elapsed_ref[:].reshape(Bt, 1)
    length = length_ref[:].reshape(Bt, 1)
    kk_p = kk_param_ref[:].astype(f32)                  # (1, HN)
    ka_p = ka_param_ref[:].astype(f32)
    rk_p = rk_param_ref[:].astype(f32)
    lnw = lnw_ref[:].astype(f32)                        # (N, H)
    lnb = lnb_ref[:].astype(f32)

    S0 = state_ref[0] if bf16_state else state_ref[0].astype(f32)
    assert T % 8 == 0, T

    def group(g, S):
        base = g * 8
        r_g = r_ref[:, pl.ds(base, 8), :].astype(f32)
        w_g = w_ref[:, pl.ds(base, 8), :].astype(f32)
        k_g = k_ref[:, pl.ds(base, 8), :].astype(f32)
        a_g = a_ref[:, pl.ds(base, 8), :].astype(f32)
        v_g = v2_ref[:, pl.ds(base, 8)].astype(f32)        # (Bt, 8, N, H)
        S, y8 = _fused_tmix_group(
            S, r_g, w_g, k_g, a_g, v_g, kk_p, ka_p, rk_p, lnw, lnb,
            elapsed, base, length, seg, segT, precision, use_dither,
            bf16_state)
        y2_ref[:, pl.ds(base, 8)] = y8.astype(y2_ref.dtype)
        return S

    S_fin = jax.lax.fori_loop(0, T // 8, group, S0)
    state_out_ref[0] = S_fin.astype(state_out_ref.dtype)


def _wkv7_kernel_tblocked_fused(li_ref, state_ref, r_ref, w_ref, k_ref,
                                a_ref, v2_ref, kk_param_ref, ka_param_ref,
                                rk_param_ref, lnw_ref, lnb_ref, elapsed_ref,
                                length_ref, y2_ref, state_out_ref, s_scr, *,
                                Tb, n_tb, use_dither, precision,
                                bf16_state=False):
    """T-BLOCKED chunk kernel with the fused TMix core (see
    _wkv7_kernel_tblocked for the blocking rationale and
    _wkv7_kernel_chunk_fused for the fusion contract)."""
    _, Bt, N, HN = state_ref.shape
    f32 = jnp.float32
    seg, segT = _seg_matrices(HN, HN // _N)
    tb = pl.program_id(1)

    elapsed = elapsed_ref[:].reshape(Bt, 1)
    length = length_ref[:].reshape(Bt, 1)
    kk_p = kk_param_ref[:].astype(f32)
    ka_p = ka_param_ref[:].astype(f32)
    rk_p = rk_param_ref[:].astype(f32)
    lnw = lnw_ref[:].astype(f32)
    lnb = lnb_ref[:].astype(f32)

    @pl.when(tb == 0)
    def _load():
        s_scr[:] = state_ref[0] if bf16_state \
            else state_ref[0].astype(f32)

    S = s_scr[:]
    t0 = tb * Tb
    for g in range(Tb // 8):
        base = g * 8
        r_g = r_ref[:, pl.ds(base, 8), :].astype(f32)
        w_g = w_ref[:, pl.ds(base, 8), :].astype(f32)
        k_g = k_ref[:, pl.ds(base, 8), :].astype(f32)
        a_g = a_ref[:, pl.ds(base, 8), :].astype(f32)
        v_g = v2_ref[:, pl.ds(base, 8)].astype(f32)        # (Bt, 8, N, H)
        S, y8 = _fused_tmix_group(
            S, r_g, w_g, k_g, a_g, v_g, kk_p, ka_p, rk_p, lnw, lnb,
            elapsed, t0 + base, length, seg, segT, precision, use_dither,
            bf16_state)
        y2_ref[:, pl.ds(base, 8)] = y8.astype(y2_ref.dtype)
    s_scr[:] = S

    @pl.when(tb == n_tb - 1)
    def _store():
        state_out_ref[0] = s_scr[:].astype(state_out_ref.dtype)


def _wkv7_kernel_t1(li_ref, state_ref, r_ref, w_ref, k_ref, a_ref, b_ref,
                    v_ref, elapsed_ref, length_ref, y_ref, state_out_ref, *,
                    use_dither, precision, bf16_state=False):
    """Decode-specialized (T=1) variant: r/w/k/a/b are plain 2-D (Bt, HN)
    lane-layout rows (the generic path's (B, 1, C) shapes made XLA insert
    T(2,128) relayout copies in front of the call — profiled ~2.3 ms/step at
    B=200/7.2B). v/y keep the host-side per-head transpose to (Bt, N, H):
    Mosaic cannot split the lane dim in-kernel (unsupported shape cast)."""
    _, Bt, N, HN = state_ref.shape
    H = HN // _N
    f32 = jnp.float32
    seg, segT = _seg_matrices(HN, H)

    active = (length_ref[:] > 0)[:, :, None]            # (Bt, 1, 1)

    S = state_ref[0] if bf16_state else state_ref[0].astype(f32)
    r_row = r_ref[:].astype(f32)[:, None, :]            # (Bt, 1, HN)
    w_row = w_ref[:].astype(f32)[:, None, :]
    k_row = k_ref[:].astype(f32)[:, None, :]
    a_row = a_ref[:].astype(f32)[:, None, :]
    b_row = b_ref[:].astype(f32)[:, None, :]
    v_nh = v_ref[:].astype(f32)                         # (Bt, N, H)

    d1 = 1.0 + _decay_row(w_row, elapsed_ref[:], use_dither)
    d1 = jnp.where(active, d1, 1.0)          # row-folded activity mask:
    k_row = jnp.where(active, k_row, 0.0)    # d1=1, k=0, b=0 => S_new == S,
    b_row = jnp.where(active, b_row, 0.0)    # no (Bt, N, HN) select pass
    S_new, y, _ = _token_update(S, d1, r_row, k_row, a_row, b_row, v_nh,
                                seg, segT, precision, bf16_state=bf16_state)
    y_ref[:] = jnp.where(active, y, 0.0).astype(y_ref.dtype)
    state_out_ref[0] = S_new.astype(state_out_ref.dtype)


def _wkv7_kernel_t1_fused(li_ref, state_ref, r_ref, w_ref, k_ref, a_ref, v_ref,
                          kk_param_ref, ka_param_ref, rk_param_ref, lnw_ref,
                          lnb_ref, elapsed_ref, length_ref, y_ref,
                          state_out_ref, *, use_dither, precision,
                          bf16_state=False):
    """T=1 decode kernel with the WHOLE TMix core fused in.

    Beyond the recurrence (see _wkv7_kernel), this absorbs the per-head ops
    that sit immediately before/after it in the reference TMix
    (Albatross/rwkv7.py:628-649):
      prologue: kk = l2norm_per_head(k*k_k); k~ = k*(1+(a-1)*k_a); a_wkv = -kk;
                b_wkv = kk*a  — two extra tiny seg-dots for the norm
                reduce/broadcast, everything else lane-wise on resident rows;
      epilogue: per-head GroupNorm(eps=64e-5) on y, plus the
                ((r*k~*r_k) per-head sum) * v bonus — one extra X-dot row.
    Inputs: r/w_raw/k_raw/a_iclr (Bt, HN) lane rows; v (Bt, N, H);
    k_k/k_a/r_k (1, HN); ln_x w/b pre-transposed to (N, H).
    Output y is post-GroupNorm+bonus (Bt, N, H); the gate multiply and output
    projection stay outside (they need lane layout)."""
    _, Bt, N, HN = state_ref.shape
    H = HN // _N
    f32 = jnp.float32
    seg, segT = _seg_matrices(HN, H)

    active = (length_ref[:] > 0)[:, :, None]            # (Bt, 1, 1)

    S = state_ref[0] if bf16_state else state_ref[0].astype(f32)
    r_row = r_ref[:].astype(f32)[:, None, :]            # (Bt, 1, HN)
    w_row = w_ref[:].astype(f32)[:, None, :]
    k_raw = k_ref[:].astype(f32)                        # (Bt, HN)
    a_iclr = a_ref[:].astype(f32)                       # (Bt, HN)
    v_nh = v_ref[:].astype(f32)                         # (Bt, N, H)
    kk_p = kk_param_ref[:].astype(f32)                  # (1, HN)
    ka_p = ka_param_ref[:].astype(f32)
    rk_p = rk_param_ref[:].astype(f32)

    S_new, y_out = _fused_tmix_token(
        S, r_row, w_row, k_raw, a_iclr, v_nh, kk_p, ka_p, rk_p,
        lnw_ref[:].astype(f32), lnb_ref[:].astype(f32), elapsed_ref[:],
        active, seg, segT, precision, use_dither, bf16_state)

    y_ref[:] = jnp.where(active, y_out, 0.0).astype(y_ref.dtype)
    state_out_ref[0] = S_new.astype(state_out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("use_dither", "interpret",
                                              "precision"))
def wkv7_pallas_step_fused(state, layer, r, w_raw, k_raw, a_iclr, v_nh,
                           k_k, k_a, r_k, ln_w_nh, ln_b_nh, elapsed, lengths,
                           *, use_dither=True, interpret=False,
                           precision="default"):
    """Serving decode step with the TMix core fused into the WKV kernel.

    state: STACKED (L, B, N, HN), layer `layer` advanced in place.
    r/w_raw/k_raw/a_iclr: (B, HN); v_nh: (B, N, H) (post v_first blend,
    host-transposed); k_k/k_a/r_k: (HN,) per-layer; ln_w_nh/ln_b_nh: (N, H).
    Returns y (B, N, H) post-GroupNorm+bonus and the updated stacked state."""
    B, HN = r.shape
    N = _N
    H = HN // N
    prec, bf16_state = _parse_precision(precision, state.dtype)
    Bt = _pick_batch_tile(B, 1, HN, row_isz=r.dtype.itemsize,
                          state_isz=state.dtype.itemsize,
                          carry_isz=2 if bf16_state else 4)

    def bspec(*tile):
        return pl.BlockSpec((Bt,) + tile, lambda i, li: (i,) + (0,) * len(tile))

    def pspec(*tile):  # per-layer param vectors, whole in every program
        return pl.BlockSpec(tile, lambda i, li: (0,) * len(tile))

    state_spec = pl.BlockSpec((1, Bt, N, HN), lambda i, li: (li[0], i, 0, 0))
    kernel = functools.partial(_wkv7_kernel_t1_fused, use_dither=use_dither,
                               precision=prec, bf16_state=bf16_state)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // Bt,),
        in_specs=[
            state_spec,
            bspec(HN), bspec(HN), bspec(HN), bspec(HN),  # r w k a
            bspec(N, H),                                 # v
            pspec(1, HN), pspec(1, HN), pspec(1, HN),    # k_k k_a r_k
            pspec(N, H), pspec(N, H),                    # ln w/b
            bspec(1), bspec(1),                          # elapsed, lengths
        ],
        out_specs=[bspec(N, H), state_spec],
    )
    y, state_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, N, H), r.dtype),
            jax.ShapeDtypeStruct(state.shape, state.dtype),
        ],
        # NOTE: aliasing is load-bearing, not just an optimization — the kernel
        # writes ONLY layer li's slab, so the output buffer must BE the input
        # buffer for the other layers' bytes to stay valid
        input_output_aliases={1: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * B * N * HN * H + 4 * B * N * HN,
            bytes_accessed=2 * B * N * HN * state.dtype.itemsize
            + 6 * B * HN * r.dtype.itemsize,
            transcendentals=B * HN,
        ),
    )(jnp.asarray(layer, jnp.int32).reshape(1), state, r, w_raw, k_raw,
      a_iclr, v_nh, k_k.reshape(1, HN), k_a.reshape(1, HN),
      r_k.reshape(1, HN), ln_w_nh, ln_b_nh, elapsed[:, None],
      lengths[:, None])
    return y, state_out


@functools.partial(jax.jit, static_argnames=("use_dither", "interpret",
                                              "precision"))
def wkv7_pallas_chunk_fused(state, layer, r, w_raw, k_raw, a_iclr, v_nh,
                            k_k, k_a, r_k, ln_w_nh, ln_b_nh, elapsed, lengths,
                            *, use_dither=True, interpret=False,
                            precision="default"):
    """Prefill chunk (T>1) with the WHOLE TMix core fused into the WKV kernel
    — the chunk-path twin of wkv7_pallas_step_fused.

    Why: the unfused chunk path ran the kk/k~ prologue, the GroupNorm+bonus
    epilogue, and their (B,T,4096)<->(B,T,64,64) retiles in XLA — profiled at
    ~29 ms/chunk of glue at 46% of its DMA floor (64-lane minor dims pad to
    128; docs/PERF.md round-4 floor table). Fusing moves all of it onto rows
    already resident in VMEM and drops the 5th row stream (b = kk*a) from
    HBM entirely (4 streams instead of 5, so LARGER batch tiles also fit).

    state: STACKED (L, B, N, HN), layer `layer` advanced in place.
    r/w_raw/k_raw/a_iclr: (B, T, HN) raw lane rows; v_nh: (B, T, N, H)
    i-on-sublane (post v_first blend); k_k/k_a/r_k: (HN,) per-layer params;
    ln_w_nh/ln_b_nh: (N, H). lengths: (B,) int32 valid-token counts.
    Returns y (B, T, N, H) post-GroupNorm+bonus (zero beyond lengths) and
    the updated stacked state. T is padded to a multiple of 8 internally
    (pad tokens are masked by lengths)."""
    B, T, HN = r.shape
    N = _N
    H = HN // N
    prec, bf16_state = _parse_precision(precision, state.dtype)

    T8 = -(-T // 8) * 8
    if T8 != T:
        pad3 = ((0, 0), (0, T8 - T), (0, 0))
        r, w_raw, k_raw, a_iclr = (jnp.pad(x, pad3)
                                   for x in (r, w_raw, k_raw, a_iclr))
        v_nh = jnp.pad(v_nh, ((0, 0), (0, T8 - T), (0, 0), (0, 0)))

    Bt = _pick_batch_tile(B, T8, HN, row_isz=r.dtype.itemsize,
                          state_isz=state.dtype.itemsize,
                          carry_isz=2 if bf16_state else 4, n_rows=4)
    bt_blocked = 0
    if T8 > 8:
        bt_blocked = _pick_batch_tile_blocked(
            B, 8, HN, row_isz=r.dtype.itemsize,
            state_isz=state.dtype.itemsize,
            carry_isz=2 if bf16_state else 4, n_rows=4)

    lead = (jnp.asarray(layer, jnp.int32).reshape(1), state, r, w_raw, k_raw,
            a_iclr, v_nh, k_k.reshape(1, HN), k_a.reshape(1, HN),
            r_k.reshape(1, HN), ln_w_nh, ln_b_nh,
            elapsed[:, None, None], lengths[:, None, None])
    cost = pl.CostEstimate(
        flops=4 * 2 * B * T8 * N * HN * H + 4 * B * T8 * N * HN,
        bytes_accessed=2 * B * N * HN * state.dtype.itemsize
        + 6 * B * T8 * HN * r.dtype.itemsize,
        transcendentals=B * T8 * HN,
    )

    if bt_blocked > Bt:
        Tb = 8
        n_tb = T8 // Tb
        Btb = bt_blocked

        def bspec_b(*tile):
            return pl.BlockSpec((Btb,) + tile,
                                lambda i, tb, li: (i, tb) + (0,) * (len(tile) - 1))

        def bspec_row(*tile):
            return pl.BlockSpec((Btb,) + tile,
                                lambda i, tb, li: (i,) + (0,) * len(tile))

        def pspec_b(*tile):  # per-layer param tensors, whole in every program
            return pl.BlockSpec(tile, lambda i, tb, li: (0,) * len(tile))

        state_spec_b = pl.BlockSpec((1, Btb, N, HN),
                                    lambda i, tb, li: (li[0], i, 0, 0))
        kernel_b = functools.partial(
            _wkv7_kernel_tblocked_fused, Tb=Tb, n_tb=n_tb,
            use_dither=use_dither, precision=prec, bf16_state=bf16_state)
        grid_spec_b = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // Btb, n_tb),
            in_specs=[
                state_spec_b,
                bspec_b(Tb, HN), bspec_b(Tb, HN), bspec_b(Tb, HN),
                bspec_b(Tb, HN),                             # r w k a
                bspec_b(Tb, N, H),                           # v
                pspec_b(1, HN), pspec_b(1, HN), pspec_b(1, HN),
                pspec_b(N, H), pspec_b(N, H),                # ln w/b
                bspec_row(1, 1), bspec_row(1, 1),            # elapsed, lengths
            ],
            out_specs=[bspec_b(Tb, N, H), state_spec_b],
            scratch_shapes=[pltpu.VMEM(
                (Btb, N, HN), state.dtype if bf16_state else jnp.float32)],
        )
        y2, state_out = pl.pallas_call(
            kernel_b,
            grid_spec=grid_spec_b,
            out_shape=[
                jax.ShapeDtypeStruct((B, T8, N, H), r.dtype),
                jax.ShapeDtypeStruct(state.shape, state.dtype),
            ],
            input_output_aliases={1: 1},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
            cost_estimate=cost,
        )(*lead)
        return y2[:, :T], state_out

    def bspec(*tile):
        return pl.BlockSpec((Bt,) + tile, lambda i, li: (i,) + (0,) * len(tile))

    def pspec(*tile):
        return pl.BlockSpec(tile, lambda i, li: (0,) * len(tile))

    state_spec = pl.BlockSpec((1, Bt, N, HN), lambda i, li: (li[0], i, 0, 0))
    kernel = functools.partial(_wkv7_kernel_chunk_fused, T=T8,
                               use_dither=use_dither, precision=prec,
                               bf16_state=bf16_state)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // Bt,),
        in_specs=[
            state_spec,
            bspec(T8, HN), bspec(T8, HN), bspec(T8, HN), bspec(T8, HN),
            bspec(T8, N, H),
            pspec(1, HN), pspec(1, HN), pspec(1, HN),
            pspec(N, H), pspec(N, H),
            bspec(1, 1), bspec(1, 1),
        ],
        out_specs=[bspec(T8, N, H), state_spec],
    )
    y2, state_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, T8, N, H), r.dtype),
            jax.ShapeDtypeStruct(state.shape, state.dtype),
        ],
        input_output_aliases={1: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
        cost_estimate=cost,
    )(*lead)
    return y2[:, :T], state_out


@functools.partial(jax.jit, static_argnames=("use_dither", "interpret",
                                              "precision"))
def _wkv7_pallas_call_t1(state, layer, r, w_raw, k, a, b, v, elapsed,
                         lengths, *, use_dither=True, interpret=False,
                         precision="highest"):
    """T=1 decode step: state STACKED (L, B, N, HN) in-place on layer `layer`;
    r..b: (B, HN) lane layout; v/y: (B, N, H) i-on-sublane (host-transposed)."""
    B, HN = r.shape
    N = _N
    H = HN // N
    prec, bf16_state = _parse_precision(precision, state.dtype)
    Bt = _pick_batch_tile(B, 1, HN, row_isz=r.dtype.itemsize,
                          state_isz=state.dtype.itemsize,
                          carry_isz=2 if bf16_state else 4)

    def bspec(*tile):
        return pl.BlockSpec((Bt,) + tile, lambda i, li: (i,) + (0,) * len(tile))

    state_spec = pl.BlockSpec((1, Bt, N, HN), lambda i, li: (li[0], i, 0, 0))
    kernel = functools.partial(_wkv7_kernel_t1, use_dither=use_dither,
                               precision=prec, bf16_state=bf16_state)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // Bt,),
        in_specs=[
            state_spec,
            bspec(HN), bspec(HN), bspec(HN), bspec(HN), bspec(HN),  # r w k a b
            bspec(N, H),                                            # v
            bspec(1), bspec(1),                                     # elapsed len
        ],
        out_specs=[bspec(N, H), state_spec],
    )
    y, state_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, N, H), r.dtype),
            jax.ShapeDtypeStruct(state.shape, state.dtype),
        ],
        input_output_aliases={1: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * B * N * HN * (HN // _N) + 4 * B * N * HN,
            bytes_accessed=2 * B * N * HN * state.dtype.itemsize
            + 6 * B * HN * r.dtype.itemsize,
            transcendentals=B * HN,
        ),
    )(jnp.asarray(layer, jnp.int32).reshape(1), state, r, w_raw, k, a, b, v,
      elapsed[:, None], lengths[:, None])
    return y, state_out


def _pick_batch_tile(B: int, T: int, HN: int, *, row_isz: int = 2,
                     state_isz: int = 2, carry_isz: int = 4,
                     n_rows: int = 5) -> int:
    """Largest Bt with the program's VMEM footprint ~under 68MB (state f32 tile +
    double-buffered staging of state/rows), so Mosaic can still double-buffer.

    Sublane rule: for T == 1 the row blocks are 2-D (Bt, HN), so Bt IS the
    sublane dim and Mosaic requires Bt % 8 == 0 (or Bt == B, a single
    whole-array block). For T > 1 the blocks are (Bt, T, HN) — T is the
    sublane — so Bt is an unconstrained leading dim and small tiles (4/2/1)
    are legal (and required: at B=200, T=64, HN=4096 nothing >= 8 fits VMEM).

    VMEM model (validated against the compiler's allocation report): the
    "i-on-sublane" v/y blocks end in the head dim H, which pads up to a full
    128-lane tile in VMEM — at H=64 that doubles their window, at tiny test H
    it dominates everything (a f32[16,64,64,8] window allocates 32MB).

    Swept at 7.2B decode: Bt 8..24 all land 71.9-73.0% of state-traffic SOL —
    the choice is loose. Raises if even Bt=1 (or, at T==1 with B % 8 != 0,
    Bt=B) exceeds the budget, instead of emitting a program that fails deep in
    Mosaic."""
    H = HN // _N
    H_pad = -(-H // 128) * 128  # lane dim of the (.., N, H) v/y blocks
    # T>1 row blocks are (Bt, T, HN) with T on the sublane; T=1 uses 2-D
    # (Bt, HN) blocks where Bt itself is the (already-8-aligned) sublane
    T_pad = T

    def footprint(bt: int) -> int:
        return (bt * _N * HN * carry_isz               # S carry (f32 or bf16)
                + 2 * 2 * bt * _N * HN * state_isz     # state in/out x2 buf
                + 2 * n_rows * bt * T_pad * HN * row_isz  # row streams x2 buf
                + 2 * 2 * bt * T * _N * H_pad * row_isz)  # v,y (lane-padded)

    budget = 68 * 1024 * 1024
    for bt in (24, 16, 8, 4, 2, 1):
        if B % bt:
            continue
        if T == 1 and bt % 8 and bt != B:
            continue  # sublane rule (only binds the 2-D T=1 blocks)
        if footprint(bt) <= budget:
            return bt
    if T == 1 and B % 8 and footprint(B) <= budget:
        return B  # whole-array block: the one legal non-%8 tile
    raise ValueError(
        f"no WKV batch tile fits VMEM for B={B}, T={T}, HN={HN}"
        + (" (batch sizes divisible by 8 tile best for decode)"
           if T == 1 and B % 8 else ""))


def _pick_batch_tile_blocked(B: int, Tb: int, HN: int, *, row_isz: int = 2,
                             state_isz: int = 2, carry_isz: int = 4,
                             n_rows: int = 5) -> int:
    """Batch tile for the T-BLOCKED chunk kernel: the row windows are only
    (bt, Tb, HN), so far more rows fit than the unblocked full-T windows —
    the whole point (wider per-token dots). Footprint: state scratch +
    double-buffered state io + double-buffered row/v/y blocks."""
    H = HN // _N
    H_pad = -(-H // 128) * 128

    def footprint(bt: int) -> int:
        return (bt * _N * HN * carry_isz
                + 2 * 2 * bt * _N * HN * state_isz
                + 2 * n_rows * bt * Tb * HN * row_isz
                + 2 * 2 * bt * Tb * _N * H_pad * row_isz)

    # headroom for the in-kernel f32 transients (S*a / S*d1r copies are
    # (bt*N, HN) f32 each): bt=16 at 7.2B width measured 104.4M of scoped
    # VMEM against the 100M limit with an 88M block budget — 60M keeps the
    # whole stack under the limit
    budget = 60 * 1024 * 1024
    for bt in (32, 24, 16, 8):
        if B % bt == 0 and footprint(bt) <= budget:
            return bt
    return 0


@functools.partial(jax.jit, static_argnames=("use_dither", "interpret",
                                              "precision"))
def _wkv7_pallas_call(state, layer, r, w_raw, k, a, b, v2, elapsed, lengths, *,
                      use_dither=True, interpret=False, precision="highest"):
    """state: STACKED (L, B, N, HN); only layer `layer`'s slab is read/updated.

    The layer index rides scalar prefetch into the state BlockSpecs, so the
    kernel DMAs the slab straight out of the stacked buffer — no XLA-level
    dynamic-slice/update (which would copy the whole slab around the opaque
    pallas call every layer). The full stacked buffer is aliased in->out; slabs
    of other layers are untouched bytes of the same buffer."""
    B, T, HN = r.shape
    N = _N
    H = HN // N
    prec, bf16_state = _parse_precision(precision, state.dtype)
    Bt = _pick_batch_tile(B, T, HN, row_isz=r.dtype.itemsize,
                          state_isz=state.dtype.itemsize,
                          carry_isz=2 if bf16_state else 4)
    bt_blocked = 0
    if T > 8:
        bt_blocked = _pick_batch_tile_blocked(
            B, 8, HN, row_isz=r.dtype.itemsize,
            state_isz=state.dtype.itemsize,
            carry_isz=2 if bf16_state else 4)

    if bt_blocked > Bt:
        # T-blocked grid: token blocks minor, state carried in VMEM scratch
        Tb = 8
        n_tb = T // Tb
        Btb = bt_blocked

        def bspec_b(*tile):
            return pl.BlockSpec((Btb,) + tile,
                                lambda i, tb, li: (i, tb) + (0,) * (len(tile) - 1))

        def bspec_row(*tile):
            return pl.BlockSpec((Btb,) + tile,
                                lambda i, tb, li: (i,) + (0,) * len(tile))

        state_spec_b = pl.BlockSpec((1, Btb, N, HN),
                                    lambda i, tb, li: (li[0], i, 0, 0))
        kernel_b = functools.partial(
            _wkv7_kernel_tblocked, Tb=Tb, n_tb=n_tb, use_dither=use_dither,
            precision=prec, bf16_state=bf16_state)
        grid_spec_b = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // Btb, n_tb),
            in_specs=[
                state_spec_b,
                bspec_b(Tb, HN), bspec_b(Tb, HN), bspec_b(Tb, HN),
                bspec_b(Tb, HN), bspec_b(Tb, HN),
                bspec_b(Tb, N, H),
                bspec_row(1, 1), bspec_row(1, 1),
            ],
            out_specs=[
                bspec_b(Tb, N, H),
                state_spec_b,
            ],
            scratch_shapes=[pltpu.VMEM(
                (Btb, N, HN), state.dtype if bf16_state else jnp.float32)],
        )
        y2, state_out = pl.pallas_call(
            kernel_b,
            grid_spec=grid_spec_b,
            out_shape=[
                jax.ShapeDtypeStruct((B, T, N, H), r.dtype),
                jax.ShapeDtypeStruct(state.shape, state.dtype),
            ],
            input_output_aliases={1: 1},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=4 * 2 * B * T * N * HN * H + 4 * B * T * N * HN,
                bytes_accessed=2 * B * N * HN * state.dtype.itemsize
                + 6 * B * T * HN * r.dtype.itemsize,
                transcendentals=B * T * HN,
            ),
        )(jnp.asarray(layer, jnp.int32).reshape(1), state, r, w_raw, k, a, b,
          v2, elapsed[:, None, None], lengths[:, None, None])
        return y2, state_out

    def bspec(*tile):
        return pl.BlockSpec((Bt,) + tile, lambda i, li: (i,) + (0,) * len(tile))

    state_spec = pl.BlockSpec((1, Bt, N, HN), lambda i, li: (li[0], i, 0, 0))

    kernel = functools.partial(_wkv7_kernel, T=T, use_dither=use_dither,
                               precision=prec, bf16_state=bf16_state)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # layer index
        grid=(B // Bt,),
        in_specs=[
            state_spec,        # state (stacked)
            bspec(T, HN),      # r
            bspec(T, HN),      # w
            bspec(T, HN),      # k
            bspec(T, HN),      # a
            bspec(T, HN),      # b
            bspec(T, N, H),    # v2
            bspec(1, 1),       # elapsed (Bt, 1, 1) i32
            bspec(1, 1),       # lengths (Bt, 1, 1) i32
        ],
        out_specs=[
            bspec(T, N, H),    # y2
            state_spec,        # state_out (stacked)
        ],
    )
    y2, state_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, T, N, H), r.dtype),
            jax.ShapeDtypeStruct(state.shape, state.dtype),
        ],
        # aliasing indices include the scalar-prefetch operand: state is arg 1
        input_output_aliases={1: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * B * T * N * HN * H + 4 * B * T * N * HN,
            bytes_accessed=2 * B * N * HN * state.dtype.itemsize
            + 6 * B * T * HN * r.dtype.itemsize,
            transcendentals=B * T * HN,
        ),
    )(jnp.asarray(layer, jnp.int32).reshape(1), state, r, w_raw, k, a, b, v2,
      elapsed[:, None, None], lengths[:, None, None])
    return y2, state_out


def wkv7_pallas_batch(state, r, w_raw, k, v, a, b, elapsed, *, lengths=None,
                      layer=None, use_dither=True, interpret=False,
                      precision="highest", v_nh_layout=False):
    """Drop-in replacement for ops.wkv7.wkv7_reference_batch.

    state: (B, N, H*N) — or, with `layer` given, the STACKED (L, B, N, H*N)
    buffer of which only layer `layer`'s slab is advanced (zero-copy in-place).
    r..b: (B, T, C=H*N); elapsed: (B,) int32; lengths: optional (B,) int32.
    Returns y (B, T, C) in r.dtype, new_state (same shape as `state`).

    v_nh_layout: v's channels arrive in the kernel's native i-major order
    (channel j*H+h instead of h*N+j — the serving path permutes the merged
    V projection's columns at load) and y is returned in that same order —
    the wrapper's two (B, T, N, H) transpose copies disappear entirely
    (measured ~0.7 ms each per step at 7.2B B=384; the caller's Wo rows are
    permuted to match, see engine/serving._permute_nh_layout)."""
    B, T, C = r.shape
    N = _N
    H = C // N
    if lengths is None:
        lengths = jnp.full((B,), T, jnp.int32)
    if layer is None:
        state_stacked, li = state[None], 0
    else:
        state_stacked, li = state, layer
    if T == 1:
        # decode fast path: 2-D lane-layout r/w/k/a/b (no T-dim relayout
        # copies); v/y transposed to/from (B, N, H) on the host unless the
        # caller already speaks the kernel's layout (v_nh_layout)
        v1 = v.reshape(B, N, H) if v_nh_layout \
            else v.reshape(B, H, N).transpose(0, 2, 1)
        y1, new_state = _wkv7_pallas_call_t1(
            state_stacked, li, r[:, 0], w_raw[:, 0], k[:, 0], a[:, 0], b[:, 0],
            v1, elapsed.astype(jnp.int32), lengths.astype(jnp.int32),
            use_dither=use_dither, interpret=interpret, precision=precision)
        y = y1.reshape(B, 1, C) if v_nh_layout \
            else y1.transpose(0, 2, 1).reshape(B, 1, C)
    else:
        # pad the chunk to a multiple of 8 tokens (the kernel loads token
        # rows in provably-8-aligned groups); pad tokens are masked off by
        # lengths (t >= length for every row) so state/y are unaffected
        T8 = -(-T // 8) * 8
        if T8 != T:
            pad = ((0, 0), (0, T8 - T), (0, 0))
            r, w_raw, k, a, b, v = (jnp.pad(x, pad)
                                    for x in (r, w_raw, k, a, b, v))
        # v in "i-on-sublane" layout (B, T, N, H)
        v2 = v.reshape(B, T8, N, H) if v_nh_layout \
            else v.reshape(B, T8, H, N).transpose(0, 1, 3, 2)
        y2, new_state = _wkv7_pallas_call(
            state_stacked, li, r, w_raw, k, a, b, v2, elapsed.astype(jnp.int32),
            lengths.astype(jnp.int32), use_dither=use_dither,
            interpret=interpret, precision=precision)
        y = y2[:, :T].reshape(B, T, C) if v_nh_layout \
            else y2[:, :T].transpose(0, 1, 3, 2).reshape(B, T, C)
    if layer is None:
        new_state = new_state[0]
    return y, new_state
