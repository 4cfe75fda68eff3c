"""Functional RWKV-7 "Goose" model for TPU (JAX).

Re-implements the forward semantics of the reference engine's model runtime
(/root/reference/Albatross/rwkv7.py:164-679) as pure functions over a parameter
pytree and an explicit, functional recurrent state — no in-place mutation, no
TorchScript; the layer loop is a lax.scan over stacked per-layer weights so one XLA
program covers any depth.

Recurrent state of a batch of B requests (reference state list, rwkv7.py:224-235):
  shift:   (L, 2, B, C)   token-shift x_prev for TMix [0] and CMix [1]
  wkv:     (L, B, N, H*N) per-head matrix state, layout [i, h*N+j] (see ops/wkv7.py)
  elapsed: (B,) int32     total tokens processed (feeds the fp16 dither)

Weight orientation: all linears stored (in, out) for `x @ W`.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from chirrup_tpu.models.config import RWKV7Config
from chirrup_tpu.ops import mm8
from chirrup_tpu.ops.linear import matmul
from chirrup_tpu.ops import wkv7 as wkv7_ops

HEAD_SIZE = 64


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RWKVState:
    """Functional recurrent state for a batch of B requests."""

    shift: Any    # (L, 2, B, C)
    wkv: Any      # (L, B, N, H*N)
    elapsed: Any  # (B,) int32


def init_state(config: RWKV7Config, batch_size: int, *,
               shift_dtype=jnp.float32, wkv_dtype=jnp.float32) -> RWKVState:
    L, C, N = config.n_layer, config.n_embd, config.head_size
    return RWKVState(
        shift=jnp.zeros((L, 2, batch_size, C), shift_dtype),
        wkv=jnp.zeros((L, batch_size, N, C), wkv_dtype),
        elapsed=jnp.zeros((batch_size,), jnp.int32),
    )


# ---------------------------------------------------------------------------------
# normalization primitives (fp32 internally)

def layer_norm(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32) \
        + b.astype(jnp.float32)
    return out.astype(x.dtype)


def group_norm(x, num_groups, w, b, eps):
    """Per-head GroupNorm over (..., C) with C = num_groups * head_size
    (reference TMix uses eps=64e-5, rwkv7.py:647)."""
    shape = x.shape
    xf = x.astype(jnp.float32).reshape(shape[:-1] + (num_groups, shape[-1] // num_groups))
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + eps)).reshape(shape)
    out = xn * w.astype(jnp.float32) + b.astype(jnp.float32)
    return out.astype(x.dtype)


def group_norm_nh(y4, w_nh, b_nh, eps):
    """Per-head GroupNorm on i-major ("nh") layout: y4 (B, T, N, H) where
    channel (h, j) lives at [..., j, h]. Each head's 64 values are the same
    set as the standard layout's — only strided — so stats over the N axis
    reproduce group_norm exactly. w_nh/b_nh: (N, H) kernel-layout params."""
    xf = y4.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-2, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-2, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (xn * w_nh.astype(jnp.float32)
            + b_nh.astype(jnp.float32)).astype(y4.dtype)


def _l2_normalize_heads(x, H, N):
    """Per-head L2 normalize with torch.nn.functional.normalize semantics
    (x / max(||x||, 1e-12))."""
    shape = x.shape
    xf = x.astype(jnp.float32).reshape(shape[:-1] + (H, N))
    norm = jnp.sqrt(jnp.sum(jnp.square(xf), axis=-1, keepdims=True))
    out = xf / jnp.maximum(norm, 1e-12)
    return out.reshape(shape).astype(x.dtype)


def _masked_last(x, lengths, prev):
    """Last valid position of each row of x (B,T,C); rows with length 0 keep `prev`."""
    B, T, _ = x.shape
    if lengths is None:
        return x[:, -1, :].astype(prev.dtype)
    if T == 1:
        # decode: the last valid position IS position 0 — the general
        # take_along_axis below lowers to a real gather, paid twice per
        # layer per step
        return jnp.where((lengths > 0)[:, None], x[:, 0, :].astype(prev.dtype),
                         prev)
    idx = jnp.clip(lengths - 1, 0, T - 1)
    last = jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0, :]
    return jnp.where((lengths > 0)[:, None], last.astype(prev.dtype), prev)


def _token_shift_delta(x, shift_prev):
    """xx = [shift_prev, x[:-1]] - x along T; T==1 needs no concat."""
    if x.shape[1] == 1:
        return shift_prev[:, None, :].astype(x.dtype) - x
    return jnp.concatenate(
        [shift_prev[:, None, :].astype(x.dtype), x[:, :-1]], axis=1) - x


# ---------------------------------------------------------------------------------
# blocks

def _tmix(att, li, layer_is_first, x, shift_prev, v_first, wkv_full, elapsed,
          lengths, wkv_fn, reduce_fn=None, nh_layout=False):
    """Time-mix. Reference: RWKV_x070_TMix_seq_batch (Albatross/rwkv7.py:619-649).

    wkv_full is the STACKED (L, B, N, H*N) recurrent state; wkv_fn advances only
    layer li's slab in place (pallas path: zero-copy via a prefetched layer
    index; reference path: slice + dynamic_update).

    SPMD note: under tensor parallelism this whole function runs INSIDE
    shard_map with head-sharded projections — x/xx are full-C (replicated)
    while every per-head tensor (k, v, y, kk, ...) is the chip's local shard.
    Per-head dims are therefore derived from the per-head tensors themselves
    (never from x), and `reduce_fn` (psum over the tp axis) is applied to the
    row-parallel output projection. Meshless: reduce_fn=None, local == global.

    nh_layout (serving Pallas path): v / v-gate / gate / Wo-rows live in the
    WKV kernel's i-major channel order (j*Hl+h; the weights were permuted at
    load — serving._permute_nh_layout), so the (B, N, H) transposes around
    the kernel become free reshapes. r/k/a/w stay standard order."""
    B, T, C = x.shape
    N = HEAD_SIZE
    reduce_fn = reduce_fn or (lambda y: y)

    xx = _token_shift_delta(x, shift_prev)

    if "Wrkv" in att:
        # merged R/K/V: one fused mm8 kernel computes all three token-shift
        # mixes + projections off the shared (x, xx) pair (serving int8 path)
        mrkv = att["Wrkv"]
        mu = jnp.stack([att["x_r"].reshape(-1), att["x_k"].reshape(-1),
                        att["x_v"].reshape(-1)])
        rkv = mm8.mm8_multi_matmul(x, xx, mu, mrkv.w, mrkv.li)
        r, k, v = jnp.split(rkv, 3, axis=-1)
    else:
        xr = x + xx * att["x_r"]
        xk = x + xx * att["x_k"]
        xv = x + xx * att["x_v"]
        r = matmul(xr, att["Wr"])
        k = matmul(xk, att["Wk"])
        v = matmul(xv, att["Wv"])

    if "lora1" in att:
        # packed LoRA chains (w/a/v-gate/g): two batched einsums over the
        # stacked token-shift mixes replace eight narrow (N=32..128) dots
        mu4 = jnp.stack([att["x_w"].reshape(-1), att["x_a"].reshape(-1),
                         att["x_v"].reshape(-1), att["x_g"].reshape(-1)])
        X4 = x.reshape(1, B * T, C) + xx.reshape(1, B * T, C) * mu4[:, None, :]
        s1 = jnp.einsum("nbk,nkd->nbd", X4, att["lora1"],
                        preferred_element_type=jnp.float32).astype(x.dtype)
        s1 = jnp.stack([jnp.tanh(s1[0]), s1[1], s1[2], jax.nn.sigmoid(s1[3])])
        s2 = jnp.einsum("nbd,ndc->nbc", s1, att["lora2"],
                        preferred_element_type=jnp.float32).astype(x.dtype)
        s2 = s2.reshape(4, B, T, s2.shape[-1])  # last dim is head-local under tp
        w_raw = s2[0] + att["w0"]
        a = jax.nn.sigmoid(s2[1] + att["a0"])
        v_gate_pre = s2[2] + att["v0"]
        g = s2[3]
    else:
        xw = x + xx * att["x_w"]
        xa = x + xx * att["x_a"]
        xv = x + xx * att["x_v"]
        xg = x + xx * att["x_g"]
        w_raw = matmul(jnp.tanh(matmul(xw, att["w1"])), att["w2"]) + att["w0"]
        a = jax.nn.sigmoid(matmul(matmul(xa, att["a1"]), att["a2"]) + att["a0"])
        g = matmul(jax.nn.sigmoid(matmul(xg, att["g1"])), att["g2"])
        v_gate_pre = matmul(matmul(xv, att["v1"]), att["v2"]) + att["v0"]

    # layer 0 captures v_first; later layers blend toward it (rwkv7.py:636-637)
    v_gate = jax.nn.sigmoid(v_gate_pre)
    v_first_new = jnp.where(layer_is_first, v, v_first)
    v = jnp.where(layer_is_first, v, v + (v_first - v) * v_gate)

    fused_step = getattr(wkv_fn, "fused_step", None)
    if fused_step is not None and T == 1:
        # serving decode: kk/k~/GroupNorm/bonus all fused into the WKV kernel
        # (ops/wkv7_pallas._wkv7_kernel_t1_fused); k and a go in RAW
        lnw_nh = att.get("ln_x_w_nh")
        lnb_nh = att.get("ln_x_b_nh")
        Hl = v.shape[-1] // N  # local heads (sharded under tp)
        if lnw_nh is None:
            lnw_nh = att["ln_x_w"].reshape(Hl, N).swapaxes(0, 1)
            lnb_nh = att["ln_x_b"].reshape(Hl, N).swapaxes(0, 1)
        if nh_layout:
            v_nh = v.reshape(B, N, Hl)      # free: channels already i-major
        else:
            v_nh = v.reshape(B, Hl, N).transpose(0, 2, 1)
        ln = jnp.ones((B,), jnp.int32) if lengths is None else lengths
        y_nh, wkv_full_new = fused_step(
            wkv_full, r[:, 0], w_raw[:, 0], k[:, 0], a[:, 0], v_nh,
            att["k_k"].reshape(-1), att["k_a"].reshape(-1),
            att["r_k"].reshape(-1), lnw_nh, lnb_nh, elapsed, ln, li)
        if nh_layout:
            y = y_nh.reshape(B, 1, Hl * N).astype(x.dtype)
        else:
            y = y_nh.transpose(0, 2, 1).reshape(B, 1, Hl * N).astype(x.dtype)
        # gate rides the mm8 kernel's quantization prologue (one fewer (B, C)
        # XLA pass; legal under tp — g and y are both head-local, and the
        # multiply precedes the row-parallel Wo)
        out = reduce_fn(matmul(y, att["Wo"], mul_in=g))
        new_shift = _masked_last(x, lengths, shift_prev)
        return out, new_shift, v_first_new, wkv_full_new

    fused_chunk = getattr(wkv_fn, "fused_chunk", None)
    if fused_chunk is not None and T > 1:
        # serving prefill: the whole TMix core (kk/k~ prologue, GroupNorm +
        # bonus epilogue) rides the chunk WKV kernel.
        # NOTE: deliberately mirrors the fused_step (T==1) branch above —
        # edits to either branch's layout/param handling must land in BOTH
        # (kept separate because the T==1 path strips the T axis from every
        # operand; a unified branch would re-introduce per-call reshapes)
        # (ops/wkv7_pallas.wkv7_pallas_chunk_fused); k and a go in RAW. The
        # XLA-side (B,T,4096)<->(B,T,64,64) retiles around the kernel
        # disappear — under nh_layout both reshapes below are free
        lnw_nh = att.get("ln_x_w_nh")
        lnb_nh = att.get("ln_x_b_nh")
        Hl = v.shape[-1] // N  # local heads (sharded under tp)
        if lnw_nh is None:
            lnw_nh = att["ln_x_w"].reshape(Hl, N).swapaxes(0, 1)
            lnb_nh = att["ln_x_b"].reshape(Hl, N).swapaxes(0, 1)
        if nh_layout:
            v_nh = v.reshape(B, T, N, Hl)   # free: channels already i-major
        else:
            v_nh = v.reshape(B, T, Hl, N).transpose(0, 1, 3, 2)
        ln = jnp.full((B,), T, jnp.int32) if lengths is None else lengths
        y4, wkv_full_new = fused_chunk(
            wkv_full, r, w_raw, k, a, v_nh, att["k_k"].reshape(-1),
            att["k_a"].reshape(-1), att["r_k"].reshape(-1), lnw_nh, lnb_nh,
            elapsed, ln, li)
        if nh_layout:
            y = y4.reshape(B, T, Hl * N).astype(x.dtype)
        else:
            y = y4.transpose(0, 1, 3, 2).reshape(B, T, Hl * N).astype(x.dtype)
        out = reduce_fn(matmul(y, att["Wo"], mul_in=g))
        new_shift = _masked_last(x, lengths, shift_prev)
        return out, new_shift, v_first_new, wkv_full_new

    Hl = k.shape[-1] // N  # local heads (sharded under tp)
    kk = _l2_normalize_heads(k * att["k_k"], Hl, N)
    k = k * (1 + (a - 1) * att["k_a"])
    kka = kk * a

    y, wkv_full_new = wkv_fn(wkv_full, r, w_raw, k, v, -kk, kka, elapsed,
                             lengths, li)
    y = y.astype(x.dtype)

    if nh_layout:
        # y/v are i-major (the kernel's native order, no back-transpose):
        # GroupNorm stats over the N axis, bonus via the same-layout v
        y4 = group_norm_nh(y.reshape(B, T, N, Hl), att["ln_x_w_nh"],
                           att["ln_x_b_nh"], eps=64e-5)
        bonus = (r * k * att["r_k"].reshape(-1)) \
            .reshape(B, T, Hl, N).sum(-1)                     # (B, T, Hl)
        y4 = y4 + bonus[:, :, None, :] * v.reshape(B, T, N, Hl)
        y = y4.reshape(B, T, Hl * N)
    else:
        y = group_norm(y, Hl, att["ln_x_w"], att["ln_x_b"], eps=64e-5)
        bonus = (r * k * att["r_k"].reshape(-1)) \
            .reshape(B, T, Hl, N).sum(-1, keepdims=True)
        y = y + (bonus * v.reshape(B, T, Hl, N)).reshape(B, T, Hl * N)
    out = reduce_fn(matmul(y, att["Wo"], mul_in=g))

    new_shift = _masked_last(x, lengths, shift_prev)
    return out, new_shift, v_first_new, wkv_full_new


def _cmix(ffn, x, shift_prev, lengths, reduce_fn=None):
    """Channel-mix FFN with relu^2. Reference: RWKV_x070_CMix_seq_batch
    (Albatross/rwkv7.py:674-679). Under tp, Wk is column-parallel and Wv
    row-parallel: the local output is a partial sum, reduce_fn psums it."""
    reduce_fn = reduce_fn or (lambda y: y)
    xx = _token_shift_delta(x, shift_prev)
    kx = x + xx * ffn["x_k"]
    if isinstance(ffn["Wk"], (mm8.Mm8Weight, mm8.LayerIndexed)) \
            and isinstance(ffn["Wv"], (mm8.Mm8Weight, mm8.LayerIndexed)):
        # whole FFN in one fused kernel where supported (relu² + both GEMMs).
        # NOTE (round 4): fusing the kx token-shift mix into the kernel's
        # quant prologue was measured +1.27 ms/step at B=384 — the in-kernel
        # mix SERIALIZES in front of the weight pipeline, while this separate
        # XLA pass overlaps the previous kernel's MXU work. Keep it in XLA.
        out = mm8.mm8_ffn_matmul(kx, ffn["Wk"], ffn["Wv"])
    else:
        kk = matmul(kx, ffn["Wk"], activation="relu2")
        out = matmul(kk, ffn["Wv"])
    new_shift = _masked_last(x, lengths, shift_prev)
    return reduce_fn(out), new_shift


def _backbone(params, x, state: RWKVState, lengths, wkv_fn, reduce_fn=None,
              nh_layout=False):
    """Run all layers with the recurrent state updated IN PLACE.

    A lax.scan with the state as xs/ys would allocate a fresh stacked ys buffer
    every call — inside the engine's multi-step decode scan that cost a full
    state copy per token (~0.4 GB at 1.5B, profiled at ~10% of the step). Instead
    the whole (L, ...) state rides the fori_loop carry and each layer
    dynamic-update-slices its slab, which XLA keeps in the donated input buffer."""
    L = state.wkv.shape[0]
    blocks = params["blocks"]

    def layer_step(li, carry):
        xc, v_first, shift, wkv = carry
        # Mm8Weight leaves stay stacked and the layer index travels with them
        # (LayerIndexed) so the pallas mm8 kernels read tiles straight from the
        # stacked buffer — slicing the codes here would materialize a full
        # per-layer weight copy in HBM in front of every opaque pallas call
        blk = jax.tree_util.tree_map(
            lambda a: (mm8.LayerIndexed(a, li)
                       if isinstance(a, (mm8.Mm8Weight, mm8.Mm8MultiWeight))
                       else jax.lax.dynamic_index_in_dim(a, li, 0, keepdims=False)),
            blocks,
            is_leaf=lambda a: isinstance(a, (mm8.Mm8Weight, mm8.Mm8MultiWeight)))
        shift_l = jax.lax.dynamic_index_in_dim(shift, li, 0, keepdims=False)
        is_first = (li == 0)
        xn = layer_norm(xc, blk["ln1_w"], blk["ln1_b"])
        att_out, att_shift, v_first, wkv = _tmix(
            blk["att"], li, is_first, xn, shift_l[0], v_first, wkv,
            state.elapsed, lengths, wkv_fn, reduce_fn, nh_layout)
        xc = xc + att_out
        xn = layer_norm(xc, blk["ln2_w"], blk["ln2_b"])
        ffn_out, ffn_shift = _cmix(blk["ffn"], xn, shift_l[1], lengths, reduce_fn)
        xc = xc + ffn_out
        new_shift_l = jnp.stack([att_shift, ffn_shift])
        shift = jax.lax.dynamic_update_index_in_dim(
            shift, new_shift_l.astype(shift.dtype), li, 0)
        return xc, v_first, shift, wkv

    # v_first is head-local under tp: its width comes from a per-head param
    # (k_k), NOT from the replicated x
    B, T = x.shape[0], x.shape[1]
    v_first0 = jnp.zeros((B, T, blocks["att"]["k_k"].shape[-1]), x.dtype)
    x_out, _, new_shift, new_wkv = jax.lax.fori_loop(
        0, L, layer_step, (x, v_first0, state.shift, state.wkv))
    return x_out, new_shift, new_wkv


def _embed(params, tokens, dtype):
    emb = params["emb"]
    return emb[jnp.clip(tokens, 0, emb.shape[0] - 1)].astype(dtype)


def _default_wkv_fn(wkv_full, r, w_raw, k, v, a, b, elapsed, lengths, layer):
    """lax.scan reference WKV on layer `layer` of the stacked state."""
    wkv_l = jax.lax.dynamic_index_in_dim(wkv_full, layer, 0, keepdims=False)
    y, new_l = wkv7_ops.wkv7_reference_batch(
        wkv_l, r, w_raw, k, v, a, b, elapsed, lengths=lengths)
    return y, jax.lax.dynamic_update_index_in_dim(
        wkv_full, new_l.astype(wkv_full.dtype), layer, 0)


def forward_chunk(params, tokens, state: RWKVState, lengths=None, *,
                  wkv_fn: Optional[Callable] = None,
                  compute_dtype=jnp.float32, reduce_fn=None,
                  nh_layout=False) -> RWKVState:
    """Prefill a chunk: advance state over tokens (B, T); no logits computed
    (the head matmul is skipped — the last prompt token always goes through
    forward_step, mirroring the reference's one-prefill phase, worker.py:447-476).

    lengths: (B,) int32 valid token counts per row (rows may be ragged/inactive)."""
    wkv_fn = wkv_fn or _default_wkv_fn
    x = _embed(params, tokens, compute_dtype)
    _, new_shift, new_wkv = _backbone(params, x, state, lengths, wkv_fn,
                                      reduce_fn, nh_layout)
    T = tokens.shape[1]
    n_tok = jnp.full_like(state.elapsed, T) if lengths is None else lengths
    return RWKVState(shift=new_shift, wkv=new_wkv, elapsed=state.elapsed + n_tok)


def forward_step(params, tokens, state: RWKVState, active=None, *,
                 wkv_fn: Optional[Callable] = None, compute_dtype=jnp.float32,
                 reduce_fn=None, nh_layout=False):
    """One-token step for the whole batch: tokens (B,) -> logits (B, V) fp32.

    active: optional (B,) bool; inactive rows keep their state and yield garbage
    logits (the scheduler masks them). Reference: forward_seq_batch with T=1
    (worker.py:671-742).

    Logits keep the head matmul's output dtype (bf16 in serving config —
    the old unconditional astype(f32) added NO precision, the mm8 head
    kernel had already rounded to bf16, and it cost a full 50+201 MB
    HBM convert pass per step at 7.2B; consumers promote where needed)."""
    wkv_fn = wkv_fn or _default_wkv_fn
    B = tokens.shape[0]
    lengths = None if active is None else active.astype(jnp.int32)
    x = _embed(params, tokens[:, None], compute_dtype)
    x_out, new_shift, new_wkv = _backbone(params, x, state, lengths, wkv_fn,
                                          reduce_fn, nh_layout)
    xh = layer_norm(x_out[:, 0], params["ln_out_w"], params["ln_out_b"])
    logits = matmul(xh, params["head"])
    n_tok = jnp.ones_like(state.elapsed) if lengths is None else lengths
    new_state = RWKVState(shift=new_shift, wkv=new_wkv, elapsed=state.elapsed + n_tok)
    return logits, new_state


def forward_seq(params, tokens, state: RWKVState, *, full_output=False,
                wkv_fn: Optional[Callable] = None, compute_dtype=jnp.float32,
                reduce_fn=None):
    """Whole-sequence forward with logits — the eval/oracle path
    (reference forward_seq_batch, rwkv7.py:352-382)."""
    wkv_fn = wkv_fn or _default_wkv_fn
    x = _embed(params, tokens, compute_dtype)
    x_out, new_shift, new_wkv = _backbone(params, x, state, None, wkv_fn,
                                          reduce_fn)
    if not full_output:
        x_out = x_out[:, -1:, :]
    xh = layer_norm(x_out, params["ln_out_w"], params["ln_out_b"])
    logits = matmul(xh, params["head"]).astype(jnp.float32)
    if not full_output:
        logits = logits[:, 0]
    T = tokens.shape[1]
    new_state = RWKVState(shift=new_shift, wkv=new_wkv,
                          elapsed=state.elapsed + jnp.int32(T))
    return logits, new_state
