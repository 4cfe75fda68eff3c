"""WKV7 — the RWKV-7 "Goose" recurrent state update.

Math (per head h, for each token t; state S is an (N, N) matrix with row index i =
value dim, column index j = key dim):

    decay_j = exp(-e^{-1/2} * sigmoid(w_raw_j)) - 1 + dither(elapsed + t)
    sa_i    = sum_j a_j * S_ij                        # S @ a
    S_ij   += S_ij * decay_j + k_j * v_i + sa_i * b_j # S <- S diag(w) + v k^T + (S a) b^T
    y_i     = sum_j S_ij * r_j                        # y = S r

where the caller passes a = -kk and b = kk * (in-context learning rate), kk being the
per-head L2-normalized key. Behavior matches the reference fused CUDA kernel
(/root/reference/Albatross/cuda/rwkv7_state_fwd_fp16.cu:26-97) including the FP16
"dither" rotator1 term that decorrelates rounding of the decayed state across steps
(`2^-41 * float(int32(2654435769 * (elapsed_t + t)))`, :20-23,59). The dither only
matters when the state is stored in 16-bit floats; it is kept for parity and is
numerically harmless for fp32 state.

State memory layout (TPU-first): this module stores each request's per-layer state as
a single (N, H*N) matrix, element [i, h*N + j] = S^{(h)}_ij. The last dimension is
H*N (>=128 and a multiple of 128 for real models), so HBM/VMEM (8,128) tiling is
dense — a naive (H, N, N) layout with trailing dim 64 would be lane-padded 2x by XLA,
doubling the bandwidth of the hottest loop in the engine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

HEAD_SIZE = 64

# exp2-form constants mirrored from the reference kernel (cuda/rwkv7_state_fwd_fp16.cu:21)
_EXP_NEG_HALF = 0.6065306597126334  # e^{-1/2}
_DITHER_SCALE = 2.0 ** -41
# numpy scalar, NOT jnp: a jnp constant here would initialize the JAX backend at
# import time (and fail the import outright when the TPU tunnel is down)
_DITHER_MULT = np.uint32(2654435769)


def dither(step_index):
    """rotator1: pseudo-random in ~(-2^-10, 2^-10) from an int32 token counter.

    Reference: cuda/rwkv7_state_fwd_fp16.cu:20-23 `rotator1(A)=2^-41*float(int32(2654435769*A))`.
    """
    u = _DITHER_MULT * step_index.astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(u, jnp.int32).astype(jnp.float32) * _DITHER_SCALE


def decay_from_raw(w_raw, step_index, use_dither: bool = True):
    """Map raw decay logits to the in-kernel multiplier `decay - 1 (+ dither)`.

    decay = exp(-e^{-1/2} * sigmoid(w_raw)) in (e^{-e^{-1/2}}, 1); the kernel applies
    S += S * (decay - 1 + dither) so the stored multiplier is the offset form.
    """
    d = jnp.exp(-_EXP_NEG_HALF * jax.nn.sigmoid(w_raw.astype(jnp.float32))) - 1.0
    if use_dither:
        d = d + dither(step_index)
    return d


def _to_mat(x, H, N):
    """(..., H*N) -> (..., H, N)."""
    return x.reshape(x.shape[:-1] + (H, N))


def wkv7_reference(state, r, w_raw, k, v, a, b, elapsed_t, *, use_dither: bool = True,
                   length=None):
    """Pure-JAX (lax.scan) WKV7 for one request. The parity oracle for the Pallas kernel.

    Args:
      state: (N, H*N) float — S[i, h*N+j]; returned updated (functionally).
      r, w_raw, k, v, a, b: (T, C=H*N).
      elapsed_t: () int32 token counter feeding the dither. NOT advanced here: the
        reference increments it once per forward pass after all layers
        (Albatross/rwkv7.py:552), every layer seeing the same counter.
      length: optional () int32 — tokens beyond it leave the state untouched and
        produce zero outputs (used for ragged batched prefill).

    Returns:
      y: (T, C) float32, new_state: (N, H*N).
    """
    T, C = r.shape
    N = HEAD_SIZE
    H = C // N
    f32 = jnp.float32

    # (T, H, N) fp32 working copies
    rs, ks, vs, as_, bs = (_to_mat(x.astype(f32), H, N) for x in (r, k, v, a, b))
    ws = _to_mat(w_raw, H, N)

    S0 = state.astype(f32).reshape(N, H, N).transpose(1, 0, 2)  # (H, N_i, N_j)

    def step(carry, inp):
        S = carry
        r_t, w_t, k_t, v_t, a_t, b_t, t = inp
        d = decay_from_raw(w_t, elapsed_t + t, use_dither=use_dither)  # (H, N)
        sa = jnp.einsum("hij,hj->hi", S, a_t)
        S_new = S + S * d[:, None, :] + v_t[:, :, None] * k_t[:, None, :] \
            + sa[:, :, None] * b_t[:, None, :]
        y = jnp.einsum("hij,hj->hi", S_new, r_t)
        if length is not None:
            active = t < length
            S_new = jnp.where(active, S_new, S)
            y = jnp.where(active, y, jnp.zeros_like(y))
        return S_new, y

    ts = jnp.arange(T, dtype=jnp.int32)
    S_fin, ys = jax.lax.scan(step, S0, (rs, ws, ks, vs, as_, bs, ts))
    new_state = S_fin.transpose(1, 0, 2).reshape(N, H * N).astype(state.dtype)
    return ys.reshape(T, C), new_state


def wkv7_reference_batch(state, r, w_raw, k, v, a, b, elapsed_t, *, use_dither=True,
                         lengths=None):
    """vmapped wkv7_reference over a leading batch dim.

    state: (B, N, H*N); r..b: (B, T, C); elapsed_t: (B,); lengths: optional (B,).
    """
    fn = functools.partial(wkv7_reference, use_dither=use_dither)
    if lengths is None:
        return jax.vmap(lambda s, *xs: fn(s, *xs))(state, r, w_raw, k, v, a, b, elapsed_t)
    return jax.vmap(lambda s, r_, w_, k_, v_, a_, b_, e_, l_:
                    fn(s, r_, w_, k_, v_, a_, b_, e_, length=l_))(
        state, r, w_raw, k, v, a, b, elapsed_t, lengths)
