"""Pallas TPU kernel for the WKV7 recurrent state update.

Replaces the reference's fused CUDA kernel (Albatross/cuda/rwkv7_state_fwd_fp16.cu:
26-97, one thread-block per (batch, head), state in registers across the T loop) with
a TPU-native design:

- grid over the batch; each program owns one request's full per-layer state as an
  (N, H*N) VMEM tile carried in fp32 across a fori_loop over the token chunk, so HBM
  sees exactly one read + one write of the state per chunk (the hot-loop bandwidth
  floor);
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

from chirrup_tpu.ops.wkv7 import HEAD_SIZE, _EXP_NEG_HALF, _DITHER_SCALE

_N = HEAD_SIZE


def _dither_scalar(step_i32):
    """rotator1 as a (1, 1) vector (Mosaic's tpu.bitcast only accepts vectors)."""
    u = (jnp.uint32(2654435769) * step_i32.astype(jnp.uint32)).reshape(1, 1)
    return jax.lax.bitcast_convert_type(u, jnp.int32).astype(jnp.float32) * _DITHER_SCALE


def _dot32(x, y, precision=jax.lax.Precision.HIGHEST):
    """f32 matmul with f32 accumulation. TPU MXU (and its interpret-mode emulation)
    rounds f32 dot INPUTS to bf16 at default precision; HIGHEST runs multi-pass
    full-f32. Even the default exceeds the reference kernel's fp16 accumulation
    (cuda kernel :65-81), so serving may trade passes for speed."""
    return jnp.dot(x, y, preferred_element_type=jnp.float32, precision=precision)


def _wkv7_kernel(elapsed_ref, length_ref, state_ref, r_ref, w_ref, k_ref, a_ref,
                 b_ref, v2_ref, y2_ref, state_out_ref, *, T, use_dither,
                 precision):
    b = pl.program_id(0)
    HN = state_ref.shape[2]
    H = HN // _N
    f32 = jnp.float32

    # constant per-head segment matrices, built on the fly (VPU iota compares)
    lane_head = jax.lax.broadcasted_iota(jnp.int32, (HN, H), 0) // _N
    head_id = jax.lax.broadcasted_iota(jnp.int32, (HN, H), 1)
    seg = (lane_head == head_id).astype(f32)          # (HN, H): reduce j within head
    segT = seg.T                                      # (H, HN): broadcast per head

    elapsed = elapsed_ref[b]
    length = length_ref[b]

    S0 = state_ref[0].astype(f32)  # (N, HN)

    def body(t, S):
        active = t < length
        r_row = r_ref[0, pl.ds(t, 1), :].astype(f32)      # (1, HN)
        w_row = w_ref[0, pl.ds(t, 1), :].astype(f32)
        k_row = k_ref[0, pl.ds(t, 1), :].astype(f32)
        a_row = a_ref[0, pl.ds(t, 1), :].astype(f32)
        b_row = b_ref[0, pl.ds(t, 1), :].astype(f32)
        v_nh = v2_ref[0, t].astype(f32)                    # (N, H), i-on-sublane

        d_row = jnp.exp(-_EXP_NEG_HALF * jax.nn.sigmoid(w_row)) - 1.0
        if use_dither:
            d_row = d_row + _dither_scalar(elapsed + t)

        sa = _dot32(S * a_row, seg, precision)       # (N, H)
        sa_exp = _dot32(sa, segT, precision)         # (N, HN)
        v_exp = _dot32(v_nh, segT, precision)        # (N, HN)
        S_new = S + S * d_row + v_exp * k_row + sa_exp * b_row
        y = _dot32(S_new * r_row, seg, precision)    # (N, H)
        y2_ref[0, t] = jnp.where(active, y, 0.0).astype(y2_ref.dtype)
        return jnp.where(active, S_new, S)

    S_fin = jax.lax.fori_loop(0, T, body, S0, unroll=(T == 1))
    state_out_ref[0] = S_fin.astype(state_out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("use_dither", "interpret",
                                              "precision"))
def _wkv7_pallas_call(state, r, w_raw, k, a, b, v2, elapsed, lengths, *,
                      use_dither=True, interpret=False, precision="highest"):
    B, T, HN = r.shape
    N = _N
    H = HN // N

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # elapsed, lengths
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, HN), lambda i, *_: (i, 0, 0)),       # state
            pl.BlockSpec((1, T, HN), lambda i, *_: (i, 0, 0)),       # r
            pl.BlockSpec((1, T, HN), lambda i, *_: (i, 0, 0)),       # w
            pl.BlockSpec((1, T, HN), lambda i, *_: (i, 0, 0)),       # k
            pl.BlockSpec((1, T, HN), lambda i, *_: (i, 0, 0)),       # a
            pl.BlockSpec((1, T, HN), lambda i, *_: (i, 0, 0)),       # b
            pl.BlockSpec((1, T, N, H), lambda i, *_: (i, 0, 0, 0)),  # v2
        ],
        out_specs=[
            pl.BlockSpec((1, T, N, H), lambda i, *_: (i, 0, 0, 0)),  # y2
            pl.BlockSpec((1, N, HN), lambda i, *_: (i, 0, 0)),       # state_out
        ],
    )

    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
    kernel = functools.partial(_wkv7_kernel, T=T, use_dither=use_dither,
                               precision=prec)
    y2, state_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, T, N, H), r.dtype),
            jax.ShapeDtypeStruct(state.shape, state.dtype),
        ],
        input_output_aliases={2: 1},  # state buffer updated in place
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * B * T * N * HN * H + 4 * B * T * N * HN,
            bytes_accessed=2 * B * N * HN * state.dtype.itemsize
            + 6 * B * T * HN * r.dtype.itemsize,
            transcendentals=B * T * HN,
        ),
    )(elapsed, lengths, state, r, w_raw, k, a, b, v2)
    return y2, state_out


def wkv7_pallas_batch(state, r, w_raw, k, v, a, b, elapsed, *, lengths=None,
                      use_dither=True, interpret=False, precision="highest"):
    """Drop-in replacement for ops.wkv7.wkv7_reference_batch.

    state: (B, N, H*N); r..b: (B, T, C=H*N); elapsed: (B,) int32;
    lengths: optional (B,) int32. Returns y (B, T, C) in r.dtype, new_state.
    """
    B, T, C = r.shape
    N = _N
    H = C // N
    if lengths is None:
        lengths = jnp.full((B,), T, jnp.int32)
    # v to "i-on-sublane" layout (B, T, N, H)
    v2 = v.reshape(B, T, H, N).transpose(0, 1, 3, 2)
    y2, new_state = _wkv7_pallas_call(
        state, r, w_raw, k, a, b, v2, elapsed.astype(jnp.int32),
        lengths.astype(jnp.int32), use_dither=use_dither, interpret=interpret,
        precision=precision)
    y = y2.transpose(0, 1, 3, 2).reshape(B, T, C)
    return y, new_state
