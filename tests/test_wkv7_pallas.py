"""Pallas WKV7 kernel vs the lax.scan reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chirrup_tpu.ops.wkv7 import wkv7_reference_batch, HEAD_SIZE
from chirrup_tpu.ops.wkv7_pallas import wkv7_pallas_batch


def _rand_inputs(rng, B, T, H, state_dtype=jnp.float32, in_dtype=jnp.float32):
    C = H * HEAD_SIZE
    N = HEAD_SIZE

    def r(*s, scale=0.5):
        return jnp.asarray(rng.standard_normal(s) * scale, in_dtype)

    state = jnp.asarray(rng.standard_normal((B, N, C)) * 0.3, state_dtype)
    rr, ww, kk, vv = r(B, T, C), r(B, T, C), r(B, T, C), r(B, T, C)
    # a = -kk_norm, b = kk_norm * iclr with |kk_norm| = 1 per head
    kkn = rng.standard_normal((B, T, H, N))
    kkn = kkn / np.linalg.norm(kkn, axis=-1, keepdims=True)
    iclr = 1 / (1 + np.exp(-rng.standard_normal((B, T, C))))
    aa = jnp.asarray(-kkn.reshape(B, T, C), in_dtype)
    bb = jnp.asarray(kkn.reshape(B, T, C) * iclr, in_dtype)
    elapsed = jnp.asarray(rng.integers(0, 1000, (B,)), jnp.int32)
    return state, rr, ww, kk, vv, aa, bb, elapsed


@pytest.mark.parametrize("B,T,H", [(1, 1, 2), (3, 1, 2), (2, 7, 2), (2, 16, 4)])
def test_pallas_matches_reference(rng, B, T, H):
    state, r, w, k, v, a, b, elapsed = _rand_inputs(rng, B, T, H)
    y_ref, s_ref = wkv7_reference_batch(state, r, w, k, v, a, b, elapsed)
    y_pl, s_pl = wkv7_pallas_batch(state, r, w, k, v, a, b, elapsed, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_pl), np.asarray(s_ref), rtol=1e-5, atol=1e-5)


def test_pallas_ragged_lengths(rng):
    B, T, H = 3, 8, 2
    state, r, w, k, v, a, b, elapsed = _rand_inputs(rng, B, T, H)
    lengths = jnp.asarray([8, 3, 0], jnp.int32)
    y_ref, s_ref = wkv7_reference_batch(state, r, w, k, v, a, b, elapsed,
                                        lengths=lengths)
    y_pl, s_pl = wkv7_pallas_batch(state, r, w, k, v, a, b, elapsed,
                                   lengths=lengths, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_pl), np.asarray(s_ref), rtol=1e-5, atol=1e-5)
    # masked row's state untouched, masked outputs zero
    np.testing.assert_array_equal(np.asarray(s_pl[2]), np.asarray(state[2]))
    assert np.all(np.asarray(y_pl[1, 3:]) == 0)


def test_pallas_fp16_state(rng):
    """fp16-stored state: kernel computes fp32 internally, rounds on writeback."""
    B, T, H = 2, 4, 2
    state, r, w, k, v, a, b, elapsed = _rand_inputs(rng, B, T, H,
                                                    state_dtype=jnp.float16)
    y_ref, s_ref = wkv7_reference_batch(state, r, w, k, v, a, b, elapsed)
    y_pl, s_pl = wkv7_pallas_batch(state, r, w, k, v, a, b, elapsed, interpret=True)
    assert s_pl.dtype == jnp.float16
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(s_pl, np.float32),
                               np.asarray(s_ref, np.float32), rtol=2e-3, atol=2e-3)


def test_dither_changes_with_elapsed(rng):
    """The dither must key off the elapsed counter (long-sequence fp16 stabilizer,
    reference cuda kernel :59)."""
    B, T, H = 1, 1, 2
    state, r, w, k, v, a, b, _ = _rand_inputs(rng, B, T, H)
    y0, _ = wkv7_pallas_batch(state, r, w, k, v, a, b,
                              jnp.asarray([0], jnp.int32), interpret=True)
    y1, _ = wkv7_pallas_batch(state, r, w, k, v, a, b,
                              jnp.asarray([12345], jnp.int32), interpret=True)
    assert not np.allclose(np.asarray(y0), np.asarray(y1))
    # and without dither, elapsed must not matter
    y2, _ = wkv7_pallas_batch(state, r, w, k, v, a, b,
                              jnp.asarray([0], jnp.int32), use_dither=False,
                              interpret=True)
    y3, _ = wkv7_pallas_batch(state, r, w, k, v, a, b,
                              jnp.asarray([999], jnp.int32), use_dither=False,
                              interpret=True)
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(y3))


def test_stacked_layer_update_preserves_other_layers(rng):
    """layer=li advances only that slab of the stacked (L, B, N, HN) state and
    leaves every other layer's slab bit-identical (the in-place aliased path the
    serving backbone uses)."""
    B, T, H, L = 2, 3, 2, 4
    state_l, r, w, k, v, a, b, elapsed = _rand_inputs(rng, B, T, H)
    stacked = jnp.stack([state_l * (i + 1) for i in range(L)])
    for li in (0, 2, L - 1):
        y_ref, s_ref = wkv7_reference_batch(stacked[li], r, w, k, v, a, b, elapsed)
        y_pl, s_new = wkv7_pallas_batch(stacked, r, w, k, v, a, b, elapsed,
                                        layer=jnp.int32(li), interpret=True)
        assert s_new.shape == stacked.shape
        np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(s_new[li]), np.asarray(s_ref),
                                   rtol=2e-5, atol=2e-5)
        for other in range(L):
            if other != li:
                np.testing.assert_array_equal(np.asarray(s_new[other]),
                                              np.asarray(stacked[other]))


def test_fused_tmix_step_matches_composition(rng):
    """wkv7_pallas_step_fused (kk/k~ prologue + GroupNorm/bonus epilogue
    in-kernel) == the unfused composition: l2norm -> reference WKV ->
    group_norm -> bonus (reference TMix, Albatross/rwkv7.py:628-648)."""
    import jax
    from chirrup_tpu.models.rwkv7 import group_norm, _l2_normalize_heads
    from chirrup_tpu.ops.wkv7 import wkv7_reference_batch
    from chirrup_tpu.ops.wkv7_pallas import wkv7_pallas_step_fused

    B, L, H, N = 4, 2, 3, 64
    C = H * N
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    r, w, k_raw, v = f(B, C), f(B, C), f(B, C), f(B, C)
    a_iclr = jax.nn.sigmoid(f(B, C))
    k_k, k_a, r_k = f(C) * 0.5, f(C) * 0.5, f(C) * 0.5
    lnw, lnb = f(C) * 0.3 + 1.0, f(C) * 0.1
    state = jnp.asarray(rng.standard_normal((L, B, N, C)) * 0.2, jnp.float32)
    elapsed = jnp.arange(B, dtype=jnp.int32) * 7
    lengths = jnp.ones((B,), jnp.int32)
    li = 1

    # unfused composition
    kk = _l2_normalize_heads(k_raw * k_k, H, N)
    k_t = k_raw * (1 + (a_iclr - 1) * k_a)
    y_ref, s_ref = wkv7_reference_batch(
        state[li], r[:, None], w[:, None], k_t[:, None], v[:, None],
        (-kk)[:, None], (kk * a_iclr)[:, None], elapsed)
    y_ref = group_norm(y_ref, H, lnw, lnb, eps=64e-5)
    bonus = (r * k_t * r_k).reshape(B, H, N).sum(-1)[:, :, None]   # (B, H, 1)
    y_ref = (y_ref.reshape(B, H, N) + bonus * v.reshape(B, H, N))  # (B, H, N)

    v_nh = v.reshape(B, H, N).transpose(0, 2, 1)
    lnw_nh = lnw.reshape(H, N).swapaxes(0, 1)
    lnb_nh = lnb.reshape(H, N).swapaxes(0, 1)
    y_f, s_f = wkv7_pallas_step_fused(
        state, li, r, w, k_raw, a_iclr, v_nh, k_k, k_a, r_k, lnw_nh, lnb_nh,
        elapsed, lengths, interpret=True)
    np.testing.assert_allclose(np.asarray(y_f.transpose(0, 2, 1)),
                               np.asarray(y_ref), rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(s_f[li]), np.asarray(s_ref),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_array_equal(np.asarray(s_f[0]), np.asarray(state[0]))


def _fused_chunk_oracle(rng, B, T, H, L, li, lengths):
    """Build raw TMix inputs and the unfused composition's outputs
    (l2norm prologue -> reference WKV -> group_norm -> bonus)."""
    from chirrup_tpu.models.rwkv7 import group_norm, _l2_normalize_heads

    N = HEAD_SIZE
    C = H * N
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    r, w, k_raw, v = f(B, T, C), f(B, T, C), f(B, T, C), f(B, T, C)
    a_iclr = jax.nn.sigmoid(f(B, T, C))
    k_k, k_a, r_k = f(C) * 0.5, f(C) * 0.5, f(C) * 0.5
    lnw, lnb = f(C) * 0.3 + 1.0, f(C) * 0.1
    state = jnp.asarray(rng.standard_normal((L, B, N, C)) * 0.2, jnp.float32)
    elapsed = jnp.asarray(rng.integers(0, 1000, (B,)), jnp.int32)

    kk = _l2_normalize_heads(k_raw * k_k, H, N)
    k_t = k_raw * (1 + (a_iclr - 1) * k_a)
    y_ref, s_ref = wkv7_reference_batch(
        state[li], r, w, k_t, v, -kk, kk * a_iclr, elapsed, lengths=lengths)
    y_ref = group_norm(y_ref, H, lnw, lnb, eps=64e-5)
    bonus = (r * k_t * r_k).reshape(B, T, H, N).sum(-1, keepdims=True)
    y_ref = y_ref + (bonus * v.reshape(B, T, H, N)).reshape(B, T, C)

    inputs = (state, li, r, w, k_raw, a_iclr,
              v.reshape(B, T, H, N).transpose(0, 1, 3, 2),  # v_nh (B,T,N,H)
              k_k, k_a, r_k, lnw.reshape(H, N).swapaxes(0, 1),
              lnb.reshape(H, N).swapaxes(0, 1), elapsed, lengths)
    return inputs, y_ref, s_ref, state


def _check_fused_chunk(inputs, y_ref, s_ref, state, lengths):
    from chirrup_tpu.ops.wkv7_pallas import wkv7_pallas_chunk_fused

    li = inputs[1]
    B, T, N, H = inputs[6].shape
    y4, s_f = wkv7_pallas_chunk_fused(*inputs, interpret=True,
                                      precision="highest")
    assert y4.shape == (B, T, N, H)
    y_f = np.asarray(y4.transpose(0, 1, 3, 2).reshape(B, T, H * N))
    # the fused kernel ZEROES masked positions; the unfused composition's
    # GroupNorm turns the kernel's zeros into ln_b there (inactive rows'
    # activations are never consumed — see the _wkv7_kernel INVARIANT note)
    for bi in range(B):
        L_i = int(lengths[bi])
        np.testing.assert_allclose(y_f[bi, :L_i], np.asarray(y_ref)[bi, :L_i],
                                   rtol=5e-4, atol=5e-4)
        assert np.all(y_f[bi, L_i:] == 0)
    np.testing.assert_allclose(np.asarray(s_f[li]), np.asarray(s_ref),
                               rtol=5e-4, atol=5e-4)
    for other in range(s_f.shape[0]):
        if other != li:
            np.testing.assert_array_equal(np.asarray(s_f[other]),
                                          np.asarray(state[other]))
    # fully-masked row's slab passes through untouched
    dead = [bi for bi in range(B) if int(lengths[bi]) == 0]
    for bi in dead:
        np.testing.assert_array_equal(np.asarray(s_f[li][bi]),
                                      np.asarray(state[li][bi]))


def test_fused_tmix_chunk_matches_composition(rng):
    """wkv7_pallas_chunk_fused (grouped-8 variant) == the unfused composition
    on a ragged T>1 chunk, incl. T padding (12 -> 16) and stacked-layer
    aliasing (reference TMix, Albatross/rwkv7.py:628-648)."""
    lengths = jnp.asarray([12, 5, 0], jnp.int32)
    inputs, y_ref, s_ref, state = _fused_chunk_oracle(
        rng, B=3, T=12, H=2, L=3, li=1, lengths=lengths)
    _check_fused_chunk(inputs, y_ref, s_ref, state, lengths)


def test_fused_tmix_chunk_tblocked(rng, monkeypatch):
    """The T-BLOCKED fused chunk kernel (state carried in VMEM scratch across
    token blocks) matches the same oracle. The blocked path only wins at real
    scale, so force the dispatch by pinning the tile pickers."""
    from chirrup_tpu.ops import wkv7_pallas as wp

    monkeypatch.setattr(wp, "_pick_batch_tile",
                        lambda *a, **k: 1)
    monkeypatch.setattr(wp, "_pick_batch_tile_blocked",
                        lambda B, *a, **k: 8 if B % 8 == 0 else 0)
    lengths = jnp.asarray([16, 9, 3, 0, 16, 1, 8, 11], jnp.int32)
    inputs, y_ref, s_ref, state = _fused_chunk_oracle(
        rng, B=8, T=16, H=2, L=2, li=0, lengths=lengths)
    _check_fused_chunk(inputs, y_ref, s_ref, state, lengths)


def test_bf16_compute_precision_mode(rng):
    """precision="bf16" (state-tile elementwise in packed bf16 via the
    delta-form update `S += S*d + v k^T + sa b^T` — the reference fp16
    kernel's own scheme, cuda/rwkv7_state_fwd_fp16.cu:78) stays close to the
    f32-compute reference on bf16-stored state, and bit-preserves masked
    rows (d=0, k=0, b=0 => S + 0 == S exactly in bf16)."""
    for B, T, H in ((3, 1, 2), (2, 16, 2)):
        state, r, w, k, v, a, b, elapsed = _rand_inputs(
            rng, B, T, H, state_dtype=jnp.bfloat16, in_dtype=jnp.bfloat16)
        y_ref, s_ref = wkv7_reference_batch(
            state.astype(jnp.float32), r, w, k, v, a, b, elapsed)
        y_pl, s_pl = wkv7_pallas_batch(state, r, w, k, v, a, b, elapsed,
                                       interpret=True, precision="bf16")
        assert s_pl.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(y_pl, np.float32),
                                   np.asarray(y_ref), rtol=4e-2, atol=4e-2)
        np.testing.assert_allclose(np.asarray(s_pl, np.float32),
                                   np.asarray(s_ref), rtol=4e-2, atol=4e-2)

    # ragged mask: inactive rows' bf16 state passes through bit-identical
    B, T, H = 3, 8, 2
    state, r, w, k, v, a, b, elapsed = _rand_inputs(
        rng, B, T, H, state_dtype=jnp.bfloat16, in_dtype=jnp.bfloat16)
    lengths = jnp.asarray([8, 3, 0], jnp.int32)
    y_pl, s_pl = wkv7_pallas_batch(state, r, w, k, v, a, b, elapsed,
                                   lengths=lengths, interpret=True,
                                   precision="bf16")
    np.testing.assert_array_equal(
        np.asarray(s_pl[2], np.float32), np.asarray(state[2], np.float32))
    assert np.all(np.asarray(y_pl[1, 3:], np.float32) == 0)


def test_bf16_compute_fused_step(rng):
    """The TMix-fused decode kernel under precision="bf16" matches its own
    f32-compute output within bf16 rounding of one step."""
    from chirrup_tpu.ops.wkv7_pallas import wkv7_pallas_step_fused

    B, L, H, N = 4, 2, 2, 64
    C = H * N
    bf = jnp.bfloat16
    f = lambda *s: jnp.asarray(rng.standard_normal(s), bf)
    r, w, k_raw, v = f(B, C), f(B, C), f(B, C), f(B, C)
    a_iclr = jax.nn.sigmoid(f(B, C).astype(jnp.float32)).astype(bf)
    k_k, k_a, r_k = f(C) * 0.5, f(C) * 0.5, f(C) * 0.5
    lnw_nh, lnb_nh = f(N, H), f(N, H)
    state = jnp.asarray(rng.standard_normal((L, B, N, C)) * 0.2, bf)
    elapsed = jnp.arange(B, dtype=jnp.int32) * 7
    lengths = jnp.ones((B,), jnp.int32)
    v_nh = v.reshape(B, H, N).transpose(0, 2, 1)

    y32, s32 = wkv7_pallas_step_fused(
        state, 1, r, w, k_raw, a_iclr, v_nh, k_k, k_a, r_k, lnw_nh, lnb_nh,
        elapsed, lengths, interpret=True, precision="default")
    y16, s16 = wkv7_pallas_step_fused(
        state, 1, r, w, k_raw, a_iclr, v_nh, k_k, k_a, r_k, lnw_nh, lnb_nh,
        elapsed, lengths, interpret=True, precision="bf16")
    np.testing.assert_allclose(np.asarray(y16, np.float32),
                               np.asarray(y32, np.float32),
                               rtol=4e-2, atol=4e-2)
    np.testing.assert_allclose(np.asarray(s16, np.float32),
                               np.asarray(s32, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_array_equal(np.asarray(s16[0], np.float32),
                                  np.asarray(state[0], np.float32))
