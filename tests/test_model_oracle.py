"""JAX model vs independent numpy oracle, plus seq/step equivalence and masking."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chirrup_tpu.models.config import RWKV7Config
from chirrup_tpu.models.loader import synthetic_params
from chirrup_tpu.models import rwkv7 as m

from tests import oracle_numpy as oracle

CFG = RWKV7Config(n_layer=3, n_embd=128, vocab_size=512,
                  d_decay_lora=32, d_iclr_lora=32, d_v_lora=16, d_gate_lora=32)


@pytest.fixture(scope="module")
def params():
    return synthetic_params(CFG, seed=7)


def _np_params(params):
    return jax.tree_util.tree_map(np.asarray, params)


def test_forward_seq_matches_oracle(params):
    tokens = np.array([3, 17, 255, 42, 9, 100, 7, 511], np.int32)
    ref_logits, _ = oracle.forward_tokens(_np_params(params), tokens)

    state = m.init_state(CFG, 1)
    logits, _ = m.forward_seq(params, jnp.asarray(tokens)[None, :], state,
                              full_output=True)
    got = np.asarray(logits[0])
    np.testing.assert_allclose(got, ref_logits, rtol=2e-3, atol=2e-3)


def test_step_matches_seq(params):
    """Feeding tokens one-by-one through forward_step must equal one forward_seq."""
    tokens = np.array([5, 77, 300, 2, 450, 31], np.int32)
    state = m.init_state(CFG, 1)
    logits_seq, state_seq = m.forward_seq(params, jnp.asarray(tokens)[None], state,
                                          full_output=True)

    state2 = m.init_state(CFG, 1)
    outs = []
    for t in tokens:
        lg, state2 = m.forward_step(params, jnp.asarray([t]), state2)
        outs.append(np.asarray(lg[0]))
    np.testing.assert_allclose(np.stack(outs), np.asarray(logits_seq[0]),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(state2.wkv), np.asarray(state_seq.wkv),
                               rtol=2e-3, atol=2e-3)
    assert int(state2.elapsed[0]) == len(tokens)
    assert int(state_seq.elapsed[0]) == len(tokens)


def test_forward_chunk_ragged_lengths(params):
    """Ragged chunked prefill: masked rows must be untouched; active rows must match
    an unmasked run of their own length."""
    B, T = 3, 6
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, CFG.vocab_size, (B, T)).astype(np.int32)
    lengths = jnp.asarray([6, 3, 0], jnp.int32)

    state = m.init_state(CFG, B)
    new_state = m.forward_chunk(params, jnp.asarray(tokens), state, lengths)

    # row 0: full-length reference
    s0 = m.init_state(CFG, 1)
    s0 = m.forward_chunk(params, jnp.asarray(tokens[:1]), s0)
    np.testing.assert_allclose(np.asarray(new_state.wkv[:, 0]),
                               np.asarray(s0.wkv[:, 0]), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(new_state.shift[:, :, 0]),
                               np.asarray(s0.shift[:, :, 0]), rtol=2e-3, atol=2e-3)

    # row 1: only first 3 tokens
    s1 = m.init_state(CFG, 1)
    s1 = m.forward_chunk(params, jnp.asarray(tokens[1:2, :3]), s1)
    np.testing.assert_allclose(np.asarray(new_state.wkv[:, 1]),
                               np.asarray(s1.wkv[:, 0]), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(new_state.shift[:, :, 1]),
                               np.asarray(s1.shift[:, :, 0]), rtol=2e-3, atol=2e-3)

    # row 2: untouched
    assert np.all(np.asarray(new_state.wkv[:, 2]) == 0)
    assert np.all(np.asarray(new_state.shift[:, :, 2]) == 0)
    assert int(new_state.elapsed[2]) == 0
    assert int(new_state.elapsed[1]) == 3


def test_step_active_mask(params):
    B = 4
    tokens = jnp.asarray([1, 2, 3, 4], jnp.int32)
    state = m.init_state(CFG, B)
    active = jnp.asarray([True, False, True, False])
    logits, new_state = m.forward_step(params, tokens, state, active)
    assert logits.shape == (B, CFG.vocab_size)
    assert np.all(np.asarray(new_state.wkv[:, 1]) == 0)
    assert np.all(np.asarray(new_state.wkv[:, 0]) != 0)
    assert int(new_state.elapsed[1]) == 0 and int(new_state.elapsed[0]) == 1


def test_state_size_accounting():
    cfg72 = RWKV7Config(n_layer=32, n_embd=4096)
    mb = cfg72.state_bytes_per_request(jnp.float16) / 1024 / 1024
    # reference quotes ~16.5 MB/request at 7.2B fp16 (SURVEY §2.2 M2)
    assert 16.0 < mb < 17.5


def test_packed_lora_matches_unpacked(params):
    """_pack_att_lora (two batched einsums for the w/a/v-gate/g chains) gives
    the same logits/state as the eight-dot path."""
    from chirrup_tpu.engine.serving import _pack_att_lora

    packed = _pack_att_lora(params)
    att = packed["blocks"]["att"]
    assert "lora1" in att and "w1" not in att
    tokens = jnp.asarray([[5, 9, 2, 44]], jnp.int32)
    st0 = m.init_state(CFG, 1)
    lg1, s1 = m.forward_seq(params, tokens, st0)
    lg2, s2 = m.forward_seq(packed, tokens, m.init_state(CFG, 1))
    np.testing.assert_allclose(np.asarray(lg1), np.asarray(lg2),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(s1.wkv), np.asarray(s2.wkv),
                               rtol=2e-5, atol=2e-5)


def test_fused_serving_step_matches_reference(params):
    """forward_step with the serving fused-TMix wkv_fn (interpret-mode Pallas,
    dispatched via the fused_step attribute in _tmix) == the default lax.scan
    reference path."""
    from chirrup_tpu.ops import wkv7_pallas

    def raw_wkv(s, r, w, k, v, a, b, e, lengths, layer):
        return wkv7_pallas.wkv7_pallas_batch(
            s, r, w, k, v, a, b, e, lengths=lengths, layer=layer,
            interpret=True)

    def fused_step(s, r, w, k_raw, a_iclr, v_nh, kk, ka, rk, lnw, lnb, e,
                   lengths, layer):
        return wkv7_pallas.wkv7_pallas_step_fused(
            s, layer, r, w, k_raw, a_iclr, v_nh, kk, ka, rk, lnw, lnb, e,
            lengths, interpret=True)

    raw_wkv.fused_step = fused_step

    tokens = jnp.asarray([3, 17, 9], jnp.int32)
    st = m.init_state(CFG, 3)
    lg_ref, s_ref = m.forward_step(params, tokens, st)
    lg_f, s_f = m.forward_step(params, tokens, m.init_state(CFG, 3),
                               wkv_fn=raw_wkv)
    np.testing.assert_allclose(np.asarray(lg_f), np.asarray(lg_ref),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(s_f.wkv), np.asarray(s_ref.wkv),
                               rtol=2e-3, atol=2e-3)
