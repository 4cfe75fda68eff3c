"""Fused decode-tail kernel (ops/sampling_pallas) vs its XLA oracle, and
the fused serving path vs the unfused one (deferred-record equivalence)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chirrup_tpu.ops.sampling_pallas import (
    CHUNK, penalty_tail, penalty_tail_reference, penalty_tail_supported,
    sample_from_chunks)
from chirrup_tpu.ops.sampling import sample_logits_rwkv_pip_compatible

V = 16384  # smallest supported vocab (V % 4096 == 0, V/CHUNK >= CHUNK)


def _tail_inputs(rng, B, V):
    logits = jnp.asarray(rng.standard_normal((B, V)) * 3, jnp.float32)
    occ = jnp.asarray((rng.random((B, V)) < 0.001) * rng.random((B, V)),
                      jnp.float32)
    pres = jnp.asarray((rng.random((B, V)) < 0.001) * 0.5, jnp.float32)
    decay = jnp.asarray(rng.uniform(0.99, 1.0, (B,)), jnp.float32)
    freq = jnp.asarray(rng.uniform(0.0, 1.0, (B,)), jnp.float32)
    pp = jnp.asarray(rng.uniform(0.0, 1.0, (B,)), jnp.float32)
    last = jnp.asarray(rng.integers(-1, V, (B,)), jnp.int32)
    upd = jnp.asarray(rng.random((B,)) < 0.7, bool) & (last >= 0)
    dec = jnp.asarray(rng.random((B,)) < 0.9, bool)
    upd = upd & dec
    return logits, occ, pres, decay, freq, pp, last, upd, dec


def test_supported_predicate():
    assert penalty_tail_supported(65536)
    assert penalty_tail_supported(16384)
    assert not penalty_tail_supported(1000)
    assert not penalty_tail_supported(8192)  # only 64 chunks < CHUNK


def test_penalty_tail_matches_reference(rng):
    B = 8
    args = _tail_inputs(rng, B, V)
    occ2, pres2, cval, cidx, lse = penalty_tail(*args, interpret=True)
    occ2r, pres2r, cvalr, cidxr, lser = penalty_tail_reference(*args)
    np.testing.assert_allclose(np.asarray(occ2), np.asarray(occ2r),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(pres2), np.asarray(pres2r))
    np.testing.assert_allclose(np.asarray(cval), np.asarray(cvalr),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(cidx), np.asarray(cidxr))
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lser),
                               rtol=1e-5, atol=1e-5)
    # inactive rows' penalty state passes through untouched
    dec = np.asarray(args[8])
    if (~dec).any():
        i = int(np.argmin(dec))
        np.testing.assert_array_equal(np.asarray(occ2[i]),
                                      np.asarray(args[1][i]))


def test_chunk_candidates_greedy_exact(rng):
    """temp=0 rows: global argmax from chunk maxima == dense argmax."""
    B = 4
    args = _tail_inputs(rng, B, V)
    _, pres2, cval, cidx, lse = penalty_tail(*args, interpret=True)
    occ2r, pres2r, _, _, _ = penalty_tail_reference(*args)
    adj = (np.asarray(args[0]) - np.asarray(pres2r)
           - np.asarray(occ2r) * np.asarray(args[4])[:, None])
    toks = sample_from_chunks(
        cval, cidx, lse, jnp.zeros((B,)), jnp.full((B,), 0.3),
        jnp.zeros((B,), jnp.int32), jax.random.key(0),
        (args[0], pres2r, occ2r, args[4]))
    np.testing.assert_array_equal(np.asarray(toks), adj.argmax(-1))


def test_chunk_sampling_distribution_close(rng):
    """Sampled distribution from chunk candidates ~ the exact full-sort
    sampler on a peaked distribution (serving default top_p=0.3)."""
    B, DRAWS = 1, 1500
    logits_row = rng.standard_normal(V) * 2
    logits_row[:8] += 10  # a dominant head, spread over several chunks? no -
    # ids 0..7 share chunk 0; also boost some spread-out ids
    logits_row[[5000, 9000, 13000]] += 9
    logits = jnp.asarray(np.tile(logits_row, (B, 1)), jnp.float32)
    zero = jnp.zeros((B, V), jnp.float32)
    temp = jnp.ones((B,))
    top_p = jnp.full((B,), 0.3)
    top_k = jnp.zeros((B,), jnp.int32)
    freq = jnp.zeros((B,))
    args = (logits, zero, zero, jnp.ones((B,)), freq, jnp.zeros((B,)),
            jnp.full((B,), -1, jnp.int32), jnp.zeros((B,), bool),
            jnp.ones((B,), bool))
    _, pres2, cval, cidx, lse = penalty_tail(*args, interpret=True)

    counts_new, counts_ref = {}, {}
    for i in range(DRAWS):
        key = jax.random.key(i)
        t_new = int(sample_from_chunks(cval, cidx, lse, temp, top_p, top_k,
                                       key, (logits, zero, zero, freq))[0])
        t_ref = int(sample_logits_rwkv_pip_compatible(
            logits, temp, top_p, top_k, key)[0])
        counts_new[t_new] = counts_new.get(t_new, 0) + 1
        counts_ref[t_ref] = counts_ref.get(t_ref, 0) + 1
    for tok in set(counts_new) | set(counts_ref):
        d = abs(counts_new.get(tok, 0) - counts_ref.get(tok, 0)) / DRAWS
        assert d < 0.05, (tok, counts_new.get(tok), counts_ref.get(tok))


def test_uncovered_rows_fall_back_exact(rng):
    """top_p=1.0 on a flat distribution cannot be covered by the candidate
    set -> the exact full-sort path must take over (same guard as the
    non-fused sampler)."""
    B = 4
    logits = jnp.asarray(rng.standard_normal((B, V)) * 0.01, jnp.float32)
    zero = jnp.zeros((B, V), jnp.float32)
    freq = jnp.zeros((B,))
    args = (logits, zero, zero, jnp.ones((B,)), freq, jnp.zeros((B,)),
            jnp.full((B,), -1, jnp.int32), jnp.zeros((B,), bool),
            jnp.ones((B,), bool))
    _, _, cval, cidx, lse = penalty_tail(*args, interpret=True)
    key = jax.random.key(3)
    toks = sample_from_chunks(cval, cidx, lse, jnp.ones((B,)),
                              jnp.ones((B,)), jnp.zeros((B,), jnp.int32),
                              key, (logits, zero, zero, freq))
    ref = sample_logits_rwkv_pip_compatible(
        logits, jnp.ones((B,)), jnp.ones((B,)), jnp.zeros((B,), jnp.int32),
        jax.random.fold_in(key, 1))
    # the fallback uses fold_in(key, 1) internally for window 0 -> identical
    np.testing.assert_array_equal(np.asarray(toks[:min(B, 8)]),
                                  np.asarray(ref[:min(B, 8)]))


def _on_tpu():
    return any(d.platform in ("tpu", "axon") for d in jax.devices())


@pytest.mark.skipif("not _on_tpu()")
def test_penalty_tail_compiled_on_tpu(rng):
    """ADVICE r3: interpret=True cannot catch Mosaic TPU-lowering failures
    (the round-3 transposed-candidate bug broke bench.py while every
    interpret test stayed green). Run the REAL compiled kernel at a
    representative serving shape and pin it to the XLA oracle."""
    B, Vfull = 384, 65536
    args = _tail_inputs(rng, B, Vfull)
    occ2, pres2, cval, cidx, lse = penalty_tail(*args, interpret=False)
    occ2r, pres2r, cvalr, cidxr, lser = penalty_tail_reference(*args)
    np.testing.assert_allclose(np.asarray(occ2), np.asarray(occ2r),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(pres2), np.asarray(pres2r))
    np.testing.assert_allclose(np.asarray(cval), np.asarray(cvalr),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(cidx), np.asarray(cidxr))
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lser),
                               rtol=1e-5, atol=1e-5)


def test_fused_serving_path_matches_unfused_greedy(rng):
    """End-to-end: a ServingModel with the fused tail produces the SAME
    greedy tokens and (after draining the deferred record) the SAME penalty
    state as the unfused XLA path, with penalties active."""
    from chirrup_tpu.models.config import RWKV7Config, RuntimeConfig
    from chirrup_tpu.models.rwkv7 import init_state
    from chirrup_tpu.engine.serving import ServingModel
    from chirrup_tpu.models.loader import synthetic_params

    cfg = RWKV7Config(n_layer=2, n_embd=128, vocab_size=V)
    params = synthetic_params(cfg, seed=0)
    B = 4
    models = {}
    for fused in (True, False):
        rt = RuntimeConfig(activation_dtype=jnp.float32,
                           wkv_state_dtype=jnp.float32, quantization=None,
                           use_pallas_wkv=False,
                           fused_penalty_tail=fused)
        m = ServingModel(cfg, params, rt, batch_size=B,
                         interpret_pallas=fused)
        assert m._fused_tail is fused
        models[fused] = m

    toks0 = jnp.asarray(rng.integers(1, V, (B,)), jnp.int32)
    seqs, finals = {}, {}
    for fused, m in models.items():
        carry = m.init_carry()
        # greedy with penalties on: temperature=0, freq/presence 0.5
        carry = dataclasses_replace_rows(carry)
        toks = toks0
        seq = []
        ones = jnp.ones((B,), bool)
        for step in range(6):
            carry, sampled, _ = m.decode_step(
                carry, toks, ones, ones,
                feedback_mask=jnp.full((B,), step > 0))
            seq.append(np.asarray(sampled))
        seqs[fused] = np.stack(seq)
        finals[fused] = carry
    np.testing.assert_array_equal(seqs[True], seqs[False])


def dataclasses_replace_rows(carry):
    import dataclasses
    B = carry.temperature.shape[0]
    return dataclasses.replace(
        carry,
        temperature=jnp.zeros((B,)),
        frequency_penalty=jnp.full((B,), 0.5),
        presence_penalty=jnp.full((B,), 0.5),
        penalty_decay=jnp.full((B,), 0.996))
