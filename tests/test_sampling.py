"""Sampler tests mirroring the reference's strategy (greedy determinism, edge cases,
statistical distribution equivalence vs an independently-computed expected
distribution — cf. reference tests/test_sampler_vs_rwkv_pip.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from chirrup_tpu.ops.sampling import (
    sample_logits_rwkv_pip_compatible, sample_logits_rwkv_pip_fast,
    apply_penalties, record_sampled_token)


def _expected_probs_np(logits, temperature, top_p, top_k):
    """Independent numpy implementation of the rwkv-pip sampling distribution."""
    if temperature == 0:
        temperature, top_p = 1.0, 0.0
    x = logits - logits.max()
    probs = np.exp(x) / np.exp(x).sum()
    order = np.argsort(-probs, kind="stable")
    sp = probs[order]
    cum = np.cumsum(sp)
    pos = int(np.searchsorted(cum, top_p))
    pos = min(pos, len(sp) - 1)
    cutoff = sp[pos]
    probs = np.where(probs < cutoff, 0.0, probs)
    if top_k > 0:
        mask = np.zeros_like(probs, bool)
        mask[order[top_k:]] = True
        probs[mask] = 0.0
    probs = probs ** (1.0 / temperature)
    return probs / probs.sum()


def test_greedy_temp_zero():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((4, 100)), jnp.float32)
    toks = sample_logits_rwkv_pip_compatible(
        logits, jnp.zeros(4), jnp.full(4, 0.9), jnp.zeros(4, jnp.int32),
        jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(toks), np.argmax(np.asarray(logits), -1))


def test_top_k_one_deterministic():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((3, 50)), jnp.float32)
    for seed in range(5):
        toks = sample_logits_rwkv_pip_compatible(
            logits, jnp.ones(3), jnp.ones(3), jnp.ones(3, jnp.int32),
            jax.random.key(seed))
        np.testing.assert_array_equal(np.asarray(toks),
                                      np.argmax(np.asarray(logits), -1))


def test_dominant_logit():
    logits = np.full((1, 32), -5.0, np.float32)
    logits[0, 7] = 10.0
    toks = sample_logits_rwkv_pip_compatible(
        jnp.asarray(logits), jnp.ones(1), jnp.asarray([0.3]),
        jnp.zeros(1, jnp.int32), jax.random.key(3))
    assert int(toks[0]) == 7


def test_distribution_matches_reference_algorithm():
    """5000 draws; per-token frequency within 0.03 of the analytically filtered
    distribution (tolerance mirrors reference tests)."""
    rng = np.random.default_rng(2)
    V = 64
    logits_np = (rng.standard_normal(V) * 2).astype(np.float32)
    cases = [(1.0, 0.3, 0), (0.8, 0.9, 0), (1.5, 1.0, 10), (1.0, 0.5, 5)]
    n = 5000
    for temp, top_p, top_k in cases:
        expected = _expected_probs_np(logits_np.copy(), temp, top_p, top_k)
        logits = jnp.broadcast_to(jnp.asarray(logits_np), (n, V))
        toks = sample_logits_rwkv_pip_compatible(
            logits, jnp.full(n, temp), jnp.full(n, top_p),
            jnp.full(n, top_k, jnp.int32), jax.random.key(17))
        freq = np.bincount(np.asarray(toks), minlength=V) / n
        assert np.abs(freq - expected).max() < 0.03, (temp, top_p, top_k)
        # support must match exactly: never sample a filtered-out token
        assert set(np.nonzero(freq)[0]).issubset(set(np.nonzero(expected)[0]))


def test_per_row_params_vary():
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.standard_normal((2, 40)), jnp.float32)
    temps = jnp.asarray([0.0, 1.0])
    toks = sample_logits_rwkv_pip_compatible(
        logits, temps, jnp.asarray([0.3, 1.0]), jnp.zeros(2, jnp.int32),
        jax.random.key(5))
    assert int(toks[0]) == int(np.argmax(np.asarray(logits)[0]))


def test_fast_sampler_matches_exact_distribution():
    """Top-k fast path must match the exact sampler's distribution and support."""
    rng = np.random.default_rng(5)
    V, n = 256, 5000
    logits_np = (rng.standard_normal(V) * 2).astype(np.float32)
    for temp, top_p, top_k, k_max in [(1.0, 0.3, 0, 64), (0.8, 0.9, 0, 64),
                                      (1.0, 0.5, 10, 64), (0.0, 0.3, 0, 64)]:
        expected = _expected_probs_np(logits_np.copy(), temp, top_p, top_k)
        logits = jnp.broadcast_to(jnp.asarray(logits_np), (n, V))
        toks = sample_logits_rwkv_pip_fast(
            logits, jnp.full(n, temp), jnp.full(n, top_p),
            jnp.full(n, top_k, jnp.int32), jax.random.key(23), k_max=k_max)
        freq = np.bincount(np.asarray(toks), minlength=V) / n
        assert np.abs(freq - expected).max() < 0.03, (temp, top_p, top_k)
        assert set(np.nonzero(freq)[0]).issubset(set(np.nonzero(expected)[0]))


def test_fast_sampler_fallback_to_exact():
    """top_p=1.0 on a flat distribution exceeds top-k coverage -> exact fallback."""
    rng = np.random.default_rng(6)
    V, n = 512, 4000
    logits_np = np.zeros(V, np.float32)  # uniform: top-64 mass = 64/512 << 1.0
    logits = jnp.broadcast_to(jnp.asarray(logits_np), (n, V))
    toks = sample_logits_rwkv_pip_fast(
        logits, jnp.ones(n), jnp.ones(n), jnp.zeros(n, jnp.int32),
        jax.random.key(7), k_max=64)
    freq = np.bincount(np.asarray(toks), minlength=V) / n
    # uniform sampling over all V, not truncated to the top-64
    assert (freq > 0).sum() > 300


def test_fast_sampler_greedy():
    rng = np.random.default_rng(8)
    logits = jnp.asarray(rng.standard_normal((8, 1000)), jnp.float32)
    toks = sample_logits_rwkv_pip_fast(
        logits, jnp.zeros(8), jnp.full(8, 0.9), jnp.zeros(8, jnp.int32),
        jax.random.key(2), k_max=128)
    np.testing.assert_array_equal(np.asarray(toks), np.argmax(np.asarray(logits), -1))


def test_penalty_semantics():
    """Reference ordering: decay at forward, subtract, sample, record
    (worker.py:527-547, 724-728)."""
    B, V = 2, 16
    occ = jnp.zeros((B, V))
    pres = jnp.zeros((B, V))
    logits = jnp.zeros((B, V))

    tokens = jnp.asarray([3, 5], jnp.int32)
    occ2, pres2 = record_sampled_token(occ, pres, tokens, jnp.asarray([0.5, 0.7]),
                                       jnp.asarray([True, False]))
    assert float(occ2[0, 3]) == 1.0 and float(pres2[0, 3]) == 0.5
    # masked row (no-penalty token): untouched
    assert float(occ2[1, 5]) == 0.0 and float(pres2[1, 5]) == 0.0

    decay = jnp.asarray([0.9, 0.9])
    occ3 = occ2 * decay[:, None]
    out = apply_penalties(logits, occ3, pres2, jnp.asarray([2.0, 2.0]))
    # logit[0,3] = 0 - (0.5 + 0.9*2.0) = -2.3
    np.testing.assert_allclose(float(out[0, 3]), -2.3, rtol=1e-6)
    assert float(out[1, 5]) == 0.0


def test_fast_sampler_per_row_fallback():
    """One adversarial row (top_p=1.0 on a flat distribution) must be exact-
    resampled alone: every other row's token is bit-identical to the batch where
    that row is benign (no whole-batch fallback), and the flagged row still
    samples the full support."""
    V, B, bad = 512, 64, 5
    rng = np.random.default_rng(11)
    concentrated = (rng.standard_normal((B, V)) * 8).astype(np.float32)
    benign = jnp.asarray(concentrated)
    adversarial = benign.at[bad].set(jnp.zeros(V))  # flat row => uncovered top_p

    temp = jnp.ones(B)
    top_p = jnp.full(B, 0.99)
    top_k = jnp.zeros(B, jnp.int32)
    key = jax.random.key(31)

    toks_benign = np.asarray(sample_logits_rwkv_pip_fast(
        benign, temp, top_p, top_k, key, k_max=64))
    toks_adv = np.asarray(sample_logits_rwkv_pip_fast(
        adversarial, temp, top_p, top_k, key, k_max=64))
    others = [i for i in range(B) if i != bad]
    np.testing.assert_array_equal(toks_adv[others], toks_benign[others])

    # the flagged row samples from the FULL vocab (exact path), not the top-64
    draws = []
    for s in range(400):
        t = sample_logits_rwkv_pip_fast(
            adversarial, temp, top_p, top_k, jax.random.key(s), k_max=64)
        draws.append(int(t[bad]))
    assert len(set(draws)) > 250  # uniform over 512 => ~54% unique in 400 draws


def test_fast_sampler_row_mask_suppresses_fallback():
    """Flagged-but-masked rows (inactive slots with garbage logits) must not
    trigger any fallback work for the batch."""
    V, B = 256, 16
    rng = np.random.default_rng(12)
    logits = jnp.asarray((rng.standard_normal((B, V)) * 8).astype(np.float32))
    logits = logits.at[3].set(jnp.zeros(V))
    mask = np.ones(B, bool)
    mask[3] = False
    key = jax.random.key(9)
    toks_masked = np.asarray(sample_logits_rwkv_pip_fast(
        logits, jnp.ones(B), jnp.full(B, 1.0), jnp.zeros(B, jnp.int32), key,
        row_mask=jnp.asarray(mask), k_max=64))
    # same batch with row 3 benign: identical everywhere else
    benign = logits.at[3].set(logits[4])
    toks_benign = np.asarray(sample_logits_rwkv_pip_fast(
        benign, jnp.ones(B), jnp.full(B, 1.0), jnp.zeros(B, jnp.int32), key,
        row_mask=jnp.asarray(mask), k_max=64))
    others = [i for i in range(B) if i != 3]
    np.testing.assert_array_equal(toks_masked[others], toks_benign[others])


def test_fast_sampler_many_adversarial_rows_bounded():
    """More flagged rows than one fallback window (9 > R=8) must run extra
    fixed-size exact passes — NOT a whole-batch exact sort: every benign row's
    token stays bit-identical to the all-benign batch, and every flagged row
    still samples the full support."""
    V, B = 512, 32
    bad = list(range(9))  # 9 hostile streams, > fallback_rows=8
    rng = np.random.default_rng(13)
    concentrated = (rng.standard_normal((B, V)) * 8).astype(np.float32)
    benign = jnp.asarray(concentrated)
    adversarial = benign
    for b in bad:
        adversarial = adversarial.at[b].set(jnp.zeros(V))

    temp = jnp.ones(B)
    top_p = jnp.full(B, 0.99)
    top_k = jnp.zeros(B, jnp.int32)
    key = jax.random.key(77)

    toks_benign = np.asarray(sample_logits_rwkv_pip_fast(
        benign, temp, top_p, top_k, key, k_max=64))
    toks_adv = np.asarray(sample_logits_rwkv_pip_fast(
        adversarial, temp, top_p, top_k, key, k_max=64))
    others = [i for i in range(B) if i not in bad]
    np.testing.assert_array_equal(toks_adv[others], toks_benign[others])

    # flagged rows (including one beyond the first window) sample full support
    for probe in (0, 8):
        draws = {int(sample_logits_rwkv_pip_fast(
            adversarial, temp, top_p, top_k, jax.random.key(s),
            k_max=64)[probe]) for s in range(400)}
        assert len(draws) > 250, (probe, len(draws))
