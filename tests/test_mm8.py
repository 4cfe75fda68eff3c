"""mm8 INT8 weight-only quantization tests (scheme parity with reference
scripts/test_mm8/benchmark.py:54-85, 167-193)."""

import numpy as np
import jax.numpy as jnp

from chirrup_tpu.ops.mm8 import quantize, dequantize, mm8_matmul
from chirrup_tpu.ops.linear import matmul


def _quantize_np(w):
    """Independent numpy reproduction of the rwkv-pip quantization for testing."""
    w = w.astype(np.float64).copy()
    if w.shape[0] > w.shape[1]:
        my = w.min(1, keepdims=True); w -= my
        mx = w.min(0, keepdims=True); w -= mx
        rx = w.max(0, keepdims=True); w /= rx
        ry = w.max(1, keepdims=True); w /= ry
    else:
        mx = w.min(0, keepdims=True); w -= mx
        my = w.min(1, keepdims=True); w -= my
        rx = w.max(0, keepdims=True); w /= rx
        ry = w.max(1, keepdims=True); w /= ry
    q = np.clip(np.floor(w * 256), 0, 255).astype(np.uint8)
    return q, mx.ravel(), rx.ravel(), my.ravel(), ry.ravel()


def test_quantize_codes_match_reference_scheme(rng):
    w = rng.standard_normal((96, 256)).astype(np.float32)
    mq = quantize(w)
    q_np, mx, rx, my, ry = _quantize_np(w.astype(np.float32))
    got_u8 = np.asarray(mq.q, np.int32) + 128
    # floor() at the 1/256 bin edges is fp-sensitive; allow off-by-one on <1% of codes
    diff = np.abs(got_u8 - q_np.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01
    np.testing.assert_allclose(np.asarray(mq.mx), mx, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mq.rx) * 16, rx, rtol=1e-5, atol=1e-6)


def test_dequantize_roundtrip_error(rng):
    w = rng.standard_normal((128, 512)).astype(np.float32)
    mq = quantize(w)
    w_hat = np.asarray(dequantize(mq))
    # one quant bin is (rx*ry)/256; max error should be ~half a bin
    bin_size = (np.asarray(mq.rx) * 16)[None, :] * (np.asarray(mq.ry) * 16)[:, None] / 256
    assert np.all(np.abs(w_hat - w) <= 0.51 * bin_size + 1e-6)
    rel_l2 = np.linalg.norm(w_hat - w) / np.linalg.norm(w)
    assert rel_l2 < 8e-3


def test_mm8_matmul_decomposed_equals_dequant(rng):
    """y = x @ W_hat must equal the decomposed form (reference benchmark.py:167-193)."""
    w = rng.standard_normal((128, 384)).astype(np.float32)
    x = rng.standard_normal((4, 128)).astype(np.float32)
    mq = quantize(w)
    y_direct = np.asarray(x @ np.asarray(dequantize(mq)))
    y_mm8 = np.asarray(mm8_matmul(jnp.asarray(x), mq))
    np.testing.assert_allclose(y_mm8, y_direct, rtol=2e-4, atol=2e-4)


def test_mm8_vs_fp32_accuracy(rng):
    w = rng.standard_normal((256, 512)).astype(np.float32)
    x = (rng.standard_normal((8, 256)) * 0.5).astype(np.float32)
    y32 = x @ w
    y8 = np.asarray(mm8_matmul(jnp.asarray(x), quantize(w)))
    cos = (y32 * y8).sum() / (np.linalg.norm(y32) * np.linalg.norm(y8))
    assert cos > 0.9995
    rel = np.linalg.norm(y8 - y32) / np.linalg.norm(y32)
    assert rel < 0.02


def test_a8_core_accuracy(rng):
    """The w8a8 core (dynamic per-token int8 activations, native int8 MXU dot)
    must track the w8a16 result to activation-rounding tolerance."""
    from chirrup_tpu.ops import mm8 as mm8mod

    w = rng.standard_normal((256, 512)).astype(np.float32)
    x = (rng.standard_normal((8, 256)) * 0.5).astype(np.float32)
    mq = quantize(w)
    y16 = np.asarray(mm8_matmul(jnp.asarray(x), mq))
    mm8mod.set_default_core("xla_a8")
    try:
        y8 = np.asarray(mm8_matmul(jnp.asarray(x), mq))
    finally:
        mm8mod.set_default_core("auto")
    y32 = x @ w
    rel_vs_a16 = np.linalg.norm(y8 - y16) / np.linalg.norm(y16)
    rel_vs_f32 = np.linalg.norm(y8 - y32) / np.linalg.norm(y32)
    assert rel_vs_a16 < 0.02, rel_vs_a16
    assert rel_vs_f32 < 0.03, rel_vs_f32


def test_a8_quantize_activations(rng):
    from chirrup_tpu.ops.mm8 import quantize_activations

    xs = jnp.asarray((rng.standard_normal((4, 64)) * 3).astype(np.float32))
    xs8, s = quantize_activations(xs)
    assert xs8.dtype == jnp.int8 and s.shape == (4, 1)
    back = np.asarray(xs8, np.float32) * np.asarray(s)
    err = np.abs(back - np.asarray(xs)).max(axis=1)
    assert np.all(err <= 0.5 * np.asarray(s)[:, 0] + 1e-7)
    # zero row stays finite
    z8, zs = quantize_activations(jnp.zeros((1, 64)))
    assert np.all(np.asarray(z8) == 0) and np.isfinite(np.asarray(zs)).all()


def test_linear_dispatch(rng):
    w = rng.standard_normal((64, 96)).astype(np.float32)
    x = rng.standard_normal((2, 64)).astype(np.float32)
    dense = np.asarray(matmul(jnp.asarray(x), jnp.asarray(w)))
    quant = np.asarray(matmul(jnp.asarray(x), quantize(w)))
    np.testing.assert_allclose(dense, np.asarray(x) @ w, rtol=1e-5, atol=1e-5)
    assert np.abs(quant - dense).max() < 0.5  # int8-level agreement


def test_mm8_3d_input(rng):
    w = rng.standard_normal((64, 128)).astype(np.float32)
    x = rng.standard_normal((2, 3, 64)).astype(np.float32)
    y = np.asarray(mm8_matmul(jnp.asarray(x), quantize(w)))
    assert y.shape == (2, 3, 128)
    y2d = np.asarray(mm8_matmul(jnp.asarray(x.reshape(6, 64)), quantize(w)))
    np.testing.assert_allclose(y.reshape(6, 128), y2d, rtol=1e-6)


def test_pallas_core_matches_xla_core(rng):
    """Fused in-VMEM dequant GEMM (interpret mode) vs the plain XLA int8 dot."""
    import jax
    from chirrup_tpu.ops.mm8_pallas import mm8_core_pallas, mm8_core_supported

    for B, K, M in ((8, 256, 256), (16, 2048, 512), (64, 4096, 128)):
        assert mm8_core_supported(B, K, M)
        xs = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
        q = jnp.asarray(rng.integers(-128, 128, (K, M)), jnp.int8)
        ref = jnp.dot(xs, q.astype(xs.dtype), preferred_element_type=jnp.float32)
        out = mm8_core_pallas(xs, q, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-2)

    # untileable / oversized shapes are refused (callers fall back to XLA)
    assert not mm8_core_supported(8, 256, 192)
    assert not mm8_core_supported(512, 65536, 256)


def test_pallas_stacked_core_matches_slice(rng):
    """Layer-indexed stacked kernel (interpret) vs slicing the layer out."""
    import jax
    import jax.numpy as jnp_
    from chirrup_tpu.ops.mm8_pallas import mm8_core_pallas_stacked

    L, B, K, M = 3, 8, 256, 256
    xs = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
    q = jnp.asarray(rng.integers(-128, 128, (L, K, M)), jnp.int8)
    for li in range(L):
        ref = jnp.dot(xs, q[li].astype(xs.dtype),
                      preferred_element_type=jnp.float32)
        out = mm8_core_pallas_stacked(xs, q, li, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-2)


def test_pallas_a8_cores_match_xla_a8(rng):
    """Pallas w8a8 kernels (interpret) vs the XLA int8 dot — exact int32 GEMM."""
    from chirrup_tpu.ops.mm8_pallas import (
        mm8_core_pallas_a8, mm8_core_pallas_a8_stacked)

    B, K, M = 16, 2048, 512
    xs8 = jnp.asarray(rng.integers(-127, 128, (B, K)), jnp.int8)
    q = jnp.asarray(rng.integers(-128, 128, (K, M)), jnp.int8)
    ref = jnp.dot(xs8.astype(jnp.int32), q.astype(jnp.int32))
    out = mm8_core_pallas_a8(xs8, q, interpret=True)
    assert out.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    L = 3
    q3 = jnp.asarray(rng.integers(-128, 128, (L, K, M)), jnp.int8)
    for li in range(L):
        ref = jnp.dot(xs8.astype(jnp.int32), q3[li].astype(jnp.int32))
        out = mm8_core_pallas_a8_stacked(xs8, q3, li, interpret=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_pallas_a8_core_via_mm8_matmul(rng):
    """mm8_matmul with the pallas_a8 default core (interpret unavailable through
    the auto path on CPU, so drive the core directly through the decomposed
    form): accuracy vs f32 dense matches the xla_a8 core's."""
    import chirrup_tpu.ops.mm8 as mm8mod
    from chirrup_tpu.ops.mm8 import quantize, mm8_matmul, quantize_activations
    from chirrup_tpu.ops.mm8_pallas import mm8_core_pallas_a8

    B, K, M = 8, 256, 256
    x = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
    w = rng.standard_normal((K, M)).astype(np.float32) * 0.05
    qw = quantize(w)

    def pallas_a8_core(xs, q):
        xs8, s = quantize_activations(xs)
        return mm8_core_pallas_a8(xs8, q, interpret=True).astype(jnp.float32) * s

    y_pallas = np.asarray(mm8_matmul(x, qw, core=pallas_a8_core))
    y_xla = np.asarray(mm8_matmul(x, qw, core=mm8mod._int8_core_xla_a8))
    np.testing.assert_allclose(y_pallas, y_xla, rtol=1e-5, atol=1e-5)


def test_fused_a8_matches_decomposed(rng):
    """The fully-fused kernel (quant + GEMM + corrections in-kernel, interpret)
    == mm8_matmul with the xla_a8 core (same math via XLA elementwise)."""
    import chirrup_tpu.ops.mm8 as mm8mod
    from chirrup_tpu.ops.mm8 import quantize, mm8_matmul
    from chirrup_tpu.ops.mm8_pallas import mm8_fused_a8, mm8_fused_a8_stacked

    B, K, M = 8, 256, 256
    x = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
    w = rng.standard_normal((K, M)).astype(np.float32) * 0.05 + 0.01
    qw = quantize(w)
    ref = np.asarray(mm8_matmul(x, qw, core=mm8mod._int8_core_xla_a8))
    out = np.asarray(mm8_fused_a8(x, qw.mx, qw.rx, qw.my, qw.ry, qw.q,
                                  interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    # stacked: each layer agrees with the flat fused call on its slice
    L = 3
    ws = [rng.standard_normal((K, M)).astype(np.float32) * 0.03 for _ in range(L)]
    qs = [quantize(wl) for wl in ws]
    stacked_q = jnp.stack([q.q for q in qs])
    for li in range(L):
        ref = np.asarray(mm8_fused_a8(x, qs[li].mx, qs[li].rx, qs[li].my,
                                      qs[li].ry, qs[li].q, interpret=True))
        out = np.asarray(mm8_fused_a8_stacked(
            x, qs[li].mx, qs[li].rx, qs[li].my, qs[li].ry, stacked_q, li,
            interpret=True))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_fused_a8_multi_matches_separate(rng):
    """The merged multi-projection kernel (token-shift mix + quant + GEMM +
    corrections for n_in=3 in one call, interpret) == per-projection fused
    calls on the pre-mixed activations."""
    from chirrup_tpu.ops.mm8 import quantize
    from chirrup_tpu.ops.mm8_pallas import (
        mm8_fused_a8, mm8_fused_a8_multi_stacked)

    B, K, C, L, n_in = 8, 256, 256, 2, 3
    x = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
    xx = jnp.asarray(rng.standard_normal((B, K)), jnp.float32) * 0.3
    mu = jnp.asarray(rng.standard_normal((n_in, K)), jnp.float32) * 0.5
    qs = [[quantize(rng.standard_normal((K, C)).astype(np.float32) * 0.05)
           for _ in range(n_in)] for _ in range(L)]
    q_cat = jnp.stack([jnp.concatenate([w.q for w in layer], axis=1)
                       for layer in qs])                       # (L, K, 3C)
    for li in range(L):
        mx = jnp.concatenate([w.mx for w in qs[li]])
        rx = jnp.concatenate([w.rx for w in qs[li]])
        my = jnp.stack([w.my for w in qs[li]])
        ry = jnp.stack([w.ry for w in qs[li]])
        out = np.asarray(mm8_fused_a8_multi_stacked(
            x, xx, mu, mx, rx, my, ry, q_cat, li, interpret=True))
        for m in range(n_in):
            xm = x + xx * mu[m]
            w = qs[li][m]
            ref = np.asarray(mm8_fused_a8(xm, w.mx, w.rx, w.my, w.ry, w.q,
                                          interpret=True))
            np.testing.assert_allclose(out[:, m * C:(m + 1) * C], ref,
                                       rtol=1e-4, atol=1e-4)


def test_mm8_matmul_layer_indexed_matches_sliced(rng):
    """mm8_matmul(LayerIndexed(w, li)) == mm8_matmul on the sliced per-layer
    weight (XLA core path, as used on CPU)."""
    import jax
    from chirrup_tpu.ops.mm8 import LayerIndexed, Mm8Weight

    L, K, M, B = 3, 64, 96, 5
    per_layer = [quantize(rng.standard_normal((K, M)).astype(np.float32))
                 for _ in range(L)]
    stacked = Mm8Weight(
        q=jnp.stack([w.q for w in per_layer]),
        mx=jnp.stack([w.mx for w in per_layer]),
        rx=jnp.stack([w.rx for w in per_layer]),
        my=jnp.stack([w.my for w in per_layer]),
        ry=jnp.stack([w.ry for w in per_layer]))
    x = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
    for li in range(L):
        want = mm8_matmul(x, per_layer[li])
        got = mm8_matmul(x, LayerIndexed(stacked, jnp.int32(li)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_mm8_multi_matmul_fallback_matches_unmerged(rng):
    """mm8_multi_matmul's non-Pallas fallback == per-projection mm8_matmul on the
    unmerged weights (exact: merge+slice is value-preserving)."""
    from chirrup_tpu.ops.mm8 import (Mm8Weight, merge_stacked, mm8_multi_matmul,
                                     quantize)

    B, T, K, C, L, n = 3, 2, 128, 256, 2, 3
    x = jnp.asarray(rng.standard_normal((B, T, K)), jnp.float32)
    xx = jnp.asarray(rng.standard_normal((B, T, K)), jnp.float32) * 0.2
    mu = jnp.asarray(rng.standard_normal((n, K)), jnp.float32) * 0.5
    per_layer = [[quantize(rng.standard_normal((K, C)).astype(np.float32))
                  for _ in range(n)] for _ in range(L)]
    stacked = [Mm8Weight(*[jnp.stack([getattr(per_layer[li][m], f)
                                      for li in range(L)])
                           for f in ("q", "mx", "rx", "my", "ry")])
               for m in range(n)]
    merged = merge_stacked(stacked)
    for li in range(L):
        out = np.asarray(mm8_multi_matmul(x, xx, mu, merged, li))
        assert out.shape == (B, T, n * C)
        for m in range(n):
            ref = np.asarray(mm8_matmul(x + xx * mu[m], per_layer[li][m]))
            np.testing.assert_array_equal(out[..., m * C:(m + 1) * C], ref)


def test_fused_a8_relu2_activation(rng):
    """activation='relu2' in the fused kernel == XLA relu^2 on the plain output."""
    from chirrup_tpu.ops.mm8 import quantize
    from chirrup_tpu.ops.mm8_pallas import mm8_fused_a8

    B, K, M = 8, 256, 256
    x = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
    w = quantize(rng.standard_normal((K, M)).astype(np.float32))
    base = np.asarray(mm8_fused_a8(x, w.mx, w.rx, w.my, w.ry, w.q,
                                   interpret=True))
    act = np.asarray(mm8_fused_a8(x, w.mx, w.rx, w.my, w.ry, w.q,
                                  interpret=True, activation="relu2"))
    np.testing.assert_allclose(act, np.square(np.maximum(base, 0.0)),
                               rtol=1e-5, atol=1e-6)


def test_fused_ffn_pair_matches_two_step(rng):
    """mm8_fused_a8_ffn_stacked (relu²-FFN in one kernel, VMEM intermediate)
    == relu(mm8(x, Wk))² -> mm8(., Wv) via the per-matmul fused kernels."""
    from chirrup_tpu.ops.mm8 import quantize
    from chirrup_tpu.ops.mm8_pallas import (
        mm8_fused_a8, mm8_fused_a8_ffn_stacked)

    B, K, F, L = 8, 256, 512, 2
    x = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
    wks = [quantize(rng.standard_normal((K, F)).astype(np.float32) * 0.1)
           for _ in range(L)]
    wvs = [quantize(rng.standard_normal((F, K)).astype(np.float32) * 0.1)
           for _ in range(L)]
    qk = jnp.stack([w.q for w in wks])
    qv = jnp.stack([w.q for w in wvs])
    for li in range(L):
        wk, wv = wks[li], wvs[li]
        out = np.asarray(mm8_fused_a8_ffn_stacked(
            x, wk.mx, wk.rx, wk.my, wk.ry, qk,
            wv.mx, wv.rx, wv.my, wv.ry, qv, li, interpret=True))
        kk = mm8_fused_a8(x, wk.mx, wk.rx, wk.my, wk.ry, wk.q,
                          interpret=True, activation="relu2")
        # the fused kernel stores the intermediate bf16 (as the two-kernel
        # path's bf16 activations would be); round the reference the same way
        kk = kk.astype(jnp.bfloat16).astype(jnp.float32)
        ref = np.asarray(mm8_fused_a8(kk, wv.mx, wv.rx, wv.my, wv.ry, wv.q,
                                      interpret=True))
        np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_fused_a8_row_tiled_matches_decomposed(rng, monkeypatch):
    """Prefill-shape dispatch: with the resident budget forced to 0 the fused
    kernel runs its 2-D (row-block, M-tile) grid — including a non-dividing
    row count that exercises the pad-and-slice path — and must match the same
    math via the xla_a8 decomposed form."""
    import chirrup_tpu.ops.mm8 as mm8mod
    import chirrup_tpu.ops.mm8_pallas as mp
    from chirrup_tpu.ops.mm8 import quantize
    from chirrup_tpu.ops.mm8_pallas import mm8_fused_a8, mm8_fused_a8_stacked

    monkeypatch.setattr(mp, "_RESIDENT_BUDGET", 0)
    K, M = 256, 256
    w = rng.standard_normal((K, M)).astype(np.float32) * 0.05 + 0.01
    qw = quantize(w)
    for B in (24, 20):  # 24 = 3 exact row blocks of 8; 20 = pad to 24
        x = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
        ref = np.asarray(mm8_matmul(x, qw, core=mm8mod._int8_core_xla_a8))
        out = np.asarray(mm8_fused_a8(x, qw.mx, qw.rx, qw.my, qw.ry, qw.q,
                                      interpret=True))
        assert out.shape == (B, M)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    # stacked flavor on the row grid
    L, B = 2, 24
    x = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
    qs = [quantize(rng.standard_normal((K, M)).astype(np.float32) * 0.04)
          for _ in range(L)]
    stacked_q = jnp.stack([q.q for q in qs])
    for li in range(L):
        ref = np.asarray(mm8_matmul(x, qs[li], core=mm8mod._int8_core_xla_a8))
        out = np.asarray(mm8_fused_a8_stacked(
            x, qs[li].mx, qs[li].rx, qs[li].my, qs[li].ry, stacked_q, li,
            interpret=True))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_fused_a8_multi_row_tiled_matches_separate(rng, monkeypatch):
    """Row-tiled merged R/K/V kernel == per-projection fused calls."""
    import chirrup_tpu.ops.mm8_pallas as mp
    from chirrup_tpu.ops.mm8 import quantize
    from chirrup_tpu.ops.mm8_pallas import (
        mm8_fused_a8, mm8_fused_a8_multi_stacked)

    B, K, C, n_in = 24, 256, 256, 3
    x = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
    xx = jnp.asarray(rng.standard_normal((B, K)), jnp.float32) * 0.3
    mu = jnp.asarray(rng.standard_normal((n_in, K)), jnp.float32) * 0.5
    qs = [quantize(rng.standard_normal((K, C)).astype(np.float32) * 0.05)
          for _ in range(n_in)]
    q_cat = jnp.concatenate([w.q for w in qs], axis=1)[None]   # (1, K, 3C)
    mx = jnp.concatenate([w.mx for w in qs])
    rx = jnp.concatenate([w.rx for w in qs])
    my = jnp.stack([w.my for w in qs])
    ry = jnp.stack([w.ry for w in qs])
    refs = [np.asarray(mm8_fused_a8(x + xx * mu[m], w.mx, w.rx, w.my, w.ry,
                                    w.q, interpret=True))
            for m, w in enumerate(qs)]
    monkeypatch.setattr(mp, "_RESIDENT_BUDGET", 0)
    out = np.asarray(mm8_fused_a8_multi_stacked(
        x, xx, mu, mx, rx, my, ry, q_cat, 0, interpret=True))
    for m in range(n_in):
        np.testing.assert_allclose(out[:, m * C:(m + 1) * C], refs[m],
                                   rtol=1e-4, atol=1e-4)


def test_fused_ffn_row_tiled_matches_resident(rng, monkeypatch):
    """Row-tiled FFN pair (per-row-block VMEM intermediate) == two-step fused."""
    import chirrup_tpu.ops.mm8_pallas as mp
    from chirrup_tpu.ops.mm8 import quantize
    from chirrup_tpu.ops.mm8_pallas import (
        mm8_fused_a8, mm8_fused_a8_ffn_stacked)

    B, K, F = 24, 256, 512
    x = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
    wk = quantize(rng.standard_normal((K, F)).astype(np.float32) * 0.1)
    wv = quantize(rng.standard_normal((F, K)).astype(np.float32) * 0.1)
    kk = mm8_fused_a8(x, wk.mx, wk.rx, wk.my, wk.ry, wk.q,
                      interpret=True, activation="relu2")
    kk = kk.astype(jnp.bfloat16).astype(jnp.float32)
    ref = np.asarray(mm8_fused_a8(kk, wv.mx, wv.rx, wv.my, wv.ry, wv.q,
                                  interpret=True))
    monkeypatch.setattr(mp, "_RESIDENT_BUDGET", 0)
    out = np.asarray(mm8_fused_a8_ffn_stacked(
        x, wk.mx, wk.rx, wk.my, wk.ry, wk.q[None],
        wv.mx, wv.rx, wv.my, wv.ry, wv.q[None], 0, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_fused_a8_xq_matches_decomposed(rng, monkeypatch):
    """The xq regime (XLA-side quant, int8-resident x) — forced by a budget
    that rejects the bf16-resident path but admits the int8 one — must match
    the same math via the xla_a8 decomposed form."""
    import chirrup_tpu.ops.mm8 as mm8mod
    import chirrup_tpu.ops.mm8_pallas as mp
    from chirrup_tpu.ops.mm8 import quantize
    from chirrup_tpu.ops.mm8_pallas import mm8_fused_a8, mm8_fused_a8_stacked

    monkeypatch.setattr(mp, "_RESIDENT_BUDGET", 220 * 1024)
    K, M, B = 256, 256, 24
    w = rng.standard_normal((K, M)).astype(np.float32) * 0.05 + 0.01
    qw = quantize(w)
    x = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
    ref = np.asarray(mm8_matmul(x, qw, core=mm8mod._int8_core_xla_a8))
    out = np.asarray(mm8_fused_a8(x, qw.mx, qw.rx, qw.my, qw.ry, qw.q,
                                  interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
    # relu2 epilogue in the xq kernel
    act = np.asarray(mm8_fused_a8(x, qw.mx, qw.rx, qw.my, qw.ry, qw.q,
                                  interpret=True, activation="relu2"))
    np.testing.assert_allclose(act, np.square(np.maximum(ref, 0.0)),
                               rtol=1e-3, atol=1e-4)
    # stacked flavor
    out_s = np.asarray(mm8_fused_a8_stacked(
        x, qw.mx, qw.rx, qw.my, qw.ry, qw.q[None], 0, interpret=True))
    np.testing.assert_allclose(out_s, ref, rtol=1e-4, atol=1e-4)


def test_fused_a8_multi_xq_matches_separate(rng, monkeypatch):
    """xq regime of the merged R/K/V kernel == per-projection fused calls."""
    import chirrup_tpu.ops.mm8_pallas as mp
    from chirrup_tpu.ops.mm8 import quantize
    from chirrup_tpu.ops.mm8_pallas import (
        mm8_fused_a8, mm8_fused_a8_multi_stacked)

    B, K, C, n_in = 24, 256, 256, 3
    x = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
    xx = jnp.asarray(rng.standard_normal((B, K)), jnp.float32) * 0.3
    mu = jnp.asarray(rng.standard_normal((n_in, K)), jnp.float32) * 0.5
    qs = [quantize(rng.standard_normal((K, C)).astype(np.float32) * 0.05)
          for _ in range(n_in)]
    q_cat = jnp.concatenate([w.q for w in qs], axis=1)[None]
    refs = [np.asarray(mm8_fused_a8(x + xx * mu[m], w.mx, w.rx, w.my, w.ry,
                                    w.q, interpret=True))
            for m, w in enumerate(qs)]
    monkeypatch.setattr(mp, "_RESIDENT_BUDGET", 220 * 1024)
    out = np.asarray(mm8_fused_a8_multi_stacked(
        x, xx, mu,
        jnp.concatenate([w.mx for w in qs]),
        jnp.concatenate([w.rx for w in qs]),
        jnp.stack([w.my for w in qs]), jnp.stack([w.ry for w in qs]),
        q_cat, 0, interpret=True))
    for m in range(n_in):
        np.testing.assert_allclose(out[:, m * C:(m + 1) * C], refs[m],
                                   rtol=1e-4, atol=1e-4)


def test_fused_a8_mul_in_matches_premultiplied(rng):
    """mul_in (the TMix gate fused into the quant prologue) == multiplying x
    in XLA first, on both the flat and stacked resident kernels."""
    from chirrup_tpu.ops.mm8 import quantize
    from chirrup_tpu.ops.mm8_pallas import mm8_fused_a8, mm8_fused_a8_stacked

    B, K, M = 8, 256, 256
    x = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, K)) * 0.5, jnp.float32)
    w = quantize(rng.standard_normal((K, M)).astype(np.float32) * 0.05)
    want = np.asarray(mm8_fused_a8(x * g, w.mx, w.rx, w.my, w.ry, w.q,
                                   interpret=True))
    got = np.asarray(mm8_fused_a8(x, w.mx, w.rx, w.my, w.ry, w.q,
                                  interpret=True, mul_in=g))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    got_s = np.asarray(mm8_fused_a8_stacked(
        x, w.mx, w.rx, w.my, w.ry, w.q[None], 0, interpret=True, mul_in=g))
    np.testing.assert_allclose(got_s, want, rtol=1e-5, atol=1e-5)


def test_ffn_pair_supported_at_headline_batch():
    """The one-launch FFN pair must cover the decode headline config
    (B=384, 7.2B dims): the round-2 flat B*F cap silently demoted it to two
    launches + an XLA quant pass. Prefill row counts still fall back."""
    from chirrup_tpu.ops.mm8_pallas import (mm8_ffn_supported,
                                            _ffn_resident_bytes,
                                            _RESIDENT_BUDGET)

    assert mm8_ffn_supported(200, 4096, 16384, 4096)
    assert mm8_ffn_supported(384, 4096, 16384, 4096)
    assert mm8_ffn_supported(448, 4096, 16384, 4096)
    # prefill shapes (slots x chunk tokens) exceed the resident budget
    assert not mm8_ffn_supported(2048, 4096, 16384, 4096)
    assert _ffn_resident_bytes(384, 4096, 16384, 4096) <= _RESIDENT_BUDGET
