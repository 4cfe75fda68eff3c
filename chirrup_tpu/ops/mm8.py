"""mm8 — INT8 weight-only quantized matmul (the "w8a16" scheme of the RWKV ecosystem).

Quantization scheme (bit-compatible with the rwkv pip package convention that the
reference engine benchmarks and specifies in
/root/reference/scripts/test_mm8/benchmark.py:54-85):

    # per-column mins/ranges mx,rx over axis 0; per-row my,ry over axis 1
    w_norm = (w - my - mx) / rx / ry          in [0, 1]
    q_u8   = clip(floor(w_norm * 256), 0, 255)
    stored scales: rx/16, ry/16  (so dequant (q+0.5)*(rx/16)*(ry/16) folds the /256)
    dequant: W_hat = (q_u8 + 0.5) * ry * rx + my + mx

Matmul uses the decomposed dequantization (reference benchmark.py:167-193): with
xs = x * ry,

    y = rx * (xs @ q + 0.5 * sum(xs)) + sum(x * my) + mx * sum(x)

so the inner GEMM runs directly on the int8 weight (converted in-register on TPU) and
the O(K)+O(M) corrections are cheap fused vector ops — HBM traffic is the int8 weight
read, i.e. ~2x less than bf16 weights.

Storage note: TPU kernels prefer signed int8; we store q_i8 = q_u8 - 128 and fold the
shift into the correction constant (0.5 -> 128.5).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Mm8Weight:
    """INT8 weight for `x @ W`, W logically (K, M)."""

    q: Any   # (K, M) int8, value = round-to-floor u8 code - 128
    mx: Any  # (M,) f32 per-column offset
    rx: Any  # (M,) f32 per-column scale (stored /16, format-compatible)
    my: Any  # (K,) f32 per-row offset
    ry: Any  # (K,) f32 per-row scale (stored /16)

    @property
    def shape(self):
        return self.q.shape

    @property
    def dtype(self):  # for duck-typing where callers peek at weight dtype
        return jnp.int8


def quantize(w) -> Mm8Weight:
    """Quantize a dense (K, M) matrix. Min/max factor order follows the reference
    (rows>cols does my,mx,rx,ry; else mx,my,rx,ry — benchmark.py:60-77)."""
    w = jnp.asarray(w, jnp.float32)
    if w.shape[0] > w.shape[1]:
        my = jnp.min(w, axis=1, keepdims=True)
        w = w - my
        mx = jnp.min(w, axis=0, keepdims=True)
        w = w - mx
        rx = jnp.max(w, axis=0, keepdims=True)
        w = w / rx
        ry = jnp.max(w, axis=1, keepdims=True)
        w = w / ry
    else:
        mx = jnp.min(w, axis=0, keepdims=True)
        w = w - mx
        my = jnp.min(w, axis=1, keepdims=True)
        w = w - my
        rx = jnp.max(w, axis=0, keepdims=True)
        w = w / rx
        ry = jnp.max(w, axis=1, keepdims=True)
        w = w / ry
    q_u8 = jnp.clip(jnp.floor(w * 256.0), 0, 255)
    q_i8 = (q_u8 - 128).astype(jnp.int8)
    return Mm8Weight(
        q=q_i8,
        mx=mx.reshape(-1),
        rx=(rx / 16.0).reshape(-1),
        my=my.reshape(-1),
        ry=(ry / 16.0).reshape(-1),
    )


def dequantize(w: Mm8Weight):
    """Reference dequant W_hat = (q_u8 + 0.5) * ry*rx + my + mx (fp32, for tests)."""
    q_u8 = w.q.astype(jnp.float32) + 128.0
    return (q_u8 + 0.5) * (w.ry[:, None] * 16.0) * (w.rx[None, :] * 16.0) / 256.0 \
        + w.my[:, None] + w.mx[None, :]


def _int8_core_xla(xs, q):
    """(B?, K) @ (K, M) int8 via XLA dot. NOTE: XLA:TPU materializes the bf16
    convert of q in HBM (3x weight traffic) — the Pallas core avoids that."""
    return jnp.dot(xs, q.astype(xs.dtype), preferred_element_type=jnp.float32)


def quantize_activations(xs):
    """Per-row (per-token) symmetric int8 quantization of the scaled activations.

    Returns (xs8 int8, s (B, 1) f32) with xs ~= xs8 * s. Used by the a8 cores:
    the MXU then runs a native int8 x int8 -> int32 dot at 2x the bf16 rate
    (v5e: 394 int8 TOP/s vs 197 bf16 TFLOP/s). The rank-1 dequant corrections
    stay exact f32, so the only extra error vs w8a16 is the ~7-bit rounding of
    the GEMM term's activations."""
    xf = xs.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-20)
    xs8 = jnp.round(xf / s).astype(jnp.int8)
    return xs8, s


def _int8_core_xla_a8(xs, q):
    """w8a8 core: dynamic per-token int8 activations, native int8 MXU dot."""
    xs8, s = quantize_activations(xs)
    acc = jnp.dot(xs8, q, preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * s


def _int8_core_pallas_a8(xs, q):
    """w8a8 via the Pallas kernel: 1 byte/weight HBM + native int8 MXU dot."""
    from chirrup_tpu.ops.mm8_pallas import mm8_core_pallas_a8

    xs8, s = quantize_activations(xs)
    return mm8_core_pallas_a8(xs8, q,
                              interpret=_interpret()).astype(jnp.float32) * s


# Trace-time dispatch settings. THREAD-LOCAL: jit traces run on the calling
# thread, and each engine worker thread drives its own ServingModel (possibly
# with different core/interpret settings); process-wide globals would let one
# thread's settings leak into another's lazy first trace.
import threading

_SETTINGS = threading.local()


def set_default_core(name: str) -> None:
    """Select the inner int8 GEMM used when mm8_matmul gets core=None. Resolved
    at trace time on the calling thread; ServingModel re-applies it from
    RuntimeConfig.mm8_core before every public call."""
    assert name in ("auto", "pallas", "pallas_a8", "xla", "xla_a8"), name
    _SETTINGS.core = name


def set_interpret(flag: bool) -> None:
    """Run the Pallas mm8 kernels in interpret mode (trace-time, thread-local,
    like set_default_core). Lets CPU tests exercise the exact serving dispatch."""
    _SETTINGS.interpret = bool(flag)


def _interpret() -> bool:
    return getattr(_SETTINGS, "interpret", False)


def _resolved_core() -> str:
    """"auto" -> the fastest backend-appropriate core. On TPU that is the w8a8
    Pallas kernel (native int8 MXU ~1.5x the bf16 dot at serving shapes, same
    1 byte/weight HBM); off-TPU the plain XLA dot. The exact w8a16 scheme stays
    available as mm8_core="pallas"."""
    core = getattr(_SETTINGS, "core", "auto")
    if core != "auto":
        return core
    return ("pallas_a8" if jax.default_backend() in ("tpu", "axon") else "xla")


def _int8_core_auto(xs, q):
    core = _resolved_core()
    if core == "xla_a8":
        return _int8_core_xla_a8(xs, q)
    B, K = xs.shape
    M = q.shape[1]
    if core in ("pallas", "pallas_a8"):
        from chirrup_tpu.ops.mm8_pallas import mm8_core_pallas, mm8_core_supported

        if mm8_core_supported(B, K, M):
            if core == "pallas_a8":
                return _int8_core_pallas_a8(xs, q)
            return mm8_core_pallas(xs, q, interpret=_interpret())
        if core == "pallas_a8":
            return _int8_core_xla_a8(xs, q)
    return _int8_core_xla(xs, q)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Mm8MultiWeight:
    """n Mm8Weights with the same input dim K merged along the output dim.

    Built by merge_stacked() from stacked per-layer weights so projections that
    share the same (x, xx) token-shift inputs (TMix R/K/V) run as ONE fused
    Pallas launch (mm8_pallas.mm8_fused_a8_multi_stacked): one resident
    activation pair, one weight stream, one output write."""

    q: Any   # (L, K, n*C) int8 — horizontally concatenated codes
    mx: Any  # (L, n*C) f32 concatenated per-column offsets
    rx: Any  # (L, n*C) f32 concatenated per-column scales (/16)
    my: Any  # (L, n, K) f32 per-projection per-row offsets
    ry: Any  # (L, n, K) f32 per-projection per-row scales (/16)

    @property
    def n_in(self) -> int:
        return self.my.shape[1]


def merge_stacked(ws, tp: int = 1) -> Mm8MultiWeight:
    """Merge stacked (L, K, C_i) Mm8Weights sharing K into one Mm8MultiWeight.
    All C_i must be equal (the fused kernel tiles a uniform per-projection C).

    tp > 1 interleaves the merged columns by tensor-parallel shard group —
    global order [W0_s0 | W1_s0 | ... | W0_s1 | W1_s1 | ...] — so that sharding
    the merged axis over tp hands each chip a contiguous [W0_loc | W1_loc | ...]
    block: inside shard_map the local layout is exactly the tp=1 layout, and
    mm8_multi_matmul / the fused kernel work unchanged on the shard."""
    assert len({w.q.shape for w in ws}) == 1, [w.q.shape for w in ws]
    n = len(ws)
    L, K, C = ws[0].q.shape
    assert C % tp == 0, (C, tp)

    def interleave(parts):
        # each part (..., C) -> (..., tp, C/tp); stack projections after the
        # shard axis; flatten back to (..., n*C)
        lead_idx = parts[0].ndim - 1
        split = [p.reshape(p.shape[:-1] + (tp, C // tp)) for p in parts]
        stacked = jnp.stack(split, axis=lead_idx + 1)  # (..., tp, n, C/tp)
        return stacked.reshape(parts[0].shape[:-1] + (n * C,))

    return Mm8MultiWeight(
        q=interleave([w.q for w in ws]),
        mx=interleave([w.mx for w in ws]),
        rx=interleave([w.rx for w in ws]),
        my=jnp.stack([w.my for w in ws], axis=1),
        ry=jnp.stack([w.ry for w in ws], axis=1),
    )


def mm8_multi_matmul(x, xx, mu, w: Mm8MultiWeight, li):
    """n token-shift-mixed projections y_m = (x + xx*mu[m]) @ W_m in one call.

    x, xx: (..., K) float (xx is the token-shift delta); mu: (n, K) mix vectors.
    Returns (..., n*C) in x.dtype — callers split per projection. On the TPU
    pallas_a8 path this is a single fused kernel launch; elsewhere it falls back
    to per-projection mm8_matmul on sliced views (exact same math as unmerged).
    """
    lead = x.shape[:-1]
    K = x.shape[-1]
    Mtot = w.q.shape[2]
    n = w.n_in
    C = Mtot // n
    x2 = x.reshape(-1, K)
    B = x2.shape[0]
    if _resolved_core() == "pallas_a8":
        from chirrup_tpu.ops.mm8_pallas import (
            mm8_fused_supported, mm8_fused_a8_multi_stacked)

        if mm8_fused_supported(B, K, C):
            pick = lambda v: jax.lax.dynamic_index_in_dim(
                v, li, 0, keepdims=False)
            y = mm8_fused_a8_multi_stacked(
                x2, xx.reshape(-1, K), jnp.asarray(mu), pick(w.mx), pick(w.rx),
                pick(w.my), pick(w.ry), w.q, li, interpret=_interpret())
            return y.reshape(lead + (Mtot,))
    outs = []
    for m in range(n):
        xm = x + xx * mu[m]
        pick = lambda v: jax.lax.dynamic_index_in_dim(v, li, 0, keepdims=False)
        wm = Mm8Weight(
            q=pick(w.q)[:, m * C:(m + 1) * C],
            mx=pick(w.mx)[m * C:(m + 1) * C],
            rx=pick(w.rx)[m * C:(m + 1) * C],
            my=pick(w.my)[m], ry=pick(w.ry)[m])
        outs.append(mm8_matmul(xm, wm))
    return jnp.concatenate(outs, axis=-1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LayerIndexed:
    """Layer `li` of a stacked (L, ...) Mm8Weight, WITHOUT slicing the codes.

    An XLA dynamic-slice of the int8 codes feeding an opaque pallas call
    materializes a full per-layer weight copy in HBM each step; instead the
    stacked codes go to the kernel whole and `li` rides scalar prefetch into the
    BlockSpec index_map. Only the small per-row/column scale vectors are sliced
    in XLA (they fuse into the rank-1 corrections)."""

    w: Mm8Weight   # stacked: q (L, K, M), scales (L, M)/(L, K)
    li: Any        # int32 layer index (traced)

    @property
    def shape(self):
        return self.w.q.shape[1:]


def mm8_ffn_matmul(x, wk, wv):
    """The CMix relu²-FFN pair `relu(x @ Wk)² @ Wv` as ONE fused Pallas kernel
    when supported (TPU decode shapes): the (B, d_ffn) intermediate stays in
    VMEM instead of round-tripping HBM between two launches. Falls back to two
    mm8_matmuls (relu² fused into the first) elsewhere."""
    if (_resolved_core() == "pallas_a8"
            and isinstance(wk, LayerIndexed) and isinstance(wv, LayerIndexed)):
        from chirrup_tpu.ops.mm8_pallas import (
            mm8_ffn_supported, mm8_fused_a8_ffn_stacked)

        lead = x.shape[:-1]
        K = x.shape[-1]
        x2 = x.reshape(-1, K)
        B = x2.shape[0]
        L, K2, F = wk.w.q.shape
        M = wv.w.q.shape[2]
        if mm8_ffn_supported(B, K, F, M):
            pk = lambda v: jax.lax.dynamic_index_in_dim(
                getattr(wk.w, v), wk.li, 0, keepdims=False)
            pv = lambda v: jax.lax.dynamic_index_in_dim(
                getattr(wv.w, v), wv.li, 0, keepdims=False)
            y = mm8_fused_a8_ffn_stacked(
                x2, pk("mx"), pk("rx"), pk("my"), pk("ry"), wk.w.q,
                pv("mx"), pv("rx"), pv("my"), pv("ry"), wv.w.q, wk.li,
                interpret=_interpret())
            return y.reshape(lead + (M,))
    kk = mm8_matmul(x, wk, activation="relu2")
    return mm8_matmul(kk, wv)


def mm8_matmul(x, w, *, core=None, activation=None, mul_in=None):
    """Decomposed-dequant matmul. x: (..., K) float; returns (..., M) in x.dtype.

    w: Mm8Weight, or LayerIndexed for one layer of a stacked Mm8Weight.
    `core` overrides the inner int8 GEMM; default picks the Pallas fused-dequant
    kernel on TPU (1 byte/weight HBM traffic) and the XLA dot elsewhere.
    `activation` ("relu2") is applied to the output — in-kernel on the fused
    Pallas path, as an XLA epilogue otherwise.

    On the default TPU path (resolved core "pallas_a8") the ENTIRE matmul —
    activation scale+quantize, int8 GEMM, rank-1 dequant corrections — runs as
    one fused Pallas kernel with zero XLA-side elementwise passes (those f32
    passes measured ~30-80us per matmul at B=200, ~10 ms/step at 7.2B).
    `mul_in` (an elementwise input multiplier, the TMix gate) rides the fused
    kernel's quantization prologue on that path.
    """
    if core is None and _resolved_core() == "pallas_a8" and x.ndim >= 1:
        from chirrup_tpu.ops.mm8_pallas import (
            mm8_fused_a8, mm8_fused_a8_stacked, mm8_fused_supported)

        lead = x.shape[:-1]
        K = x.shape[-1]
        x2 = x.reshape(-1, K)
        B = x2.shape[0]
        mul2 = None if mul_in is None else mul_in.reshape(-1, K)
        if isinstance(w, LayerIndexed):
            Mo = w.w.q.shape[2]
            if mm8_fused_supported(B, K, Mo):
                pick = lambda v: jax.lax.dynamic_index_in_dim(
                    v, w.li, 0, keepdims=False)
                y = mm8_fused_a8_stacked(
                    x2, pick(w.w.mx), pick(w.w.rx), pick(w.w.my),
                    pick(w.w.ry), w.w.q, w.li, activation=activation,
                    mul_in=mul2, interpret=_interpret())
                return y.reshape(lead + (Mo,))
        else:
            Mo = w.q.shape[1]
            if mm8_fused_supported(B, K, Mo):
                y = mm8_fused_a8(x2, w.mx, w.rx, w.my, w.ry, w.q,
                                 activation=activation, mul_in=mul2,
                                 interpret=_interpret())
                return y.reshape(lead + (Mo,))
    if mul_in is not None:
        x = x * mul_in

    if isinstance(w, LayerIndexed):
        stacked, li = w.w, w.li
        pick = lambda v: jax.lax.dynamic_index_in_dim(v, li, 0, keepdims=False)
        mx, rx, my, ry = (pick(stacked.mx), pick(stacked.rx),
                          pick(stacked.my), pick(stacked.ry))
        q = stacked.q  # (L, K, M) — NOT sliced
        M = q.shape[2]

        def stacked_core(xs, q3):
            core_name = _resolved_core()
            if core_name == "xla_a8":
                # NOTE: slices the per-layer codes in XLA (extra HBM copy) —
                # probing-only; serving uses pallas_a8
                return _int8_core_xla_a8(
                    xs, jax.lax.dynamic_index_in_dim(q3, li, 0, keepdims=False))
            if core_name in ("pallas", "pallas_a8"):
                from chirrup_tpu.ops.mm8_pallas import (
                    mm8_core_pallas_a8_stacked, mm8_core_pallas_stacked,
                    mm8_core_supported)
                B, K = xs.shape
                if mm8_core_supported(B, K, M):
                    if core_name == "pallas_a8":
                        xs8, s = quantize_activations(xs)
                        acc = mm8_core_pallas_a8_stacked(xs8, q3, li,
                                                         interpret=_interpret())
                        return acc.astype(jnp.float32) * s
                    return mm8_core_pallas_stacked(xs, q3, li,
                                                   interpret=_interpret())
                if core_name == "pallas_a8":
                    return _int8_core_xla_a8(
                        xs,
                        jax.lax.dynamic_index_in_dim(q3, li, 0, keepdims=False))
            return _int8_core_xla(
                xs, jax.lax.dynamic_index_in_dim(q3, li, 0, keepdims=False))

        core = core or stacked_core
    else:
        mx, rx, my, ry = w.mx, w.rx, w.my, w.ry
        q = w.q
        M = q.shape[1]
        core = core or _int8_core_auto
    in_dtype = x.dtype
    K = x.shape[-1]
    lead = x.shape[:-1]
    x2 = x.reshape(-1, K)
    xf = x2.astype(jnp.float32)
    ry = ry * 16.0
    rx = rx * 16.0
    xs_f = xf * ry[None, :]
    xs = xs_f.astype(in_dtype if in_dtype != jnp.float32 else jnp.float32)
    core_out = core(xs, q)  # (B, M) f32 ; codes are q_u8 - 128
    xs_sum = jnp.sum(xs_f, axis=-1, keepdims=True)
    x_sum = jnp.sum(xf, axis=-1, keepdims=True)
    xmy_sum = jnp.sum(xf * my[None, :], axis=-1, keepdims=True)
    # (q_i8 + 128.5) = (q_u8 + 0.5): fold the int8 shift into the rank-1 correction
    y = (rx[None, :] / 256.0) * (core_out + 128.5 * xs_sum) + xmy_sum \
        + mx[None, :] * x_sum
    if activation == "relu2":
        y = jnp.square(jnp.maximum(y, 0.0))
    elif activation is not None:
        raise ValueError(f"unknown mm8 activation {activation!r}")
    return y.reshape(lead + (M,)).astype(in_dtype)
