"""Linear-layer dispatch: dense (bf16/fp32) or INT8 weight-only (mm8) matmul.

All model weights are stored for right-multiplication `x @ W` with W shaped
(in_features, out_features). Quantized weights are `Mm8Weight` pytree nodes and
dispatch to chirrup_tpu.ops.mm8.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def matmul(x, w, *, activation=None, mul_in=None):
    """x @ w with fp32 MXU accumulation; w may be a dense array, an Mm8Weight, or
    a LayerIndexed view into a stacked Mm8Weight. `activation` ("relu2") is an
    output epilogue — fused into the Pallas mm8 kernel on the TPU path.
    `mul_in` is an elementwise input multiplier (the TMix output gate) — fused
    into the mm8 kernel's quantization prologue on the TPU decode path, one
    fewer (B, C) XLA pass per layer."""
    from chirrup_tpu.ops.mm8 import LayerIndexed, Mm8Weight, mm8_matmul

    if isinstance(w, (Mm8Weight, LayerIndexed)):
        return mm8_matmul(x, w, activation=activation, mul_in=mul_in)
    if mul_in is not None:
        x = x * mul_in
    y = jnp.dot(x, w.astype(x.dtype),
                preferred_element_type=jnp.float32).astype(x.dtype)
    if activation == "relu2":
        y = jnp.square(jax.nn.relu(y))
    elif activation is not None:
        raise ValueError(f"unknown activation {activation!r}")
    return y
