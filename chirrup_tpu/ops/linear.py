"""Linear-layer dispatch: dense (bf16/fp32) or INT8 weight-only (mm8) matmul.

All model weights are stored for right-multiplication `x @ W` with W shaped
(in_features, out_features). Quantized weights are `Mm8Weight` pytree nodes and
dispatch to chirrup_tpu.ops.mm8.
"""

from __future__ import annotations

import jax.numpy as jnp


def matmul(x, w):
    """x @ w with fp32 MXU accumulation; w may be a dense array, an Mm8Weight, or
    a LayerIndexed view into a stacked Mm8Weight."""
    from chirrup_tpu.ops.mm8 import LayerIndexed, Mm8Weight, mm8_matmul

    if isinstance(w, (Mm8Weight, LayerIndexed)):
        return mm8_matmul(x, w)
    return jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype)
