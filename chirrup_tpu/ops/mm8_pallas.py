"""Pallas fused dequant-matmul for mm8 INT8 weights.

XLA's TPU backend does not fuse an int8->bf16 convert into a dot: it materializes a
bf16 copy of the weight in HBM, tripling the weight traffic (int8 read + bf16 write
+ bf16 read) — measured ~9x off speed-of-light on the 4096x65536 head. This kernel
converts int8 tiles to bf16 *in VMEM* and feeds the MXU directly, so HBM sees
exactly one byte per weight — the whole point of mm8 (reference scheme: the WMMA
fused dequant GEMM, scripts/test_mm8/rwkv_pip_operators.cu:448-545).

Only the inner `xs @ q` product lives here; the O(K)+O(M) dequant corrections stay
in XLA where they fuse for free (ops/mm8.py decomposed form).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(dim: int, candidates) -> int:
    for c in candidates:
        if dim % c == 0:
            return c
    return 0


def _mm8_kernel(x_ref, q_ref, o_ref, acc_ref, *, n_k):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], q_ref[:].astype(x_ref.dtype),
                          preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def mm8_core_pallas(xs, q, *, interpret=False):
    """(B, K) float x (K, M) int8 -> (B, M) f32 with in-register dequant.

    Shapes must tile (K, M by the chosen block sizes); callers fall back to the XLA
    path otherwise (ops/mm8.mm8_matmul handles the dispatch).
    """
    B, K = xs.shape
    K2, M = q.shape
    assert K == K2
    bk = _pick_tile(K, (2048, 1280, 1024, 512, 256, 128))
    bm = _pick_tile(M, (1024, 512, 256, 128))
    if not bk or not bm:
        raise ValueError(f"untileable mm8 shapes K={K} M={M}")
    n_k = K // bk

    kernel = functools.partial(_mm8_kernel, n_k=n_k)
    return pl.pallas_call(
        kernel,
        grid=(M // bm, n_k),
        in_specs=[
            pl.BlockSpec((B, bk), lambda m, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bm), lambda m, k: (k, m), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, bm), lambda m, k: (0, m),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, bm), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * M,
            bytes_accessed=K * M + B * K * xs.dtype.itemsize + B * M * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xs, q)


def mm8_core_supported(B: int, K: int, M: int) -> bool:
    return bool(_pick_tile(K, (2048, 1280, 1024, 512, 256, 128))
                and _pick_tile(M, (1024, 512, 256, 128)))
