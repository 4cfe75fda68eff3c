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


def _mm8_kernel(x_ref, q_ref, o_ref, *, n_k):
    """x stays fully VMEM-resident (index_map constant); q streams tile by tile.
    The k-reduction runs as n_k statically-unrolled sub-dots over the resident x,
    so HBM traffic is exactly the int8 weight bytes + one f32 output write."""
    x = x_ref[:]
    bk = x.shape[1] // n_k
    acc = jnp.dot(x[:, :bk], q_ref[:bk].astype(x.dtype),
                  preferred_element_type=jnp.float32)
    for i in range(1, n_k):
        acc += jnp.dot(x[:, i * bk:(i + 1) * bk],
                       q_ref[i * bk:(i + 1) * bk].astype(x.dtype),
                       preferred_element_type=jnp.float32)
    o_ref[:] = acc


# x (B, K) kept whole in VMEM: B<=256, K<=16384 bf16 = 8MB max — fits comfortably
_MAX_RESIDENT_X = 256 * 16384


@functools.partial(jax.jit, static_argnames=("interpret",))
def mm8_core_pallas(xs, q, *, interpret=False):
    """(B, K) float x (K, M) int8 -> (B, M) f32 with in-VMEM dequant.

    Shapes must tile (K, M by the chosen block sizes); callers fall back to the XLA
    path otherwise (ops/mm8.mm8_matmul handles the dispatch).
    """
    B, K = xs.shape
    K2, M = q.shape
    assert K == K2
    # q tile (K, bm) ~<=8MB int8 so double-buffered DMAs fit VMEM alongside x
    budget = 8 * 1024 * 1024
    bm = _pick_tile(M, tuple(c for c in (2048, 1024, 512, 256, 128)
                             if K * c <= budget))
    if not bm or B * K > _MAX_RESIDENT_X:
        raise ValueError(f"unsupported mm8 shapes B={B} K={K} M={M}")
    n_k = max(K // 2048, 1)

    kernel = functools.partial(_mm8_kernel, n_k=n_k)
    return pl.pallas_call(
        kernel,
        grid=(M // bm,),
        in_specs=[
            pl.BlockSpec((B, K), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bm), lambda m: (0, m), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, bm), lambda m: (0, m),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # resident x + double-buffered q tiles exceed the 16MB scoped-vmem
            # default; v5e has 128MB physical VMEM
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * M,
            bytes_accessed=K * M + B * K * xs.dtype.itemsize + B * M * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xs, q)


def _a8_kernel(x_ref, q_ref, o_ref, *, n_k):
    """int8 x int8 -> int32 on the native MXU int8 mode (v5e: 394 TOP/s, 2x
    bf16). x (B, K) int8 resident; q tiles stream. Accumulation is exact int32
    (max |acc| = K*127^2 ~ 2.6e8 at K=16384 < 2^31)."""
    x = x_ref[:]
    bk = x.shape[1] // n_k
    acc = jnp.dot(x[:, :bk], q_ref[:bk], preferred_element_type=jnp.int32)
    for i in range(1, n_k):
        acc += jnp.dot(x[:, i * bk:(i + 1) * bk],
                       q_ref[i * bk:(i + 1) * bk],
                       preferred_element_type=jnp.int32)
    o_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def mm8_core_pallas_a8(xs8, q, *, interpret=False):
    """(B, K) int8 x (K, M) int8 -> (B, M) int32, in-VMEM, native int8 MXU.

    Callers quantize activations per-token (ops/mm8.quantize_activations) and
    apply the (B, 1) scale to the int32 result outside; the rank-1 dequant
    corrections stay exact f32 so only the GEMM term sees activation rounding."""
    B, K = xs8.shape
    K2, M = q.shape
    assert K == K2 and xs8.dtype == jnp.int8
    budget = 8 * 1024 * 1024
    bm = _pick_tile(M, tuple(c for c in (2048, 1024, 512, 256, 128)
                             if K * c <= budget))
    if not bm or B * K > _MAX_RESIDENT_X:
        raise ValueError(f"unsupported mm8 shapes B={B} K={K} M={M}")
    n_k = max(K // 2048, 1)

    kernel = functools.partial(_a8_kernel, n_k=n_k)
    return pl.pallas_call(
        kernel,
        grid=(M // bm,),
        in_specs=[
            pl.BlockSpec((B, K), lambda m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bm), lambda m: (0, m), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, bm), lambda m: (0, m),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * M,
            bytes_accessed=K * M + B * K + B * M * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xs8, q)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mm8_core_pallas_a8_stacked(xs8, q_stacked, layer, *, interpret=False):
    """(B, K) int8 x (L, K, M) int8 [layer li] -> (B, M) int32.

    Same scalar-prefetch layer indexing as mm8_core_pallas_stacked (no XLA
    dynamic-slice copy of the codes), with the native int8 MXU dot."""
    B, K = xs8.shape
    L, K2, M = q_stacked.shape
    assert K == K2 and xs8.dtype == jnp.int8
    budget = 8 * 1024 * 1024
    bm = _pick_tile(M, tuple(c for c in (2048, 1024, 512, 256, 128)
                             if K * c <= budget))
    if not bm or B * K > _MAX_RESIDENT_X:
        raise ValueError(f"unsupported mm8 shapes B={B} K={K} M={M}")
    n_k = max(K // 2048, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M // bm,),
        in_specs=[
            pl.BlockSpec((B, K), lambda m, li: (0, 0)),
            pl.BlockSpec((1, K, bm), lambda m, li: (li[0], 0, m)),
        ],
        out_specs=pl.BlockSpec((B, bm), lambda m, li: (0, m)),
    )

    def kernel_stacked(li_ref, x_ref, q_ref, o_ref):
        x = x_ref[:]
        bk = x.shape[1] // n_k
        acc = jnp.dot(x[:, :bk], q_ref[0, :bk],
                      preferred_element_type=jnp.int32)
        for i in range(1, n_k):
            acc += jnp.dot(x[:, i * bk:(i + 1) * bk],
                           q_ref[0, i * bk:(i + 1) * bk],
                           preferred_element_type=jnp.int32)
        o_ref[:] = acc

    return pl.pallas_call(
        kernel_stacked,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, M), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * M,
            bytes_accessed=K * M + B * K + B * M * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), xs8, q_stacked)


def mm8_core_supported(B: int, K: int, M: int) -> bool:
    budget = 8 * 1024 * 1024
    return bool(_pick_tile(M, tuple(c for c in (2048, 1024, 512, 256, 128)
                                    if K * c <= budget))
                and B * K <= _MAX_RESIDENT_X)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mm8_core_pallas_stacked(xs, q_stacked, layer, *, interpret=False):
    """(B, K) float x (L, K, M) int8 [layer li] -> (B, M) f32.

    The layer index rides scalar prefetch and feeds the weight BlockSpec's
    index_map, so the kernel DMAs tiles straight out of the stacked buffer —
    an XLA-level dynamic-slice of the weights (which materializes a full copy
    in HBM before an opaque pallas call) never happens."""
    B, K = xs.shape
    L, K2, M = q_stacked.shape
    assert K == K2
    budget = 8 * 1024 * 1024
    bm = _pick_tile(M, tuple(c for c in (2048, 1024, 512, 256, 128)
                             if K * c <= budget))
    if not bm or B * K > _MAX_RESIDENT_X:
        raise ValueError(f"unsupported mm8 shapes B={B} K={K} M={M}")
    n_k = max(K // 2048, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # layer index
        grid=(M // bm,),
        in_specs=[
            pl.BlockSpec((B, K), lambda m, li: (0, 0)),
            pl.BlockSpec((1, K, bm), lambda m, li: (li[0], 0, m)),
        ],
        out_specs=pl.BlockSpec((B, bm), lambda m, li: (0, m)),
    )

    def kernel_stacked(li_ref, x_ref, q_ref, o_ref):
        x = x_ref[:]
        bk = x.shape[1] // n_k
        acc = jnp.dot(x[:, :bk], q_ref[0, :bk].astype(x.dtype),
                      preferred_element_type=jnp.float32)
        for i in range(1, n_k):
            acc += jnp.dot(x[:, i * bk:(i + 1) * bk],
                           q_ref[0, i * bk:(i + 1) * bk].astype(x.dtype),
                           preferred_element_type=jnp.float32)
        o_ref[:] = acc

    return pl.pallas_call(
        kernel_stacked,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, M), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * M,
            bytes_accessed=K * M + B * K * xs.dtype.itemsize + B * M * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), xs, q_stacked)
