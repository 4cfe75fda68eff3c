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


def _pick_nk(K: int) -> int:
    """K-split of the in-kernel dot. Swept on v5e at B=200: n_k=2 wins at every
    serving shape (16384x4096: nk2 122us vs nk8 130us; 4096x4096: nk2 34us vs
    nk1 65us) — one split keeps the MXU pipeline primed without shrinking the
    sub-dots into overhead."""
    return 2 if K % 2 == 0 else 1


def _pick_bm(K: int, M: int, budget: int = 8 * 1024 * 1024,
             rows: int = 0) -> int:
    """M-tile size for the weight stream.

    rows: the GEMM's row count when the caller knows it — the deep-K
    preference flips at prefill row counts (see below).

    Swept on v5e with seconds-scale chained-loop totals
    (scripts/sweep_fused_kernels.py, round-3 reruns with the device_get sync —
    block_until_ready is not a reliable barrier on this backend): 4096x4096
    wants bm=512 (Wo 32.8us vs 38.4 at 2048; the 2-step bm2048 grid cannot
    pipeline DMA against the MXU); 4096x16384 wants 512 at the B=384 headline
    batch (FFN pair 319.8us vs 356-368 at 1024 — at this B the pair is
    MXU-bound, and the smaller tile keeps the int8 dots pipelined against the
    phase-2 stream; B=200 measured 1024 ahead by only 1.2%, so 512 is the
    shared choice); 16384x4096 keeps 256 (the deep K makes bigger tiles
    starve double-buffering; pairing it with 512 measured 216-219us at B=200
    and 366.9 vs 319.8 at B=384)."""
    cands = tuple(c for c in (2048, 1024, 512, 256, 128)
                  if K * c <= budget and M % c == 0)
    if not cands:
        return 0
    if K * M > 32 * 1024 * 1024:
        # deep-K (FFN-V 16384x4096): at DECODE batches small tiles keep
        # double-buffering fed (256: 216-219 us at B=200, 366.9 vs 319.8 at
        # B=384); at PREFILL row counts the GEMM is MXU-bound and the
        # 2x-fewer tile boundaries win — bm=512 measured 1.49 vs 2.08
        # ms/call at B=2048 rows (round-5 sweep, chained-loop slope).
        # wide-M shallow-K (FFN-K 4096x16384): 512 (see sweep numbers above)
        if K > 8192:
            prefer = (512, 256) if rows >= 1024 else (256, 512)
        else:
            prefer = (512, 256)
        for small in prefer:
            if small in cands:
                return small
    if 512 in cands:
        return 512
    return cands[0]


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
# (bound for the NON-row-tiled cores only; the fused a8 kernels below instead
# make a VMEM-budget decision and fall to a row grid at prefill shapes)
_MAX_RESIDENT_X = 256 * 16384

# VMEM bytes the fused kernels may spend on row-resident operands/scratch,
# leaving headroom under the 100MB vmem_limit for double-buffered weight tiles
_RESIDENT_BUDGET = 64 * 1024 * 1024


def _pick_row_tile(B: int, per_row_bytes: int,
                   budget: int = 36 * 1024 * 1024) -> int:
    """Row-tile size for the 2-D (rows, M-tiles) fused grids. Prefers a tile
    that divides B (no pad rows); must be a sublane multiple (8). Weight tiles
    are re-streamed once per row block, so bigger is better until VMEM."""
    bmax = max(8, -(-B // 8) * 8)  # never a tile bigger than B (rounded to 8)
    cands = [bt for bt in (2048, 1024, 512, 256, 128, 64, 32, 16, 8)
             if bt <= bmax and bt * per_row_bytes <= budget]
    if not cands:
        raise ValueError(f"no row tile fits VMEM ({per_row_bytes} B/row)")
    for bt in cands:
        if B % bt == 0:
            return bt
    return cands[0]  # wrapper pads rows to a multiple


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
    bm = _pick_bm(K, M)
    if not bm or B * K > _MAX_RESIDENT_X:
        raise ValueError(f"unsupported mm8 shapes B={B} K={K} M={M}")
    n_k = _pick_nk(K)

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


def _int8_split_dot(x8, q, n_k):
    """(B, K) int8 x (K, bm) int8 -> (B, bm) int32 on the native int8 MXU
    (v5e: 394 TOP/s, 2x bf16), as n_k statically-unrolled K-splits to keep the
    pipeline primed. Accumulation is exact int32 (max |acc| = K*127^2 ~ 2.6e8
    at K=16384 < 2^31)."""
    bk = x8.shape[1] // n_k
    acc = jnp.dot(x8[:, :bk], q[:bk], preferred_element_type=jnp.int32)
    for i in range(1, n_k):
        acc += jnp.dot(x8[:, i * bk:(i + 1) * bk],
                       q[i * bk:(i + 1) * bk],
                       preferred_element_type=jnp.int32)
    return acc


def _quant_rows(xf, ry, my):
    """Per-row activation quantization + the decomposed-dequant row stats.

    xf: (B, K) f32; ry/my: (1, K) f32 Mm8Weight fields (ry stored /16).
    Returns (x8 int8, s, xs_sum, x_sum, xmy_sum) — each stat (B, 1) f32."""
    xs_f = xf * (ry * 16.0)
    s = jnp.maximum(jnp.max(jnp.abs(xs_f), axis=1, keepdims=True) / 127.0,
                    1e-20)
    x8 = jnp.round(xs_f / s).astype(jnp.int8)
    return (x8, s, jnp.sum(xs_f, axis=1, keepdims=True),
            jnp.sum(xf, axis=1, keepdims=True),
            jnp.sum(xf * my, axis=1, keepdims=True))


def _dequant_tile(acc, rx_t, mx_t, s, xs_sum, x_sum, xmy_sum):
    """Rank-1 dequant corrections for one output tile (exact f32):
    y = rx/256 * (s*acc + 128.5*xs_sum) + xmy_sum + mx*x_sum, with the int8
    code shift folded into the 128.5 (= 0.5 + 128) constant."""
    return (rx_t * (16.0 / 256.0)) * (acc.astype(jnp.float32) * s
                                      + 128.5 * xs_sum) \
        + xmy_sum + mx_t * x_sum


def _a8_kernel(x_ref, q_ref, o_ref, *, n_k):
    """int8 x int8 -> int32; x (B, K) int8 resident, q tiles stream."""
    o_ref[:] = _int8_split_dot(x_ref[:], q_ref[:], n_k)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mm8_core_pallas_a8(xs8, q, *, interpret=False):
    """(B, K) int8 x (K, M) int8 -> (B, M) int32, in-VMEM, native int8 MXU.

    Callers quantize activations per-token (ops/mm8.quantize_activations) and
    apply the (B, 1) scale to the int32 result outside; the rank-1 dequant
    corrections stay exact f32 so only the GEMM term sees activation rounding."""
    B, K = xs8.shape
    K2, M = q.shape
    assert K == K2 and xs8.dtype == jnp.int8
    bm = _pick_bm(K, M)
    if not bm or B * K > _MAX_RESIDENT_X:
        raise ValueError(f"unsupported mm8 shapes B={B} K={K} M={M}")
    n_k = _pick_nk(K)

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
    bm = _pick_bm(K, M)
    if not bm or B * K > _MAX_RESIDENT_X:
        raise ValueError(f"unsupported mm8 shapes B={B} K={K} M={M}")
    n_k = _pick_nk(K)

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
        o_ref[:] = _int8_split_dot(x_ref[:], q_ref[0], n_k)

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


def _apply_activation(y, activation):
    """Output epilogue applied in-kernel (f32, before the output cast). 'relu2'
    is the CMix relu-squared (reference Albatross/rwkv7.py:674-679) — fusing it
    here saves an XLA read+write pass over the (B, d_ffn) activation."""
    if activation is None:
        return y
    if activation == "relu2":
        return jnp.square(jnp.maximum(y, 0.0))
    raise ValueError(f"unknown mm8 activation {activation!r}")


def _a8_fused_kernel(x_ref, mx_ref, rx_ref, my_ref, ry_ref, q_ref, o_ref,
                     xs8_ref, stats_ref, *, n_k, activation=None, m_axis=0,
                     mul_ref=None):
    """Whole mm8 matmul in one kernel: activation scale+quantize, int8 GEMM,
    decomposed-dequant corrections, bf16 output.

    The first M-tile of each row block computes the per-row activation stats
    and int8 codes once into VMEM scratch; every M-tile then runs the int8 dot
    and applies y = rx/256 * (s*acc + 128.5*xs_sum) + xmy_sum + mx*x_sum
    directly, so HBM traffic is x (bf16) + q (int8) + y (out dtype) — the
    XLA-side f32 elementwise passes (measured ~30-80us per matmul at B=200)
    disappear. m_axis: which grid axis walks the M tiles (1 on the row-tiled
    (rows, M) grids used at prefill shapes, 0 on the resident 1-D grid).

    stats columns: 0=s (activation scale), 1=xs_sum, 2=x_sum, 3=xmy_sum.
    """
    f32 = jnp.float32

    @pl.when(pl.program_id(m_axis) == 0)
    def _prep():
        xf = x_ref[:].astype(f32)
        if mul_ref is not None:
            xf = xf * mul_ref[:].astype(f32)  # fused input gate
        x8, s, xs_sum, x_sum, xmy_sum = _quant_rows(
            xf, ry_ref[:].astype(f32), my_ref[:].astype(f32))
        xs8_ref[:] = x8
        stats_ref[:, 0:1] = s
        stats_ref[:, 1:2] = xs_sum
        stats_ref[:, 2:3] = x_sum
        stats_ref[:, 3:4] = xmy_sum

    acc = _int8_split_dot(xs8_ref[:], q_ref[:], n_k)
    y = _dequant_tile(acc, rx_ref[:].astype(f32), mx_ref[:].astype(f32),
                      stats_ref[:, 0:1], stats_ref[:, 1:2],
                      stats_ref[:, 2:3], stats_ref[:, 3:4])
    y = _apply_activation(y, activation)
    o_ref[:] = y.astype(o_ref.dtype)


def _fused_specs(Bt, K, M, bm, stacked=False, rows=False):
    """BlockSpecs for the fused single-projection kernel. rows=True builds the
    2-D (row-block, M-tile) grid variant: x/out get a row index, the scale
    vectors and weight tiles ignore it. Index maps take (*grid, li) when
    stacked (scalar-prefetched layer index)."""
    def imap(fn):
        # grid idx order: (m,) | (b, m); + trailing li when stacked
        if rows:
            return (lambda b, m, li: fn(b, m)) if stacked \
                else (lambda b, m: fn(b, m))
        return (lambda m, li: fn(0, m)) if stacked else (lambda m: fn(0, m))

    q_tile = (1, K, bm) if stacked else (K, bm)
    q_idx = (lambda b, m: (0, 0, m)) if stacked else (lambda b, m: (0, m))
    if stacked:
        q_spec = pl.BlockSpec(q_tile, (lambda b, m, li: (li[0], 0, m)) if rows
                              else (lambda m, li: (li[0], 0, m)))
    else:
        q_spec = pl.BlockSpec(q_tile, imap(q_idx))
    return (pl.BlockSpec((Bt, K), imap(lambda b, m: (b, 0))),   # x
            pl.BlockSpec((1, bm), imap(lambda b, m: (0, m))),   # mx
            pl.BlockSpec((1, bm), imap(lambda b, m: (0, m))),   # rx
            pl.BlockSpec((1, K), imap(lambda b, m: (0, 0))),    # my
            pl.BlockSpec((1, K), imap(lambda b, m: (0, 0))),    # ry
            q_spec,
            pl.BlockSpec((Bt, bm), imap(lambda b, m: (b, m))))  # out


def _xq_stats(x, my, ry):
    """XLA-side activation quantization + decomposed-dequant row stats (the
    same math as the in-kernel _quant_rows, hoisted out for large row counts).
    Returns (x8 (B, K) int8, stats (B, 4) f32 [s, xs_sum, x_sum, xmy_sum])."""
    xf = x.astype(jnp.float32)
    myf = my.reshape(1, -1).astype(jnp.float32)
    ryf = ry.reshape(1, -1).astype(jnp.float32)
    xs_f = xf * (ryf * 16.0)
    s = jnp.maximum(jnp.max(jnp.abs(xs_f), axis=1, keepdims=True) / 127.0,
                    1e-20)
    x8 = jnp.round(xs_f / s).astype(jnp.int8)
    stats = jnp.concatenate(
        [s, jnp.sum(xs_f, axis=1, keepdims=True),
         jnp.sum(xf, axis=1, keepdims=True),
         jnp.sum(xf * myf, axis=1, keepdims=True)], axis=1)
    return x8, stats


def _a8_xq_kernel(x8_ref, stats_ref, mx_ref, rx_ref, q_ref, o_ref, *,
                  n_k, activation=None):
    """GEMM + dequant-corrections with PRE-quantized activations: x8 stays
    whole in VMEM (int8 — 4x smaller than bf16 + scratch, so prefill row
    counts fit resident and the weights stream exactly once)."""
    f32 = jnp.float32
    acc = _int8_split_dot(x8_ref[:], q_ref[:], n_k)
    y = _dequant_tile(acc, rx_ref[:].astype(f32), mx_ref[:].astype(f32),
                      stats_ref[:, 0:1], stats_ref[:, 1:2],
                      stats_ref[:, 2:3], stats_ref[:, 3:4])
    o_ref[:] = _apply_activation(y, activation).astype(o_ref.dtype)


def _fused_a8_call(x, mx, rx, my, ry, q, layer, *, interpret, activation,
                   mul_in=None):
    """Shared implementation of the fused single-projection kernels. Three
    regimes by row count (B may be slots x chunk tokens at prefill):

    1. resident: x whole in VMEM, quantized in-kernel on the first M tile —
       zero XLA elementwise passes (the decode path).
    2. xq-resident: activations quantized ONCE in XLA; the int8 x (4x
       smaller) stays resident so the weights still stream exactly once.
    3. row-grid: 2-D (row-block, M-tile) grid; weights re-stream once per
       row block, amortized over the compute-bound GEMM.
    """
    B, K = x.shape
    stacked = layer is not None
    M = q.shape[-1]
    bm = _pick_bm(K, M, rows=B)
    if not bm:
        raise ValueError(f"unsupported mm8 shapes B={B} K={K} M={M}")
    n_k = _pick_nk(K)
    xb = x.dtype.itemsize

    # in-kernel quant transiently materializes ~two (B, K) f32 copies
    out2 = 2 * B * bm * xb
    resident = B * (K * (xb + 1) + 8 * K) + 2 * K * bm + out2 + 512 * B
    xq_resident = B * (K + 16) + 2 * K * bm + out2
    if mul_in is not None and resident > _RESIDENT_BUDGET:
        # only the resident kernel fuses the input multiplier; other regimes
        # (prefill shapes) premultiply in XLA, which they'd pay anyway
        x = x * mul_in
        mul_in = None
    if resident <= _RESIDENT_BUDGET:
        Bt, rows = B, False
        grid = (M // bm,)
        m_axis = 0
    elif xq_resident <= _RESIDENT_BUDGET:
        x8, stats = _xq_stats(x, my, ry)
        grid_spec_in = [
            pl.BlockSpec((B, K), (lambda m, li: (0, 0)) if stacked
                         else (lambda m: (0, 0))),
            pl.BlockSpec((B, 4), (lambda m, li: (0, 0)) if stacked
                         else (lambda m: (0, 0))),
            pl.BlockSpec((1, bm), (lambda m, li: (0, m)) if stacked
                         else (lambda m: (0, m))),
            pl.BlockSpec((1, bm), (lambda m, li: (0, m)) if stacked
                         else (lambda m: (0, m))),
            pl.BlockSpec((1, K, bm), (lambda m, li: (li[0], 0, m)))
            if stacked else pl.BlockSpec((K, bm), lambda m: (0, m)),
        ]
        o_spec = pl.BlockSpec((B, bm), (lambda m, li: (0, m)) if stacked
                              else (lambda m: (0, m)))
        cparams = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024)
        cost = pl.CostEstimate(
            flops=2 * B * K * M,
            bytes_accessed=K * M + B * K + B * M * xb, transcendentals=0)
        out_shape = jax.ShapeDtypeStruct((B, M), x.dtype)
        if stacked:
            def kernel(li_ref, x8_ref, st_ref, mx_ref, rx_ref, q_ref, o_ref):
                _a8_xq_kernel(x8_ref, st_ref, mx_ref, rx_ref, q_ref[0],
                              o_ref, n_k=n_k, activation=activation)

            return pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1, grid=(M // bm,),
                    in_specs=grid_spec_in, out_specs=o_spec),
                out_shape=out_shape, compiler_params=cparams,
                cost_estimate=cost, interpret=interpret,
            )(jnp.asarray(layer, jnp.int32).reshape(1), x8, stats,
              mx.reshape(1, M), rx.reshape(1, M), q)
        return pl.pallas_call(
            functools.partial(_a8_xq_kernel, n_k=n_k, activation=activation),
            grid=(M // bm,), in_specs=grid_spec_in, out_specs=o_spec,
            out_shape=out_shape, compiler_params=cparams,
            cost_estimate=cost, interpret=interpret,
        )(x8, stats, mx.reshape(1, M), rx.reshape(1, M), q)
    else:
        Bt = _pick_row_tile(B, K * (xb + 1) + 8 * K + 2 * bm * xb)
        rows = True
        pad = (-B) % Bt
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0)))
        grid = ((B + pad) // Bt, M // bm)
        m_axis = 1

    *in_specs, o_spec = _fused_specs(Bt, K, M, bm, stacked=stacked, rows=rows)
    if mul_in is not None:
        # same block shape/index as x, inserted right after it
        in_specs = [in_specs[0], in_specs[0]] + list(in_specs[1:])
    scratch = [pltpu.VMEM((Bt, K), jnp.int8),
               pltpu.VMEM((Bt, 128), jnp.float32)]
    cost = pl.CostEstimate(
        flops=2 * B * K * M,
        bytes_accessed=(grid[0] * K * M if rows else K * M)
        + B * K * xb + B * M * xb,
        transcendentals=0)
    cparams = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",) * len(grid),
        vmem_limit_bytes=100 * 1024 * 1024)
    out_shape = jax.ShapeDtypeStruct((x.shape[0], M), x.dtype)

    if stacked:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid, in_specs=list(in_specs),
            out_specs=o_spec, scratch_shapes=scratch)

        if mul_in is None:
            def kernel(li_ref, x_ref, mx_ref, rx_ref, my_ref, ry_ref, q_ref,
                       o_ref, xs8_ref, stats_ref):
                _a8_fused_kernel(x_ref, mx_ref, rx_ref, my_ref, ry_ref,
                                 q_ref[0], o_ref, xs8_ref, stats_ref, n_k=n_k,
                                 activation=activation, m_axis=m_axis)

            args = (jnp.asarray(layer, jnp.int32).reshape(1), x,
                    mx.reshape(1, M), rx.reshape(1, M), my.reshape(1, K),
                    ry.reshape(1, K), q)
        else:
            def kernel(li_ref, x_ref, mul_ref, mx_ref, rx_ref, my_ref,
                       ry_ref, q_ref, o_ref, xs8_ref, stats_ref):
                _a8_fused_kernel(x_ref, mx_ref, rx_ref, my_ref, ry_ref,
                                 q_ref[0], o_ref, xs8_ref, stats_ref, n_k=n_k,
                                 activation=activation, m_axis=m_axis,
                                 mul_ref=mul_ref)

            args = (jnp.asarray(layer, jnp.int32).reshape(1), x, mul_in,
                    mx.reshape(1, M), rx.reshape(1, M), my.reshape(1, K),
                    ry.reshape(1, K), q)
        y = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            compiler_params=cparams, cost_estimate=cost, interpret=interpret,
        )(*args)
    else:
        if mul_in is None:
            y = pl.pallas_call(
                functools.partial(_a8_fused_kernel, n_k=n_k,
                                  activation=activation, m_axis=m_axis),
                grid=grid, in_specs=list(in_specs), out_specs=o_spec,
                out_shape=out_shape, scratch_shapes=scratch,
                compiler_params=cparams, cost_estimate=cost,
                interpret=interpret,
            )(x, mx.reshape(1, M), rx.reshape(1, M), my.reshape(1, K),
              ry.reshape(1, K), q)
        else:
            def kernel_mul(x_ref, mul_ref, mx_ref, rx_ref, my_ref, ry_ref,
                           q_ref, o_ref, xs8_ref, stats_ref):
                _a8_fused_kernel(x_ref, mx_ref, rx_ref, my_ref, ry_ref, q_ref,
                                 o_ref, xs8_ref, stats_ref, n_k=n_k,
                                 activation=activation, m_axis=m_axis,
                                 mul_ref=mul_ref)

            y = pl.pallas_call(
                kernel_mul,
                grid=grid, in_specs=list(in_specs), out_specs=o_spec,
                out_shape=out_shape, scratch_shapes=scratch,
                compiler_params=cparams, cost_estimate=cost,
                interpret=interpret,
            )(x, mul_in, mx.reshape(1, M), rx.reshape(1, M),
              my.reshape(1, K), ry.reshape(1, K), q)
    return y[:B] if y.shape[0] != B else y


@functools.partial(jax.jit, static_argnames=("interpret", "activation"))
def mm8_fused_a8(x, mx, rx, my, ry, q, *, interpret=False, activation=None,
                 mul_in=None):
    """Fused full mm8 matmul: (B, K) float x (K, M) int8 -> (B, M) in x.dtype.

    Scale vectors are the Mm8Weight fields (rx/ry stored /16). Equivalent to
    ops.mm8.mm8_matmul with the a8 core, but with zero XLA-side elementwise
    passes. Any B: large row counts (prefill) run on a row-tiled grid.
    mul_in: optional (B, K) elementwise input multiplier fused into the
    quantization prologue (the TMix output gate)."""
    return _fused_a8_call(x, mx, rx, my, ry, q, None, interpret=interpret,
                          activation=activation, mul_in=mul_in)


@functools.partial(jax.jit, static_argnames=("interpret", "activation"))
def mm8_fused_a8_stacked(x, mx, rx, my, ry, q_stacked, layer, *,
                         interpret=False, activation=None, mul_in=None):
    """Fused full mm8 matmul on layer `layer` of stacked (L, K, M) int8 codes.

    The per-layer scale vectors are passed already sliced (they are O(K+M) f32 —
    the XLA slice is negligible); the codes are indexed in the BlockSpec via
    scalar prefetch, never copied. Any B (see mm8_fused_a8)."""
    return _fused_a8_call(x, mx, rx, my, ry, q_stacked, layer,
                          interpret=interpret, activation=activation,
                          mul_in=mul_in)


def _a8_fused_multi_kernel(x_ref, xx_ref, mu_ref, mx_ref, rx_ref, my_ref,
                           ry_ref, q_ref, o_ref, xs8_ref, stats_ref, *,
                           n_k, n_in, tiles_per_in, m_axis=0):
    """Fused MULTI-matmul: n_in projections off the same (x, xx) pair.

    Computes x_m = x + xx * mu[m] (the token-shift mix), quantizes each variant
    once into scratch on grid step 0, then streams the horizontally-concatenated
    weights; each M-tile selects its variant's int8 codes and stats. One kernel
    launch and one (x, xx) read replace n_in launches + n_in materialized mixed
    activations.

    Shapes: x/xx (B, K); mu/my/ry (n_in, K); mx/rx (n_in*C,) concatenated;
    q (K, n_in*C). stats rows per variant: [s, xs_sum, x_sum, xmy_sum].
    """
    f32 = jnp.float32
    B = x_ref.shape[0]

    def _prep_variant(m):
        """Quantize variant m's mixed activations into scratch. Lazy: runs at
        variant m's FIRST tile, so variants 1.. prep while earlier variants'
        int8 dots occupy the MXU (an eager prep-all at step 0 serialized ~3x
        the VPU work in front of the pipeline — measured 54% vs ~75% of HBM
        speed-of-light for the single-projection kernels)."""
        xm = x_ref[:].astype(f32) \
            + xx_ref[:].astype(f32) * mu_ref[m, :][None, :].astype(f32)
        x8, s, xs_sum, x_sum, xmy_sum = _quant_rows(
            xm, ry_ref[m, :][None, :].astype(f32),
            my_ref[m, :][None, :].astype(f32))
        xs8_ref[m] = x8
        stats_ref[:, 4 * m + 0:4 * m + 1] = s
        stats_ref[:, 4 * m + 1:4 * m + 2] = xs_sum
        stats_ref[:, 4 * m + 2:4 * m + 3] = x_sum
        stats_ref[:, 4 * m + 3:4 * m + 4] = xmy_sum

    for m in range(n_in):
        @pl.when(pl.program_id(m_axis) == m * tiles_per_in)
        def _prep(m=m):
            _prep_variant(m)

    def tile_for(m):
        acc = _int8_split_dot(xs8_ref[m], q_ref[0], n_k)
        y = _dequant_tile(acc, rx_ref[:].astype(f32), mx_ref[:].astype(f32),
                          stats_ref[:, 4 * m + 0:4 * m + 1],
                          stats_ref[:, 4 * m + 1:4 * m + 2],
                          stats_ref[:, 4 * m + 2:4 * m + 3],
                          stats_ref[:, 4 * m + 3:4 * m + 4])
        o_ref[:] = y.astype(o_ref.dtype)

    which = pl.program_id(m_axis) // tiles_per_in
    for m in range(n_in):
        @pl.when(which == m)
        def _run(m=m):
            tile_for(m)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mm8_fused_a8_multi_stacked(x, xx, mu, mx, rx, my, ry, q_stacked, layer, *,
                               interpret=False):
    """n_in token-shift-mixed projections of one layer in ONE fused kernel.

    x, xx: (B, K). mu/my/ry: (n_in, K) per-projection vectors (already sliced
    for `layer`). mx/rx: (n_in*C,) concatenated output scales. q_stacked:
    (L, K, n_in*C) int8 codes, layer-indexed via scalar prefetch.
    Returns (B, n_in*C) in x.dtype — callers split it per projection.
    """
    B, K = x.shape
    L, K2, Mtot = q_stacked.shape
    n_in = mu.shape[0]
    assert K == K2 and Mtot % n_in == 0
    C = Mtot // n_in
    bm = _pick_bm(K, C)
    if not bm:
        raise ValueError(f"unsupported mm8 shapes B={B} K={K} M={Mtot}")
    n_k = _pick_nk(K)
    tiles_per_in = C // bm
    xb = x.dtype.itemsize

    # per row: x + xx resident (bf16) + n_in int8 scratch variants
    # (+ ~two transient (., K) f32 copies during in-kernel quant)
    out2 = 2 * B * bm * xb
    resident = B * (K * (2 * xb + n_in) + 8 * K) + 2 * K * bm + out2
    xq_resident = B * (n_in * K + 16 * n_in) + 2 * K * bm + out2
    if resident <= _RESIDENT_BUDGET:
        Bt, rows, m_axis = B, False, 0
        grid = (Mtot // bm,)
    elif xq_resident <= _RESIDENT_BUDGET:
        # pre-quantized variants: mix + quantize in XLA once, keep ONE int8
        # variant resident at a time, stream the merged weights exactly once.
        # The variant is a GRID dimension (v, m) — the old 1-D grid indexed
        # x8_ref[m] on a (n_in, B, K) VMEM ref inside @pl.when branches,
        # a dynamic leading-dim read that re-materializes the whole (B, K)
        # slice per weight tile (profiled at 48% of the int8-MXU floor at
        # 2048 prefill rows); a (1, B, K) BlockSpec keyed on v stays resident
        # across the variant's tiles with zero in-kernel selection.
        x8s, stats = [], []
        for m in range(n_in):
            x8_m, st_m = _xq_stats(x + xx * mu[m], my[m], ry[m])
            x8s.append(x8_m)
            stats.append(st_m)
        x8 = jnp.stack(x8s)                       # (n_in, B, K)
        stats = jnp.stack(stats, axis=0)          # (n_in, B, 4)

        def kernel(li_ref, x8_ref, st_ref, mx_ref, rx_ref, q_ref, o_ref):
            acc = _int8_split_dot(x8_ref[0], q_ref[0], n_k)
            y = _dequant_tile(
                acc, rx_ref[:].astype(jnp.float32),
                mx_ref[:].astype(jnp.float32),
                st_ref[0, :, 0:1], st_ref[0, :, 1:2],
                st_ref[0, :, 2:3], st_ref[0, :, 3:4])
            o_ref[:] = y.astype(o_ref.dtype)

        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_in, tiles_per_in),
                in_specs=[
                    pl.BlockSpec((1, B, K), lambda v, m, li: (v, 0, 0)),
                    pl.BlockSpec((1, B, 4), lambda v, m, li: (v, 0, 0)),
                    pl.BlockSpec((1, bm),
                                 lambda v, m, li: (0, v * tiles_per_in + m)),
                    pl.BlockSpec((1, bm),
                                 lambda v, m, li: (0, v * tiles_per_in + m)),
                    pl.BlockSpec((1, K, bm),
                                 lambda v, m, li:
                                 (li[0], 0, v * tiles_per_in + m)),
                ],
                out_specs=pl.BlockSpec(
                    (B, bm), lambda v, m, li: (0, v * tiles_per_in + m))),
            out_shape=jax.ShapeDtypeStruct((B, Mtot), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=2 * B * K * Mtot,
                bytes_accessed=K * Mtot + n_in * B * K + B * Mtot * xb,
                transcendentals=0),
            interpret=interpret,
        )(jnp.asarray(layer, jnp.int32).reshape(1), x8, stats,
          mx.reshape(1, Mtot), rx.reshape(1, Mtot), q_stacked)
    else:
        Bt = _pick_row_tile(B, K * (2 * xb + n_in) + 8 * K + 2 * bm * xb)
        rows, m_axis = True, 1
        pad = (-B) % Bt
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0)))
            xx = jnp.pad(xx, ((0, pad), (0, 0)))
        grid = ((B + pad) // Bt, Mtot // bm)

    def imap(fn):  # grid idx (m,)|(b, m), + scalar-prefetched li
        return (lambda b, m, li: fn(b, m)) if rows \
            else (lambda m, li: fn(0, m))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Bt, K), imap(lambda b, m: (b, 0))),       # x
            pl.BlockSpec((Bt, K), imap(lambda b, m: (b, 0))),       # xx
            pl.BlockSpec((n_in, K), imap(lambda b, m: (0, 0))),     # mu
            pl.BlockSpec((1, bm), imap(lambda b, m: (0, m))),       # mx
            pl.BlockSpec((1, bm), imap(lambda b, m: (0, m))),       # rx
            pl.BlockSpec((n_in, K), imap(lambda b, m: (0, 0))),     # my
            pl.BlockSpec((n_in, K), imap(lambda b, m: (0, 0))),     # ry
            pl.BlockSpec((1, K, bm), (lambda b, m, li: (li[0], 0, m)) if rows
                         else (lambda m, li: (li[0], 0, m))),
        ],
        out_specs=pl.BlockSpec((Bt, bm), imap(lambda b, m: (b, m))),
        scratch_shapes=[
            pltpu.VMEM((n_in, Bt, K), jnp.int8),
            pltpu.VMEM((Bt, 128), jnp.float32),
        ],
    )

    def kernel(li_ref, *refs):
        _a8_fused_multi_kernel(*refs, n_k=n_k, n_in=n_in,
                               tiles_per_in=tiles_per_in, m_axis=m_axis)

    y = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((x.shape[0], Mtot), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * len(grid),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * Mtot,
            bytes_accessed=(grid[0] * K * Mtot if rows else K * Mtot)
            + 2 * B * K * xb + B * Mtot * xb,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x, xx, mu,
      mx.reshape(1, Mtot), rx.reshape(1, Mtot), my, ry, q_stacked)
    return y[:B] if y.shape[0] != B else y


def _a8_ffn_kernel(li_ref, x_ref, mxk_ref, rxk_ref, myk_ref, ryk_ref, qk_ref,
                   mxv_ref, rxv_ref, myv_ref, ryv_ref, qv_ref, o_ref,
                   x8_ref, k_ref, k8_ref, stats_ref, *, nk_x, nk_f, n1, bm1,
                   m_axis=0):
    """Whole relu²-FFN (CMix) in ONE kernel: y = relu(mm8(x, Wk))² @ mm8 Wv.

    Two-phase 1-D grid: steps [0, n1) stream Wk tiles and write the relu²'d
    intermediate into VMEM scratch; steps [n1, n1+n2) quantize it once (lazy,
    at the phase boundary) and stream Wv tiles into the output. The (B, d_ffn)
    intermediate never touches HBM and the second GEMM starts without a fresh
    kernel-launch ramp. stats cols: 0-3 = x-side [s, xs_sum, x_sum, xmy_sum],
    4-7 = the same for the intermediate."""
    f32 = jnp.float32
    pid = pl.program_id(m_axis)

    def quant_into(xf, ry_v, my_v, base):
        x8, s, xs_sum, x_sum, xmy_sum = _quant_rows(xf, ry_v, my_v)
        stats_ref[:, base + 0:base + 1] = s
        stats_ref[:, base + 1:base + 2] = xs_sum
        stats_ref[:, base + 2:base + 3] = x_sum
        stats_ref[:, base + 3:base + 4] = xmy_sum
        return x8

    def dequant(acc, rx_t, mx_t, base):
        return _dequant_tile(acc, rx_t, mx_t,
                             stats_ref[:, base + 0:base + 1],
                             stats_ref[:, base + 1:base + 2],
                             stats_ref[:, base + 2:base + 3],
                             stats_ref[:, base + 3:base + 4])

    @pl.when(pid == 0)
    def _prep_x():
        x8_ref[:] = quant_into(x_ref[:].astype(f32),
                               ryk_ref[:].astype(f32),
                               myk_ref[:].astype(f32), 0)

    @pl.when(pid < n1)
    def _phase1():
        acc = _int8_split_dot(x8_ref[:], qk_ref[0], nk_x)
        y = dequant(acc, rxk_ref[:].astype(f32), mxk_ref[:].astype(f32), 0)
        kk = jnp.square(jnp.maximum(y, 0.0))
        k_ref[:, pl.ds(pid * bm1, bm1)] = kk.astype(k_ref.dtype)

    @pl.when(pid == n1)
    def _prep_k():
        k8_ref[:] = quant_into(k_ref[:].astype(f32),
                               ryv_ref[:].astype(f32),
                               myv_ref[:].astype(f32), 4)

    @pl.when(pid >= n1)
    def _phase2():
        acc = _int8_split_dot(k8_ref[:], qv_ref[0], nk_f)
        y = dequant(acc, rxv_ref[:].astype(f32), mxv_ref[:].astype(f32), 4)
        o_ref[:] = y.astype(o_ref.dtype)


def mm8_fused_supported(B: int, K: int, M: int) -> bool:
    """Shape predicate for the fused a8 kernels (mm8_fused_a8[_stacked],
    mm8_fused_a8_multi_stacked). Any row count B: large-B shapes run the
    row-tiled grid, so only the M tiling must work out."""
    return bool(_pick_bm(K, M))


def _ffn_resident_bytes(B: int, K: int, F: int, M: int,
                        xb: int = 2) -> int:
    """VMEM footprint of the one-launch FFN pair at B resident rows: x + the
    (B, F) intermediate (each bf16 + int8 scratch), double-buffered weight
    tiles for both phases, and the output tile."""
    bm1, bm2 = _pick_bm(K, F), _pick_bm(F, M)
    per_row = K * (xb + 1) + F * (xb + 1)
    return B * per_row + 2 * (K * bm1 + F * bm2) + 2 * B * bm2 * xb


def mm8_ffn_supported(B: int, K: int, F: int, M: int) -> bool:
    """Bounds for the two-phase FFN PAIR kernel: M is the second GEMM's
    output dim — checked with the same _pick_bm the kernel uses (M == K for
    CMix, but the predicate must not assume it). Gated on the pair's actual
    resident VMEM footprint (the round-2 flat B*F cap silently kicked the
    B=384 decode headline config off the one-launch pair even though its
    ~41MB footprint fits); larger row counts (prefill) fall back to two fused
    single matmuls (mm8.mm8_ffn_matmul), each of which picks the xq-resident
    or row-grid regime — re-streaming both weight matrices per row block in
    the pair's rows-grid would cost more than the two-launch fallback."""
    return bool(_pick_bm(K, F) and _pick_bm(F, M)
                and _ffn_resident_bytes(B, K, F, M) <= _RESIDENT_BUDGET)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mm8_fused_a8_ffn_stacked(x, kmx, krx, kmy, kry, qk_stacked,
                             vmx, vrx, vmy, vry, qv_stacked, layer, *,
                             interpret=False):
    """relu²-FFN pair on layer `layer` of stacked codes, one kernel launch.

    x: (B, K). Wk: qk (L, K, F) + per-layer-sliced scales; Wv: qv (L, F, M).
    Returns (B, M) in x.dtype. The intermediate relu(mm8(x,Wk))² lives only in
    VMEM (reference runs these as two kernels with an HBM round-trip between,
    Albatross/rwkv7.py:674-679)."""
    B, K = x.shape
    L, K2, F = qk_stacked.shape
    L2, F2, M = qv_stacked.shape
    assert K == K2 and F == F2 and L == L2
    bm1 = _pick_bm(K, F)
    bm2 = _pick_bm(F, M)
    if not (bm1 and bm2):
        # row counts beyond the resident budget run the kernel's own
        # row-tiled grid; mm8_ffn_supported is the DISPATCHER's policy
        # (mm8.mm8_ffn_matmul prefers two single-stream launches there)
        raise ValueError(f"unsupported ffn shapes B={B} K={K} F={F} M={M}")
    n1 = F // bm1
    n2 = M // bm2
    nk_x = _pick_nk(K)
    nk_f = _pick_nk(F)
    xb = x.dtype.itemsize

    # per row: x resident (bf16+int8) + the (., F) intermediate (bf16+int8)
    per_row = K * (xb + 1) + F * (xb + 1)
    resident = B * per_row + 2 * (K * bm1 + F * bm2) + 2 * B * bm2 * xb
    if resident <= _RESIDENT_BUDGET:
        Bt, rows, m_axis = B, False, 0
        grid = (n1 + n2,)
    else:
        Bt = _pick_row_tile(B, per_row + 2 * bm2 * xb)
        rows, m_axis = True, 1
        pad = (-B) % Bt
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0)))
        grid = ((B + pad) // Bt, n1 + n2)

    def clamp1(m):
        return jnp.minimum(m, n1 - 1)

    def clamp2(m):
        return jnp.clip(m - n1, 0, n2 - 1)

    def imap(fn):  # grid idx (m,)|(b, m), + scalar-prefetched li
        return (lambda b, m, li: fn(b, m)) if rows \
            else (lambda m, li: fn(0, m))

    def qmap(fn):  # weight specs need li too
        return (lambda b, m, li: fn(m, li)) if rows \
            else (lambda m, li: fn(m, li))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Bt, K), imap(lambda b, m: (b, 0))),         # x
            pl.BlockSpec((1, bm1), imap(lambda b, m: (0, clamp1(m)))),  # k mx
            pl.BlockSpec((1, bm1), imap(lambda b, m: (0, clamp1(m)))),  # k rx
            pl.BlockSpec((1, K), imap(lambda b, m: (0, 0))),            # k my
            pl.BlockSpec((1, K), imap(lambda b, m: (0, 0))),            # k ry
            pl.BlockSpec((1, K, bm1), qmap(lambda m, li: (li[0], 0, clamp1(m)))),
            pl.BlockSpec((1, bm2), imap(lambda b, m: (0, clamp2(m)))),  # v mx
            pl.BlockSpec((1, bm2), imap(lambda b, m: (0, clamp2(m)))),  # v rx
            pl.BlockSpec((1, F), imap(lambda b, m: (0, 0))),            # v my
            pl.BlockSpec((1, F), imap(lambda b, m: (0, 0))),            # v ry
            pl.BlockSpec((1, F, bm2), qmap(lambda m, li: (li[0], 0, clamp2(m)))),
        ],
        out_specs=pl.BlockSpec((Bt, bm2), imap(lambda b, m: (b, clamp2(m)))),
        scratch_shapes=[
            pltpu.VMEM((Bt, K), jnp.int8),       # x8
            pltpu.VMEM((Bt, F), jnp.bfloat16),   # relu² intermediate
            pltpu.VMEM((Bt, F), jnp.int8),       # k8
            pltpu.VMEM((Bt, 128), jnp.float32),  # stats
        ],
    )

    def kernel(li_ref, *refs):
        _a8_ffn_kernel(li_ref, *refs, nk_x=nk_x, nk_f=nk_f, n1=n1, bm1=bm1,
                       m_axis=m_axis)

    y = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((x.shape[0], M), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * len(grid),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * F + 2 * B * F * M,
            bytes_accessed=(grid[0] * (K * F + F * M) if rows
                            else (K * F + F * M)) + B * K * xb + B * M * xb,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x,
      kmx.reshape(1, F), krx.reshape(1, F), kmy.reshape(1, K),
      kry.reshape(1, K), qk_stacked,
      vmx.reshape(1, M), vrx.reshape(1, M), vmy.reshape(1, F),
      vry.reshape(1, F), qv_stacked)
    return y[:B] if y.shape[0] != B else y


def mm8_core_supported(B: int, K: int, M: int) -> bool:
    return bool(_pick_bm(K, M) and B * K <= _MAX_RESIDENT_X)


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
    bm = _pick_bm(K, M)
    if not bm or B * K > _MAX_RESIDENT_X:
        raise ValueError(f"unsupported mm8 shapes B={B} K={K} M={M}")
    n_k = _pick_nk(K)

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
