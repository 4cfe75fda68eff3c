"""ServingModel — the jitted device-side half of the continuous-batching engine.

The reference worker mutates GPU tensors imperatively (slot swaps, in-place penalty
scatters, per-slot state copies — chirrup/worker.py:304-669). Here the whole batch
lives in one functional `BatchCarry` pytree threaded through three jitted programs
with donated buffers, so XLA updates everything in place without host round-trips:

  decode_step:  one token for every active slot (decode + one-by-one prefill),
                penalties, rwkv-pip-compatible sampling — the hot program.
  prefill_step: a fixed-size token chunk with per-slot valid lengths; inactive slots
                have length 0 and are untouched (mask-based, vs the reference's
                physical re-batching to the min remaining length).
  insert/reset/extract_slot: per-request state entry/exit (new request, finished
                request, prefix-cache snapshot).

Shapes never depend on occupancy, so each program compiles exactly once.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from chirrup_tpu.models.config import RWKV7Config, RuntimeConfig
from chirrup_tpu.models import rwkv7 as model
from chirrup_tpu.models.rwkv7 import RWKVState
from chirrup_tpu.ops import mm8
from chirrup_tpu.ops import wkv7 as wkv7_ref
from chirrup_tpu.ops import wkv7_pallas
from chirrup_tpu.ops.sampling import (
    sample_logits_rwkv_pip_fast, record_sampled_token)
from chirrup_tpu.ops.sampling_pallas import (
    penalty_tail, penalty_tail_supported, sample_from_chunks)
from chirrup_tpu.engine.structures import NO_PENALTY_TOKEN_IDS, RequestState

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BatchCarry:
    """All per-slot device state of one worker batch."""

    state: RWKVState        # shift (L,2,B,C), wkv (L,B,N,HN), elapsed (B,)
    occurrence: Any         # (B, V) f32
    presence_vec: Any       # (B, V) f32 — presence-penalty bias, PLUS 1e10 at
                            # forbidden token ids (folded in at slot insert so
                            # the step reads one (B, V) bias buffer, not two;
                            # forbidden ids are never sampled, so the sampled-
                            # token overwrite can't clobber the forbidden bias)
    temperature: Any        # (B,) f32
    top_p: Any              # (B,) f32
    top_k: Any              # (B,) i32
    frequency_penalty: Any  # (B,) f32
    presence_penalty: Any   # (B,) f32
    penalty_decay: Any      # (B,) f32
    last_sampled: Any       # (B,) i32 — device-resident decode feedback (pipelining)
    rng: Any                # jax PRNG key


def forbidden_bias_row(forbidden_ids, V) -> np.ndarray:
    """Arbitrary-size forbidden set -> (V,) f32 host bias with 1e10 at the
    forbidden ids (built once per slot insert, not per step; no size cap —
    the reference accepts arbitrary sets, chirrup/worker.py:719-722)."""
    bias = np.zeros((V,), np.float32)
    ids = np.asarray(list(forbidden_ids), np.int64)
    if ids.size:
        # out-of-range ids are silently ignored (reference parity: its -=1e10
        # scatter on a (V,) row can never hit them either; raising here would
        # abort the whole request over a harmless padded-vocab id)
        ids = ids[(ids >= 0) & (ids < V)]
        bias[ids] = 1e10
    return bias


def _quantize_params(params):
    """INT8-quantize the big matmul weights (att R/K/V/O, ffn K/V, head), keeping
    embeddings, norms, and the small LoRA projections dense — the mm8 scope of the
    reference (scripts/test_mm8, SURVEY §2.1 K7)."""
    blocks = dict(params["blocks"])
    att = dict(blocks["att"])
    ffn = dict(blocks["ffn"])

    def q_stacked(w):
        # (L, K, M) -> per-layer Mm8Weight stacked via vmap-compatible tree
        qs = [mm8.quantize(w[i]) for i in range(w.shape[0])]
        return mm8.Mm8Weight(
            q=jnp.stack([x.q for x in qs]),
            mx=jnp.stack([x.mx for x in qs]),
            rx=jnp.stack([x.rx for x in qs]),
            my=jnp.stack([x.my for x in qs]),
            ry=jnp.stack([x.ry for x in qs]),
        )

    for k in ("Wr", "Wk", "Wv", "Wo"):
        att[k] = q_stacked(att[k])
    for k in ("Wk", "Wv"):
        ffn[k] = q_stacked(ffn[k])
    blocks["att"] = att
    blocks["ffn"] = ffn
    out = dict(params)
    out["blocks"] = blocks
    out["head"] = mm8.quantize(params["head"])
    return out


def _merge_att_rkv(params, tp: int = 1):
    """Merge the stacked att R/K/V Mm8Weights into one Mm8MultiWeight so the
    step computes all three projections (plus their token-shift mixes and
    activation quantization) in ONE fused Pallas launch
    (ops/mm8_pallas.mm8_fused_a8_multi_stacked). No-op unless all three are
    quantized. Under a tp mesh the merged columns are interleaved by shard
    group (mm8.merge_stacked tp arg) so each chip's local block is the
    standard [R|K|V] layout."""
    att = params["blocks"]["att"]
    ws = [att.get(k) for k in ("Wr", "Wk", "Wv")]
    if not all(isinstance(w, mm8.Mm8Weight) for w in ws):
        return params
    att = {k: v for k, v in att.items() if k not in ("Wr", "Wk", "Wv")}
    att["Wrkv"] = mm8.merge_stacked(ws, tp=tp)
    blocks = dict(params["blocks"])
    blocks["att"] = att
    out = dict(params)
    out["blocks"] = blocks
    return out


def _pack_att_lora(params):
    """Pack the four TMix LoRA chains (decay w, iclr a, v-gate v, gate g) into
    batched (L, 4, C, D) / (L, 4, D, C) tensors so each layer runs TWO batched
    einsums instead of eight narrow dots (their N dims of 32-128 are well under
    MXU width, so the eight launches are latency- not flops-bound).

    Zero-padding to the common D keeps the math exact: padded stage-1 columns
    are 0 (or sigmoid(0)=0.5 for the g slice), and the matching stage-2 rows
    are 0, so padded lanes contribute nothing."""
    att = dict(params["blocks"]["att"])
    names1 = ("w1", "a1", "v1", "g1")
    names2 = ("w2", "a2", "v2", "g2")
    if not all(n in att for n in names1 + names2):
        return params
    D = max(att[n].shape[2] for n in names1)

    def pad1(w):  # (L, C, d) -> (L, C, D)
        return jnp.pad(w, ((0, 0), (0, 0), (0, D - w.shape[2])))

    def pad2(w):  # (L, d, C) -> (L, D, C)
        return jnp.pad(w, ((0, 0), (0, D - w.shape[1]), (0, 0)))

    att["lora1"] = jnp.stack([pad1(att[n]) for n in names1], axis=1)
    att["lora2"] = jnp.stack([pad2(att[n]) for n in names2], axis=1)
    for n in names1 + names2:
        del att[n]
    # GroupNorm params pre-transposed to the WKV kernel's (N, H) i-on-sublane
    # layout for the fused TMix epilogue (lane splits are impossible in-kernel)
    L, C = att["ln_x_w"].shape
    H = C // 64
    att["ln_x_w_nh"] = att["ln_x_w"].reshape(L, H, 64).swapaxes(1, 2)
    att["ln_x_b_nh"] = att["ln_x_b"].reshape(L, H, 64).swapaxes(1, 2)
    blocks = dict(params["blocks"])
    blocks["att"] = att
    out = dict(params)
    out["blocks"] = blocks
    return out


def _host_row(arr, axis, row):
    """Fetch row `row` along `axis` of a (possibly multi-process) global
    array: fully-addressable arrays use a plain device_get; otherwise only
    this host's addressable shards are read and assembled (the lockstep
    extract outputs are dp-sharded so a host's row lives on its own chips,
    possibly split over tp on another axis)."""
    if getattr(arr, "is_fully_addressable", True):
        return np.asarray(jax.device_get(arr)).take(row, axis=axis)
    shape = list(arr.shape)
    shape.pop(axis)
    out = None
    for sh in arr.addressable_shards:
        idx = sh.index
        sl = idx[axis]
        start = sl.start or 0
        stop = sl.stop if sl.stop is not None else arr.shape[axis]
        if not (start <= row < stop):
            continue
        data = np.asarray(sh.data).take(row - start, axis=axis)
        if out is None:
            out = np.zeros(shape, data.dtype)
        rest = tuple(s for i, s in enumerate(idx) if i != axis)
        out[rest] = data
    if out is None:
        raise ValueError(f"row {row} of axis {axis} is not addressable here")
    return out


def _place_tree_global(tree, shardings):
    """device_put a pytree onto NamedShardings that may span PROCESSES.

    Single-host meshes use plain device_put. On a multi-host mesh (jax.
    distributed), a sharding is not fully addressable and device_put refuses;
    each process instead materializes its addressable shards from its full
    host copy via make_array_from_callback (inputs are required to be
    identical on every process — the multi-host contract). PRNG key arrays
    round-trip through key_data/wrap_key_data (raw uint32 is placeable)."""
    def put(x, ns):
        if ns.is_fully_addressable:
            return jax.device_put(x, ns)
        if jnp.issubdtype(getattr(x, "dtype", None), jax.dtypes.prng_key):
            impl = jax.random.key_impl(x)
            data = np.asarray(jax.random.key_data(x))
            arr = jax.make_array_from_callback(data.shape, ns,
                                               lambda idx: data[idx])
            return jax.random.wrap_key_data(arr, impl=impl)
        xnp = np.asarray(x)
        return jax.make_array_from_callback(xnp.shape, ns, lambda idx: xnp[idx])

    return jax.tree_util.tree_map(put, tree, shardings)


def _permute_nh_layout(params, tp: int = 1):
    """Permute the v-path / output-path head channels into the WKV kernel's
    i-major ("nh") order: local channel c = h*64 + j moves to c' = j*Hl + h
    (per tp shard of Hl heads), so the (B, N, H) transposes around the T=1
    and T>1 Pallas kernels become FREE reshapes — the two transpose copies
    measured 0.71 + 0.60 ms/step at 7.2B B=384 (xplane profile).

    Permuted: the merged Wrkv's V-projection columns (+ its per-column
    scales), Wo's rows (+ per-row scales), the packed lora2's v-gate and
    gate column slices, and v0 — everything that produces or consumes a
    v/y/g-ordered channel. r/k/a/w and all norms stay standard order.

    EXACT, not approximate: the int8 GEMM accumulates in integers (order-
    independent), and every per-row/per-column quantization scale travels
    with its row/column, so dequantized elements are bit-identical; only
    f32 correction-sum orders change (~1e-7 rel)."""
    att = dict(params["blocks"]["att"])
    mrkv = att.get("Wrkv")
    wo = att.get("Wo")
    assert isinstance(mrkv, mm8.Mm8MultiWeight) and "lora1" in att, \
        "nh layout needs the merged+packed serving param layout"
    C = wo.q.shape[1]
    N = 64
    C_loc = C // tp
    Hl = C_loc // N
    cp = np.arange(C_loc)
    g_loc = (cp % Hl) * N + cp // Hl          # new[c'] = old[g_loc[c']]
    gC = jnp.asarray(np.concatenate(
        [s * C_loc + g_loc for s in range(tp)]), jnp.int32)
    # merged columns are [R_s | K_s | V_s] per tp shard; permute each V block
    g3 = np.arange(3 * C)
    for s in range(tp):
        base = s * 3 * C_loc + 2 * C_loc
        g3[base:base + C_loc] = base + g_loc
    g3 = jnp.asarray(g3, jnp.int32)

    att["Wrkv"] = mm8.Mm8MultiWeight(
        q=jnp.take(mrkv.q, g3, axis=2),
        mx=jnp.take(mrkv.mx, g3, axis=1),
        rx=jnp.take(mrkv.rx, g3, axis=1),
        my=mrkv.my, ry=mrkv.ry)
    att["Wo"] = mm8.Mm8Weight(
        q=jnp.take(wo.q, gC, axis=1),
        mx=wo.mx, rx=wo.rx,
        my=jnp.take(wo.my, gC, axis=1),
        ry=jnp.take(wo.ry, gC, axis=1))
    l2 = att["lora2"]
    l2 = l2.at[:, 2].set(jnp.take(l2[:, 2], gC, axis=2))   # v-gate
    l2 = l2.at[:, 3].set(jnp.take(l2[:, 3], gC, axis=2))   # gate g
    att["lora2"] = l2
    att["v0"] = jnp.take(att["v0"], gC, axis=1)
    blocks = dict(params["blocks"])
    blocks["att"] = att
    out = dict(params)
    out["blocks"] = blocks
    return out


def _cast_params(params, dtype):
    """Cast dense float weights to the activation dtype. Mm8Weight subtrees pass
    through untouched (int8 codes + f32 scales)."""
    _mm8_types = (mm8.Mm8Weight, mm8.Mm8MultiWeight)

    def cast(x):
        if isinstance(x, _mm8_types):
            return x
        if isinstance(x, jnp.ndarray) and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(
        cast, params, is_leaf=lambda x: isinstance(x, _mm8_types))


class ServingModel:
    """Owns prepared parameters and the jitted step programs for one worker."""

    def __init__(self, config: RWKV7Config, params, runtime: RuntimeConfig,
                 batch_size: int, prefill_chunk: int = 64, *,
                 mesh=None, batch_sharded_dp: bool = False,
                 interpret_pallas: bool = False, seed: int = 0):
        self.config = config
        self.runtime = runtime
        self.batch_size = batch_size
        self.prefill_chunk = prefill_chunk
        # compact prefill: the scheduler caps concurrent bulk prefills at B/8
        # slots, so the chunk program only needs P = roundup8(B/8) rows — the
        # full-B masked chunk would burn 8x the MXU time on inactive rows
        # (prefill is compute-bound: every row runs all matmuls).
        #
        # Two (P, T) VARIANTS compile, both with ~P*T rows (same chunk cost):
        # a tall-narrow one for light prefill traffic and the wide one for a
        # full prefill set. The WKV recurrence's per-token cost scales with
        # ROWS, so when <= 8 prompts are in flight the (8, 4T) program
        # advances each one 4x faster per chunk — the TTFT lever.
        cap = -(-batch_size // 8)               # scheduler's max_prefill_count
        # P caps at 32 rows: the compact path's gather/scatter temps are
        # (L, P, N, HN) sized (~17 MB/row at 7.2B) and the (48, 64) variant's
        # ~1.6 GB of HBM temps pushed the B=384 serving config out of memory;
        # the worker reads prefill_slots back as its concurrent-prefill cap
        P = min(batch_size, max(8, -(-cap // 8) * 8), 32)
        small = min(8, P)
        self.prefill_slots = P
        self.prefill_variants = sorted(
            {(small, prefill_chunk * (P // small)), (P, prefill_chunk)})
        self._interpret = interpret_pallas
        self.mesh = mesh
        self._batch_sharded_dp = batch_sharded_dp
        # mm8 dispatch settings are trace-time module globals; remember ours and
        # re-apply before every public call so models with different settings
        # coexist in one process (traces happen lazily at first call)
        self._mm8_core = runtime.mm8_core
        self._apply_op_settings()

        already_quantized = any(
            isinstance(leaf, mm8.Mm8Weight)
            for leaf in jax.tree_util.tree_leaves(
                params, is_leaf=lambda x: isinstance(x, mm8.Mm8Weight)))
        if runtime.quantization == "int8" and not already_quantized:
            params = _quantize_params(params)
        tp = 1 if mesh is None else int(mesh.shape["tp"])
        if mm8._resolved_core() == "pallas_a8":
            # only the a8 Pallas core has a fused multi-projection kernel;
            # other cores would fall to per-layer slices of the merged
            # codes — a full HBM copy per layer per step
            params = _merge_att_rkv(params, tp=tp)
        params = _pack_att_lora(params)
        # i-major v/y channel order on the Pallas serving path: the WKV
        # kernel's (B, N, H) transposes become free reshapes (the weights
        # speak the kernel's layout — see _permute_nh_layout)
        self._nh_layout = bool(runtime.use_pallas_wkv
                               and "Wrkv" in params["blocks"]["att"])
        if self._nh_layout:
            params = _permute_nh_layout(params, tp=tp)
        self.params = _cast_params(params, runtime.activation_dtype)

        if runtime.use_pallas_wkv:
            nh = self._nh_layout

            def raw_wkv(s, r, w, k, v, a, b, e, lengths, layer):
                # s is the stacked (L, B, N, HN) state; the kernel advances only
                # layer's slab in place (prefetched index, zero slicing copies)
                return wkv7_pallas.wkv7_pallas_batch(
                    s, r, w, k, v, a, b, e, lengths=lengths, layer=layer,
                    use_dither=runtime.use_dither, interpret=interpret_pallas,
                    precision=runtime.wkv_precision, v_nh_layout=nh)

            # decode (T=1) runs the TMix-fused kernel: kk/k~ prologue and
            # GroupNorm+bonus epilogue inside the pallas call (_tmix
            # dispatches on this attribute)
            def fused_step(s, r, w, k_raw, a_iclr, v_nh, kk, ka, rk,
                           lnw, lnb, e, lengths, layer):
                return wkv7_pallas.wkv7_pallas_step_fused(
                    s, layer, r, w, k_raw, a_iclr, v_nh, kk, ka, rk,
                    lnw, lnb, e, lengths,
                    use_dither=runtime.use_dither,
                    interpret=interpret_pallas,
                    precision=runtime.wkv_precision)
            raw_wkv.fused_step = fused_step

            # prefill (T>1) runs the TMix-fused chunk kernel for the same
            # reason: the XLA prologue/epilogue glue + its 64-lane retiles
            # measured ~29 ms/chunk at 46% of DMA floor (docs/PERF.md)
            def fused_chunk(s, r, w, k_raw, a_iclr, v_nh, kk, ka, rk,
                            lnw, lnb, e, lengths, layer):
                return wkv7_pallas.wkv7_pallas_chunk_fused(
                    s, layer, r, w, k_raw, a_iclr, v_nh, kk, ka, rk,
                    lnw, lnb, e, lengths,
                    use_dither=runtime.use_dither,
                    interpret=interpret_pallas,
                    precision=runtime.wkv_precision)
            raw_wkv.fused_chunk = fused_chunk
        else:
            def raw_wkv(s, r, w, k, v, a, b, e, lengths, layer):
                s_l = jax.lax.dynamic_index_in_dim(s, layer, 0, keepdims=False)
                y, new_l = wkv7_ref.wkv7_reference_batch(
                    s_l, r, w, k, v, a, b, e, use_dither=runtime.use_dither,
                    lengths=lengths)
                return y, jax.lax.dynamic_update_index_in_dim(
                    s, new_l.astype(s.dtype), layer, 0)

        if mesh is None:
            self._wkv_fn = raw_wkv
            self._carry_shardings = None
            self._fwd_step_sharded = None
            self._fwd_chunk_sharded = None
            self._stop_votes_sharding = None
            self._gather_logits_sharded = None
        else:
            # Explicit-SPMD serving step: the WHOLE forward runs inside ONE
            # shard_map over the tp axis — Megatron column-parallel R/K/V/FFN-K
            # and head-parallel WKV/GroupNorm/bonus are chip-local (so every
            # fused Pallas kernel runs unchanged on its local shard, keeping
            # 1-byte/weight HBM traffic), with exactly two psums per layer
            # (after the row-parallel Wo and FFN-V). The head is column-
            # parallel: logits leave the shard_map vocab-sharded, and the
            # sampler/penalty ops on (B, V)-sharded arrays stay GSPMD.
            from chirrup_tpu.parallel import mesh as pmesh
            from jax.sharding import PartitionSpec as P
            try:
                from jax import shard_map as _shard_map

                def smap(f, in_specs, out_specs):
                    return _shard_map(f, mesh=mesh, in_specs=in_specs,
                                      out_specs=out_specs, check_vma=False)
            except ImportError:
                from jax.experimental.shard_map import shard_map as _shard_map

                def smap(f, in_specs, out_specs):
                    return _shard_map(f, mesh=mesh, in_specs=in_specs,
                                      out_specs=out_specs, check_rep=False)

            p_shardings = pmesh.param_shardings(mesh, self.params)
            param_specs = jax.tree_util.tree_map(lambda ns: ns.spec, p_shardings)
            self.params = _place_tree_global(self.params, p_shardings)
            self._carry_shardings = pmesh.carry_shardings(
                mesh, batch_sharded=batch_sharded_dp)

            bax = "dp" if batch_sharded_dp else None
            vec = P(bax)
            st_shift = P(None, None, bax, None)
            st_wkv = P(None, bax, None, "tp")
            compute_dtype = runtime.activation_dtype

            def psum_tp(y):
                return jax.lax.psum(y, "tp")

            def step_local(p, tokens, shift, wkv, elapsed, active):
                state = RWKVState(shift=shift, wkv=wkv, elapsed=elapsed)
                logits, ns = model.forward_step(
                    p, tokens, state, active=active, wkv_fn=raw_wkv,
                    compute_dtype=compute_dtype, reduce_fn=psum_tp,
                    nh_layout=self._nh_layout)
                return logits, ns.shift, ns.wkv, ns.elapsed

            def chunk_local(p, tokens, shift, wkv, elapsed, lengths):
                state = RWKVState(shift=shift, wkv=wkv, elapsed=elapsed)
                ns = model.forward_chunk(
                    p, tokens, state, lengths, wkv_fn=raw_wkv,
                    compute_dtype=compute_dtype, reduce_fn=psum_tp,
                    nh_layout=self._nh_layout)
                return ns.shift, ns.wkv, ns.elapsed

            self._fwd_step_sharded = smap(
                step_local,
                in_specs=(param_specs, vec, st_shift, st_wkv, vec, vec),
                out_specs=(P(bax, "tp"), st_shift, st_wkv, vec))
            self._fwd_chunk_sharded = smap(
                chunk_local,
                in_specs=(param_specs, P(bax, None), st_shift, st_wkv, vec, vec),
                out_specs=(st_shift, st_wkv, vec))
            self._wkv_fn = raw_wkv  # used only inside the shard_map

            # ---- lockstep prefix-cache programs (fixed per-loop shapes) ----
            # extract: gather ONE slot per dp shard. idx is a (n_dp,)
            # dp-sharded array whose VALUES are host-local row offsets — the
            # gather runs inside shard_map on each shard's local rows, so no
            # cross-host traffic and hosts may pass different offsets.
            def extract_local(shift, wkv, elapsed, idx):
                sh = jnp.take(shift, idx, axis=2)       # (L, 2, 1, C)
                wk = jnp.take(wkv, idx, axis=1)         # (L, 1, N, HN_loc)
                el = jnp.take(elapsed, idx, axis=0)     # (1,)
                return sh, wk, el

            self._extract_lockstep_sharded = smap(
                extract_local,
                in_specs=(st_shift, st_wkv, vec, P(bax)),
                out_specs=(P(None, None, bax, None),
                           P(None, bax, None, "tp"), P(bax)))

            # resume-insert: overwrite ONE slot's recurrent state per dp
            # shard (masked). Sampling params/penalties of the row ride the
            # normal batched admission in the same loop; this program only
            # carries the state payload (16.5MB/host H2D, dispatched only on
            # vote-coordinated resume rounds).
            def resume_local(shift, wkv, elapsed, idx, mask,
                             s_shift, s_wkv, s_el):
                L, _, Bl, C = shift.shape
                N, HNl = wkv.shape[2], wkv.shape[3]
                i = idx[0]
                new_sh = s_shift.reshape(L, 2, 1, C).astype(shift.dtype)
                old_sh = jax.lax.dynamic_slice(shift, (0, 0, i, 0),
                                               (L, 2, 1, C))
                shift = jax.lax.dynamic_update_slice(
                    shift, jnp.where(mask[0], new_sh, old_sh), (0, 0, i, 0))
                new_wk = s_wkv.reshape(L, 1, N, HNl).astype(wkv.dtype)
                old_wk = jax.lax.dynamic_slice(wkv, (0, i, 0, 0),
                                               (L, 1, N, HNl))
                wkv = jax.lax.dynamic_update_slice(
                    wkv, jnp.where(mask[0], new_wk, old_wk), (0, i, 0, 0))
                elapsed = jnp.where(
                    (jnp.arange(Bl) == i) & mask[0], s_el[0], elapsed)
                return shift, wkv, elapsed

            self._resume_lockstep_sharded = smap(
                resume_local,
                in_specs=(st_shift, st_wkv, vec, P(bax), P(bax),
                          P(bax, None, None, None),
                          P(bax, None, None, "tp"), P(bax)),
                out_specs=(st_shift, st_wkv, vec))
            self._lockstep_row_shardings = pmesh.lockstep_row_shardings(
                mesh, batch_sharded=batch_sharded_dp)

            # device-pool store/load, lockstep flavors: one masked row per dp
            # shard, fixed shapes (see pool_store/pool_load for semantics)
            pool_sh = P(bax, None, None, None)   # (S, L, 2, C) rows over dp
            pool_wk = P(bax, None, None, "tp")   # (S, L, N, HN)
            pool_el = P(bax)

            def pool_store_local(shift, wkv, elapsed, p_sh, p_wk, p_el,
                                 slot_rows, pool_rows, mask):
                L, _, Bl, C = shift.shape
                N, HNl = wkv.shape[2], wkv.shape[3]
                i, r = slot_rows[0], pool_rows[0]
                sh = jax.lax.dynamic_slice(
                    shift, (0, 0, i, 0), (L, 2, 1, C)).transpose(2, 0, 1, 3)
                old = jax.lax.dynamic_slice(p_sh, (r, 0, 0, 0), (1, L, 2, C))
                p_sh = jax.lax.dynamic_update_slice(
                    p_sh, jnp.where(mask[0], sh.astype(p_sh.dtype), old),
                    (r, 0, 0, 0))
                wk = jax.lax.dynamic_slice(
                    wkv, (0, i, 0, 0), (L, 1, N, HNl)).transpose(1, 0, 2, 3)
                oldw = jax.lax.dynamic_slice(p_wk, (r, 0, 0, 0),
                                             (1, L, N, HNl))
                p_wk = jax.lax.dynamic_update_slice(
                    p_wk, jnp.where(mask[0], wk.astype(p_wk.dtype), oldw),
                    (r, 0, 0, 0))
                Sl = p_el.shape[0]
                p_el = jnp.where((jnp.arange(Sl) == r) & mask[0],
                                 elapsed[i], p_el)
                return p_sh, p_wk, p_el

            def pool_load_local(shift, wkv, elapsed, p_sh, p_wk, p_el,
                                pool_rows, slot_rows, mask):
                L, _, Bl, C = shift.shape
                N, HNl = wkv.shape[2], wkv.shape[3]
                r, i = pool_rows[0], slot_rows[0]
                sh = jax.lax.dynamic_slice(
                    p_sh, (r, 0, 0, 0), (1, L, 2, C)).transpose(1, 2, 0, 3)
                old = jax.lax.dynamic_slice(shift, (0, 0, i, 0), (L, 2, 1, C))
                shift = jax.lax.dynamic_update_slice(
                    shift, jnp.where(mask[0], sh.astype(shift.dtype), old),
                    (0, 0, i, 0))
                wk = jax.lax.dynamic_slice(
                    p_wk, (r, 0, 0, 0), (1, L, N, HNl)).transpose(1, 0, 2, 3)
                oldw = jax.lax.dynamic_slice(wkv, (0, i, 0, 0),
                                             (L, 1, N, HNl))
                wkv = jax.lax.dynamic_update_slice(
                    wkv, jnp.where(mask[0], wk.astype(wkv.dtype), oldw),
                    (0, i, 0, 0))
                elapsed = jnp.where(
                    (jnp.arange(elapsed.shape[0]) == i) & mask[0],
                    p_el[r], elapsed)
                return shift, wkv, elapsed

            row_specs = (P(bax), P(bax), P(bax))
            self._pool_store_lockstep_sharded = smap(
                pool_store_local,
                in_specs=(st_shift, st_wkv, vec, pool_sh, pool_wk, pool_el)
                + row_specs,
                out_specs=(pool_sh, pool_wk, pool_el))
            self._pool_load_lockstep_sharded = smap(
                pool_load_local,
                in_specs=(st_shift, st_wkv, vec, pool_sh, pool_wk, pool_el)
                + row_specs,
                out_specs=(st_shift, st_wkv, vec))

            # marked-slot logits gather (return_logits inside K-step blocks):
            # idx values are LOCAL row offsets per dp shard, M rows per shard
            def gather_logits_local(lg, idx):
                return jnp.take(lg, idx, axis=0)

            self._gather_logits_sharded = smap(
                gather_logits_local,
                in_specs=(P(bax, "tp"), P(bax)),
                out_specs=P(bax, "tp"))

            # forbidden-bias install: overwrite ONE slot's presence/forbidden
            # row per dp shard with a host-built (V,) bias — lifts the
            # LOCKSTEP_MAX_FORBIDDEN id cap (the bias payload rides the same
            # vote-coordinated admission round as resume-from-state)
            def forbid_local(pres, idx, mask, bias):
                i = idx[0]
                Vl = pres.shape[1]
                old = jax.lax.dynamic_slice(pres, (i, 0), (1, Vl))
                new = jnp.where(mask[0], bias.astype(pres.dtype), old)
                return jax.lax.dynamic_update_slice(pres, new, (i, 0))

            self._set_forbidden_sharded = smap(
                forbid_local,
                in_specs=(P(bax, "tp"), P(bax), P(bax), P(bax, "tp")),
                out_specs=P(bax, "tp"))

            # ---- lockstep COMPACT prefill: FIXED (n_dp*P_loc, T) program.
            # Only program SHAPES must match across hosts; the dp-sharded
            # tokens/lengths/slot_idx carry HOST-LOCAL data (slot_idx values
            # are local row offsets, exactly like the pool/extract programs
            # above), so each host chunk-prefills its own compact row set —
            # lifting lockstep serving off the 6.5x-slower full-B masked
            # chunk (the round-3 single-host win, now host-local).
            n_dp = int(mesh.shape["dp"])
            B_loc = batch_size // n_dp if batch_sharded_dp else batch_size
            self.lockstep_prefill_rows = min(self.prefill_slots, B_loc)
            self.lockstep_prefill_b_loc = B_loc

            def prefill_compact_local(p, tokens, shift, wkv, elapsed,
                                      lengths, slot_idx):
                L, _, Bl, C = shift.shape
                N, HNl = wkv.shape[2], wkv.shape[3]
                dsl = jax.lax.dynamic_slice
                dus = jax.lax.dynamic_update_slice
                Pl = slot_idx.shape[0]

                def gather_body(i, acc):
                    sh_acc, wk_acc = acc
                    s = slot_idx[i]
                    sh_acc = dus(sh_acc,
                                 dsl(shift, (0, 0, s, 0), (L, 2, 1, C)),
                                 (0, 0, i, 0))
                    wk_acc = dus(wk_acc,
                                 dsl(wkv, (0, s, 0, 0), (L, 1, N, HNl)),
                                 (0, i, 0, 0))
                    return sh_acc, wk_acc

                sh_c, wk_c = jax.lax.fori_loop(
                    0, Pl, gather_body,
                    (jnp.zeros((L, 2, Pl, C), shift.dtype),
                     jnp.zeros((L, Pl, N, HNl), wkv.dtype)))
                el_c = jnp.take(elapsed, slot_idx, axis=0)
                ns = model.forward_chunk(
                    p, tokens, RWKVState(shift=sh_c, wkv=wk_c, elapsed=el_c),
                    lengths, wkv_fn=raw_wkv, compute_dtype=compute_dtype,
                    reduce_fn=psum_tp, nh_layout=self._nh_layout)
                n_sh = ns.shift.astype(shift.dtype)
                n_wk = ns.wkv.astype(wkv.dtype)

                def scatter_body(i, acc):
                    sh_full, wk_full = acc
                    s = slot_idx[i]
                    sh_full = dus(sh_full,
                                  dsl(n_sh, (0, 0, i, 0), (L, 2, 1, C)),
                                  (0, 0, s, 0))
                    wk_full = dus(wk_full,
                                  dsl(n_wk, (0, i, 0, 0), (L, 1, N, HNl)),
                                  (0, s, 0, 0))
                    return sh_full, wk_full

                sh_full, wk_full = jax.lax.fori_loop(
                    0, Pl, scatter_body, (shift, wkv))
                el_full = elapsed.at[slot_idx].set(ns.elapsed)
                return sh_full, wk_full, el_full

            self._prefill_compact_lockstep_sharded = smap(
                prefill_compact_local,
                in_specs=(param_specs, P(bax, None), st_shift, st_wkv, vec,
                          P(bax), P(bax)),
                out_specs=(st_shift, st_wkv, vec))

            # shutdown votes MUST be dp-sharded: each host's array holds only
            # its own rows' votes; if GSPMD treated the host-local np input as
            # replicated, hosts would observe DIVERGENT "replicated" sums (the
            # voter sees 1, others 0) and exit at different block counts —
            # wedging the stragglers in the next dp collective
            from jax.sharding import NamedSharding
            self._stop_votes_sharding = NamedSharding(mesh, P(bax, None))

        self._no_penalty_ids = jnp.asarray(sorted(NO_PENALTY_TOKEN_IDS), jnp.int32)
        self._seed = seed
        # fused decode tail (ops/sampling_pallas): meshless only — under tp
        # the (B, V) logits/penalty arrays are vocab-sharded and a pallas
        # call outside shard_map would gather them whole
        self._fused_tail = (
            mesh is None and runtime.fused_penalty_tail
            and (runtime.use_pallas_wkv or interpret_pallas)
            and penalty_tail_supported(config.vocab_size))

        # params are explicit jit arguments — closing over them would embed the
        # weights as HLO constants (catastrophic compile times at multi-GB scale)
        self._decode_step = jax.jit(self._decode_step_impl, donate_argnums=(1,))
        self._decode_block = jax.jit(self._decode_block_impl, donate_argnums=(1,))
        self._prefill_step = jax.jit(self._prefill_step_impl, donate_argnums=(1,))
        self._prefill_compact = jax.jit(self._prefill_compact_impl,
                                        donate_argnums=(1,))
        self._insert_slot = jax.jit(self._insert_slot_impl, donate_argnums=(0,))
        self._insert_slots_batched = jax.jit(self._insert_slots_batched_impl,
                                             donate_argnums=(0,))
        self._reset_slot = jax.jit(self._reset_slot_impl, donate_argnums=(0,))
        self._extract_slot = jax.jit(self._extract_slot_impl)
        self._pool_store = jax.jit(self._pool_store_impl, donate_argnums=(1,))
        self._pool_store_many = jax.jit(self._pool_store_many_impl,
                                        donate_argnums=(1,))
        self._pool_load = jax.jit(self._pool_load_impl, donate_argnums=(0,))
        if mesh is not None:
            self._extract_lockstep = jax.jit(self._extract_lockstep_impl)
            self._resume_lockstep = jax.jit(self._resume_lockstep_impl,
                                            donate_argnums=(0,))
            self._pool_store_lockstep = jax.jit(
                self._pool_store_lockstep_impl, donate_argnums=(1,))
            self._pool_load_lockstep = jax.jit(
                self._pool_load_lockstep_impl, donate_argnums=(0,))
            self._set_forbidden_jit = jax.jit(
                self._set_forbidden_lockstep_impl, donate_argnums=(0,))
            self._prefill_compact_lockstep = jax.jit(
                self._prefill_compact_lockstep_impl, donate_argnums=(1,))

    def _apply_op_settings(self):
        """Re-apply this model's trace-time op settings (mm8 core + pallas
        interpret). Called at init and before each public entry point: jitted
        programs trace lazily on first call, and another ServingModel in the
        same process may have set different globals since construction."""
        mm8.set_default_core(self._mm8_core)
        mm8.set_interpret(self._interpret)

    # ------------------------------------------------------------------ carry

    def init_carry(self) -> BatchCarry:
        cfg, rt, B = self.config, self.runtime, self.batch_size
        V = cfg.vocab_size
        state = model.init_state(cfg, B, shift_dtype=rt.activation_dtype,
                                 wkv_dtype=rt.wkv_state_dtype)
        f32 = jnp.float32
        carry = BatchCarry(
            state=state,
            occurrence=jnp.zeros((B, V), f32),
            presence_vec=jnp.zeros((B, V), f32),
            temperature=jnp.ones((B,), f32),
            top_p=jnp.full((B,), 0.3, f32),
            top_k=jnp.zeros((B,), jnp.int32),
            frequency_penalty=jnp.zeros((B,), f32),
            presence_penalty=jnp.zeros((B,), f32),
            penalty_decay=jnp.ones((B,), f32),
            last_sampled=jnp.full((B,), -1, jnp.int32),
            rng=jax.random.key(self._seed),
        )
        if self._carry_shardings is not None:
            carry = _place_tree_global(carry, self._carry_shardings)
        return carry

    # ------------------------------------------------------------ step programs

    def _decode_step_impl(self, params, carry: BatchCarry, host_tokens,
                          feedback_mask, active_mask, decode_mask):
        """One token step over the whole batch.

        host_tokens: (B,) int32 input token per slot (garbage where inactive).
        feedback_mask: slots whose input is the PREVIOUS step's on-device sample
          (carry.last_sampled) — lets the worker dispatch step N+1 before reading
          step N's tokens, hiding the host round-trip.
        active_mask: slots whose state advances (decode + one-by-one prefill).
        decode_mask: subset that gets penalties + sampling (reference worker
        _run_forward_one semantics, worker.py:671-742).

        Returns (carry, sampled (B,) int32 [-1 where not decoding], raw_logits
        (B, V) f32 pre-penalty — for return_logits / eval harnesses).
        """
        tokens = jnp.where(feedback_mask, jnp.maximum(carry.last_sampled, 0),
                           host_tokens)
        if self._fwd_step_sharded is not None:
            st = carry.state
            logits, n_shift, n_wkv, n_elapsed = self._fwd_step_sharded(
                params, tokens, st.shift, st.wkv, st.elapsed, active_mask)
            new_state = RWKVState(shift=n_shift, wkv=n_wkv, elapsed=n_elapsed)
        else:
            logits, new_state = model.forward_step(
                params, tokens, carry.state, active=active_mask,
                wkv_fn=self._wkv_fn,
                compute_dtype=self.runtime.activation_dtype,
                nh_layout=self._nh_layout)
        raw_logits = logits  # pre-penalty (reference worker.py:714-716)

        if self._fused_tail:
            # ONE Pallas pass: record the PREVIOUS sample (deferred through
            # last_sampled — bit-identical sequencing, sampling_pallas.py),
            # decay, penalties, logsumexp, per-chunk candidate maxima
            nopen = (carry.last_sampled[:, None]
                     == self._no_penalty_ids[None, :]).any(-1)
            upd = decode_mask & (carry.last_sampled >= 0) & ~nopen
            occ2, pres2, cval, cidx, lse = penalty_tail(
                raw_logits, carry.occurrence, carry.presence_vec,
                carry.penalty_decay, carry.frequency_penalty,
                carry.presence_penalty, carry.last_sampled, upd, decode_mask,
                interpret=self._interpret)
            rng, key = jax.random.split(carry.rng)
            sampled = sample_from_chunks(
                cval, cidx, lse, carry.temperature, carry.top_p, carry.top_k,
                key, (raw_logits, pres2, occ2, carry.frequency_penalty),
                row_mask=decode_mask, k_max=self.runtime.sampler_k_max)
            sampled = jnp.where(decode_mask, sampled, -1)
            carry = dataclasses.replace(
                carry, state=new_state, occurrence=occ2, presence_vec=pres2,
                rng=rng,
                last_sampled=jnp.where(decode_mask, sampled,
                                       carry.last_sampled))
            return carry, sampled, raw_logits

        # occurrence decays at forward time, decode slots only (worker.py:723-728)
        occurrence = jnp.where(decode_mask[:, None],
                               carry.occurrence * carry.penalty_decay[:, None],
                               carry.occurrence)
        # forbidden tokens -> -1e10 (reference worker.py:719-722) via the bias
        # folded into presence_vec at insert — one (B, V) bias read per step
        adj = logits - (carry.presence_vec
                        + occurrence * carry.frequency_penalty[:, None])

        rng, key = jax.random.split(carry.rng)
        sampled = sample_logits_rwkv_pip_fast(
            adj, carry.temperature, carry.top_p, carry.top_k, key,
            row_mask=decode_mask, k_max=self.runtime.sampler_k_max,
            approx=self.runtime.sampler_approx_topk)
        sampled = jnp.where(decode_mask, sampled, -1)

        # record into penalty state (next step's decay applies first; worker.py:527)
        is_no_penalty = (sampled[:, None] == self._no_penalty_ids[None, :]).any(-1)
        upd_mask = decode_mask & ~is_no_penalty
        occurrence, presence_vec = record_sampled_token(
            occurrence, carry.presence_vec, jnp.maximum(sampled, 0),
            carry.presence_penalty, upd_mask)

        carry = dataclasses.replace(
            carry, state=new_state, occurrence=occurrence,
            presence_vec=presence_vec, rng=rng,
            last_sampled=jnp.where(decode_mask, sampled, carry.last_sampled))
        return carry, sampled, raw_logits

    def _decode_block_impl(self, params, carry: BatchCarry, host_tokens,
                           feedback_mask, active_mask, decode_mask, stop_votes,
                           logit_rows=None):
        """K decode steps in ONE dispatch (lax.scan over the single-step body).

        All per-step inputs are (K, B): host tokens for prefill feeds, masks for
        the known-in-advance phase transitions. DECODE slots chain through the
        on-device last_sampled, so K tokens are produced per host round-trip —
        this amortizes dispatch latency that would otherwise dominate the step
        (observed ~2x the device time through this environment's TPU tunnel).

        stop_votes: (B, NV=2) int32 vote columns, each host writing only its
        own rows; the returned per-column global sums are the coordination
        signals (cross-dp reductions, so every host observes the same counts
        at the same block index). Column 0 = shutdown votes (a host silently
        stopping would wedge the others inside the next block's dp
        collective); column 1 = pending lockstep complex-admission flags
        (resume-from-state or over-cap forbidden sets: all hosts schedule the
        fixed admission-round programs on the next loop when the sum is
        nonzero). Meshless/zero votes cost nothing.

        logit_rows: optional (n_dp * LOCKSTEP_LOGIT_SLOTS,) int32 of LOCAL
        slot-row offsets per dp shard — per-step raw logits of these MARKED
        rows are gathered and returned, so return_logits works inside K-step
        blocks (a full (K, B, V) buffer would be prohibitive; M marked rows
        cost K*M*V f32 ≈ 16 MB at serving shape). None skips the gather and
        the fourth output (bench/profile callers keep the 3-tuple).

        Returns (carry, sampled (K, B) int32, vote_counts (NV,) int32
        [, marked_logits (K, n_dp*M, V) f32]).
        """

        def step(c, inp):
            toks, fb, act, dec = inp
            c, sampled, raw = self._decode_step_impl(params, c, toks, fb, act,
                                                     dec)
            if logit_rows is None:
                return c, sampled
            if self._gather_logits_sharded is not None:
                lg = self._gather_logits_sharded(raw, logit_rows)
            else:
                lg = jnp.take(raw, logit_rows, axis=0)
            return c, (sampled, lg)

        carry, out = jax.lax.scan(
            step, carry, (host_tokens, feedback_mask, active_mask, decode_mask))
        votes = jnp.sum(stop_votes, axis=0)
        if logit_rows is None:
            return carry, out, votes
        sampled, marked = out
        return carry, sampled, votes, marked

    def _prefill_step_impl(self, params, carry: BatchCarry, tokens, lengths):
        """Advance prefilling slots by up to `prefill_chunk` tokens each.

        tokens: (B, T) int32; lengths: (B,) int32 with 0 for non-prefill slots.
        No logits are computed (the final prompt token always goes through
        decode_step, mirroring the reference's one-prefill phase)."""
        if self._fwd_chunk_sharded is not None:
            st = carry.state
            n_shift, n_wkv, n_elapsed = self._fwd_chunk_sharded(
                params, tokens, st.shift, st.wkv, st.elapsed, lengths)
            new_state = RWKVState(shift=n_shift, wkv=n_wkv, elapsed=n_elapsed)
        else:
            new_state = model.forward_chunk(
                params, tokens, carry.state, lengths, wkv_fn=self._wkv_fn,
                compute_dtype=self.runtime.activation_dtype,
                nh_layout=self._nh_layout)
        return dataclasses.replace(carry, state=new_state)

    def _prefill_compact_impl(self, params, carry: BatchCarry, tokens,
                              lengths, slot_idx):
        """Compact-row prefill: gather P slots' states, run the chunk on
        (P, T) rows only, scatter back. Prefill is MXU-compute-bound (every
        row runs every matmul), so the full-B masked chunk wastes
        (B - P)/B of the step — 6-8x at serving config (B=200, cap 25).
        The gather/scatter costs 4 passes over P slots' wkv state (~2.6 ms at
        7.2B/P=32) vs ~400 ms of masked-row matmul work saved per chunk.

        slot_idx: (P,) int32, UNIQUE slot ids (rows with length 0 must point
        at distinct idle slots — their state passes through bit-unchanged:
        masked WKV holds S, _masked_last holds shift, elapsed += 0).

        The P-row gather/scatter runs as a fori_loop of dynamic slices, NOT
        jnp.take/.at[].set: XLA lowers a batch-axis gather of the (L, B, N,
        HN) state into dozens of live (L, B, N, 128) window temporaries —
        ~6 GB of HBM at B=384 (the compile OOM that blocked the v5e-7b2
        serving profile) and ~3 GB silently at B=200. The loop's peak extra
        memory is one (L, 1, N, HN) row (~17 MB at 7.2B); same bytes moved."""
        st = carry.state
        P = slot_idx.shape[0]
        L, _, B, C = st.shift.shape
        N, HN = st.wkv.shape[2], st.wkv.shape[3]
        dsl = jax.lax.dynamic_slice
        dus = jax.lax.dynamic_update_slice

        def gather_body(i, acc):
            sh_acc, wk_acc = acc
            s = slot_idx[i]
            sh_acc = dus(sh_acc, dsl(st.shift, (0, 0, s, 0), (L, 2, 1, C)),
                         (0, 0, i, 0))
            wk_acc = dus(wk_acc, dsl(st.wkv, (0, s, 0, 0), (L, 1, N, HN)),
                         (0, i, 0, 0))
            return sh_acc, wk_acc

        shift_c, wkv_c = jax.lax.fori_loop(
            0, P, gather_body,
            (jnp.zeros((L, 2, P, C), st.shift.dtype),
             jnp.zeros((L, P, N, HN), st.wkv.dtype)))
        el_c = jnp.take(st.elapsed, slot_idx, axis=0)
        if self._fwd_chunk_sharded is not None:
            n_shift, n_wkv, n_el = self._fwd_chunk_sharded(
                params, tokens, shift_c, wkv_c, el_c, lengths)
        else:
            ns = model.forward_chunk(
                params, tokens, RWKVState(shift=shift_c, wkv=wkv_c,
                                          elapsed=el_c),
                lengths, wkv_fn=self._wkv_fn,
                compute_dtype=self.runtime.activation_dtype,
                nh_layout=self._nh_layout)
            n_shift, n_wkv, n_el = ns.shift, ns.wkv, ns.elapsed
        n_shift = n_shift.astype(st.shift.dtype)
        n_wkv = n_wkv.astype(st.wkv.dtype)

        def scatter_body(i, acc):
            sh_full, wk_full = acc
            s = slot_idx[i]
            sh_full = dus(sh_full, dsl(n_shift, (0, 0, i, 0), (L, 2, 1, C)),
                          (0, 0, s, 0))
            wk_full = dus(wk_full, dsl(n_wkv, (0, i, 0, 0), (L, 1, N, HN)),
                          (0, s, 0, 0))
            return sh_full, wk_full

        sh_full, wk_full = jax.lax.fori_loop(
            0, P, scatter_body, (st.shift, st.wkv))
        new_state = RWKVState(
            shift=sh_full, wkv=wk_full,
            elapsed=st.elapsed.at[slot_idx].set(n_el))
        return dataclasses.replace(carry, state=new_state)

    def _insert_slot_impl(self, carry: BatchCarry, slot, shift, wkv, elapsed,
                          temperature, top_p, top_k, frequency_penalty,
                          presence_penalty, penalty_decay, forbidden_bias):
        """Load one request into a slot (reference _fill_task_pool,
        worker.py:570-669). shift: (L,2,C); wkv: (L,N,HN); scalars per sampling
        param; forbidden_bias: (V,) f32 (host-built, 1e10 at forbidden ids)."""
        st = carry.state
        new_shift = jax.lax.dynamic_update_slice(
            st.shift, shift[:, :, None, :].astype(st.shift.dtype), (0, 0, slot, 0))
        new_wkv = jax.lax.dynamic_update_slice(
            st.wkv, wkv[:, None].astype(st.wkv.dtype), (0, slot, 0, 0))
        new_elapsed = carry.state.elapsed.at[slot].set(elapsed)
        B = carry.occurrence.shape[0]
        onehot = (jnp.arange(B) == slot)

        def set_row(vec, val):
            return jnp.where(onehot, val, vec)

        return dataclasses.replace(
            carry,
            state=RWKVState(shift=new_shift, wkv=new_wkv, elapsed=new_elapsed),
            occurrence=jnp.where(onehot[:, None], 0.0, carry.occurrence),
            # fresh row = the forbidden-token bias (1e10 at forbidden ids);
            # presence penalties then accumulate on top during decode
            presence_vec=jnp.where(
                onehot[:, None],
                forbidden_bias.astype(jnp.float32)[None, :],
                carry.presence_vec),
            temperature=set_row(carry.temperature, temperature),
            top_p=set_row(carry.top_p, top_p),
            top_k=jnp.where(onehot, top_k, carry.top_k),
            frequency_penalty=set_row(carry.frequency_penalty, frequency_penalty),
            presence_penalty=set_row(carry.presence_penalty, presence_penalty),
            penalty_decay=set_row(carry.penalty_decay, penalty_decay),
            last_sampled=jnp.where(onehot, -1, carry.last_sampled),
        )

    LOCKSTEP_MAX_FORBIDDEN = 8
    # marked return_logits rows per dp shard inside decode blocks (the
    # per-block logits gather; see _decode_block_impl). More concurrent
    # return_logits slots than marks fall back to single steps (non-lockstep)
    # or wait host-locally for a free mark (lockstep).
    LOCKSTEP_LOGIT_SLOTS = 4

    def _insert_slots_batched_impl(self, carry: BatchCarry, mask, temperature,
                                   top_p, top_k, frequency_penalty,
                                   presence_penalty, penalty_decay,
                                   forbidden_ids):
        """Admit any number of FRESH (zero-state) requests in one fixed-shape
        program — the lockstep multi-host admission path, where every host must
        execute the identical program sequence every loop and per-slot calls
        would desync hosts with different admission counts.

        mask: (B,) bool — rows to (re)initialize; all-False is a cheap no-op.
        Sampling params: (B,) each (garbage where ~mask). forbidden_ids:
        (B, LOCKSTEP_MAX_FORBIDDEN) int32, -1 padded — capped here (unlike the
        host-built (V,) bias of insert_slot) because a (B, V) host transfer
        per loop would dwarf the step itself."""
        st = carry.state
        m = mask
        new_shift = jnp.where(m[None, None, :, None], 0.0, st.shift)
        new_wkv = jnp.where(m[None, :, None, None],
                            jnp.zeros((), st.wkv.dtype), st.wkv)
        new_elapsed = jnp.where(m, 0, st.elapsed)
        V = carry.occurrence.shape[1]
        iota = jax.lax.broadcasted_iota(jnp.int32, (V,), 0)
        hit = (iota[None, None, :] == forbidden_ids[:, :, None]).any(1)  # (B, V)
        bias = jnp.where(hit, 1e10, 0.0).astype(jnp.float32)

        def set_row(vec, val):
            return jnp.where(m, val, vec)

        return dataclasses.replace(
            carry,
            state=RWKVState(shift=new_shift, wkv=new_wkv, elapsed=new_elapsed),
            occurrence=jnp.where(m[:, None], 0.0, carry.occurrence),
            presence_vec=jnp.where(m[:, None], bias, carry.presence_vec),
            temperature=set_row(carry.temperature, temperature),
            top_p=set_row(carry.top_p, top_p),
            top_k=jnp.where(m, top_k, carry.top_k),
            frequency_penalty=set_row(carry.frequency_penalty, frequency_penalty),
            presence_penalty=set_row(carry.presence_penalty, presence_penalty),
            penalty_decay=set_row(carry.penalty_decay, penalty_decay),
            last_sampled=jnp.where(m, -1, carry.last_sampled),
        )

    def _reset_slot_impl(self, carry: BatchCarry, slot):
        """Zero a slot's state after task completion."""
        cfg = self.config
        zero_shift = jnp.zeros((cfg.n_layer, 2, cfg.n_embd), carry.state.shift.dtype)
        zero_wkv = jnp.zeros((cfg.n_layer, cfg.head_size, cfg.n_embd),
                             carry.state.wkv.dtype)
        return self._insert_slot_impl(
            carry, slot, zero_shift, zero_wkv, jnp.int32(0),
            jnp.float32(1.0), jnp.float32(1.0), jnp.int32(0), jnp.float32(0.0),
            jnp.float32(0.0), jnp.float32(1.0),
            jnp.zeros((cfg.vocab_size,), jnp.float32))

    def _extract_slot_impl(self, carry: BatchCarry, slot):
        st = carry.state
        shift = jax.lax.dynamic_slice(
            st.shift, (0, 0, slot, 0),
            (st.shift.shape[0], 2, 1, st.shift.shape[3]))[:, :, 0]
        wkv = jax.lax.dynamic_slice(
            st.wkv, (0, slot, 0, 0),
            (st.wkv.shape[0], 1, st.wkv.shape[2], st.wkv.shape[3]))[:, 0]
        return shift, wkv, st.elapsed[slot]

    def _extract_lockstep_impl(self, carry: BatchCarry, idx):
        st = carry.state
        return self._extract_lockstep_sharded(st.shift, st.wkv, st.elapsed,
                                              idx)

    def _resume_lockstep_impl(self, carry: BatchCarry, idx, mask, s_shift,
                              s_wkv, s_el):
        st = carry.state
        n_shift, n_wkv, n_el = self._resume_lockstep_sharded(
            st.shift, st.wkv, st.elapsed, idx, mask, s_shift, s_wkv, s_el)
        return dataclasses.replace(
            carry, state=RWKVState(shift=n_shift, wkv=n_wkv, elapsed=n_el))

    # ------------------------------------------------------------- public API

    def decode_step(self, carry, tokens, active_mask, decode_mask,
                    feedback_mask=None):
        self._apply_op_settings()
        if feedback_mask is None:
            feedback_mask = jnp.zeros(self.batch_size, bool)
        return self._decode_step(self.params, carry, jnp.asarray(tokens),
                                 jnp.asarray(feedback_mask),
                                 jnp.asarray(active_mask),
                                 jnp.asarray(decode_mask))

    def decode_block(self, carry, tokens, feedback_mask, active_mask,
                     decode_mask, stop_votes=None, logit_rows=None):
        """K steps per dispatch; (K, B) args. Returns (carry, sampled (K, B),
        vote_counts (2,)) — per-column cross-host vote sums ([shutdown,
        complex-admission-pending]; zeros when stop_votes is omitted). A 1-D
        (B,) votes array is accepted as shutdown-only. With logit_rows (the
        worker always passes it; see _decode_block_impl) a fourth output
        carries the marked rows' per-step raw logits.

        Host-arg caching: each upload is its own RPC to the device runtime —
        through the axon tunnel that is ~4-6 extra round trips per block,
        measured as ~2x the whole block time. In the decode steady state
        (every slot on device feedback, no phase transitions) the args repeat
        bit-for-bit block after block, so the previous block's DEVICE arrays
        are reused whenever the host values are unchanged."""
        self._apply_op_settings()
        if stop_votes is None:
            stop_votes = np.zeros((self.batch_size, 2), np.int32)
        stop_votes = np.asarray(stop_votes, np.int32)
        if stop_votes.ndim == 1:
            stop_votes = np.stack(
                [stop_votes, np.zeros_like(stop_votes)], axis=1)

        host_args = (np.asarray(tokens), np.asarray(feedback_mask),
                     np.asarray(active_mask), np.asarray(decode_mask),
                     stop_votes)
        if logit_rows is not None:
            host_args += (np.asarray(logit_rows, np.int32),)
        cache = getattr(self, "_block_arg_cache", None)
        if cache is not None and len(cache[0]) == len(host_args) and all(
                a.shape == b.shape and a.dtype == b.dtype
                and np.array_equal(a, b)
                for a, b in zip(host_args, cache[0])):
            dev_args = cache[1]
        else:
            if self._stop_votes_sharding is not None:
                ns = self._stop_votes_sharding
                if ns.is_fully_addressable:
                    votes = jax.device_put(stop_votes, ns)
                else:
                    votes = jax.make_array_from_callback(
                        stop_votes.shape, ns, lambda idx: stop_votes[idx])
            else:
                votes = jnp.asarray(stop_votes)
            dev_args = tuple(jnp.asarray(a) for a in host_args[:4]) + (votes,)
            if logit_rows is not None:
                lr = host_args[5]
                dev_args += ((self._place_rows("idx", lr)
                              if self.mesh is not None else jnp.asarray(lr)),)
            self._block_arg_cache = (tuple(a.copy() for a in host_args),
                                     dev_args)
        return self._decode_block(self.params, carry, *dev_args)

    def prefill_step(self, carry, tokens, lengths):
        self._apply_op_settings()
        return self._prefill_step(self.params, carry, tokens, lengths)

    def prefill_step_compact(self, carry, tokens, lengths, slot_idx):
        """Chunk-prefill only the rows in slot_idx (see _prefill_compact_impl).
        tokens: (P, T); lengths: (P,); slot_idx: (P,) unique int32."""
        self._apply_op_settings()
        return self._prefill_compact(self.params, carry, jnp.asarray(tokens),
                                     jnp.asarray(lengths),
                                     jnp.asarray(slot_idx, jnp.int32))

    def insert_slot(self, carry, slot: int, request_state: Optional[RequestState],
                    task) -> BatchCarry:
        cfg = self.config
        if request_state is None:
            shift = np.zeros((cfg.n_layer, 2, cfg.n_embd), np.float32)
            wkv = np.zeros((cfg.n_layer, cfg.head_size, cfg.n_embd), np.float32)
            elapsed = 0
        else:
            shift, wkv, elapsed = (request_state.shift, request_state.wkv,
                                   request_state.elapsed)
        forb = forbidden_bias_row(task.forbidden_tokens, cfg.vocab_size)
        # reference maps temperature<=0 to 1.0 at slot load (worker.py:612) and the
        # sampler's zero-temp greedy handles the rest; we keep the raw value since
        # the sampler implements the zero-temp contract itself
        return self._insert_slot(
            carry, slot, jnp.asarray(shift), jnp.asarray(wkv),
            jnp.int32(elapsed), jnp.float32(task.temperature),
            jnp.float32(task.top_p), jnp.int32(task.top_k),
            jnp.float32(task.frequency_penalty), jnp.float32(task.presence_penalty),
            jnp.float32(task.penalty_decay), jnp.asarray(forb))

    def insert_slots_batched(self, carry, mask, tasks) -> BatchCarry:
        """Lockstep admission: tasks[i] is the Task for each masked slot i
        (None elsewhere). Fresh (zero-state) requests only; resumes ride
        the vote-coordinated pool-load / resume-insert rounds and over-cap
        forbidden sets the fixed bias program (set_forbidden_lockstep)."""
        self._apply_op_settings()
        B = self.batch_size
        Kf = self.LOCKSTEP_MAX_FORBIDDEN
        temp = np.ones((B,), np.float32)
        top_p = np.full((B,), 0.3, np.float32)
        top_k = np.zeros((B,), np.int32)
        fp = np.zeros((B,), np.float32)
        pp = np.zeros((B,), np.float32)
        pd = np.ones((B,), np.float32)
        forb = np.full((B, Kf), -1, np.int32)
        for i, task in enumerate(tasks):
            if task is None:
                continue
            temp[i], top_p[i], top_k[i] = (task.temperature, task.top_p,
                                           task.top_k)
            fp[i], pp[i], pd[i] = (task.frequency_penalty,
                                   task.presence_penalty, task.penalty_decay)
            ft = [t for t in task.forbidden_tokens
                  if 0 <= t < self.config.vocab_size][:Kf]
            forb[i, :len(ft)] = ft
        return self._insert_slots_batched(
            carry, jnp.asarray(np.asarray(mask, bool)), jnp.asarray(temp),
            jnp.asarray(top_p), jnp.asarray(top_k), jnp.asarray(fp),
            jnp.asarray(pp), jnp.asarray(pd), jnp.asarray(forb))

    def reset_slot(self, carry, slot: int) -> BatchCarry:
        return self._reset_slot(carry, slot)

    # --------------------------------------------- device state pool (HBM cache)

    def init_state_pool(self, size: int):
        """Preallocate `size` prefix-snapshot rows in HBM (the device-side
        prefix cache: snapshot/resume become on-device copies — no host
        round trips; see structures.PoolHandle). ~16.8MB/row at 7.2B bf16."""
        cfg, rt = self.config, self.runtime
        pool = {
            "shift": jnp.zeros((size, cfg.n_layer, 2, cfg.n_embd),
                               rt.activation_dtype),
            "wkv": jnp.zeros((size, cfg.n_layer, cfg.head_size, cfg.n_embd),
                             rt.wkv_state_dtype),
            "elapsed": jnp.zeros((size,), jnp.int32),
        }
        if self.mesh is not None:
            from chirrup_tpu.parallel import mesh as pmesh

            pool = _place_tree_global(
                pool, pmesh.pool_shardings(
                    self.mesh, batch_sharded=self._batch_sharded_dp))
        return pool

    def pool_row_bytes(self) -> int:
        cfg, rt = self.config, self.runtime
        return (cfg.n_layer * 2 * cfg.n_embd
                * jnp.dtype(rt.activation_dtype).itemsize
                + cfg.n_layer * cfg.head_size * cfg.n_embd
                * jnp.dtype(rt.wkv_state_dtype).itemsize + 4)

    def _pool_store_impl(self, carry: BatchCarry, pool, slot, row):
        st = carry.state
        L, C = st.shift.shape[0], st.shift.shape[3]
        N, HN = st.wkv.shape[2], st.wkv.shape[3]
        sh = jax.lax.dynamic_slice(st.shift, (0, 0, slot, 0), (L, 2, 1, C))
        sh = sh.transpose(2, 0, 1, 3)                      # (1, L, 2, C)
        wk = jax.lax.dynamic_slice(st.wkv, (0, slot, 0, 0), (L, 1, N, HN))
        wk = wk.transpose(1, 0, 2, 3)                      # (1, L, N, HN)
        return {
            "shift": jax.lax.dynamic_update_slice(
                pool["shift"], sh.astype(pool["shift"].dtype), (row, 0, 0, 0)),
            "wkv": jax.lax.dynamic_update_slice(
                pool["wkv"], wk.astype(pool["wkv"].dtype), (row, 0, 0, 0)),
            "elapsed": pool["elapsed"].at[row].set(st.elapsed[slot]),
        }

    def _pool_load_impl(self, carry: BatchCarry, pool, row, slot):
        st = carry.state
        L, C = st.shift.shape[0], st.shift.shape[3]
        N, HN = st.wkv.shape[2], st.wkv.shape[3]
        sh = jax.lax.dynamic_slice(pool["shift"], (row, 0, 0, 0),
                                   (1, L, 2, C)).transpose(1, 2, 0, 3)
        wk = jax.lax.dynamic_slice(pool["wkv"], (row, 0, 0, 0),
                                   (1, L, N, HN)).transpose(1, 0, 2, 3)
        new_state = RWKVState(
            shift=jax.lax.dynamic_update_slice(
                st.shift, sh.astype(st.shift.dtype), (0, 0, slot, 0)),
            wkv=jax.lax.dynamic_update_slice(
                st.wkv, wk.astype(st.wkv.dtype), (0, slot, 0, 0)),
            elapsed=st.elapsed.at[slot].set(pool["elapsed"][row]))
        return dataclasses.replace(carry, state=new_state)

    POOL_STORE_BATCH = 8

    def _pool_store_many_impl(self, carry: BatchCarry, pool, slots, rows,
                              mask):
        """Up to POOL_STORE_BATCH snapshots in ONE program (each dispatch is
        a device-runtime RPC; an admission wave hitting 25 snapshot
        boundaries in one loop measured ~6s of per-slot dispatch latency).
        Masked-off entries rewrite their row's old bytes (pad rows may repeat
        row 0: duplicate scatters of identical values are harmless)."""
        st = carry.state
        L, C = st.shift.shape[0], st.shift.shape[3]
        N, HN = st.wkv.shape[2], st.wkv.shape[3]
        S = pool["elapsed"].shape[0]

        def body(i, p):
            p_sh, p_wk, p_el = p
            s, r, m = slots[i], rows[i], mask[i]
            sh = jax.lax.dynamic_slice(
                st.shift, (0, 0, s, 0), (L, 2, 1, C)).transpose(2, 0, 1, 3)
            old = jax.lax.dynamic_slice(p_sh, (r, 0, 0, 0), (1, L, 2, C))
            p_sh = jax.lax.dynamic_update_slice(
                p_sh, jnp.where(m, sh.astype(p_sh.dtype), old), (r, 0, 0, 0))
            wk = jax.lax.dynamic_slice(
                st.wkv, (0, s, 0, 0), (L, 1, N, HN)).transpose(1, 0, 2, 3)
            oldw = jax.lax.dynamic_slice(p_wk, (r, 0, 0, 0), (1, L, N, HN))
            p_wk = jax.lax.dynamic_update_slice(
                p_wk, jnp.where(m, wk.astype(p_wk.dtype), oldw),
                (r, 0, 0, 0))
            p_el = jnp.where((jnp.arange(S) == r) & m, st.elapsed[s], p_el)
            return p_sh, p_wk, p_el

        p_sh, p_wk, p_el = jax.lax.fori_loop(
            0, slots.shape[0], body,
            (pool["shift"], pool["wkv"], pool["elapsed"]))
        return {"shift": p_sh, "wkv": p_wk, "elapsed": p_el}

    def pool_store(self, carry, pool, slot: int, row: int):
        """Snapshot slot -> pool row, entirely on device; returns new pool."""
        self._apply_op_settings()
        return self._pool_store(carry, pool, jnp.int32(slot), jnp.int32(row))

    def pool_store_many(self, carry, pool, pairs):
        """Batched snapshots: pairs = [(slot, row), ...] (any count; chained
        in fixed-size programs of POOL_STORE_BATCH). Returns the new pool."""
        self._apply_op_settings()
        R = self.POOL_STORE_BATCH
        for i in range(0, len(pairs), R):
            chunk = pairs[i:i + R]
            slots = np.zeros((R,), np.int32)
            rows = np.zeros((R,), np.int32)
            mask = np.zeros((R,), bool)
            for j, (s, r) in enumerate(chunk):
                slots[j], rows[j], mask[j] = s, r, True
            pool = self._pool_store_many(carry, pool, jnp.asarray(slots),
                                         jnp.asarray(rows), jnp.asarray(mask))
        return pool

    def pool_load(self, carry, pool, row: int, slot: int) -> BatchCarry:
        """Resume pool row -> slot, entirely on device; returns new carry.
        Sampling params/penalties must be (re)initialized by an insert."""
        self._apply_op_settings()
        return self._pool_load(carry, pool, jnp.int32(row), jnp.int32(slot))

    def _pool_store_lockstep_impl(self, carry, pool, slot_rows, pool_rows,
                                  mask):
        st = carry.state
        n_sh, n_wk, n_el = self._pool_store_lockstep_sharded(
            st.shift, st.wkv, st.elapsed,
            pool["shift"], pool["wkv"], pool["elapsed"],
            slot_rows, pool_rows, mask)
        return {"shift": n_sh, "wkv": n_wk, "elapsed": n_el}

    def _pool_load_lockstep_impl(self, carry, pool, pool_rows, slot_rows,
                                 mask):
        st = carry.state
        n_sh, n_wk, n_el = self._pool_load_lockstep_sharded(
            st.shift, st.wkv, st.elapsed,
            pool["shift"], pool["wkv"], pool["elapsed"],
            pool_rows, slot_rows, mask)
        return dataclasses.replace(
            carry, state=RWKVState(shift=n_sh, wkv=n_wk, elapsed=n_el))

    def _prefill_compact_lockstep_impl(self, params, carry: BatchCarry,
                                       tokens, lengths, slot_idx):
        st = carry.state
        n_sh, n_wk, n_el = self._prefill_compact_lockstep_sharded(
            params, tokens, st.shift, st.wkv, st.elapsed, lengths, slot_idx)
        return dataclasses.replace(
            carry, state=RWKVState(shift=n_sh, wkv=n_wk, elapsed=n_el))

    def prefill_step_compact_lockstep(self, carry, tokens, lengths, slot_idx):
        """FIXED-(n_dp*P_loc, T) lockstep chunk prefill: every host calls
        this on the same cadence with the same shapes; slot_idx VALUES are
        HOST-LOCAL row offsets (unique per shard; length-0 rows must point
        at distinct idle local slots — state passes through bit-unchanged,
        as in prefill_step_compact). P_loc = self.lockstep_prefill_rows."""
        self._apply_op_settings()
        return self._prefill_compact_lockstep(
            self.params, carry,
            self._place_rows("tokens", np.asarray(tokens, np.int32)),
            self._place_rows("idx", np.asarray(lengths, np.int32)),
            self._place_rows("idx", np.asarray(slot_idx, np.int32)))

    def pool_store_lockstep(self, carry, pool, slot_rows, pool_rows, mask):
        """FIXED-shape lockstep snapshot: slot -> pool row per dp shard
        (masked; every host calls this the same number of times per loop)."""
        self._apply_op_settings()
        return self._pool_store_lockstep(
            carry, pool,
            self._place_rows("idx", np.asarray(slot_rows, np.int32)),
            self._place_rows("idx", np.asarray(pool_rows, np.int32)),
            self._place_rows("mask", np.asarray(mask, bool)))

    def pool_load_lockstep(self, carry, pool, pool_rows, slot_rows,
                           mask) -> BatchCarry:
        """FIXED-shape lockstep resume: pool row -> slot per dp shard."""
        self._apply_op_settings()
        return self._pool_load_lockstep(
            carry, pool,
            self._place_rows("idx", np.asarray(pool_rows, np.int32)),
            self._place_rows("idx", np.asarray(slot_rows, np.int32)),
            self._place_rows("mask", np.asarray(mask, bool)))

    # ------------------------------------------------- lockstep cache programs

    @property
    def lockstep_n_dp(self) -> int:
        return 1 if self.mesh is None else int(self.mesh.shape["dp"])

    def _place_rows(self, name, arr):
        ns = self._lockstep_row_shardings[name]
        if ns.is_fully_addressable:
            return jax.device_put(arr, ns)
        a = np.asarray(arr)
        return jax.make_array_from_callback(a.shape, ns, lambda i: a[i])

    def extract_slot_lockstep(self, carry, local_rows):
        """FIXED per-loop lockstep snapshot program: gathers ONE slot per dp
        shard (local_rows: (n_dp,) int32 LOCAL row offsets; each host's value
        is its own — the gather runs per-shard inside shard_map, no cross-host
        traffic). Returns a resolver for THIS host's row as a RequestState;
        D2H copies start immediately and overlap the next block."""
        self._apply_op_settings()
        idx = self._place_rows("idx", np.asarray(local_rows, np.int32))
        shift_g, wkv_g, el_g = self._extract_lockstep(carry, idx)
        for arr in (shift_g, wkv_g, el_g):
            try:
                arr.copy_to_host_async()
            except Exception:  # noqa: BLE001
                pass
        dp_row = 0 if self.mesh is None else min(
            jax.process_index(), self.lockstep_n_dp - 1)

        def resolve(row=dp_row) -> RequestState:
            return RequestState(
                shift=_host_row(shift_g, 2, row),
                wkv=_host_row(wkv_g, 1, row),
                elapsed=int(_host_row(el_g, 0, row)))

        return resolve

    def resume_insert_lockstep(self, carry, local_rows, mask,
                               state: Optional[RequestState]) -> BatchCarry:
        """FIXED-shape lockstep resume: overwrite ONE slot's recurrent state
        per dp shard (masked). `state` is THIS host's payload (None -> zeros,
        mask False); every host must call this the same number of times per
        loop (coordinated by the resume vote column). Sampling params ride
        the normal batched admission in the same loop."""
        self._apply_op_settings()
        cfg = self.config
        n_dp = self.lockstep_n_dp
        dp_row = 0 if self.mesh is None else min(jax.process_index(), n_dp - 1)
        shift = np.zeros((n_dp, cfg.n_layer, 2, cfg.n_embd), np.float32)
        wkv = np.zeros((n_dp, cfg.n_layer, cfg.head_size, cfg.n_embd),
                       np.float32)
        el = np.zeros((n_dp,), np.int32)
        if state is not None:
            shift[dp_row] = np.asarray(state.shift, np.float32)
            wkv[dp_row] = np.asarray(state.wkv, np.float32)
            el[dp_row] = state.elapsed
        return self._resume_lockstep(
            carry, self._place_rows("idx", np.asarray(local_rows, np.int32)),
            self._place_rows("mask", np.asarray(mask, bool)),
            self._place_rows("shift", shift), self._place_rows("wkv", wkv),
            self._place_rows("elapsed", el))

    def _set_forbidden_lockstep_impl(self, carry: BatchCarry, rows, mask,
                                     bias):
        pres = self._set_forbidden_sharded(carry.presence_vec, rows, mask,
                                           bias)
        return dataclasses.replace(carry, presence_vec=pres)

    def set_forbidden_lockstep(self, carry, local_rows, mask,
                               bias_row) -> BatchCarry:
        """FIXED-shape lockstep forbidden-set install: overwrite ONE slot's
        presence/forbidden bias row per dp shard (masked) with a host-built
        (V,) bias (forbidden_bias_row — no id-count cap). Runs on every
        vote-coordinated admission round on every host (hosts without a
        payload pass an all-False mask), lifting LOCKSTEP_MAX_FORBIDDEN for
        lockstep admissions. The admitted slot's batched insert in the same
        loop installs the capped bias first; this replaces it with the exact
        one before the slot's first decode dispatch (the reference accepts
        arbitrary forbidden sets everywhere, chirrup/worker.py:719-722)."""
        self._apply_op_settings()
        n_dp = self.lockstep_n_dp
        V = self.config.vocab_size
        dp_row = 0 if self.mesh is None else min(jax.process_index(),
                                                 n_dp - 1)
        bias = np.zeros((n_dp, V), np.float32)
        if bias_row is not None:
            bias[dp_row] = bias_row
        return self._set_forbidden_jit(
            carry,
            self._place_rows("idx", np.asarray(local_rows, np.int32)),
            self._place_rows("mask", np.asarray(mask, bool)),
            self._place_rows("bias", bias))

    def extract_slot_async(self, carry, slot: int):
        """Dispatch the slot extraction and START the D2H copies without
        blocking; returns a zero-arg resolver producing the RequestState.

        The extract program writes FRESH buffers (dynamic_slice outputs, not
        aliased), so later carry mutations cannot corrupt the snapshot; the
        worker resolves it a loop later, after the copies overlapped the next
        decode block (a synchronous 16.5MB device_get in the loop measured as
        multi-second stalls through the axon tunnel)."""
        shift, wkv, elapsed = self._extract_slot(carry, slot)
        for arr in (shift, wkv, elapsed):
            try:
                arr.copy_to_host_async()
            except Exception:  # noqa: BLE001 — optional fast path only
                pass

        def resolve() -> RequestState:
            return RequestState(
                shift=np.asarray(jax.device_get(shift)),
                wkv=np.asarray(jax.device_get(wkv)),
                elapsed=int(elapsed))

        return resolve

    def extract_slot(self, carry, slot: int) -> RequestState:
        """Snapshot a slot's state to host at its DEVICE dtypes (bf16 in
        serving config — half the reference's host-RAM/D2H per snapshot; the
        reference stores fp16, SURVEY §2.2 M2). device_get of a bf16 array
        yields an ml_dtypes.bfloat16 numpy array; insert_slot casts it back,
        and the bf16->f32->bf16 round trip is value-preserving, so
        resume-from-snapshot is bit-identical to an uninterrupted run."""
        shift, wkv, elapsed = self._extract_slot(carry, slot)
        return RequestState(
            shift=np.asarray(jax.device_get(shift)),
            wkv=np.asarray(jax.device_get(wkv)),
            elapsed=int(elapsed))
