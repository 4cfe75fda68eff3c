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
        P = min(batch_size, max(8, -(-cap // 8) * 8))
        small = min(8, P)
        self.prefill_slots = P
        self.prefill_variants = sorted(
            {(small, prefill_chunk * (P // small)), (P, prefill_chunk)})
        self._interpret = interpret_pallas
        self.mesh = mesh
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
        self.params = _cast_params(params, runtime.activation_dtype)

        if runtime.use_pallas_wkv:
            def raw_wkv(s, r, w, k, v, a, b, e, lengths, layer):
                # s is the stacked (L, B, N, HN) state; the kernel advances only
                # layer's slab in place (prefetched index, zero slicing copies)
                return wkv7_pallas.wkv7_pallas_batch(
                    s, r, w, k, v, a, b, e, lengths=lengths, layer=layer,
                    use_dither=runtime.use_dither, interpret=interpret_pallas,
                    precision=runtime.wkv_precision)

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
                    compute_dtype=compute_dtype, reduce_fn=psum_tp)
                return logits, ns.shift, ns.wkv, ns.elapsed

            def chunk_local(p, tokens, shift, wkv, elapsed, lengths):
                state = RWKVState(shift=shift, wkv=wkv, elapsed=elapsed)
                ns = model.forward_chunk(
                    p, tokens, state, lengths, wkv_fn=raw_wkv,
                    compute_dtype=compute_dtype, reduce_fn=psum_tp)
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
            # shutdown votes MUST be dp-sharded: each host's array holds only
            # its own rows' votes; if GSPMD treated the host-local np input as
            # replicated, hosts would observe DIVERGENT "replicated" sums (the
            # voter sees 1, others 0) and exit at different block counts —
            # wedging the stragglers in the next dp collective
            from jax.sharding import NamedSharding
            self._stop_votes_sharding = NamedSharding(mesh, P(bax))

        self._no_penalty_ids = jnp.asarray(sorted(NO_PENALTY_TOKEN_IDS), jnp.int32)
        self._seed = seed

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
                wkv_fn=self._wkv_fn, compute_dtype=self.runtime.activation_dtype)
        raw_logits = logits  # pre-penalty (reference worker.py:714-716)

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
                           feedback_mask, active_mask, decode_mask, stop_votes):
        """K decode steps in ONE dispatch (lax.scan over the single-step body).

        All per-step inputs are (K, B): host tokens for prefill feeds, masks for
        the known-in-advance phase transitions. DECODE slots chain through the
        on-device last_sampled, so K tokens are produced per host round-trip —
        this amortizes dispatch latency that would otherwise dominate the step
        (observed ~2x the device time through this environment's TPU tunnel).

        stop_votes: (B,) int32 — each lockstep host writes 1 into its own rows
        when it wants to shut down; the returned global sum is the coordinated
        shutdown signal (a cross-dp reduction, so every host observes the same
        count at the same block index and exits after the same launch count —
        a host silently stopping would wedge the others inside the next
        block's dp collective). Meshless/zero votes cost nothing.

        Returns (carry, sampled (K, B) int32, stop_count () int32). Raw logits
        are not returned (a (K, B, V) buffer is prohibitive); workers needing
        return_logits use single steps.
        """

        def step(c, inp):
            toks, fb, act, dec = inp
            c, sampled, _ = self._decode_step_impl(params, c, toks, fb, act, dec)
            return c, sampled

        carry, sampled = jax.lax.scan(
            step, carry, (host_tokens, feedback_mask, active_mask, decode_mask))
        return carry, sampled, jnp.sum(stop_votes)

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
                compute_dtype=self.runtime.activation_dtype)
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
        masked WKV holds S, _masked_last holds shift, elapsed += 0)."""
        st = carry.state
        shift_c = jnp.take(st.shift, slot_idx, axis=2)
        wkv_c = jnp.take(st.wkv, slot_idx, axis=1)
        el_c = jnp.take(st.elapsed, slot_idx, axis=0)
        if self._fwd_chunk_sharded is not None:
            n_shift, n_wkv, n_el = self._fwd_chunk_sharded(
                params, tokens, shift_c, wkv_c, el_c, lengths)
        else:
            ns = model.forward_chunk(
                params, tokens, RWKVState(shift=shift_c, wkv=wkv_c,
                                          elapsed=el_c),
                lengths, wkv_fn=self._wkv_fn,
                compute_dtype=self.runtime.activation_dtype)
            n_shift, n_wkv, n_el = ns.shift, ns.wkv, ns.elapsed
        new_state = RWKVState(
            shift=st.shift.at[:, :, slot_idx].set(
                n_shift.astype(st.shift.dtype)),
            wkv=st.wkv.at[:, slot_idx].set(n_wkv.astype(st.wkv.dtype)),
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
                     decode_mask, stop_votes=None):
        """K steps per dispatch; (K, B) args. Returns (carry, sampled (K, B),
        stop_count) — stop_count is the cross-host shutdown-vote sum (0 when
        stop_votes is omitted)."""
        self._apply_op_settings()
        if stop_votes is None:
            stop_votes = np.zeros((self.batch_size,), np.int32)
        stop_votes = np.asarray(stop_votes, np.int32)
        if self._stop_votes_sharding is not None:
            ns = self._stop_votes_sharding
            if ns.is_fully_addressable:
                votes = jax.device_put(stop_votes, ns)
            else:
                votes = jax.make_array_from_callback(
                    stop_votes.shape, ns, lambda idx: stop_votes[idx])
        else:
            votes = jnp.asarray(stop_votes)
        return self._decode_block(self.params, carry, jnp.asarray(tokens),
                                  jnp.asarray(feedback_mask),
                                  jnp.asarray(active_mask),
                                  jnp.asarray(decode_mask), votes)

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
        (None elsewhere). Fresh (zero-state) requests only — lockstep mode
        runs with the prefix state cache off."""
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
