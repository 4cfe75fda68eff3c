"""Device mesh + sharding rules for tensor-parallel RWKV-7 serving.

The reference has no model parallelism at all (thread-per-GPU full replicas,
SURVEY §2.6); this module is the TPU-native replacement: a jax.sharding.Mesh over
ICI with head-parallel WKV and Megatron-style column/row-parallel projections.

Layout (mesh axes ("dp", "tp"); dp spans hosts for data parallel, tp spans the
chips of one host):

  activations x (B,T,C)     replicated over tp (LayerNorms stay local)
  att Wr/Wk/Wv (C,C)        column-parallel: output heads sharded over tp
  att Wo (C,C)              row-parallel: input heads sharded; psum -> replicated
  LoRA pairs w1/a1/v1/g1    replicated (tiny); w2/a2/v2/g2 column-parallel
  per-head vectors k_k,k_a,r_k, ln_x, x_*  sharded with the heads where per-head
  WKV state (L,B,N,H*N)     sharded over the H*N axis (head-parallel — each chip
                            owns its heads' (N,N) states; no cross-chip traffic in
                            the recurrence)
  ffn Wk (C,F)              column-parallel; ffn Wv (F,C) row-parallel + psum
  head (C,V)                column-parallel: logits (B, V/tp) sharded
  occurrence/presence (B,V) sharded over V, aligned with the logits

Implementation is GSPMD: parameters and carry are placed with NamedShardings and
jitted programs let XLA propagate/insert collectives; the Pallas WKV kernel (not
auto-partitionable) runs under shard_map over tp, seeing local head shards.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from chirrup_tpu.ops.mm8 import Mm8Weight


def make_mesh(tp: int, dp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if dp * tp > len(devices):
        raise ValueError(f"need {dp * tp} devices, have {len(devices)}")
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def _mm8_sharding(mesh, col_parallel: bool, stacked: bool):
    """Sharding tree for an Mm8Weight. col_parallel shards M (and its per-column
    scales); row-parallel shards K (and per-row scales)."""
    lead = (None,) if stacked else ()
    if col_parallel:
        return Mm8Weight(
            q=_ns(mesh, *lead, None, "tp"),
            mx=_ns(mesh, *lead, "tp"), rx=_ns(mesh, *lead, "tp"),
            my=_ns(mesh, *lead, None), ry=_ns(mesh, *lead, None))
    return Mm8Weight(
        q=_ns(mesh, *lead, "tp", None),
        mx=_ns(mesh, *lead, None), rx=_ns(mesh, *lead, None),
        my=_ns(mesh, *lead, "tp"), ry=_ns(mesh, *lead, "tp"))


def _multi_mm8_sharding(mesh):
    """Mm8MultiWeight (merged R/K/V, shard-group-interleaved columns): codes and
    per-column scales sharded on the merged output axis; per-projection per-row
    scales replicated (full K on every chip)."""
    from chirrup_tpu.ops.mm8 import Mm8MultiWeight

    return Mm8MultiWeight(
        q=_ns(mesh, None, None, "tp"),
        mx=_ns(mesh, None, "tp"), rx=_ns(mesh, None, "tp"),
        my=_ns(mesh, None, None, None), ry=_ns(mesh, None, None, None))


def param_shardings(mesh: Mesh, params):
    """Build the NamedSharding pytree matching the params pytree.

    Key-driven so it covers every serving parameter layout: raw Wr/Wk/Wv or the
    merged Wrkv (Mm8MultiWeight), separate LoRA factors or the packed
    lora1/lora2 pair, plus the kernel-layout GroupNorm params (ln_x_*_nh)."""
    def dense_or_mm8(w, col_parallel):
        if isinstance(w, Mm8Weight):
            return _mm8_sharding(mesh, col_parallel, stacked=True)
        return _ns(mesh, None, None, "tp") if col_parallel \
            else _ns(mesh, None, "tp", None)

    rep1 = _ns(mesh, None)          # (C,) replicated
    repL = _ns(mesh, None, None)    # (L, C) replicated
    headL = _ns(mesh, None, "tp")   # (L, C) sharded with heads

    blocks = params["blocks"]
    att = blocks["att"]
    ffn = blocks["ffn"]

    att_spec_fns = {
        # token-shift mixes act on replicated x
        "x_r": lambda w: repL, "x_w": lambda w: repL, "x_k": lambda w: repL,
        "x_v": lambda w: repL, "x_a": lambda w: repL, "x_g": lambda w: repL,
        # LoRA: first factor replicated, second column-parallel; biases
        # head-sharded (they add onto column-parallel outputs)
        "w0": lambda w: headL, "w1": lambda w: _ns(mesh, None, None, None),
        "w2": lambda w: _ns(mesh, None, None, "tp"),
        "a0": lambda w: headL, "a1": lambda w: _ns(mesh, None, None, None),
        "a2": lambda w: _ns(mesh, None, None, "tp"),
        "v0": lambda w: headL, "v1": lambda w: _ns(mesh, None, None, None),
        "v2": lambda w: _ns(mesh, None, None, "tp"),
        "g1": lambda w: _ns(mesh, None, None, None),
        "g2": lambda w: _ns(mesh, None, None, "tp"),
        # packed LoRA (serving layout): (L,4,C,D) replicated; (L,4,D,C) col-par
        "lora1": lambda w: _ns(mesh, None, None, None, None),
        "lora2": lambda w: _ns(mesh, None, None, None, "tp"),
        "k_k": lambda w: headL, "k_a": lambda w: headL,
        "r_k": lambda w: _ns(mesh, None, "tp", None),
        "Wr": lambda w: dense_or_mm8(w, True),
        "Wk": lambda w: dense_or_mm8(w, True),
        "Wv": lambda w: dense_or_mm8(w, True),
        "Wrkv": lambda w: _multi_mm8_sharding(mesh),
        "Wo": lambda w: dense_or_mm8(w, False),
        "ln_x_w": lambda w: headL, "ln_x_b": lambda w: headL,
        # kernel-layout GroupNorm params: (L, 64, H) — heads on the last axis
        "ln_x_w_nh": lambda w: _ns(mesh, None, None, "tp"),
        "ln_x_b_nh": lambda w: _ns(mesh, None, None, "tp"),
    }
    att_sh = {k: att_spec_fns[k](v) for k, v in att.items()}
    ffn_sh = {
        "x_k": repL,
        "Wk": dense_or_mm8(ffn["Wk"], True),
        "Wv": dense_or_mm8(ffn["Wv"], False),
    }
    blocks_sh = {
        "ln1_w": repL, "ln1_b": repL, "ln2_w": repL, "ln2_b": repL,
        "att": att_sh, "ffn": ffn_sh,
    }
    return {
        "emb": _ns(mesh, None, None),
        "blocks": blocks_sh,
        "ln_out_w": rep1, "ln_out_b": rep1,
        "head": _mm8_sharding(mesh, True, stacked=False)
        if isinstance(params["head"], Mm8Weight) else _ns(mesh, None, "tp"),
    }


def lockstep_row_shardings(mesh: Mesh, batch_sharded: bool = False):
    """NamedShardings for the lockstep cache programs' per-host row args:
    one row per dp shard, each host supplying (and reading) only its own."""
    b = "dp" if batch_sharded else None
    return {
        "idx": _ns(mesh, b),
        "mask": _ns(mesh, b),
        "shift": _ns(mesh, b, None, None, None),   # (n_dp, L, 2, C)
        "wkv": _ns(mesh, b, None, None, "tp"),     # (n_dp, L, N, HN)
        "elapsed": _ns(mesh, b),
        "bias": _ns(mesh, b, "tp"),                # (n_dp, V) forbidden bias
        "tokens": _ns(mesh, b, None),              # (n_dp*P, T) compact prefill
    }


def carry_shardings(mesh: Mesh, batch_sharded: bool = False):
    """NamedSharding pytree for a BatchCarry (structure-matched in serving.py).

    batch_sharded=False: B replicated over dp (single-host worker owns its batch).
    WKV state shards its H*N axis over tp; (B,V) penalty arrays shard V with the
    column-parallel head's logits.
    """
    from chirrup_tpu.engine.serving import BatchCarry
    from chirrup_tpu.models.rwkv7 import RWKVState

    b = "dp" if batch_sharded else None
    vec = _ns(mesh, b)
    return BatchCarry(
        state=RWKVState(
            shift=_ns(mesh, None, None, b, None),
            wkv=_ns(mesh, None, b, None, "tp"),
            elapsed=vec,
        ),
        occurrence=_ns(mesh, b, "tp"),
        presence_vec=_ns(mesh, b, "tp"),
        temperature=vec, top_p=vec, top_k=vec,
        frequency_penalty=vec, presence_penalty=vec, penalty_decay=vec,
        last_sampled=vec,
        rng=_ns(mesh),
    )


def pool_shardings(mesh: Mesh, batch_sharded: bool = False):
    """Device state pool (S rows of prefix snapshots): rows shard over dp in
    lockstep (each host's pool rows live on its own chips), the per-head wkv
    axis shards over tp like the live carry."""
    b = "dp" if batch_sharded else None
    return {
        "shift": _ns(mesh, b, None, None, None),
        "wkv": _ns(mesh, b, None, None, "tp"),
        "elapsed": _ns(mesh, b),
    }
