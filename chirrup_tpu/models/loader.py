"""Checkpoint loading: RWKV-LM `.pth` -> chirrup_tpu parameter pytree.

The public RWKV-7 checkpoint format is a flat torch state dict; shapes and the
preprocessing contract (ln0 folded into the embedding, per-key transposes for
right-multiplication, block-0 v0/v1/v2 ignored) follow the reference runtime
(/root/reference/Albatross/rwkv7.py:171-221). torch is used only as a CPU
deserializer; everything downstream is numpy/JAX.

Internal layout: blocks stacked along a leading layer axis so the model can lax.scan
over depth; all linear weights (in, out) for `x @ W`.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np
import jax.numpy as jnp

from chirrup_tpu.models.config import RWKV7Config

# checkpoint linears stored (out, in) that we transpose to (in, out)
_TRANSPOSED = ("receptance.weight", "key.weight", "value.weight", "output.weight",
               "head.weight")


def load_state_dict_pth(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.float().numpy() for k, v in sd.items()}


def infer_config(sd: Dict[str, np.ndarray], vocab_size: Optional[int] = None) -> RWKV7Config:
    """Infer architecture from checkpoint keys (reference rwkv7.py:173-192)."""
    n_head, head_size = sd["blocks.0.att.r_k"].shape
    n_layer = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("blocks."))
    n_embd = n_head * head_size
    att0 = "blocks.0.att."
    return RWKV7Config(
        n_layer=n_layer,
        n_embd=n_embd,
        vocab_size=vocab_size or sd["emb.weight"].shape[0],
        head_size=head_size,
        d_decay_lora=sd[att0 + "w1"].shape[1],
        d_iclr_lora=sd[att0 + "a1"].shape[1],
        d_v_lora=sd["blocks.1.att.v1"].shape[1] if n_layer > 1 else sd[att0 + "a1"].shape[1],
        d_gate_lora=sd[att0 + "g1"].shape[1],
    )


def _layer_norm_np(x, w, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def params_from_state_dict(sd: Dict[str, np.ndarray], config: RWKV7Config,
                           dtype=jnp.float32) -> Dict[str, Any]:
    """Build the stacked-blocks parameter pytree."""
    L = config.n_layer

    def get(k):
        return np.asarray(sd[k], np.float32)

    def vec(k):
        return get(k).reshape(-1)

    # fold ln0 into the embedding (reference rwkv7.py:206)
    emb = _layer_norm_np(get("emb.weight"), vec("blocks.0.ln0.weight"),
                         vec("blocks.0.ln0.bias"))

    def stack(fn):
        return np.stack([fn(i) for i in range(L)])

    def att_key(i, name):
        return f"blocks.{i}.att.{name}"

    def ffn_key(i, name):
        return f"blocks.{i}.ffn.{name}"

    # block 0 has no v1/v2 (its v0/v1/v2 are ignored, rwkv7.py:207-209); substitute
    # zeros of the other layers' LoRA shape so stacking is uniform — layer 0's
    # blended-v path is dead (jnp.where selects v directly).
    def v_lora(i, name, shape):
        key = att_key(i, name)
        if key in sd:
            return get(key).squeeze() if name == "v0" else get(key)
        return np.zeros(shape, np.float32)

    C = config.n_embd
    Dv = config.d_v_lora

    att = {
        "x_r": stack(lambda i: vec(att_key(i, "x_r"))),
        "x_w": stack(lambda i: vec(att_key(i, "x_w"))),
        "x_k": stack(lambda i: vec(att_key(i, "x_k"))),
        "x_v": stack(lambda i: vec(att_key(i, "x_v"))),
        "x_a": stack(lambda i: vec(att_key(i, "x_a"))),
        "x_g": stack(lambda i: vec(att_key(i, "x_g"))),
        "w0": stack(lambda i: vec(att_key(i, "w0"))),
        "w1": stack(lambda i: get(att_key(i, "w1"))),
        "w2": stack(lambda i: get(att_key(i, "w2"))),
        "a0": stack(lambda i: vec(att_key(i, "a0"))),
        "a1": stack(lambda i: get(att_key(i, "a1"))),
        "a2": stack(lambda i: get(att_key(i, "a2"))),
        "v0": stack(lambda i: v_lora(i, "v0", (C,))),
        "v1": stack(lambda i: v_lora(i, "v1", (C, Dv))),
        "v2": stack(lambda i: v_lora(i, "v2", (Dv, C))),
        "g1": stack(lambda i: get(att_key(i, "g1"))),
        "g2": stack(lambda i: get(att_key(i, "g2"))),
        "k_k": stack(lambda i: vec(att_key(i, "k_k"))),
        "k_a": stack(lambda i: vec(att_key(i, "k_a"))),
        "r_k": stack(lambda i: get(att_key(i, "r_k"))),
        "Wr": stack(lambda i: get(att_key(i, "receptance.weight")).T),
        "Wk": stack(lambda i: get(att_key(i, "key.weight")).T),
        "Wv": stack(lambda i: get(att_key(i, "value.weight")).T),
        "Wo": stack(lambda i: get(att_key(i, "output.weight")).T),
        "ln_x_w": stack(lambda i: vec(att_key(i, "ln_x.weight"))),
        "ln_x_b": stack(lambda i: vec(att_key(i, "ln_x.bias"))),
    }
    ffn = {
        "x_k": stack(lambda i: vec(ffn_key(i, "x_k"))),
        "Wk": stack(lambda i: get(ffn_key(i, "key.weight")).T),
        "Wv": stack(lambda i: get(ffn_key(i, "value.weight")).T),
    }
    blocks = {
        "ln1_w": stack(lambda i: vec(f"blocks.{i}.ln1.weight")),
        "ln1_b": stack(lambda i: vec(f"blocks.{i}.ln1.bias")),
        "ln2_w": stack(lambda i: vec(f"blocks.{i}.ln2.weight")),
        "ln2_b": stack(lambda i: vec(f"blocks.{i}.ln2.bias")),
        "att": att,
        "ffn": ffn,
    }
    params = {
        "emb": emb,
        "blocks": blocks,
        "ln_out_w": vec("ln_out.weight"),
        "ln_out_b": vec("ln_out.bias"),
        "head": get("head.weight").T,
    }
    import jax

    return jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params)


def load_model(path: str, dtype=jnp.float32, vocab_size: Optional[int] = None):
    """Load a .pth checkpoint -> (config, params)."""
    sd = load_state_dict_pth(path)
    config = infer_config(sd, vocab_size=vocab_size)
    return config, params_from_state_dict(sd, config, dtype=dtype)


def synthetic_params(config: RWKV7Config, seed: int = 0, dtype=jnp.float32,
                     scale: float = 0.5):
    """Random small-magnitude parameters with the real pytree structure (tests)."""
    rng = np.random.default_rng(seed)
    L, C, V = config.n_layer, config.n_embd, config.vocab_size
    H, N = config.n_head, config.head_size
    Dw, Da, Dv, Dg = (config.d_decay_lora, config.d_iclr_lora,
                      config.d_v_lora, config.d_gate_lora)

    def r(*shape, s=scale):
        return rng.standard_normal(shape, dtype=np.float32) * s / np.sqrt(shape[-1] if len(shape) > 1 else 1)

    att = {
        "x_r": r(L, C), "x_w": r(L, C), "x_k": r(L, C), "x_v": r(L, C),
        "x_a": r(L, C), "x_g": r(L, C),
        "w0": r(L, C), "w1": r(L, C, Dw), "w2": r(L, Dw, C),
        "a0": r(L, C), "a1": r(L, C, Da), "a2": r(L, Da, C),
        "v0": r(L, C), "v1": r(L, C, Dv), "v2": r(L, Dv, C),
        "g1": r(L, C, Dg), "g2": r(L, Dg, C),
        "k_k": 1.0 + 0.1 * r(L, C), "k_a": 1.0 + 0.1 * r(L, C), "r_k": r(L, H, N),
        "Wr": r(L, C, C), "Wk": r(L, C, C), "Wv": r(L, C, C), "Wo": r(L, C, C),
        "ln_x_w": 1.0 + 0.1 * r(L, C), "ln_x_b": 0.1 * r(L, C),
    }
    ffn = {"x_k": r(L, C), "Wk": r(L, C, config.d_ffn), "Wv": r(L, config.d_ffn, C)}
    blocks = {
        "ln1_w": 1.0 + 0.1 * r(L, C), "ln1_b": 0.1 * r(L, C),
        "ln2_w": 1.0 + 0.1 * r(L, C), "ln2_b": 0.1 * r(L, C),
        "att": att, "ffn": ffn,
    }
    params = {
        "emb": r(V, C, s=1.0), "blocks": blocks,
        "ln_out_w": 1.0 + 0.1 * r(C), "ln_out_b": 0.1 * r(C),
        "head": r(C, V),
    }
    import jax

    return jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params)


def parameter_groups(params):
    """Per-placement-unit size accounting: [{'name', 'size_mb', 'n_arrays'}] for
    the pre (embedding), per-layer, and post (ln_out + head) groups — the natural
    unit for pipeline placement and streaming weight upload (parity with the
    reference's get_gpu_parameter_groups, Albatross/rwkv7.py:384-500; here layers
    are stacked, so per-layer sizes are the stacked leaf sizes / n_layer)."""
    import jax

    def leaf_bytes(tree):
        total = 0
        count = 0
        for leaf in jax.tree_util.tree_leaves(tree):
            total += leaf.size * leaf.dtype.itemsize
            count += 1
        return total, count

    blocks = params["blocks"]
    L = blocks["ln1_w"].shape[0]
    pre_b, pre_n = leaf_bytes(params["emb"])
    blk_b, blk_n = leaf_bytes(blocks)
    post_b, post_n = leaf_bytes(
        {k: params[k] for k in ("ln_out_w", "ln_out_b", "head")})
    groups = [{"name": "pre", "size_mb": pre_b / 2**20, "n_arrays": pre_n}]
    for i in range(L):
        groups.append({"name": f"layer_{i}", "size_mb": blk_b / L / 2**20,
                       "n_arrays": blk_n})
    groups.append({"name": "post", "size_mb": post_b / 2**20,
                   "n_arrays": post_n})
    return groups


def synthetic_params_int8(config: RWKV7Config, seed: int = 0,
                          dtype=jnp.bfloat16, use_numpy: bool = False):
    """Parameter pytree with Mm8Weight big mats, random codes/scales — the
    serving-dtype synthetic model for benchmarks and full-stack load tests
    (identical compute/memory behavior to a real INT8 checkpoint at ~1/4 the
    load time; a dense synthetic 7.2B f32 tree would not even fit one chip).

    use_numpy generates on host (fast on CPU backends where jax's threefry is
    ~20x slower than numpy); default generates on-device INSIDE ONE jit so the
    whole ~7 GB tree is a single compile + dispatch."""
    import jax
    from chirrup_tpu.ops.mm8 import Mm8Weight

    L, C, V, F = (config.n_layer, config.n_embd, config.vocab_size,
                  config.d_ffn)
    Dw, Da, Dv, Dg = (config.d_decay_lora, config.d_iclr_lora,
                      config.d_v_lora, config.d_gate_lora)

    def _mm8_from_codes(codes, shape, rx_full, ry_full):
        K, M, lead = shape[-2], shape[-1], shape[:-2]
        return Mm8Weight(
            q=codes,
            mx=jnp.zeros(lead + (M,), jnp.float32),
            rx=jnp.full(lead + (M,), rx_full / 16, jnp.float32),
            my=jnp.zeros(lead + (K,), jnp.float32),
            ry=jnp.full(lead + (K,), ry_full / 16, jnp.float32),
        )

    def _tree(dense, q8):
        att = {
            "x_r": dense(L, C), "x_w": dense(L, C), "x_k": dense(L, C),
            "x_v": dense(L, C), "x_a": dense(L, C), "x_g": dense(L, C),
            "w0": dense(L, C), "w1": dense(L, C, Dw), "w2": dense(L, Dw, C),
            "a0": dense(L, C), "a1": dense(L, C, Da), "a2": dense(L, Da, C),
            "v0": dense(L, C), "v1": dense(L, C, Dv), "v2": dense(L, Dv, C),
            "g1": dense(L, C, Dg), "g2": dense(L, Dg, C),
            "k_k": dense(L, C, scale=1.0), "k_a": dense(L, C, scale=1.0),
            "r_k": dense(L, C // 64, 64),
            "Wr": q8(L, C, C), "Wk": q8(L, C, C), "Wv": q8(L, C, C),
            "Wo": q8(L, C, C),
            "ln_x_w": dense(L, C, scale=1.0), "ln_x_b": dense(L, C),
        }
        ffn = {"x_k": dense(L, C), "Wk": q8(L, C, F), "Wv": q8(L, F, C)}
        blocks = {
            "ln1_w": dense(L, C, scale=1.0), "ln1_b": dense(L, C),
            "ln2_w": dense(L, C, scale=1.0), "ln2_b": dense(L, C),
            "att": att, "ffn": ffn,
        }
        return {
            "emb": dense(V, C, scale=1.0),
            "blocks": blocks,
            # head scales sized so logits concentrate like a trained model's
            # (top-1k softmax mass >> top_p) — otherwise the sampler's exact-
            # fallback runs every step, which real checkpoints never hit
            "ln_out_w": dense(C, scale=1.0), "ln_out_b": dense(C),
            "head": q8(C, V, rx_full=0.45, ry_full=1.0),
        }

    if use_numpy:
        import jax

        np_rng = np.random.default_rng(np.uint32(
            jax.random.bits(jax.random.key(seed))))

        def dense(*shape, scale=0.02):
            return jnp.asarray(
                np_rng.standard_normal(shape, np.float32) * scale, dtype)

        def q8(*shape, rx_full=0.04, ry_full=0.002):
            codes = jnp.asarray(
                np_rng.integers(-128, 128, shape, np.int8, endpoint=False))
            return _mm8_from_codes(codes, shape, rx_full, ry_full)

        return _tree(dense, q8)

    import jax

    @jax.jit
    def _gen(key):
        ks = iter(jax.random.split(key, 64))

        def dense(*shape, scale=0.02):
            return (jax.random.normal(next(ks), shape, jnp.float32)
                    * scale).astype(dtype)

        def q8(*shape, rx_full=0.04, ry_full=0.002):
            codes = jax.random.randint(next(ks), shape, -128, 128, jnp.int8)
            return _mm8_from_codes(codes, shape, rx_full, ry_full)

        return _tree(dense, q8)

    return _gen(jax.random.key(seed))
