"""Checkpoint loader tests against a synthetic .pth in the exact RWKV-LM format
(key names/shapes per the public checkpoints; preprocessing contract per the
reference runtime, Albatross/rwkv7.py:171-221)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from chirrup_tpu.models.loader import (
    load_state_dict_pth, infer_config, params_from_state_dict, load_model)
from chirrup_tpu.models import rwkv7 as m


L, C, V, F = 2, 128, 512, 512
H, N = C // 64, 64
DW, DA, DV, DG = 32, 32, 16, 32


def _make_state_dict(with_block0_v=True):
    g = torch.Generator().manual_seed(0)

    def r(*shape, scale=0.1):
        return torch.randn(*shape, generator=g) * scale

    sd = {"emb.weight": r(V, C, scale=1.0),
          "blocks.0.ln0.weight": 1 + 0.1 * r(C), "blocks.0.ln0.bias": 0.1 * r(C),
          "ln_out.weight": 1 + 0.1 * r(C), "ln_out.bias": 0.1 * r(C),
          "head.weight": r(V, C)}
    for i in range(L):
        pre = f"blocks.{i}."
        sd[pre + "ln1.weight"] = 1 + 0.1 * r(C)
        sd[pre + "ln1.bias"] = 0.1 * r(C)
        sd[pre + "ln2.weight"] = 1 + 0.1 * r(C)
        sd[pre + "ln2.bias"] = 0.1 * r(C)
        att = pre + "att."
        for k in ("x_r", "x_w", "x_k", "x_v", "x_a", "x_g"):
            sd[att + k] = r(1, 1, C)
        sd[att + "w0"] = r(1, 1, C)
        sd[att + "w1"] = r(C, DW)
        sd[att + "w2"] = r(DW, C)
        sd[att + "a0"] = r(1, 1, C)
        sd[att + "a1"] = r(C, DA)
        sd[att + "a2"] = r(DA, C)
        if i > 0 or with_block0_v:
            sd[att + "v0"] = r(1, 1, C)
            sd[att + "v1"] = r(C, DV)
            sd[att + "v2"] = r(DV, C)
        sd[att + "g1"] = r(C, DG)
        sd[att + "g2"] = r(DG, C)
        sd[att + "k_k"] = r(1, 1, C)
        sd[att + "k_a"] = r(1, 1, C)
        sd[att + "r_k"] = r(H, N)
        for k in ("receptance", "key", "value", "output"):
            sd[att + k + ".weight"] = r(C, C)
        sd[att + "ln_x.weight"] = 1 + 0.1 * r(C)
        sd[att + "ln_x.bias"] = 0.1 * r(C)
        ffn = pre + "ffn."
        sd[ffn + "x_k"] = r(1, 1, C)
        sd[ffn + "key.weight"] = r(F, C)
        sd[ffn + "value.weight"] = r(C, F)
    return sd


@pytest.fixture(scope="module")
def ckpt_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ckpt") / "model.pth")
    torch.save(_make_state_dict(), path)
    return path


def test_infer_config(ckpt_path):
    sd = load_state_dict_pth(ckpt_path)
    cfg = infer_config(sd)
    assert (cfg.n_layer, cfg.n_embd, cfg.vocab_size) == (L, C, V)
    assert cfg.d_decay_lora == DW and cfg.d_v_lora == DV and cfg.d_gate_lora == DG


def test_load_and_forward(ckpt_path):
    cfg, params = load_model(ckpt_path)
    assert params["emb"].shape == (V, C)
    assert params["head"].shape == (C, V)          # transposed for x @ W
    assert params["blocks"]["att"]["Wr"].shape == (L, C, C)
    assert params["blocks"]["ffn"]["Wk"].shape == (L, C, F)
    assert params["blocks"]["ffn"]["Wv"].shape == (L, F, C)

    # ln0 folded: emb rows are layer-normalized (scaled by ln0 weight)
    sd = load_state_dict_pth(ckpt_path)
    row = np.asarray(sd["emb.weight"][5])
    mu, var = row.mean(), row.var()
    expected = (row - mu) / np.sqrt(var + 1e-5) * sd["blocks.0.ln0.weight"] \
        + sd["blocks.0.ln0.bias"]
    np.testing.assert_allclose(np.asarray(params["emb"][5]), expected,
                               rtol=1e-4, atol=1e-5)

    state = m.init_state(cfg, 1)
    logits, state = m.forward_seq(params, jnp.asarray([[1, 2, 3]], jnp.int32), state)
    assert logits.shape == (1, V)
    assert np.isfinite(np.asarray(logits)).all()
    assert int(state.elapsed[0]) == 3


def test_missing_block0_v_lora(tmp_path):
    """Checkpoints without blocks.0.att.v* must load (layer 0 ignores them,
    reference rwkv7.py:207-209)."""
    path = str(tmp_path / "model.pth")
    torch.save(_make_state_dict(with_block0_v=False), path)
    cfg, params = load_model(path)
    assert params["blocks"]["att"]["v1"].shape == (L, C, DV)
    assert np.all(np.asarray(params["blocks"]["att"]["v1"][0]) == 0)
    state = m.init_state(cfg, 1)
    logits, _ = m.forward_seq(params, jnp.asarray([[7]], jnp.int32), state)
    assert np.isfinite(np.asarray(logits)).all()


def test_native_checkpoint_roundtrip(ckpt_path, tmp_path):
    """pth -> quantize -> native save -> load -> identical logits."""
    import jax
    from chirrup_tpu.models.checkpoint import (save_native, load_native,
                                               is_native_checkpoint)
    from chirrup_tpu.engine.serving import _quantize_params

    cfg, params = load_model(ckpt_path)
    qparams = _quantize_params(params)
    out = str(tmp_path / "native")
    save_native(out, cfg, qparams)
    assert is_native_checkpoint(out)

    cfg2, params2 = load_native(out)
    assert cfg2 == cfg
    state = m.init_state(cfg, 1)
    tok = jnp.asarray([[3, 5, 9]], jnp.int32)
    lg1, _ = m.forward_seq(qparams, tok, state)
    lg2, _ = m.forward_seq(params2, tok, m.init_state(cfg, 1))
    np.testing.assert_allclose(np.asarray(lg1), np.asarray(lg2), rtol=1e-6)

    # ServingModel must not re-quantize pre-quantized params
    from chirrup_tpu.models.config import RuntimeConfig
    from chirrup_tpu.engine.serving import ServingModel
    sm = ServingModel(cfg, params2, RuntimeConfig(
        activation_dtype=jnp.float32, wkv_state_dtype=jnp.float32,
        quantization="int8", use_pallas_wkv=False), batch_size=2)
    from chirrup_tpu.ops.mm8 import Mm8Weight
    assert isinstance(sm.params["head"], Mm8Weight)
