"""Tensor-parallel tests on the virtual 8-device CPU mesh: sharded serving steps
must agree with the single-device path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chirrup_tpu.models.config import RWKV7Config, RuntimeConfig
from chirrup_tpu.models.loader import synthetic_params
from chirrup_tpu.engine.serving import ServingModel
from chirrup_tpu.parallel.mesh import make_mesh

TP = 4
CFG = RWKV7Config(n_layer=2, n_embd=64 * TP * 2, vocab_size=512,
                  d_decay_lora=32, d_iclr_lora=32, d_v_lora=16, d_gate_lora=32)


class _TaskParams:
    temperature, top_p, top_k = 0.0, 0.3, 0
    frequency_penalty, presence_penalty, penalty_decay = 0.0, 0.0, 1.0
    forbidden_tokens = ()


def _mk_model(mesh, cpu_devices, quant=None):
    params = synthetic_params(CFG, seed=3)
    runtime = RuntimeConfig(activation_dtype=jnp.float32,
                            wkv_state_dtype=jnp.float32,
                            quantization=quant, use_pallas_wkv=True)
    return ServingModel(CFG, params, runtime, batch_size=4, prefill_chunk=8,
                        mesh=mesh, interpret_pallas=True)


def _drive(model):
    """insert two slots, prefill one, decode both greedily; return tokens+state."""
    carry = model.init_carry()
    carry = model.insert_slot(carry, 0, None, _TaskParams())
    carry = model.insert_slot(carry, 1, None, _TaskParams())

    tokens = np.zeros((4, 8), np.int32)
    tokens[0, :6] = [5, 6, 7, 8, 9, 10]
    lengths = np.zeros((4,), np.int32)
    lengths[0] = 6
    carry = model.prefill_step(carry, jnp.asarray(tokens), jnp.asarray(lengths))

    out = []
    step_tokens = np.array([11, 3, 0, 0], np.int32)
    active = np.array([True, True, False, False])
    for _ in range(3):
        carry, sampled, _ = model.decode_step(
            carry, jnp.asarray(step_tokens), jnp.asarray(active),
            jnp.asarray(active))
        s = np.asarray(jax.device_get(sampled))
        out.append(s.copy())
        step_tokens = np.where(s >= 0, s, step_tokens).astype(np.int32)
    state0 = model.extract_slot(carry, 0)
    return np.stack(out), state0


def test_tp_matches_single_device(cpu_devices):
    mesh = make_mesh(tp=TP, dp=1)
    out_tp, st_tp = _drive(_mk_model(mesh, cpu_devices))
    out_1, st_1 = _drive(_mk_model(None, cpu_devices))
    np.testing.assert_array_equal(out_tp, out_1)
    assert st_tp.elapsed == st_1.elapsed == 6 + 3
    np.testing.assert_allclose(st_tp.wkv, st_1.wkv, rtol=2e-3, atol=2e-3)


def test_tp_int8(cpu_devices):
    mesh = make_mesh(tp=TP, dp=1)
    out_tp, st = _drive(_mk_model(mesh, cpu_devices, quant="int8"))
    out_1, _ = _drive(_mk_model(None, cpu_devices, quant="int8"))
    np.testing.assert_array_equal(out_tp, out_1)
    assert np.isfinite(st.wkv).all()


def test_dryrun_multichip(cpu_devices):
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def _mk_model_fused(mesh, core="pallas_a8"):
    """The serving-fused configuration: Pallas mm8 cores, packed LoRA,
    fused-TMix WKV — all in interpret mode. Under the mesh every kernel runs on
    its local shard inside the whole-forward shard_map."""
    params = synthetic_params(CFG, seed=3)
    runtime = RuntimeConfig(activation_dtype=jnp.float32,
                            wkv_state_dtype=jnp.float32,
                            quantization="int8", use_pallas_wkv=True,
                            mm8_core=core)
    return ServingModel(CFG, params, runtime, batch_size=4, prefill_chunk=8,
                        mesh=mesh, interpret_pallas=True)


def test_tp_pallas_w8a16_kernels_match_single_device(cpu_devices):
    """Sharded Pallas kernels, exact check (VERDICT r1 #3): with the w8a16
    "pallas" core (no activation quantization) the tp=4 mesh path and the
    meshless path run the same math up to f32 psum ordering — logits-level
    agreement must be tight."""
    mesh = make_mesh(tp=TP, dp=1)
    out_tp, st_tp = _drive(_mk_model_fused(mesh, core="pallas"))
    out_1, st_1 = _drive(_mk_model_fused(None, core="pallas"))
    np.testing.assert_array_equal(out_tp, out_1)
    assert st_tp.elapsed == st_1.elapsed == 6 + 3
    np.testing.assert_allclose(st_tp.wkv, st_1.wkv, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(st_tp.shift, st_1.shift, rtol=2e-4, atol=2e-4)


def test_tp_fused_a8_kernels_match_single_device(cpu_devices):
    """Sharded fused a8 kernels (the serving default). Row-parallel inputs are
    activation-quantized with PER-CHIP scales under tp (the local |max| is
    finer than the global one), so states drift ~1-2% from the meshless run —
    bounded here; greedy tokens must still match."""
    mesh = make_mesh(tp=TP, dp=1)
    model_tp = _mk_model_fused(mesh)
    model_1 = _mk_model_fused(None)

    # the merged/packed serving layout must actually be active in BOTH
    from chirrup_tpu.ops.mm8 import Mm8MultiWeight
    for m in (model_tp, model_1):
        att = m.params["blocks"]["att"]
        assert "Wrkv" in att and isinstance(att["Wrkv"], Mm8MultiWeight)
        assert "lora1" in att and "ln_x_w_nh" in att

    out_tp, st_tp = _drive(model_tp)
    out_1, st_1 = _drive(model_1)
    np.testing.assert_array_equal(out_tp, out_1)
    assert st_tp.elapsed == st_1.elapsed == 6 + 3
    np.testing.assert_allclose(st_tp.wkv, st_1.wkv, rtol=5e-2, atol=5e-2)
