"""State snapshots ride the serving dtype: at bf16 that is half the host RAM
and D2H of an f32 snapshot (the reference stores fp16, SURVEY §2.2 M2), and
the extract -> insert -> extract round trip must be BIT-stable (bf16 -> f32 ->
bf16 casts are value-preserving), so resume-from-snapshot cannot drift."""

import numpy as np
import jax
import jax.numpy as jnp

from chirrup_tpu.models.config import RWKV7Config, RuntimeConfig
from chirrup_tpu.models.loader import synthetic_params
from chirrup_tpu.engine.serving import ServingModel

CFG = RWKV7Config(n_layer=2, n_embd=128, vocab_size=300,
                  d_decay_lora=32, d_iclr_lora=32, d_v_lora=16, d_gate_lora=32)


class _Task:
    temperature, top_p, top_k = 1.0, 0.3, 0
    frequency_penalty, presence_penalty, penalty_decay = 0.0, 0.0, 1.0
    forbidden_tokens = ()


def test_snapshot_bf16_roundtrip_bitstable():
    params = synthetic_params(CFG, seed=5)
    rt = RuntimeConfig(activation_dtype=jnp.bfloat16,
                       wkv_state_dtype=jnp.bfloat16,
                       quantization=None, use_pallas_wkv=False)
    model = ServingModel(CFG, params, rt, batch_size=4)
    carry = model.init_carry()
    toks = np.array([5, 6, 7, 8], np.int32)
    for _ in range(3):
        carry, _, _ = model.decode_step(carry, toks, np.ones(4, bool),
                                        np.ones(4, bool))

    snap = model.extract_slot(carry, 1)
    # snapshot carries the device dtype — 2 bytes/elem at bf16 serving config
    assert snap.shift.dtype == jnp.bfloat16, snap.shift.dtype
    assert snap.wkv.dtype == jnp.bfloat16
    assert snap.nbytes() < CFG.n_layer * (2 * CFG.n_embd
                                          + 64 * CFG.n_embd) * 2 + 64

    carry = model.insert_slot(carry, 2, snap, _Task())
    snap2 = model.extract_slot(carry, 2)
    np.testing.assert_array_equal(np.asarray(snap.shift, np.float32),
                                  np.asarray(snap2.shift, np.float32))
    np.testing.assert_array_equal(np.asarray(snap.wkv, np.float32),
                                  np.asarray(snap2.wkv, np.float32))
    assert snap.elapsed == snap2.elapsed
