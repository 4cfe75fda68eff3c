"""insert_slots_batched (the lockstep fixed-shape admission program) must be
equivalent to a sequence of per-slot insert_slot calls for fresh requests —
the two admission paths share the serving semantics and must not drift."""

import numpy as np
import jax
import jax.numpy as jnp

from chirrup_tpu.models.config import RWKV7Config, RuntimeConfig
from chirrup_tpu.models.loader import synthetic_params
from chirrup_tpu.engine.serving import ServingModel

CFG = RWKV7Config(n_layer=2, n_embd=128, vocab_size=300,
                  d_decay_lora=32, d_iclr_lora=32, d_v_lora=16, d_gate_lora=32)


class _Task:
    def __init__(self, temperature=0.7, top_p=0.4, top_k=5,
                 frequency_penalty=0.3, presence_penalty=0.2,
                 penalty_decay=0.99, forbidden_tokens=(7, 8, 9)):
        self.temperature = temperature
        self.top_p = top_p
        self.top_k = top_k
        self.frequency_penalty = frequency_penalty
        self.presence_penalty = presence_penalty
        self.penalty_decay = penalty_decay
        self.forbidden_tokens = forbidden_tokens


def _carry_np(carry):
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x,
        dict(occurrence=carry.occurrence, presence_vec=carry.presence_vec,
             temperature=carry.temperature, top_p=carry.top_p,
             top_k=carry.top_k, frequency_penalty=carry.frequency_penalty,
             presence_penalty=carry.presence_penalty,
             penalty_decay=carry.penalty_decay, last_sampled=carry.last_sampled,
             shift=carry.state.shift, wkv=carry.state.wkv,
             elapsed=carry.state.elapsed))


def test_batched_insert_equals_per_slot_inserts():
    params = synthetic_params(CFG, seed=1)
    rt = RuntimeConfig(activation_dtype=jnp.float32,
                       wkv_state_dtype=jnp.float32,
                       quantization=None, use_pallas_wkv=False)
    model = ServingModel(CFG, params, rt, batch_size=4)

    tasks = [None, _Task(), None, _Task(temperature=0.0, top_p=1.0, top_k=0,
                                        forbidden_tokens=(1,))]
    mask = np.array([t is not None for t in tasks])

    # dirty both carries identically so insertion must actively reset rows
    def dirty(carry):
        carry = model.decode_step(
            carry, np.array([5, 6, 7, 8], np.int32),
            np.ones(4, bool), np.ones(4, bool))[0]
        return carry

    # two independently-built identical carries (insert programs DONATE their
    # input, so sharing buffers between the two paths would delete them)
    c_batched = dirty(model.init_carry())
    c_serial = dirty(model.init_carry())

    c_batched = model.insert_slots_batched(c_batched, mask, tasks)
    for i, t in enumerate(tasks):
        if t is not None:
            c_serial = model.insert_slot(c_serial, i, None, t)

    a, b = _carry_np(c_batched), _carry_np(c_serial)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=0, atol=0, err_msg=k)
