"""prefill_step_compact (gather P rows -> chunk -> scatter) must be bit-equal
to the full-batch masked prefill_step — including pad rows pointed at idle
slots, whose state must pass through unchanged."""

import numpy as np
import jax
import jax.numpy as jnp

from chirrup_tpu.models.config import RWKV7Config, RuntimeConfig
from chirrup_tpu.models.loader import synthetic_params
from chirrup_tpu.engine.serving import ServingModel

CFG = RWKV7Config(n_layer=2, n_embd=128, vocab_size=300,
                  d_decay_lora=32, d_iclr_lora=32, d_v_lora=16, d_gate_lora=32)


def _state_np(carry):
    return (np.asarray(carry.state.shift), np.asarray(carry.state.wkv),
            np.asarray(carry.state.elapsed))


def _make(batch):
    params = synthetic_params(CFG, seed=3)
    rt = RuntimeConfig(activation_dtype=jnp.float32,
                       wkv_state_dtype=jnp.float32,
                       quantization=None, use_pallas_wkv=False)
    return ServingModel(CFG, params, rt, batch_size=batch, prefill_chunk=8)


def test_compact_prefill_equals_full_prefill():
    B = 16
    model = _make(B)
    assert model.prefill_slots == 8 and model.prefill_variants == [(8, 8)]
    rng = np.random.default_rng(0)

    dirty_toks = rng.integers(1, 290, (B,)).astype(np.int32)

    def dirty(carry):  # non-zero states so pass-through is actually checked
        return model.decode_step(carry, dirty_toks, np.ones(B, bool),
                                 np.ones(B, bool))[0]

    c_full = dirty(model.init_carry())
    c_comp = dirty(model.init_carry())

    # 3 prefilling slots at scattered positions, ragged lengths
    T = model.prefill_chunk
    fed = {2: rng.integers(1, 290, (T,)), 7: rng.integers(1, 290, (3,)),
           11: rng.integers(1, 290, (T,))}

    tokens_full = np.zeros((B, T), np.int32)
    lengths_full = np.zeros((B,), np.int32)
    for idx, chunk in fed.items():
        tokens_full[idx, :len(chunk)] = chunk
        lengths_full[idx] = len(chunk)
    c_full = model.prefill_step(c_full, jnp.asarray(tokens_full),
                                jnp.asarray(lengths_full))

    P = model.prefill_slots
    tokens_c = np.zeros((P, T), np.int32)
    lengths_c = np.zeros((P,), np.int32)
    slot_idx = np.zeros((P,), np.int32)
    for row, (idx, chunk) in enumerate(fed.items()):
        tokens_c[row, :len(chunk)] = chunk
        lengths_c[row] = len(chunk)
        slot_idx[row] = idx
    spare = (i for i in range(B) if i not in fed)
    for row in range(len(fed), P):
        slot_idx[row] = next(spare)
    c_comp = model.prefill_step_compact(c_comp, tokens_c, lengths_c, slot_idx)

    for a, b, name in zip(_state_np(c_full), _state_np(c_comp),
                          ("shift", "wkv", "elapsed")):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_compact_prefill_through_worker():
    """The worker's compact dispatch produces the same generation as an
    engine run is covered by the engine suite; here just check the worker
    picks the compact path and completes a long-prompt request."""
    import queue
    from chirrup_tpu.engine.worker import Worker, SlotPhase
    from chirrup_tpu.engine.structures import Task, RequestStatus
    from chirrup_tpu.utils.tokenizer import WorldTokenizer
    from tests.engine_fixtures import write_tiny_vocab
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        vocab = write_tiny_vocab(os.path.join(td, "vocab.txt"))
        tok = WorldTokenizer(vocab)
        model = _make(16)

        calls = []
        orig = model.prefill_step_compact

        def spy(carry, tokens, lengths, slot_idx):
            calls.append((np.asarray(tokens).shape, list(np.asarray(slot_idx))))
            return orig(carry, tokens, lengths, slot_idx)

        model.prefill_step_compact = spy
        tq, meq = queue.Queue(), queue.Queue()
        w = Worker("w0", lambda: (model, tok), tq, meq, None, batch_size=16,
                   decode_block_size=1)
        w._init_worker()
        task = Task(output_queue=queue.Queue(), task_event_queue=queue.Queue(),
                    prompt_str="", state=None, prefill_tokens=[
                        int(t) for t in
                        np.random.default_rng(1).integers(1, 290, (40,))],
                    max_tokens=4, stop_tokens=set(), temperature=0.0,
                    top_p=0.0)
        tq.put(task)
        for _ in range(60):
            w.run_once()
            if task.is_finished():
                break
        assert task.request_status == RequestStatus.FINISHED_LENGTH_CAPPED
        assert len(task.generated_tokens) == 4
        assert calls, "compact prefill was never dispatched"
        assert all(shape[0] == model.prefill_slots for shape, _ in calls)
        # pad rows pointed at distinct slots
        for _, idx in calls:
            assert len(set(idx)) == len(idx)
