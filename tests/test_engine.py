"""End-to-end engine tests: init, streaming completion, greedy correctness vs the
raw model, abort, stop tokens, max_tokens, cache_prefill snapshots, concurrency."""

import asyncio

import numpy as np
import jax.numpy as jnp
import pytest

from chirrup_tpu.engine.engine import AsyncEngineCore
from chirrup_tpu.engine.structures import RequestStatus

from tests.engine_fixtures import write_tiny_vocab, synthetic_model_config


@pytest.fixture(scope="module")
def vocab_path(tmp_path_factory):
    return write_tiny_vocab(str(tmp_path_factory.mktemp("vocab") / "vocab.txt"))


def _run(coro):
    return asyncio.run(asyncio.wait_for(coro, timeout=240))


@pytest.fixture(scope="module")
def engine_setup(vocab_path):
    """One engine shared by this module's tests (loads the model once)."""
    loop = asyncio.new_event_loop()
    engine = AsyncEngineCore()
    cfg = synthetic_model_config(vocab_path)
    loop.run_until_complete(
        asyncio.wait_for(engine.init(worker_num=1, model_config=cfg, batch_size=4,
                                     load_timeout=180), timeout=200))
    yield loop, engine
    engine.shutdown()
    engine.join(timeout=10)
    loop.close()


def test_basic_completion(engine_setup):
    loop, engine = engine_setup

    async def go():
        completion = engine.completion(
            "hello world", temperature=0.0, max_tokens=6,
            presence_penalty=0.0, frequency_penalty=0.0,
            stop_tokens=[0])
        tokens = []
        async for event in completion:
            if event[0] == "token":
                tokens.append(event[1])
                assert isinstance(event[2], str)
        return tokens, completion.task

    tokens, task = loop.run_until_complete(asyncio.wait_for(go(), 120))
    assert 1 <= len(tokens) <= 6
    if len(tokens) == 6:
        assert task.request_status == RequestStatus.FINISHED_LENGTH_CAPPED


def test_greedy_matches_raw_model(engine_setup, vocab_path):
    """The engine's full path (prefill chunks + one-prefill + decode + penalties off)
    must reproduce raw-model greedy decoding exactly."""
    loop, engine = engine_setup

    prompt = "hello world the User says hello to the Assistant and then some"

    async def go():
        completion = engine.completion(
            prompt, temperature=0.0, max_tokens=5,
            presence_penalty=0.0, frequency_penalty=0.0, stop_tokens=[0])
        out = []
        async for event in completion:
            if event[0] == "token":
                out.append(event[1])
        return out

    engine_tokens = loop.run_until_complete(asyncio.wait_for(go(), 120))

    # raw-model greedy reference
    from chirrup_tpu.models.config import RWKV7Config
    from chirrup_tpu.models.loader import synthetic_params
    from chirrup_tpu.models import rwkv7 as m
    from tests.engine_fixtures import VOCAB_SIZE

    cfg = RWKV7Config(n_layer=2, n_embd=128, vocab_size=VOCAB_SIZE,
                      d_decay_lora=32, d_iclr_lora=32, d_v_lora=16, d_gate_lora=32)
    params = synthetic_params(cfg, seed=0)  # engine worker 0 uses seed 0
    ids = engine.tokenizer.encode(prompt)
    state = m.init_state(cfg, 1)
    if len(ids) > 1:
        state = m.forward_chunk(params, jnp.asarray([ids[:-1]], jnp.int32), state)
    cur = ids[-1]
    expected = []
    for _ in range(5):
        logits, state = m.forward_step(params, jnp.asarray([cur], jnp.int32), state)
        cur = int(jnp.argmax(logits[0]))
        if cur == 0:
            break
        expected.append(cur)
    assert engine_tokens == expected


def test_concurrent_completions(engine_setup):
    loop, engine = engine_setup

    async def go():
        comps = [
            engine.completion(f"hello world {i}", temperature=1.0, top_p=0.8,
                              max_tokens=4 + i, stop_tokens=[0],
                              presence_penalty=0.3, frequency_penalty=0.3)
            for i in range(6)  # more than batch_size=4: exercises queueing
        ]
        texts = await asyncio.gather(*[c.get_full_completion() for c in comps])
        return comps, texts

    comps, texts = loop.run_until_complete(asyncio.wait_for(go(), 180))
    for i, c in enumerate(comps):
        assert c.task.is_finished()
        assert len(c.task.generated_tokens) <= 4 + i


def test_abort(engine_setup):
    loop, engine = engine_setup

    async def go():
        completion = engine.completion(
            "hello", temperature=1.0, max_tokens=10_000, stop_tokens=[0],
            presence_penalty=0.0, frequency_penalty=0.0)
        n = 0
        async for event in completion:
            if event[0] == "token":
                n += 1
                if n == 2:
                    completion.abort()
        return n, completion.task

    n, task = loop.run_until_complete(asyncio.wait_for(go(), 120))
    assert task.request_status == RequestStatus.FINISHED_ABORTED
    assert n >= 2


def test_stop_tokens_immediate(engine_setup):
    loop, engine = engine_setup

    async def go():
        # every possible token is a stop token -> finishes without emitting any
        completion = engine.completion(
            "hello world", temperature=1.0, max_tokens=50,
            stop_tokens=list(range(300)),
            presence_penalty=0.0, frequency_penalty=0.0)
        toks = [e async for e in completion if e[0] == "token"]
        return toks, completion.task

    toks, task = loop.run_until_complete(asyncio.wait_for(go(), 120))
    assert toks == []
    assert task.request_status == RequestStatus.FINISHED_STOPPED


def test_cache_prefill_event(engine_setup):
    loop, engine = engine_setup
    prompt = "hello world the User likes to say hello hello hello to the world"

    async def go():
        ids = engine.tokenizer.encode(prompt)
        completion = engine.completion(
            prompt, prefill_tokens=list(ids), temperature=0.0, max_tokens=3,
            stop_tokens=[0], cache_prefill=True, cache_prefill_padding=3,
            presence_penalty=0.0, frequency_penalty=0.0)
        snapshot = None
        async for event in completion:
            if event[0] == "cache_prefill":
                snapshot = event[1]
        return ids, snapshot

    ids, snapshot = loop.run_until_complete(asyncio.wait_for(go(), 120))
    assert snapshot is not None
    assert list(snapshot["prefilled_tokens"]) == ids[:-3]
    st = snapshot["state"]
    assert st.shift.shape == (2, 2, 128)
    assert st.wkv.shape == (2, 64, 128)
    assert st.elapsed == len(ids) - 3
    assert np.isfinite(st.wkv).all()


def test_resume_from_state(engine_setup):
    """A request resuming from a cached state must match an uncached request
    (greedy)."""
    loop, engine = engine_setup
    prompt = "hello world the Assistant says hello world again and again ok"

    async def go():
        ids = engine.tokenizer.encode(prompt)
        c1 = engine.completion(prompt, prefill_tokens=list(ids), temperature=0.0,
                               max_tokens=4, stop_tokens=[0], cache_prefill=True,
                               cache_prefill_padding=3,
                               presence_penalty=0.0, frequency_penalty=0.0)
        snapshot, toks1 = None, []
        async for event in c1:
            if event[0] == "cache_prefill":
                snapshot = event[1]
            elif event[0] == "token":
                toks1.append(event[1])

        # resume: feed only the last 3 tokens on top of the snapshot state
        c2 = engine.completion(prompt, prefill_tokens=list(ids[-3:]),
                               state=snapshot["state"], temperature=0.0,
                               max_tokens=4, stop_tokens=[0],
                               presence_penalty=0.0, frequency_penalty=0.0)
        toks2 = []
        async for event in c2:
            if event[0] == "token":
                toks2.append(event[1])
        return toks1, toks2

    toks1, toks2 = loop.run_until_complete(asyncio.wait_for(go(), 120))
    assert toks1 == toks2


def test_decode_blocks_match_single_steps(vocab_path):
    """K-step decode blocks must produce the same greedy tokens as K=1."""
    import asyncio as aio
    from chirrup_tpu.engine.engine import AsyncEngineCore as Engine

    prompt = "hello world the quick brown fox says hello to the lazy world dog"
    results = {}
    for K in (1, 4):
        loop = aio.new_event_loop()
        engine = Engine()
        cfg = synthetic_model_config(vocab_path)
        loop.run_until_complete(aio.wait_for(
            engine.init(worker_num=1, model_config=cfg, batch_size=4,
                        load_timeout=180, decode_block_size=K), timeout=200))

        async def go():
            completion = engine.completion(
                prompt, temperature=0.0, max_tokens=7,
                presence_penalty=0.0, frequency_penalty=0.0, stop_tokens=[0])
            return [e[1] async for e in completion if e[0] == "token"]

        results[K] = loop.run_until_complete(aio.wait_for(go(), 120))
        engine.shutdown()
        engine.join(timeout=10)
        loop.close()
    assert results[1] == results[4]
    assert len(results[1]) >= 1


def test_forbidden_tokens_unbounded(engine_setup):
    """Arbitrary-size forbidden sets are fully honored (round-1 capped at 8 and
    silently truncated; the reference accepts any size, worker.py:719-722)."""
    loop, engine = engine_setup
    forbidden = list(range(1, 80))  # 79 ids, far beyond the old cap

    async def go():
        completion = engine.completion(
            "hello world hello", temperature=1.0, top_p=1.0, max_tokens=12,
            stop_tokens=[0], forbidden_tokens=forbidden,
            presence_penalty=0.0, frequency_penalty=0.0)
        return [e[1] async for e in completion if e[0] == "token"]

    tokens = loop.run_until_complete(asyncio.wait_for(go(), 120))
    assert len(tokens) >= 1
    assert not (set(tokens) & set(forbidden))


def test_long_prompt_chunked_prefill(engine_setup, vocab_path):
    """A prompt far longer than prefill_chunk (8 here) exercises many SEQ
    chunks + the ONE_PREFILL tail + decode, and must equal the raw model's
    greedy output (the reference handles long context the same way: chunked
    streaming prefill against O(1) state, worker.py:744-776)."""
    loop, engine = engine_setup
    prompt = " ".join(["hello world the User says hello to the Assistant"] * 12)

    async def go():
        completion = engine.completion(
            prompt, temperature=0.0, max_tokens=4,
            presence_penalty=0.0, frequency_penalty=0.0, stop_tokens=[0])
        return [e[1] async for e in completion if e[0] == "token"]

    engine_tokens = loop.run_until_complete(asyncio.wait_for(go(), 180))

    from chirrup_tpu.models.config import RWKV7Config
    from chirrup_tpu.models.loader import synthetic_params
    from chirrup_tpu.models import rwkv7 as m
    from tests.engine_fixtures import VOCAB_SIZE

    cfg = RWKV7Config(n_layer=2, n_embd=128, vocab_size=VOCAB_SIZE,
                      d_decay_lora=32, d_iclr_lora=32, d_v_lora=16, d_gate_lora=32)
    params = synthetic_params(cfg, seed=0)
    ids = engine.tokenizer.encode(prompt)
    assert len(ids) > 80  # really exercises many chunks
    state = m.init_state(cfg, 1)
    state = m.forward_chunk(params, jnp.asarray([ids[:-1]], jnp.int32), state)
    cur = ids[-1]
    expected = []
    for _ in range(4):
        logits, state = m.forward_step(params, jnp.asarray([cur], jnp.int32), state)
        cur = int(jnp.argmax(logits[0]))
        if cur == 0:
            break
        expected.append(cur)
    assert engine_tokens == expected


def test_cache_prefill_large_padding(engine_setup):
    """Regression: padding >= min_forward_seq_len (10) used to strand the slot
    in SEQ_PREFILL forever (bulk prefill stops pad tokens early; the transition
    compared the raw remaining length instead of the pad-adjusted one)."""
    loop, engine = engine_setup
    prompt = "hello world the User says hello to the Assistant and world peace"

    async def go():
        ids = engine.tokenizer.encode(prompt)
        assert len(ids) > 14
        completion = engine.completion(
            prompt, prefill_tokens=list(ids), temperature=0.0, max_tokens=3,
            stop_tokens=[0], cache_prefill=True, cache_prefill_padding=12,
            presence_penalty=0.0, frequency_penalty=0.0)
        snapshot, toks = None, []
        async for event in completion:
            if event[0] == "cache_prefill":
                snapshot = event[1]
            elif event[0] == "token":
                toks.append(event[1])
        return ids, snapshot, toks

    ids, snapshot, toks = loop.run_until_complete(asyncio.wait_for(go(), 60))
    assert len(toks) >= 1                        # generation made progress
    assert snapshot is not None
    assert list(snapshot["prefilled_tokens"]) == ids[:-12]


def test_churn_abort_storm_no_slot_leaks(vocab_path):
    """Robustness under churn: a burst of short requests, a third aborted
    mid-flight, must all complete/abort cleanly with every slot EMPTY and the
    queue drained afterwards (no leaked tasks, no stuck phases)."""
    import asyncio as aio
    from chirrup_tpu.engine.engine import AsyncEngineCore as Engine
    from chirrup_tpu.engine.worker import SlotPhase

    loop = aio.new_event_loop()
    engine = Engine()
    cfg = synthetic_model_config(vocab_path)
    loop.run_until_complete(aio.wait_for(
        engine.init(worker_num=1, model_config=cfg, batch_size=4,
                    load_timeout=180), timeout=200))

    async def one(i):
        completion = engine.completion(
            f"hello world number {i} and some more words to prefill",
            temperature=1.0, top_p=0.9, max_tokens=6, stop_tokens=[0],
            presence_penalty=0.2, frequency_penalty=0.2)
        n = 0
        async for event in completion:
            if event[0] == "token":
                n += 1
                if i % 3 == 0 and n >= 1:
                    completion.abort()
        return completion.task

    async def go():
        return await aio.gather(*[one(i) for i in range(18)])

    try:
        tasks = loop.run_until_complete(aio.wait_for(go(), 240))
        assert all(t.is_finished() for t in tasks)
        aborted = sum(1 for t in tasks if t.request_status.name ==
                      "FINISHED_ABORTED")
        assert aborted >= 3  # the aborts actually took effect

        # drain: give the worker a moment to retire the last completions
        import time as _time
        for _ in range(100):
            w = engine.workers[0]
            if (all(s.phase == SlotPhase.EMPTY for s in w.slots)
                    and engine.task_queue.empty()):
                break
            _time.sleep(0.05)
        assert all(s.phase == SlotPhase.EMPTY for s in engine.workers[0].slots)
        assert engine.task_queue.empty()
    finally:
        engine.shutdown()
        engine.join(timeout=10)
        loop.close()
