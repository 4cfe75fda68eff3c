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
