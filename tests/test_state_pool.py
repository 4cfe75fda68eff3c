"""Device-resident prefix-state pool: snapshot/resume as on-device copies.

The TPU-native replacement for host-RAM snapshots (16.5MB device<->host per
snapshot at 7.2B; INT8 weights leave HBM headroom for ~50 rows). Covers: the
store/load roundtrip is bit-exact vs the host path, handles are refcounted so
LRU eviction cannot recycle an in-flight row, and the engine serves identical
greedy tokens through a pool resume."""

import asyncio
import queue

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chirrup_tpu.models.config import RWKV7Config, RuntimeConfig
from chirrup_tpu.models.loader import synthetic_params
from chirrup_tpu.engine.serving import ServingModel
from chirrup_tpu.engine.structures import PoolHandle, StatePoolAllocator
from chirrup_tpu.engine.state_cache import PrefixStateCache
from tests.engine_fixtures import write_tiny_vocab, synthetic_model_config

CFG = RWKV7Config(n_layer=2, n_embd=128, vocab_size=300,
                  d_decay_lora=32, d_iclr_lora=32, d_v_lora=16, d_gate_lora=32)


def _model(batch=4):
    params = synthetic_params(CFG, seed=7)
    rt = RuntimeConfig(activation_dtype=jnp.float32,
                       wkv_state_dtype=jnp.float32,
                       quantization=None, use_pallas_wkv=False)
    return ServingModel(CFG, params, rt, batch_size=batch)


def test_pool_store_load_roundtrip_bitexact():
    model = _model()
    carry = model.init_carry()
    pool = model.init_state_pool(3)
    toks = np.array([5, 6, 7, 8], np.int32)
    for _ in range(3):
        carry, _, _ = model.decode_step(carry, toks, np.ones(4, bool),
                                        np.ones(4, bool))
    ref = model.extract_slot(carry, 1)          # host snapshot of slot 1
    pool = model.pool_store(carry, pool, 1, 2)  # device snapshot -> row 2
    carry = model.pool_load(carry, pool, 2, 3)  # row 2 -> slot 3
    got = model.extract_slot(carry, 3)
    np.testing.assert_array_equal(np.asarray(ref.shift), np.asarray(got.shift))
    np.testing.assert_array_equal(np.asarray(ref.wkv), np.asarray(got.wkv))
    assert ref.elapsed == got.elapsed


def test_pool_handle_refcount_and_cache_eviction():
    alloc = StatePoolAllocator(2)
    cache = PrefixStateCache(max_size=1)

    def handle():
        return PoolHandle(row=alloc.alloc(), worker_id="w0", allocator=alloc,
                          device_bytes=100)

    h1 = handle()
    cache.cache((1, 2), h1)
    assert alloc.available() == 1
    h2 = handle()
    cache.cache((3, 4), h2)            # evicts h1 -> row recycled
    assert alloc.available() == 1
    assert h1.refs == 0

    # an in-flight resume holds the row across eviction
    h2.acquire()
    h3 = PoolHandle(row=alloc.alloc(), worker_id="w0", allocator=alloc,
                    device_bytes=100)
    cache.cache((5, 6), h3)            # evicts h2: cache ref drops...
    assert h2.refs == 1                # ...but the resume's ref remains
    assert alloc.available() == 0
    h2.release()                       # resume done -> row freed
    assert alloc.available() == 1


def test_evict_on_exhaustion_revokes_lru_cache_row():
    """Pool exhausted under a snapshot burst: the allocator revokes the
    cache's LRU pool-backed entry (recency mirrors the cache's own LRU via
    touch-on-hit), the dead entry self-heals to a miss at the next lookup,
    and rows pinned by in-flight resumes are never revoked (the skip path's
    only remaining trigger — round-4 VERDICT item 4)."""
    alloc = StatePoolAllocator(2)
    cache = PrefixStateCache(max_size=10)

    h1 = PoolHandle(row=alloc.alloc(), worker_id="w0", allocator=alloc,
                    device_bytes=100)
    cache.cache((1, 2), h1)
    h2 = PoolHandle(row=alloc.alloc(), worker_id="w0", allocator=alloc,
                    device_bytes=100)
    cache.cache((3, 4), h2)
    assert alloc.available() == 0 and alloc.alloc() is None

    # a lookup hit refreshes recency: (1, 2) becomes MRU, so h2 is the victim
    _, st, n = cache.check([1, 2, 9])
    assert st is h1 and n == 2

    row = alloc.evict_lru_and_alloc()
    assert row == h2.row
    assert h2.revoked and not h2.alive
    assert not h2.try_acquire()          # the app's resume acquire loses
    # the cache self-heals the dead entry to a miss
    _, st, n = cache.check([3, 4, 9])
    assert st is None and n == 0
    # ...and releasing the revoked handle later (LRU eviction) cannot
    # double-free the row
    before = alloc.available()
    h2.release()
    assert alloc.available() == before

    # pinned handles refuse revocation: h1 has an in-flight resume
    alloc.free(row)
    assert h1.try_acquire()
    assert alloc.alloc() is not None     # drain the free list again
    assert alloc.evict_lru_and_alloc() is None   # h1 pinned, h2 pruned
    h1.release()                         # resume lands
    assert alloc.evict_lru_and_alloc() == h1.row


def test_engine_pool_resume_matches_uncached(tmp_path):
    """Greedy generation resumed from a POOL snapshot == uncached generation,
    end to end through the engine (the pool analogue of
    test_engine.test_resume_from_state)."""
    from chirrup_tpu.engine.engine import AsyncEngineCore

    vocab = write_tiny_vocab(str(tmp_path / "vocab.txt"))
    loop = asyncio.new_event_loop()
    engine = AsyncEngineCore()
    cfg = synthetic_model_config(vocab)
    loop.run_until_complete(asyncio.wait_for(
        engine.init(worker_num=1, model_config=cfg, batch_size=4,
                    load_timeout=180, state_pool_size=4), timeout=200))
    try:
        prompt = "hello world the Assistant says hello world again and again"

        async def go():
            ids = engine.tokenizer.encode(prompt)
            c1 = engine.completion(prompt, prefill_tokens=list(ids),
                                   temperature=0.0, max_tokens=4,
                                   stop_tokens=[0], cache_prefill=True,
                                   cache_prefill_padding=3,
                                   presence_penalty=0.0, frequency_penalty=0.0)
            snapshot, toks1 = None, []
            async for event in c1:
                if event[0] == "cache_prefill":
                    snapshot = event[1]
                elif event[0] == "token":
                    toks1.append(event[1])
            assert isinstance(snapshot["state"], PoolHandle), snapshot
            c2 = engine.completion(prompt, prefill_tokens=list(ids[-3:]),
                                   state=snapshot["state"], temperature=0.0,
                                   max_tokens=4, stop_tokens=[0],
                                   presence_penalty=0.0, frequency_penalty=0.0)
            toks2 = []
            async for event in c2:
                if event[0] == "token":
                    toks2.append(event[1])
            return toks1, toks2, snapshot["state"]

        toks1, toks2, handle = loop.run_until_complete(
            asyncio.wait_for(go(), 120))
        assert toks1 == toks2
        assert handle.refs == 0  # released by the worker after the load
    finally:
        engine.shutdown()
        engine.join()
        loop.close()


def test_lockstep_pool_cache_roundtrip(tmp_path):
    """Lockstep (single-process mesh): snapshots ride the fixed per-loop
    pool-store program, resumes ride the vote-coordinated pool-load round —
    greedy tokens match the uncached generation."""
    from chirrup_tpu.engine.engine import AsyncEngineCore

    vocab = write_tiny_vocab(str(tmp_path / "vocab.txt"))
    loop = asyncio.new_event_loop()
    engine = AsyncEngineCore()
    cfg = synthetic_model_config(
        vocab, tensor_parallel=2, lockstep=True,
        synthetic_config=dict(n_layer=2, n_embd=128, vocab_size=320,
                              d_decay_lora=32, d_iclr_lora=32, d_v_lora=16,
                              d_gate_lora=32))
    loop.run_until_complete(asyncio.wait_for(
        engine.init(worker_num=1, model_config=cfg, batch_size=4,
                    load_timeout=180, decode_block_size=2,
                    state_pool_size=4), timeout=200))
    try:
        prompt = "hello world the Assistant says hello world again and again"

        async def go():
            ids = engine.tokenizer.encode(prompt)
            base = dict(temperature=0.0, max_tokens=4, stop_tokens=[0],
                        presence_penalty=0.0, frequency_penalty=0.0)
            c1 = engine.completion(prompt, prefill_tokens=list(ids),
                                   cache_prefill=True,
                                   cache_prefill_padding=3, **base)
            snapshot, toks1 = None, []
            async for event in c1:
                if event[0] == "cache_prefill":
                    snapshot = event[1]
                elif event[0] == "token":
                    toks1.append(event[1])
            assert snapshot is not None and isinstance(
                snapshot["state"], PoolHandle)
            c2 = engine.completion(prompt, prefill_tokens=list(ids[-3:]),
                                   state=snapshot["state"], **base)
            toks2 = []
            async for event in c2:
                if event[0] == "token":
                    toks2.append(event[1])
            return toks1, toks2

        toks1, toks2 = loop.run_until_complete(asyncio.wait_for(go(), 180))
        assert toks1 == toks2
    finally:
        engine.shutdown()
        engine.join()
        loop.close()
