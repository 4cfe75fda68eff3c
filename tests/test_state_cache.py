"""Prefix state cache: trie walk, LRU eviction with branch pruning, prefill dedup."""

import asyncio

import numpy as np
import pytest

from chirrup_tpu.engine.state_cache import PrefixStateCache
from chirrup_tpu.engine.structures import RequestState


def _state(tag: int) -> RequestState:
    return RequestState(shift=np.full((1, 2, 4), tag, np.float32),
                        wkv=np.full((1, 4, 8), tag, np.float32), elapsed=tag)


def test_check_walk_semantics():
    """Mirrors the reference's doctest scenario (state_cache.py:218-235)."""
    c = PrefixStateCache(max_size=3)
    c.cache([1, 2, 3, 4], _state(1))
    c.cache([1, 2, 3, 4, 5, 6, 7], _state(2))
    c.cache([1, 2, 3, 6, 5, 6, 7, 8], _state(3))

    rem, st, n = c.check([1, 2, 3, 4])
    assert (rem, st, n) == ([1, 2, 3, 4], None, 0)  # full match is never returned
    rem, st, n = c.check([1, 2, 3, 4, 5])
    assert rem == [5] and st.elapsed == 1 and n == 4
    rem, st, n = c.check([1, 2, 3, 4, 5, 6, 7])
    assert rem == [5, 6, 7] and st.elapsed == 1
    rem, st, n = c.check([1, 2, 3, 4, 5, 6, 7, 8])
    assert rem == [8] and st.elapsed == 2
    rem, st, n = c.check([1, 2, 3, 6, 5])
    assert rem == [1, 2, 3, 6, 5] and st is None
    rem, st, n = c.check([1, 2, 3, 6, 5, 6, 7, 8, 9])
    assert rem == [9] and st.elapsed == 3


def test_lru_eviction_prunes_branch():
    c = PrefixStateCache(max_size=2)
    c.cache([1, 2, 3], _state(1))
    c.cache([9, 8], _state(2))
    c.cache([5, 5, 5], _state(3))  # evicts [1,2,3]
    rem, st, n = c.check([1, 2, 3, 4])
    assert st is None
    assert 1 not in c.root.children  # branch pruned
    rem, st, n = c.check([9, 8, 7])
    assert st.elapsed == 2
    assert len(c) == 2


def test_eviction_keeps_shared_prefix():
    c = PrefixStateCache(max_size=2)
    c.cache([1, 2], _state(1))
    c.cache([1, 2, 3, 4], _state(2))
    c.cache([7], _state(3))  # evicts [1,2] — but [1,2,3,4] passes through it
    rem, st, n = c.check([1, 2, 9])
    assert st is None  # [1,2] itself no longer cached
    rem, st, n = c.check([1, 2, 3, 4, 5])
    assert st.elapsed == 2  # deeper entry survives


def test_remove():
    c = PrefixStateCache(max_size=5)
    c.cache([1, 2, 3], _state(1))
    assert c.remove([1, 2, 3])
    assert not c.remove([1, 2, 3])
    assert c.check([1, 2, 3, 4])[1] is None
    assert not c.root.children


def test_total_bytes():
    c = PrefixStateCache(max_size=5)
    c.cache([1], _state(1))
    assert c.total_bytes() == _state(1).nbytes()


def test_prefill_dedup():
    """Leader claims; follower suspends; cache+wake resumes the follower with the
    leader's state (reference state_cache.py:85-136)."""

    async def go():
        c = PrefixStateCache(max_size=5)
        tokens = [1, 2, 3, 4, 5, 6]
        pad = 2

        # leader claims
        rem, st, n = await c.check_and_wait_prefill(tokens, pad)
        assert st is None and rem == tokens

        results = {}

        async def follower():
            results["follower"] = await c.check_and_wait_prefill(list(tokens), pad)

        ftask = asyncio.create_task(follower())
        await asyncio.sleep(0.05)
        assert not ftask.done()  # suspended on the leader's condition

        # leader's prefill lands
        node = c.cache(tokens[:-pad], _state(9), return_trie_node=True)
        await c.awake_hang_up_prefills(node)
        await asyncio.wait_for(ftask, timeout=5)

        rem2, st2, n2 = results["follower"]
        assert rem2 == tokens[-pad:]
        assert st2.elapsed == 9
        assert n2 == len(tokens) - pad

        # third request (after caching): plain hit, no waiting
        rem3, st3, n3 = await c.check_and_wait_prefill(list(tokens), pad)
        assert rem3 == tokens[-pad:] and st3.elapsed == 9

    asyncio.run(asyncio.wait_for(go(), timeout=20))


def test_prefill_dedup_padding_zero():
    """Regression (found live at B=384 under Poisson load): with
    cache_prefill_padding == 0 the worker's snapshot key is tokens[:-1] (the
    final token stays pending as the first decode input), but the old
    follower lookup used tuple(tokens) and the old claim sat on the
    full-depth node — so the cache event never woke followers and every
    dedup'd repeat re-prefilled from scratch (a measured 0% hit rate while
    the server was actually deduping). Both must use len - max(pad, 1)."""

    async def go():
        c = PrefixStateCache(max_size=5)
        tokens = [1, 2, 3, 4, 5, 6]

        rem, st, n = await c.check_and_wait_prefill(tokens, 0)
        assert st is None and rem == tokens  # leader

        results = {}

        async def follower():
            results["f"] = await c.check_and_wait_prefill(list(tokens), 0)

        ftask = asyncio.create_task(follower())
        await asyncio.sleep(0.05)
        assert not ftask.done()

        # the leader's snapshot lands at its REAL boundary: tokens[:-1]
        node = c.cache(tokens[:-1], _state(7), return_trie_node=True)
        woken = await c.awake_hang_up_prefills(node)
        assert woken, "cache event must find the claimed node (same depth)"
        await asyncio.wait_for(ftask, timeout=5)

        rem2, st2, n2 = results["f"]
        assert rem2 == tokens[-1:] and st2.elapsed == 7 and n2 == 5
        # follower resume is accounted as a hit, not a miss
        assert c.hits == 1 and c.misses == 1  # leader missed, follower hit
        # a request whose prefix is already at the boundary doesn't lead
        rem3, st3, n3 = await c.check_and_wait_prefill(list(tokens), 0)
        assert rem3 == tokens[-1:] and st3.elapsed == 7

    asyncio.run(asyncio.wait_for(go(), timeout=20))


def test_prefill_full_hit_short_circuits():
    async def go():
        c = PrefixStateCache(max_size=5)
        tokens = [4, 5, 6, 7]
        c.cache(tokens[:-1], _state(1))
        rem, st, n = await c.check_and_wait_prefill(tokens, 1)
        assert rem == [7] and st.elapsed == 1 and n == 3

    asyncio.run(asyncio.wait_for(go(), timeout=10))


def test_abandoned_leader_releases_followers():
    """Regression: a prefill leader that dies before caching (client abort,
    worker crash) must not deadlock later identical prompts. The handler
    releases the claim via awake_hang_up_prefills; followers then take the
    leader-failed path and prefill themselves."""
    import asyncio

    from chirrup_tpu.engine.state_cache import PrefixStateCache

    async def go():
        c = PrefixStateCache(max_size=4)
        tokens = [5, 6, 7, 8]

        rem, st, n, claim = await c.check_and_wait_prefill(
            list(tokens), 0, return_claim=True)
        assert claim is not None and st is None  # we lead

        async def follower():
            return await asyncio.wait_for(
                c.check_and_wait_prefill(list(tokens), 0, return_claim=True),
                timeout=30)

        task = asyncio.create_task(follower())
        await asyncio.sleep(0.05)  # let the follower block on the Condition
        assert not task.done()

        # the leader dies WITHOUT caching; its handler releases the claim
        assert await c.release_claim(claim) is True
        rem2, st2, n2, claim2 = await task
        assert st2 is None and list(rem2) == tokens  # prefill ourselves
        # a woken follower does NOT re-claim (it proceeds leaderless; the next
        # NEW request for this prefix becomes the leader)
        assert claim2 is None

        # releasing twice is harmless (idempotent)
        assert await c.release_claim(claim) is False

        # a STALE claim must not clobber a newer leader on the same node:
        # new request claims the node after the release above...
        rem3, st3, n3, claim3 = await c.check_and_wait_prefill(
            list(tokens), 0, return_claim=True)
        assert claim3 is not None
        # ...the old (already-released) claim is a no-op...
        assert await c.release_claim(claim) is False
        assert claim3[0].prefill_condition is claim3[1]  # B's claim intact
        # ...and the new claimant releases its own fine
        assert await c.release_claim(claim3) is True

    asyncio.run(asyncio.wait_for(go(), timeout=60))


def test_check_falls_back_to_shallower_prefix_after_revocation():
    """A revoked device-pool entry (evict-on-exhaustion) self-heals at
    lookup; check() must RE-WALK and find the next-shallower cached prefix
    instead of reporting a total miss (round-5 review finding)."""
    from chirrup_tpu.engine.structures import PoolHandle, StatePoolAllocator

    alloc = StatePoolAllocator(2)
    cache = PrefixStateCache(max_size=10)
    h1 = PoolHandle(row=alloc.alloc(), worker_id="w", allocator=alloc,
                    device_bytes=10)
    cache.cache((1, 2), h1)
    h2 = PoolHandle(row=alloc.alloc(), worker_id="w", allocator=alloc,
                    device_bytes=10)
    cache.cache((1, 2, 3, 4), h2)

    assert h2.try_revoke()
    remaining, st, n = cache.check([1, 2, 3, 4, 5])
    assert st is h1 and n == 2           # shallower prefix, not a miss
    assert remaining == [3, 4, 5]
    # the dead deep entry is pruned (second lookup walks clean)
    assert cache.check([1, 2, 3, 4, 5])[2] == 2


def test_check_returns_node_at_cached_depth():
    """check(return_trie_node=True) must return the node AT the cached
    depth (root on a miss): check_and_wait_prefill grafts the claim path
    tokens[best:eff] under it, and a walk-stop node deeper than (or
    diverged from) the cached prefix grafted detached claim paths whose
    cache-event wake never found the followers (round-5 review finding)."""
    cache = PrefixStateCache(max_size=10)
    cache.cache((1, 2, 3, 4), _state(1))

    # query diverging after depth 2 (the walk descends the refcounted trie
    # path to depth 2 before the mismatch): graft node must be ROOT
    _, st, n, node = cache.check([1, 2, 9, 9], return_trie_node=True)
    assert st is None and n == 0
    assert node is cache.root

    # exact-prefix query: node at depth 4
    _, st, n, node = cache.check([1, 2, 3, 4, 5], return_trie_node=True)
    assert n == 4 and st is not None
    assert node is cache._find((1, 2, 3, 4))


def test_cache_event_prepends_resumed_prefix():
    """A resumed-from-cache request prefills only the SUFFIX; its snapshot
    event must be cached under resumed_prefix + prefilled — a suffix-only
    key would poison the cache (a later prompt genuinely starting with the
    suffix would resume a state secretly containing the prefix).
    Round-5 review finding on server/app._cache_event."""
    from chirrup_tpu.server.app import _cache_event

    cache = PrefixStateCache(max_size=4)
    st = _state(7)
    asyncio.run(_cache_event(
        cache, {"state": st, "prefilled_tokens": (5, 6)}, (1, 2, 3)))
    # full-key lookup hits...
    _, got, n = cache.check([1, 2, 3, 5, 6, 9])
    assert got is st and n == 5
    # ...and no orphan suffix-only entry exists
    assert cache.check([5, 6, 9])[1] is None
