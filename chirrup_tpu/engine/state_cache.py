"""Server-side prefix state cache: token trie + LRU over host state snapshots.

RWKV-7's recurrent state is O(1) in sequence length, so caching the state after a
prompt prefix makes any request sharing that prefix skip its prefill entirely — the
RWKV analogue of prefix KV-cache reuse. Semantics follow the reference
(/root/reference/chirrup/utils/state_cache.py:10-215):

- check(tokens) walks the trie and returns the deepest cached prefix strictly shorter
  than the query (generation always needs >=1 token to forward);
- check_and_wait_prefill() additionally deduplicates concurrent identical prefills:
  the first request claims the path (installs an asyncio.Condition), followers
  suspend until the leader's snapshot lands, then resume from the cache;
- cache() refcounts trie nodes so LRU eviction prunes exactly the branch that no
  remaining entry depends on.

Snapshots are host numpy RequestStates (device transfer is the worker's job), so
cache capacity is bounded by host RAM, not HBM.
"""

from __future__ import annotations

import asyncio
from collections import OrderedDict
from typing import Dict, List, Optional, Tuple

from chirrup_tpu.engine.structures import RequestState


def _release(state) -> None:
    """Drop the cache's reference to an evicted/replaced snapshot. Device-pool
    handles (structures.PoolHandle) are refcounted — releasing recycles the
    HBM row once no in-flight resume still reads it; host RequestStates are
    plain numpy and need nothing."""
    rel = getattr(state, "release", None)
    if rel is not None:
        rel()


class _TrieNode:
    __slots__ = ("children", "has_state", "refcount", "prefill_condition")

    def __init__(self):
        self.children: Dict[int, _TrieNode] = {}
        self.has_state = False
        self.refcount = 0
        self.prefill_condition: Optional[asyncio.Condition] = None


class PrefixStateCache:
    def __init__(self, max_size: int = 100):
        if max_size <= 0:
            raise ValueError("max_size must be positive")
        self.max_size = max_size
        self.root = _TrieNode()
        self._lru: "OrderedDict[Tuple[int, ...], RequestState]" = OrderedDict()
        self.prefill_lock = asyncio.Lock()
        # lookup accounting (served via /metrics): hits = lookups that found
        # a usable cached prefix; tokens_saved = prompt tokens those lookups
        # did not have to prefill
        self.hits = 0
        self.misses = 0
        self.tokens_saved = 0

    # ------------------------------------------------------------------ stats

    def __len__(self) -> int:
        return len(self._lru)

    def total_bytes(self) -> int:
        return sum(s.nbytes() for s in self._lru.values())

    def stats(self) -> Dict[str, int]:
        return {"entries": len(self._lru), "bytes": self.total_bytes(),
                "hits": self.hits, "misses": self.misses,
                "tokens_saved": self.tokens_saved}

    # ------------------------------------------------------------------ check

    def check(self, tokens: List[int], return_trie_node: bool = False):
        """Longest cached proper prefix of `tokens`.

        Returns (remaining_tokens, state_or_None, cached_len[, deepest_node]).

        The walk RETRIES when the deepest entry turns out dead (a device-pool
        row revoked by evict-on-exhaustion: _lru_get self-heals it to a miss
        and prunes its trie path) — the re-walk then finds the next-shallower
        cached prefix instead of reporting a total miss, and the returned
        node matches the re-walked depth (a stale deep node would graft
        claim paths under a pruned branch). Each failed pass removes at
        least one dead entry, so this terminates."""
        while True:
            node = self.root
            best = 0
            best_node = self.root
            i = 0
            while i < len(tokens):
                if node.has_state:
                    best = i
                    best_node = node
                child = node.children.get(tokens[i])
                if child is None or (child.refcount == 0
                                     and not child.prefill_condition):
                    break
                node = child
                i += 1

            state = self._lru_get(tuple(tokens[:best])) if best else None
            if best == 0 or state is not None:
                break

        if state is None:
            best = 0
            best_node = self.root
            remaining = tokens
            self.misses += 1
        else:
            remaining = tokens[best:]
            self.hits += 1
            self.tokens_saved += best
        # NOTE: the returned node is the node AT DEPTH `best` (root on a
        # miss) — check_and_wait_prefill grafts the claim path
        # tokens[best:eff] under it, so a walk-stop node deeper than (or
        # diverged from) the cached prefix would graft a detached garbage
        # path whose cache-event wake never finds the followers
        if return_trie_node:
            return remaining, state, best, best_node
        return remaining, state, best

    async def check_and_wait_prefill(self, tokens: List[int],
                                     cache_prefill_padding: int,
                                     return_claim: bool = False,
                                     can_lead: bool = True):
        """check() + dedup of concurrent identical prefills
        (reference state_cache.py:85-124).

        return_claim=True additionally returns a (node, condition) pair this
        caller CLAIMED as prefill leader (None otherwise). The caller MUST
        release the claim via release_claim() when its request ends — normally
        the cache-snapshot event does it (awake_hang_up_prefills), but an
        aborted/crashed leader never caches, and an unreleased claim deadlocks
        every later identical prompt (they wait on a Condition nobody will
        notify; the reference leaks this the same way). release_claim compares
        the Condition identity, so a slow leader finishing AFTER its snapshot
        already released the node cannot clobber a newer leader's claim on the
        same node."""
        def ret(res, claim=None):
            return (*res, claim) if return_claim else res

        async with self.prefill_lock:
            remaining, state, cached_len, node = self.check(tokens,
                                                            return_trie_node=True)
            # the snapshot a leader will produce ends max(padding, 1) tokens
            # before the prompt end (padding 0 still leaves the final token
            # as the first decode input — worker pad() clamps to 0), so both
            # the claim node and the follower lookup must use THIS boundary;
            # claiming the full-depth node for padding 0 meant the cache
            # event (which wakes the snapshot-key node) never woke followers
            eff = len(tokens) - max(cache_prefill_padding, 1)
            if cached_len >= eff:
                return ret((remaining, state, cached_len))  # nothing to lead

            # claim (or find) the node at the cacheable boundary
            boundary = tokens[cached_len:eff]
            for token in boundary:
                child = node.children.get(token)
                if child is None:
                    child = _TrieNode()
                    node.children[token] = child
                node = child
            if node.prefill_condition is None:
                if not can_lead:
                    # this request will never snapshot (cache_prefill off) —
                    # claiming leadership would make identical concurrent
                    # prompts wait out its ENTIRE generation before prefilling
                    # themselves
                    return ret((remaining, state, cached_len))
                node.prefill_condition = asyncio.Condition()
                return ret((remaining, state, cached_len),
                           claim=(node, node.prefill_condition))  # leader

        # follower: wait for the leader's snapshot
        async with node.prefill_condition:
            await node.prefill_condition.wait()
        # the leader's snapshot key is its prompt MINUS max(padding, 1)
        # tokens: the worker snapshots with `padding` tokens un-prefilled,
        # except padding 0 where the boundary lands with the final token
        # still pending as the first decode input (worker pad() clamps to 0).
        # The old `tuple(tokens)` lookup for padding 0 missed the leader's
        # tokens[:-1] entry EVERY time — under load (repeats arriving while
        # the leader is in flight) the dedup silently degraded to full
        # re-prefills and a measured 0% hit rate.
        eff = len(tokens) - max(cache_prefill_padding, 1)
        cached = self._lru_get(tuple(tokens[:eff])) if eff > 0 else None
        if cached is not None:
            # check() counted this lookup as a MISS before the wait; a
            # successful follower resume IS a cache hit
            self.misses -= 1
            self.hits += 1
            self.tokens_saved += eff
            return ret((tokens[eff:], cached, eff))
        return ret((remaining, state, cached_len))  # leader failed; we prefill

    async def release_claim(self, claim) -> bool:
        """Release a leader claim from check_and_wait_prefill(return_claim=True)
        if it is still installed. claim: (node, condition). No-op when the
        node's condition is None (cache event already released it) or a
        DIFFERENT Condition (a newer leader re-claimed the node after this
        claimant's release — clearing that one would wake its followers
        prematurely into a thundering herd)."""
        if claim is None:
            return False
        node, condition = claim
        if node.prefill_condition is not condition:
            return False
        return await self.awake_hang_up_prefills(node)

    async def awake_hang_up_prefills(self, node: _TrieNode) -> bool:
        """Wake followers waiting on a just-cached prefix
        (reference state_cache.py:126-136)."""
        if node is None or node.prefill_condition is None:
            return False
        async with node.prefill_condition:
            node.prefill_condition.notify_all()
        node.prefill_condition = None
        return True

    # ------------------------------------------------------------------ cache

    def cache(self, tokens, state: RequestState, return_trie_node: bool = False):
        """Insert a snapshot; evict LRU (pruning its now-unreferenced branch)."""
        tokens = tuple(tokens)
        if not tokens:
            return None

        if tokens in self._lru:
            old = self._lru[tokens]
            if old is not state:
                _release(old)
            self._lru.move_to_end(tokens)
            self._lru[tokens] = state
            node = self._find(tokens)
        else:
            node = self.root
            self.root.refcount += 1
            for token in tokens:
                child = node.children.get(token)
                if child is None:
                    child = _TrieNode()
                    node.children[token] = child
                child.refcount += 1
                node = child
            node.has_state = True
            self._lru[tokens] = state
            if len(self._lru) > self.max_size:
                old_key, old_state = self._lru.popitem(last=False)
                _release(old_state)
                self._remove_path(old_key)
        mark = getattr(state, "mark_evictable", None)
        if mark is not None:
            mark()  # device-pool row: revocable under snapshot pressure

        if return_trie_node:
            return node
        return None

    def remove(self, tokens) -> bool:
        tokens = tuple(tokens)
        if tokens not in self._lru:
            return False
        _release(self._lru.pop(tokens))
        self._remove_path(tokens)
        return True

    # ---------------------------------------------------------------- private

    def _lru_get(self, key: Tuple[int, ...]) -> Optional[RequestState]:
        state = self._lru.get(key)
        if state is None:
            return None
        if getattr(state, "revoked", False):
            # a device-pool row recycled by evict-on-exhaustion (the worker
            # revoked the LRU cache-held row under snapshot pressure): the
            # entry self-heals to a miss here
            self._lru.pop(key)
            self._remove_path(key)
            return None
        self._lru.move_to_end(key)
        touch = getattr(state, "touch_evictable", None)
        if touch is not None:
            touch()  # keep the allocator's eviction order == this LRU order
        return state

    def _find(self, tokens) -> Optional[_TrieNode]:
        node = self.root
        for t in tokens:
            node = node.children.get(t)
            if node is None:
                return None
        return node

    def _remove_path(self, tokens: Tuple[int, ...]):
        self.root.refcount -= 1
        node = self.root
        path = []
        for t in tokens:
            child = node.children.get(t)
            if child is None:
                return
            path.append((node, t, child))
            child.refcount -= 1
            node = child
        node.has_state = False
        # prune from the leaf up: a node with refcount 0 serves no remaining entry
        for parent, token, child in reversed(path):
            if child.refcount <= 0 and not child.children \
                    and not child.prefill_condition:
                del parent.children[token]
            else:
                break
