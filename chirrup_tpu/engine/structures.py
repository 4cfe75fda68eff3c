"""Request/task structures for the serving engine.

Semantics mirror the reference engine's task model
(/root/reference/chirrup/core_structure.py): a Task is the unit of scheduling,
carrying prompt/prefill tokens, sampling parameters, stop/forbidden token sets,
prefix-cache options and its own output/event queues bridging the worker thread to
asyncio. States are host-side numpy snapshots (device residency is the worker's
business, not the task's).
"""

from __future__ import annotations

import dataclasses
import enum
import queue
import uuid
from collections import OrderedDict
from typing import Any, Dict, List, Optional, Sequence, Set

import numpy as np

FINISH_REASON_STRINGS = ("stop", "length", "abort")

# token 0 = <|endoftext|>, 261 = '\n\n', 24281 = '\n\nUser' in the world vocab
# (reference core_structure.py:15)
DEFAULT_STOP_TOKENS = (0, 261, 24281)

DEFAULT_SAMPLING_CONFIG = {
    "temperature": 1.0,
    "top_p": 0.3,
    "top_k": 0,
    "presence_penalty": 0.5,
    "frequency_penalty": 0.5,
    "penalty_decay": 0.996,
    "max_tokens": 8192,
}

# digits / whitespace token ids exempt from repetition penalties
# (reference worker.py:173)
NO_PENALTY_TOKEN_IDS = frozenset({33, 10, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58})


class FinishReason(enum.IntEnum):
    STOP = 0
    LENGTH = 1
    ABORT = 2

    def __str__(self):
        return FINISH_REASON_STRINGS[self.value]


class RequestStatus(enum.IntEnum):
    WAITING = enum.auto()
    RUNNING = enum.auto()
    FINISHED = enum.auto()
    FINISHED_STOPPED = enum.auto()
    FINISHED_LENGTH_CAPPED = enum.auto()
    FINISHED_ABORTED = enum.auto()

    def __str__(self):
        return self.name

    @staticmethod
    def is_finished(status: "RequestStatus") -> bool:
        return status > RequestStatus.FINISHED

    @staticmethod
    def get_finished_reason(status: "RequestStatus") -> Optional[FinishReason]:
        return _FINISHED_REASON_MAP.get(status)


_FINISHED_REASON_MAP = {
    RequestStatus.FINISHED_STOPPED: FinishReason.STOP,
    RequestStatus.FINISHED_LENGTH_CAPPED: FinishReason.LENGTH,
    RequestStatus.FINISHED_ABORTED: FinishReason.ABORT,
}


@dataclasses.dataclass
class RequestState:
    """Host-side snapshot of one request's recurrent state (the unit the prefix
    state-cache stores; reference keeps a 3-tensor list, rwkv7.py:224-235)."""

    shift: np.ndarray    # (L, 2, C)
    wkv: np.ndarray      # (L, N, H*N)
    elapsed: int

    def nbytes(self) -> int:
        return self.shift.nbytes + self.wkv.nbytes + 8


class StatePoolAllocator:
    """Thread-safe free-list over the rows of a worker's device state pool,
    plus an EVICTABLE registry: cache-held PoolHandles register here (the
    PrefixStateCache does it on insert and refreshes recency on hit) so the
    worker can revoke the least-recently-used cache row when a snapshot
    burst outruns LRU releases — instead of forfeiting the snapshot (the
    round-4 skip path measured 317 skips/120 s at 1.2x Poisson overload,
    each one lost cache reuse). Rows pinned by in-flight resumes
    (refs > 1) are never revoked; the skip path remains the fallback when
    every candidate is pinned."""

    def __init__(self, size: int):
        import threading

        self._lock = threading.Lock()
        self._free = list(range(size - 1, -1, -1))
        self.size = size
        # insertion order == eviction order (oldest first); refreshed on
        # cache hits via touch_evictable
        self._evictable: "OrderedDict[int, PoolHandle]" = OrderedDict()

    def alloc(self) -> Optional[int]:
        with self._lock:
            return self._free.pop() if self._free else None

    def free(self, row: int) -> None:
        with self._lock:
            self._free.append(row)

    def available(self) -> int:
        with self._lock:
            return len(self._free)

    # ------------------------------------------------- evictable registry

    def note_evictable(self, handle: "PoolHandle") -> None:
        """Register (or refresh) a cache-held handle as revocable-under-
        pressure. Called via PoolHandle.mark_evictable from the cache."""
        with self._lock:
            self._evictable.pop(id(handle), None)
            self._evictable[id(handle)] = handle

    def touch_evictable(self, handle: "PoolHandle") -> None:
        with self._lock:
            if id(handle) in self._evictable:
                self._evictable.move_to_end(id(handle))

    def evict_lru_and_alloc(self) -> Optional[int]:
        """Last-resort alloc: revoke the oldest revocable cache-held handle
        (its cache entry self-heals to a miss on next lookup) and take the
        freed row. Returns None only when every registered handle is pinned
        by an in-flight resume (or already dead) AND the free list stays
        empty — the caller then falls back to skipping the snapshot."""
        with self._lock:
            candidates = list(self._evictable.items())
        for key, h in candidates:
            if h.try_revoke():
                with self._lock:
                    self._evictable.pop(key, None)
                row = self.alloc()  # may lose a race to another alloc;
                if row is not None:  # keep evicting if so
                    return row
            elif not h.alive:
                # released or revoked through another path: prune the entry
                with self._lock:
                    self._evictable.pop(key, None)
        return None


@dataclasses.dataclass
class PoolHandle:
    """Reference to a DEVICE-resident prefix-state snapshot: one row of a
    worker's HBM state pool.

    The TPU-native replacement for host-RAM snapshots where it matters most:
    with INT8 weights there is HBM headroom, and a snapshot/resume becomes an
    on-device copy (~100us) instead of a 16.5MB device<->host round trip
    (which, through this environment's tunnel, measured ~6s each — and even
    on real PCIe hosts costs milliseconds of bus traffic per request).
    Refcounted: the cache holds one reference; each in-flight resume holds
    another, so LRU eviction cannot recycle a row a request still reads."""

    row: int
    worker_id: str
    allocator: StatePoolAllocator
    device_bytes: int = 0
    refs: int = 1
    # True once evict-on-exhaustion recycled the row out from under the
    # cache (only possible while refs == 1, i.e. nothing in flight reads
    # it); the cache drops revoked entries lazily at lookup
    revoked: bool = False

    @property
    def alive(self) -> bool:
        return self.refs > 0 and not self.revoked

    def acquire(self) -> "PoolHandle":
        """Assert-on-death acquire — ONLY for paths where the handle is
        provably alive (e.g. a ref already held). Anywhere that races with
        worker-side evict-on-exhaustion (the app's resume path) must use
        try_acquire instead."""
        with _POOL_HANDLE_LOCK:
            assert self.refs > 0 and not self.revoked, "acquire after free"
            self.refs += 1
        return self

    def try_acquire(self) -> bool:
        """acquire() that reports death instead of asserting — the app-side
        resume path races with worker-side evict-on-exhaustion (revocation
        needs refs == 1, exactly the cache-held-only window between a cache
        lookup and this acquire)."""
        with _POOL_HANDLE_LOCK:
            if self.revoked or self.refs <= 0:
                return False
            self.refs += 1
            return True

    def release(self) -> None:
        with _POOL_HANDLE_LOCK:
            if self.revoked:
                return  # the row was already recycled at revocation
            self.refs -= 1
            if self.refs == 0:
                self.allocator.free(self.row)

    def try_revoke(self) -> bool:
        """Evict-on-exhaustion: recycle the row NOW if the cache is the only
        holder (refs == 1). Pinned handles (an in-flight resume holds a
        second ref) and dead handles refuse."""
        with _POOL_HANDLE_LOCK:
            if self.revoked or self.refs != 1:
                return False
            self.revoked = True
            self.refs = 0
            self.allocator.free(self.row)
            return True

    def mark_evictable(self) -> None:
        """Called by the prefix cache when it stores this handle."""
        self.allocator.note_evictable(self)

    def touch_evictable(self) -> None:
        """Called by the prefix cache on a lookup hit (recency refresh)."""
        self.allocator.touch_evictable(self)

    def nbytes(self) -> int:
        return self.device_bytes  # accounted as device-pool bytes


import threading as _threading

_POOL_HANDLE_LOCK = _threading.Lock()


@dataclasses.dataclass
class Task:
    """One generation request moving through the engine."""

    output_queue: Any                  # ThreadSafeAsyncQueue-like (put_nowait)
    task_event_queue: queue.Queue      # abort channel (thread-safe)
    prompt_str: str
    prefill_tokens: List[int]
    state: Optional[RequestState]
    task_id: Optional[str] = None
    priority: int = 0

    temperature: float = DEFAULT_SAMPLING_CONFIG["temperature"]
    top_p: float = DEFAULT_SAMPLING_CONFIG["top_p"]
    top_k: int = DEFAULT_SAMPLING_CONFIG["top_k"]
    presence_penalty: float = DEFAULT_SAMPLING_CONFIG["presence_penalty"]
    frequency_penalty: float = DEFAULT_SAMPLING_CONFIG["frequency_penalty"]
    penalty_decay: float = DEFAULT_SAMPLING_CONFIG["penalty_decay"]
    max_tokens: Optional[int] = DEFAULT_SAMPLING_CONFIG["max_tokens"]

    stop_tokens: Sequence[int] = DEFAULT_STOP_TOKENS
    forbidden_tokens: Sequence[int] = ()

    cache_prefill: bool = False
    cache_prefill_padding: int = 0
    return_logits: bool = False

    request_status: RequestStatus = dataclasses.field(
        init=False, default=RequestStatus.WAITING)
    generated_tokens: List[int] = dataclasses.field(init=False, default_factory=list)
    decoded_texts: List[str] = dataclasses.field(init=False, default_factory=list)
    # TTFT attribution timestamps (time.time()): "enqueue" (interface submit),
    # "admit" (worker slot fill), "first_token" (first sampled token read) —
    # lets /metrics decompose the TTFT tail into queue-wait vs prefill+decode
    timing: Dict[str, float] = dataclasses.field(init=False,
                                                 default_factory=dict)

    def __post_init__(self):
        if self.task_id is None:
            self.task_id = str(uuid.uuid4())
        self.stop_tokens = set(self.stop_tokens)

    def is_finished(self) -> bool:
        return RequestStatus.is_finished(self.request_status)


@dataclasses.dataclass
class ModelLoadConfig:
    """What the worker needs to load and run a model."""

    model_path: str
    vocab_path: str
    vocab_size: int = 65536
    head_size: int = 64
    # runtime knobs
    quantization: Optional[str] = "int8"   # None | "int8"
    wkv_state_dtype: str = "bfloat16"      # "float32" | "bfloat16" (fp16 unsupported by Mosaic on TPU)
    activation_dtype: str = "bfloat16"
    use_pallas_wkv: bool = True
    prefill_chunk: int = 64
    # tensor parallelism: >1 shards the model (head-parallel WKV, Megatron
    # col/row mm8) over a tp-axis mesh built inside the worker's model factory
    tensor_parallel: int = 1
    # lockstep multi-host SPMD serving: the mesh gains a dp axis spanning the
    # jax.distributed processes, the batch shards over it, and the worker runs
    # the fixed lockstep program sequence over its own slot rows
    # (docs/ARCHITECTURE.md §multi-host). Requires jax.distributed.initialize
    # before engine init on every host; per-host HBM pool cache supported.
    lockstep: bool = False
    # test hook: synthetic model instead of a checkpoint file
    synthetic_config: Optional[Dict[str, int]] = None
    # test hooks: run Pallas kernels in interpret mode / pin the mm8 core —
    # lets CPU tests drive the EXACT TPU numeric stack through the engine
    interpret_pallas: bool = False
    mm8_core: Optional[str] = None
