"""Continuous-batching worker: one thread driving one device (group).

Behavioral port of the reference scheduler (/root/reference/chirrup/worker.py:107-903)
re-designed for XLA:

- slots are never physically reordered: the reference's min-swap slot compaction
  (worker.py:43-78, 304-383) exists so CUDA kernels see contiguous category slices;
  here the jitted decode/prefill programs take boolean masks over a fixed-size batch,
  so a slot's position never changes and nothing is copied;
- every loop runs at most one decode_step (all decode + one-by-one-prefill slots)
  and, on a 1:N countdown, one prefill_step (all bulk-prefill slots, per-slot ragged
  lengths) — the same decode/prefill interleave policy as the reference
  (worker.py:846-856) without its min-length re-batching;
- per-request lifecycle, prefix-cache snapshot points, penalty semantics, stop/abort
  handling and telemetry match the reference event-for-event.
"""

from __future__ import annotations

import dataclasses
import enum
import os
import queue
import threading
import time
from collections import deque
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np
import jax

from chirrup_tpu.engine.structures import (
    PoolHandle, RequestStatus, StatePoolAllocator, Task, RequestState)
from chirrup_tpu.engine.serving import ServingModel
from chirrup_tpu.utils.tokenizer import WorldTokenizer, StreamingDecoder


class SlotPhase(enum.IntEnum):
    EMPTY = 0
    SEQ_PREFILL = 1   # bulk chunked prefill (reference FORWARD_SEQ)
    ONE_PREFILL = 2   # token-by-token tail prefill (reference FORWARD_ONE_PREFILL)
    DECODE = 3        # sampling (reference FORWARD_ONE_DECODE)
    FINISHED = 4


@dataclasses.dataclass
class SlotData:
    task: Optional[Task] = None
    phase: SlotPhase = SlotPhase.EMPTY
    next_input: Optional[int] = None
    prefilled_tokens: List[int] = dataclasses.field(default_factory=list)
    prefill_cached: bool = False
    snapshot_queued: bool = False  # lockstep: waiting for its extract turn
    decoder: Optional[StreamingDecoder] = None
    # True once the slot's decode input comes from the device-side feedback
    # (BatchCarry.last_sampled) instead of a host-provided token
    use_feedback: bool = False


    def pad(self) -> int:
        return max(self.task.cache_prefill_padding - 1, 0) if self.task else 0


@dataclasses.dataclass
class _PendingStep:
    """A dispatched decode step/block whose sampled tokens have not been read yet."""

    sampled: Any         # (B,) for single steps, (K, B) for blocks
    raw_logits: Any      # (B, V) for single steps, None for blocks
    decode_slots: List[Tuple[int, str]]  # (slot index, task_id at dispatch)
    block: int = 1       # number of steps this dispatch covered
    stop_count: Any = None  # () i32 cross-host shutdown-vote sum (blocks only)
    marked_logits: Any = None  # (K, n_dp*M, V) per-step logits of MARKED rows
    marks: Optional[Dict[int, int]] = None  # slot idx -> global mark row


class Worker:
    """Runs the continuous-batching loop in its own thread."""

    def __init__(self, worker_id: str,
                 model_factory: Callable[[], Tuple[ServingModel, WorldTokenizer]],
                 task_queue: "queue.Queue[Task]",
                 master_event_queue: queue.Queue,
                 worker_event_queue: Any,
                 batch_size: int = 32,
                 min_forward_seq_len: int = 10,
                 decode_prefill_ratio: int = 5,
                 decode_block_size: Optional[int] = None,
                 idle_sleep: float = 0.05,
                 lockstep: bool = False,
                 slot_range: Optional[Tuple[int, int]] = None,
                 state_pool_size: int = 0,
                 pool_allocator: Optional[StatePoolAllocator] = None,
                 warmup_programs: bool = False):
        self.worker_id = worker_id
        self._model_factory = model_factory
        self.task_queue = task_queue
        self.master_event_queue = master_event_queue
        self.worker_event_queue = worker_event_queue

        self.batch_size = batch_size
        self.max_prefill_count = max(int(batch_size * 0.125), 1)
        self.min_forward_seq_len = min_forward_seq_len
        self.decode_prefill_ratio = decode_prefill_ratio
        self.decode_block_size = decode_block_size  # None = auto (device-dependent)
        self.idle_sleep = idle_sleep
        # Lockstep multi-host mode: this worker owns only slots
        # [slot_range[0], slot_range[1]) of the GLOBAL batch (its host's dp
        # shard) and executes a FIXED program sequence every loop — batched
        # admission + decode block (+ periodic prefill), all no-op-safe when
        # idle — so every host issues identical SPMD launches and replicated
        # carry leaves (the sampler rng above all) stay bit-identical across
        # processes without any cross-host plan exchange. The per-host
        # prefix cache works through FIXED programs too: snapshots ride a
        # per-loop masked pool-store, resumes ride vote-coordinated rounds
        # (votes cross dp inside the decode block). return_logits rides the
        # decode block's marked-row logits gather (up to LOCKSTEP_LOGIT_SLOTS
        # concurrent per host; extras wait host-locally for a free mark), and
        # over-cap forbidden sets ride a fixed (V,) bias program on the same
        # vote-coordinated rounds as resume — full surface parity with the
        # reference (chirrup/worker.py:714-722).
        # See docs/ARCHITECTURE.md §multi-host.
        self.lockstep = lockstep
        self.slot_range = slot_range or (0, batch_size)

        self.slots: List[SlotData] = [SlotData() for _ in range(batch_size)]
        self.model: Optional[ServingModel] = None
        self.tokenizer: Optional[WorldTokenizer] = None
        self.carry = None
        # device-resident prefix-state pool (HBM cache): snapshot/resume are
        # on-device copies, no host transfers (structures.PoolHandle)
        self.state_pool_size = state_pool_size
        self.pool_allocator = pool_allocator
        self.state_pool = None
        self.warmup_programs = warmup_programs

        self.shutdown_flag = False
        self.snapshot_skips = 0   # pool-exhausted snapshot skips (telemetry)
        self.snapshot_evictions = 0  # LRU cache rows revoked under pressure
        self._stop_vote = False   # lockstep: voted to shut down, awaiting quorum
        self._seq_countdown = 0
        self._loop_times: deque = deque(maxlen=10)
        self.loop_count = 0
        self._pending: Optional[_PendingStep] = None
        # snapshots dispatched last loop whose async D2H is resolving
        self._pending_snapshots: List[Tuple] = []
        # non-lockstep pool snapshots queued for one batched store per phase
        self._snapshot_batch: List[Tuple[int, int]] = []
        # lockstep prefix-cache machinery: slots awaiting their turn on the
        # per-loop fixed extract program, and COMPLEX admissions (resume-from-
        # state and/or over-cap forbidden sets) awaiting the vote-coordinated
        # fixed admission round
        self._lockstep_snapshot_queue: List[int] = []
        self._complex_pending: List[Task] = []
        self._complex_go = False
        # return_logits marks: slot idx -> mark row of the decode block's
        # per-step logits gather (LOCKSTEP_LOGIT_SLOTS rows per host)
        self._logit_marks: Dict[int, int] = {}
        self._free_marks: List[int] = list(
            range(ServingModel.LOCKSTEP_LOGIT_SLOTS))
        # lockstep return_logits tasks waiting host-locally for a free mark
        self._deferred_tasks: List[Task] = []

    # ------------------------------------------------------------------ setup

    _SLOW_CALL_S = float(os.environ.get("CHIRRUP_TPU_LOG_SLOW", "0") or 0)

    def _wrap_slow_logging(self):
        """CHIRRUP_TPU_LOG_SLOW=<seconds>: log any ServingModel call that
        blocks the scheduler thread longer than the threshold (dispatch-side
        stall diagnosis; dispatches are normally async and ~ms)."""
        if not self._SLOW_CALL_S:
            return
        thresh = self._SLOW_CALL_S
        model = self.model
        for name in ("decode_block", "decode_step", "prefill_step",
                     "prefill_step_compact", "insert_slot",
                     "insert_slots_batched", "pool_store_many", "pool_load",
                     "extract_slot", "extract_slot_async"):
            fn = getattr(model, name, None)
            if fn is None:
                continue

            def wrapped(*a, _fn=fn, _name=name, **kw):
                t0 = time.perf_counter()
                out = _fn(*a, **kw)
                dt = time.perf_counter() - t0
                if dt > thresh:
                    print(f"[{self.worker_id}] SLOW {_name}: {dt:.2f}s",
                          flush=True)
                return out

            setattr(model, name, wrapped)

    def _init_worker(self):
        self.model, self.tokenizer = self._model_factory()
        self.carry = self.model.init_carry()
        # concurrent bulk prefills never exceed the compact program's rows
        # (prefills beyond prefill_slots would fall to the 6.5x-slower
        # full-B masked chunk)
        p_slots = getattr(self.model, "prefill_slots", None)
        if p_slots:
            self.max_prefill_count = min(self.max_prefill_count, p_slots)
        if self.decode_block_size is None:
            # dispatch latency >> step time on real accelerators behind an RPC
            # tunnel; amortize it with multi-step blocks there, single-step on
            # CPU. K=16 measured +3.1% aggregate over K=8 at 7.2B/B=200 (the
            # per-block host I/O halves); stop-token overshoot stays host-side
            # and costs ~K/2 extra steps of ONE slot per completion — <<1% of
            # batch throughput at serving generation lengths.
            import jax
            on_tpu = any(d.platform in ("tpu", "axon") for d in jax.devices())
            self.decode_block_size = 16 if on_tpu else 1
        if self.state_pool_size > 0:
            self.state_pool = self.model.init_state_pool(self.state_pool_size)
            if self.pool_allocator is None:
                self.pool_allocator = StatePoolAllocator(self.state_pool_size)
        self._wrap_slow_logging()
        # the worker_loaded SUCCESS handshake is emitted by start() only
        # after _warmup_programs: a warmup failure (e.g. an HBM OOM
        # compiling a serving program) after a success handshake left a
        # healthy-looking server with a dead worker (observed live)

    def _warmup_programs(self):
        """Compile every serving program on no-op inputs before the first
        request. Remote TPU compiles are tens of seconds EACH; without this
        they land mid-serving as multi-second stalls the first time each
        program shape is hit (first admission wave -> wide prefill variant,
        first snapshot -> pool store, ...). All-inactive masks/zero lengths
        leave the carry exactly zero (only the sampler rng advances)."""
        m, B = self.model, self.batch_size
        K = max(self.decode_block_size, 1)
        zK = np.zeros((K, B), np.int32)
        fK = np.zeros((K, B), bool)
        t0 = time.time()
        if K > 1 or self.lockstep:
            lr = np.zeros((m.lockstep_n_dp * m.LOCKSTEP_LOGIT_SLOTS,),
                          np.int32)
            self.carry, _, _, _ = m.decode_block(self.carry, zK, fK, fK, fK,
                                                 None, lr)
        if not self.lockstep:
            self.carry, _, _ = m.decode_step(
                self.carry, np.zeros((B,), np.int32), np.zeros((B,), bool),
                np.zeros((B,), bool))
            for P, T in getattr(m, "prefill_variants", []):
                self.carry = m.prefill_step_compact(
                    self.carry, np.zeros((P, T), np.int32),
                    np.zeros((P,), np.int32), np.arange(P, dtype=np.int32))
        elif getattr(m, "lockstep_prefill_rows", 0):
            # the FIXED compact lockstep chunk (pad rows 0..P-1, all len 0)
            n_rows = m.lockstep_n_dp * m.lockstep_prefill_rows
            self.carry = m.prefill_step_compact_lockstep(
                self.carry, np.zeros((n_rows, m.prefill_chunk), np.int32),
                np.zeros((n_rows,), np.int32),
                np.tile(np.arange(m.lockstep_prefill_rows, dtype=np.int32),
                        m.lockstep_n_dp))
        else:
            self.carry = m.prefill_step(
                self.carry, np.zeros((B, m.prefill_chunk), np.int32),
                np.zeros((B,), np.int32))
        self.carry = m.insert_slots_batched(
            self.carry, np.zeros((B,), bool), [None] * B)
        if self.state_pool is not None and not self.lockstep:
            # store/load slot 0 <-> row 0 while everything is still zeros
            self.state_pool = m.pool_store_many(self.carry, self.state_pool,
                                                [(0, 0)])
            self.carry = m.pool_load(self.carry, self.state_pool, 0, 0)
        if self.lockstep:
            # the vote-coordinated admission-round programs (masked no-ops)
            n_dp = m.lockstep_n_dp
            zrows = np.zeros((n_dp,), np.int32)
            zmask = np.zeros((n_dp,), bool)
            self.carry = m.resume_insert_lockstep(self.carry, zrows, zmask,
                                                  None)
            self.carry = m.set_forbidden_lockstep(self.carry, zrows, zmask,
                                                  None)
            if self.state_pool is not None:
                self.carry = m.pool_load_lockstep(
                    self.carry, self.state_pool, zrows, zrows, zmask)
        import jax as _jax
        _jax.block_until_ready(self.carry.state.elapsed)
        print(f"[{self.worker_id}] serving programs warmed in "
              f"{time.time() - t0:.0f}s", flush=True)

    def _emit_worker_event(self, kind: str, payload: Dict):
        if self.worker_event_queue is not None:
            try:
                self.worker_event_queue.put_nowait((self.worker_id, kind, payload))
            except Exception:
                pass

    # ------------------------------------------------------------- lifecycle

    def _process_master_events(self) -> bool:
        while True:
            try:
                event = self.master_event_queue.get_nowait()
            except queue.Empty:
                return False
            if isinstance(event, dict) and event.get("type") == "shutdown":
                if self.lockstep:
                    # coordinated shutdown: a host that simply stops issuing
                    # programs wedges every other host inside the next block's
                    # dp-crossing collective. Instead VOTE via the stop-count
                    # reduction riding the decode block; all hosts observe the
                    # same count at the same block index and exit after the
                    # same launch count.
                    self._stop_vote = True
                    return False
                self.shutdown_flag = True
                return True

    @staticmethod
    def _is_aborted(task: Task) -> bool:
        try:
            event_type, _ = task.task_event_queue.get_nowait()
            return event_type == "abort"
        except queue.Empty:
            return False

    def _finish_slot(self, idx: int):
        """Free the slot. NO device program runs here: a freed slot is masked
        out of every step, and whichever insert later reuses it fully
        reinitializes all its carry rows — the old per-finish reset_slot
        dispatch cost one tunnel round trip per completion (measured as a
        real serving drag at 200 concurrent streams)."""
        slot = self.slots[idx]
        task = slot.task
        task.output_queue.put_nowait(("task_completed", task))
        self.slots[idx] = SlotData()
        self._release_mark(idx)

    def _one_prefill_burst_max(self) -> int:
        """Longest remaining prompt that may be admitted as ONE_PREFILL when
        the bulk-prefill cap is saturated: ~4 decode blocks of block-fed
        ingestion (K tokens/block) — bounded so long prompts still wait for
        a compact-chunk row rather than crawl through hundreds of blocks."""
        return 4 * max(self.decode_block_size or 1, 1)

    def _pool_alloc(self) -> Optional[int]:
        """Pool row for a snapshot: free list first, then evict-on-exhaustion
        (revoke the cache's LRU pool-backed entry — the cache self-heals the
        dead entry to a miss at its next lookup). Returns None only when
        every cache-held row is pinned by an in-flight resume."""
        row = self.pool_allocator.alloc()
        if row is None:
            row = self.pool_allocator.evict_lru_and_alloc()
            if row is not None:
                self.snapshot_evictions += 1
        return row

    def _snapshot_slot(self, idx: int):
        """Prefix-cache snapshot. Preferred path: copy the slot's state into
        a row of the DEVICE state pool (an on-device copy — no host traffic
        at all) and emit a refcounted PoolHandle. Fallback (pool off/full):
        dispatch the extraction + async D2H now, resolve and emit the event
        NEXT loop so the copy overlaps the next decode block (reference does
        a non_blocking GPU->CPU copy, worker.py:427-430; a synchronous fetch
        here stalled serving for seconds per snapshot through the tunnel)."""
        slot = self.slots[idx]
        if self.state_pool is not None:
            row = self._pool_alloc()
            if row is None:
                # pool exhausted AND every cache-held row pinned by in-flight
                # resumes (evict-on-exhaustion already tried the LRU
                # revocation): SKIP the snapshot — falling back to host-RAM
                # extraction here measured multi-second D2H stalls per
                # snapshot mid-serving. The state-None event tells the app
                # to wake this prompt's dedup followers NOW (they re-prefill)
                # instead of leaving them parked on the leader's claim until
                # its generation ends
                self.snapshot_skips += 1
                slot.prefill_cached = True
                slot.task.output_queue.put_nowait(("cache_prefill", {
                    "state": None,
                    "prefilled_tokens": tuple(slot.prefilled_tokens),
                }))
                return
            # queue for ONE batched pool-store per scheduling phase
            # (per-slot dispatches cost an RPC each; an admission wave
            # of 25 boundaries measured ~6s of dispatch latency)
            self._snapshot_batch.append((idx, row))
            slot.prefill_cached = True
            return
        extract = getattr(self.model, "extract_slot_async", None)
        if extract is None:
            state = self.model.extract_slot(self.carry, idx)
            slot.task.output_queue.put_nowait(("cache_prefill", {
                "state": state,
                "prefilled_tokens": tuple(slot.prefilled_tokens),
            }))
        else:
            self._pending_snapshots.append(
                (slot.task, tuple(slot.prefilled_tokens),
                 extract(self.carry, idx)))
        slot.prefill_cached = True

    def _flush_snapshot_batch(self):
        """Dispatch queued pool snapshots as one batched program and emit
        their cache events. MUST run before the next state-advancing dispatch
        so each snapshot captures its slot exactly at its boundary (device
        programs execute in dispatch order)."""
        if not self._snapshot_batch:
            return
        batch, self._snapshot_batch = self._snapshot_batch, []
        self.state_pool = self.model.pool_store_many(
            self.carry, self.state_pool, [(i, r) for i, r in batch])
        for idx, row in batch:
            slot = self.slots[idx]
            handle = PoolHandle(row=row, worker_id=self.worker_id,
                                allocator=self.pool_allocator,
                                device_bytes=self.model.pool_row_bytes())
            if slot.task is None or slot.task.is_finished():
                handle.release()
                continue
            slot.task.output_queue.put_nowait(("cache_prefill", {
                "state": handle,
                "prefilled_tokens": tuple(slot.prefilled_tokens),
            }))

    def _emit_ready_snapshots(self):
        """Resolve snapshots dispatched on a PREVIOUS loop (their D2H has
        been overlapping the in-flight block) and emit the cache events."""
        pending, self._pending_snapshots = self._pending_snapshots, []
        for task, prefilled, resolve in pending:
            try:
                state = resolve()
            except Exception:  # noqa: BLE001 — a failed copy must not kill serving
                import traceback
                traceback.print_exc()
                continue
            if not task.is_finished():
                task.output_queue.put_nowait(("cache_prefill", {
                    "state": state,
                    "prefilled_tokens": prefilled,
                }))

    def _maybe_snapshot(self, idx: int):
        slot = self.slots[idx]
        task = slot.task
        if not (task.cache_prefill and not slot.prefill_cached
                and len(task.prefill_tokens) == slot.pad()):
            return
        if self.lockstep:
            if self.state_pool is None:
                # no pool: lockstep cannot snapshot (per-slot extract
                # programs would desync hosts); unblock the paused slot
                slot.prefill_cached = True
                return
            # queue for the per-loop FIXED pool-store program (one
            # slot/loop); the block planner keeps the slot paused at the
            # boundary until prefill_cached flips when its store dispatches
            if not slot.snapshot_queued:
                slot.snapshot_queued = True
                self._lockstep_snapshot_queue.append(idx)
        else:
            self._snapshot_slot(idx)

    def _run_lockstep_snapshot(self):
        """Dispatch the FIXED per-loop lockstep snapshot program (every host,
        every loop while the pool exists — a host skipping it would desync
        the launch sequences). The snapshot is a masked on-device copy into
        this host's pool rows; with nothing pending the program runs with an
        all-False mask."""
        lo, _ = self.slot_range
        n_dp = self.model.lockstep_n_dp
        dp_row = min(jax.process_index(), n_dp - 1)
        req_idx = None
        while self._lockstep_snapshot_queue:
            idx = self._lockstep_snapshot_queue.pop(0)
            slot = self.slots[idx]
            if (slot.task is not None and slot.snapshot_queued
                    and not slot.prefill_cached
                    and not slot.task.is_finished()):
                req_idx = idx
                break
        row = None
        if req_idx is not None:
            row = self._pool_alloc()
            if row is None:
                # pool exhausted: skip the snapshot (the request proceeds;
                # the state-None event wakes dedup followers to re-prefill)
                # but keep the fixed program sequence
                self.snapshot_skips += 1
                slot = self.slots[req_idx]
                slot.prefill_cached = True
                slot.task.output_queue.put_nowait(("cache_prefill", {
                    "state": None,
                    "prefilled_tokens": tuple(slot.prefilled_tokens),
                }))
                req_idx = None
        slot_rows = np.zeros((n_dp,), np.int32)
        pool_rows = np.zeros((n_dp,), np.int32)
        mask = np.zeros((n_dp,), bool)
        if req_idx is not None:
            slot_rows[dp_row] = req_idx - lo
            pool_rows[dp_row] = row
            mask[dp_row] = True
        self.state_pool = self.model.pool_store_lockstep(
            self.carry, self.state_pool, slot_rows, pool_rows, mask)
        if req_idx is not None:
            slot = self.slots[req_idx]
            slot.prefill_cached = True
            handle = PoolHandle(row=row, worker_id=self.worker_id,
                                allocator=self.pool_allocator,
                                device_bytes=self.model.pool_row_bytes())
            slot.task.output_queue.put_nowait(("cache_prefill", {
                "state": handle,
                "prefilled_tokens": tuple(slot.prefilled_tokens),
            }))

    # ------------------------------------------------------------------ fill

    def _fill_slots(self):
        """Admit queued tasks into empty slots (reference _fill_task_pool,
        worker.py:570-669). New admissions + in-flight bulk prefills are capped at
        max_prefill_count so prefill never starves decode.

        Admissions are BATCHED: simple tasks (fresh state, <= the capped
        forbidden-id count — the overwhelmingly common case) ride ONE
        fixed-shape insert program per loop; per-slot inserts run only for
        resume-from-state or unbounded forbidden sets. Per-slot inserts for
        a whole admission wave measured ~seconds of tunnel RPC latency per
        loop at 200 streams.

        Lockstep mode: only slots in self.slot_range are this host's; the
        batched program is ALWAYS called (even with an empty mask) so every
        host runs the same launch sequence. Complex tasks (resume-from-state,
        over-cap forbidden sets) ride the vote-coordinated admission rounds;
        return_logits tasks need a free logits mark (deferred host-locally
        until one frees)."""
        lo, hi = self.slot_range
        batch_mask = np.zeros((self.batch_size,), bool)
        batch_tasks: List[Optional[Task]] = [None] * self.batch_size
        complex_inserts: List[int] = []
        pool_loads: List[Tuple[int, PoolHandle]] = []
        deferred_now: List[Task] = []
        prefill_count = sum(1 for s in self.slots if s.phase == SlotPhase.SEQ_PREFILL)
        for idx in range(lo, hi):
            slot = self.slots[idx]
            if slot.phase != SlotPhase.EMPTY:
                continue
            if self._deferred_tasks:
                task = self._deferred_tasks.pop(0)
            else:
                try:
                    task = self.task_queue.get_nowait()
                except queue.Empty:
                    break
            # Only SEQ_PREFILL-bound admissions consume compact-prefill rows
            # (the cap exists to bound the (P, T) bulk-prefill program,
            # serving.prefill_slots); short prompts land in ONE_PREFILL/
            # DECODE and ride the decode block at zero extra device cost, so
            # charging them against the cap made 384 simultaneous ~10-token
            # arrivals admit in ~12 waves (TTFT p50 12 s — round-4 VERDICT).
            # The entry phase is knowable pre-admission from the prompt
            # length (mirrors the phase decision below: remaining after the
            # popped first token, pad-adjusted). Over-cap long prompts defer
            # to the front of the line; later short arrivals still admit
            # (standard continuous-batching admission, unlike the reference's
            # all-admissions cap, chirrup/worker.py:570-580).
            pad_pred = max(task.cache_prefill_padding - 1, 0)
            remaining = len(task.prefill_tokens) - 1 - pad_pred
            seq_bound = remaining >= self.min_forward_seq_len
            force_one = False
            if seq_bound and prefill_count >= self.max_prefill_count:
                if remaining <= self._one_prefill_burst_max():
                    # bulk rows saturated but the prompt is short enough to
                    # ride the decode block token-by-token (K tokens/block,
                    # zero extra device cost): admit NOW as ONE_PREFILL.
                    # Without this, a burst of ~20-token prompts (a typical
                    # templated chat one-liner) serialized through the cap
                    # in ~B/cap admission waves — measured TTFT p50 ~12 s at
                    # 384 simultaneous arrivals, vs ~2 blocks of ingestion
                    force_one = True
                    seq_bound = False
                else:
                    deferred_now.append(task)
                    continue
            if seq_bound:
                prefill_count += 1

            pool_resume = (isinstance(task.state, PoolHandle)
                           and self.state_pool is not None
                           and task.state.worker_id == self.worker_id)
            if isinstance(task.state, PoolHandle) and not pool_resume \
                    and not self.lockstep:
                # a pool handle from another worker (or pooling off): its
                # device rows are not ours and the app already trimmed the
                # prompt to the suffix — unrecoverable here, fail loudly
                # (the engine only enables pooling for worker_num == 1,
                # so this is a misconfiguration guard, not a live path)
                task.request_status = RequestStatus.FINISHED_ABORTED
                task.output_queue.put_nowait(("task_completed", task))
                continue
            simple = ((task.state is None or pool_resume)
                      and len(list(task.forbidden_tokens))
                      <= ServingModel.LOCKSTEP_MAX_FORBIDDEN)
            if self.lockstep and task.return_logits and not self._free_marks:
                # all LOCKSTEP_LOGIT_SLOTS marked rows are in use: wait
                # host-locally for a finishing return_logits slot to free one
                # (no vote needed — admission counts are host-local anyway)
                deferred_now.append(task)
                if seq_bound:
                    prefill_count -= 1
                continue
            if self.lockstep and (task.state is not None or not simple):
                # complex admission (resume-from-state and/or an over-cap
                # forbidden set) rides the vote-coordinated FIXED admission
                # round: stash host-locally, vote on the next block, admit
                # when every host runs the round's fixed programs together
                self._complex_pending.append(task)
                continue

            try:
                if simple:
                    batch_mask[idx] = True
                    batch_tasks[idx] = task
                else:
                    self.carry = self.model.insert_slot(
                        self.carry, idx,
                        None if pool_resume else task.state, task)
                    complex_inserts.append(idx)
                if pool_resume:
                    pool_loads.append((idx, task.state))
                task.request_status = RequestStatus.RUNNING
                next_input = task.prefill_tokens.pop(0)
            except Exception:  # noqa: BLE001 — a bad task (empty prefill,
                # malformed state/params) must fail ITSELF, with a completion
                # event — not crash the loop and strand its stream on
                # keep-alives forever
                import traceback
                traceback.print_exc()
                batch_mask[idx] = False
                batch_tasks[idx] = None
                task.request_status = RequestStatus.FINISHED_ABORTED
                task.output_queue.put_nowait(("task_completed", task))
                continue

            pad = max(task.cache_prefill_padding - 1, 0)
            if len(task.prefill_tokens) == 0:
                phase = SlotPhase.DECODE
            elif force_one or (len(task.prefill_tokens) - pad
                               < self.min_forward_seq_len):
                phase = SlotPhase.ONE_PREFILL
            else:
                phase = SlotPhase.SEQ_PREFILL

            task.timing["admit"] = time.time()
            self.slots[idx] = SlotData(
                task=task, phase=phase, next_input=next_input,
                decoder=StreamingDecoder(self.tokenizer))
            self._maybe_assign_mark(idx, task)
        if deferred_now:
            # retried next loop (front of the line, before the shared queue)
            self._deferred_tasks = deferred_now + self._deferred_tasks
        round_idx = round_task = None
        round_due = self.lockstep and self._complex_go
        if round_due:
            # vote-coordinated admission round: every host runs the SAME fixed
            # program sequence this loop; hosts without work pass empty masks
            self._complex_go = False
            round_idx, round_task = self._pick_lockstep_complex(batch_mask)
            if round_task is not None:
                batch_mask[round_idx] = True
                batch_tasks[round_idx] = round_task

        if self.lockstep:
            # ALWAYS issued (fixed sequence); also zeroes freed slots' state
            self.carry = self.model.insert_slots_batched(
                self.carry, batch_mask, batch_tasks)
            if round_due:
                self._run_lockstep_round_programs(round_idx, round_task)
        elif batch_mask.any():
            self.carry = self.model.insert_slots_batched(
                self.carry, batch_mask, batch_tasks)
        for idx, handle in pool_loads:
            # overwrite the freshly-initialized row's state from the pool
            # (an on-device copy; params already set by the insert above)
            self.carry = self.model.pool_load(self.carry, self.state_pool,
                                              handle.row, idx)
            handle.release()

    def _maybe_assign_mark(self, idx: int, task: Task):
        """Give a return_logits slot a marked row of the decode block's
        per-step logits gather. Lockstep admission guarantees a free mark
        exists; non-lockstep slots without one fall back to K=1 single steps
        (_choose_block_size)."""
        if task.return_logits and self._free_marks:
            self._logit_marks[idx] = self._free_marks.pop(0)

    def _release_mark(self, idx: int):
        mark = self._logit_marks.pop(idx, None)
        if mark is not None:
            self._free_marks.append(mark)

    def _pick_lockstep_complex(self, batch_mask):
        """Pick the next pending complex task (resume-from-state or over-cap
        forbidden set) + an empty slot and do its admission bookkeeping (the
        batched insert sets its params; the round's fixed programs then
        overwrite its state / forbidden bias)."""
        lo, hi = self.slot_range
        while self._complex_pending:
            t = self._complex_pending[0]
            if self._is_aborted(t) or t.is_finished():
                self._complex_pending.pop(0)
                t.request_status = RequestStatus.FINISHED_ABORTED
                t.output_queue.put_nowait(("task_completed", t))
                continue
            break
        if not self._complex_pending:
            return None, None
        if self._complex_pending[0].return_logits and not self._free_marks:
            return None, None  # stays pending; the vote fires again
        idx = next((i for i in range(lo, hi)
                    if self.slots[i].phase == SlotPhase.EMPTY
                    and not batch_mask[i]), None)
        if idx is None:
            return None, None  # stays pending; the vote fires again
        task = self._complex_pending.pop(0)
        try:
            task.request_status = RequestStatus.RUNNING
            next_input = task.prefill_tokens.pop(0)
        except Exception:  # noqa: BLE001
            task.request_status = RequestStatus.FINISHED_ABORTED
            task.output_queue.put_nowait(("task_completed", task))
            return None, None
        pad = max(task.cache_prefill_padding - 1, 0)
        if len(task.prefill_tokens) == 0:
            phase = SlotPhase.DECODE
        elif len(task.prefill_tokens) - pad < self.min_forward_seq_len:
            phase = SlotPhase.ONE_PREFILL
        else:
            phase = SlotPhase.SEQ_PREFILL
        task.timing["admit"] = time.time()
        self.slots[idx] = SlotData(
            task=task, phase=phase, next_input=next_input,
            decoder=StreamingDecoder(self.tokenizer))
        self._maybe_assign_mark(idx, task)
        return idx, task

    def _run_lockstep_round_programs(self, round_idx, round_task):
        """The FIXED programs of one admission round: the pool-load (when the
        pool exists), the host-payload state insert, and the forbidden-bias
        install — all masked, all run by every host so launch sequences stay
        identical. The bias program replaces the admitted slot's capped
        presence/forbidden row with the exact host-built (V,) bias, lifting
        LOCKSTEP_MAX_FORBIDDEN (reference parity: chirrup/worker.py:719-722)."""
        from chirrup_tpu.engine.serving import forbidden_bias_row

        lo, _ = self.slot_range
        n_dp = self.model.lockstep_n_dp
        dp_row = min(jax.process_index(), n_dp - 1)
        rows = np.zeros((n_dp,), np.int32)
        mask_pool = np.zeros((n_dp,), bool)
        mask_host = np.zeros((n_dp,), bool)
        mask_forb = np.zeros((n_dp,), bool)
        bias_row = None
        state = round_task.state if round_task is not None else None
        if round_task is not None:
            rows[dp_row] = round_idx - lo
            if isinstance(state, PoolHandle):
                mask_pool[dp_row] = True
            elif state is not None:
                mask_host[dp_row] = True
            # the exact bias replaces the batched insert's capped row (a
            # no-forbidden task writes an all-zero bias — same result)
            mask_forb[dp_row] = True
            bias_row = forbidden_bias_row(round_task.forbidden_tokens,
                                          self.model.config.vocab_size)
        if self.state_pool is not None:
            prow = np.zeros((n_dp,), np.int32)
            if mask_pool[dp_row]:
                prow[dp_row] = state.row
            self.carry = self.model.pool_load_lockstep(
                self.carry, self.state_pool, prow, rows, mask_pool)
        self.carry = self.model.resume_insert_lockstep(
            self.carry, rows, mask_host,
            state if mask_host[dp_row] else None)
        self.carry = self.model.set_forbidden_lockstep(
            self.carry, rows, mask_forb, bias_row)
        if round_task is not None and isinstance(state, PoolHandle):
            state.release()

    # ----------------------------------------------------------- transitions

    def _check_seq_transitions(self):
        """SEQ -> ONE/DECODE transitions + snapshot triggers (reference
        _handle_forward_seq, worker.py:407-445)."""
        for idx, slot in enumerate(self.slots):
            if slot.phase != SlotPhase.SEQ_PREFILL:
                continue
            task = slot.task
            if task.cache_prefill and len(task.prefill_tokens) == slot.pad():
                self._maybe_snapshot(idx)
                # fall through to the normal phase decision: with padding 0 the
                # snapshot boundary IS the end of prefill, and the slot must go
                # to DECODE — forcing ONE_PREFILL here left an empty prefill
                # list that the next dispatch popped from (crash)
            if len(task.prefill_tokens) == 0:
                slot.phase = SlotPhase.DECODE
            elif (len(task.prefill_tokens) - slot.pad()
                  < self.min_forward_seq_len):
                # pad-ADJUSTED remaining, mirroring admission and
                # _run_prefill_step's avail: bulk prefill stops pad() tokens
                # early, so a padding >= min_forward_seq_len slot would
                # otherwise never leave SEQ (avail 0, skipped forever)
                slot.phase = SlotPhase.ONE_PREFILL

    # ---------------------------------------------------------------- forward

    def _choose_block_size(self) -> int:
        """K steps per dispatch, restricted to {1, K} so only two programs ever
        compile. Falls to 1 only when a slot needs per-step host data —
        a return_logits slot WITHOUT a marked logits row (more concurrent
        return_logits requests than LOCKSTEP_LOGIT_SLOTS, e.g. a full-batch
        MMLU run; marked slots get per-step logits from the block's gather).
        Cache-snapshot boundaries do NOT demote the block:
        the planner pauses just that slot at its boundary via the per-step
        masks (one slot idles a few steps; the other B-1 keep K-step blocks —
        demoting the whole batch to K=1 measured 12x slower through the
        HTTP stack, because under load some slot is ~always near a boundary)."""
        K = self.decode_block_size
        if self.lockstep:
            return max(K, 1)  # FIXED size: hosts must agree without talking
        if K <= 1:
            return 1
        for idx, slot in enumerate(self.slots):
            if slot.phase not in (SlotPhase.DECODE, SlotPhase.ONE_PREFILL):
                continue
            if slot.task.return_logits and idx not in self._logit_marks:
                return 1
        return K

    def _dispatch_decode_block(self, K: int):
        """Plan and dispatch K decode steps in one jitted call. Prefill feeds and
        phase transitions are host-known K steps ahead; DECODE inputs chain through
        the device-resident last_sampled."""
        B = self.batch_size
        tokens = np.zeros((K, B), np.int32)
        feedback = np.zeros((K, B), bool)
        active = np.zeros((K, B), bool)
        decode = np.zeros((K, B), bool)
        decode_slots: List[Tuple[int, str]] = []

        n_active = n_decode = 0
        for idx, slot in enumerate(self.slots):
            if slot.phase not in (SlotPhase.DECODE, SlotPhase.ONE_PREFILL):
                continue
            task = slot.task
            n_active += 1
            phase = slot.phase
            if phase == SlotPhase.DECODE:
                n_decode += 1
                decode_slots.append((idx, task.task_id))
            for k in range(K):
                if (task.cache_prefill and not slot.prefill_cached
                        and len(task.prefill_tokens) == slot.pad()):
                    # PAUSE at the snapshot boundary: this slot idles the rest
                    # of the block (active stays False), the post-block
                    # _maybe_snapshot captures the state exactly here, and
                    # the next block resumes the remaining pad tokens (or the
                    # first decode step, for padding 0 where the boundary
                    # lands after the ONE_PREFILL->DECODE flip). The other
                    # slots keep their full K steps.
                    break
                active[k, idx] = True
                if phase == SlotPhase.ONE_PREFILL:
                    tokens[k, idx] = slot.next_input
                    slot.prefilled_tokens.append(slot.next_input)
                    slot.next_input = task.prefill_tokens.pop(0)
                    if len(task.prefill_tokens) == 0:
                        phase = SlotPhase.DECODE
                else:
                    decode[k, idx] = True
                    if slot.use_feedback:
                        feedback[k, idx] = True
                    else:
                        tokens[k, idx] = slot.next_input
                        slot.use_feedback = True
            if phase == SlotPhase.DECODE and slot.phase == SlotPhase.ONE_PREFILL:
                slot.phase = SlotPhase.DECODE
                decode_slots.append((idx, task.task_id))

        votes = np.zeros((B, 2), np.int32)
        lo, hi = self.slot_range
        if self._stop_vote:
            votes[lo:hi, 0] = 1
        if self._complex_pending:
            votes[lo:hi, 1] = 1
        # marked return_logits rows: this host's mark rows carry LOCAL slot
        # offsets; the block gathers their per-step raw logits
        M = ServingModel.LOCKSTEP_LOGIT_SLOTS
        n_dp = self.model.lockstep_n_dp
        dp_row = min(jax.process_index(), n_dp - 1)
        logit_rows = np.zeros((n_dp * M,), np.int32)
        marks_now: Dict[int, int] = {}
        for idx, m in self._logit_marks.items():
            slot = self.slots[idx]
            if slot.task is not None and slot.task.return_logits:
                logit_rows[dp_row * M + m] = idx - lo
                marks_now[idx] = dp_row * M + m
        self.carry, sampled, stop_count, marked_logits = \
            self.model.decode_block(self.carry, tokens, feedback, active,
                                    decode, votes, logit_rows)

        # snapshot boundaries align with block ends by construction
        for idx, slot in enumerate(self.slots):
            if slot.task is not None and not slot.prefill_cached \
                    and slot.task.cache_prefill \
                    and slot.phase in (SlotPhase.ONE_PREFILL, SlotPhase.DECODE):
                self._maybe_snapshot(idx)

        self._pending = _PendingStep(sampled=sampled, raw_logits=None,
                                     decode_slots=decode_slots, block=K,
                                     stop_count=stop_count,
                                     marked_logits=marked_logits,
                                     marks=marks_now)
        return n_active, n_decode

    def _dispatch_decode_step(self):
        """Dispatch one token step for every DECODE + ONE_PREFILL slot.

        Pipelined: the step is dispatched with DECODE slots reading their input from
        the device-resident previous sample (BatchCarry.last_sampled), so this
        returns immediately and the host processes the PREVIOUS step's results while
        this one executes — the host round-trip (worker.py .item() in the reference,
        the tunnel RTT here) disappears from the critical path."""
        B = self.batch_size
        tokens = np.zeros((B,), np.int32)
        feedback = np.zeros((B,), bool)
        active = np.zeros((B,), bool)
        decode = np.zeros((B,), bool)
        decode_slots: List[Tuple[int, str]] = []
        for idx, slot in enumerate(self.slots):
            if slot.phase not in (SlotPhase.DECODE, SlotPhase.ONE_PREFILL):
                continue
            active[idx] = True
            if slot.phase == SlotPhase.DECODE:
                decode[idx] = True
                decode_slots.append((idx, slot.task.task_id))
                if slot.use_feedback:
                    feedback[idx] = True
                else:
                    tokens[idx] = slot.next_input
                    slot.use_feedback = True  # subsequent inputs come from device
            else:
                tokens[idx] = slot.next_input

        self.carry, sampled, raw_logits = self.model.decode_step(
            self.carry, tokens, active, decode, feedback)

        # post-dispatch bookkeeping for prefilling slots (their inputs are
        # host-known prompt tokens; reference _handle_forward_one_prefill_phase)
        for idx, slot in enumerate(self.slots):
            if active[idx] and slot.phase == SlotPhase.ONE_PREFILL:
                task = slot.task
                slot.prefilled_tokens.append(slot.next_input)
                slot.next_input = task.prefill_tokens.pop(0)
                if len(task.prefill_tokens) == 0:
                    slot.phase = SlotPhase.DECODE
                # extract dispatched after decode_step -> sees post-step state
                self._maybe_snapshot(idx)

        self._pending = _PendingStep(sampled=sampled, raw_logits=raw_logits,
                                     decode_slots=decode_slots)
        return int(active.sum()), int(decode.sum())

    def _process_pending(self):
        """Consume the previous step's sampled tokens (overlaps device compute of
        the step dispatched just before)."""
        pending = self._pending
        self._pending = None
        if pending is None:
            return
        if self.lockstep and pending.stop_count is not None:
            # replicated (NV,) sums: addressable on every host
            counts = np.asarray(jax.device_get(pending.stop_count)).reshape(-1)
            if counts[0] > 0:
                self.shutdown_flag = True
            if counts.size > 1 and counts[1] > 0:
                # all hosts run a complex-admission round next loop
                self._complex_go = True
        sampled_np = self._fetch_sampled(pending.sampled)
        if sampled_np.ndim == 1:
            sampled_np = sampled_np[None, :]
        marked_np = None
        if pending.marks and pending.marked_logits is not None:
            ml = pending.marked_logits
            if getattr(ml, "is_fully_addressable", True):
                # one fetch for all marked rows (K, n_dp*M, V)
                marked_np = np.asarray(jax.device_get(ml))
        for idx, task_id in pending.decode_slots:
            slot = self.slots[idx]
            task = slot.task
            if task is None or task.task_id != task_id or task.is_finished():
                continue  # slot was reset/aborted while the step was in flight
            block_logits = None
            if task.return_logits and pending.marks \
                    and idx in pending.marks:
                row = pending.marks[idx]
                if marked_np is not None:
                    block_logits = marked_np[:, row]        # (K, V)
                else:
                    # multi-process: assemble this host's row from its shards
                    from chirrup_tpu.engine.serving import _host_row
                    block_logits = _host_row(pending.marked_logits, 1, row)
            emitted: List[Tuple[int, str]] = []
            if not task.generated_tokens:
                t_first = time.time()  # stamped only if this block emits
            for k in range(sampled_np.shape[0]):
                new_token = int(sampled_np[k, idx])
                if new_token < 0:
                    continue  # slot was still prefilling at step k of the block
                if new_token in task.stop_tokens:
                    task.request_status = RequestStatus.FINISHED_STOPPED
                    break
                new_text = slot.decoder.push(new_token)
                if not task.generated_tokens:
                    task.timing.setdefault("first_token", t_first)
                task.generated_tokens.append(new_token)
                task.decoded_texts.append(new_text)
                if task.return_logits and block_logits is not None:
                    task.output_queue.put_nowait(
                        ("token_generated",
                         (new_token, new_text,
                          np.asarray(block_logits[k], np.float32))))
                elif task.return_logits and pending.raw_logits is not None:
                    logits_row = np.asarray(
                        jax.device_get(pending.raw_logits[idx]), np.float32)
                    task.output_queue.put_nowait(
                        ("token_generated", (new_token, new_text, logits_row)))
                else:
                    emitted.append((new_token, new_text))
                if task.max_tokens is not None \
                        and len(task.generated_tokens) >= task.max_tokens:
                    task.request_status = RequestStatus.FINISHED_LENGTH_CAPPED
                    break
            if emitted:
                # ONE bridge event per slot per block: each put_nowait is a
                # call_soon_threadsafe loop wakeup — per-token events cost
                # ~K x the wakeups at thousands of tok/s (the interface
                # fans the list back out per token)
                task.output_queue.put_nowait(("tokens_generated", emitted))

    def _fetch_sampled(self, sampled) -> np.ndarray:
        """Sampled tokens to host. On a multi-PROCESS mesh the global array is
        not fully addressable; read only this host's shards (our slot_range
        rows live on our devices by construction of the dp sharding) and leave
        other hosts' rows as -1 (we own no tasks there)."""
        if getattr(sampled, "is_fully_addressable", True):
            return np.asarray(jax.device_get(sampled))
        out = np.full(sampled.shape, -1, np.int32)
        for shard in sampled.addressable_shards:
            out[shard.index] = np.asarray(shard.data)
        return out

    def _run_prefill_step(self):
        """One ragged chunk for every SEQ_PREFILL slot (reference _run_forward_seq,
        worker.py:744-776, without the global min-length coupling).

        Normal mode runs a COMPACT program: only P = prefill_slots rows go
        through the model (prefill is compute-bound; the admission cap means
        at most ~B/8 slots can be in SEQ_PREFILL), and with few prompts in
        flight the tall-narrow (small P, large T) variant advances each one
        proportionally faster per chunk. Lockstep keeps the fixed full-B
        program (the compact row set would diverge across hosts)."""
        seq_ids = [idx for idx, slot in enumerate(self.slots)
                   if slot.phase == SlotPhase.SEQ_PREFILL
                   and len(slot.task.prefill_tokens) - slot.pad() > 0]
        if self.lockstep and getattr(self.model, "lockstep_prefill_rows", 0):
            return self._run_prefill_lockstep_compact(seq_ids)
        variants = getattr(self.model, "prefill_variants", None)
        compact = (not self.lockstep and variants
                   and any(len(seq_ids) <= P < self.batch_size
                           for P, _ in variants))
        if compact and not seq_ids:
            return 0
        if compact:
            P, T = next((P, T) for P, T in variants if len(seq_ids) <= P)
        else:
            T = self.model.prefill_chunk

        fed: Dict[int, List[int]] = {}
        for idx in seq_ids:
            slot = self.slots[idx]
            task = slot.task
            # leave pad()+1 tokens for the ONE_PREFILL/decode tail
            avail = len(task.prefill_tokens) - slot.pad()
            n = min(T, avail)
            chunk = [slot.next_input] + task.prefill_tokens[:n - 1]
            task.prefill_tokens = task.prefill_tokens[n - 1:]
            slot.next_input = task.prefill_tokens.pop(0)
            slot.prefilled_tokens.extend(chunk)
            fed[idx] = chunk

        if compact:
            tokens = np.zeros((P, T), np.int32)
            lengths = np.zeros((P,), np.int32)
            slot_idx = np.zeros((P,), np.int32)
            for row, (idx, chunk) in enumerate(fed.items()):
                tokens[row, :len(chunk)] = chunk
                lengths[row] = len(chunk)
                slot_idx[row] = idx
            # pad rows must point at DISTINCT idle slots (scatter indices must
            # be unique; length-0 rows pass state through bit-unchanged)
            spare = (i for i in range(self.batch_size) if i not in fed)
            for row in range(len(fed), P):
                slot_idx[row] = next(spare)
            self.carry = self.model.prefill_step_compact(
                self.carry, tokens, lengths, slot_idx)
            return len(fed)

        if not fed and not self.lockstep:
            return 0
        B = self.batch_size
        tokens = np.zeros((B, T), np.int32)
        lengths = np.zeros((B,), np.int32)
        for idx, chunk in fed.items():
            tokens[idx, :len(chunk)] = chunk
            lengths[idx] = len(chunk)
        # lockstep: the (all-zero-lengths) call still runs — fixed sequence
        self.carry = self.model.prefill_step(self.carry, tokens, lengths)
        return len(fed)

    def _run_prefill_lockstep_compact(self, seq_ids):
        """FIXED-(n_dp*P_loc, T) compact chunk for lockstep: every host
        dispatches this exactly once per prefill cadence — program shapes
        (and launch sequences) are host-identical while the dp-sharded
        tokens/lengths/slot_idx carry HOST-LOCAL data, so each host
        prefills its own compact row set. Replaces the 6.5x-slower full-B
        masked chunk lockstep used through round 4 (round-4 VERDICT item 5).
        Single-process multi-shard meshes (the dp=8 dryrun case) fill every
        shard's block from this one worker."""
        m = self.model
        P_loc = m.lockstep_prefill_rows
        B_loc = m.lockstep_prefill_b_loc
        n_dp = m.lockstep_n_dp
        T = m.prefill_chunk
        # at most P_loc rows per dp shard this chunk (the admission cap
        # already bounds concurrent bulk prefills; overflow rows simply
        # wait for the next cadence)
        per_shard: Dict[int, List[int]] = {}
        for idx in seq_ids:
            rows = per_shard.setdefault(idx // B_loc, [])
            if len(rows) < P_loc:
                rows.append(idx)
        tokens = np.zeros((n_dp * P_loc, T), np.int32)
        lengths = np.zeros((n_dp * P_loc,), np.int32)
        slot_idx = np.zeros((n_dp * P_loc,), np.int32)
        fed = 0
        for shard in range(n_dp):
            base = shard * P_loc
            chosen = per_shard.get(shard, [])
            used = {i - shard * B_loc for i in chosen}
            # pad rows point at DISTINCT idle LOCAL slots (length-0 rows
            # pass state through bit-unchanged)
            spare = (i for i in range(B_loc) if i not in used)
            for row in range(P_loc):
                if row < len(chosen):
                    idx = chosen[row]
                    slot = self.slots[idx]
                    task = slot.task
                    avail = len(task.prefill_tokens) - slot.pad()
                    n = min(T, avail)
                    chunk = [slot.next_input] + task.prefill_tokens[:n - 1]
                    task.prefill_tokens = task.prefill_tokens[n - 1:]
                    slot.next_input = task.prefill_tokens.pop(0)
                    slot.prefilled_tokens.extend(chunk)
                    tokens[base + row, :len(chunk)] = chunk
                    lengths[base + row] = len(chunk)
                    slot_idx[base + row] = idx - shard * B_loc
                    fed += 1
                else:
                    slot_idx[base + row] = next(spare)
        self.carry = m.prefill_step_compact_lockstep(
            self.carry, tokens, lengths, slot_idx)
        return fed

    # ------------------------------------------------------------------- loop

    def run_once(self) -> bool:
        """One scheduler iteration; returns True if any forward work was done."""
        loop_start = time.perf_counter()
        self.loop_count += 1
        self._emit_ready_snapshots()  # last loop's dispatches: copies done

        # aborts + completions
        finished: List[int] = []
        for idx, slot in enumerate(self.slots):
            if slot.phase == SlotPhase.EMPTY:
                continue
            if self._is_aborted(slot.task):
                slot.task.request_status = RequestStatus.FINISHED_ABORTED
            if slot.task.is_finished():
                finished.append(idx)
        for idx in finished:
            self._finish_slot(idx)

        self._fill_slots()
        self._check_seq_transitions()
        self._flush_snapshot_batch()  # SEQ-boundary snapshots: capture now,
        # before the decode dispatch advances anything

        n_active = sum(1 for s in self.slots
                       if s.phase in (SlotPhase.DECODE, SlotPhase.ONE_PREFILL))
        n_seq = sum(1 for s in self.slots if s.phase == SlotPhase.SEQ_PREFILL)
        if n_active == 0 and n_seq == 0 and not self.lockstep:
            self._process_pending()  # drain the last in-flight step before idling
            return False

        decode_count = one_prefill_count = seq_count = 0
        if n_active > 0 or self.lockstep:
            # lockstep dispatches the (possibly all-masked) block regardless:
            # the fixed sequence keeps replicated carry leaves (rng) identical
            # on every host, and the shutdown vote rides the block program
            K = self._choose_block_size()
            if K > 1 or self.lockstep:
                total, decode_count = self._dispatch_decode_block(K)
            else:
                total, decode_count = self._dispatch_decode_step()
            one_prefill_count = total - decode_count
            self._seq_countdown -= K
            # block-boundary snapshots (paused slots): capture before any
            # prefill chunk advances more state
            self._flush_snapshot_batch()
        else:
            self._seq_countdown = 0

        if self.lockstep:
            # fixed ONE chunk per loop when due: the launch count per loop
            # must be host-identical, and countdown evolves identically
            if self._seq_countdown < 1:
                seq_count = self._run_prefill_step()
                self._seq_countdown = max(1, self.decode_prefill_ratio)
        else:
            # honor the reference's decode:prefill TOKEN ratio (one chunk per
            # `ratio` decode tokens, worker.py:846-856): a K-step decode block
            # owes K/ratio chunks, so drain the countdown debt — one chunk per
            # block would starve prompt ingestion 3x at K=16, ratio=5.
            # BURST MODE: when bulk-prefilling prompts outnumber the active
            # decoders (a cold burst — the batch is mostly empty and queued
            # prompts are the backlog), halve the ratio so ingestion gets
            # ~2.5x the chunk budget; the few early streams trade some TPOT
            # for everyone else's TTFT, and steady-state traffic (decoders
            # >= prefills) keeps the reference's exact 1:5 policy.
            # The backlog includes DEFERRED + QUEUED prompts, not just the
            # in-flight SEQ slots: n_seq is capped at max_prefill_count
            # (~32), so `decode_count < n_seq` stopped triggering the moment
            # one admission wave started decoding — a 200-long-prompt cold
            # burst ran its remaining waves at the 1:5 steady ratio with
            # 300+ slots idle (measured TTFT p50 53 s; the idle-slot guard
            # keeps loaded steady-state traffic on the reference policy)
            ratio = self.decode_prefill_ratio
            backlog = n_seq + len(self._deferred_tasks)
            try:
                backlog += self.task_queue.qsize()
            except (AttributeError, NotImplementedError):
                pass
            idle = sum(1 for s in self.slots if s.phase == SlotPhase.EMPTY)
            if decode_count < backlog and idle >= self.batch_size // 2:
                ratio = max(1, ratio // 2)
            if n_seq == 0:
                # no prefill work: don't accrue debt that would burst-fire
                # chunks when a prompt finally arrives
                self._seq_countdown = max(self._seq_countdown, 0)
            while self._seq_countdown < 1 and n_seq > 0:
                fed = self._run_prefill_step()
                seq_count += fed
                self._seq_countdown += max(1, ratio)
                if fed == 0:
                    break

        if self.lockstep and self.state_pool is not None:
            self._run_lockstep_snapshot()

        # read the PREVIOUS step's tokens while the dispatched work executes
        self._process_pending()

        self._loop_times.append(time.perf_counter() - loop_start)
        self._emit_worker_event("worker_performance", {
            "avg_loop_time": sum(self._loop_times) / len(self._loop_times),
            "state_size": self.batch_size,
            "task_details": {
                "decode_count": decode_count,
                "one_prefill_count": one_prefill_count,
                "seq_prefill_count": seq_count,
            },
            "loop_count": self.loop_count,
            "snapshot_skips": self.snapshot_skips,
            "snapshot_evictions": self.snapshot_evictions,
            "max_allocated_memory_GB": self._device_memory_gb(),
        })
        return True

    _MEM_PROBE_EVERY = 50  # memory_stats() is a host call; don't pay it per loop

    def _device_memory_gb(self):
        """Peak HBM in use (reference telemetry max_allocated_memory_GB,
        worker.py:871); refreshed every few loops, None where unsupported."""
        if self.loop_count % self._MEM_PROBE_EVERY not in (1,):
            return getattr(self, "_mem_gb_cache", None)
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            peak = stats.get("peak_bytes_in_use", stats.get("bytes_in_use"))
            self._mem_gb_cache = (round(peak / 2**30, 3)
                                  if peak is not None else None)
        except Exception:  # noqa: BLE001 — telemetry must never kill serving
            self._mem_gb_cache = None
        return self._mem_gb_cache

    def start(self):
        try:
            if self.model is None:
                self._init_worker()
            if self.warmup_programs:
                self._warmup_programs()
            self._emit_worker_event("worker_loaded", {
                "status": "success",
                "worker_id": self.worker_id,
                "batch_size": self.batch_size,
            })
        except Exception as exc:  # noqa: BLE001
            import traceback
            traceback.print_exc()
            self._emit_worker_event("worker_loaded", {
                "status": "error", "worker_id": self.worker_id, "error": str(exc)})
            return
        # device-level tracing across the serving loop, written at shutdown —
        # the jax.profiler equivalent of the reference's pyinstrument-in-the-
        # worker-loop (reference worker.py:788-790, 886-887; SURVEY §5)
        profile_dir = os.environ.get("CHIRRUP_TPU_PROFILE_DIR")
        if profile_dir:
            try:
                jax.profiler.start_trace(
                    os.path.join(profile_dir, self.worker_id))
            except Exception as exc:  # noqa: BLE001 — profiling must never kill serving
                print(f"[{self.worker_id}] profiler unavailable: {exc}")
                profile_dir = None
        while True:
            if self._process_master_events() or self.shutdown_flag:
                break
            try:
                did_work = self.run_once()
            except Exception as exc:  # noqa: BLE001
                # a dying worker must fail loudly, not strand its tasks
                # (the reference never detects this case — SURVEY §5)
                import traceback
                traceback.print_exc()
                self._emit_worker_event("worker_error", {"error": str(exc)})
                self._abort_all_tasks(exc)
                time.sleep(0.5)
                continue
            if self.shutdown_flag:
                if self.lockstep:
                    # quorum reached: the global mesh is shutting down; any
                    # still-running requests on this host cannot progress
                    self._abort_all_tasks(RuntimeError("lockstep shutdown"))
                break
            if not did_work:
                time.sleep(self.idle_sleep)
        if profile_dir:
            try:
                jax.profiler.stop_trace()
                print(f"[{self.worker_id}] profiler trace written under "
                      f"{profile_dir}")
            except Exception:
                pass
        self._cleanup()

    def _abort_all_tasks(self, exc: Exception):
        for task in self._complex_pending + self._deferred_tasks:
            task.request_status = RequestStatus.FINISHED_ABORTED
            try:
                task.output_queue.put_nowait(("task_completed", task))
            except Exception:  # noqa: BLE001
                pass
        self._complex_pending = []
        self._deferred_tasks = []
        for idx, slot in enumerate(self.slots):
            if slot.task is not None:
                slot.task.request_status = RequestStatus.FINISHED_ABORTED
                try:
                    slot.task.output_queue.put_nowait(("task_completed", slot.task))
                except Exception:
                    pass
                self.slots[idx] = SlotData()
            self._release_mark(idx)
        self._pending = None
        self._pending_snapshots = []

    def _cleanup(self):
        self.carry = None
        self.model = None


def start_worker_thread(worker: Worker) -> threading.Thread:
    t = threading.Thread(target=worker.start, daemon=True,
                         name=f"chirrup_tpu:{worker.worker_id}")
    t.start()
    return t
