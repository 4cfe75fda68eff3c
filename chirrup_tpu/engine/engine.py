"""AsyncEngineCore — asyncio façade over the worker threads.

Mirrors the reference engine layer (/root/reference/chirrup/engine_core.py): a shared
task queue gives work-stealing request-level parallelism across workers; a
ThreadSafeAsyncQueue bridges each worker thread back into the event loop; init
performs a worker_loaded handshake with timeout.

The TPU difference: a "worker" is not one-thread-per-GPU-replica — it drives one
jitted step program over a device (or a whole mesh when tensor parallelism is on),
so a single worker typically serves the whole host.
"""

from __future__ import annotations

import asyncio
import queue
import threading
import uuid
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

from chirrup_tpu.engine.structures import (
    DEFAULT_SAMPLING_CONFIG, DEFAULT_STOP_TOKENS, ModelLoadConfig, RequestState, Task)
from chirrup_tpu.engine.worker import Worker, start_worker_thread
from chirrup_tpu.engine.interface import AsyncEngineCompletion
from chirrup_tpu.utils.tokenizer import WorldTokenizer


class ThreadSafeAsyncQueue:
    """Worker threads put_nowait; the asyncio side reads .queue
    (reference engine_core.py:30-57)."""

    def __init__(self, event_loop: asyncio.AbstractEventLoop,
                 async_queue: Optional[asyncio.Queue] = None):
        self.event_loop = event_loop
        self.queue: asyncio.Queue = async_queue or asyncio.Queue()

    def put_nowait(self, item: Any) -> None:
        try:
            self.event_loop.call_soon_threadsafe(self._put, item)
        except RuntimeError:
            pass  # loop closed — drop, matching reference behavior

    def _put(self, item: Any) -> None:
        try:
            self.queue.put_nowait(item)
        except asyncio.QueueFull:
            pass


def build_model_factory(model_config: ModelLoadConfig, batch_size: int,
                        device=None, mesh_devices=None, seed: int = 0):
    """Returns a callable the worker thread invokes to construct its ServingModel.

    Loads a real checkpoint (model_path endswith .pth) or builds a synthetic model
    (model_config.synthetic_config) for tests/benchmarks.

    device pins a single-device worker replica (the reference pins gpu_id per
    worker, chirrup/worker.py:252-257); when model_config.tensor_parallel > 1
    the factory instead builds a tp mesh over mesh_devices (default: the first
    tp local devices) and the model is GSPMD-sharded over it — the TPU
    equivalent of the reference's per-device worker creation
    (chirrup/engine_core.py:135-153).
    """
    import jax
    import jax.numpy as jnp
    from chirrup_tpu.models.config import RWKV7Config, RuntimeConfig
    from chirrup_tpu.models import loader
    from chirrup_tpu.engine.serving import ServingModel

    def factory():
        import dataclasses

        dtypes = {"float32": jnp.float32, "float16": jnp.float16,
                  "bfloat16": jnp.bfloat16}
        runtime = RuntimeConfig(
            activation_dtype=dtypes[model_config.activation_dtype],
            wkv_state_dtype=dtypes[model_config.wkv_state_dtype],
            quantization=model_config.quantization,
            use_pallas_wkv=model_config.use_pallas_wkv,
            **({"mm8_core": model_config.mm8_core}
               if getattr(model_config, "mm8_core", None) else {}),
        )
        interpret = bool(getattr(model_config, "interpret_pallas", False))
        if model_config.synthetic_config is not None:
            cfg = RWKV7Config(**model_config.synthetic_config)
            if runtime.quantization == "int8":
                # serving-dtype synthetic: random int8 codes directly (a
                # dense f32 synthetic 7.2B tree would not fit one chip) —
                # the full-stack benchmark model (bench.py uses the same)
                params = loader.synthetic_params_int8(
                    cfg, seed=seed, dtype=runtime.activation_dtype,
                    use_numpy=jax.default_backend() == "cpu")
            else:
                params = loader.synthetic_params(cfg, seed=seed)
        else:
            from chirrup_tpu.models import checkpoint as ckpt

            if ckpt.is_native_checkpoint(model_config.model_path):
                cfg, params = ckpt.load_native(model_config.model_path)
            else:
                cfg, params = loader.load_model(model_config.model_path,
                                                vocab_size=model_config.vocab_size)
        mesh = None
        batch_sharded_dp = False
        tp = getattr(model_config, "tensor_parallel", 1) or 1
        if getattr(model_config, "lockstep", False):
            # multi-host SPMD serving: dp spans the jax.distributed processes,
            # the batch shards over dp, tp spans each process's local devices
            from chirrup_tpu.parallel.mesh import make_mesh

            dp = jax.process_count()
            mesh = make_mesh(tp=tp, dp=dp, devices=mesh_devices)
            batch_sharded_dp = dp > 1
        elif tp > 1:
            from chirrup_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(tp=tp, devices=mesh_devices)
        elif device is not None:
            params = jax.device_put(params, device)
        # off TPU, the lax.scan WKV is far faster than interpret-mode pallas
        # (unless interpret mode is explicitly requested to exercise the
        # exact TPU numeric stack in CPU tests)
        on_tpu = any(d.platform in ("tpu", "axon") or "TPU" in str(d)
                     for d in jax.devices())
        if not on_tpu and runtime.use_pallas_wkv and not interpret:
            runtime = dataclasses.replace(runtime, use_pallas_wkv=False)
        model = ServingModel(cfg, params, runtime, batch_size,
                             prefill_chunk=model_config.prefill_chunk,
                             mesh=mesh, batch_sharded_dp=batch_sharded_dp,
                             interpret_pallas=interpret, seed=seed)
        tokenizer = WorldTokenizer(model_config.vocab_path)
        return model, tokenizer

    return factory


class AsyncEngineCore:
    """Engine façade: init/completion/shutdown/iter_worker_performance
    (reference engine_core.py:60-332)."""

    def __init__(self):
        self.task_queue: "queue.Queue[Task]" = queue.Queue()
        self.event_queues: List[queue.Queue] = []
        self.workers: List[Worker] = []
        self.worker_threads: List[threading.Thread] = []
        self.worker_event_queue: Optional[ThreadSafeAsyncQueue] = None
        self.event_loop: Optional[asyncio.AbstractEventLoop] = None
        self.tokenizer: Optional[WorldTokenizer] = None
        self.is_initialized = False
        self.is_shutdown = False
        self._perf_listeners: List[asyncio.Queue] = []
        self._drain_task: Optional[asyncio.Task] = None

    async def init(self, worker_num: int, model_config: ModelLoadConfig,
                   batch_size: int = 32, *, load_timeout: float = 300.0,
                   decode_block_size: Optional[int] = None,
                   model_factory: Optional[Callable] = None,
                   state_pool_size: int = 0,
                   warmup_programs: bool = False) -> None:
        """Spawn workers and wait for the worker_loaded handshake
        (reference engine_core.py:89-173, 300 s timeout).

        state_pool_size > 0 preallocates that many DEVICE prefix-snapshot
        rows per worker (+small headroom for snapshots racing eviction) — the
        HBM-resident state cache. Single-worker hosts only: with several
        workers a pool handle cached by one cannot resume on another (the
        shared task queue is work-stealing), so multi-worker setups keep
        host-RAM snapshots."""
        if self.is_initialized:
            raise RuntimeError("Workers already initialized")
        if self.is_shutdown:
            raise RuntimeError("Engine has been shutdown")

        self.event_loop = asyncio.get_running_loop()
        self.worker_event_queue = ThreadSafeAsyncQueue(
            self.event_loop, asyncio.Queue(maxsize=worker_num * 100))
        self.is_initialized = True
        self.tokenizer = WorldTokenizer(model_config.vocab_path)

        # device placement (reference pins gpu_id=[k] per worker,
        # chirrup/engine_core.py:135-153 + worker.py:252-257): DP workers get
        # one device each round-robin; TP workers get disjoint tp-sized device
        # groups when enough chips exist (else they overlap, which still
        # compiles/runs — the single-chip dev case)
        tp = getattr(model_config, "tensor_parallel", 1) or 1
        lockstep = getattr(model_config, "lockstep", False)
        slot_range = None
        if lockstep:
            import jax

            if worker_num != 1:
                raise ValueError("lockstep serving uses exactly one worker "
                                 "per host (the host's dp shard)")
            # this host owns its dp shard's slot rows of the GLOBAL batch
            n_proc = jax.process_count()
            if batch_size % max(n_proc, 1):
                raise ValueError(f"batch_size {batch_size} must divide by "
                                 f"process count {n_proc}")
            if n_proc > 1 and tp != jax.local_device_count():
                # the dp-row -> process mapping relies on jax.devices() being
                # grouped by process and each dp row being exactly one
                # process's chips; any other tp scatters a host's carry rows
                # onto other hosts' devices and its worker can never read them
                raise ValueError(
                    f"lockstep across {n_proc} processes requires "
                    f"tensor_parallel == local device count "
                    f"({jax.local_device_count()}), got {tp}")
            b_loc = batch_size // max(n_proc, 1)
            pid = jax.process_index()
            slot_range = (pid * b_loc, (pid + 1) * b_loc)
        devices = None
        if model_factory is None and not lockstep and (worker_num > 1 or tp > 1):
            import jax

            devices = jax.devices()

        pool_n = 0
        if state_pool_size > 0:
            if worker_num == 1:
                # small headroom so snapshot bursts racing LRU releases don't
                # immediately skip (each row is ~17 MB HBM at 7.2B)
                pool_n = state_pool_size + 4
            else:
                print("state pool disabled: worker_num > 1 (host-RAM "
                      "snapshots in effect)")
        for k in range(worker_num):
            master_q: queue.Queue = queue.Queue()
            self.event_queues.append(master_q)
            if model_factory is not None:
                factory = model_factory
            else:
                device = mesh_devices = None
                if devices is not None:
                    if tp > 1:
                        if len(devices) >= worker_num * tp:
                            mesh_devices = devices[k * tp:(k + 1) * tp]
                        else:
                            mesh_devices = devices[:tp]
                    else:
                        device = devices[k % len(devices)]
                factory = build_model_factory(model_config, batch_size,
                                              device=device,
                                              mesh_devices=mesh_devices, seed=k)
            worker = Worker(
                worker_id=f"worker_{k}",
                model_factory=factory,
                task_queue=self.task_queue,
                master_event_queue=master_q,
                worker_event_queue=self.worker_event_queue,
                batch_size=batch_size,
                decode_block_size=decode_block_size,
                lockstep=lockstep,
                slot_range=slot_range,
                state_pool_size=pool_n,
                warmup_programs=warmup_programs,
            )
            self.workers.append(worker)
            self.worker_threads.append(start_worker_thread(worker))

        loaded: set = set()
        deadline = asyncio.get_running_loop().time() + load_timeout
        while len(loaded) < worker_num:
            timeout = deadline - asyncio.get_running_loop().time()
            if timeout <= 0:
                missing = {w.worker_id for w in self.workers} - loaded
                raise RuntimeError(f"workers failed to load in time: {missing}")
            try:
                worker_id, kind, payload = await asyncio.wait_for(
                    self.worker_event_queue.queue.get(), timeout=min(timeout, 1.0))
            except asyncio.TimeoutError:
                continue
            if kind == "worker_loaded":
                if payload.get("status") != "success":
                    raise RuntimeError(f"worker {worker_id} failed to load: {payload}")
                loaded.add(worker_id)
            elif kind == "worker_performance":
                self._dispatch_perf((worker_id, payload))
        self._drain_task = asyncio.create_task(self._drain_events())

    def completion(
        self,
        prompt_str: str,
        prefill_tokens: Optional[List[int]] = None,
        state: Optional[RequestState] = None,
        priority: int = 0,
        temperature: float = DEFAULT_SAMPLING_CONFIG["temperature"],
        top_p: float = DEFAULT_SAMPLING_CONFIG["top_p"],
        top_k: int = DEFAULT_SAMPLING_CONFIG["top_k"],
        presence_penalty: float = DEFAULT_SAMPLING_CONFIG["presence_penalty"],
        frequency_penalty: float = DEFAULT_SAMPLING_CONFIG["frequency_penalty"],
        penalty_decay: float = DEFAULT_SAMPLING_CONFIG["penalty_decay"],
        stop_tokens: Optional[Sequence[int]] = DEFAULT_STOP_TOKENS,
        forbidden_tokens: Sequence[int] = (),
        max_tokens: Optional[int] = DEFAULT_SAMPLING_CONFIG["max_tokens"],
        task_id: Optional[str] = None,
        cache_prefill: bool = False,
        cache_prefill_padding: int = 0,
        return_logits: bool = False,
    ) -> AsyncEngineCompletion:
        """Create a streaming completion (reference engine_core.py:181-267)."""
        if state is not None and prefill_tokens is None:
            raise ValueError("prefill_tokens cannot be None when state is provided")
        if not self.is_initialized:
            raise RuntimeError("Engine not initialized")
        if self.is_shutdown:
            raise RuntimeError("Engine has been shutdown")
        if not prefill_tokens:
            prefill_tokens = self.tokenizer.encode(prompt_str)
        result_channel = ThreadSafeAsyncQueue(self.event_loop)
        return AsyncEngineCompletion(
            prompt_str=prompt_str,
            prefill_tokens=list(prefill_tokens),
            state=state,
            task_queue=self.task_queue,
            result_channel=result_channel,
            task_id=task_id or str(uuid.uuid4()),
            priority=priority,
            temperature=temperature,
            top_p=top_p,
            top_k=top_k,
            presence_penalty=presence_penalty,
            frequency_penalty=frequency_penalty,
            penalty_decay=penalty_decay,
            stop_tokens=stop_tokens,
            forbidden_tokens=forbidden_tokens,
            max_tokens=max_tokens,
            cache_prefill=cache_prefill,
            cache_prefill_padding=cache_prefill_padding,
            return_logits=return_logits,
        )

    def shutdown(self) -> None:
        """Broadcast shutdown to all workers (reference engine_core.py:269-288)."""
        if self.is_shutdown:
            return
        self.is_shutdown = True
        if self._drain_task is not None:
            self._drain_task.cancel()
        for q in self.event_queues:
            q.put_nowait({"type": "shutdown"})

    def join(self, timeout: Optional[float] = 10.0) -> None:
        for t in self.worker_threads:
            t.join(timeout=timeout)

    # ------------------------------------------------------------- telemetry

    def _dispatch_perf(self, item):
        for q in self._perf_listeners:
            try:
                q.put_nowait(item)
            except asyncio.QueueFull:
                pass

    async def iter_worker_performance(self):
        """Async-iterate worker telemetry (reference engine_core.py:290-325)."""
        listener: asyncio.Queue = asyncio.Queue(maxsize=1000)
        self._perf_listeners.append(listener)
        try:
            while not self.is_shutdown:
                yield await listener.get()
        finally:
            self._perf_listeners.remove(listener)

    async def _drain_events(self):
        while True:
            worker_id, kind, payload = await self.worker_event_queue.queue.get()
            if kind == "worker_performance":
                self._dispatch_perf((worker_id, payload))
