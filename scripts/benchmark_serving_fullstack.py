"""FULL-STACK serving benchmark: the real server + HTTP/SSE path on TPU.

Answers the question bench.py cannot: what does the complete stack deliver —
Worker thread scheduling, run_once Python overhead, per-token output_queue
events across the thread/asyncio bridge, StreamingDecoder, SSE frame writes —
at the headline config (7.2B INT8 synthetic, batch 200, 200 concurrent
streams)? The reference's headline was measured exactly this way
(/root/reference/scripts/test_api_streaming_concurrent.py:38-75).

Orchestration: spawn `python -m chirrup_tpu.server --synthetic_model ...`,
wait for /health, fire ONE warmup request (compiles the decode block — the
axon remote compile is load-dependent, 1-8 min), then run N concurrent SSE
streams and report aggregate tok/s + mean TPOT.

    python scripts/benchmark_serving_fullstack.py            # 7.2B, 200 streams
    python scripts/benchmark_serving_fullstack.py --tiny     # CPU smoke (2,128)
"""

import argparse
import asyncio
import json
import os
import signal
import subprocess
import sys
import time
from collections import deque

import aiohttp

REPO = os.path.join(os.path.dirname(__file__), "..")
VOCAB = "/root/reference/Albatross/rwkv_vocab_v20230424.txt"


async def wait_health(url, timeout_s):
    deadline = time.time() + timeout_s
    async with aiohttp.ClientSession() as s:
        while time.time() < deadline:
            try:
                async with s.get(f"{url}/health") as r:
                    if r.status == 200:
                        return True
            except Exception:  # noqa: BLE001
                pass
            await asyncio.sleep(2.0)
    return False


async def one_stream(session, url, args, stats, idx, max_tokens):
    content = f"Write a story about place number {idx}."
    if args.prompt_words:
        # long prompts for cold-burst TTFT measurement; --shared_prompts
        # makes them identical so the state cache + prefill dedup absorb the
        # burst (one leader prefills, everyone else resumes from its
        # snapshot) — the two TTFT regimes the docs must distinguish
        import random
        seed = 1234 if args.shared_prompts else idx
        rng = random.Random(seed)
        words = ("river stone market lantern harbor story cloud garden "
                 "mountain song bridge winter").split()
        filler = " ".join(rng.choice(words) for _ in range(args.prompt_words))
        tail = "" if args.shared_prompts else f" (case {idx})"
        content = f"{filler}. Write a story about this place{tail}."
    body = {
        "model": "rwkv-latest:no-thinking",
        "messages": [{"role": "user", "content": content}],
        "stream": True, "max_tokens": max_tokens,
        "temperature": 1.0, "top_p": 0.5, "ignore_eos": True,
    }
    first = last = None
    n = 0
    usage_ct = None
    t_start = time.time()
    pending = b""
    try:
        async with session.post(f"{url}/v1/chat/completions", json=body,
                                timeout=aiohttp.ClientTimeout(total=3600)) as resp:
            # chunked reads + frame counting: a per-line readline() await per
            # token made the CLIENT the bottleneck above ~6k tok/s (one
            # python loop parsing every SSE line of hundreds of streams) —
            # measured as a 7.3k-produced vs 5.9k-observed gap at B=384
            async for chunk in resp.content.iter_chunked(1 << 16):
                now = time.time()
                pending += chunk
                lines = pending.split(b"\n")
                pending = lines.pop()
                k = 0
                for l in lines:
                    if l.startswith(b"data: {"):
                        k += 1
                        if b'"completion_tokens"' in l:
                            # terminal frame: server-counted usage — the
                            # authoritative token total (frames undercount:
                            # think-tag routing merges token runs)
                            try:
                                u = json.loads(l[6:]).get("usage") or {}
                                usage_ct = u.get("completion_tokens")
                            except Exception:  # noqa: BLE001
                                pass
                if not k:
                    continue
                if first is None:
                    first = now
                    stats["ttft"].append(now - t_start)
                last = now
                n += k
                stats["tokens"] += k
                stats["times"].extend([now] * k)
    except Exception as exc:  # noqa: BLE001
        stats["errors"] += 1
        if stats["errors"] <= 3:
            print(f"[{idx}] error: {exc}", file=sys.stderr)
    if usage_ct:
        stats["usage_tokens"] += usage_ct
    if n > 1 and last is not None and last > first:
        stats["tpot"][idx] = (last - first) / (n - 1)
    stats["done"] += 1
    return n


async def run_load(url, args):
    stats = {"tokens": 0, "done": 0, "errors": 0, "tpot": {}, "ttft": [],
             "times": [], "usage_tokens": 0}
    conn = aiohttp.TCPConnector(limit=args.concurrency + 10)
    async with aiohttp.ClientSession(connector=conn) as session:
        # warmup: compiles every serving program — the decode block via a
        # short request, the prefill chunk variants + snapshot extract via a
        # long-prompt one (compiles are serial; do them before measuring)
        print(f"# warmup requests (compile; may take minutes) ...", flush=True)
        t0 = time.time()
        wstats = dict(stats, tpot={}, ttft=[])
        n = await one_stream(session, url, args, wstats, -1, 8)
        print(f"# warmup 1 (short): {n} tokens in {time.time()-t0:.0f}s",
              flush=True)
        t1 = time.time()
        long_args = argparse.Namespace(**vars(args))
        body_filler = "many words " * 400  # ~1.2k tokens -> chunked prefill

        async def long_warm():
            body = {"model": "rwkv-latest:no-thinking",
                    "messages": [{"role": "user", "content": body_filler}],
                    "stream": True, "max_tokens": 4, "ignore_eos": True}
            async with session.post(f"{url}/v1/chat/completions", json=body,
                                    timeout=aiohttp.ClientTimeout(
                                        total=3600)) as resp:
                async for _ in resp.content:
                    pass

        await long_warm()
        print(f"# warmup 2 (long prompt): {time.time()-t1:.0f}s", flush=True)

        async def reporter():
            t0 = time.time()
            prev = 0
            while stats["done"] < args.concurrency:
                await asyncio.sleep(2.0)
                cur = stats["tokens"]
                tpots = list(stats["tpot"].values())
                mean_tpot = sum(tpots) / len(tpots) if tpots else 0
                perf = ""
                try:
                    async with session.get(f"{url}/metrics") as m:
                        j = await m.json()
                    w = next(iter(j["workers"].values()), None)
                    if w:
                        td = w.get("task_details", {})
                        perf = (f" | loop {w['avg_loop_time']*1000:5.0f} ms"
                                f" d{td.get('decode_count', '?')}"
                                f" p{td.get('one_prefill_count', '?')}"
                                f" s{td.get('seq_prefill_count', '?')}")
                except Exception:  # noqa: BLE001
                    pass
                print(f"[{time.time()-t0:6.1f}s] {(cur-prev)/2:7.0f} tok/s | "
                      f"TPOT {mean_tpot*1000:6.1f} ms | "
                      f"done {stats['done']}/{args.concurrency}{perf}",
                      flush=True)
                prev = cur

        rep = asyncio.create_task(reporter())
        t0 = time.time()
        results = await asyncio.gather(*[
            one_stream(session, url, args, stats, i, args.max_tokens)
            for i in range(args.concurrency)])
        dt = time.time() - t0
        rep.cancel()
    total = sum(results)
    tpots = list(stats["tpot"].values())
    ttfts = sorted(stats["ttft"])
    # The client counts SSE CONTENT FRAMES; the think-tag parser merges each
    # coalesced block's token texts into state runs, so frames undercount
    # tokens by ~20% at full batch. The server's terminal usage frames give
    # the MEASURED token total (correction-free); the old inferred
    # expected-total scale (exact under ignore_eos) is kept as fallback and
    # cross-check.
    usage_total = stats["usage_tokens"]
    expected = args.concurrency * args.max_tokens
    if usage_total and total and stats["errors"] == 0:
        # errored streams' frames are in `total` but their tokens never
        # reach usage_total — the usage basis would bias LOW exactly in
        # degraded runs, so it requires a clean run (like the old basis)
        scale, scale_basis = usage_total / total, "server_usage"
    elif total and stats["errors"] == 0:
        scale, scale_basis = expected / total, "expected_total"
    else:
        scale, scale_basis = 1.0, "none"
    # steady-state rate: tokens/s over the mid-half of the token stream
    # (25th..75th percentile timestamps) — excludes the admission ramp and
    # the drain tail, the window where all streams are decoding together
    times = sorted(stats["times"])
    steady = None
    if len(times) > 100:
        lo, hi = times[len(times) // 4], times[3 * len(times) // 4]
        if hi > lo:
            steady = round((len(times) // 2) / (hi - lo) * scale, 1)
    out = {
        "metric": "full-stack serving decode tok/s (HTTP/SSE, synthetic "
                  f"{args.model_size}, batch {args.batch}, "
                  f"{args.concurrency} streams)",
        "aggregate_tok_s": round(total / dt * scale, 1),
        "steady_tok_s": steady,
        "frame_to_token_scale": round(scale, 3),
        "scale_basis": scale_basis,
        "usage_tokens": usage_total or None,
        "tok_s_per_request": round(total / dt * scale / args.concurrency, 2),
        "mean_tpot_ms": round(1000 * sum(tpots) / max(len(tpots), 1)
                              / scale, 1),
        "ttft_p50_s": round(ttfts[len(ttfts) // 2], 2) if ttfts else None,
        "ttft_p95_s": round(ttfts[int(len(ttfts) * 0.95)], 2) if ttfts else None,
        "errors": stats["errors"],
        "total_frames": total,
        "total_tokens": round(total * scale),
        "wall_s": round(dt, 1),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="CPU smoke (L2,C128)")
    ap.add_argument("--concurrency", type=int, default=0)
    ap.add_argument("--max_tokens", type=int, default=256)
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--port", type=int, default=8077)
    ap.add_argument("--no-spawn", action="store_true",
                    help="benchmark an already-running server at --port")
    ap.add_argument("--state_cache_size", type=int, default=50)
    ap.add_argument("--decode_block_size", type=int, default=0,
                    help="server decode-block steps (0 = worker default)")
    ap.add_argument("--prompt_words", type=int, default=0,
                    help="pad prompts to ~this many words (cold-burst TTFT)")
    ap.add_argument("--shared_prompts", action="store_true",
                    help="identical prompts (state-cache/dedup regime) "
                         "instead of per-stream distinct ones")
    args = ap.parse_args()

    if args.tiny:
        args.model_size = "2,128"
        args.batch = args.batch or 8
        args.concurrency = args.concurrency or 8
        health_timeout = 180
    else:
        args.model_size = "32,4096"
        args.batch = args.batch or 200
        args.concurrency = args.concurrency or 200
        health_timeout = 600
    url = f"http://127.0.0.1:{args.port}"

    proc = None
    if not args.no_spawn:
        cmd = [sys.executable, "-u", "-m", "chirrup_tpu.server",
               "--synthetic_model", args.model_size,
               "--vocab_path", VOCAB,
               "--batch_size", str(args.batch),
               "--state_cache_size", str(args.state_cache_size),
               "--port", str(args.port),
               "--host", "127.0.0.1"]
        if args.decode_block_size:
            cmd += ["--decode_block_size", str(args.decode_block_size)]
        env = dict(os.environ)
        if args.tiny:
            env["JAX_PLATFORMS"] = "cpu"
        print("#", " ".join(cmd), flush=True)
        proc = subprocess.Popen(cmd, cwd=REPO, env=env,
                                stdout=open("/tmp/fullstack_server.log", "wb"),
                                stderr=subprocess.STDOUT,
                                start_new_session=True)
    try:
        ok = asyncio.run(wait_health(url, health_timeout))
        if not ok:
            print("server never became healthy; see /tmp/fullstack_server.log",
                  file=sys.stderr)
            sys.exit(1)
        asyncio.run(run_load(url, args))
    finally:
        if proc is not None:
            # kill the exact process group we started (never by pattern)
            os.killpg(proc.pid, signal.SIGTERM)
            try:
                proc.wait(timeout=10)
            except subprocess.TimeoutExpired:
                os.killpg(proc.pid, signal.SIGKILL)


if __name__ == "__main__":
    main()
