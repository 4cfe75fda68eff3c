"""Multi-host scaling-efficiency benchmark: aggregate decode tokens/s through the
DP router at 1 backend vs N backends (BASELINE target: >=85% efficiency 1 -> N).

On a real pod: start `python -m chirrup_tpu.server` on each host, then

    python scripts/benchmark_scaling.py --backends http://h0:8000,http://h1:8000 \
        --concurrency_per_backend 64 --max_tokens 128

The script measures aggregate tok/s with only the first backend enabled, then
with all N, and reports N-host efficiency = tps_N / (N * tps_1).

Harness validation without hardware: --spawn_synthetic N forks N local
single-worker servers with a synthetic model on CPU and runs the same flow.
"""

import argparse
import asyncio
import json
import os
import subprocess
import sys
import time

import aiohttp

sys.path.insert(0, ".")


async def one_stream(session, url, args, idx, counts):
    body = {
        "model": "rwkv-latest:no-thinking",
        "messages": [{"role": "user",
                      "content": f"Write a long story, variant {idx}."}],
        "stream": True, "max_tokens": args.max_tokens,
        "temperature": 1.0, "top_p": 0.5,
        # benchmark extra: run to max_tokens even when the model samples a
        # stop token (synthetic models hit one within a couple of tokens)
        "ignore_eos": True,
        # a pure decode-scaling measure: the prefix cache would otherwise let
        # the N-backend round skip prefills the 1-backend round already did,
        # inflating "efficiency" past 100%
        "use_state_cache": False, "cache_prefill": False,
    }
    try:
        async with session.post(f"{url}/v1/chat/completions", json=body) as resp:
            # readline, not chunk iteration: one SSE event == one "data:" line,
            # but a network chunk can carry several lines (chunk iteration
            # undercounts tokens badly)
            while True:
                raw = await resp.content.readline()
                if not raw:
                    break
                if raw.startswith(b"data: ") and b"[DONE]" not in raw:
                    counts[0] += 1
    except (aiohttp.ClientError, asyncio.TimeoutError) as exc:
        print(f"stream {idx} error: {exc}")


async def measure(url, n_streams, args) -> float:
    timeout = aiohttp.ClientTimeout(total=None)
    async with aiohttp.ClientSession(timeout=timeout) as session:
        # warmup: compiles every backend's step programs and fills the batch
        # pipeline, so the measured round sees steady state (without this the
        # single-backend round eats the jit compile and "efficiency" inflates)
        warm = [0]
        await asyncio.gather(
            *(one_stream(session, url, args, i, warm)
              for i in range(n_streams)))
        counts = [0]
        t0 = time.time()
        await asyncio.gather(
            *(one_stream(session, url, args, i, counts)
              for i in range(n_streams)))
        dt = time.time() - t0
    return counts[0] / dt


async def run(args, backends):
    from aiohttp import web
    from chirrup_tpu.server.router import create_router_app

    per = args.concurrency_per_backend

    async def route_and_measure(urls, n_streams):
        app = create_router_app(urls)
        runner = web.AppRunner(app)
        await runner.setup()
        site = web.TCPSite(runner, "127.0.0.1", 0)
        await site.start()
        port = site._server.sockets[0].getsockname()[1]
        try:
            return await measure(f"http://127.0.0.1:{port}", n_streams, args)
        finally:
            await runner.cleanup()

    tps_1 = await route_and_measure(backends[:1], per)
    print(f"1 backend:  {tps_1:8.1f} tok/s aggregate ({per} streams)")
    n = len(backends)
    tps_n = await route_and_measure(backends, per * n)
    eff = tps_n / (n * tps_1) if tps_1 else 0.0
    print(f"{n} backends: {tps_n:8.1f} tok/s aggregate ({per * n} streams)")
    print(f"scaling efficiency 1->{n}: {100 * eff:.1f}%  (target >= 85%)")
    return eff


def spawn_synthetic(n, base_port):
    """Fork n CPU synthetic-model servers; returns (urls, processes)."""
    procs = []
    urls = []
    vocab = "/root/reference/Albatross/rwkv_vocab_v20230424.txt"
    if not os.path.exists(vocab):
        raise SystemExit(f"vocab not found: {vocab}")
    for i in range(n):
        port = base_port + i
        code = (
            "import jax; jax.config.update('jax_platforms','cpu');"
            "import sys, runpy;"
            f"sys.argv=['chirrup_tpu.server','--synthetic_model','2,128',"
            f"'--vocab_path','{vocab}','--port','{port}',"
            "'--batch_size','8','--quantization','none'];"
            "runpy.run_module('chirrup_tpu.server', run_name='__main__')")
        # JAX_PLATFORMS must be cpu IN THE ENV: the server entrypoint re-applies
        # the env var over any config.update (so an ambient JAX_PLATFORMS=axon
        # would re-select a TPU backend here and hang if the tunnel is down)
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        procs.append(subprocess.Popen(
            [sys.executable, "-c", code],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, env=env))
        urls.append(f"http://127.0.0.1:{port}")
    return urls, procs


async def wait_healthy(urls, timeout_s=240):
    async with aiohttp.ClientSession() as session:
        deadline = time.time() + timeout_s
        for url in urls:
            while True:
                try:
                    async with session.get(f"{url}/health",
                                           timeout=aiohttp.ClientTimeout(
                                               total=3)) as r:
                        if r.status == 200:
                            break
                except (aiohttp.ClientError, asyncio.TimeoutError):
                    pass
                if time.time() > deadline:
                    raise SystemExit(f"backend {url} never became healthy")
                await asyncio.sleep(2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backends", default="",
                    help="comma-separated serving-host URLs")
    ap.add_argument("--spawn_synthetic", type=int, default=0,
                    help="fork N local synthetic CPU servers instead")
    ap.add_argument("--base_port", type=int, default=8461)
    ap.add_argument("--concurrency_per_backend", type=int, default=16)
    ap.add_argument("--max_tokens", type=int, default=64)
    args = ap.parse_args()

    procs = []
    if args.spawn_synthetic:
        backends, procs = spawn_synthetic(args.spawn_synthetic, args.base_port)
    else:
        backends = [u for u in args.backends.split(",") if u]
        if not backends:
            raise SystemExit("need --backends or --spawn_synthetic")
    try:
        asyncio.run(_amain(args, backends))
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            p.wait(timeout=10)


async def _amain(args, backends):
    if args.spawn_synthetic:
        await wait_healthy(backends)
    await run(args, backends)


if __name__ == "__main__":
    main()
