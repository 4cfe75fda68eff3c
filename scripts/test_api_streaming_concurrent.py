"""Concurrent SSE load test against a running server — the TPOT/TPS harness behind
the headline numbers (equivalent of the reference's
scripts/test_api_streaming_concurrent.py:38-75).

    python scripts/test_api_streaming_concurrent.py --url http://127.0.0.1:8000 \
        --concurrency 64 --max_tokens 128
"""

import argparse
import asyncio
import json
import sys
import time
from collections import deque

import aiohttp


async def one_stream(session, url, args, stats, idx):
    body = {
        "model": "rwkv-latest:no-thinking",
        "messages": [{"role": "user",
                      "content": f"Write a story about place number {idx}."}],
        "stream": True, "max_tokens": args.max_tokens,
        "temperature": 1.0, "top_p": 0.5,
        **({"ignore_eos": True} if args.ignore_eos else {}),
    }
    tpot = deque(maxlen=5)  # rolling mean of last 5 inter-token deltas
    last = None
    n = 0
    try:
        async with session.post(f"{url}/v1/chat/completions", json=body) as resp:
            while True:
                raw = await resp.content.readline()
                if not raw:
                    break
                line = raw.decode().strip()
                if not line.startswith("data: ") or line == "data: [DONE]":
                    continue
                now = time.time()
                if last is not None:
                    tpot.append(now - last)
                last = now
                n += 1
                stats["tokens"] += 1
                if tpot:
                    stats["tpot"][idx] = sum(tpot) / len(tpot)
    except Exception as exc:  # noqa: BLE001
        stats["errors"] += 1
        print(f"[{idx}] error: {exc}", file=sys.stderr)
    stats["done"] += 1
    return n


async def reporter(stats, args):
    t0 = time.time()
    last_tokens = 0
    while stats["done"] < args.concurrency:
        await asyncio.sleep(1.0)
        cur = stats["tokens"]
        tps = cur - last_tokens
        last_tokens = cur
        tpots = list(stats["tpot"].values())
        mean_tpot = sum(tpots) / len(tpots) if tpots else 0
        print(f"[{time.time() - t0:6.1f}s] aggregate {tps:6.0f} tok/s | "
              f"mean TPOT {mean_tpot * 1000:6.1f} ms | "
              f"per-req {1 / mean_tpot if mean_tpot else 0:5.1f} tok/s | "
              f"done {stats['done']}/{args.concurrency}")


async def main(args):
    stats = {"tokens": 0, "done": 0, "errors": 0, "tpot": {}}
    conn = aiohttp.TCPConnector(limit=args.concurrency + 10)
    async with aiohttp.ClientSession(connector=conn) as session:
        rep = asyncio.create_task(reporter(stats, args))
        t0 = time.time()
        results = await asyncio.gather(*[
            one_stream(session, args.url, args, stats, i)
            for i in range(args.concurrency)])
        dt = time.time() - t0
        rep.cancel()
    total = sum(results)
    print(f"\n{args.concurrency} streams: {total} tokens in {dt:.1f}s = "
          f"{total / dt:.0f} tok/s aggregate, "
          f"{total / dt / args.concurrency:.1f} tok/s/request, "
          f"{stats['errors']} errors")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://127.0.0.1:8000")
    ap.add_argument("--concurrency", type=int, default=64)
    ap.add_argument("--max_tokens", type=int, default=128)
    ap.add_argument("--ignore_eos", action="store_true",
                    help="disable stop tokens (synthetic-model load tests)")
    asyncio.run(main(ap.parse_args()))
