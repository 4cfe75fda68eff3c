"""N concurrent non-streaming chat completions against a running server
(equivalent of the reference's scripts/demo_api_non_streaming_concurrent.py).

    python scripts/demo_api_non_streaming_concurrent.py --url http://127.0.0.1:8000 \
        --concurrency 8 --max_tokens 64
"""

import argparse
import asyncio
import time

import aiohttp


async def one(session, url, args, idx):
    body = {
        "model": args.model,
        "messages": [{"role": "user",
                      "content": f"Introduce yourself in style number {idx}."}],
        "stream": False,
        "max_tokens": args.max_tokens,
        "temperature": 1.0,
        "top_p": 0.5,
    }
    t0 = time.time()
    async with session.post(f"{url}/v1/chat/completions", json=body) as resp:
        data = await resp.json()
    dt = time.time() - t0
    if "error" in data:
        print(f"[{idx}] error: {data['error']}")
        return 0
    usage = data.get("usage", {})
    n = usage.get("completion_tokens", 0)
    text = data["choices"][0]["message"]["content"]
    print(f"[{idx}] {n} tokens in {dt:.1f}s ({n / max(dt, 1e-9):.1f} tok/s): "
          f"{text[:80]!r}")
    return n


async def main(args):
    timeout = aiohttp.ClientTimeout(total=None)
    async with aiohttp.ClientSession(timeout=timeout) as session:
        t0 = time.time()
        counts = await asyncio.gather(
            *(one(session, args.url, args, i) for i in range(args.concurrency)))
        dt = time.time() - t0
    total = sum(counts)
    print(f"\n{args.concurrency} requests, {total} tokens in {dt:.1f}s "
          f"= {total / max(dt, 1e-9):.1f} tok/s aggregate")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://127.0.0.1:8000")
    ap.add_argument("--model", default="rwkv-latest")
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--max_tokens", type=int, default=64)
    asyncio.run(main(ap.parse_args()))
