"""Interactive CLI chat against a running server with a live TPS meter
(equivalent of the reference's scripts/demo_api_streaming_interact.py).

    python scripts/demo_api_streaming_interact.py --url http://127.0.0.1:8000
"""

import argparse
import asyncio
import json
import sys
import time

import aiohttp


async def chat(args):
    history = []
    async with aiohttp.ClientSession() as session:
        while True:
            try:
                user = input("\nYou: ").strip()
            except (EOFError, KeyboardInterrupt):
                break
            if not user or user in ("/quit", "/exit"):
                break
            history.append({"role": "user", "content": user})
            body = {
                "model": args.model,
                "messages": history,
                "stream": True,
                "max_tokens": args.max_tokens,
                "temperature": args.temperature,
                "top_p": args.top_p,
            }
            print("Assistant: ", end="", flush=True)
            reply = []
            n_tok = 0
            t_first = None
            async with session.post(f"{args.url}/v1/chat/completions",
                                    json=body) as resp:
                if resp.status != 200:
                    print(f"[HTTP {resp.status}] {await resp.text()}")
                    history.pop()
                    continue
                async for raw in resp.content:
                    line = raw.decode().strip()
                    if not line.startswith("data: ") or line == "data: [DONE]":
                        continue
                    chunk = json.loads(line[len("data: "):])
                    delta = chunk["choices"][0].get("delta", {})
                    piece = delta.get("content") or ""
                    if piece:
                        if t_first is None:
                            t_first = time.time()
                        n_tok += 1
                        reply.append(piece)
                        print(piece, end="", flush=True)
            if t_first is not None and n_tok > 1:
                tps = (n_tok - 1) / max(time.time() - t_first, 1e-9)
                print(f"\n[{n_tok} tokens, {tps:.1f} tok/s]")
            history.append({"role": "assistant", "content": "".join(reply)})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://127.0.0.1:8000")
    ap.add_argument("--model", default="rwkv-latest")
    ap.add_argument("--max_tokens", type=int, default=2048)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--top_p", type=float, default=0.3)
    asyncio.run(chat(ap.parse_args()))


if __name__ == "__main__":
    main()
