"""Streaming engine demo: one request, tokens printed as they decode.

Equivalent of the reference's scripts/demo_stream_output.py. Run with a real
checkpoint:
    python scripts/demo_stream_output.py --model_path /path/model.pth \
        --vocab_path /path/rwkv_vocab_v20230424.txt
or smoke-test with a synthetic model: add --synthetic.
"""

import argparse
import asyncio
import sys
import time

sys.path.insert(0, ".")


async def main(args):
    from chirrup_tpu.engine.engine import AsyncEngineCore
    from chirrup_tpu.engine.structures import ModelLoadConfig

    synthetic = None
    if args.synthetic:
        synthetic = dict(n_layer=12, n_embd=768, vocab_size=65536)
    config = ModelLoadConfig(
        model_path=args.model_path, vocab_path=args.vocab_path,
        quantization=None if args.no_quant else "int8",
        synthetic_config=synthetic)

    engine = AsyncEngineCore()
    print("loading model ...")
    await engine.init(worker_num=args.worker_num, model_config=config,
                      batch_size=args.batch_size)

    prompt = args.prompt
    completion = engine.completion(
        prompt, prefill_tokens=[0] + engine.tokenizer.encode(prompt),
        temperature=args.temperature, top_p=args.top_p, max_tokens=args.max_tokens)

    n, t0 = 0, time.time()
    async for event in completion:
        if event[0] == "token":
            n += 1
            print(event[2], end="", flush=True)
    dt = time.time() - t0
    print(f"\n\n[{n} tokens in {dt:.1f}s = {n / dt:.1f} tok/s]")
    engine.shutdown()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", default="")
    ap.add_argument("--vocab_path",
                    default="/root/reference/Albatross/rwkv_vocab_v20230424.txt")
    ap.add_argument("--prompt", default="User: tell me about birds\n\nAssistant:")
    ap.add_argument("--max_tokens", type=int, default=200)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--top_p", type=float, default=0.3)
    ap.add_argument("--worker_num", type=int, default=1)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--no_quant", action="store_true")
    asyncio.run(main(ap.parse_args()))
