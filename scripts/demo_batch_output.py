"""Batch completion demo with live worker telemetry (equivalent of the reference's
scripts/demo_batch_output.py): N prompts through the engine concurrently, printing
per-worker loop stats while they generate."""

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
    await engine.init(worker_num=args.worker_num, model_config=config,
                      batch_size=args.batch_size)

    prompts = [f"User: tell me fact #{i} about birds\n\nAssistant:"
               for i in range(args.n)]
    completions = [
        engine.completion(p, prefill_tokens=[0] + engine.tokenizer.encode(p),
                          temperature=1.0, top_p=0.5, max_tokens=args.max_tokens)
        for p in prompts
    ]

    async def telemetry():
        async for worker_id, perf in engine.iter_worker_performance():
            d = perf.get("task_details", {})
            print(f"[{worker_id}] loop {perf['avg_loop_time']*1000:6.1f} ms | "
                  f"decode {d.get('decode_count', 0):3d} | "
                  f"prefill {d.get('seq_prefill_count', 0):2d}", file=sys.stderr)

    telem = asyncio.create_task(telemetry())
    t0 = time.time()
    texts = await asyncio.gather(*[c.get_full_completion() for c in completions])
    dt = time.time() - t0
    telem.cancel()

    total = sum(len(c.task.generated_tokens) for c in completions)
    for i, text in enumerate(texts[:4]):
        print(f"--- [{i}] {text[:160]!r}")
    print(f"\n{args.n} prompts, {total} tokens in {dt:.1f}s = "
          f"{total/dt:.0f} tok/s aggregate")
    engine.shutdown()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", default="")
    ap.add_argument("--vocab_path",
                    default="/root/reference/Albatross/rwkv_vocab_v20230424.txt")
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--max_tokens", type=int, default=100)
    ap.add_argument("--worker_num", type=int, default=1)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--no_quant", action="store_true")
    asyncio.run(main(ap.parse_args()))
