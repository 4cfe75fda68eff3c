"""MMLU accuracy through the full engine path — the accuracy-parity harness
(equivalent of the reference's scripts/test_mmlu/test_mmlu.py: prefill the prompt
with max_tokens=1 and return_logits=True, then argmax the log-probs of the four
answer-letter tokens).

    python scripts/test_mmlu.py --model_path model.pth --vocab_path vocab.txt \
        --data_dir mmlu_test_dataset [--limit 500]

The dataset directory holds HF-datasets-style parquet/csv with columns
(question, choices, answer, subject); a --jsonl file with those fields also works.
"""

import argparse
import asyncio
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")

TEMPLATE = (
    "User: You are a very talented expert in <SUBJECT>. Answer this question:\n"
    "<Q>\nA. <|A|>\nB. <|B|>\nC. <|C|>\nD. <|D|>\n\nAssistant: The answer is"
)


def format_question(subject: str, question: str, choices) -> str:
    out = TEMPLATE.replace("<SUBJECT>", subject.replace("_", " "))
    out = out.replace("<Q>", question.strip())
    for tag, choice in zip(("<|A|>", "<|B|>", "<|C|>", "<|D|>"), choices):
        out = out.replace(tag, str(choice).strip())
    return out


def load_samples(args):
    if args.jsonl:
        with open(args.jsonl) as f:
            for line in f:
                yield json.loads(line)
        return
    import datasets  # HF datasets (baked into this image via transformers extras)

    ds = datasets.load_dataset(args.data_dir)["test"]
    for row in ds:
        yield row


async def main(args):
    if os.environ.get("JAX_PLATFORMS"):
        # some hosts override jax_platforms at import (env alone is ignored);
        # re-apply so `JAX_PLATFORMS=cpu` runs the harness CPU-only
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from chirrup_tpu.engine.engine import AsyncEngineCore
    from chirrup_tpu.engine.structures import ModelLoadConfig

    synthetic = None
    if args.synthetic:
        L, C = (int(x) for x in args.synthetic.split(","))
        synthetic = dict(n_layer=L, n_embd=C, vocab_size=65536)
    config = ModelLoadConfig(model_path=args.model_path, vocab_path=args.vocab_path,
                             quantization=None if args.no_quant else "int8",
                             synthetic_config=synthetic)
    engine = AsyncEngineCore()
    await engine.init(worker_num=1, model_config=config,
                      batch_size=args.batch_size)

    tok = engine.tokenizer
    answer_ids = [tok.encode(" A")[0], tok.encode(" B")[0],
                  tok.encode(" C")[0], tok.encode(" D")[0]]

    correct = total = 0
    by_subject = defaultdict(lambda: [0, 0])
    sem = asyncio.Semaphore(args.batch_size * 2)

    async def eval_one(row):
        nonlocal correct, total
        async with sem:
            prompt = format_question(row.get("subject", ""), row["question"],
                                     row["choices"])
            completion = engine.completion(
                prompt, prefill_tokens=[0] + tok.encode(prompt),
                max_tokens=1, temperature=0.0, return_logits=True,
                presence_penalty=0.0, frequency_penalty=0.0, stop_tokens=[])
            logits = None
            async for event in completion:
                if event[0] == "token" and len(event) > 3:
                    logits = event[3]
            if logits is None:
                return
            scores = np.asarray([logits[i] for i in answer_ids])
            pred = int(np.argmax(scores))
            ans = row["answer"] if isinstance(row["answer"], int) \
                else "ABCD".index(str(row["answer"]).strip()[0])
            total += 1
            by_subject[row.get("subject", "?")][1] += 1
            if pred == ans:
                correct += 1
                by_subject[row.get("subject", "?")][0] += 1
            if total % 50 == 0:
                print(f"  {total}: acc {correct / total:.4f}")

    samples = list(load_samples(args))
    if args.limit:
        samples = samples[: args.limit]
    await asyncio.gather(*[eval_one(r) for r in samples])

    print(f"\nMMLU accuracy: {correct}/{total} = {correct / max(total, 1):.4f}")
    for subject, (c, t) in sorted(by_subject.items()):
        print(f"  {subject:40s} {c:4d}/{t:4d} = {c / max(t, 1):.4f}")
    engine.shutdown()
    # join the worker threads: a daemon thread still inside a jax call when the
    # interpreter exits aborts the process ("FATAL: exception not rethrown")
    engine.join(timeout=15)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", default="")
    ap.add_argument("--synthetic", default="",
                    help="'L,C' random model for harness smoke tests")
    ap.add_argument("--vocab_path",
                    default="/root/reference/Albatross/rwkv_vocab_v20230424.txt")
    ap.add_argument("--data_dir", default="mmlu_test_dataset")
    ap.add_argument("--jsonl", default="")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--no_quant", action="store_true")
    asyncio.run(main(ap.parse_args()))
