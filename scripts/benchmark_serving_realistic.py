"""Realistic-load serving benchmark: Poisson arrivals, finite generations,
shared-prefix traffic (VERDICT r3 item 3).

The fullstack benchmark (benchmark_serving_fullstack.py) measures the
decode-friendliest possible load: N fixed streams, ignore_eos, all prompts
distinct. A production server sees none of that — requests ARRIVE over time,
finish at different lengths (freeing slots mid-flight), and share prompt
prefixes (exercising the state cache + prefill-dedup). This tool measures
that number, the one a user of the serving framework actually gets. It is
the open-loop analogue of the reference's own headline protocol (per-request
TPS under sustained concurrency,
/root/reference/scripts/test_api_streaming_concurrent.py:38-75).

Load model per phase (one phase per --load multiplier):
  - arrivals: Poisson with rate lam = load * capacity / (prompt_est +
    gen_median), where --capacity is the server's TOTAL (prefill + decode)
    token throughput under mixed load (default: the measured ~5k tok/s at
    7.2B) — a request consumes its prompt tokens AND its generated tokens;
  - 30% of requests repeat one of --n_prefixes SHARED full prompts
    (identical text -> the state cache + prefill dedup absorb their
    prefills, like repeated system prompts / retried requests); the rest
    are unique;
  - generation lengths ~ lognormal (median --gen_median, clipped to
    [8, --gen_cap]) via max_tokens, stop tokens active (finite generations).

Reported per phase: sustained aggregate tok/s (measured over the steady
window after ramp), TPOT p50/p99, TTFT p50/p99, completion counts, and the
server's state-cache hit rate from /metrics.

NOTE: the client counts SSE CONTENT FRAMES; the server's think-tag parser
merges each decode block's token texts into state runs, so frame counts
underestimate decode tokens by ~10-20% under load (finite stop-token
generations make the exact ratio unknowable client-side — treat
sustained_tok_s as a lower bound; benchmark_serving_fullstack.py corrects
for it exactly via ignore_eos).

    python scripts/benchmark_serving_realistic.py                 # 7.2B TPU
    python scripts/benchmark_serving_realistic.py --tiny          # CPU smoke
    python scripts/benchmark_serving_realistic.py --loads 0.5,0.8,1.2
"""

import argparse
import asyncio
import json
import os
import random
import signal
import subprocess
import sys
import time

import aiohttp

REPO = os.path.join(os.path.dirname(__file__), "..")
VOCAB = "/root/reference/Albatross/rwkv_vocab_v20230424.txt"

WORDS = ("the quick brown fox jumps over a lazy dog while many small "
         "rivers flow toward distant mountains carrying stories of old "
         "cities and new travelers who wander through markets gardens "
         "libraries and harbors trading spices maps lanterns and songs").split()


def make_prompt(rng, n_words):
    return " ".join(rng.choice(WORDS) for _ in range(n_words))


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


async def fetch_cache_stats(session, url):
    try:
        async with session.get(f"{url}/metrics") as r:
            j = await r.json()
        return j.get("state_cache") or {}
    except Exception:  # noqa: BLE001
        return {}


async def one_request(session, url, prompt, max_tokens, events, t_arrive,
                      cache_prefill=False):
    """Streams one completion; events get ("ttft",...) / ("tok",...) and a
    per-request mean TPOT at completion (coalesced SSE frames make raw
    inter-token gaps bimodal-at-zero, so percentiles are over requests).

    cache_prefill is set only for SHARED-pool prompts: one-shot prompts
    snapshotting themselves would churn the small HBM pool's LRU and evict
    the reusable entries (the per-request opt-in mirrors how a client marks
    reusable system prompts)."""
    body = {
        "model": "rwkv-latest:no-thinking",
        "messages": [{"role": "user", "content": prompt}],
        "stream": True, "max_tokens": max_tokens,
        "temperature": 1.0, "top_p": 0.5,
        "cache_prefill": cache_prefill,
    }
    last = None
    n = 0
    gaps = []
    try:
        async with session.post(f"{url}/v1/chat/completions", json=body,
                                timeout=aiohttp.ClientTimeout(
                                    total=3600)) as resp:
            while True:
                raw = await resp.content.readline()
                if not raw:
                    break
                line = raw.decode().strip()
                if not line.startswith("data: ") or line == "data: [DONE]":
                    continue
                now = time.time()
                if '"completion_tokens"' in line:
                    # terminal frame: server-counted usage — authoritative
                    # (frames undercount ~1.2x: think-tag run merging)
                    try:
                        u = json.loads(line[6:]).get("usage") or {}
                        if u.get("completion_tokens"):
                            events.append(("usage", now,
                                           u["completion_tokens"]))
                    except Exception:  # noqa: BLE001
                        pass
                if last is None:
                    events.append(("ttft", now, now - t_arrive))
                else:
                    gaps.append(now - last)
                events.append(("tok", now, 1))
                last = now
                n += 1
    except Exception as exc:  # noqa: BLE001
        events.append(("err", time.time(), str(exc)))
    if gaps:
        events.append(("tpot", time.time(), sum(gaps) / len(gaps)))
    events.append(("done", time.time(), n))
    return n


async def fetch_pool_counters(session, url):
    try:
        async with session.get(f"{url}/metrics") as r:
            w = ((await r.json()).get("workers") or {}).values()
        return (sum(x.get("snapshot_skips", 0) for x in w),
                sum(x.get("snapshot_evictions", 0) for x in w))
    except Exception:  # noqa: BLE001
        return 0, 0


def percentile(xs, p):
    if not xs:
        return None
    xs = sorted(xs)
    return xs[min(int(len(xs) * p), len(xs) - 1)]


async def run_phase(url, args, load, rng):
    """One open-loop phase at `load` x estimated capacity."""
    # a request costs prompt + generation tokens; words -> tokens ~ 1.3x
    prompt_est = 1.3 * (args.prefix_tokens + args.suffix_tokens)
    lam = load * args.capacity / (prompt_est + args.gen_median)  # req/s
    duration = args.duration
    shared_pool = [make_prompt(rng, args.prefix_tokens + args.suffix_tokens)
                   for _ in range(args.n_prefixes)]
    events = []
    tasks = []
    conn = aiohttp.TCPConnector(limit=args.max_inflight + 10)
    async with aiohttp.ClientSession(connector=conn) as session:
        cache0 = await fetch_cache_stats(session, url)
        skips0, evicts0 = await fetch_pool_counters(session, url)
        t0 = time.time()
        i = 0
        while time.time() - t0 < duration:
            # Poisson arrivals: exponential inter-arrival gaps
            await asyncio.sleep(rng.expovariate(lam))
            if len([t for t in tasks if not t.done()]) >= args.max_inflight:
                events.append(("dropped", time.time(), 1))
                continue
            shared = rng.random() < args.shared_frac
            if shared:
                # identical full prompt from the shared pool: trie-cached
                # prefixes only match prompts that REPEAT (the cache keys on
                # full prompts minus padding, reference semantics)
                prompt = rng.choice(shared_pool)
            else:
                prompt = make_prompt(rng,
                                     args.prefix_tokens + args.suffix_tokens)
            gen = int(min(max(rng.lognormvariate(
                __import__("math").log(args.gen_median), 0.6), 8),
                args.gen_cap))
            tasks.append(asyncio.create_task(one_request(
                session, url, prompt, gen, events, time.time(),
                cache_prefill=shared)))
            i += 1
        # drain
        if tasks:
            await asyncio.wait(tasks, timeout=600)
        cache1 = await fetch_cache_stats(session, url)
        skips1, evicts1 = await fetch_pool_counters(session, url)
        ttft_srv = None
        try:
            async with session.get(f"{url}/metrics") as r:
                ttft_srv = (await r.json()).get("ttft_breakdown")
        except Exception:  # noqa: BLE001
            pass

    # steady-state window: exclude the first 20% and last 5% of the phase
    w0, w1 = t0 + 0.2 * duration, t0 + 0.95 * duration
    toks_w = [e for e in events if e[0] == "tok" and w0 <= e[1] <= w1]
    tpot = [e[2] for e in events if e[0] == "tpot" and w0 <= e[1] <= w1]
    ttft = [e[2] for e in events if e[0] == "ttft"]
    errs = [e for e in events if e[0] == "err"]
    dropped = sum(1 for e in events if e[0] == "dropped")
    done = [e[2] for e in events if e[0] == "done"]
    usage_total = sum(e[2] for e in events if e[0] == "usage")
    frames_total = sum(done)
    # server-counted usage is the authoritative token total; scale the
    # frame-based window rate by the measured frames->tokens ratio
    # (correction-free: measured from the server's own terminal frames)
    scale = (usage_total / frames_total) if (usage_total and frames_total) \
        else 1.0
    d_hits = (cache1.get("hits", 0) - cache0.get("hits", 0))
    d_miss = (cache1.get("misses", 0) - cache0.get("misses", 0))
    return {
        "load": load,
        "arrival_rate_rps": round(lam, 2),
        "submitted": i,
        "completed": len(done),
        "errors": len(errs),
        "shed": dropped,
        "sustained_tok_s": round(
            len(toks_w) / max(w1 - w0, 1e-9) * scale, 1),
        "total_tokens": usage_total or frames_total,
        "total_frames": frames_total,
        "frame_to_token_scale": round(scale, 3),
        "tpot_p50_ms": None if not tpot else round(
            1000 * percentile(tpot, 0.5), 1),
        "tpot_p99_ms": None if not tpot else round(
            1000 * percentile(tpot, 0.99), 1),
        "ttft_p50_s": None if not ttft else round(percentile(ttft, 0.5), 2),
        "ttft_p99_s": None if not ttft else round(percentile(ttft, 0.99), 2),
        "cache_hit_rate": None if (d_hits + d_miss) == 0 else round(
            d_hits / (d_hits + d_miss), 3),
        "cache_tokens_saved": (cache1.get("tokens_saved", 0)
                               - cache0.get("tokens_saved", 0)),
        # server-side TTFT attribution (queue-wait vs prefill+first-block),
        # rolling over the last completions — the tail's composition
        "ttft_breakdown": ttft_srv,
        # HBM pool pressure: skips forfeit cache reuse; evictions recycle
        # the cache's LRU row instead (round-4 VERDICT item 4)
        "snapshot_skips": skips1 - skips0,
        "snapshot_evictions": evicts1 - evicts0,
    }


async def run_all(url, args):
    rng = random.Random(args.seed)
    out = []
    async with aiohttp.ClientSession() as session:
        # warmup: compile + prime
        ev = []
        await one_request(session, url, make_prompt(rng, 30), 8, ev,
                          time.time())
        print("# warmup done", flush=True)
    for load in args.loads:
        print(f"# phase: load={load} x capacity ({args.capacity} total "
              f"tok/s, ~{args.prefix_tokens + args.suffix_tokens} prompt "
              f"words + {args.gen_median} gen)", flush=True)
        res = await run_phase(url, args, load, rng)
        print(json.dumps(res), flush=True)
        out.append(res)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--loads", default="0.5,0.8,1.2",
                    help="comma list of load multipliers vs capacity")
    ap.add_argument("--capacity", type=float, default=0.0,
                    help="total (prefill+decode) token throughput under "
                         "mixed load (default: 5000 TPU / 60 tiny)")
    ap.add_argument("--duration", type=float, default=120.0,
                    help="seconds per phase")
    ap.add_argument("--gen_median", type=float, default=128.0)
    ap.add_argument("--gen_cap", type=int, default=512)
    ap.add_argument("--prefix_tokens", type=int, default=300,
                    help="words per shared prefix")
    ap.add_argument("--suffix_tokens", type=int, default=40)
    ap.add_argument("--n_prefixes", type=int, default=8)
    ap.add_argument("--shared_frac", type=float, default=0.3)
    ap.add_argument("--max_inflight", type=int, default=0,
                    help="shed arrivals beyond this many open requests")
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--port", type=int, default=8091)
    ap.add_argument("--no-spawn", action="store_true")
    ap.add_argument("--seed", type=int, default=20260820)
    args = ap.parse_args()
    args.loads = [float(x) for x in args.loads.split(",")]

    if args.tiny:
        model_size, health_timeout = "2,128", 180
        args.batch = args.batch or 8
        args.capacity = args.capacity or 60.0
        args.max_inflight = args.max_inflight or 32
        if args.duration == 120.0:
            args.duration = 30.0
    else:
        model_size, health_timeout = "32,4096", 900
        args.batch = args.batch or 384
        args.capacity = args.capacity or 5000.0
        args.max_inflight = args.max_inflight or 4 * args.batch
    url = f"http://127.0.0.1:{args.port}"

    proc = None
    if not args.no_spawn:
        cmd = [sys.executable, "-u", "-m", "chirrup_tpu.server",
               "--synthetic_model", model_size,
               "--vocab_path", VOCAB,
               "--batch_size", str(args.batch),
               "--port", str(args.port), "--host", "127.0.0.1"]
        if not args.tiny:
            # the measured v5e-7b2 pool size (50 rows don't fit beside
            # B=384 request state — server/config.py PROFILES)
            cmd += ["--state_cache_size", "16"]
        env = dict(os.environ)
        if args.tiny:
            env["JAX_PLATFORMS"] = "cpu"
        print("#", " ".join(cmd), flush=True)
        proc = subprocess.Popen(cmd, cwd=REPO, env=env,
                                stdout=open("/tmp/realistic_server.log", "wb"),
                                stderr=subprocess.STDOUT,
                                start_new_session=True)
    try:
        if not asyncio.run(wait_health(url, health_timeout)):
            print("server never became healthy; see "
                  "/tmp/realistic_server.log", file=sys.stderr)
            sys.exit(1)
        asyncio.run(run_all(url, args))
    finally:
        if proc is not None:
            os.killpg(proc.pid, signal.SIGTERM)
            try:
                proc.wait(timeout=10)
            except subprocess.TimeoutExpired:
                os.killpg(proc.pid, signal.SIGKILL)


if __name__ == "__main__":
    main()
