"""Headline benchmark: continuous-batching decode throughput on one TPU chip.

Runs the REAL serving decode path (full RWKV-7 7.2B-dimension model, INT8 mm8
weights, Pallas WKV7 kernel, bf16 recurrent state, penalties + rwkv-pip-compatible
sampling, K-step decode blocks with pipelined host sync — the worker's exact
dispatch pattern) at batch 384 (the measured knee; 20.2 tok/s/request) vs the reference's
per-GPU serving configuration (4 workers x bsz 200 on 4x RTX 4090,
/root/reference/README.md:17-19, 16 tok/s/request => 3200 tok/s aggregate per GPU
at 7.2B fp16).

Weights are randomly generated at the serving dtype (int8 codes + scales) directly
on device — identical compute/memory behavior to a real checkpoint at ~1/4 the
load time. Prints one JSON line; vs_baseline = aggregate tok/s / 3200.

Driver-robustness design (the round-1 artifact was rc=124/parsed=null):
  - the TPU-tunnel probe is capped (BENCH_PROBE_S, default 120 s) — a wedged
    tunnel costs 2 minutes, not the whole window;
  - a global deadline (BENCH_DEADLINE_S, default 900 s from process start)
    is checked between phases and measurement blocks; whatever was measured
    by then is emitted as the JSON line (flagged "partial");
  - SIGTERM/SIGALRM emit the best-available JSON line before exiting, so even
    an external `timeout` kill leaves a parsable stdout;
  - the persistent XLA compile cache lives in-repo (.jax_cache/); NOTE: no
    cross-process cache hit has ever been observed for the big programs on the
    axon backend, and remote-compile time is load-dependent (same program:
    182-445 s observed) — the deadline/partial logic below is the real
    safety net, and both outcomes were validated end-to-end (445 s compile →
    partial line @ 6894 tok/s; 182 s compile → full line @ 7010 tok/s);
  - if the tunnel never comes up, a small CPU fallback run is measured and
    clearly labeled as such (an honest number beats no number).

Usage: python bench.py [--small] [--batch N] [--steps N] [--workers N]
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys
import time

import numpy as np


BASELINE_PER_GPU_TOKS = 3200.0  # 200 req x 16 tok/s/req (reference README.md:17-19)
_START = time.time()
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "900"))
# 480 s died once in round 5: a cold compile exceeded the whole window
# (the lottery's observed range grew past the documented 445 s) and the
# alarm fired with NOTHING measured — 900 s leaves room for one worst-case
# compile plus the measurement; SIGTERM still emits a partial if the
# driver kills earlier
PROBE_S = float(os.environ.get("BENCH_PROBE_S", "120"))

# best-result-so-far, emitted by the signal handler / partial paths
_RESULT: dict = {}
_EMITTED = False


def _time_left() -> float:
    return DEADLINE_S - (time.time() - _START)


def _emit(final: bool = True) -> None:
    """Print the one JSON line (exactly once)."""
    global _EMITTED
    if _EMITTED:
        return
    if not _RESULT:
        return
    _EMITTED = True
    print(json.dumps(_RESULT), flush=True)


def _record(metric: str, value: float, unit: str = "tok/s",
            partial: bool = False, baseline: float = BASELINE_PER_GPU_TOKS) -> None:
    _RESULT.clear()
    _RESULT.update({
        "metric": metric + (" [partial: deadline hit]" if partial else ""),
        "value": round(value, 1),
        "unit": unit,
        "vs_baseline": round(value / baseline, 3),
    })


def _sig_handler(signum, frame):
    print(f"# signal {signum} at t+{time.time() - _START:.0f}s — emitting "
          "best-available result", file=sys.stderr)
    if _RESULT and not _RESULT["metric"].endswith("]"):
        _RESULT["metric"] += " [partial: killed mid-run]"
    _emit()
    os._exit(0)


def build_random_int8_params(cfg, key, dtype, use_numpy=False):
    """Thin wrapper over chirrup_tpu.models.loader.synthetic_params_int8 (the
    builder moved into the library so the server's --synthetic_model path can
    serve the same 7.2B INT8 model the bench measures). key: only its seed
    lineage matters; pass seed via jax.random.key(seed)."""
    import jax
    from chirrup_tpu.models.loader import synthetic_params_int8

    seed = int(jax.random.key_data(key)[-1])
    return synthetic_params_int8(cfg, seed=seed, dtype=dtype,
                                 use_numpy=use_numpy)


def _wait_for_backend(max_wait_s: float) -> bool:
    """The TPU tunnel occasionally wedges (backend init then hangs forever with
    0% CPU). Probe it in a SUBPROCESS with a hard timeout and retry with
    backoff. Returns False if the backend never answered within max_wait_s."""
    import subprocess
    deadline = time.time() + max_wait_s
    delay = 10.0
    while True:
        budget = deadline - time.time()
        if budget <= 0:
            print(f"# backend probe failed for {max_wait_s:.0f}s",
                  file=sys.stderr)
            return False
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=min(75, max(10, budget)), capture_output=True)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() + delay > deadline:
            print(f"# backend probe failed for {max_wait_s:.0f}s",
                  file=sys.stderr)
            return False
        print(f"# backend unavailable, retrying in {delay:.0f}s",
              file=sys.stderr)
        time.sleep(delay)
        delay = min(delay * 1.5, 45.0)


def _build_model(args, cfg, batch, runtime_kwargs, device=None, mesh=None):
    import jax
    import jax.numpy as jnp
    from chirrup_tpu.models.config import RuntimeConfig
    from chirrup_tpu.engine.serving import ServingModel

    seed = runtime_kwargs.pop("seed", 0)
    on_cpu = jax.devices()[0].platform == "cpu"
    params = build_random_int8_params(cfg, jax.random.key(seed), jnp.bfloat16,
                                      use_numpy=on_cpu)
    if device is not None:
        params = jax.device_put(params, device)
    jax.block_until_ready(params["emb"])
    runtime = RuntimeConfig(**runtime_kwargs)
    return ServingModel(cfg, params, runtime, batch_size=batch, mesh=mesh)


def _run_worker_loop(models, batch, K, steps, deadline_check=True):
    """Measure pipelined decode blocks (the worker's dispatch pattern) for one
    or more worker models (DP simulation dispatches all models per block, then
    syncs — the router's steady state). Returns (n_tokens_per_worker, seconds,
    partial)."""
    import jax
    import jax.numpy as jnp

    class _T:
        temperature, top_p, top_k = 1.0, 0.3, 0
        frequency_penalty, presence_penalty, penalty_decay = 0.5, 0.5, 0.996
        forbidden_tokens = ()

    carries = []
    for m in models:
        carry = m.init_carry()
        for slot in range(min(2, batch)):  # spot-configure a couple; rest default
            carry = m.insert_slot(carry, slot, None, _T())
        carries.append(carry)

    tokens = np.random.default_rng(0).integers(1, 60000, (K, batch)).astype(np.int32)
    ones = np.ones((K, batch), bool)
    feedback = ones.copy()
    feedback[0, :] = False  # first step feeds host tokens, rest chain on device

    t0 = time.time()
    for i, m in enumerate(models):  # compile (cache-shared across workers)
        carries[i], sampled, _ = m.decode_block(
            carries[i], jnp.asarray(tokens), jnp.asarray(feedback),
            jnp.asarray(ones), jnp.asarray(ones))
    jax.block_until_ready(sampled)
    print(f"# first block (compile) {time.time() - t0:.1f}s "
          f"(t+{time.time() - _START:.0f}s)", file=sys.stderr)

    fb_all = jnp.asarray(np.ones((K, batch), bool))
    ones_j = jnp.asarray(ones)
    # warmup + pipelined measurement, exactly the worker's dispatch pattern:
    # dispatch block N+1, then read block N's tokens
    prev = None
    for _ in range(2):
        for i, m in enumerate(models):
            carries[i], sampled, _ = m.decode_block(carries[i], tokens, fb_all,
                                                    ones_j, ones_j)
        jax.block_until_ready(sampled)

    nblocks = max(steps // K, 3)
    done = 0
    t0 = time.time()
    for i in range(nblocks):
        block_out = []
        for w, m in enumerate(models):
            carries[w], sampled, _ = m.decode_block(carries[w], tokens, fb_all,
                                                    ones_j, ones_j)
            block_out.append(sampled)
        if prev is not None:
            _ = [np.asarray(jax.device_get(x)) for x in prev]
        prev = block_out
        done = i + 1
        if deadline_check and _time_left() < 20 and done >= 2:
            print(f"# deadline approaching — stopping after {done}/{nblocks} "
                  "blocks", file=sys.stderr)
            break
    _ = [np.asarray(jax.device_get(x)) for x in prev]
    return done * K, time.time() - t0, done < nblocks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="1.5B-ish config for quick checks")
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--block", type=int, default=16)  # worker's TPU default K
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--workers", type=int, default=1,
                    help="simulate N data-parallel workers (N models round-robin "
                         "over the available devices; aggregate = sum)")
    ap.add_argument("--tp", type=int, default=0,
                    help="serve through a tp-way mesh (the shard_map SPMD path; "
                         "tp=1 on one chip measures the mesh-path overhead vs "
                         "the meshless program)")
    ap.add_argument("--mm8-core", default=None,
                    choices=["auto", "pallas", "pallas_a8", "xla", "xla_a8"],
                    help="override RuntimeConfig.mm8_core for this run")
    ap.add_argument("--wkv-precision", default=None,
                    choices=["highest", "default", "bf16"],
                    help="override RuntimeConfig.wkv_precision for this run")
    args = ap.parse_args()
    if args.tp and args.workers > 1:
        ap.error("--tp and --workers>1 are mutually exclusive: the DP worker "
                 "branch benches meshless replicas (use one or the other)")

    signal.signal(signal.SIGTERM, _sig_handler)
    signal.signal(signal.SIGALRM, _sig_handler)
    signal.alarm(max(int(DEADLINE_S + 25), 30))  # belt-and-braces self-kill

    # provisional result from t=0: if the run dies during backend probe /
    # param build / compile (before any measurement), the emitted line says so
    # instead of stdout carrying no JSON at all (the round-1 failure mode)
    _record("no measurement completed (killed during startup or compile)", 0.0)

    backend_ok = True
    if not args.cpu:
        backend_ok = _wait_for_backend(min(PROBE_S, max(_time_left() - 180, 30)))
        if not backend_ok:
            print("# falling back to CPU measurement (TPU tunnel unavailable)",
                  file=sys.stderr)

    import jax
    import jax.numpy as jnp

    if args.cpu or not backend_ok:
        jax.config.update("jax_platforms", "cpu")
    cache_dir = os.environ.get("BENCH_CACHE_DIR",
                               os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from chirrup_tpu.models.config import RWKV7Config

    cpu_fallback = not args.cpu and not backend_ok
    if cpu_fallback:
        # honest-but-small CPU number, clearly labeled; beats parsed=null
        cfg = RWKV7Config(n_layer=4, n_embd=512)
        batch, args.steps = 8, 8
        size = "tiny(CPU-fallback L4 C512)"
    elif args.small:
        cfg = RWKV7Config(n_layer=24, n_embd=2048)  # g1 1.5B dims
        batch = args.batch or 64
        size = "1.5B"
    else:
        cfg = RWKV7Config(n_layer=32, n_embd=4096)  # g1 7.2B dims
        # B=384 is the measured knee of the batch curve (200: 7,063; 320:
        # 7,576; 384: 7,767; 448: 7,654 tok/s) and still gives 20.2
        # tok/s/request - above the reference headline's own 16/req bar
        batch = args.batch or 384
        size = "7.2B"

    dev = jax.devices()[0]
    on_tpu = dev.platform in ("tpu", "axon") or "TPU" in str(dev)
    print(f"# device={dev} model L{cfg.n_layer} C{cfg.n_embd} batch={batch} "
          f"workers={args.workers} (t+{time.time() - _START:.0f}s)",
          file=sys.stderr)

    runtime_kwargs = dict(
        activation_dtype=jnp.bfloat16,
        wkv_state_dtype=jnp.bfloat16,
        quantization=None,  # already int8
        use_pallas_wkv=on_tpu,  # scan path off-TPU
        **({"mm8_core": args.mm8_core} if args.mm8_core else {}),
        **({"wkv_precision": args.wkv_precision} if args.wkv_precision else {}))

    K = args.block
    wkv_path = "pallas WKV" if on_tpu else "lax.scan WKV"

    if args.workers <= 1:
        mesh = None
        mesh_note = ""
        if args.tp:
            from chirrup_tpu.parallel.mesh import make_mesh
            mesh = make_mesh(tp=args.tp)
            mesh_note = f", via tp={args.tp} mesh (shard_map SPMD path)"
        t0 = time.time()
        models = [_build_model(args, cfg, batch, dict(runtime_kwargs),
                               mesh=mesh)]
        print(f"# params built in {time.time() - t0:.1f}s", file=sys.stderr)
        n_tok, dt, partial = _run_worker_loop(models, batch, K, args.steps)
        agg = batch * n_tok / dt
        print(f"# step {dt / n_tok * 1000:.2f} ms | {agg:.0f} tok/s aggregate | "
              f"{n_tok / dt:.1f} tok/s/request", file=sys.stderr)
        _record(
            f"decode tokens/s/chip, RWKV-7 {size} INT8 ({wkv_path} + mm8 + "
            f"sampling + penalties), batch {batch}, {K}-step blocks, "
            f"pipelined host sync{mesh_note}",
            agg, partial=partial)
    else:
        # DP simulation: N independent worker models round-robin over devices
        # (the host configuration of the reference headline: 4 workers x B=200).
        # With one real chip they time-share it; with N chips each gets its own.
        devices = jax.devices()
        models = []
        for w in range(args.workers):
            d = devices[w % len(devices)]
            models.append(_build_model(args, cfg, batch,
                                       dict(runtime_kwargs, seed=w), device=d))
        print(f"# {args.workers} worker models on {len(devices)} device(s)",
              file=sys.stderr)
        n_tok, dt, partial = _run_worker_loop(models, batch, K, args.steps)
        agg = args.workers * batch * n_tok / dt
        print(f"# {agg:.0f} tok/s aggregate across {args.workers} workers",
              file=sys.stderr)
        # vs_baseline stays per-GPU-equivalent: the reference host number is
        # 4 workers x 3200 tok/s, so an N-worker aggregate divides by N x 3200
        _record(
            f"decode tokens/s/host, RWKV-7 {size} INT8, {args.workers} "
            f"DP workers x batch {batch} on {len(devices)} device(s) "
            f"({wkv_path} + mm8 + sampling + penalties), {K}-step blocks, "
            f"vs_baseline per-worker-normalized",
            agg, partial=partial,
            baseline=BASELINE_PER_GPU_TOKS * args.workers)

    _emit()


if __name__ == "__main__":
    main()
