"""Per-op decode-step breakdown from a jax.profiler trace (xplane parsing).

Captures a trace around N serving decode blocks and prints per-op self-times
from the device plane, divided by the traced step count — the noise-free
methodology behind docs/PERF.md's step-composition table (run-to-run wall
timing through the TPU tunnel has tens-of-ms variance; xplane self-times are
exact).

    python scripts/profile_step_breakdown.py --small --steps 32
    python scripts/profile_step_breakdown.py --parse-only /tmp/trace_dir

Implementation notes (this image):
- the tensorboard_plugin_profile trace converter is version-broken; the
  xplane.pb protobuf is parsed directly via
  tensorflow.tsl.profiler.protobuf.xplane_pb2;
- requires PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python (set below) — the
  upb runtime rejects the proto descriptors in this environment.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from collections import defaultdict

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_xplane(trace_dir: str, steps: int, top: int = 30):
    """Aggregate per-op self-times from the newest xplane.pb under trace_dir."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    def dump_line(plane, line):
        ev_meta = plane.event_metadata
        total_ps = defaultdict(int)
        count = defaultdict(int)
        for ev in line.events:
            name = ev_meta[ev.metadata_id].name
            total_ps[name] += ev.duration_ps
            count[name] += 1
        if not total_ps:
            return False
        print(f"--- plane: {plane.name} | line: {line.name} "
              f"({len(line.events)} events) ---")
        rows = sorted(total_ps.items(), key=lambda kv: -kv[1])[:top]
        plane_total = sum(total_ps.values())
        print(f"{'us/step':>10} {'% of line':>9} {'calls/step':>10}  op")
        for name, ps in rows:
            us_per_step = ps / 1e6 / steps
            print(f"{us_per_step:10.1f} {100 * ps / plane_total:8.1f}% "
                  f"{count[name] / steps:10.1f}  {name[:90]}")
        print(f"{plane_total / 1e6 / steps:10.1f}   (line total us/step)")
        return True

    # preferred: the device plane's exact per-op self-times ("XLA Ops" line —
    # TPU planes only). Fallback (CPU traces): dump the busiest line of each
    # non-empty plane so the tool still says something useful.
    found = False
    for plane in space.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        for line in plane.lines:
            if "XLA Ops" in line.name or "XLA" in line.name:
                found |= dump_line(plane, line)
    if not found:
        print("# no device 'XLA Ops' line (CPU trace?) — busiest line per plane:")
        for plane in space.planes:
            lines = [l for l in plane.lines if l.events]
            if not lines:
                continue
            busiest = max(lines, key=lambda l: len(l.events))
            dump_line(plane, busiest)


def capture(args) -> str:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from bench import build_random_int8_params
    from chirrup_tpu.models.config import RWKV7Config, RuntimeConfig
    from chirrup_tpu.engine.serving import ServingModel

    if args.small:
        cfg = RWKV7Config(n_layer=24, n_embd=2048)
        batch = args.batch or 64
    else:
        cfg = RWKV7Config(n_layer=32, n_embd=4096)
        batch = args.batch or 200
    dev = jax.devices()[0]
    on_tpu = dev.platform in ("tpu", "axon")
    params = build_random_int8_params(cfg, jax.random.key(0), jnp.bfloat16,
                                      use_numpy=not on_tpu)
    runtime = RuntimeConfig(activation_dtype=jnp.bfloat16,
                            wkv_state_dtype=jnp.bfloat16, quantization=None,
                            use_pallas_wkv=on_tpu)
    model = ServingModel(cfg, params, runtime, batch_size=batch)
    carry = model.init_carry()

    if args.prefill:
        # one compact-prefill chunk program: (P, T) from the model's variants
        # (smallest P = the tall-narrow TTFT variant, largest = the wide one)
        variants = sorted(model.prefill_variants)
        P, T = variants[0] if args.prefill == "tall" else variants[-1]
        rng = np.random.default_rng(0)
        toks = rng.integers(1, 60000, (P, T)).astype(np.int32)
        lengths = np.full((P,), T, np.int32)
        slot_idx = np.arange(P, dtype=np.int32)

        def chunk(c):
            return model.prefill_step_compact(c, toks, lengths, slot_idx)

        for _ in range(2):
            carry = chunk(carry)
        jax.block_until_ready(jax.device_get(carry.state.elapsed))
        n = max(args.steps // T, 1)
        jax.profiler.start_trace(args.trace_dir)
        for _ in range(n):
            carry = chunk(carry)
        jax.block_until_ready(jax.device_get(carry.state.elapsed))
        jax.profiler.stop_trace()
        print(f"# traced {n} chunks of ({P}, {T}) = {n * P * T} tokens -> "
              f"{args.trace_dir}  (us/step below = per CHUNK / {n})",
              file=sys.stderr)
        return n

    K = args.block
    tokens = np.random.default_rng(0).integers(1, 60000, (K, batch)).astype(np.int32)
    ones = jnp.asarray(np.ones((K, batch), bool))

    # compile + warm outside the trace
    for _ in range(2):
        carry, s, _ = model.decode_block(carry, tokens, ones, ones, ones)
    jax.block_until_ready(s)

    nblocks = max(args.steps // K, 1)
    jax.profiler.start_trace(args.trace_dir)
    for _ in range(nblocks):
        carry, s, _ = model.decode_block(carry, tokens, ones, ones, ones)
    jax.block_until_ready(s)
    jax.profiler.stop_trace()
    print(f"# traced {nblocks * K} steps -> {args.trace_dir}", file=sys.stderr)
    return nblocks * K


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--block", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--prefill", default="",
                    help="'tall'|'wide': profile one compact-prefill chunk "
                         "variant instead of decode blocks (per-CHUNK times)")
    ap.add_argument("--trace_dir", default="/tmp/chirrup_profile")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--parse-only", default="",
                    help="skip capture; parse an existing trace dir (pass the "
                         "traced step count via --steps)")
    args = ap.parse_args()

    if args.parse_only:
        parse_xplane(args.parse_only, args.steps, args.top)
        return
    steps = capture(args)
    parse_xplane(args.trace_dir, steps, args.top)


if __name__ == "__main__":
    main()
