"""Prefill performance on one TPU chip: chunk cost, decode interaction, TTFT.

Measures the serving prefill path at the 7.2B/batch-200 headline config
(reference treats long-prompt ingestion as first-class load,
/root/reference/chirrup/worker.py:744-776):

1. compact chunk variants (wide (P, T) and tall-narrow (8, 4T)) -> chunk ms,
   prefill tok/s, per-slot advance
2. the OLD full-B masked chunk                                  -> compact win
3. the worker's mixed steady state (decode block + K/ratio chunks)
   -> decode tok/s under prefill load + per-slot ingestion + TTFT(2k/8k)

Timing note: blocking on the returned carry is NOT enough — its state buffers
are donation-aliased, and the runtime reports aliased outputs ready
immediately. Every measurement here syncs by fetching a computed slice of the
state (a fresh dependent program), which the earlier version of this script
did not (it reported 0.2 ms "chunks"). Seconds-scale totals only.

    python scripts/benchmark_prefill.py [--small] [--batch N] [--chunks N]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--chunks", type=int, default=16)
    ap.add_argument("--block", type=int, default=16)
    ap.add_argument("--skip-full", action="store_true",
                    help="skip the full-B masked chunk baseline (slow)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    from bench import build_random_int8_params
    from chirrup_tpu.models.config import RWKV7Config, RuntimeConfig
    from chirrup_tpu.engine.serving import ServingModel

    t0 = time.time()
    if args.small:
        cfg = RWKV7Config(n_layer=24, n_embd=2048)
        B = args.batch or 64
    else:
        cfg = RWKV7Config(n_layer=32, n_embd=4096)
        B = args.batch or 200
    dev = jax.devices()[0]
    on_tpu = dev.platform in ("tpu", "axon")
    print(f"# device={dev} L{cfg.n_layer} C{cfg.n_embd} B={B}", flush=True)

    params = build_random_int8_params(cfg, jax.random.key(0), jnp.bfloat16,
                                      use_numpy=not on_tpu)
    jax.block_until_ready(params["emb"])
    rt = RuntimeConfig(activation_dtype=jnp.bfloat16,
                       wkv_state_dtype=jnp.bfloat16,
                       quantization=None, use_pallas_wkv=on_tpu)
    model = ServingModel(cfg, params, rt, batch_size=B)
    carry = model.init_carry()
    rng = np.random.default_rng(0)
    print(f"# params ready t+{time.time()-t0:.0f}s  "
          f"variants={model.prefill_variants}", flush=True)

    def sync():
        # fresh dependent program -> real completion barrier
        np.asarray(jax.device_get(carry.state.wkv[0, :1, 0, :8]
                                  .astype(jnp.float32)))

    def time_loop(fn, n, warmup=2):
        for _ in range(warmup):
            fn()
        sync()
        t = time.time()
        for _ in range(n):
            fn()
        sync()
        return (time.time() - t) / n

    # ---- 1. compact chunk variants, back-to-back
    chunk_ms = {}
    for Pi, Ti in model.prefill_variants:
        toks = jnp.asarray(rng.integers(1, 60000, (Pi, Ti)).astype(np.int32))
        lens = jnp.full((Pi,), Ti, jnp.int32)
        sidx = jnp.arange(Pi, dtype=jnp.int32)

        def chunk():
            nonlocal carry
            carry = model.prefill_step_compact(carry, toks, lens, sidx)

        dt = time_loop(chunk, args.chunks)
        chunk_ms[(Pi, Ti)] = dt
        print(f"# compact chunk P={Pi} T={Ti}: {dt*1000:.1f} ms = "
              f"{Pi*Ti/dt:,.0f} prefill tok/s, {Ti/dt:,.0f} tok/s/slot "
              f"back-to-back (t+{time.time()-t0:.0f}s)", flush=True)

    # ---- 2. full-B masked chunk (the pre-round-3 path)
    P, Tbase = model.prefill_variants[-1]
    if not args.skip_full:
        toks_f = jnp.asarray(rng.integers(1, 60000, (B, Tbase))
                             .astype(np.int32))
        lens_f = jnp.zeros((B,), jnp.int32).at[:P].set(Tbase)

        def full_chunk():
            nonlocal carry
            carry = model.prefill_step(carry, toks_f, lens_f)

        dt = time_loop(full_chunk, max(args.chunks // 4, 3))
        print(f"# full-B masked chunk ({P} active rows): {dt*1000:.1f} ms = "
              f"{P*Tbase/dt:,.0f} useful prefill tok/s "
              f"(t+{time.time()-t0:.0f}s)", flush=True)

    # ---- 3. mixed steady state: decode block + ceil(K/ratio) chunks
    K = args.block
    ratio = 5
    n_chunks = max(1, round(K / ratio))
    toks_d = jnp.asarray(rng.integers(1, 60000, (K, B)).astype(np.int32))
    ones = jnp.asarray(np.ones((K, B), bool))

    def decode_only():
        nonlocal carry
        carry, sampled, _ = model.decode_block(carry, toks_d, ones, ones, ones)

    dt_dec = time_loop(decode_only, 8)
    print(f"# decode-only block: {dt_dec*1000:.0f} ms = {B*K/dt_dec:,.0f} "
          f"tok/s (t+{time.time()-t0:.0f}s)", flush=True)

    for Pi, Ti in model.prefill_variants:
        toks_c = jnp.asarray(rng.integers(1, 60000, (Pi, Ti)).astype(np.int32))
        lens_c = jnp.full((Pi,), Ti, jnp.int32)
        sidx = jnp.arange(Pi, dtype=jnp.int32)

        def mixed():
            nonlocal carry
            carry, s, _ = model.decode_block(carry, toks_d, ones, ones, ones)
            for _ in range(n_chunks):
                carry = model.prefill_step_compact(carry, toks_c, lens_c, sidx)

        dt_mix = time_loop(mixed, 6)
        dec_tps_mixed = B * K / dt_mix
        slot_rate = n_chunks * Ti / dt_mix
        print(f"# mixed block+{n_chunks} chunks (P={Pi} T={Ti}): "
              f"{dt_mix*1000:.0f} ms | decode {dec_tps_mixed:,.0f} tok/s "
              f"({100*(1-dec_tps_mixed*dt_dec/(B*K)):.0f}% decode cost) | "
              f"per-slot ingestion {slot_rate:,.0f} tok/s -> "
              f"TTFT 2k={2048/slot_rate:.2f}s 8k={8192/slot_rate:.2f}s | "
              f"aggregate ingestion {slot_rate*Pi:,.0f} tok/s", flush=True)

    print(f"# total t+{time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
