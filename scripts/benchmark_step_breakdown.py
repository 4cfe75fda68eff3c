"""Decode-step component breakdown at serving dimensions (7.2B, batch 200).

Times each piece of the decode step in isolation so optimization effort lands
where the milliseconds are:

  forward   model.forward_step (all matmuls + WKV + norms), no sampler
  wkv       the Pallas WKV7 kernel alone, x n_layer
  sampler   penalties + rwkv-pip-compatible fast sampler on (B, V) logits
  block     the real decode_block (everything) for reference

Methodology matches scripts/benchmark_mm8.py: each measured region is a chained
fori_loop/scan inside ONE jit dispatch (data dependency through the carry) so
remote-dispatch latency (~70 ms through this environment's TPU tunnel) is paid
once and subtracted via the --floor estimate.

    python scripts/benchmark_step_breakdown.py [--small] [--batch 200]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--floor", type=float, default=0.07)
    ap.add_argument("--only", choices=["fwd", "wkv", "samp", "block"],
                    action="append", default=None,
                    help="measure only these components (repeatable)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from chirrup_tpu.models.config import RWKV7Config, RuntimeConfig
    from chirrup_tpu.models import rwkv7 as model
    from chirrup_tpu.engine.serving import ServingModel
    from chirrup_tpu.ops import wkv7_pallas
    from chirrup_tpu.ops.sampling import (
        sample_logits_rwkv_pip_fast, record_sampled_token)
    from bench import build_random_int8_params

    if args.small:
        cfg = RWKV7Config(n_layer=24, n_embd=2048)
        B = args.batch or 64
    else:
        cfg = RWKV7Config(n_layer=32, n_embd=4096)
        B = args.batch or 200
    L, C, V = cfg.n_layer, cfg.n_embd, cfg.vocab_size
    H, N = C // 64, 64
    n = args.iters
    print(f"# L{L} C{C} B{B} iters={n} device={jax.devices()[0]}")

    want = args.only or ["fwd", "wkv", "samp", "block"]
    runtime = RuntimeConfig(activation_dtype=jnp.bfloat16,
                            wkv_state_dtype=jnp.bfloat16,
                            quantization=None, use_pallas_wkv=True)
    if want != ["wkv"]:
        # wkv-only runs skip the 7.2 GB params + carry entirely (HBM headroom)
        params = build_random_int8_params(cfg, jax.random.key(0), jnp.bfloat16)
        sm = ServingModel(cfg, params, runtime, batch_size=B)
        carry = sm.init_carry()
        jax.block_until_ready(carry.state.wkv)
    else:
        sm = carry = None

    def wkv_fn(s_, r, w, k, v, a, b, e, lengths, layer):
        if sm is not None:
            return sm._wkv_fn(s_, r, w, k, v, a, b, e, lengths, layer)
        return wkv7_pallas.wkv7_pallas_batch(
            s_, r, w, k, v, a, b, e, lengths=lengths, layer=layer,
            use_dither=runtime.use_dither, precision=runtime.wkv_precision)

    def timeit(fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*a)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        return (min(ts) - args.floor) / n

    # ---- forward only (matmuls + WKV + norms), token chained via cheap argmin
    def fwd_loop(state):
        def body(i, sv):
            s, t = sv
            logits, s2 = model.forward_step(sm.params, t, s, wkv_fn=wkv_fn,
                                            compute_dtype=jnp.bfloat16)
            return s2, jnp.argmin(logits[:, :256], axis=1).astype(jnp.int32)
        s, t = jax.lax.fori_loop(0, n, body, (state, jnp.zeros((B,), jnp.int32)))
        return t

    t_fwd = t_wkv = t_samp = t_block = float("nan")
    if "fwd" in want:
        t_fwd = timeit(jax.jit(fwd_loop), carry.state)
        print(f"{'forward (mm+wkv+norm)':>22}: {t_fwd * 1e3:8.2f} ms/step",
              flush=True)

    rkey = jax.random.key(1)
    rwk = [jax.random.normal(jax.random.fold_in(rkey, i), (B, 1, C),
                             jnp.bfloat16) * 0.1 for i in range(6)]
    elapsed = jnp.zeros((B,), jnp.int32)

    def wkv_loop(s, r, w, k, v, a, b):
        def body(i, sv):
            s, acc = sv
            def layer_body(li, sv2):
                s2, acc2 = sv2
                y, s3 = wkv_fn(s2, r + acc2[:, None, None] * 0, w, k, v,
                               a, b, elapsed, None, li)
                return s3, acc2 + jnp.mean(y[:, 0, :8], axis=1)
            return jax.lax.fori_loop(0, L, layer_body, (s, acc))
        return jax.lax.fori_loop(0, n, body, (s, jnp.zeros((B,), jnp.bfloat16)))[1]

    if "wkv" in want:
        wkv_jit = jax.jit(wkv_loop, donate_argnums=(0,))
        ts = []
        for rep in range(4):
            st = jnp.zeros((L, B, N, H * N), jnp.bfloat16)  # donated each call
            jax.block_until_ready(st)
            t0 = time.perf_counter()
            out = wkv_jit(st, *rwk)
            jax.block_until_ready(out)
            if rep:  # first call compiles
                ts.append(time.perf_counter() - t0)
        t_wkv = (min(ts) - args.floor) / n
    if "wkv" in want:
        print(f"{'  of which wkv kernel':>22}: {t_wkv * 1e3:8.2f} ms/step",
              flush=True)

    # ---- sampler + penalties on (B, V) logits, chained through rng + occurrence
    logits0 = jax.random.normal(jax.random.fold_in(rkey, 99), (B, V),
                                jnp.float32) * 4.0
    dec = jnp.ones((B,), bool)

    def samp_loop(logits, occ, pres, key):
        def body(i, sv):
            occ, pres, key, acc = sv
            occ = occ * 0.996
            adj = logits - (pres + occ * 0.5)
            key, k2 = jax.random.split(key)
            sampled = sample_logits_rwkv_pip_fast(
                adj, carry.temperature, carry.top_p, carry.top_k, k2,
                row_mask=dec, k_max=runtime.sampler_k_max,
                approx=runtime.sampler_approx_topk)
            occ, pres = record_sampled_token(occ, pres, jnp.maximum(sampled, 0),
                                             jnp.full((B,), 0.5), dec)
            return occ, pres, key, acc + sampled
        return jax.lax.fori_loop(
            0, n, body, (occ, pres, key, jnp.zeros((B,), jnp.int32)))[3]

    if "samp" in want:
        t_samp = timeit(jax.jit(samp_loop), logits0, carry.occurrence,
                        carry.presence_vec, jax.random.key(3))
        print(f"{'sampler + penalties':>22}: {t_samp * 1e3:8.2f} ms/step",
              flush=True)

    if "block" in want:
        # full decode block LAST (donates its carry; chain through the result)
        toks = jnp.zeros((n, B), jnp.int32)
        tt = jnp.ones((n, B), bool)
        fb = tt.at[0].set(False)
        carry, s = sm._decode_block(sm.params, carry, toks, fb, tt, tt)
        jax.block_until_ready(s)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            carry, s = sm._decode_block(sm.params, carry, toks, tt, tt, tt)
            jax.block_until_ready(s)
            ts.append(time.perf_counter() - t0)
        t_block = (min(ts) - args.floor) / n
        print(f"{'decode block (all)':>22}: {t_block * 1e3:8.2f} ms/step",
              flush=True)
        print(f"{'unaccounted':>22}: "
              f"{(t_block - t_fwd - t_samp) * 1e3:8.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
