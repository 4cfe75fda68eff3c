"""Decode-step component breakdown at serving dimensions (7.2B, batch 200).

Times each piece of the decode step in isolation so optimization effort lands
where the milliseconds are:

  fwd       model.forward_step (all matmuls + WKV + norms), no sampler
  wkv       the Pallas WKV7 kernel alone, x n_layer
  samp      penalties + rwkv-pip-compatible fast sampler on (B, V) logits
  block     the real decode_block (everything) for reference

Methodology: each measured region is a chained fori_loop/scan inside ONE jit
dispatch (data dependency through the carry), timed at two iteration counts
(n and 2n); the per-iteration cost is the slope, so constant dispatch/tunnel
overhead cancels exactly instead of relying on a guessed floor.

    python scripts/benchmark_step_breakdown.py [--small] [--batch 200]
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--iters", type=int, default=16,
                    help="n; each region timed at n and 2n, cost = slope")
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
    n1 = args.iters
    n2 = 2 * n1
    print(f"# L{L} C{C} B{B} n={n1}/{n2} device={jax.devices()[0]}")

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

    def slope(run, *a):
        """run(*a, n) jitted with static n; returns per-iter seconds.

        NOTE: timings fetch the (small) result via np.asarray — through the
        axon tunnel jax.block_until_ready returns before execution finishes,
        silently timing nothing."""
        def m(n):
            np.asarray(run(*a, n))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(run(*a, n))
                ts.append(time.perf_counter() - t0)
            return min(ts)
        return (m(n2) - m(n1)) / (n2 - n1)

    t_fwd = t_wkv = t_samp = t_block = float("nan")

    # ---- forward only (matmuls + WKV + norms), token chained via cheap argmin
    if "fwd" in want:
        @functools.partial(jax.jit, static_argnums=3)
        def fwd_loop(params, state, toks, n):
            # params as an ARGUMENT: closing over them bakes 7.4 GB of
            # constants into the HLO and the compile never finishes
            def body(i, sv):
                s, t = sv
                logits, s2 = model.forward_step(
                    params, t, s, wkv_fn=wkv_fn,
                    compute_dtype=jnp.bfloat16)
                return s2, jnp.argmin(logits[:, :256], axis=1).astype(jnp.int32)
            return jax.lax.fori_loop(0, n, body, (state, toks))[1]
        t_fwd = slope(fwd_loop, sm.params, carry.state,
                      jnp.zeros((B,), jnp.int32))
        print(f"{'forward (mm+wkv+norm)':>22}: {t_fwd * 1e3:8.2f} ms/step",
              flush=True)

    rkey = jax.random.key(1)
    rwk = [jax.random.normal(jax.random.fold_in(rkey, i), (B, 1, C),
                             jnp.bfloat16) * 0.1 for i in range(6)]
    elapsed = jnp.zeros((B,), jnp.int32)

    if "wkv" in want:
        @functools.partial(jax.jit, static_argnums=7)
        def wkv_loop(s, r, w, k, v, a, b, n):
            def body(i, sv):
                s, acc = sv
                def layer_body(li, sv2):
                    s2, acc2 = sv2
                    y, s3 = wkv_fn(s2, r + acc2[:, None, None] * 0, w, k, v,
                                   a, b, elapsed, None, li)
                    return s3, acc2 + jnp.mean(y[:, 0, :8], axis=1)
                return jax.lax.fori_loop(0, L, layer_body, (s, acc))
            return jax.lax.fori_loop(
                0, n, body, (s, jnp.zeros((B,), jnp.bfloat16)))[1]
        st = jnp.zeros((L, B, N, H * N), jnp.bfloat16)
        t_wkv = slope(wkv_loop, st, *rwk)
        print(f"{'  of which wkv kernel':>22}: {t_wkv * 1e3:8.2f} ms/step",
              flush=True)

    # ---- sampler + penalties on (B, V) logits, chained through rng + occurrence
    if "samp" in want:
        logits0 = jax.random.normal(jax.random.fold_in(rkey, 99), (B, V),
                                    jnp.float32) * 4.0
        dec = jnp.ones((B,), bool)

        @functools.partial(jax.jit, static_argnums=4)
        def samp_loop(logits, occ, pres, key, n):
            def body(i, sv):
                occ, pres, key, acc = sv
                occ = occ * 0.996
                adj = logits - (pres + occ * 0.5)
                key, k2 = jax.random.split(key)
                sampled = sample_logits_rwkv_pip_fast(
                    adj, carry.temperature, carry.top_p, carry.top_k, k2,
                    row_mask=dec, k_max=runtime.sampler_k_max,
                    approx=runtime.sampler_approx_topk)
                occ, pres = record_sampled_token(
                    occ, pres, jnp.maximum(sampled, 0),
                    jnp.full((B,), 0.5), dec)
                return occ, pres, key, acc + sampled
            return jax.lax.fori_loop(
                0, n, body, (occ, pres, key, jnp.zeros((B,), jnp.int32)))[3]
        t_samp = slope(samp_loop, logits0, carry.occurrence,
                       carry.presence_vec, jax.random.key(3))
        print(f"{'sampler + penalties':>22}: {t_samp * 1e3:8.2f} ms/step",
              flush=True)

    if "block" in want:
        # the real decode block at two lengths; slope over block size
        def block_at(nsteps, carry):
            toks = jnp.zeros((nsteps, B), jnp.int32)
            tt = jnp.ones((nsteps, B), bool)
            carry, s, _ = sm._decode_block(sm.params, carry, toks, tt, tt, tt,
                               jnp.zeros((B,), jnp.int32))
            np.asarray(s)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                carry, s, _ = sm._decode_block(sm.params, carry, toks, tt, tt, tt,
                               jnp.zeros((B,), jnp.int32))
                np.asarray(s)
                ts.append(time.perf_counter() - t0)
            return min(ts), carry
        m1, carry = block_at(n1, carry)
        m2, carry = block_at(n2, carry)
        t_block = (m2 - m1) / (n2 - n1)
        print(f"{'decode block (all)':>22}: {t_block * 1e3:8.2f} ms/step",
              flush=True)
        print(f"{'unaccounted':>22}: "
              f"{(t_block - t_fwd - t_samp) * 1e3:8.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
