"""Tile-size sweep for the fused serving kernels at the 7.2B decode shapes.

The step profile (scripts/profile_step_breakdown.py) puts the merged-R/K/V
kernel at ~54% and the FFN pair at ~70% of their weight-DMA speed-of-light;
both stream weight tiles whose size is chosen by mm8_pallas._pick_bm. This
sweeps bm (and the FFN's two phase tiles) by monkeypatching the picker and
clearing jit caches, with the chained-fori_loop timing methodology from
scripts/benchmark_mm8.py (data-dependent iterations inside ONE dispatch, so
tunnel/dispatch constants cancel via the n vs 2n slope).

    python scripts/sweep_fused_kernels.py [--batch 200] [--iters 48]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=200)
    ap.add_argument("--iters", type=int, default=48)
    ap.add_argument("--layers", type=int, default=4,
                    help="stacked L (weight bytes per call unchanged)")
    ap.add_argument("--only", choices=["rkv", "ffn", "wo"], default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    # persistent cache survives the per-config jax.clear_caches()
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from chirrup_tpu.ops import mm8_pallas as mp

    B, L, K = args.batch, args.layers, 4096
    dev = jax.devices()[0]
    hbm_gbps = 819.0  # v5e
    print(f"# B={B} device={dev}")

    key = jax.random.PRNGKey(0)

    def q8(*shape):
        return jax.random.randint(jax.random.fold_in(key, hash(shape) % 97),
                                  shape, -128, 128, jnp.int8)

    def vec(n, c=0.01):
        return jnp.full((n,), c, jnp.float32)

    # ---- merged R/K/V: x,xx (B,K) -> (B, 3K)
    Mtot = 3 * K
    q_rkv = q8(L, K, Mtot)
    mu = jnp.zeros((3, K), jnp.float32)
    my3, ry3 = jnp.zeros((3, K), jnp.float32), jnp.full((3, K), 0.01, jnp.float32)
    x0 = jax.random.normal(key, (B, K), jnp.bfloat16)

    # ---- FFN pair: x (B,K) -> (B,K) via F=4K
    F = 4 * K
    qk, qv = q8(L, K, F), q8(L, F, K)

    def sync(out):
        # block_until_ready is NOT a reliable barrier on the axon backend
        # (returns before execution); fetching a computed slice is
        np.asarray(jax.device_get(out[:1, :8].astype(jnp.float32)))

    def timed(run, n):
        sync(run(x0, n))  # compile+warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            sync(run(x0, n))
            ts.append(time.perf_counter() - t0)
        t1 = min(ts)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            sync(run(x0, 2 * n))
            ts.append(time.perf_counter() - t0)
        t2 = min(ts)
        return (t2 - t1) / n  # slope: per-iteration cost

    def sweep(name, make_step, weight_bytes, cfgs):
        for cfg in cfgs:
            orig = mp._pick_bm
            mp._pick_bm = lambda K_, M_, budget=8 << 20, _c=dict(cfg): \
                _c.get((K_, M_), orig(K_, M_))
            try:
                jax.clear_caches()
                step, ws = make_step()

                # weights ride as jit ARGUMENTS: closing over them embeds
                # them as constants in the compile RPC, which the tunnel's
                # remote_compile rejects >~0.5GB (HTTP 413)
                @jax.jit
                def run(x, n, *w):
                    def body(i, x):
                        y = step(x, i % L, *w)
                        return (x + y[:, :K].astype(x.dtype)
                                * jnp.bfloat16(1e-6))
                    return jax.lax.fori_loop(0, n, body, x)
                dt = timed(lambda x, n: run(x, n, *ws), args.iters)
                eff = weight_bytes / dt / 1e9 / hbm_gbps
                print(f"{name} {cfg}: {dt * 1e6:8.1f} us  "
                      f"{weight_bytes / dt / 1e9:6.0f} GB/s  {eff * 100:5.1f}% SOL",
                      flush=True)
            except Exception as e:  # noqa: BLE001 — sweep must survive bad cfgs
                print(f"{name} {cfg}: FAILED {type(e).__name__}: {e}",
                      flush=True)
            finally:
                mp._pick_bm = orig

    def make_rkv():
        def step(x, li, q):
            return mp.mm8_fused_a8_multi_stacked(
                x, x, mu, vec(Mtot), vec(Mtot), my3, ry3, q, li)
        return step, (q_rkv,)

    if args.only != "ffn":
        sweep("rkv", make_rkv, K * Mtot,
              [{}, {(K, K): 1024}, {(K, K): 512}])

    q_wo = q8(L, K, K)

    def make_wo():
        def step(x, li, q):
            return mp.mm8_fused_a8_stacked(
                x, vec(K), vec(K), vec(K), vec(K), q, li)
        return step, (q_wo,)

    if args.only == "wo":
        sweep("wo", make_wo, K * K,
              [{}, {(K, K): 1024}, {(K, K): 512}, {(K, K): 256}])
        return

    def make_ffn():
        def step(x, li, qa, qb):
            return mp.mm8_fused_a8_ffn_stacked(
                x, vec(F), vec(F), vec(K), vec(K), qa,
                vec(K), vec(K), vec(F), vec(F), qb, li)
        return step, (qk, qv)

    if args.only != "rkv":
        sweep("ffn", make_ffn, K * F + F * K,
              [{}, {(K, F): 512}, {(K, F): 512, (F, K): 512},
               {(K, F): 1024}, {(K, F): 1024, (F, K): 512},
               {(K, F): 2048}, {(K, F): 1024, (F, K): 1024},
               {(K, F): 2048, (F, K): 512}])


if __name__ == "__main__":
    main()
