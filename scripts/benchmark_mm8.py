"""mm8 INT8 kernel sweep: latency + effective weight bandwidth + accuracy vs the
dense bf16 GEMM (equivalent of the reference's scripts/test_mm8/benchmark.py
sweep, reframed for TPU: the metric that matters at serving batch sizes is HBM
bytes/weight, and the target is the chip's HBM speed-of-light).

Timing methodology: repeated identical dispatches can be cached/coalesced by
remote-execution backends and XLA will happily dead-code-eliminate unconsumed
outputs, so every measured iteration chains through a data dependency (the
output is folded back into the next input) inside ONE jitted fori_loop, and the
full output participates (a mean over all columns folds back in). Fixed
dispatch overhead is subtracted via a measured floor.

    python scripts/benchmark_mm8.py [--batch 256] [--iters auto]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--floor", type=float, default=0.07,
                    help="fixed per-dispatch overhead to subtract (s)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from chirrup_tpu.ops import mm8
    from chirrup_tpu.ops.mm8_pallas import mm8_core_pallas, mm8_core_supported

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

    B = args.batch
    key = jax.random.PRNGKey(0)
    xs = [jax.random.normal(jax.random.fold_in(key, i), (B, 4096), jnp.bfloat16)
          for i in range(3)]

    def bench(step, rest, n, K):
        @jax.jit
        def run(x0, *r):
            return jax.lax.fori_loop(0, n, lambda i, x: step(x, *r), x0)[0, :8]
        xs_k = [x[:, :K] if K <= 4096 else jnp.tile(x, (1, K // 4096))
                for x in xs]
        np.asarray(run(xs_k[0], *rest))  # compile + warm
        ts = []
        for x0 in xs_k[1:]:
            t0 = time.perf_counter()
            np.asarray(run(x0, *rest))
            ts.append(time.perf_counter() - t0)
        return (min(ts) - args.floor) / n

    # 7B op shapes (reference benchmark.py:440-460 "model simulation")
    shapes = [(4096, 4096), (4096, 16384), (16384, 4096), (4096, 65536)]
    print(f"# B={B} device={jax.devices()[0]}")
    print(f"{'K x M':>14} | {'bf16 GEMM':>12} | {'pallas mm8':>12} | "
          f"{'int8 GB/s':>9} | {'SoL %':>6} | relerr")

    HBM_GBPS = 819.0  # v5e speed-of-light
    for K, M in shapes:
        kq = jax.random.fold_in(key, K * 7 + M)
        q = jax.random.randint(kq, (K, M), -128, 128, jnp.int8)
        wb = jax.random.normal(kq, (K, M), jnp.bfloat16) * 0.01

        def fold(x, y, K=K):
            # fold the (B, M) output back into a (B, K) carry (tile when M < K)
            if y.shape[1] < K:
                y = jnp.tile(y, (1, K // y.shape[1]))
            return jnp.tanh(y[:, :K] + jnp.mean(y, axis=1, keepdims=True)
                            ).astype(jnp.bfloat16)

        n = max(int(2.0 / (K * M / 400e9)), 20)  # ~2s of expected work
        dt_bf16 = bench(lambda x, w: fold(x, jnp.dot(
            x, w, preferred_element_type=jnp.float32)), (wb,), n, K)
        assert mm8_core_supported(B, K, M)
        dt_pl = bench(lambda x, q_: fold(x, mm8_core_pallas(x, q_)), (q,), n, K)

        # accuracy: one call vs the dense dot on the same codes
        x0 = xs[0][:, :K] if K <= 4096 else jnp.tile(xs[0], (1, K // 4096))
        ref = jnp.dot(x0, q.astype(x0.dtype), preferred_element_type=jnp.float32)
        out = mm8_core_pallas(x0, q)
        relerr = float(jnp.max(jnp.abs(out - ref))
                       / (jnp.max(jnp.abs(ref)) + 1e-9))

        gbps = K * M / dt_pl / 1e9
        print(f"{K:>6} x {M:<6} | {dt_bf16 * 1e6:>9.0f} us | "
              f"{dt_pl * 1e6:>9.0f} us | {gbps:>9.0f} | "
              f"{100 * gbps / HBM_GBPS:>5.1f} | {relerr:.1e}")


if __name__ == "__main__":
    main()
