"""Probe: does the MXU run int8 x int8 -> int32 at 2x bf16 rate on this chip?

v5e datasheet: 197 bf16 TFLOP/s vs 394 int8 TOP/s. If XLA lowers
jnp.dot(int8, int8, preferred_element_type=int32) to the native int8 MXU mode,
a w8a8 matmul path (dynamic per-token activation quantization) halves the
serving step's compute floor. This probe measures achieved TOP/s for:

  bf16 @ bf16 -> f32      (the current mm8 core's effective mode)
  int8 @ int8 -> int32    (native int8 candidate)
  int8 @ int8 -> f32      (alt accumulate)

    python scripts/probe_int8_mxu.py [--batch 200]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=200)
    ap.add_argument("--floor", type=float, default=0.07)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    B = args.batch
    key = jax.random.PRNGKey(0)

    def bench(make_step, K, M, n):
        x0 = jax.random.normal(key, (B, K), jnp.bfloat16)
        step = make_step(K, M)

        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, n, lambda i, x: step(x), x)[0, :8]

        np.asarray(run(x0))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(x0))
            ts.append(time.perf_counter() - t0)
        dt = (min(ts) - args.floor) / n
        tops = 2 * B * K * M / dt / 1e12
        return dt, tops

    shapes = [(4096, 4096), (4096, 16384), (16384, 4096)]
    print(f"# B={B} device={jax.devices()[0]}")
    print(f"{'K x M':>14} | {'mode':>14} | {'us':>8} | TOP/s")
    for K, M in shapes:
        n = max(int(1.5 / (2 * B * K * M / 150e12)), 50)
        kq = jax.random.fold_in(key, K + M)
        wb = jax.random.normal(kq, (K, M), jnp.bfloat16) * 0.01
        wq = jax.random.randint(kq, (K, M), -128, 128, jnp.int8)

        def mk_bf16(K, M, wb=wb):
            def step(x):
                y = jnp.dot(x, wb, preferred_element_type=jnp.float32)
                return jnp.tanh(y[:, :K] if M >= K else jnp.tile(y, (1, K // M))
                                ).astype(jnp.bfloat16)
            return step

        def mk_i8i8_i32(K, M, wq=wq):
            def step(x):
                xq = jnp.clip(x * 127, -127, 127).astype(jnp.int8)
                y = jnp.dot(xq, wq, preferred_element_type=jnp.int32)
                yf = y.astype(jnp.float32) * 1e-4
                return jnp.tanh(yf[:, :K] if M >= K
                                else jnp.tile(yf, (1, K // M))).astype(jnp.bfloat16)
            return step

        def mk_i8i8_f32(K, M, wq=wq):
            def step(x):
                xq = jnp.clip(x * 127, -127, 127).astype(jnp.int8)
                y = jnp.dot(xq, wq, preferred_element_type=jnp.float32)
                return jnp.tanh(y[:, :K] * 1e-4 if M >= K
                                else jnp.tile(y * 1e-4, (1, K // M))
                                ).astype(jnp.bfloat16)
            return step

        for name, mk in [("bf16@bf16->f32", mk_bf16),
                         ("i8@i8->i32", mk_i8i8_i32),
                         ("i8@i8->f32", mk_i8i8_f32)]:
            try:
                dt, tops = bench(mk, K, M, n)
                print(f"{K:>6} x {M:<6} | {name:>14} | {dt * 1e6:>8.0f} | {tops:6.1f}")
            except Exception as e:
                print(f"{K:>6} x {M:<6} | {name:>14} | FAILED: {str(e)[:80]}")


if __name__ == "__main__":
    main()
