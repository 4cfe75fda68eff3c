"""ICI collective-bandwidth probe: times psum / all_gather / ppermute over the
device mesh (equivalent of the reference's NVLink P2P probes,
scripts/benchmark_nvlink_bandwidth.py + test_nvlink_parallel_transfer.py —
on TPU the interconnect surface is XLA collectives over ICI, not raw copies).

    python scripts/benchmark_ici.py [--mb 64] [--iters 30]

Validate the harness off-TPU with
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/benchmark_ici.py --cpu
(numbers are meaningless there).
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=64.0)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        # env JAX_PLATFORMS is overridden by site customizations on some hosts;
        # the config update must happen before backend init
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from chirrup_tpu.parallel.mesh import make_mesh

    n = len(jax.devices())
    if n < 2:
        print(f"only {n} device(s) — nothing to probe")
        return
    mesh = make_mesh(tp=n, dp=1)
    elems = int(args.mb * 2**20 // 4)
    elems -= elems % (128 * n)
    x = jnp.arange(elems, dtype=jnp.float32).reshape(n, -1) / elems

    try:
        from jax import shard_map
        smap = lambda f, i, o: shard_map(f, mesh=mesh, in_specs=i, out_specs=o,
                                         check_vma=False)
    except ImportError:
        from jax.experimental.shard_map import shard_map
        smap = lambda f, i, o: shard_map(f, mesh=mesh, in_specs=i, out_specs=o,
                                         check_rep=False)

    def timed(fn, xs, label, bytes_moved):
        # chain iterations through a data dependency so nothing is cached away
        @jax.jit
        def run(x0):
            return jax.lax.fori_loop(0, args.iters,
                                     lambda i, v: fn(v) * (1.0 - 1e-9), x0)
        np.asarray(jax.device_get(run(xs)))[:8]
        t0 = time.perf_counter()
        np.asarray(jax.device_get(run(xs * 1.000001)))[:8]
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{label:>12}: {dt * 1e6:8.0f} us  "
              f"{bytes_moved / dt / 1e9:7.1f} GB/s algo-bw")

    shard = P("tp", None)
    nbytes = x.nbytes

    psum = smap(lambda v: jax.lax.psum(v, "tp"), (shard,), P(None, None))
    timed(lambda v: psum(v)[:1].reshape(1, -1).repeat(n, 0) / n, x,
          "psum", 2 * nbytes * (n - 1) / n)

    ag = smap(lambda v: jax.lax.all_gather(v, "tp", tiled=True), (shard,),
              P(None, None))
    timed(lambda v: ag(v)[: x.shape[0]] / n, x,
          "all_gather", nbytes * (n - 1) / n)

    perm = [(i, (i + 1) % n) for i in range(n)]
    ppermute = smap(lambda v: jax.lax.ppermute(v, "tp", perm), (shard,), shard)
    timed(ppermute, x, "ppermute", nbytes)

    rs = smap(lambda v: jax.lax.psum_scatter(v, "tp", scatter_dimension=1,
                                             tiled=True),
              (shard,), P(None, "tp"))
    timed(lambda v: jnp.repeat(rs(v), n, axis=0) / n, x,
          "psum_scatter", nbytes * (n - 1) / n)


if __name__ == "__main__":
    main()
