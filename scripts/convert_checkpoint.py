"""Convert an RWKV-LM .pth checkpoint to the chirrup_tpu native format.

    python scripts/convert_checkpoint.py model.pth out_dir/ [--quantize int8]
    [--dtype bfloat16]

The native directory loads via mmap with all weight prep (transposes, ln0 folding,
INT8 quantization) already done — a 7.2B server start becomes seconds instead of
minutes.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("pth")
    ap.add_argument("out_dir")
    ap.add_argument("--quantize", choices=["none", "int8"], default="int8")
    ap.add_argument("--dtype", choices=["float32", "bfloat16"], default="bfloat16")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from chirrup_tpu.models.loader import load_model
    from chirrup_tpu.models.checkpoint import save_native
    from chirrup_tpu.engine.serving import _quantize_params, _cast_params

    t0 = time.time()
    config, params = load_model(args.pth)
    print(f"loaded {args.pth}: L{config.n_layer} C{config.n_embd} "
          f"V{config.vocab_size} in {time.time() - t0:.1f}s")

    if args.quantize == "int8":
        t0 = time.time()
        params = _quantize_params(params)
        print(f"quantized int8 in {time.time() - t0:.1f}s")
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    params = _cast_params(params, dtype)

    t0 = time.time()
    save_native(args.out_dir, config, params)
    print(f"saved {args.out_dir} in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
