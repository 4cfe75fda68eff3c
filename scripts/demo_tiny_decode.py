"""Tiny end-to-end CPU drive: real tokenizer + synthetic model + prefill +
greedy decode, cross-checked against forward_seq. This is the canned
verification recipe (.claude/skills/verify) — exercises the library surface
without TPU or weights.

    python scripts/demo_tiny_decode.py
"""

import os
import sys

sys.path.insert(0, ".")

import jax

# always CPU: this is the hardware-free smoke drive (note the shell exports
# JAX_PLATFORMS=axon here, so "inherit the env" would mean "use the TPU")
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from chirrup_tpu.utils.tokenizer import WorldTokenizer
from chirrup_tpu.models.config import RWKV7Config
from chirrup_tpu.models.loader import synthetic_params
from chirrup_tpu.models import rwkv7 as M

VOCAB = os.environ.get(
    "CHIRRUP_VOCAB", "/root/reference/Albatross/rwkv_vocab_v20230424.txt")


def main():
    print("backend:", jax.default_backend())
    tok = WorldTokenizer(VOCAB)
    cfg = RWKV7Config(n_layer=2, n_embd=128, vocab_size=65536)
    params = synthetic_params(cfg, seed=3)
    prompt = [0] + tok.encode("User: hi\n\nAssistant:")
    toks = np.asarray(prompt, np.int32)

    st = M.init_state(cfg, 1)
    st = jax.jit(M.forward_chunk)(params, toks[None, :-1], st)
    logits, st = jax.jit(M.forward_step)(params, toks[None, -1:][:, 0], st)
    t1 = int(np.argmax(np.asarray(logits)[0]))

    st2 = M.init_state(cfg, 1)
    logits2, st2 = jax.jit(M.forward_seq)(params, toks[None, :], st2)
    t2 = int(np.argmax(np.asarray(logits2)[0]))
    assert t1 == t2, f"chunk+step vs seq mismatch: {t1} != {t2}"
    assert int(st.elapsed[0]) == len(prompt) == int(st2.elapsed[0])

    cur, out = t1, [t1]
    for _ in range(7):
        lg, st = jax.jit(M.forward_step)(params, jnp.asarray([cur], jnp.int32), st)
        cur = int(np.argmax(np.asarray(lg)[0]))
        out.append(cur)
    print("greedy tokens:", out)
    print("decoded:", repr(tok.decode(out)))
    print("TINY DECODE OK")


if __name__ == "__main__":
    main()
