"""Shared fixtures for engine tests: a byte-complete tiny vocab + synthetic engine."""

from __future__ import annotations

import os

VOCAB_SIZE = 300  # ids 0..299; 1..256 are the single bytes, 257+ multi-byte extras


def write_tiny_vocab(path: str) -> str:
    lines = []
    for byte in range(256):
        lines.append(f"{byte + 1} {bytes([byte])!r} 1")
    extras = ["hello", "world", " the", "User", "Assistant", "\n\n"]
    for i, tok in enumerate(extras):
        b = tok.encode()
        lines.append(f"{257 + i} {b!r} {len(b)}")
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines))
    return path


def synthetic_model_config(vocab_path: str, **overrides):
    from chirrup_tpu.engine.structures import ModelLoadConfig

    defaults = dict(
        model_path="<synthetic>",
        vocab_path=vocab_path,
        vocab_size=VOCAB_SIZE,
        quantization=None,
        wkv_state_dtype="float32",
        activation_dtype="float32",
        use_pallas_wkv=False,   # lax.scan reference path: fast to compile on CPU
        prefill_chunk=8,
        synthetic_config=dict(n_layer=2, n_embd=128, vocab_size=VOCAB_SIZE,
                              d_decay_lora=32, d_iclr_lora=32, d_v_lora=16,
                              d_gate_lora=32),
    )
    defaults.update(overrides)
    return ModelLoadConfig(**defaults)
