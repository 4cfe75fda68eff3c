"""Native checkpoint format: a directory of mmap-able .npy files + meta.json.

The reference only ever torch.loads a .pth (rwkv7.py:171) — every server start pays
fp32 deserialization, transposes, and (for us) quantization. The native format
stores the fully-prepared parameter pytree (transposed, ln0-folded, optionally
INT8-quantized), so a 7.2B server start is a plain mmap + device_put.

Layout:
  <dir>/meta.json              config + leaf manifest (path, dtype, mm8 flags)
  <dir>/<flattened.path>.npy   one array per pytree leaf
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from chirrup_tpu.models.config import RWKV7Config
from chirrup_tpu.ops.mm8 import Mm8Weight

FORMAT_VERSION = 1


def _flatten(params) -> Dict[str, Any]:
    """Flatten to {dotted.path: leaf}, expanding Mm8Weight into .q/.mx/... leaves."""
    flat = {}

    def walk(prefix, node):
        if isinstance(node, Mm8Weight):
            for f in ("q", "mx", "rx", "my", "ry"):
                flat[f"{prefix}.__mm8_{f}"] = getattr(node, f)
        elif isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}.{k}" if prefix else k, v)
        else:
            flat[prefix] = node

    walk("", params)
    return flat


def _unflatten(flat: Dict[str, np.ndarray]):
    tree: Dict[str, Any] = {}
    mm8_groups: Dict[str, Dict[str, np.ndarray]] = {}
    for path, arr in flat.items():
        m = re.match(r"^(.*)\.__mm8_([a-z]+)$", path)
        if m:
            mm8_groups.setdefault(m.group(1), {})[m.group(2)] = arr
            continue
        parts = path.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(arr)
    for path, fields in mm8_groups.items():
        parts = path.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = Mm8Weight(**{k: jnp.asarray(v) for k, v in fields.items()})
    return tree


def save_native(path: str, config: RWKV7Config, params) -> None:
    os.makedirs(path, exist_ok=True)
    flat = _flatten(params)
    manifest = {}
    for key, leaf in flat.items():
        arr = np.asarray(jax.device_get(leaf))
        fname = key.replace("/", "_") + ".npy"
        np.save(os.path.join(path, fname), arr)
        manifest[key] = {"file": fname, "dtype": str(arr.dtype),
                         "shape": list(arr.shape)}
    meta = {
        "format_version": FORMAT_VERSION,
        "config": dataclasses.asdict(config),
        "leaves": manifest,
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)


def load_native(path: str) -> Tuple[RWKV7Config, Any]:
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if meta["format_version"] != FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint format {meta['format_version']}")
    config = RWKV7Config(**meta["config"])
    flat = {}
    for key, info in meta["leaves"].items():
        flat[key] = np.load(os.path.join(path, info["file"]), mmap_mode="r")
    return config, _unflatten(flat)


def is_native_checkpoint(path: str) -> bool:
    return os.path.isdir(path) and os.path.exists(os.path.join(path, "meta.json"))
