"""Server configuration: CLI flags + environment variables.

Same knob surface as the reference (/root/reference/chirrup/web_service/config.py:
7-31, pydantic-settings there; plain argparse+env here since this image has no
pydantic_settings). Env vars use the upper-cased flag name (MODEL_PATH, ...).

`--profile <name>` applies a measured serving preset (the tuned configuration
behind docs/PERF.md's headline numbers) before env/CLI overrides, so the
benchmarked config is reachable with one flag instead of a flag soup.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import List, Optional


@dataclasses.dataclass
class ServerConfig:
    model_path: str = ""
    vocab_path: str = ""
    vocab_size: int = 65536
    head_size: int = 64
    worker_num: int = 1
    batch_size: int = 24
    state_cache_size: int = 50
    host: str = "127.0.0.1"
    port: int = 8000
    # TPU-native extensions
    quantization: str = "int8"           # "int8" | "none"
    wkv_state_dtype: str = "bfloat16"    # float32 | bfloat16
    activation_dtype: str = "bfloat16"
    prefill_chunk: int = 64
    # decode-block steps per dispatch (0 = worker default: 16 on TPU, 1 on
    # CPU). Bigger blocks amortize the worker loop's host overhead (~85 ms
    # per block at 384 streams) at the cost of stop-token overshoot latency
    decode_block_size: int = 0
    tensor_parallel: int = 1
    # 0/1 flag (int keeps the argparse/env auto-parser simple): lockstep
    # multi-host SPMD serving — requires jax.distributed.initialize on every
    # host before startup. Full API surface (return_logits, unbounded
    # forbidden sets, per-host HBM pool cache) as of round 4.
    lockstep: int = 0
    # worker load+warmup deadline: remote TPU compiles are a lottery
    # (the same 7.2B decode-block program measured 20-445 s across runs),
    # so the engine default of 300 s intermittently killed healthy startups
    load_timeout: float = 900.0
    # named preset of measured serving settings (see PROFILES below)
    profile: str = ""
    # test/dev hook: "L,C" builds a synthetic model of that size
    synthetic_model: str = ""


# Measured serving presets. Values here are only applied where the user did
# not override the field via env var or CLI flag.
PROFILES = {
    # 7.2B (L32/C4096) INT8 on one TPU v5e chip — the docs/PERF.md headline
    # config: batch 384 is the measured throughput knee (8.1k tok/s aggregate
    # in-process, ~21 tok/s/request), bf16 activations + bf16 WKV state,
    # 16-row HBM state pool (~0.27 GB, see below) beside 7.4 GB weights +
    # 6.5 GB request state.
    "v5e-7b2": {
        "batch_size": 384,
        # 16 HBM pool rows (~0.27 GB): B=384 leaves ~1 GB of HBM after
        # weights + request state; 50 rows fit the B<=256 configs
        "state_cache_size": 16,
        # round-5 K sweep over live HTTP at 384 streams (PERF.md §round-5
        # serving): K=16 -> 89.3% of in-process, burst TTFT p50 3.0 s;
        # K=24 -> 90.1%, 4.0 s; K=32 -> 94.0%, 5.2 s. 24 clears both bars
        "decode_block_size": 24,
        "quantization": "int8",
        "wkv_state_dtype": "bfloat16",
        "activation_dtype": "bfloat16",
        "prefill_chunk": 64,
        "worker_num": 1,
    },
}


_FIELDS = [f.name for f in dataclasses.fields(ServerConfig)]


def parse_config(argv: Optional[List[str]] = None) -> ServerConfig:
    cfg = ServerConfig()
    parser = argparse.ArgumentParser(prog="chirrup_tpu.server",
                                     description="TPU-native RWKV-7 serving engine")
    for f in dataclasses.fields(ServerConfig):
        # default=None so "explicitly provided" is detectable; layering below
        parser.add_argument(f"--{f.name}", f"--{f.name.replace('_', '-')}",
                            type=type(f.default), default=None)
    args = parser.parse_args(argv)

    profile = args.profile if args.profile is not None \
        else os.environ.get("PROFILE", "")
    if profile and profile not in PROFILES:
        parser.error(f"unknown --profile {profile!r}; "
                     f"available: {sorted(PROFILES)}")

    for f in dataclasses.fields(ServerConfig):
        value = f.default
        if profile and f.name in PROFILES[profile]:
            value = PROFILES[profile][f.name]
        env_val = os.environ.get(f.name.upper())
        if env_val is not None:
            value = type(f.default)(env_val)
        cli_val = getattr(args, f.name)
        if cli_val is not None:
            value = cli_val
        setattr(cfg, f.name, value)
    cfg.profile = profile
    return cfg
