"""Server configuration: CLI flags + environment variables.

Same knob surface as the reference (/root/reference/chirrup/web_service/config.py:
7-31, pydantic-settings there; plain argparse+env here since this image has no
pydantic_settings). Env vars use the upper-cased flag name (MODEL_PATH, ...).
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
    tensor_parallel: int = 1
    # 0/1 flag (int keeps the argparse/env auto-parser simple): lockstep
    # multi-host SPMD serving — requires jax.distributed.initialize on every
    # host before startup; forces the state cache off (lockstep admissions are
    # zero-state)
    lockstep: int = 0
    # test/dev hook: "L,C" builds a synthetic model of that size
    synthetic_model: str = ""


_FIELDS = [f.name for f in dataclasses.fields(ServerConfig)]


def parse_config(argv: Optional[List[str]] = None) -> ServerConfig:
    cfg = ServerConfig()
    parser = argparse.ArgumentParser(prog="chirrup_tpu.server",
                                     description="TPU-native RWKV-7 serving engine")
    for f in dataclasses.fields(ServerConfig):
        env_val = os.environ.get(f.name.upper())
        default = f.default if env_val is None else type(f.default)(env_val)
        parser.add_argument(f"--{f.name}", f"--{f.name.replace('_', '-')}",
                            type=type(f.default), default=default)
    args = parser.parse_args(argv)
    for name in _FIELDS:
        setattr(cfg, name, getattr(args, name))
    return cfg
