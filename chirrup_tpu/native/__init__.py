"""Native (C) components, built on demand with the system compiler.

`trie_tokenizer` is imported lazily by chirrup_tpu.utils.tokenizer; a build failure
falls back to the pure-Python trie silently. Build artifacts land next to the
sources so repeated imports are instant.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import sysconfig

_DIR = os.path.dirname(os.path.abspath(__file__))


def _build_extension(name: str) -> str:
    src = os.path.join(_DIR, f"{name}.c")
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(_DIR, f"{name}{suffix}")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    include = sysconfig.get_paths()["include"]
    cc = os.environ.get("CC", "cc")
    cmd = [cc, "-O3", "-shared", "-fPIC", f"-I{include}", src, "-o", out]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def _load(name: str):
    path = _build_extension(name)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def __getattr__(attr):
    if attr == "trie_tokenizer":
        mod = _load("trie_tokenizer")
        sys.modules[__name__ + ".trie_tokenizer"] = mod
        globals()[attr] = mod
        return mod
    raise AttributeError(attr)
