"""Model/runtime configuration for RWKV-7 on TPU."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

HEAD_SIZE = 64


@dataclasses.dataclass(frozen=True)
class RWKV7Config:
    """Static architecture description of an RWKV-7 "Goose" checkpoint.

    Shapes follow the public RWKV-LM checkpoint format; the reference engine infers
    n_head/head_size from `blocks.0.att.r_k` and n_layer by scanning keys
    (/root/reference/Albatross/rwkv7.py:171-192). Published g1 sizes: 0.1B (L12 D768),
    0.4B (L24 D1024), 1.5B (L24 D2048), 2.9B (L32 D2560), 7.2B (L32 D4096).
    """

    n_layer: int
    n_embd: int
    vocab_size: int = 65536
    head_size: int = HEAD_SIZE
    # low-rank projection widths (decay / iclr / value-residual / gate); inferred from
    # the checkpoint on load, defaults follow RWKV-LM's size heuristics.
    d_decay_lora: int = 64
    d_iclr_lora: int = 64
    d_v_lora: int = 32
    d_gate_lora: int = 128

    @property
    def n_head(self) -> int:
        return self.n_embd // self.head_size

    @property
    def d_ffn(self) -> int:
        return self.n_embd * 4

    def state_bytes_per_request(self, wkv_dtype=jnp.float16) -> int:
        """Recurrent state footprint of one request (reference: SURVEY §2.2 M2)."""
        itemsize = jnp.dtype(wkv_dtype).itemsize
        shift = self.n_layer * 2 * self.n_embd * itemsize
        wkv = self.n_layer * self.head_size * self.n_embd * itemsize
        return shift + wkv + 4  # + int32 elapsed counter


@dataclasses.dataclass(frozen=True)
class RuntimeConfig:
    """How the model is executed on TPU."""

    # dtype of activations/matmuls (MXU-friendly)
    activation_dtype: jnp.dtype = jnp.bfloat16
    # dtype the WKV matrix state is stored in between steps. float16 halves the HBM
    # traffic of the hottest loop (the per-step state read/write) at the cost of
    # rounding the state each step — which the dither compensates, mirroring the
    # reference's fp16-state design. float32 is the high-precision option.
    wkv_state_dtype: jnp.dtype = jnp.bfloat16
    use_dither: bool = True
    # weight quantization: None (keep activation_dtype) or "int8" (mm8 weight-only)
    quantization: Optional[str] = None
    # use the Pallas WKV kernel (False falls back to the lax.scan reference impl)
    use_pallas_wkv: bool = True
    # in-kernel reduction precision: "highest" (multi-pass f32), "default"
    # (bf16-rounded MXU inputs — still above the reference's fp16
    # accumulation), or "bf16" (state-tile elementwise in packed bf16 with the
    # delta-form update `S += S*d + ...` — the reference fp16 kernel's own
    # scheme, cuda/rwkv7_state_fwd_fp16.cu:78; 2x VPU throughput on the
    # VPU-bound WKV kernel, dots see the same bf16-rounded operands as
    # "default")
    wkv_precision: str = "default"
    # top-k candidate selection in the serving sampler: True uses the TPU-native
    # approx_max_k (exact top_k lowers to a full 65536-wide sort — it alone was
    # ~27% of a decode step). The exact full-sort fallback still guards top_p
    # coverage either way, and temp=0 greedy rows are always exact.
    sampler_approx_topk: bool = True
    # 128 keeps approx_max_k AND the candidate argsort essentially free (k=1024
    # cost ~0.5ms + ~0.7ms per step at B=64); the exact-fallback cond still
    # guards top_p coverage, so small k trades fallback frequency, not
    # correctness. Default top_p=0.3 needs only a handful of candidates.
    sampler_k_max: int = 128
    # fused decode tail: ONE Pallas pass over (logits, occurrence, presence)
    # does record+decay+penalties+logsumexp+candidate maxima, replacing
    # ~2.2 ms/step of separate XLA (B, V) passes at B=384 (profiled). Engages
    # when the model runs meshless with the Pallas kernels (under tp the
    # (B, V) arrays are vocab-sharded and stay on the GSPMD path). The
    # record is deferred one step through the device-resident last_sampled —
    # bit-identical sequencing, see ops/sampling_pallas.py.
    fused_penalty_tail: bool = True
    # inner int8 GEMM: "auto" resolves to "pallas_a8" on TPU (w8a8: dynamic
    # per-token int8 activations on the native int8 MXU, ~1.5x the bf16 dot,
    # +16% end-to-end at 7.2B/batch 200) and "xla" elsewhere. "pallas" is the
    # exact w8a16 fused in-VMEM dequant (no activation rounding); "xla"/"xla_a8"
    # are plain-XLA fallbacks. The rank-1 dequant corrections are exact f32 in
    # every mode — only the GEMM term differs.
    mm8_core: str = "auto"
