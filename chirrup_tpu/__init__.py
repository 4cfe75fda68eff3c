"""chirrup_tpu — a TPU-native RWKV-7 ("Goose") serving engine built on JAX/XLA/Pallas.

A from-scratch reimplementation of the capabilities of leonsama/chirrup (+ its vendored
Albatross single-GPU engine), redesigned for TPU:

- the WKV7 recurrent state update is a Pallas kernel with the state resident in VMEM
  across token chunks (reference: Albatross/cuda/rwkv7_state_fwd_fp16.cu:26-97),
- INT8 weight-only (mm8) matmuls are fused dequant+matmul kernels
  (reference: scripts/test_mm8/benchmark.py:54-85),
- continuous batching is mask-based under a single jitted step function instead of
  physical slot swapping (reference: chirrup/worker.py:304-383),
- multi-chip scaling is tensor-parallel over a jax.sharding.Mesh (head-sharded WKV
  state, column/row-parallel projections) rather than thread-per-GPU data parallelism.
"""

__version__ = "0.1.0"
