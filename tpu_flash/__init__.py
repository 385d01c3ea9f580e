"""tpu_flash — TPU-native quantized flash-attention inference engine.

A brand-new JAX / Pallas / shard_map framework with the capabilities of the
reference CUDA project (GMichailov/Flash-Attention-CUDA-C): fused tiled
attention with online softmax (running max/sum rescaling), causal and
non-causal multi-head support, overlapped memory/compute execution, and
hardware-aware tile selection — extended TPU-natively to INT8/FP8 quantized
Q/K/V, a paged INT8/INT4 KV-cache dequantized in-kernel, GQA decode with
continuous batching, head-sharded tensor parallelism, and ring/sequence
parallel attention.

Layer map (see SURVEY.md §7):
  core/      configs, jnp exact-attention oracle, online-softmax merge algebra
  ops/       Pallas kernels: flash prefill (fwd+bwd), paged GQA decode, quant
  engine/    paged KV-cache manager, continuous-batching scheduler, runner
  parallel/  mesh builder, shard_map TP attention, ring attention
  models/    model configs (Llama-2/3 shapes) + flagship transformer
  utils/     device probe, tuning tables, roofline model
"""

from tpu_flash.core.config import (
    AttentionConfig,
    BlockSizes,
    EngineConfig,
    MeshConfig,
)
from tpu_flash.core.reference import reference_attention, reference_gqa_attention
from tpu_flash.ops.flash import flash_attention

__version__ = "0.1.0"

__all__ = [
    "AttentionConfig",
    "BlockSizes",
    "EngineConfig",
    "MeshConfig",
    "reference_attention",
    "reference_gqa_attention",
    "flash_attention",
    "__version__",
]
