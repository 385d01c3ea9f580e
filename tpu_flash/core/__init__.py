from tpu_flash.core.config import AttentionConfig, BlockSizes, EngineConfig, MeshConfig
from tpu_flash.core.reference import (
    SegmentIds,
    alibi_slopes,
    reference_attention,
    reference_gqa_attention,
)
from tpu_flash.core.softmax import SoftmaxState, merge_softmax_states

__all__ = [
    "AttentionConfig",
    "BlockSizes",
    "EngineConfig",
    "MeshConfig",
    "alibi_slopes",
    "reference_attention",
    "reference_gqa_attention",
    "SoftmaxState",
    "merge_softmax_states",
]
