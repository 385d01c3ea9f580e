"""Model-family presets: every preset's attention-variant plumbing runs
end to end (scaled to CI size, variant fields preserved)."""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from tpu_flash.models import (
    BLOOM_7B,
    GEMMA2_9B,
    LLAMA2_7B,
    LLAMA3_8B,
    LLAMA31_8B,
    MISTRAL_7B,
    QWEN2_7B,
    FlashTransformer,
)

PRESETS = [
    LLAMA2_7B, LLAMA3_8B, LLAMA31_8B, MISTRAL_7B, GEMMA2_9B, QWEN2_7B,
    BLOOM_7B,
]


def _scaled(cfg):
    """The preset with sizes shrunk to CI scale, variant fields kept."""
    return dataclasses.replace(
        cfg,
        vocab_size=256,
        hidden_size=64,
        num_layers=2,
        num_q_heads=4,
        num_kv_heads=2,
        head_dim=16,
        intermediate_size=128,
        dtype="float32",
        sliding_window=32 if cfg.sliding_window else None,
        rope_orig_context=64 if cfg.rope_scaling else cfg.rope_orig_context,
    )


@pytest.mark.parametrize("cfg", PRESETS, ids=lambda c: c.name)
def test_preset_geometry(cfg):
    assert cfg.num_q_heads % cfg.num_kv_heads == 0
    assert cfg.attention.q_per_kv == cfg.q_per_kv
    for li in range(min(cfg.num_layers, 8)):
        w = cfg.layer_window(li)
        assert w is None or w > 0


@pytest.mark.parametrize("cfg", PRESETS, ids=lambda c: c.name)
def test_preset_variant_forward_and_serve(cfg):
    scfg = _scaled(cfg)
    model = FlashTransformer(scfg)
    params = model.init(jax.random.PRNGKey(0))
    logits = model.forward(
        params, jnp.arange(48, dtype=jnp.int32)[None, :] % 256,
        interpret=True,
    )
    assert logits.shape == (1, 48, 256)
    assert bool(jnp.all(jnp.isfinite(logits)))

    from tpu_flash.core.config import CacheConfig, EngineConfig
    from tpu_flash.engine.runner import InferenceEngine

    eng = InferenceEngine(
        model, params,
        EngineConfig(
            max_batch_size=2, max_seq_len=128, prefill_chunk=32,
            cache=CacheConfig(page_size=32, num_pages=16,
                              max_pages_per_seq=4),
        ),
        interpret=True,
    )
    rid = eng.submit([1, 2, 3, 4, 5], max_new_tokens=4)
    out = eng.run()
    assert len(out[rid]) == 4
