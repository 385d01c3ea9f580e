"""Regime-aware cache-layout auto policy (VERDICT r4 item 3).

CacheConfig layout knobs default to None = auto; the engine resolves them
at init through utils/tuning.py::select_cache_policy so the shipped
defaults track the repo's measured guidance (BENCHLOG 2026-08-20/21:
quantized serving wants 512-token pages — ps=128 pays a 31% kernel-level
scale-DMA tax and 23% at engine level in the KV-bound b32 regime; int8
passes every quality gate with recent_window=0 while int4/fp8 need the
128-token exact ring). The reference's helpers.hpp computed budgets then
hardcoded 64 (helpers.hpp:17-18,28-29); these tests pin that the policy
is live, overridable, and consistent.
"""

import dataclasses

import jax
import pytest

from tpu_flash.core.config import CacheConfig, EngineConfig
from tpu_flash.utils.tuning import resolve_cache_config, select_cache_policy


class TestPolicy:
    def test_production_int8_regime(self):
        # The measured A/B regime (BENCHLOG 2026-08-21): b32 int8, 1K ctx
        # -> ps512 + ring0 was +23% over the old ps128+ring128 defaults.
        p = select_cache_policy("int8", max_seq_len=1024, max_batch_size=32)
        assert p["page_size"] == 512
        assert p["recent_window"] == 0

    def test_int4_keeps_exact_ring(self):
        p = select_cache_policy("int4", max_seq_len=8192, max_batch_size=8)
        assert p["page_size"] == 512
        assert p["recent_window"] == 128

    def test_int8_long_context_rings(self):
        # Trained-checkpoint evidence (BENCHLOG 2026-08-21): the exact
        # ring lifts int8 greedy match 0.881 -> 1.000 and is free at
        # multi-K contexts, so int8 rings from 2K up.
        p = select_cache_policy("int8", max_seq_len=2048, max_batch_size=8)
        assert p["recent_window"] == 128

    def test_fp8_keeps_exact_ring(self):
        p = select_cache_policy("fp8", max_seq_len=4096, max_batch_size=8)
        assert p["recent_window"] == 128

    def test_bf16_large_pages_no_ring(self):
        p = select_cache_policy(
            "bfloat16", max_seq_len=8192, max_batch_size=8
        )
        assert p["page_size"] == 1024
        assert p["recent_window"] == 0

    def test_page_never_exceeds_context(self):
        p = select_cache_policy("int8", max_seq_len=256, max_batch_size=4)
        assert p["page_size"] == 256
        p = select_cache_policy("bfloat16", max_seq_len=64, max_batch_size=2)
        assert p["page_size"] == 128  # lane-aligned minimum

    def test_capacity_covers_reserve_admission(self):
        for dtype in ("int8", "bfloat16"):
            p = select_cache_policy(dtype, 4096, 16)
            need = 16 * p["max_pages_per_seq"]
            assert p["num_pages"] > need  # reserve + headroom + trash page


class TestResolve:
    def test_explicit_fields_win(self):
        c = CacheConfig(page_size=128, kv_dtype="int8", recent_window=64)
        r = resolve_cache_config(c, max_seq_len=2048, max_batch_size=8)
        assert r.page_size == 128 and r.recent_window == 64
        assert r.max_pages_per_seq == 16  # auto, from the EXPLICIT ps
        assert r.num_pages is not None

    def test_fully_resolved_passthrough(self):
        c = CacheConfig(
            page_size=8, num_pages=32, max_pages_per_seq=8,
            kv_dtype="int4", recent_window=16,
        )
        assert resolve_cache_config(c, max_seq_len=64, max_batch_size=2) is c

    def test_ring_clamped_to_context(self):
        c = CacheConfig(page_size=8, kv_dtype="int4")
        r = resolve_cache_config(c, max_seq_len=64, max_batch_size=2)
        assert 0 < r.recent_window <= 64

    def test_unresolved_max_context_raises(self):
        with pytest.raises(ValueError, match="unresolved"):
            _ = CacheConfig().max_context


class TestEngineIntegration:
    def test_engine_resolves_auto_config(self):
        from tpu_flash.engine.runner import InferenceEngine
        from tpu_flash.models import TINY_TEST, FlashTransformer

        model = FlashTransformer(TINY_TEST)
        params = model.init(jax.random.PRNGKey(0))
        engine = InferenceEngine(
            model,
            params,
            EngineConfig(
                max_batch_size=2, max_seq_len=64, prefill_chunk=16,
                cache=CacheConfig(kv_dtype="int8"),
            ),
            interpret=True,
        )
        cc = engine.config.cache
        assert cc.resolved
        assert cc.page_size == 128  # lane-aligned minimum at 64-token ctx
        assert cc.recent_window == 0  # int8 auto
        assert cc.max_context >= 64
        # The resolved engine must actually serve.
        rid = engine.submit([3, 5, 7], max_new_tokens=4)
        outs = engine.run()
        assert len(outs[rid]) == 4

    def test_engine_int4_auto_has_ring(self):
        from tpu_flash.engine.runner import InferenceEngine
        from tpu_flash.models import TINY_TEST, FlashTransformer

        cfg = dataclasses.replace(TINY_TEST)
        model = FlashTransformer(cfg)
        params = model.init(jax.random.PRNGKey(0))
        engine = InferenceEngine(
            model,
            params,
            EngineConfig(
                max_batch_size=2, max_seq_len=64, prefill_chunk=16,
                cache=CacheConfig(kv_dtype="int4"),
            ),
            interpret=True,
        )
        cc = engine.config.cache
        assert cc.recent_window == 64  # clamped to context
        assert engine.cache.k_recent is not None
