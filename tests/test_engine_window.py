"""End-to-end engine tests for sliding-window / softcap models.

The paged continuous-batching engine must decode exactly what a dense
full-recompute oracle decodes when the model uses Mistral-style sliding
windows or Gemma-2-style logit softcapping. Every dispatch path applies
the mask natively: the decode kernel skips below-window KV blocks, dense
and paged-sweep prefill band-mask in-kernel, ragged mixed-stage prefill
windows per-row offsets, and speculative verify masks its dynamic
positions.
"""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from tpu_flash.core.config import CacheConfig, EngineConfig
from tpu_flash.engine.runner import InferenceEngine
from tpu_flash.models import TINY_TEST, FlashTransformer


def _oracle_generate(model, params, prompt, n_new):
    tokens = list(prompt)
    out = []
    for _ in range(n_new):
        logits = model.forward(
            params, jnp.asarray(tokens, jnp.int32)[None], interpret=True
        )
        nxt = int(jnp.argmax(logits[0, -1]))
        out.append(nxt)
        tokens.append(nxt)
    return out


def _make(sliding_window=None, attn_softcap=None):
    cfg = dataclasses.replace(
        TINY_TEST, sliding_window=sliding_window, attn_softcap=attn_softcap
    )
    model = FlashTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def _engine(model, params, max_batch=2, kv_dtype="float32",
            prefill_chunk=64, max_pages=8):
    cfg = EngineConfig(
        max_batch_size=max_batch,
        max_seq_len=256,
        prefill_chunk=prefill_chunk,
        cache=CacheConfig(
            page_size=8, num_pages=64, max_pages_per_seq=max_pages,
            kv_dtype=kv_dtype,
        ),
    )
    return InferenceEngine(model, params, cfg, interpret=True)


class TestWindowedEngine:
    def test_windowed_decode_matches_oracle(self):
        """Window smaller than the sequence: decode must drop old tokens
        from attention exactly as the dense windowed forward does."""
        model, params = _make(sliding_window=12)
        engine = _engine(model, params)
        prompt = [3, 14, 15, 9, 2, 6, 31, 41, 5, 92, 65, 35, 89, 79, 3, 2]
        rid = engine.submit(prompt, max_new_tokens=8)
        outputs = engine.run()
        assert outputs[rid] == _oracle_generate(model, params, prompt, 8)

    def test_windowed_concurrent_requests(self):
        model, params = _make(sliding_window=10)
        engine = _engine(model, params, max_batch=2)
        p1 = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12]
        p2 = [9, 8, 7]
        r1 = engine.submit(p1, max_new_tokens=5)
        r2 = engine.submit(p2, max_new_tokens=5)
        outputs = engine.run()
        assert outputs[r1] == _oracle_generate(model, params, p1, 5)
        assert outputs[r2] == _oracle_generate(model, params, p2, 5)

    def test_windowed_chunked_prefill(self):
        """Prompt far longer than both the window and the prefill chunk:
        later chunks' windows reach back into paged history."""
        model, params = _make(sliding_window=20)
        prompt = [
            int(x)
            for x in jax.random.randint(jax.random.PRNGKey(5), (150,), 0, 200)
        ]
        engine = _engine(model, params, max_pages=32)
        rid = engine.submit(prompt, max_new_tokens=4)
        outputs = engine.run()
        assert outputs[rid] == _oracle_generate(model, params, prompt, 4)

    def test_windowed_mixed_stage_arrivals(self):
        """A long prompt mid-prefill + a fresh arrival: the ragged fused
        mixed-stage dispatch applies the window per-row and must produce
        exact results."""
        model, params = _make(sliding_window=16)
        p1 = [
            int(x)
            for x in jax.random.randint(jax.random.PRNGKey(6), (130,), 0, 200)
        ]
        p2 = [4, 8, 15, 16, 23, 42]
        engine = _engine(model, params, max_batch=2, max_pages=32)
        r1 = engine.submit(p1, max_new_tokens=3)
        engine.step()  # first chunk of p1 only
        r2 = engine.submit(p2, max_new_tokens=3)
        outputs = engine.run()
        assert outputs[r1] == _oracle_generate(model, params, p1, 3)
        assert outputs[r2] == _oracle_generate(model, params, p2, 3)

    def test_windowed_int8_cache(self):
        """Quantized cache + window: the decode kernel masks/bounds blocks
        on the quantized path too (greedy tokens may only differ if quant
        error flips an argmax; with the tiny model's margins they don't)."""
        model, params = _make(sliding_window=12)
        engine = _engine(model, params, kv_dtype="int8")
        prompt = [3, 14, 15, 9, 2, 6, 31, 41, 5, 92, 65, 35]
        rid = engine.submit(prompt, max_new_tokens=6)
        outputs = engine.run()
        assert outputs[rid] == _oracle_generate(model, params, prompt, 6)


class TestSoftcapEngine:
    def test_softcap_decode_matches_oracle(self):
        model, params = _make(attn_softcap=5.0)
        engine = _engine(model, params)
        prompt = [3, 14, 15, 9, 2, 6, 31, 41]
        rid = engine.submit(prompt, max_new_tokens=6)
        outputs = engine.run()
        assert outputs[rid] == _oracle_generate(model, params, prompt, 6)

    def test_softcap_and_window_together(self):
        model, params = _make(sliding_window=10, attn_softcap=8.0)
        engine = _engine(model, params)
        prompt = [3, 14, 15, 9, 2, 6, 31, 41, 5, 92, 65, 35]
        rid = engine.submit(prompt, max_new_tokens=6)
        outputs = engine.run()
        assert outputs[rid] == _oracle_generate(model, params, prompt, 6)


class TestWindowedSpeculation:
    def test_windowed_speculative_stream_exact(self):
        """Speculative decoding on a windowed model: the verify sweep
        applies the window at dynamic positions; the output stream must be
        EXACTLY the non-speculative stream."""
        model, params = _make(sliding_window=10)
        prompt = [5, 6, 7, 5, 6, 7, 5, 6, 7, 5, 6]
        base = _engine(model, params)
        base.speculation_k = 0
        rb = base.submit(prompt, max_new_tokens=20)
        expected = base.run()[rb]
        assert expected == _oracle_generate(model, params, prompt, 20)

        # Draft = the target model itself: proposals are guaranteed (and
        # all-accepted modulo the k+1 cap), so the windowed verify sweep
        # definitely runs.
        cfg = EngineConfig(
            max_batch_size=2, max_seq_len=256, prefill_chunk=64,
            cache=CacheConfig(
                page_size=8, num_pages=64, max_pages_per_seq=8,
            ),
        )
        spec = InferenceEngine(
            model, params, cfg, interpret=True, draft=(model, params)
        )
        spec.speculation_k = 8
        rs = spec.submit(prompt, max_new_tokens=20)
        got = spec.run()[rs]
        assert got == expected
        assert spec.speculation_stats()["proposed"] > 0

    def test_softcap_speculative_stream_exact(self):
        model, params = _make(attn_softcap=6.0)
        prompt = [5, 6, 7, 5, 6, 7, 5, 6, 7, 5, 6]
        base = _engine(model, params)
        base.speculation_k = 0
        rb = base.submit(prompt, max_new_tokens=16)
        expected = base.run()[rb]

        spec = _engine(model, params)
        spec.speculation_k = 8
        rs = spec.submit(prompt, max_new_tokens=16)
        assert spec.run()[rs] == expected


class TestWindowedPagedPrefillPath:
    def test_windowed_paged_prefill_engine_parity(self):
        """Force the in-kernel paged-prefill sweep (paged_prefill=True) on
        a windowed model: results must match the gather path exactly."""
        import dataclasses as _dc

        model, params = _make(sliding_window=14)
        prompt = [
            int(x)
            for x in jax.random.randint(jax.random.PRNGKey(9), (120,), 0, 200)
        ]

        def run(paged):
            cfg = EngineConfig(
                max_batch_size=2, max_seq_len=256, prefill_chunk=64,
                paged_prefill=paged,
                cache=CacheConfig(
                    page_size=8, num_pages=64, max_pages_per_seq=32,
                ),
            )
            eng = InferenceEngine(model, params, cfg, interpret=True)
            rid = eng.submit(prompt, max_new_tokens=4)
            return eng.run()[rid]

        assert run(True) == run(False) == _oracle_generate(
            model, params, prompt, 4
        )


class TestLayerWindowPattern:
    """Gemma-style alternation: some layers local, some global."""

    def test_layer_window_helper(self):
        cfg = dataclasses.replace(
            TINY_TEST, sliding_window=8, sliding_window_pattern=2
        )
        # pattern=2: layers 1, 3, ... (1-indexed multiples of 2) global.
        assert cfg.layer_window(0) == 8
        assert cfg.layer_window(1) is None
        cfg6 = dataclasses.replace(
            TINY_TEST, sliding_window=8, sliding_window_pattern=6
        )
        assert [cfg6.layer_window(i) for i in range(6)] == [
            8, 8, 8, 8, 8, None
        ]

    def test_alternating_engine_matches_oracle(self):
        """TINY_TEST has 2 layers: with pattern=2, layer 0 is windowed and
        layer 1 global — decode and chunked prefill must both honor the
        per-layer masks exactly."""
        model, params = _make(sliding_window=10)
        cfg = dataclasses.replace(
            model.config, sliding_window_pattern=2
        )
        model = FlashTransformer(cfg)
        prompt = [
            int(x)
            for x in jax.random.randint(jax.random.PRNGKey(3), (90,), 0, 200)
        ]
        engine = _engine(model, params, max_pages=32)
        rid = engine.submit(prompt, max_new_tokens=5)
        assert engine.run()[rid] == _oracle_generate(model, params, prompt, 5)

    def test_pattern_differs_from_uniform(self):
        """Sanity: the alternation actually changes outputs vs all-local."""
        model_u, params = _make(sliding_window=6)
        model_p = FlashTransformer(
            dataclasses.replace(model_u.config, sliding_window_pattern=2)
        )
        prompt = [
            int(x)
            for x in jax.random.randint(jax.random.PRNGKey(4), (60,), 0, 200)
        ]
        lu = model_u.forward(
            params, jnp.asarray([prompt], jnp.int32), interpret=True
        )
        lp = model_p.forward(
            params, jnp.asarray([prompt], jnp.int32), interpret=True
        )
        assert float(jnp.max(jnp.abs(lu - lp))) > 1e-4

    def test_hf_gemma2_pattern_mapping(self):
        from tpu_flash.checkpoint import model_config_from_hf

        hf = {
            "model_type": "gemma2", "hidden_size": 2304,
            "num_attention_heads": 8, "num_key_value_heads": 4,
            "num_hidden_layers": 26, "intermediate_size": 9216,
            "vocab_size": 256000, "head_dim": 256,
            "sliding_window": 4096,
        }
        cfg = model_config_from_hf(hf)
        assert cfg.sliding_window_pattern == 2
        hf3 = dict(hf, model_type="gemma3", sliding_window_pattern=6)
        assert model_config_from_hf(hf3).sliding_window_pattern == 6
