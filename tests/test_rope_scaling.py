"""RoPE context-extension schemes: linear interpolation, NTK-aware theta
rescale, YaRN per-band interpolation + attention temperature.

All schemes act through the model's frequency table (and, for YaRN, a
static q multiplier), so the same checks cover training forward, engine
prefill, and engine decode paths."""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.models import TINY_TEST, FlashTransformer
from tpu_flash.models.transformer import (
    rope_frequencies,
    scaled_rope_frequencies,
)


def _cfg(**kw):
    return dataclasses.replace(TINY_TEST, **kw)


class TestFrequencyTables:
    def test_off_is_base(self):
        cfg = _cfg()
        freqs, mult = scaled_rope_frequencies(cfg)
        np.testing.assert_allclose(
            freqs, rope_frequencies(cfg.head_dim, cfg.rope_theta)
        )
        assert mult == 1.0

    def test_linear_divides_all_frequencies(self):
        cfg = _cfg(rope_scaling="linear", rope_scaling_factor=4.0)
        freqs, mult = scaled_rope_frequencies(cfg)
        base = rope_frequencies(cfg.head_dim, cfg.rope_theta)
        np.testing.assert_allclose(freqs, base / 4.0, rtol=1e-6)
        assert mult == 1.0

    def test_ntk_theta_formula(self):
        cfg = _cfg(rope_scaling="ntk", rope_scaling_factor=2.0)
        freqs, mult = scaled_rope_frequencies(cfg)
        d = cfg.head_dim
        theta2 = cfg.rope_theta * 2.0 ** (d / (d - 2))
        np.testing.assert_allclose(
            freqs, rope_frequencies(d, theta2), rtol=1e-6
        )
        assert mult == 1.0
        # The fastest dimension is barely touched; the slowest moves
        # nearly as much as linear scaling would.
        base = rope_frequencies(d, cfg.rope_theta)
        assert abs(float(freqs[0] / base[0]) - 1.0) < 1e-6
        assert float(freqs[-1] / base[-1]) < 0.75

    def test_yarn_band_interpolation_and_temperature(self):
        s = 8.0
        cfg = _cfg(
            rope_scaling="yarn", rope_scaling_factor=s,
            rope_orig_context=4096, head_dim=128,
        )
        freqs, mult = scaled_rope_frequencies(cfg)
        base = rope_frequencies(cfg.head_dim, cfg.rope_theta)
        lam = 2.0 * math.pi / np.asarray(base)
        rotations = cfg.rope_orig_context / lam
        # Fast bands (many rotations at the original context): unchanged.
        fast = rotations > 32.0
        np.testing.assert_allclose(
            np.asarray(freqs)[fast], np.asarray(base)[fast], rtol=1e-6
        )
        # Slow bands (< 1 rotation): fully interpolated.
        slow = rotations < 1.0
        if slow.any():
            np.testing.assert_allclose(
                np.asarray(freqs)[slow], np.asarray(base)[slow] / s,
                rtol=1e-6,
            )
        t = 0.1 * math.log(s) + 1.0
        assert abs(mult - t * t) < 1e-9

    def test_unknown_scheme_rejected(self):
        with pytest.raises(ValueError, match="rope_scaling"):
            FlashTransformer(
                _cfg(rope_scaling="bogus", rope_scaling_factor=2.0)
            )


class TestScaledModelServing:
    def _oracle(self, model, params, prompt, n_new):
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

    @pytest.mark.parametrize("scheme", ["linear", "ntk", "yarn"])
    def test_engine_matches_oracle(self, scheme):
        """Scaled-rope models must serve exactly: decode_qkv shares the
        frequency table and q multiplier with the training forward."""
        from tpu_flash.core.config import CacheConfig, EngineConfig
        from tpu_flash.engine.runner import InferenceEngine

        cfg = _cfg(
            rope_scaling=scheme, rope_scaling_factor=4.0,
            rope_orig_context=64,
        )
        model = FlashTransformer(cfg)
        params = model.init(jax.random.PRNGKey(0))
        engine = InferenceEngine(
            model, params,
            EngineConfig(
                max_batch_size=2, max_seq_len=256, prefill_chunk=64,
                cache=CacheConfig(
                    page_size=8, num_pages=64, max_pages_per_seq=16,
                ),
            ),
            interpret=True,
        )
        prompt = [3, 14, 15, 9, 2, 6, 31, 41, 5, 92]
        rid = engine.submit(prompt, max_new_tokens=6)
        assert engine.run()[rid] == self._oracle(model, params, prompt, 6)

    def test_yarn_changes_long_range_attention(self):
        """Sanity: scaling actually changes the computation (logits differ
        from the unscaled model at long positions)."""
        base = FlashTransformer(_cfg())
        yarn = FlashTransformer(
            _cfg(rope_scaling="yarn", rope_scaling_factor=8.0,
                 rope_orig_context=32)
        )
        params = base.init(jax.random.PRNGKey(0))
        tokens = jnp.asarray(
            [list(range(1, 101))], jnp.int32
        )
        lb = base.forward(params, tokens, interpret=True)
        ly = yarn.forward(params, tokens, interpret=True)
        assert float(jnp.max(jnp.abs(lb - ly))) > 1e-3


class TestHFConfigImport:
    def test_mistral_style_config(self):
        from tpu_flash.checkpoint import model_config_from_hf

        hf = {
            "hidden_size": 4096, "num_attention_heads": 32,
            "num_key_value_heads": 8, "num_hidden_layers": 32,
            "intermediate_size": 14336, "vocab_size": 32000,
            "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
            "sliding_window": 4096, "max_position_embeddings": 32768,
        }
        cfg = model_config_from_hf(hf)
        assert cfg.sliding_window == 4096
        assert cfg.num_kv_heads == 8 and cfg.head_dim == 128
        assert cfg.rope_scaling is None

    def test_gemma2_style_softcap_and_yarn(self):
        from tpu_flash.checkpoint import model_config_from_hf

        hf = {
            "hidden_size": 2304, "num_attention_heads": 8,
            "num_key_value_heads": 4, "num_hidden_layers": 26,
            "intermediate_size": 9216, "vocab_size": 256000,
            "head_dim": 256, "attn_logit_softcapping": 50.0,
            "rope_scaling": {
                "rope_type": "yarn", "factor": 8.0,
                "original_max_position_embeddings": 8192,
            },
        }
        cfg = model_config_from_hf(hf)
        assert cfg.attn_softcap == 50.0
        assert cfg.head_dim == 256
        assert cfg.rope_scaling == "yarn"
        assert cfg.rope_scaling_factor == 8.0
        assert cfg.rope_orig_context == 8192

    def test_unknown_rope_type_rejected(self):
        from tpu_flash.checkpoint import model_config_from_hf

        hf = {
            "hidden_size": 64, "num_attention_heads": 4,
            "num_hidden_layers": 2, "intermediate_size": 128,
            "vocab_size": 256,
            "rope_scaling": {"rope_type": "alien", "factor": 2.0},
        }
        with pytest.raises(ValueError, match="rope_scaling"):
            model_config_from_hf(hf)


class TestLlama3SchemeAndQPAS:
    def test_llama3_band_math(self):
        import math as _m

        cfg = _cfg(
            rope_scaling="llama3", rope_scaling_factor=8.0,
            rope_orig_context=8192, head_dim=128,
            rope_low_freq_factor=1.0, rope_high_freq_factor=4.0,
        )
        freqs, mult = scaled_rope_frequencies(cfg)
        base = rope_frequencies(cfg.head_dim, cfg.rope_theta)
        wl = 2.0 * _m.pi / np.asarray(base)
        low_wl = cfg.rope_orig_context / 1.0
        high_wl = cfg.rope_orig_context / 4.0
        f, b = np.asarray(freqs), np.asarray(base)
        np.testing.assert_allclose(f[wl > low_wl], b[wl > low_wl] / 8.0,
                                   rtol=1e-6)
        np.testing.assert_allclose(f[wl < high_wl], b[wl < high_wl],
                                   rtol=1e-6)
        mid = (wl >= high_wl) & (wl <= low_wl)
        assert np.all(f[mid] > b[mid] / 8.0) and np.all(f[mid] < b[mid])
        assert mult == 1.0  # llama3 has NO attention temperature

    def test_query_pre_attn_scalar_folds_into_q(self):
        import math as _m

        cfg = _cfg(query_pre_attn_scalar=144.0)
        _, mult = scaled_rope_frequencies(cfg)
        assert abs(mult - _m.sqrt(cfg.head_dim / 144.0)) < 1e-9

    def test_qpas_engine_matches_oracle(self):
        from tpu_flash.core.config import CacheConfig, EngineConfig
        from tpu_flash.engine.runner import InferenceEngine

        cfg = _cfg(query_pre_attn_scalar=50.0)
        model = FlashTransformer(cfg)
        params = model.init(jax.random.PRNGKey(0))
        engine = InferenceEngine(
            model, params,
            EngineConfig(
                max_batch_size=2, max_seq_len=256, prefill_chunk=64,
                cache=CacheConfig(
                    page_size=8, num_pages=64, max_pages_per_seq=16,
                ),
            ),
            interpret=True,
        )
        prompt = [3, 14, 15, 9, 2, 6]
        rid = engine.submit(prompt, max_new_tokens=5)
        oracle = TestScaledModelServing()._oracle(model, params, prompt, 5)
        assert engine.run()[rid] == oracle

    def test_hf_llama31_mapping(self):
        from tpu_flash.checkpoint import model_config_from_hf

        hf = {
            "hidden_size": 4096, "num_attention_heads": 32,
            "num_key_value_heads": 8, "num_hidden_layers": 32,
            "intermediate_size": 14336, "vocab_size": 128256,
            "rope_theta": 500000.0,
            "max_position_embeddings": 131072,
            "rope_scaling": {
                "rope_type": "llama3", "factor": 8.0,
                "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                "original_max_position_embeddings": 8192,
            },
        }
        cfg = model_config_from_hf(hf)
        assert cfg.rope_scaling == "llama3"
        assert cfg.rope_orig_context == 8192  # NOT the extended 131072
        assert cfg.rope_high_freq_factor == 4.0

    def test_hf_yarn_requires_original_context(self):
        from tpu_flash.checkpoint import model_config_from_hf

        hf = {
            "hidden_size": 64, "num_attention_heads": 4,
            "num_hidden_layers": 2, "intermediate_size": 128,
            "vocab_size": 256,
            "rope_scaling": {"rope_type": "yarn", "factor": 4.0},
        }
        with pytest.raises(ValueError, match="original_max_position"):
            model_config_from_hf(hf)

    def test_hf_dynamic_ntk_rejected(self):
        from tpu_flash.checkpoint import model_config_from_hf

        hf = {
            "hidden_size": 64, "num_attention_heads": 4,
            "num_hidden_layers": 2, "intermediate_size": 128,
            "vocab_size": 256,
            "rope_scaling": {"type": "dynamic", "factor": 2.0},
        }
        with pytest.raises(ValueError, match="dynamic"):
            model_config_from_hf(hf)

    def test_hf_gemma2_qpas_mapped(self):
        from tpu_flash.checkpoint import model_config_from_hf

        hf = {
            "model_type": "gemma2", "hidden_size": 4608,
            "num_attention_heads": 32, "num_key_value_heads": 16,
            "num_hidden_layers": 46, "intermediate_size": 36864,
            "vocab_size": 256000, "head_dim": 128,
            "query_pre_attn_scalar": 144,
        }
        assert model_config_from_hf(hf).query_pre_attn_scalar == 144

