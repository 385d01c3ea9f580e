"""Checkpoint / resume subsystem tests.

The reference has no serialization anywhere (SURVEY.md §5); these tests pin
the TPU-native replacement: weight round-trips, keep-N training checkpoints,
mid-decode engine snapshot/restore equivalence, and HF weight import.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.checkpoint import (
    TrainCheckpointManager,
    params_from_hf_llama,
    restore_engine,
    restore_params,
    save_params,
    snapshot_engine,
)
from tpu_flash.core.config import CacheConfig, EngineConfig
from tpu_flash.engine.runner import InferenceEngine
from tpu_flash.models import TINY_TEST, FlashTransformer


@pytest.fixture(scope="module")
def model_and_params():
    model = FlashTransformer(TINY_TEST)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def _trees_equal(a, b):
    flat_a = jax.tree.leaves(a)
    flat_b = jax.tree.leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _engine(model, params, kv_dtype="float32"):
    cfg = EngineConfig(
        max_batch_size=2,
        max_seq_len=256,
        prefill_chunk=64,
        cache=CacheConfig(
            page_size=8, num_pages=64, max_pages_per_seq=8, kv_dtype=kv_dtype
        ),
    )
    return InferenceEngine(model, params, cfg, interpret=True)


class TestParamsRoundTrip:
    def test_save_restore(self, model_and_params, tmp_path):
        _, params = model_and_params
        save_params(tmp_path / "ckpt", params)
        restored = restore_params(tmp_path / "ckpt", like=params)
        _trees_equal(params, restored)

    def test_restore_without_template(self, model_and_params, tmp_path):
        _, params = model_and_params
        save_params(tmp_path / "ckpt", params)
        restored = restore_params(tmp_path / "ckpt")
        _trees_equal(params, restored)


class TestTrainManager:
    def test_keep_n_and_restore_latest(self, model_and_params, tmp_path):
        _, params = model_and_params
        opt_state = {"mu": jax.tree.map(jnp.zeros_like, params["final_norm"])}
        with TrainCheckpointManager(tmp_path / "train", max_to_keep=2) as mgr:
            for step in (1, 2, 3):
                bumped = jax.tree.map(lambda x: x + step, params)
                mgr.save(step, bumped, opt_state)
            assert mgr.latest_step() == 3
            step, restored, opt = mgr.restore_latest(
                like_params=params, like_opt_state=opt_state
            )
        assert step == 3
        _trees_equal(jax.tree.map(lambda x: x + 3, params), restored)
        assert opt is not None

    def test_restore_empty_dir_is_none(self, tmp_path):
        with TrainCheckpointManager(tmp_path / "empty") as mgr:
            assert mgr.restore_latest() is None


class TestEngineSnapshot:
    @pytest.mark.parametrize("kv_dtype",
                             ["float32", "int8", "bfloat16", "fp8"])
    def test_mid_decode_snapshot_resumes_identically(
        self, model_and_params, tmp_path, kv_dtype
    ):
        model, params = model_and_params
        prompts = {0: [3, 14, 15, 9, 2, 6], 1: [27, 1, 8]}

        # Uninterrupted run → golden outputs.
        golden = _engine(model, params, kv_dtype)
        for p in prompts.values():
            golden.submit(p, max_new_tokens=6)
        expected = golden.run()

        # Interrupted run: a few steps, snapshot, resume in a NEW engine.
        # Burst decoding would finish 6 tokens in one fused call; keep the
        # burst small so the snapshot lands genuinely mid-decode.
        first = _engine(model, params, kv_dtype)
        first.max_decode_burst = 2
        for p in prompts.values():
            first.submit(p, max_new_tokens=6)
        for _ in range(3):  # prefill + a couple of decode bursts
            first.step()
        snapshot_engine(tmp_path / "snap", first)
        partial = {k: list(v) for k, v in first.outputs.items()}
        assert any(partial.values())  # mid-decode, not trivially empty
        assert first.scheduler.has_work()  # genuinely interrupted

        second = _engine(model, params, kv_dtype)
        restore_engine(tmp_path / "snap", second)
        assert {k: list(v) for k, v in second.outputs.items()} == partial
        resumed = second.run()
        assert resumed == expected

    def test_restore_shape_mismatch_raises(self, model_and_params, tmp_path):
        model, params = model_and_params
        eng = _engine(model, params)
        eng.submit([1, 2, 3], max_new_tokens=2)
        eng.step()
        snapshot_engine(tmp_path / "snap", eng)

        other_cfg = EngineConfig(
            max_batch_size=2,
            max_seq_len=256,
            prefill_chunk=64,
            cache=CacheConfig(
                page_size=8, num_pages=32, max_pages_per_seq=8,
                kv_dtype="float32",
            ),
        )
        other = InferenceEngine(model, params, other_cfg, interpret=True)
        with pytest.raises(ValueError, match="shape"):
            restore_engine(tmp_path / "snap", other)


class TestHFConvert:
    def test_round_trip_from_synthetic_state_dict(self, model_and_params):
        _, params = model_and_params
        cfg = TINY_TEST
        sd = {
            "model.embed_tokens.weight": np.asarray(
                params["embed"], np.float32
            ),
            "model.norm.weight": np.asarray(params["final_norm"], np.float32),
            "lm_head.weight": np.asarray(params["lm_head"], np.float32).T,
        }
        names = {
            "wq": "self_attn.q_proj", "wk": "self_attn.k_proj",
            "wv": "self_attn.v_proj", "wo": "self_attn.o_proj",
            "w_gate": "mlp.gate_proj", "w_up": "mlp.up_proj",
            "w_down": "mlp.down_proj",
        }
        for i, layer in enumerate(params["layers"]):
            p = f"model.layers.{i}."
            sd[p + "input_layernorm.weight"] = np.asarray(
                layer["attn_norm"], np.float32
            )
            sd[p + "post_attention_layernorm.weight"] = np.asarray(
                layer["mlp_norm"], np.float32
            )
            for ours, hf in names.items():
                sd[p + hf + ".weight"] = np.asarray(
                    layer[ours], np.float32
                ).T
        converted = params_from_hf_llama(sd, cfg)
        _trees_equal(params, converted)

    def test_torch_tensors_accepted(self, model_and_params):
        torch = pytest.importorskip("torch")
        _, params = model_and_params
        cfg = TINY_TEST
        sd = {
            "model.embed_tokens.weight": torch.randn(
                cfg.vocab_size, cfg.hidden_size
            ),
            "model.norm.weight": torch.ones(cfg.hidden_size),
            "lm_head.weight": torch.randn(cfg.vocab_size, cfg.hidden_size),
        }
        qd = cfg.num_q_heads * cfg.head_dim
        kvd = cfg.num_kv_heads * cfg.head_dim
        for i in range(cfg.num_layers):
            p = f"model.layers.{i}."
            sd[p + "input_layernorm.weight"] = torch.ones(cfg.hidden_size)
            sd[p + "post_attention_layernorm.weight"] = torch.ones(
                cfg.hidden_size
            )
            sd[p + "self_attn.q_proj.weight"] = torch.randn(
                qd, cfg.hidden_size
            )
            sd[p + "self_attn.k_proj.weight"] = torch.randn(
                kvd, cfg.hidden_size
            )
            sd[p + "self_attn.v_proj.weight"] = torch.randn(
                kvd, cfg.hidden_size
            )
            sd[p + "self_attn.o_proj.weight"] = torch.randn(
                cfg.hidden_size, qd
            )
            sd[p + "mlp.gate_proj.weight"] = torch.randn(
                cfg.intermediate_size, cfg.hidden_size
            )
            sd[p + "mlp.up_proj.weight"] = torch.randn(
                cfg.intermediate_size, cfg.hidden_size
            )
            sd[p + "mlp.down_proj.weight"] = torch.randn(
                cfg.hidden_size, cfg.intermediate_size
            )
        converted = params_from_hf_llama(sd, cfg)
        # Forward must run on the converted tree.
        model = FlashTransformer(cfg)
        logits = model.forward(
            converted, jnp.zeros((1, 8), jnp.int32), interpret=True
        )
        assert logits.shape == (1, 8, cfg.vocab_size)
        assert bool(jnp.all(jnp.isfinite(logits)))


class TestAllocExact:
    @pytest.mark.parametrize("prefer_native", [True, False])
    def test_alloc_exact_semantics(self, prefer_native):
        from tpu_flash.engine.allocator import PageAllocator

        alloc = PageAllocator(8, prefer_native=prefer_native)
        assert alloc.alloc_exact(7, [2, 5])
        assert alloc.pages_of(7) == [2, 5]
        assert alloc.num_free == 6
        # Already-taken page → all-or-nothing failure.
        assert not alloc.alloc_exact(8, [5, 1])
        assert alloc.num_free == 6
        # Duplicates rejected.
        assert not alloc.alloc_exact(9, [1, 1])
        # Out of range rejected.
        assert not alloc.alloc_exact(9, [99])
        alloc.release(7)
        assert alloc.num_free == 8


class TestLoadHFDir:
    def test_load_from_directory_bins(self, tmp_path):
        torch = pytest.importorskip("torch")
        import json as _json

        from tpu_flash.checkpoint import load_hf_dir

        hidden, n_q, n_kv, hd, inter, vocab, layers = 64, 4, 2, 16, 128, 256, 2
        hf_cfg = {
            "model_type": "llama",
            "hidden_size": hidden,
            "num_attention_heads": n_q,
            "num_key_value_heads": n_kv,
            "head_dim": hd,
            "intermediate_size": inter,
            "vocab_size": vocab,
            "num_hidden_layers": layers,
            "rms_norm_eps": 1e-5,
            "rope_theta": 10000.0,
            "max_position_embeddings": 4096,
        }
        (tmp_path / "config.json").write_text(_json.dumps(hf_cfg))
        sd = {
            "model.embed_tokens.weight": torch.randn(vocab, hidden),
            "model.norm.weight": torch.ones(hidden),
            "lm_head.weight": torch.randn(vocab, hidden),
        }
        qd, kvd = n_q * hd, n_kv * hd
        for i in range(layers):
            p = f"model.layers.{i}."
            sd[p + "input_layernorm.weight"] = torch.ones(hidden)
            sd[p + "post_attention_layernorm.weight"] = torch.ones(hidden)
            sd[p + "self_attn.q_proj.weight"] = torch.randn(qd, hidden)
            sd[p + "self_attn.k_proj.weight"] = torch.randn(kvd, hidden)
            sd[p + "self_attn.v_proj.weight"] = torch.randn(kvd, hidden)
            sd[p + "self_attn.o_proj.weight"] = torch.randn(hidden, qd)
            sd[p + "mlp.gate_proj.weight"] = torch.randn(inter, hidden)
            sd[p + "mlp.up_proj.weight"] = torch.randn(inter, hidden)
            sd[p + "mlp.down_proj.weight"] = torch.randn(hidden, inter)
        # Two shards: loader must merge them.
        keys = sorted(sd)
        torch.save({k: sd[k] for k in keys[: len(keys) // 2]},
                   tmp_path / "pytorch_model-00001-of-00002.bin")
        torch.save({k: sd[k] for k in keys[len(keys) // 2:]},
                   tmp_path / "pytorch_model-00002-of-00002.bin")
        model, params = load_hf_dir(str(tmp_path), dtype="float32")
        assert model.config.num_layers == layers
        logits = model.forward(
            params, jnp.zeros((1, 8), jnp.int32), interpret=True
        )
        assert logits.shape == (1, 8, vocab)
        assert bool(jnp.all(jnp.isfinite(logits)))

    def test_missing_shards_raises(self, tmp_path):
        import json as _json

        from tpu_flash.checkpoint import load_hf_dir

        (tmp_path / "config.json").write_text(_json.dumps({
            "model_type": "llama", "hidden_size": 64,
            "num_attention_heads": 4, "intermediate_size": 128,
            "vocab_size": 256, "num_hidden_layers": 2,
        }))
        with pytest.raises(FileNotFoundError):
            load_hf_dir(str(tmp_path))
