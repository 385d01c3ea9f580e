"""Multi-LoRA serving: per-request adapters must produce EXACTLY what a
base model with merged weights (W + A@B) produces — greedy equivalence
through chunked prefill, burst decode, and speculation — while base
requests in the same batch stay bit-identical to an adapter-free engine
and the prefix cache never aliases adapter KV with base KV."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.core.config import CacheConfig, EngineConfig
from tpu_flash.engine.runner import InferenceEngine
from tpu_flash.models import TINY_TEST, FlashTransformer


@pytest.fixture(scope="module")
def mp():
    model = FlashTransformer(TINY_TEST)
    return model, model.init(jax.random.PRNGKey(0))


def _engine(model, params, *, prefix_cache=False, max_batch=4):
    cfg = EngineConfig(
        max_batch_size=max_batch,
        max_seq_len=128,
        prefill_chunk=8,
        cache=CacheConfig(
            page_size=8, num_pages=64, max_pages_per_seq=8,
            kv_dtype="float32",
        ),
        prefix_cache=prefix_cache,
    )
    return InferenceEngine(model, params, cfg, interpret=True)


def _make_adapter(key, cfg, scale=0.5):
    """Random rank-4 adapters on several projections across both layers,
    large enough to change greedy outputs."""
    h, d = cfg.hidden_size, cfg.head_dim
    qd = cfg.num_q_heads * d
    inter = cfg.intermediate_size
    ks = iter(jax.random.split(key, 8))

    def ab(fan_in, fan_out, r=4):
        a = jax.random.normal(next(ks), (fan_in, r)) * scale / fan_in**0.5
        b = jax.random.normal(next(ks), (r, fan_out))
        return np.asarray(a), np.asarray(b)

    return {
        0: {"wq": ab(h, qd), "w_up": ab(h, inter)},
        1: {"wo": ab(qd, h), "w_down": ab(inter, h)},
    }


def _merged_params(model, params, adapters):
    """Reference: fold every adapter delta into the base weights."""
    p = jax.tree.map(lambda x: x, params)
    layers = [dict(layer) for layer in p["layers"]]
    for li, projs in adapters.items():
        for proj, (a, b) in projs.items():
            w = layers[li][proj]
            layers[li][proj] = (
                w.astype(jnp.float32) + jnp.asarray(a) @ jnp.asarray(b)
            ).astype(w.dtype)
    p["layers"] = layers
    return p


PROMPT = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]


class TestLoRAServing:
    def test_adapter_matches_merged_weights(self, mp):
        model, params = mp
        adapters = _make_adapter(jax.random.PRNGKey(1), model.config)

        merged = _engine(model, _merged_params(model, params, adapters))
        rid = merged.submit(PROMPT, 6)
        merged.run()
        expect = merged.outputs[rid]

        eng = _engine(model, params)
        eng.register_lora("style-a", adapters)
        rid2 = eng.submit(PROMPT, 6, lora="style-a")
        eng.run()
        assert eng.outputs[rid2] == expect

    def test_mixed_batch_isolation(self, mp):
        """Base + two different adapters decode concurrently; each stream
        matches its own single-model reference and the base stream is
        identical to an adapter-free engine's."""
        model, params = mp
        ad1 = _make_adapter(jax.random.PRNGKey(2), model.config)
        ad2 = _make_adapter(jax.random.PRNGKey(3), model.config, scale=0.9)

        def solo(p, prompt):
            e = _engine(model, p)
            r = e.submit(prompt, 6)
            e.run()
            return e.outputs[r]

        base_expect = solo(params, PROMPT)
        ad1_expect = solo(_merged_params(model, params, ad1), [7, 7, 2, 9])
        ad2_expect = solo(_merged_params(model, params, ad2), [9, 8, 7])

        eng = _engine(model, params)
        eng.register_lora("a1", ad1)
        eng.register_lora("a2", ad2)
        r0 = eng.submit(PROMPT, 6)
        r1 = eng.submit([7, 7, 2, 9], 6, lora="a1")
        r2 = eng.submit([9, 8, 7], 6, lora="a2")
        eng.run()
        assert eng.outputs[r0] == base_expect
        assert eng.outputs[r1] == ad1_expect
        assert eng.outputs[r2] == ad2_expect
        # Adapter streams must actually differ from the base model's on
        # the same prompts (the deltas are large enough by construction).
        assert eng.outputs[r1] != solo(params, [7, 7, 2, 9])

    def test_unknown_adapter_rejected(self, mp):
        model, params = mp
        eng = _engine(model, params)
        with pytest.raises(ValueError, match="unknown adapter"):
            eng.submit(PROMPT, 4, lora="nope")

    def test_prefix_cache_never_aliases_adapter_kv(self, mp):
        """Same prompt as base then as adapter: the adapter request must
        not reuse the base request's cached prefix pages (its KV differs),
        and vice versa — outputs stay reference-exact for both."""
        model, params = mp
        adapters = _make_adapter(jax.random.PRNGKey(4), model.config)
        prompt = PROMPT * 2  # 22 tokens: spans multiple pages/chunks

        merged = _engine(model, _merged_params(model, params, adapters))
        rid = merged.submit(prompt, 5)
        merged.run()
        adapter_expect = merged.outputs[rid]
        base_eng = _engine(model, params)
        b = base_eng.submit(prompt, 5)
        base_eng.run()
        base_expect = base_eng.outputs[b]

        eng = _engine(model, params, prefix_cache=True)
        eng.register_lora("a", adapters)
        r_base1 = eng.submit(prompt, 5)
        eng.run()
        r_lora = eng.submit(prompt, 5, lora="a")
        eng.run()
        r_base2 = eng.submit(prompt, 5)  # hits the BASE prefix
        eng.run()
        assert eng.outputs[r_base1] == base_expect
        assert eng.outputs[r_lora] == adapter_expect
        assert eng.outputs[r_base2] == base_expect

    def test_snapshot_restore_with_adapters(self, mp, tmp_path):
        from tpu_flash.checkpoint.store import (
            restore_engine,
            snapshot_engine,
        )

        model, params = mp
        adapters = _make_adapter(jax.random.PRNGKey(5), model.config)
        merged = _engine(model, _merged_params(model, params, adapters))
        rid = merged.submit(PROMPT, 6)
        merged.run()
        expect = merged.outputs[rid]

        eng = _engine(model, params)
        eng.register_lora("a", adapters)
        r = eng.submit(PROMPT, 6, lora="a")
        eng.step(), eng.step()  # mid-flight
        snapshot_engine(tmp_path / "snap", eng)

        fresh = _engine(model, params)
        with pytest.raises(ValueError, match="re-register"):
            restore_engine(tmp_path / "snap", fresh)
        fresh.register_lora("a", adapters)
        restore_engine(tmp_path / "snap", fresh)
        fresh.run()
        assert fresh.outputs[r] == expect

    @pytest.mark.skipif(
        jax.device_count() < 2, reason="needs >= 2 (virtual) devices"
    )
    def test_tensor_parallel_adapter(self, mp):
        """TP serving with adapters: the global-shape stacks slice per
        shard (B's fan_out for column-sharded projections, A's fan_in for
        row-sharded ones) — outputs stay merged-weight exact."""
        from tpu_flash.core.config import MeshConfig
        from tpu_flash.parallel import build_mesh

        model, params = mp
        adapters = _make_adapter(jax.random.PRNGKey(6), model.config)

        merged = _engine(model, _merged_params(model, params, adapters))
        rid = merged.submit(PROMPT, 6)
        merged.run()
        expect = merged.outputs[rid]

        mesh = build_mesh(
            MeshConfig(data=1, model=2, seq=1),
            devices=jax.devices()[:2],
        )
        cfg = EngineConfig(
            max_batch_size=2, max_seq_len=128, prefill_chunk=8,
            cache=CacheConfig(
                page_size=8, num_pages=64, max_pages_per_seq=8,
                kv_dtype="float32",
            ),
            prefix_cache=False,
        )
        eng = InferenceEngine(model, params, cfg, interpret=True,
                              mesh=mesh)
        eng.register_lora("a", adapters)
        r = eng.submit(PROMPT, 6, lora="a")
        b = eng.submit(PROMPT, 6)  # base row rides along
        eng.run()
        assert eng.outputs[r] == expect
        base = _engine(model, params)
        rb = base.submit(PROMPT, 6)
        base.run()
        assert eng.outputs[b] == base.outputs[rb]

    @pytest.mark.skipif(
        jax.device_count() < 2, reason="needs >= 2 (virtual) devices"
    )
    def test_dp_fleet_adapter(self, mp):
        from tpu_flash.engine import DataParallelEngine

        model, params = mp
        adapters = _make_adapter(jax.random.PRNGKey(7), model.config)
        merged = _engine(model, _merged_params(model, params, adapters))
        rid = merged.submit(PROMPT, 5)
        merged.run()
        expect = merged.outputs[rid]

        cfg = EngineConfig(
            max_batch_size=2, max_seq_len=128, prefill_chunk=8,
            cache=CacheConfig(
                page_size=8, num_pages=64, max_pages_per_seq=8,
                kv_dtype="float32",
            ),
            prefix_cache=False,
        )
        dp = DataParallelEngine(model, params, cfg, replicas=2,
                                interpret=True)
        dp.register_lora("a", adapters)
        rids = [dp.submit(PROMPT, 5, lora="a") for _ in range(2)]
        outs = dp.run()
        for r in rids:
            assert outs[r] == expect
        dp.close()
