"""Tensor-parallel serving: the mesh-sharded InferenceEngine must emit
exactly the single-chip engine's tokens (TP is a pure layout change)."""

import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from tpu_flash.core.config import CacheConfig, EngineConfig, MeshConfig
from tpu_flash.engine.runner import InferenceEngine
from tpu_flash.engine.sampling import SamplingParams
from tpu_flash.models import TINY_TEST, FlashTransformer
from tpu_flash.parallel.mesh import build_mesh

requires_8 = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


@pytest.fixture(scope="module")
def model_and_params():
    model = FlashTransformer(TINY_TEST)
    return model, model.init(jax.random.PRNGKey(0))


def _config(kv_dtype="float32"):
    return EngineConfig(
        max_batch_size=2,
        max_seq_len=256,
        prefill_chunk=16,
        cache=CacheConfig(
            page_size=8, num_pages=64, max_pages_per_seq=8,
            kv_dtype=kv_dtype,
        ),
    )


def _tp_mesh(n):
    return build_mesh(MeshConfig(data=1, seq=1, model=n))


class TestShardedEngine:
    @requires_8
    @pytest.mark.parametrize("kv_dtype", ["float32", "int8"])
    def test_tp_matches_single_chip(self, model_and_params, kv_dtype):
        model, params = model_and_params
        prompts = {0: [3, 14, 15, 9, 2, 6], 1: [27, 1, 8]}

        ref = InferenceEngine(model, params, _config(kv_dtype),
                              interpret=True)
        for p in prompts.values():
            ref.submit(p, max_new_tokens=5)
        expected = ref.run()

        mesh = _tp_mesh(2)  # TINY_TEST: 4 q heads, 2 kv heads -> TP=2
        eng = InferenceEngine(model, params, _config(kv_dtype),
                              interpret=True, mesh=mesh)
        for p in prompts.values():
            eng.submit(p, max_new_tokens=5)
        assert eng.run() == expected

    @requires_8
    def test_tp_long_prompt_chunked_prefill(self, model_and_params):
        model, params = model_and_params
        prompt = [int(x) for x in
                  jax.random.randint(jax.random.PRNGKey(5), (40,), 0, 200)]
        ref = InferenceEngine(model, params, _config(), interpret=True)
        r = ref.submit(prompt, max_new_tokens=4)
        expected = ref.run()[r]

        eng = InferenceEngine(model, params, _config(), interpret=True,
                              mesh=_tp_mesh(2))
        r2 = eng.submit(prompt, max_new_tokens=4)
        assert eng.run()[r2] == expected

    @requires_8
    def test_tp_mixed_stage_ragged_prefill(self, model_and_params):
        """Staggered arrivals under TP: mixed-stage chunks fuse through the
        ragged kernel inside shard_map and match the single-chip engine."""
        model, params = model_and_params
        p1 = [int(x) for x in
              jax.random.randint(jax.random.PRNGKey(6), (40,), 0, 200)]
        p2 = [int(x) for x in
              jax.random.randint(jax.random.PRNGKey(7), (30,), 0, 200)]

        def staggered(mesh):
            eng = InferenceEngine(model, params, _config(), interpret=True,
                                  mesh=mesh)
            r1 = eng.submit(p1, max_new_tokens=3)
            eng.step()  # p1 reaches stage 16 alone (prefill_chunk=16)
            r2 = eng.submit(p2, max_new_tokens=3)
            outs = eng.run()
            return outs[r1], outs[r2], bool(eng._ragged_fns)

        ref1, ref2, ref_ragged = staggered(None)
        tp1, tp2, tp_ragged = staggered(_tp_mesh(2))
        assert ref_ragged and tp_ragged, "ragged path not exercised"
        assert (tp1, tp2) == (ref1, ref2)

    @requires_8
    def test_tp_cache_actually_sharded(self, model_and_params):
        model, params = model_and_params
        mesh = _tp_mesh(2)
        eng = InferenceEngine(model, params, _config(), interpret=True,
                              mesh=mesh)
        spec = eng.cache.k_pages.sharding.spec
        assert spec[1] == "model"  # KV heads sharded, not replicated
        wq_spec = eng.params["layers"][0]["wq"].sharding.spec
        assert wq_spec == (None, "model")

    @requires_8
    def test_tp_sampling_consistent(self, model_and_params):
        """Sampled streams must agree with the single-chip engine under the
        same seed (replicated logits + replicated keys)."""
        model, params = model_and_params
        sp = SamplingParams(temperature=1.0, top_k=20)
        ref = InferenceEngine(model, params, _config(), interpret=True,
                              seed=7)
        r1 = ref.submit([3, 14, 15], 6, sampling=sp)
        expected = ref.run()[r1]
        eng = InferenceEngine(model, params, _config(), interpret=True,
                              seed=7, mesh=_tp_mesh(2))
        r2 = eng.submit([3, 14, 15], 6, sampling=sp)
        assert eng.run()[r2] == expected

    @requires_8
    def test_snapshot_restore_reapplies_shardings(
        self, model_and_params, tmp_path
    ):
        """A snapshot taken mid-decode restores into a mesh engine with the
        KV cache re-sharded over the model axis, and resumes to the exact
        uninterrupted token streams."""
        from tpu_flash.checkpoint import restore_engine, snapshot_engine

        model, params = model_and_params
        prompts = {0: [3, 14, 15, 9, 2, 6], 1: [27, 1, 8]}
        mesh = _tp_mesh(2)

        golden = InferenceEngine(model, params, _config(), interpret=True,
                                 mesh=mesh)
        for p in prompts.values():
            golden.submit(p, max_new_tokens=6)
        expected = golden.run()

        first = InferenceEngine(model, params, _config(), interpret=True,
                                mesh=mesh)
        first.max_decode_burst = 2
        for p in prompts.values():
            first.submit(p, max_new_tokens=6)
        for _ in range(3):
            first.step()
        snapshot_engine(tmp_path / "snap", first)
        assert first.scheduler.has_work()  # genuinely mid-decode

        second = InferenceEngine(model, params, _config(), interpret=True,
                                 mesh=_tp_mesh(2))
        restore_engine(tmp_path / "snap", second)
        spec = second.cache.k_pages.sharding.spec
        assert spec[1] == "model"  # restored pages are sharded again
        assert second.run() == expected

    @requires_8
    def test_tp_speculation_matches_single_chip(self, model_and_params):
        """Speculative decoding under the TP engine (batched verify runs
        under shard_map) must emit exactly the single-chip stream."""
        model, params = model_and_params
        prompt = [5, 6, 7, 5, 6, 7, 5, 6, 7, 5, 6]
        ref = InferenceEngine(model, params, _config(), interpret=True)
        ref.speculation_k = 6
        r1 = ref.submit(prompt, max_new_tokens=16)
        expected = ref.run()[r1]
        assert ref.speculation_stats()["proposed"] > 0  # spec engaged

        eng = InferenceEngine(model, params, _config(), interpret=True,
                              mesh=_tp_mesh(2))
        eng.speculation_k = 6
        r2 = eng.submit(prompt, max_new_tokens=16)
        assert eng.run()[r2] == expected
        assert eng.speculation_stats()["proposed"] > 0

    @requires_8
    def test_indivisible_heads_rejected(self, model_and_params):
        model, params = model_and_params
        with pytest.raises(ValueError, match="divide"):
            InferenceEngine(model, params, _config(), interpret=True,
                            mesh=_tp_mesh(8))  # 2 kv heads % 8 != 0
