"""End-to-end engine test: the paged continuous-batching engine must decode
exactly what an incremental dense-cache oracle decodes for the same model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.core.config import CacheConfig, EngineConfig
from tpu_flash.core.reference import reference_gqa_attention
from tpu_flash.engine.runner import InferenceEngine
from tpu_flash.models import TINY_TEST, FlashTransformer
from tpu_flash.models.transformer import _rms_norm, apply_rope


def _oracle_generate(model, params, prompt, n_new):
    """Greedy generation with a plain dense forward re-run each step — the
    slowest possible exact oracle."""
    cfg = model.config
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


@pytest.fixture(scope="module")
def model_and_params():
    model = FlashTransformer(TINY_TEST)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def _engine(model, params, kv_dtype="float32", max_batch=2):
    cfg = EngineConfig(
        max_batch_size=max_batch,
        max_seq_len=256,
        prefill_chunk=64,
        cache=CacheConfig(
            page_size=8, num_pages=64, max_pages_per_seq=8, kv_dtype=kv_dtype
        ),
    )
    return InferenceEngine(model, params, cfg, interpret=True)


class TestEngineEndToEnd:
    def test_single_request_matches_oracle(self, model_and_params):
        model, params = model_and_params
        engine = _engine(model, params)
        prompt = [3, 14, 15, 9, 2, 6]
        rid = engine.submit(prompt, max_new_tokens=5)
        outputs = engine.run()
        expected = _oracle_generate(model, params, prompt, 5)
        assert outputs[rid] == expected

    @pytest.mark.parametrize("burst", [1, 3, 16])
    def test_decode_burst_cap_does_not_change_output(
        self, model_and_params, burst
    ):
        """max_decode_burst only changes how many steps fuse per dispatch
        (EngineConfig knob, re-tunable per attachment); greedy output must
        be identical at any cap."""
        model, params = model_and_params
        cfg = EngineConfig(
            max_batch_size=2,
            max_seq_len=256,
            prefill_chunk=64,
            max_decode_burst=burst,
            cache=CacheConfig(
                page_size=8, num_pages=64, max_pages_per_seq=8,
                kv_dtype="float32",
            ),
        )
        engine = InferenceEngine(model, params, cfg, interpret=True)
        prompt = [5, 4, 3, 2, 1]
        rid = engine.submit(prompt, max_new_tokens=7)
        outputs = engine.run()
        assert outputs[rid] == _oracle_generate(model, params, prompt, 7)

    def test_concurrent_requests_isolated(self, model_and_params):
        # Two sequences decoding in the same batch must not cross-talk —
        # the bug class of the reference's flattened batch loop
        # (computers.cuh:33,42) that SURVEY.md flags as "do not reproduce".
        model, params = model_and_params
        engine = _engine(model, params, max_batch=2)
        p1, p2 = [1, 2, 3, 4], [9, 8, 7, 6, 5]
        r1 = engine.submit(p1, max_new_tokens=4)
        r2 = engine.submit(p2, max_new_tokens=4)
        outputs = engine.run()
        assert outputs[r1] == _oracle_generate(model, params, p1, 4)
        assert outputs[r2] == _oracle_generate(model, params, p2, 4)

    def test_batched_prefill_same_step_parity(self, model_and_params):
        """A burst of same-step arrivals prefills as ONE batched dispatch
        (rows padded to the group bucket, masked by n_valids) and must
        decode exactly what each request decodes alone."""
        model, params = model_and_params
        prompts = [[3, 14, 15, 9, 2, 6], [27, 1, 8], [5, 5, 5, 5, 5]]
        expected = [
            _oracle_generate(model, params, p, 4) for p in prompts
        ]
        engine = _engine(model, params, max_batch=4)
        rids = [engine.submit(p, max_new_tokens=4) for p in prompts]
        outputs = engine.run()
        for rid, exp in zip(rids, expected):
            assert outputs[rid] == exp
        # The burst really grouped: a prefill program with batch rows > 1.
        assert any(k[2] > 1 for k in engine._prefill_fns), (
            engine._prefill_fns.keys()
        )

    def test_batched_chunked_prefill_long_prompts(self, model_and_params):
        """Two long prompts arriving together stream through the SAME
        chunk stages batched (shared static hist_len per stage), attending
        to their own paged histories."""
        model, params = model_and_params
        key = jax.random.PRNGKey(11)
        p1 = [int(x) for x in
              jax.random.randint(key, (150,), 0, 200)]
        p2 = [int(x) for x in
              jax.random.randint(jax.random.PRNGKey(12), (100,), 0, 200)]
        expected = [
            _oracle_generate(model, params, p, 3) for p in (p1, p2)
        ]
        cfg = EngineConfig(
            max_batch_size=2, max_seq_len=256, prefill_chunk=64,
            cache=CacheConfig(
                page_size=8, num_pages=64, max_pages_per_seq=32,
            ),
        )
        engine = InferenceEngine(model, params, cfg, interpret=True)
        rids = [engine.submit(p, max_new_tokens=3) for p in (p1, p2)]
        outputs = engine.run()
        for rid, exp in zip(rids, expected):
            assert outputs[rid] == exp
        # Stages 0 and 64 grouped both requests (batch dim 2).
        assert (0, 64, 2) in engine._prefill_fns
        assert (64, 64, 2) in engine._prefill_fns

    def test_mixed_stage_ragged_prefill_parity(self, model_and_params):
        """Requests admitted at staggered steps reach DIFFERENT prefill
        stages; their chunks must fuse into ONE ragged dispatch per step
        (ops/flash/ragged.py) and still decode exactly what each request
        decodes alone."""
        model, params = model_and_params
        key = jax.random.PRNGKey(21)
        p1 = [int(x) for x in jax.random.randint(key, (150,), 0, 200)]
        p2 = [int(x) for x in
              jax.random.randint(jax.random.PRNGKey(22), (100,), 0, 200)]
        expected = [
            _oracle_generate(model, params, p, 3) for p in (p1, p2)
        ]
        cfg = EngineConfig(
            max_batch_size=2, max_seq_len=256, prefill_chunk=64,
            cache=CacheConfig(
                page_size=8, num_pages=64, max_pages_per_seq=32,
            ),
        )
        engine = InferenceEngine(model, params, cfg, interpret=True)
        r1 = engine.submit(p1, max_new_tokens=3)
        engine.step()  # r1 prefills chunk [0, 64) alone
        r2 = engine.submit(p2, max_new_tokens=3)
        outputs = engine.run()  # next steps mix stages: r1@64+, r2@0+
        assert outputs[r1] == expected[0]
        assert outputs[r2] == expected[1]
        # The mixed-stage steps really fused (ragged program compiled).
        assert engine._ragged_fns, "expected a ragged prefill dispatch"

    @pytest.mark.parametrize("kv_dtype", ["float32", "int4"])
    def test_paged_prefill_matches_gather_path(
        self, model_and_params, kv_dtype
    ):
        """The in-kernel paged-history prefill (default) and the
        gather-to-dense fallback must emit identical tokens, for fp and
        quantized caches, including mixed-stage (ragged) steps."""
        model, params = model_and_params
        p1 = [int(x) for x in
              jax.random.randint(jax.random.PRNGKey(31), (150,), 0, 200)]
        p2 = [int(x) for x in
              jax.random.randint(jax.random.PRNGKey(32), (90,), 0, 200)]

        def run(paged):
            cfg = EngineConfig(
                max_batch_size=2, max_seq_len=256, prefill_chunk=64,
                paged_prefill=paged,
                cache=CacheConfig(
                    page_size=8, num_pages=64, max_pages_per_seq=32,
                    kv_dtype=kv_dtype,
                ),
            )
            eng = InferenceEngine(model, params, cfg, interpret=True)
            r1 = eng.submit(p1, max_new_tokens=3)
            eng.step()  # stagger: forces a ragged (mixed-stage) step too
            r2 = eng.submit(p2, max_new_tokens=3)
            outs = eng.run()
            return outs[r1], outs[r2]

        assert run(True) == run(False)

    def test_more_requests_than_slots(self, model_and_params):
        model, params = model_and_params
        engine = _engine(model, params, max_batch=2)
        prompts = [[i + 1, i + 2, i + 3] for i in range(4)]
        rids = [engine.submit(p, max_new_tokens=3) for p in prompts]
        outputs = engine.run()
        for rid, p in zip(rids, prompts):
            assert outputs[rid] == _oracle_generate(model, params, p, 3)
        # All pages returned.
        assert engine.scheduler.allocator.num_seqs == 0

    def test_int8_cache_engine_close(self, model_and_params):
        # INT8 KV cache: generated tokens may legitimately diverge after
        # several steps, but the first greedy token must match and decode
        # must complete.
        model, params = model_and_params
        engine = _engine(model, params, kv_dtype="int8")
        prompt = [5, 10, 15, 20]
        rid = engine.submit(prompt, max_new_tokens=3)
        outputs = engine.run()
        expected = _oracle_generate(model, params, prompt, 3)
        assert len(outputs[rid]) == 3
        assert outputs[rid][0] == expected[0]

    def test_metrics_populated(self, model_and_params):
        model, params = model_and_params
        engine = _engine(model, params)
        engine.submit([1, 2, 3], max_new_tokens=3)
        engine.run()
        s = engine.metrics.summary()
        assert s["decode_tokens"] >= 2
        assert s["prefill_tokens"] == 3
        assert s["decode_tokens_per_s"] > 0


class TestChunkedPrefill:
    """Prompts longer than prefill_chunk stream through chunked prefill
    over paged history (engine/runner.py::_chunked_prefill_impl)."""

    def _small_chunk_engine(self, model, params, kv_dtype="float32",
                            prefill_chunk=16):
        cfg = EngineConfig(
            max_batch_size=2,
            max_seq_len=256,
            prefill_chunk=prefill_chunk,
            cache=CacheConfig(
                page_size=8, num_pages=64, max_pages_per_seq=16,
                kv_dtype=kv_dtype,
            ),
        )
        return InferenceEngine(model, params, cfg, interpret=True)

    @pytest.mark.parametrize("kv_dtype", ["float32", "int8"])
    def test_long_prompt_matches_oracle(self, model_and_params, kv_dtype):
        model, params = model_and_params
        eng = self._small_chunk_engine(model, params, kv_dtype)
        # 3 chunks: 16 + 16 + 8 (ragged final chunk).
        prompt = [int(x) for x in
                  jax.random.randint(jax.random.PRNGKey(42), (40,), 0, 200)]
        rid = eng.submit(prompt, max_new_tokens=4)
        outputs = eng.run()
        expected = _oracle_generate(model, params, prompt, 4)
        if kv_dtype == "float32":
            assert outputs[rid] == expected
        else:
            # int8 cache: history is dequantized for chunks (same error
            # class as decode); greedy tokens may diverge only if logits
            # are near-ties, so require a high match rate.
            matches = sum(a == b for a, b in zip(outputs[rid], expected))
            assert matches >= 3, (outputs[rid], expected)

    def test_chunk_boundary_not_page_aligned(self, model_and_params):
        model, params = model_and_params
        # prefill_chunk=12 with page_size=8: chunks straddle pages.
        eng = self._small_chunk_engine(model, params, prefill_chunk=12)
        prompt = [int(x) for x in
                  jax.random.randint(jax.random.PRNGKey(7), (30,), 0, 200)]
        rid = eng.submit(prompt, max_new_tokens=3)
        outputs = eng.run()
        expected = _oracle_generate(model, params, prompt, 3)
        assert outputs[rid] == expected

    def test_long_prompt_interleaves_with_decode(self, model_and_params):
        model, params = model_and_params
        eng = self._small_chunk_engine(model, params)
        short = [5, 6, 7]
        long = [int(x) for x in
                jax.random.randint(jax.random.PRNGKey(9), (48,), 0, 200)]
        rid_s = eng.submit(short, max_new_tokens=6)
        rid_l = eng.submit(long, max_new_tokens=3)
        outputs = eng.run()
        assert outputs[rid_s] == _oracle_generate(model, params, short, 6)
        assert outputs[rid_l] == _oracle_generate(model, params, long, 3)
