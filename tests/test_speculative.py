"""Speculative decoding (prompt-lookup drafts + one-sweep verification):
outputs must be EXACTLY the non-speculative greedy stream — speculation is
pure acceleration — with fewer engine steps on repetitive text."""

import jax
import jax.numpy as jnp
import pytest

from tpu_flash.core.config import CacheConfig, EngineConfig
from tpu_flash.engine.runner import InferenceEngine
from tpu_flash.engine.sampling import SamplingParams
from tpu_flash.models import TINY_TEST, FlashTransformer


@pytest.fixture(scope="module")
def model_and_params():
    model = FlashTransformer(TINY_TEST)
    return model, model.init(jax.random.PRNGKey(0))


def _engine(model, params, spec_k=8, kv_dtype="float32"):
    cfg = EngineConfig(
        max_batch_size=2, max_seq_len=256, prefill_chunk=64,
        cache=CacheConfig(
            page_size=8, num_pages=64, max_pages_per_seq=16,
            kv_dtype=kv_dtype,
        ),
    )
    eng = InferenceEngine(model, params, cfg, interpret=True)
    eng.speculation_k = spec_k
    return eng


def _count_steps(eng):
    steps = 0
    while eng.scheduler.has_work():
        eng.step()
        steps += 1
    return steps


class TestFindDraft:
    def test_bigram_lookup(self):
        ctx = [1, 2, 3, 4, 5, 1, 2]
        # final bigram (1, 2) occurred at start; next tokens are 3, 4, 5.
        assert InferenceEngine._find_draft(ctx, 3) == [3, 4, 5]

    def test_latest_occurrence_wins(self):
        ctx = [1, 2, 9, 9, 1, 2, 7, 7, 1, 2]
        assert InferenceEngine._find_draft(ctx, 2) == [7, 7]

    def test_no_match(self):
        assert InferenceEngine._find_draft([1, 2, 3, 4], 4) == []

    def test_short_context(self):
        assert InferenceEngine._find_draft([1, 2], 4) == []


class TestSpeculativeDecoding:
    @pytest.mark.parametrize("kv_dtype", ["float32", "int8"])
    def test_exact_stream_parity(self, model_and_params, kv_dtype):
        model, params = model_and_params
        # A repetitive prompt so prompt-lookup finds drafts (greedy loops
        # also self-feed repetition, making later drafts hit).
        prompt = [5, 6, 7, 5, 6, 7, 5, 6, 7, 5, 6]
        base = _engine(model, params, spec_k=0, kv_dtype=kv_dtype)
        rb = base.submit(prompt, max_new_tokens=20)
        expected = base.run()[rb]

        spec = _engine(model, params, spec_k=8, kv_dtype=kv_dtype)
        rs = spec.submit(prompt, max_new_tokens=20)
        got = spec.run()[rs]
        assert got == expected
        assert spec.speculation_stats()["proposed"] > 0

    def test_fewer_steps_on_repetitive_text(self, model_and_params):
        model, params = model_and_params
        prompt = [5, 6, 7, 5, 6, 7, 5, 6, 7, 5, 6]
        base = _engine(model, params, spec_k=0)
        base.submit(prompt, max_new_tokens=24)
        base.max_decode_burst = 1  # per-token baseline
        base_steps = _count_steps(base)

        spec = _engine(model, params, spec_k=8)
        spec.max_decode_burst = 1
        spec.submit(prompt, max_new_tokens=24)
        spec_steps = _count_steps(spec)
        assert spec_steps < base_steps, (spec_steps, base_steps)

    def test_sampled_requests_speculate_exactly(self, model_and_params):
        """Non-greedy speculation uses rejection sampling. With top_k=1 the
        sampling distribution is a deterministic point mass, so the
        speculative stream must EQUAL the non-speculative sampled stream —
        deterministic parity straight through the stochastic machinery."""
        model, params = model_and_params
        prompt = [5, 6, 7, 5, 6, 7, 5, 6, 7, 5, 6]
        sp = SamplingParams(temperature=1.0, top_k=1)
        base = _engine(model, params, spec_k=0)
        rb = base.submit(prompt, max_new_tokens=20, sampling=sp)
        expected = base.run()[rb]

        spec = _engine(model, params, spec_k=8)
        rs = spec.submit(prompt, max_new_tokens=20, sampling=sp)
        assert spec.run()[rs] == expected
        assert spec.speculation_stats()["proposed"] > 0

    def test_sampled_speculation_seed_deterministic(self, model_and_params):
        """Hot sampled speculation is reproducible under a fixed seed."""
        model, params = model_and_params
        prompt = [5, 6, 7, 5, 6, 7, 5, 6]
        sp = SamplingParams(temperature=1.0)
        outs = []
        for _ in range(2):
            eng = _engine(model, params, spec_k=4)
            rid = eng.submit(prompt, max_new_tokens=10, sampling=sp)
            outs.append(eng.run()[rid])
        assert outs[0] == outs[1]
        assert len(outs[0]) == 10

    def test_stop_token_inside_accepted_window(self, model_and_params):
        model, params = model_and_params
        prompt = [5, 6, 7, 5, 6, 7, 5, 6]
        base = _engine(model, params, spec_k=0)
        rb = base.submit(prompt, max_new_tokens=16)
        full = base.run()[rb]
        stop = full[6]
        first = full.index(stop)

        spec = _engine(model, params, spec_k=8)
        rs = spec.submit(prompt, max_new_tokens=16, stop_tokens=[stop])
        assert spec.run()[rs] == full[: first + 1]

    def test_budget_respected(self, model_and_params):
        model, params = model_and_params
        prompt = [5, 6, 7, 5, 6, 7, 5, 6]
        eng = _engine(model, params, spec_k=8)
        rid = eng.submit(prompt, max_new_tokens=5)
        assert len(eng.run()[rid]) == 5

    def test_multi_request_batched_speculation_exact(
        self, model_and_params
    ):
        """Multiple concurrent streams speculate in ONE batched verify:
        each stream's greedy tokens must equal its solo non-speculative
        stream (draftable and non-draftable prompts mixed)."""
        model, params = model_and_params
        prompts = [[5, 6, 7, 5, 6, 7, 5, 6, 7, 5, 6], [9, 9, 9]]
        expected = []
        for p in prompts:
            base = _engine(model, params, spec_k=0)
            rb = base.submit(p, max_new_tokens=20)
            expected.append(base.run()[rb])

        eng = _engine(model, params, spec_k=8)
        eng.max_decode_burst = 2  # give drafts a chance to form mid-stream
        rids = [eng.submit(p, max_new_tokens=20) for p in prompts]
        out = eng.run()
        for rid, exp in zip(rids, expected):
            assert out[rid] == exp
        assert eng.speculation_stats()["proposed"] > 0

    @pytest.mark.parametrize("kv_dtype", ["float32", "int8"])
    def test_paged_verify_matches_gather_verify(
        self, model_and_params, kv_dtype
    ):
        """The in-kernel paged verify sweep (default) and the dense
        whole-table-gather verify must emit identical token streams."""
        model, params = model_and_params
        prompt = [5, 6, 7, 5, 6, 7, 5, 6, 7, 5, 6]

        def run(paged):
            cfg = EngineConfig(
                max_batch_size=2, max_seq_len=256, prefill_chunk=64,
                paged_prefill=paged,
                cache=CacheConfig(
                    page_size=8, num_pages=64, max_pages_per_seq=16,
                    kv_dtype=kv_dtype,
                ),
            )
            eng = InferenceEngine(model, params, cfg, interpret=True)
            eng.speculation_k = 8
            rid = eng.submit(prompt, max_new_tokens=20)
            out = eng.run()[rid]
            assert eng.speculation_stats()["proposed"] > 0
            return out

        assert run(True) == run(False)

    def test_draft_model_speculation_exact(self, model_and_params):
        """Draft-model speculation: a separate small model proposes; the
        output stream must still be exactly the non-speculative one. With
        the TARGET ITSELF as draft, every proposal is the argmax, so
        acceptance is ~100% and steps collapse."""
        model, params = model_and_params
        prompt = [3, 14, 15, 9, 2, 6, 11]
        base = _engine(model, params, spec_k=0)
        rb = base.submit(prompt, max_new_tokens=16)
        expected = base.run()[rb]

        spec = InferenceEngine(
            model, params,
            EngineConfig(
                max_batch_size=2, max_seq_len=256, prefill_chunk=64,
                cache=CacheConfig(
                    page_size=8, num_pages=64, max_pages_per_seq=16,
                ),
            ),
            interpret=True, draft=(model, params),
        )
        spec.speculation_k = 4
        spec.max_decode_burst = 1
        rs = spec.submit(prompt, max_new_tokens=16)
        got = spec.run()[rs]
        assert got == expected
        stats = spec.speculation_stats()
        assert stats["proposed"] > 0
        # Self-drafting is argmax-consistent up to float near-ties between
        # the dense draft forward and the paged verify path: expect HIGH
        # acceptance, not bitwise-universal.
        assert stats["acceptance_rate"] >= 0.5, stats

    def test_weak_draft_model_still_exact(self, model_and_params):
        """A differently-initialized draft disagrees often; rejection must
        keep the stream exact regardless of acceptance rate."""
        model, params = model_and_params
        weak = FlashTransformer(TINY_TEST)
        weak_params = weak.init(jax.random.PRNGKey(99))
        prompt = [3, 14, 15, 9, 2, 6, 11]
        base = _engine(model, params, spec_k=0)
        rb = base.submit(prompt, max_new_tokens=12)
        expected = base.run()[rb]

        spec = InferenceEngine(
            model, params,
            EngineConfig(
                max_batch_size=2, max_seq_len=256, prefill_chunk=64,
                cache=CacheConfig(
                    page_size=8, num_pages=64, max_pages_per_seq=16,
                ),
            ),
            interpret=True, draft=(weak, weak_params),
        )
        spec.speculation_k = 4
        rs = spec.submit(prompt, max_new_tokens=12)
        assert spec.run()[rs] == expected

    def test_decode_continues_correctly_after_speculation(
        self, model_and_params
    ):
        """After a rejected draft, the engine's state (lengths, last token,
        cache) must support exact continued decoding — compare the WHOLE
        stream, which crosses several accept/reject boundaries."""
        model, params = model_and_params
        prompt = [3, 14, 15, 3, 14, 15, 3, 14]
        base = _engine(model, params, spec_k=0)
        rb = base.submit(prompt, max_new_tokens=30)
        expected = base.run()[rb]
        spec = _engine(model, params, spec_k=4)
        rs = spec.submit(prompt, max_new_tokens=30)
        assert spec.run()[rs] == expected
