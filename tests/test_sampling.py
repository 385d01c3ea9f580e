"""Sampling tests: greedy/temperature/top-k/top-p semantics, per-slot mixes
in one fused step, engine integration, and determinism under a fixed seed."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.core.config import CacheConfig, EngineConfig
from tpu_flash.engine.runner import InferenceEngine
from tpu_flash.engine.sampling import GREEDY, SamplingParams, sample_tokens
from tpu_flash.models import TINY_TEST, FlashTransformer


def _params(batch, temperature=1.0, top_k=0, top_p=1.0):
    return (
        jnp.full((batch,), temperature, jnp.float32),
        jnp.full((batch,), top_k, jnp.int32),
        jnp.full((batch,), top_p, jnp.float32),
    )


class TestSampleTokens:
    def test_greedy_at_zero_temperature(self):
        logits = jnp.asarray([[0.1, 2.0, -1.0], [3.0, 0.0, 0.5]])
        t, k, p = _params(2, temperature=0.0)
        out = sample_tokens(logits, jax.random.PRNGKey(0), t, k, p)
        np.testing.assert_array_equal(np.asarray(out), [1, 0])

    def test_top_k_1_equals_greedy_at_any_temperature(self):
        logits = jax.random.normal(jax.random.PRNGKey(1), (4, 64))
        t, k, p = _params(4, temperature=5.0, top_k=1)
        out = sample_tokens(logits, jax.random.PRNGKey(2), t, k, p)
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(jnp.argmax(logits, -1))
        )

    def test_top_k_restricts_support(self):
        logits = jax.random.normal(jax.random.PRNGKey(3), (2, 128))
        t, k, p = _params(2, temperature=2.0, top_k=5)
        top5 = jnp.argsort(-logits, axis=-1)[:, :5]
        for i in range(50):
            out = sample_tokens(logits, jax.random.PRNGKey(i), t, k, p)
            for b in range(2):
                assert int(out[b]) in np.asarray(top5[b])

    def test_top_p_keeps_nucleus_only(self):
        # One dominant token (p ~ 0.97): top_p=0.9 must always pick it.
        logits = jnp.asarray([[10.0] + [0.0] * 63])
        t, k, p = _params(1, temperature=1.0, top_p=0.9)
        for i in range(20):
            out = sample_tokens(logits, jax.random.PRNGKey(i), t, k, p)
            assert int(out[0]) == 0

    def test_top_p_1_allows_tail(self):
        logits = jnp.zeros((1, 8))  # uniform
        t, k, p = _params(1, temperature=1.0, top_p=1.0)
        seen = {
            int(sample_tokens(logits, jax.random.PRNGKey(i), t, k, p)[0])
            for i in range(64)
        }
        assert len(seen) > 4  # samples spread over the uniform support

    def test_per_row_mixed_params(self):
        logits = jnp.asarray([[0.0, 5.0, 0.0, 0.0]] * 2)
        t = jnp.asarray([0.0, 10.0], jnp.float32)  # row0 greedy, row1 hot
        k = jnp.asarray([0, 0], jnp.int32)
        p = jnp.asarray([1.0, 1.0], jnp.float32)
        hits = set()
        for i in range(40):
            out = sample_tokens(logits, jax.random.PRNGKey(i), t, k, p)
            assert int(out[0]) == 1  # greedy row always argmax
            hits.add(int(out[1]))
        assert len(hits) > 1  # hot row actually samples

    def test_param_validation(self):
        with pytest.raises(ValueError):
            SamplingParams(temperature=-1)
        with pytest.raises(ValueError):
            SamplingParams(top_k=-1)
        with pytest.raises(ValueError):
            SamplingParams(top_p=0.0)
        with pytest.raises(ValueError):
            SamplingParams(min_p=1.5)

    def test_min_p_1_keeps_only_max(self):
        logits = jax.random.normal(jax.random.PRNGKey(5), (3, 64))
        t, k, p = _params(3, temperature=3.0)
        mp = jnp.ones((3,), jnp.float32)
        for i in range(20):
            out = sample_tokens(
                logits, jax.random.PRNGKey(i), t, k, p, mp
            )
            np.testing.assert_array_equal(
                np.asarray(out), np.asarray(jnp.argmax(logits, -1))
            )

    def test_min_p_restricts_support(self):
        # probs ~ [0.64, 0.23, 0.09, 0.03...]: min_p=0.2 keeps tokens with
        # prob >= 0.2 * 0.64 ~ 0.13 -> {0, 1} only.
        logits = jnp.asarray([[3.0, 2.0, 1.0, 0.0, -1.0, -2.0, -3.0, -4.0]])
        t, k, p = _params(1, temperature=1.0)
        mp = jnp.full((1,), 0.2, jnp.float32)
        seen = set()
        for i in range(80):
            out = sample_tokens(
                logits, jax.random.PRNGKey(i), t, k, p, mp
            )
            seen.add(int(out[0]))
        assert seen <= {0, 1} and len(seen) == 2

    def test_min_p_composes_with_top_k(self):
        logits = jnp.asarray([[3.0, 2.0, 1.9, 1.8, -9.0, -9.0, -9.0, -9.0]])
        t, k, p = _params(1, temperature=1.0, top_k=2)
        mp = jnp.full((1,), 0.05, jnp.float32)  # alone would keep 4
        seen = {
            int(
                sample_tokens(logits, jax.random.PRNGKey(i), t, k, p, mp)[0]
            )
            for i in range(60)
        }
        assert seen <= {0, 1}  # intersection with top-2

    def test_min_p_zero_is_off(self):
        logits = jnp.zeros((1, 8))
        t, k, p = _params(1, temperature=1.0)
        mp = jnp.zeros((1,), jnp.float32)
        seen = {
            int(
                sample_tokens(logits, jax.random.PRNGKey(i), t, k, p, mp)[0]
            )
            for i in range(64)
        }
        assert len(seen) > 4  # uniform support untouched


class TestSpeculativeSample:
    """Exactness of speculative rejection sampling (sampling.py
    speculative_sample): the emitted-token process must be distributionally
    IDENTICAL to sampling from the target, whatever the draft proposes."""

    def _mc(self, logits, draft, temperature=1.0, top_k=0, top_p=1.0,
            n=40_000):
        from tpu_flash.engine.sampling import speculative_sample

        keys = jax.random.split(jax.random.PRNGKey(0), n)
        fn = jax.vmap(
            lambda k: speculative_sample(
                logits, draft, k, jnp.float32(temperature),
                jnp.int32(top_k), jnp.float32(top_p),
            )
        )
        return jax.jit(fn)(keys)  # (tokens [n, k+1], n_emit [n])

    def test_first_token_marginal_matches_target(self):
        # Row 0's target distribution; the draft proposes a LOW-probability
        # token, so rejection + residual correction carry most of the mass.
        logits = jnp.asarray(
            [[2.0, 1.0, 0.0, -1.0], [0.0, 0.0, 0.0, 0.0]], jnp.float32
        )
        draft = jnp.asarray([3], jnp.int32)
        tokens, _ = self._mc(logits, draft)
        first = np.asarray(tokens[:, 0])
        target = np.asarray(jax.nn.softmax(logits[0]))
        emp = np.bincount(first, minlength=4) / len(first)
        np.testing.assert_allclose(emp, target, atol=0.01)

    def test_second_token_conditional_matches_target(self):
        # When draft[0] is accepted, token 1 must be an exact sample from
        # row 1's target (either accepted draft[1] or its residual).
        logits = jnp.asarray(
            [[3.0, 0.0, 0.0, 0.0], [0.5, 1.5, -0.5, 0.0], [0.0] * 4],
            jnp.float32,
        )
        draft = jnp.asarray([0, 2], jnp.int32)  # draft0 likely accepted
        tokens, n_emit = self._mc(logits, draft)
        tokens, n_emit = np.asarray(tokens), np.asarray(n_emit)
        sel = (tokens[:, 0] == 0) & (n_emit >= 2)
        second = tokens[sel, 1]
        target = np.asarray(jax.nn.softmax(logits[1]))
        emp = np.bincount(second, minlength=4) / len(second)
        np.testing.assert_allclose(emp, target, atol=0.015)

    def test_all_accepted_emits_bonus(self):
        # Draft matches the argmax of near-deterministic rows: everything
        # accepts and a bonus token from row k is emitted.
        logits = jnp.asarray(
            [[50.0, 0, 0, 0], [0, 50.0, 0, 0], [0, 0, 50.0, 0]], jnp.float32
        )
        draft = jnp.asarray([0, 1], jnp.int32)
        tokens, n_emit = self._mc(logits, draft, n=64)
        assert np.all(np.asarray(n_emit) == 3)
        np.testing.assert_array_equal(
            np.asarray(tokens), np.tile([0, 1, 2], (64, 1))
        )

    def test_greedy_is_deterministic_argmax(self):
        logits = jnp.asarray(
            [[1.0, 2.0, 0.5, 0.0], [0.1, 0.0, 3.0, 0.2], [9.0, 0, 0, 0]],
            jnp.float32,
        )
        # Draft agrees at position 0 (argmax=1), disagrees at 1 (argmax=2).
        draft = jnp.asarray([1, 0], jnp.int32)
        tokens, n_emit = self._mc(logits, draft, temperature=0.0, n=16)
        assert np.all(np.asarray(n_emit) == 2)  # 1 accepted + correction
        np.testing.assert_array_equal(np.asarray(tokens[:, 0]), 1)
        np.testing.assert_array_equal(np.asarray(tokens[:, 1]), 2)

    def test_filters_respected(self):
        # top_k=2 restricts support to the two highest logits {0, 1}; the
        # draft proposes an out-of-support token, which can never emit.
        logits = jnp.asarray(
            [[2.0, 1.0, 0.0, -3.0], [0.0, 0.0, 0.0, 0.0]], jnp.float32
        )
        draft = jnp.asarray([3], jnp.int32)
        tokens, n_emit = self._mc(logits, draft, top_k=2, n=4000)
        assert np.all(np.asarray(n_emit) == 1)  # always rejected
        assert set(np.asarray(tokens[:, 0]).tolist()) <= {0, 1}


class TestEngineSampling:
    @pytest.fixture(scope="class")
    def model_and_params(self):
        model = FlashTransformer(TINY_TEST)
        return model, model.init(jax.random.PRNGKey(0))

    def _engine(self, model, params, seed=0):
        cfg = EngineConfig(
            max_batch_size=2, max_seq_len=256, prefill_chunk=64,
            cache=CacheConfig(
                page_size=8, num_pages=64, max_pages_per_seq=8,
                kv_dtype="float32",
            ),
        )
        return InferenceEngine(model, params, cfg, interpret=True, seed=seed)

    def test_greedy_default_unchanged(self, model_and_params):
        model, params = model_and_params
        e1 = self._engine(model, params, seed=1)
        e2 = self._engine(model, params, seed=2)
        prompt = [3, 14, 15]
        r1 = e1.submit(prompt, 4)
        r2 = e2.submit(prompt, 4)
        # Greedy is seed-independent.
        assert e1.run()[r1] == e2.run()[r2]

    def test_sampled_run_is_seed_deterministic(self, model_and_params):
        model, params = model_and_params
        sp = SamplingParams(temperature=1.0, top_k=20)
        outs = []
        for _ in range(2):
            eng = self._engine(model, params, seed=7)
            rid = eng.submit([3, 14, 15], 6, sampling=sp)
            outs.append(eng.run()[rid])
        assert outs[0] == outs[1]  # same seed → same stream

    def test_hot_sampling_differs_from_greedy(self, model_and_params):
        model, params = model_and_params
        eng_g = self._engine(model, params)
        rid_g = eng_g.submit([3, 14, 15], 8)
        greedy_out = eng_g.run()[rid_g]
        # Very hot temperature: overwhelmingly unlikely to match greedy.
        eng_s = self._engine(model, params, seed=11)
        rid_s = eng_s.submit(
            [3, 14, 15], 8, sampling=SamplingParams(temperature=8.0)
        )
        assert eng_s.run()[rid_s] != greedy_out

    def test_mixed_batch_greedy_and_sampled(self, model_and_params):
        model, params = model_and_params
        eng = self._engine(model, params, seed=3)
        rid_g = eng.submit([3, 14, 15], 5)  # greedy
        rid_s = eng.submit(
            [9, 9, 9], 5, sampling=SamplingParams(temperature=2.0, top_p=0.9)
        )
        out = eng.run()
        # Greedy stream matches a greedy-only engine (sampling of the other
        # slot must not perturb it).
        ref = self._engine(model, params, seed=99)
        rid_ref = ref.submit([3, 14, 15], 5)
        assert out[rid_g] == ref.run()[rid_ref]
        assert len(out[rid_s]) == 5


class TestStopTokens:
    @pytest.fixture(scope="class")
    def mp(self):
        model = FlashTransformer(TINY_TEST)
        return model, model.init(jax.random.PRNGKey(0))

    def _engine(self, model, params):
        cfg = EngineConfig(
            max_batch_size=2, max_seq_len=256, prefill_chunk=64,
            cache=CacheConfig(
                page_size=8, num_pages=64, max_pages_per_seq=8,
                kv_dtype="float32",
            ),
        )
        return InferenceEngine(model, params, cfg, interpret=True)

    def _greedy_stream(self, model, params, prompt, n):
        eng = self._engine(model, params)
        rid = eng.submit(prompt, n)
        return eng.run()[rid]

    def test_stop_token_truncates_stream(self, mp):
        model, params = mp
        prompt = [3, 14, 15]
        full = self._greedy_stream(model, params, prompt, 10)
        stop = full[4]  # stop at the 5th generated token
        eng = self._engine(model, params)
        rid = eng.submit(prompt, 10, stop_tokens=[stop])
        out = eng.run()[rid]
        # Stream ends at the FIRST occurrence of the stop token (inclusive).
        first = full.index(stop)
        assert out == full[: first + 1]

    def test_stop_in_prefill_first_token(self, mp):
        model, params = mp
        prompt = [3, 14, 15]
        full = self._greedy_stream(model, params, prompt, 3)
        eng = self._engine(model, params)
        rid = eng.submit(prompt, 5, stop_tokens=[full[0]])
        out = eng.run()[rid]
        assert out == [full[0]]  # stopped immediately after prefill

    def test_stop_does_not_affect_other_slot(self, mp):
        model, params = mp
        pa, pb = [3, 14, 15], [9, 9, 9]
        full_a = self._greedy_stream(model, params, pa, 6)
        full_b = self._greedy_stream(model, params, pb, 6)
        stop = full_a[1]
        eng = self._engine(model, params)
        ra = eng.submit(pa, 6, stop_tokens=[stop])
        rb = eng.submit(pb, 6)
        out = eng.run()
        # ra truncated at the FIRST occurrence of the stop token...
        first = full_a.index(stop)
        assert out[ra] == full_a[: first + 1]
        assert len(out[ra]) < 6
        assert out[rb] == full_b  # ...neighbor unaffected

    def test_no_stop_tokens_runs_to_budget(self, mp):
        model, params = mp
        eng = self._engine(model, params)
        rid = eng.submit([1, 2, 3], 4)
        assert len(eng.run()[rid]) == 4


class TestLogprobs:
    @pytest.fixture(scope="class")
    def mp(self):
        model = FlashTransformer(TINY_TEST)
        return model, model.init(jax.random.PRNGKey(0))

    def _engine(self, model, params, spec_k=0):
        cfg = EngineConfig(
            max_batch_size=2, max_seq_len=256, prefill_chunk=64,
            cache=CacheConfig(
                page_size=8, num_pages=64, max_pages_per_seq=8,
                kv_dtype="float32",
            ),
        )
        eng = InferenceEngine(model, params, cfg, interpret=True)
        eng.speculation_k = spec_k
        return eng

    def test_one_logprob_per_token_finite_nonpositive(self, mp):
        import math

        model, params = mp
        eng = self._engine(model, params)
        rid = eng.submit([3, 14, 15], 5)
        out = eng.run()[rid]
        lp = eng.logprobs[rid]
        assert len(lp) == len(out)
        assert all(x <= 0 and math.isfinite(x) for x in lp)

    def test_first_token_logprob_matches_oracle(self, mp):
        model, params = mp
        eng = self._engine(model, params)
        prompt = [3, 14, 15]
        rid = eng.submit(prompt, 1)
        tok = eng.run()[rid][0]
        lg = model.forward(
            params, jnp.asarray(prompt, jnp.int32)[None], interpret=True
        )[0, -1]
        expect = float(jax.nn.log_softmax(lg)[tok])
        assert abs(eng.logprobs[rid][0] - expect) < 2e-4

    def test_speculative_logprobs_match_baseline(self, mp):
        model, params = mp
        prompt = [5, 6, 7, 5, 6, 7, 5, 6, 7, 5, 6]
        spec = self._engine(model, params, spec_k=8)
        rs = spec.submit(prompt, 20)
        out_s = spec.run()[rs]
        base = self._engine(model, params, spec_k=0)
        rb = base.submit(prompt, 20)
        out_b = base.run()[rb]
        assert out_s == out_b
        assert all(
            abs(a - b) < 2e-3
            for a, b in zip(spec.logprobs[rs], base.logprobs[rb])
        )
