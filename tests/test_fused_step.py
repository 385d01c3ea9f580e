"""Fused mixed steps (config.fused_mixed_step): decode slots ride the
ragged prefill dispatch as length-1 rows — one program call per engine
step when both phases are active. KV append + attention semantics must
be IDENTICAL to the separate decode step: greedy streams compare
token-exact between fused and unfused engines across staggered
workloads, stop tokens, windows, and quantized caches."""

import dataclasses

import jax
import pytest

from tpu_flash.core.config import CacheConfig, EngineConfig
from tpu_flash.engine.runner import InferenceEngine
from tpu_flash.engine.sampling import SamplingParams
from tpu_flash.models import TINY_TEST, FlashTransformer


@pytest.fixture(scope="module")
def mp():
    model = FlashTransformer(TINY_TEST)
    return model, model.init(jax.random.PRNGKey(0))


def _engine(model, params, fused, *, kv_dtype="float32", seed=0,
            prefill_chunk=8, window=None):
    cfg = EngineConfig(
        max_batch_size=4,
        max_seq_len=256,
        prefill_chunk=prefill_chunk,
        cache=CacheConfig(
            page_size=8, num_pages=64, max_pages_per_seq=16,
            kv_dtype=kv_dtype,
        ),
        prefix_cache=False,
        fused_mixed_step=fused,
    )
    m = model
    if window is not None:
        m = FlashTransformer(
            dataclasses.replace(model.config, sliding_window=window)
        )
    return InferenceEngine(m, params, cfg, interpret=True, seed=seed)


def _staggered(eng):
    """A decodes while B (long prompt) prefills chunk by chunk: several
    steps have both phases live."""
    a = eng.submit([3, 1, 4, 1, 5], 10)
    eng.step()  # A prefills
    eng.step()  # A decodes alone
    b = eng.submit([2, 7, 1, 8, 2, 8] * 4, 6)  # 24 tokens: 3 chunks
    c = eng.submit([9, 8, 7], 8)
    eng.run()
    return a, b, c


class TestFusedMixedStep:
    @pytest.mark.parametrize("kv_dtype", ["float32", "int8"])
    def test_greedy_exact_vs_unfused(self, mp, kv_dtype):
        model, params = mp
        ref = _engine(model, params, False, kv_dtype=kv_dtype)
        ra, rb, rc = _staggered(ref)
        eng = _engine(model, params, True, kv_dtype=kv_dtype)
        fa, fb, fc = _staggered(eng)
        assert eng.outputs[fa] == ref.outputs[ra]
        assert eng.outputs[fb] == ref.outputs[rb]
        assert eng.outputs[fc] == ref.outputs[rc]
        # Logits come from different programs (ragged/paged sweep vs the
        # decode kernel), so logprobs agree to numerics, not bit-exactly;
        # the int8 cache's in-kernel dequant ordering widens that slightly.
        tol = 1e-4 if kv_dtype == "float32" else 5e-3
        assert eng.logprobs[fa] == pytest.approx(ref.logprobs[ra], abs=tol)

    def test_windowed_model_fused(self, mp):
        model, params = mp
        wparams = FlashTransformer(
            dataclasses.replace(model.config, sliding_window=12)
        ).init(jax.random.PRNGKey(2))
        ref = _engine(model, wparams, False, window=12)
        ra, rb, rc = _staggered(ref)
        eng = _engine(model, wparams, True, window=12)
        fa, fb, fc = _staggered(eng)
        for r, f in ((ra, fa), (rb, fb), (rc, fc)):
            assert eng.outputs[f] == ref.outputs[r]

    def test_stop_token_in_fused_row(self, mp):
        """A stop token sampled on a fused decode row ends that stream at
        the same place as the unfused engine."""
        model, params = mp
        ref = _engine(model, params, False)
        a = ref.submit([3, 1, 4, 1, 5], 10)
        ref.run()
        if len(ref.outputs[a]) < 4:
            pytest.skip("stream too short to place a stop token")
        stop = ref.outputs[a][3]

        def run(fused):
            eng = _engine(model, params, fused)
            x = eng.submit([3, 1, 4, 1, 5], 10, stop_tokens=[stop])
            eng.step(), eng.step()
            eng.submit([2, 7, 1, 8, 2, 8] * 4, 4)  # overlap prefill
            eng.run()
            return eng.outputs[x]

        assert run(True) == run(False)

    def test_sampled_fused_is_seed_deterministic(self, mp):
        model, params = mp
        sp = SamplingParams(temperature=0.9, top_k=30)

        def run():
            eng = _engine(model, params, True, seed=7)
            a = eng.submit([3, 1, 4, 1, 5], 8, sampling=sp)
            eng.step(), eng.step()
            b = eng.submit([2, 7, 1, 8, 2, 8] * 4, 6, sampling=sp)
            eng.run()
            return eng.outputs[a], eng.outputs[b]

        assert run() == run()

    def test_auto_fuses_only_when_cheap(self, mp):
        """"auto" fuses while decode rows <= prefill rows; the engine
        still completes correctly either way (behavioral check via
        greedy equality with the unfused engine)."""
        model, params = mp
        ref = _engine(model, params, False)
        ra, rb, rc = _staggered(ref)
        eng = _engine(model, params, "auto")
        fa, fb, fc = _staggered(eng)
        for r, f in ((ra, fa), (rb, fb), (rc, fc)):
            assert eng.outputs[f] == ref.outputs[r]
