"""Optimistic admission + preemption (EngineConfig.admission="optimistic"):
prompt-only pages at admission, per-step decode-capacity top-up, and
newest-first preemption when the pool overcommits — victims either
re-prefill prompt+generated ("recompute") or round-trip their KV through
host memory ("swap"). Greedy outputs must be EXACTLY what a roomy
reserve-mode engine produces: any KV corruption, token re-sampling, or
lost page shows as divergence."""

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


def _engine(model, params, *, admission="reserve", preemption="recompute",
            num_pages=64, page_size=4, max_batch=3, prefill_chunk=8,
            prefix_cache=False, seed=0):
    cfg = EngineConfig(
        max_batch_size=max_batch,
        max_seq_len=256,
        prefill_chunk=prefill_chunk,
        cache=CacheConfig(
            page_size=page_size, num_pages=num_pages,
            max_pages_per_seq=16, kv_dtype="float32",
        ),
        prefix_cache=prefix_cache,
        admission=admission,
        preemption=preemption,
    )
    return InferenceEngine(model, params, cfg, interpret=True, seed=seed)


PROMPTS = [
    [3, 1, 4, 1, 5, 9, 2, 6],
    [2, 7, 1, 8, 2, 8, 1, 8],
    [1, 6, 1, 8, 0, 3, 3, 9],
]
BUDGET = 12


def _reference_outputs(model, params):
    eng = _engine(model, params, num_pages=64)
    rids = [eng.submit(p, BUDGET) for p in PROMPTS]
    eng.run()
    return [eng.outputs[r] for r in rids]


@pytest.fixture(scope="module")
def expected(mp):
    return _reference_outputs(*mp)


class TestOptimisticAdmission:
    def test_no_pressure_matches_reserve(self, mp, expected):
        """With ample pages, optimistic mode never preempts and produces
        identical streams."""
        model, params = mp
        eng = _engine(model, params, admission="optimistic", num_pages=64)
        rids = [eng.submit(p, BUDGET) for p in PROMPTS]
        eng.run()
        assert [eng.outputs[r] for r in rids] == expected
        assert eng.scheduler.num_preemptions == 0

    @pytest.mark.parametrize("preemption", ["recompute", "swap"])
    def test_preemption_under_pressure_is_exact(self, mp, expected,
                                                preemption):
        """A pool too small for all three full contexts forces
        preemption; every greedy stream still matches the roomy
        reserve-mode reference token for token."""
        model, params = mp
        # Each request needs ceil((8+12)/4)=5 pages at full context;
        # 9 usable pages cannot hold three (nor their step headroom),
        # so the newest sequences get preempted and later resume.
        eng = _engine(model, params, admission="optimistic",
                      preemption=preemption, num_pages=10)
        rids = [eng.submit(p, BUDGET) for p in PROMPTS]
        eng.run()
        assert [eng.outputs[r] for r in rids] == expected
        assert eng.scheduler.num_preemptions > 0

    def test_staggered_submits_mid_prefill_victims(self, mp):
        """Later arrivals while earlier requests are mid-flight; tiny
        pool + small prefill chunks make PREFILL-stage preemption
        possible. Exactness vs the reserve reference still holds."""
        model, params = mp
        long_prompt = (PROMPTS[0] * 3)[:20]

        ref = _engine(model, params, num_pages=64, prefill_chunk=4)
        a = ref.submit(long_prompt, 8)
        ref.step()
        b = ref.submit(PROMPTS[1], 10)
        c = ref.submit(PROMPTS[2], 6)
        ref.run()

        eng = _engine(model, params, admission="optimistic",
                      num_pages=10, prefill_chunk=4)
        a2 = eng.submit(long_prompt, 8)
        eng.step()
        b2 = eng.submit(PROMPTS[1], 10)
        c2 = eng.submit(PROMPTS[2], 6)
        eng.run()
        assert eng.outputs[a2] == ref.outputs[a]
        assert eng.outputs[b2] == ref.outputs[b]
        assert eng.outputs[c2] == ref.outputs[c]

    def test_sampled_requests_complete_under_pressure(self, mp):
        """Non-greedy requests under heavy preemption: full budgets are
        delivered, logprobs stay valid (the RNG stream differs from an
        unpreempted run, so only structure is asserted)."""
        model, params = mp
        eng = _engine(model, params, admission="optimistic", num_pages=10)
        sp = SamplingParams(temperature=1.0)
        rids = [eng.submit(p, BUDGET, sampling=sp) for p in PROMPTS]
        eng.run()
        for r in rids:
            assert len(eng.outputs[r]) == BUDGET
            assert len(eng.logprobs[r]) == BUDGET
            assert all(lp <= 0.0 for lp in eng.logprobs[r])

    def test_pages_drain_after_completion(self, mp):
        model, params = mp
        eng = _engine(model, params, admission="optimistic",
                      preemption="swap", num_pages=10)
        free0 = eng.scheduler.allocator.num_free
        for p in PROMPTS:
            eng.submit(p, BUDGET)
        eng.run()
        assert eng.scheduler.allocator.num_free == free0
        assert not eng._swapped  # every stash restored and consumed

    def test_parallel_sampling_group_under_pressure(self, mp):
        """Fork groups + optimistic admission: greedy branches stay exact
        under preemption (FORK_WAIT victims re-admit as independent
        requests and re-prefill)."""
        model, params = mp
        ref = _engine(model, params, num_pages=64)
        solo = ref.submit(PROMPTS[0], 8)
        other = ref.submit(PROMPTS[1], 8)
        ref.run()

        eng = _engine(model, params, admission="optimistic", num_pages=10)
        g = eng.submit(PROMPTS[0], 8, n=2)
        o = eng.submit(PROMPTS[1], 8)
        eng.run()
        for bid in eng.branches(g):
            assert eng.outputs[bid] == ref.outputs[solo]
        assert eng.outputs[o] == ref.outputs[other]

    def test_prefork_group_preemption_detaches_branches(self, mp):
        """Preempting FORK_WAIT branches (and then their still-prefilling
        parent) must detach them from the pending group — a re-admitted
        parent re-forking already-independent branches would double-admit
        them. The tiny pool plus an older running request forces exactly
        that sequence; greedy outputs stay exact."""
        model, params = mp
        long_prompt = (PROMPTS[2] * 3)[:20]

        ref = _engine(model, params, num_pages=64, prefill_chunk=4,
                      max_batch=4)
        a = ref.submit(PROMPTS[0], 14)
        ref.step()
        g = ref.submit(long_prompt, 6, n=2)
        ref.run()

        eng = _engine(model, params, admission="optimistic",
                      num_pages=12, prefill_chunk=4, max_batch=4)
        a2 = eng.submit(PROMPTS[0], 14)
        eng.step()
        g2 = eng.submit(long_prompt, 6, n=2)
        eng.run()
        assert eng.outputs[a2] == ref.outputs[a]
        for rbid, ebid in zip(ref.branches(g), eng.branches(g2)):
            assert eng.outputs[ebid] == ref.outputs[rbid]

    def test_submit_rejects_impossible_request(self, mp):
        model, params = mp
        eng = _engine(model, params, admission="optimistic", num_pages=6)
        with pytest.raises(ValueError, match="pages"):
            eng.submit(PROMPTS[0], 40)


class TestPriorities:
    def test_high_priority_admits_first(self, mp):
        model, params = mp
        eng = _engine(model, params, max_batch=1)
        lo = eng.submit(PROMPTS[0], 4, priority=0)
        hi = eng.submit(PROMPTS[1], 4, priority=5)
        eng.step()
        assert hi in eng.scheduler.active
        assert lo not in eng.scheduler.active
        eng.run()
        assert len(eng.outputs[lo]) == 4 and len(eng.outputs[hi]) == 4

    def test_preemption_never_evicts_higher_priority(self, mp):
        """Under pool pressure the low-priority sequence is always the
        victim; the high-priority one never preempts (its pages are safe)
        and both finish with exact greedy streams."""
        model, params = mp
        ref = _engine(model, params, num_pages=64)
        a = ref.submit(PROMPTS[0], BUDGET)
        b = ref.submit(PROMPTS[1], BUDGET)
        ref.run()

        eng = _engine(model, params, admission="optimistic", num_pages=8)
        seen = []
        orig = eng.scheduler._preempt
        eng.scheduler._preempt = lambda v: (seen.append(v.req_id),
                                            orig(v))[1]
        hi = eng.submit(PROMPTS[0], BUDGET, priority=3)
        lo = eng.submit(PROMPTS[1], BUDGET, priority=0)
        eng.run()
        assert eng.outputs[hi] == ref.outputs[a]
        assert eng.outputs[lo] == ref.outputs[b]
        assert seen, "pool was large enough that nothing preempted"
        assert hi not in seen


class TestSwapSnapshot:
    def test_snapshot_with_swapped_victim_resumes(self, mp, expected,
                                                  tmp_path):
        """Drive until a swap preemption happened, snapshot (stash is
        host-side data and must serialize), restore into a fresh engine,
        finish: streams match the reference."""
        from tpu_flash.checkpoint.store import (
            restore_engine,
            snapshot_engine,
        )

        model, params = mp
        eng = _engine(model, params, admission="optimistic",
                      preemption="swap", num_pages=10)
        rids = [eng.submit(p, BUDGET) for p in PROMPTS]
        for _ in range(40):
            if eng._swapped:
                break
            eng.step()
        assert eng._swapped, "workload never swapped; shrink the pool"
        snapshot_engine(tmp_path / "snap", eng)

        fresh = _engine(model, params, admission="optimistic",
                        preemption="swap", num_pages=10)
        restore_engine(tmp_path / "snap", fresh)
        fresh.run()
        assert [fresh.outputs[r] for r in rids] == expected
