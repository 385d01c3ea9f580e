"""Parallel sampling (``submit(n=...)``): one prefill forks into n decode
branches sharing the prompt's KV pages. Greedy branches must match an
independent request EXACTLY (any fork-time page-copy or slot-state bug
shows as divergence); allocator refcounts must account every shared page
and return to empty after retirement; groups admit atomically."""

import jax
import jax.numpy as jnp
import pytest

from tpu_flash.core.config import CacheConfig, EngineConfig
from tpu_flash.engine.runner import InferenceEngine
from tpu_flash.engine.sampling import SamplingParams
from tpu_flash.models import TINY_TEST, FlashTransformer


@pytest.fixture(scope="module")
def mp():
    model = FlashTransformer(TINY_TEST)
    return model, model.init(jax.random.PRNGKey(0))


def _engine(model, params, *, max_batch=4, num_pages=64, page_size=8,
            prefill_chunk=16, prefix_cache=False, seed=0):
    cfg = EngineConfig(
        max_batch_size=max_batch,
        max_seq_len=256,
        prefill_chunk=prefill_chunk,
        cache=CacheConfig(
            page_size=page_size, num_pages=num_pages,
            max_pages_per_seq=16, kv_dtype="float32",
        ),
        prefix_cache=prefix_cache,
    )
    return InferenceEngine(model, params, cfg, interpret=True, seed=seed)


PROMPT = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]  # 11 tokens: partial tail page


class TestGreedyEquivalence:
    @pytest.mark.parametrize("prompt_len", [11, 16])
    def test_branches_match_independent_request(self, mp, prompt_len):
        """Greedy is deterministic: every branch must reproduce exactly
        what a standalone request generates. prompt_len=11 exercises the
        fork-time partial-page copy (11 % 8 != 0); 16 the no-copy path."""
        model, params = mp
        prompt = (PROMPT * 2)[:prompt_len]

        solo = _engine(model, params)
        rid = solo.submit(prompt, 6)
        solo.run()
        expect = solo.outputs[rid]
        assert len(expect) == 6

        eng = _engine(model, params)
        rid = eng.submit(prompt, 6, n=3)
        ids = eng.branches(rid)
        assert len(ids) == 3 and ids[0] == rid
        eng.run()
        for bid in ids:
            assert eng.outputs[bid] == expect, f"branch {bid} diverged"
            assert len(eng.logprobs[bid]) == 6

    def test_branches_and_neighbors_coexist(self, mp):
        """A fork group and an unrelated request decode in the same batch
        without cross-talk."""
        model, params = mp
        other_prompt = [7, 7, 2, 9, 1]

        solo = _engine(model, params)
        r1 = solo.submit(PROMPT, 5)
        r2 = solo.submit(other_prompt, 5)
        solo.run()

        eng = _engine(model, params)
        g = eng.submit(PROMPT, 5, n=2)
        o = eng.submit(other_prompt, 5)
        eng.run()
        for bid in eng.branches(g):
            assert eng.outputs[bid] == solo.outputs[r1]
        assert eng.outputs[o] == solo.outputs[r2]


class TestSampledBranches:
    def test_branches_are_independent_samples(self, mp):
        model, params = mp
        eng = _engine(model, params, max_batch=4)
        sp = SamplingParams(temperature=1.0)
        rid = eng.submit(PROMPT, 8, sampling=sp, n=4)
        eng.run()
        outs = [tuple(eng.outputs[b]) for b in eng.branches(rid)]
        assert all(len(o) == 8 for o in outs)
        # 4 independent draws of 8 tokens at T=1: collisions across all
        # four branches would mean the RNG is shared, not split.
        assert len(set(outs)) >= 2
        for b in eng.branches(rid):
            assert all(lp <= 0.0 for lp in eng.logprobs[b])

    def test_seed_determinism(self, mp):
        model, params = mp
        sp = SamplingParams(temperature=0.8, top_k=20)

        def run_once():
            eng = _engine(model, params, seed=123)
            rid = eng.submit(PROMPT, 6, sampling=sp, n=3)
            eng.run()
            return [eng.outputs[b] for b in eng.branches(rid)]

        assert run_once() == run_once()


class TestPagesAndAdmission:
    def test_prompt_pages_shared_refcounted(self, mp):
        """During decode the prompt's FULL pages are shared n ways; the
        partial tail page is copied (refcount 1 per branch); all pages
        free after the group retires."""
        model, params = mp
        eng = _engine(model, params)
        alloc = eng.scheduler.allocator
        free0 = alloc.num_free
        rid = eng.submit(PROMPT, 6, n=3)  # 11 tokens, ps=8 -> 1 full page
        eng.step()  # prefill (chunk 16 covers the prompt) + fork
        parent = eng.scheduler.active[rid]
        ptable = eng.scheduler.page_table(rid)
        assert parent.child_ids and len(ptable) >= 2
        assert alloc.refcount(ptable[0]) == 3  # full page shared 3 ways
        assert alloc.refcount(ptable[1]) == 1  # partial page: parent's own
        for cid in parent.child_ids:
            ct = eng.scheduler.page_table(cid)
            assert ct[0] == ptable[0]  # shared full page
            assert ct[1] != ptable[1]  # own copy of the tail page
            assert alloc.refcount(ct[1]) == 1
        eng.run()
        assert alloc.num_free == free0  # everything released

    def test_group_waits_for_slots_then_completes(self, mp):
        """A group larger than the currently-free slots admits later,
        atomically, and still matches the independent-run outputs."""
        model, params = mp
        solo = _engine(model, params)
        a = solo.submit([9, 8, 7], 4)
        b = solo.submit(PROMPT, 4)
        solo.run()

        eng = _engine(model, params, max_batch=2)
        x = eng.submit([9, 8, 7], 4)
        g = eng.submit(PROMPT, 4, n=2)  # needs 2 slots; only 1 free
        eng.run()
        assert eng.outputs[x] == solo.outputs[a]
        for bid in eng.branches(g):
            assert eng.outputs[bid] == solo.outputs[b]

    def test_validation(self, mp):
        model, params = mp
        eng = _engine(model, params, max_batch=2)
        with pytest.raises(ValueError, match="max_batch_size"):
            eng.submit(PROMPT, 4, n=3)
        with pytest.raises(ValueError, match="n must be"):
            eng.submit(PROMPT, 4, n=0)
        small = _engine(model, params, max_batch=4, num_pages=8)
        with pytest.raises(ValueError, match="pages"):
            small.submit(PROMPT, 40, n=4)

    def test_stop_token_stops_each_branch(self, mp):
        """Branches stop independently on stop tokens; greedy branches
        stop at the same place as a standalone run."""
        model, params = mp
        solo = _engine(model, params)
        rid = solo.submit(PROMPT, 8)
        solo.run()
        stop = solo.outputs[rid][2]  # third generated token

        eng = _engine(model, params)
        g = eng.submit(PROMPT, 8, stop_tokens=[stop], n=2)
        eng.run()
        for bid in eng.branches(g):
            assert eng.outputs[bid] == solo.outputs[rid][:3]


class TestSnapshotRoundTrip:
    def test_mid_prefill_fork_group_resumes(self, mp, tmp_path):
        """Snapshot with the parent mid-prefill (children FORK_WAIT),
        restore into a fresh engine, finish: outputs match an
        uninterrupted run."""
        from tpu_flash.checkpoint.store import (
            restore_engine,
            snapshot_engine,
        )

        model, params = mp
        prompt = (PROMPT * 3)[:24]  # prefill_chunk=8 -> 3 prefill steps

        solo = _engine(model, params, prefill_chunk=8)
        rid = solo.submit(prompt, 5, n=2)
        solo.run()

        eng = _engine(model, params, prefill_chunk=8)
        rid2 = eng.submit(prompt, 5, n=2)
        eng.step()  # one prefill chunk; children still FORK_WAIT
        snapshot_engine(tmp_path / "snap", eng)

        fresh = _engine(model, params, prefill_chunk=8)
        restore_engine(tmp_path / "snap", fresh)
        fresh.run()
        assert eng.branches(rid2) == fresh.branches(rid2)
        for bid in fresh.branches(rid2):
            assert fresh.outputs[bid] == solo.outputs[
                solo.branches(rid)[fresh.branches(rid2).index(bid)]
            ]

    def test_waiting_group_survives_snapshot(self, mp, tmp_path):
        from tpu_flash.checkpoint.store import (
            restore_engine,
            snapshot_engine,
        )

        model, params = mp
        solo = _engine(model, params)
        rid = solo.submit(PROMPT, 4, n=2)
        solo.run()

        eng = _engine(model, params)
        rid2 = eng.submit(PROMPT, 4, n=2)  # never stepped: still WAITING
        snapshot_engine(tmp_path / "snap2", eng)
        fresh = _engine(model, params)
        restore_engine(tmp_path / "snap2", fresh)
        fresh.run()
        for i, bid in enumerate(fresh.branches(rid2)):
            assert fresh.outputs[bid] == solo.outputs[solo.branches(rid)[i]]
