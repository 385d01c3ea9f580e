"""Prefix caching tests: page sharing, retention across request lifetimes,
LRU eviction under pressure, correctness vs oracle, refcounted allocator."""

import jax
import jax.numpy as jnp
import pytest

from tpu_flash.core.config import CacheConfig, EngineConfig
from tpu_flash.engine.allocator import PageAllocator
from tpu_flash.engine.prefix import PrefixIndex
from tpu_flash.engine.runner import InferenceEngine
from tpu_flash.models import TINY_TEST, FlashTransformer


@pytest.fixture(scope="module")
def model_and_params():
    model = FlashTransformer(TINY_TEST)
    return model, model.init(jax.random.PRNGKey(0))


def _oracle(model, params, prompt, n):
    toks = list(prompt)
    out = []
    for _ in range(n):
        lg = model.forward(
            params, jnp.asarray(toks, jnp.int32)[None], interpret=True
        )
        t = int(jnp.argmax(lg[0, -1]))
        out.append(t)
        toks.append(t)
    return out


def _engine(model, params, *, num_pages=64, prefix_cache=True,
            max_batch=2):
    cfg = EngineConfig(
        max_batch_size=max_batch,
        max_seq_len=256,
        prefill_chunk=16,
        cache=CacheConfig(
            page_size=8, num_pages=num_pages, max_pages_per_seq=8,
            kv_dtype="float32",
        ),
        prefix_cache=prefix_cache,
    )
    return InferenceEngine(model, params, cfg, interpret=True)


class TestAllocatorRefcounts:
    @pytest.mark.parametrize("prefer_native", [True, False])
    def test_share_retain_release(self, prefer_native):
        a = PageAllocator(8, prefer_native=prefer_native)
        got = a.alloc(1, 2)
        assert a.refcount(got[0]) == 1
        assert a.share(2, got)  # seq 2 shares both pages
        assert a.refcount(got[0]) == 2
        assert a.retain(got)  # index retention
        assert a.refcount(got[0]) == 3
        assert a.release(1) == 2  # seq 1 gone; pages still live
        assert a.num_free == 6
        assert a.release(2) == 2
        assert a.num_free == 6  # retention still holds them
        assert a.release_pages(got) == 2  # now freed
        assert a.num_free == 8

    @pytest.mark.parametrize("prefer_native", [True, False])
    def test_share_dead_page_fails(self, prefer_native):
        a = PageAllocator(8, prefer_native=prefer_native)
        assert not a.share(1, [3])  # refcount 0
        assert not a.retain([99])  # out of range


class TestPrefixIndex:
    def test_match_register_roundtrip(self):
        a = PageAllocator(16, prefer_native=False)
        idx = PrefixIndex(a, page_size=4)
        prompt = list(range(11))  # 2 full pages + 3 tail tokens
        pages = a.alloc(0, 3)
        assert idx.register(prompt, pages) == 2  # only full pages indexed
        hit, matched = idx.match(prompt)
        assert matched == 8 and hit == pages[:2]
        # Different second page → only the first page matches.
        other = prompt[:4] + [99, 98, 97, 96, 1, 2]
        hit2, matched2 = idx.match(other)
        assert matched2 == 4 and hit2 == pages[:1]

    def test_never_matches_entire_prompt(self):
        a = PageAllocator(16, prefer_native=False)
        idx = PrefixIndex(a, page_size=4)
        prompt = list(range(8))  # exactly 2 pages
        pages = a.alloc(0, 2)
        idx.register(prompt, pages)
        _, matched = idx.match(prompt)
        assert matched == 4  # one token must remain for prefill

    def test_eviction_frees_retained_pages(self):
        a = PageAllocator(16, prefer_native=False)
        idx = PrefixIndex(a, page_size=4)
        pages = a.alloc(0, 2)
        idx.register(list(range(8)), pages)
        a.release(0)
        assert a.num_free == 14  # retained by the index
        assert idx.evict(2) == 2
        assert a.num_free == 16

    def test_eviction_takes_whole_chain(self):
        """Evicting page i must also drop pages i+1.. of the same chain:
        they can never match once an ancestor is gone, so keeping them
        would leak retained pages until their own LRU turn."""
        a = PageAllocator(16, prefer_native=False)
        idx = PrefixIndex(a, page_size=4)
        pages = a.alloc(0, 3)
        idx.register(list(range(12)), pages)
        a.release(0)
        assert a.num_free == 13
        # Ask for ONE page; the LRU root is page 0, so the whole chain goes.
        assert idx.evict(1) == 3
        assert a.num_free == 16
        assert idx.num_indexed_pages == 0

    def test_eviction_branching_chains(self):
        """Two prompts share page 0 then diverge; evicting the shared root
        drops both branches. Re-registering afterwards works cleanly."""
        a = PageAllocator(16, prefer_native=False)
        idx = PrefixIndex(a, page_size=4)
        p1 = list(range(8))
        p2 = list(range(4)) + [90, 91, 92, 93]
        pg1 = a.alloc(0, 2)
        pg2 = [pg1[0]] + a.alloc(1, 1)
        idx.register(p1, pg1)
        idx.register(p2, pg2)
        assert idx.num_indexed_pages == 3
        a.release(0)
        a.release(1)
        # LRU order is [p1-page1, shared-page0, p2-page1]: the first
        # eviction takes the mid-chain leaf alone; the second takes the
        # shared root plus its surviving branch (and must tolerate the
        # already-evicted child reference).
        assert idx.evict(2) == 3
        assert a.num_free == 16
        # Clean re-registration after eviction (no stale topology).
        pg3 = a.alloc(2, 2)
        idx.register(p1, pg3)
        hit, matched = idx.match(p1 + [5])
        assert matched == 8 and hit == pg3
        a.release(2)
        assert idx.evict(2) == 2
        assert a.num_free == 16

    def test_eviction_mid_chain_keeps_prefix(self):
        """If the LRU victim is a mid-chain page, the chain's untouched
        prefix (more recently used) survives and still matches."""
        a = PageAllocator(16, prefer_native=False)
        idx = PrefixIndex(a, page_size=4)
        pages = a.alloc(0, 3)
        prompt = list(range(12))
        idx.register(prompt, pages)
        # Touch page 0 (match a 1-page-prefix prompt) so page 1 becomes LRU.
        idx.match(prompt[:4] + [77, 78])
        a.release(0)
        assert idx.evict(1) == 2  # pages 1 and 2 go together
        hit, matched = idx.match(prompt)
        assert matched == 4 and hit == pages[:1]
        assert idx.evict(1) == 1
        assert a.num_free == 16


class TestEnginePrefixCache:
    def test_shared_prefix_overlapping_lifetimes(self, model_and_params):
        """Second request arrives while the first is still decoding: its
        prefix pages are shared LIVE (refcount > 1), both decode correctly.
        (Two requests admitted in the very same step can't share — pages
        index only after they're fully written; retention covers the
        common arrive-later pattern.)"""
        model, params = model_and_params
        eng = _engine(model, params)
        common = [7] * 20  # 2.5 pages of shared prefix
        p1 = common + [1, 2, 3]
        p2 = common + [4, 5]
        r1 = eng.submit(p1, max_new_tokens=6)
        # Drive until r1's prefill registered its prompt pages.
        while eng.prefix_index.num_indexed_pages == 0:
            eng.step()
        r2 = eng.submit(p2, max_new_tokens=3)
        out = eng.run()
        assert out[r1] == _oracle(model, params, p1, 6)
        assert out[r2] == _oracle(model, params, p2, 3)
        stats = eng.prefix_stats()
        assert stats["hits_tokens"] >= 16  # two full pages reused

    def test_same_step_burst_shares_via_deferral(self, model_and_params):
        """A burst of same-prefix requests submitted TOGETHER: the second
        admission defers one step (scheduler._pending_prefix_tokens) until
        the first prefill has indexed the shared pages, then admits with a
        cache hit — the shared prefix prefills once, not once per
        request."""
        model, params = model_and_params
        eng = _engine(model, params)
        common = [7] * 32  # 4 pages / 2 prefill chunks of shared prefix
        p1 = common + [1, 2, 3]
        p2 = common + [4, 5]
        r1 = eng.submit(p1, max_new_tokens=4)
        r2 = eng.submit(p2, max_new_tokens=4)  # same step, no index yet
        out = eng.run()
        assert out[r1] == _oracle(model, params, p1, 4)
        assert out[r2] == _oracle(model, params, p2, 4)
        stats = eng.prefix_stats()
        assert stats["hits_tokens"] >= 32, stats
        # The shared pages were prefilled once: r2 skipped them entirely.
        assert eng.metrics.prefill_tokens <= len(p1) + len(p2) - 32

    def test_deferral_no_deadlock_on_divergent_prompts(
        self, model_and_params
    ):
        """A waiting request that shares NO indexed-able prefix must admit
        immediately; one sharing a prefix must eventually admit even if
        the live prefill finishes first."""
        model, params = model_and_params
        eng = _engine(model, params)
        r1 = eng.submit([7] * 32 + [1], max_new_tokens=2)
        r2 = eng.submit([9, 8, 7, 6], max_new_tokens=2)  # divergent
        out = eng.run()
        assert len(out[r1]) == 2 and len(out[r2]) == 2

    def test_sequential_retention(self, model_and_params):
        """Second request arrives after the first finished — retention keeps
        the prefix pages alive for reuse."""
        model, params = model_and_params
        eng = _engine(model, params)
        common = [3] * 24
        r1 = eng.submit(common + [1], max_new_tokens=2)
        eng.run()
        assert eng.prefix_index.num_indexed_pages == 3
        r2 = eng.submit(common + [9, 9], max_new_tokens=2)
        out = eng.run()
        assert out[r2] == _oracle(model, params, common + [9, 9], 2)
        assert eng.prefix_stats()["hits_tokens"] >= 16  # 24 rounded to prefill_chunk grid

    def test_results_match_disabled_cache(self, model_and_params):
        model, params = model_and_params
        common = [5] * 16
        prompts = [common + [1, 2], common + [3], [8, 8, 8]]
        outs = []
        for enabled in (True, False):
            eng = _engine(model, params, prefix_cache=enabled)
            rids = [eng.submit(p, max_new_tokens=3) for p in prompts]
            res = eng.run()
            outs.append([res[r] for r in rids])
        assert outs[0] == outs[1]

    def test_eviction_under_pressure(self, model_and_params):
        """A tiny pool: cached prefixes must be evicted to admit new work."""
        model, params = model_and_params
        eng = _engine(model, params, num_pages=14)  # 13 usable
        # Fill the cache with one prompt (needs ceil(27/8)=4 pages).
        r1 = eng.submit([1] * 25, max_new_tokens=2)
        eng.run()
        assert eng.prefix_index.num_indexed_pages > 0
        # A different large prompt must evict the retained pages to fit.
        p2 = [2] * 40  # needs ceil(42/8) = 6 pages
        r2 = eng.submit(p2, max_new_tokens=2)
        out = eng.run()
        assert out[r2] == _oracle(model, params, p2, 2)

    def test_quantized_cache_prefix_reuse(self, model_and_params):
        model, params = model_and_params
        cfg = EngineConfig(
            max_batch_size=2, max_seq_len=256, prefill_chunk=16,
            cache=CacheConfig(
                page_size=8, num_pages=64, max_pages_per_seq=8,
                kv_dtype="int8",
            ),
        )
        eng = InferenceEngine(model, params, cfg, interpret=True)
        common = [11] * 16
        r1 = eng.submit(common + [1], max_new_tokens=2)
        eng.run()
        r2 = eng.submit(common + [2, 3], max_new_tokens=2)
        out = eng.run()
        # Same int8 pages reused; oracle comparison within quant tolerance:
        # greedy can diverge on near-ties, so check hit accounting + shape.
        assert eng.prefix_stats()["hits_tokens"] >= 16
        assert len(out[r2]) == 2

    def test_midprefill_registration_shares_early(self, model_and_params):
        """A request arriving while a long prompt is STILL PREFILLING
        shares the chunks already written (incremental registration)."""
        model, params = model_and_params
        eng = _engine(model, params)  # prefill_chunk=16, page_size=8
        common = [4] * 32
        r1 = eng.submit(common + [1] * 16, max_new_tokens=2)
        eng.step()  # chunk 1 of 3 written (16 tokens = 2 pages indexed)
        assert eng.prefix_index.num_indexed_pages == 2
        req1 = eng.scheduler.active[r1]
        assert req1.prefilled < req1.prompt_len  # r1 genuinely mid-prefill
        r2 = eng.submit(common + [9], max_new_tokens=2)
        out = eng.run()
        assert out[r2] == _oracle(model, params, common + [9], 2)
        assert eng.prefix_stats()["hits_tokens"] >= 16
