"""Engine-layer tests: native page allocator, paged cache appends,
continuous-batching scheduler invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.core.config import CacheConfig, EngineConfig
from tpu_flash.engine.allocator import PageAllocator, _PythonAllocator
from tpu_flash.engine.cache import PagedKVCache, positions_to_page_slots
from tpu_flash.engine.scheduler import Request, RequestState, Scheduler
from tpu_flash.ops.quant import QuantizedTensor, dequantize


class TestPageAllocator:
    @pytest.mark.parametrize("native", [True, False])
    def test_alloc_release_cycle(self, native):
        pa = PageAllocator(16, prefer_native=native)
        a = pa.alloc(1, 4)
        b = pa.alloc(2, 8)
        assert len(a) == 4 and len(b) == 8
        assert len(set(a) | set(b)) == 12  # distinct pages
        assert pa.num_free == 4
        assert pa.alloc(3, 5) is None  # all-or-nothing
        assert pa.num_free == 4
        assert pa.release(1) == 4
        assert pa.num_free == 8
        assert pa.pages_of(2) == b
        assert pa.pages_of(1) == []

    def test_native_matches_python_semantics(self):
        nat = PageAllocator(8, prefer_native=True)
        py = PageAllocator(8, prefer_native=False)
        for step, (seq, n) in enumerate([(1, 3), (2, 3), (3, 3), (4, 2)]):
            rn, rp = nat.alloc(seq, n), py.alloc(seq, n)
            assert (rn is None) == (rp is None), f"step {step}"
            assert nat.num_free == py.num_free
        nat.release(1), py.release(1)
        assert nat.num_free == py.num_free

    def test_native_backend_is_used(self):
        pa = PageAllocator(4, prefer_native=True)
        # The C++ build must succeed in this environment (g++ is baked in).
        assert not isinstance(pa, _PythonAllocator), (
            "expected the native C++ allocator to be available"
        )


class TestPagedCache:
    def _cfg(self, kv_dtype="bfloat16"):
        return CacheConfig(
            page_size=8, num_pages=16, max_pages_per_seq=4, kv_dtype=kv_dtype
        )

    def test_append_then_read_back(self):
        cfg = self._cfg("float32")
        cache = PagedKVCache.create(1, 2, 16, cfg)
        new_k = jax.random.normal(jax.random.PRNGKey(0), (3, 2, 16))
        new_v = jax.random.normal(jax.random.PRNGKey(1), (3, 2, 16))
        page_ids = jnp.array([5, 5, 7])
        offsets = jnp.array([0, 1, 3])
        cache = cache.append(0, new_k, new_v, page_ids, offsets)
        k, v = cache.layer_view(0)
        np.testing.assert_allclose(k[:, 5, 0], new_k[0])
        np.testing.assert_allclose(k[0, 5, 1], new_k[1, 0])
        np.testing.assert_allclose(v[1, 7, 3], new_v[2, 1])

    @pytest.mark.parametrize("kv_dtype,tol", [("int8", 0.02), ("int4", 0.2)])
    def test_quantized_append_round_trip(self, kv_dtype, tol):
        cfg = self._cfg(kv_dtype)
        cache = PagedKVCache.create(1, 1, 16, cfg)
        new_k = jax.random.normal(jax.random.PRNGKey(2), (4, 1, 16))
        new_v = jax.random.normal(jax.random.PRNGKey(3), (4, 1, 16))
        page_ids = jnp.array([2, 2, 2, 2])
        offsets = jnp.array([0, 1, 2, 3])
        cache = cache.append(0, new_k, new_v, page_ids, offsets)
        k_qt, _ = cache.layer_view(0)
        assert isinstance(k_qt, QuantizedTensor)
        back = dequantize(k_qt)[0, 2, :4]  # [4 tokens, head_dim]
        np.testing.assert_allclose(back, new_k[:, 0], atol=tol, rtol=tol)

    def test_positions_to_page_slots(self):
        table = jnp.array([9, 4, 7, 1])
        pages, offs = positions_to_page_slots(
            jnp.array([0, 7, 8, 17]), table, page_size=8
        )
        np.testing.assert_array_equal(pages, [9, 9, 4, 7])
        np.testing.assert_array_equal(offs, [0, 7, 0, 1])


class TestScheduler:
    def _engine_cfg(self, **kw):
        cache = CacheConfig(page_size=8, num_pages=32, max_pages_per_seq=8)
        defaults = dict(max_batch_size=2, max_seq_len=64, prefill_chunk=16,
                        cache=cache)
        defaults.update(kw)
        return EngineConfig(**defaults)

    def test_admission_and_prefill_chunking(self):
        sched = Scheduler(self._engine_cfg())
        sched.add_request(Request(req_id=1, prompt_len=40, max_new_tokens=4))
        plan = sched.step()
        assert len(plan.prefill) == 1
        assert plan.prefill[0].length == 16 and plan.prefill[0].start == 0
        plan = sched.step()
        assert plan.prefill[0].start == 16
        plan = sched.step()
        assert plan.prefill[0].start == 32 and plan.prefill[0].length == 8
        # Prefill complete; next step decodes.
        sched.report_decoded(1)  # token from prefill logits
        plan = sched.step()
        assert plan.decode_slots == [0] and not plan.prefill

    def test_batch_slot_limit(self):
        sched = Scheduler(self._engine_cfg(max_batch_size=2))
        for rid in (1, 2, 3):
            sched.add_request(Request(rid, prompt_len=8, max_new_tokens=2))
        plan = sched.step()
        assert len(plan.prefill) == 2  # third waits for a slot
        assert sched.num_active() == 2

    def test_page_exhaustion_blocks_admission(self):
        cfg = self._engine_cfg(max_batch_size=4)
        sched = Scheduler(cfg)
        # Each request needs ceil((30+2)/8) = 4 pages; 32 pages total.
        for rid in range(1, 10):
            sched.add_request(Request(rid, prompt_len=30, max_new_tokens=2))
        sched.step()
        assert sched.num_active() == 4  # slot-limited first
        assert sched.allocator.num_free == 32 - 16

    def test_finish_releases_resources(self):
        sched = Scheduler(self._engine_cfg())
        sched.add_request(Request(1, prompt_len=8, max_new_tokens=1))
        sched.step()  # prefill whole prompt
        sched.report_decoded(1)  # the single token generated
        plan = sched.step()
        assert plan.finished == [] or plan.finished == [1]
        plan = sched.step()
        assert sched.num_active() == 0
        assert sched.allocator.num_free == 32

    def test_rejects_oversized_request(self):
        sched = Scheduler(self._engine_cfg())
        with pytest.raises(ValueError):
            sched.add_request(Request(1, prompt_len=100, max_new_tokens=10))

    def test_throughput_under_churn(self):
        # Many small requests through a tiny engine; invariant: pages and
        # slots never leak.
        sched = Scheduler(self._engine_cfg(max_batch_size=2))
        for rid in range(20):
            sched.add_request(Request(rid, prompt_len=5, max_new_tokens=3))
        for _ in range(200):
            if not sched.has_work():
                break
            plan = sched.step()
            for c in plan.prefill:
                if sched.active[c.req_id].state is RequestState.RUNNING:
                    sched.report_decoded(c.req_id)
            for slot in plan.decode_slots:
                rid = sched.slots[slot]
                sched.report_decoded(rid)
        assert not sched.has_work()
        assert sched.allocator.num_free == 32
        assert all(s is None for s in sched.slots)
