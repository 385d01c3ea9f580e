"""Exact recent-window (KIVI-style residual tail) tests.

The quantized cache keeps the last W tokens of every slot in an exact
bf16 ring (engine/cache.py); burst decode attends pages for [0, L - W)
and the ring for [L - W, L), merged once (ops/decode/tail.py). The
reference has no decode/cache analogue (prefill-only kernels); this is
north-star serving scope. Quality effect measured in
tpu_flash/bench/quality.py (config 9): int4 stress token-match
0.10 -> 1.0 for contexts inside the window.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.core.config import CacheConfig, EngineConfig
from tpu_flash.engine.cache import PagedKVCache
from tpu_flash.models import TINY_TEST, FlashTransformer
from tpu_flash.ops.decode import paged_attention
from tpu_flash.ops.decode.tail import (
    merge_attention_states,
    recent_tail_state,
)


def _build_pages(key, b, hkv, d, ps, npages, pps, lengths, dtype):
    """Dense tokens + the paged/ring encodings of the same values."""
    kk, kv = jax.random.split(key)
    lmax = int(max(lengths))
    kt = jax.random.normal(kk, (b, hkv, lmax, d), jnp.float32).astype(dtype)
    vt = jax.random.normal(kv, (b, hkv, lmax, d), jnp.float32).astype(dtype)
    k_pages = jnp.zeros((hkv, npages, ps, d), dtype)
    v_pages = jnp.zeros((hkv, npages, ps, d), dtype)
    tables = np.zeros((b, pps), np.int32)
    pid = 1
    for bi in range(b):
        for pg in range(-(-int(lengths[bi]) // ps)):
            tables[bi, pg] = pid
            lo, hi = pg * ps, min((pg + 1) * ps, int(lengths[bi]))
            k_pages = k_pages.at[:, pid, : hi - lo].set(kt[bi, :, lo:hi])
            v_pages = v_pages.at[:, pid, : hi - lo].set(vt[bi, :, lo:hi])
            pid += 1
    return kt, vt, k_pages, v_pages, jnp.asarray(tables)


def _ring_from(kt, vt, lengths, w):
    b, hkv, _, d = kt.shape
    k_ring = jnp.zeros((b, hkv, w, d), kt.dtype)
    v_ring = jnp.zeros((b, hkv, w, d), kt.dtype)
    for bi in range(b):
        for p in range(int(lengths[bi])):
            k_ring = k_ring.at[bi, :, p % w].set(kt[bi, :, p])
            v_ring = v_ring.at[bi, :, p % w].set(vt[bi, :, p])
    return k_ring, v_ring


class TestTailMerge:
    @pytest.mark.parametrize("w,lens", [(64, [9, 40, 63]),
                                        (64, [70, 100, 128]),
                                        (32, [1, 32, 90])])
    def test_split_matches_monolithic_kernel(self, w, lens):
        """paged(clipped) + tail merged == one paged call over everything
        (bf16 pages; the tail mirrors the kernel's q/P bf16 rounding).
        Contexts fully inside the window are numerics-identical (the tail
        mirrors the kernel's rounding); genuinely split contexts round P
        against per-part maxima, so they agree at bf16-rounding scale."""
        atol = 2e-5 if max(lens) <= w else 8e-3
        b, hq, hkv, d, ps, npages, pps = 3, 4, 2, 128, 16, 32, 8
        key = jax.random.PRNGKey(3)
        lengths = jnp.asarray(lens, jnp.int32)
        kt, vt, k_pages, v_pages, tables = _build_pages(
            key, b, hkv, d, ps, npages, pps, lens, jnp.bfloat16
        )
        q = jax.random.normal(jax.random.fold_in(key, 9), (b, hq, d),
                              jnp.float32)
        ref = paged_attention(q, k_pages, v_pages, lengths, tables,
                              interpret=True)
        k_ring, v_ring = _ring_from(kt, vt, lens, w)
        quant_len = jnp.maximum(lengths - w, 0)
        o1, m1, l1 = paged_attention(
            q, k_pages, v_pages, jnp.maximum(quant_len, 1), tables,
            interpret=True, return_state=True,
        )
        o2, m2, l2 = recent_tail_state(
            q, k_ring, v_ring, lengths, quant_len, sm_scale=d ** -0.5
        )
        out = merge_attention_states(
            o1, m1, l1, o2, m2, l2, part1_valid=quant_len > 0
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=0, atol=atol
        )

    def test_merge_with_sinks_matches_kernel(self):
        b, hq, hkv, d, ps, npages, pps = 2, 4, 2, 128, 16, 32, 8
        w = 32
        lens = [50, 80]
        key = jax.random.PRNGKey(5)
        lengths = jnp.asarray(lens, jnp.int32)
        kt, vt, k_pages, v_pages, tables = _build_pages(
            key, b, hkv, d, ps, npages, pps, lens, jnp.bfloat16
        )
        q = jax.random.normal(jax.random.fold_in(key, 1), (b, hq, d),
                              jnp.float32)
        sinks = jax.random.normal(jax.random.fold_in(key, 2), (hq,),
                                  jnp.float32)
        ref = paged_attention(q, k_pages, v_pages, lengths, tables,
                              interpret=True, sinks=sinks)
        k_ring, v_ring = _ring_from(kt, vt, lens, w)
        quant_len = jnp.maximum(lengths - w, 0)
        o1, m1, l1 = paged_attention(
            q, k_pages, v_pages, jnp.maximum(quant_len, 1), tables,
            interpret=True, return_state=True,
        )
        o2, m2, l2 = recent_tail_state(
            q, k_ring, v_ring, lengths, quant_len, sm_scale=d ** -0.5
        )
        out = merge_attention_states(
            o1, m1, l1, o2, m2, l2, part1_valid=quant_len > 0, sinks=sinks
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=0, atol=8e-3
        )


def _mk_engine(kv_dtype, recent_window, n_slots=2, max_new=24):
    from tpu_flash.engine.runner import InferenceEngine

    cfg = dataclasses.replace(TINY_TEST, head_dim=128)
    model = FlashTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0))
    econfig = EngineConfig(
        max_batch_size=n_slots,
        max_seq_len=256,
        prefill_chunk=64,
        cache=CacheConfig(
            page_size=128,
            num_pages=2 * n_slots + 8,
            max_pages_per_seq=2,
            kv_dtype=kv_dtype,
            recent_window=recent_window,
        ),
    )
    return InferenceEngine(model, params, econfig, interpret=True), model, \
        params


class TestEngineRecentWindow:
    def test_int4_within_window_matches_bf16(self):
        """Greedy int4 generation with the window covering the whole
        context tracks the bf16-cache engine at bf16-noise level. The
        random-weight model loops on one token and escapes the loop on
        ~1-ulp logit noise (the tail's 128-row reduction tree vs the
        kernel's padded-block tree), so token-for-token equality over a
        long run is not a sound assertion — the op-level tests above pin
        the attention outputs to 2e-5. Here: a solid shared prefix and
        full-length generation. The aggregate quality gate (1.0 over 3
        prompts x 32 tokens) lives in tests/test_quality.py."""
        prompt = [3, 14, 15, 9, 2, 6, 53, 58]
        outs = {}
        for dt in ("bfloat16", "int4"):
            eng, _, _ = _mk_engine(dt, recent_window=128)
            rid = eng.submit(list(prompt), max_new_tokens=24)
            outs[dt] = eng.run()[rid]
        a, b = outs["bfloat16"], outs["int4"]
        assert len(b) == len(a) == 24
        prefix = 0
        for x, y in zip(a, b):
            if x != y:
                break
            prefix += 1
        assert prefix >= 8, (a, b)

    def test_beyond_window_still_generates(self):
        """recent_window smaller than the context: the paged (quantized)
        part engages; generation stays finite and token count correct."""
        eng, _, _ = _mk_engine("int4", recent_window=32)
        rid = eng.submit(list(range(40, 48)), max_new_tokens=40)
        out = eng.run()[rid]
        assert len(out) == 40

    def test_ring_disabled_when_zero(self):
        eng, _, _ = _mk_engine("int4", recent_window=0)
        assert eng.cache.k_recent is None
        rid = eng.submit([5, 6, 7], max_new_tokens=8)
        assert len(eng.run()[rid]) == 8

    def test_fork_inherits_ring(self):
        """Greedy n=2 branches with the ring must match a standalone
        request exactly — fork-time ring copy included."""
        prompt = [11, 200, 47, 5, 130, 77, 8, 99]
        eng, _, _ = _mk_engine("int4", recent_window=128, n_slots=3)
        solo = _mk_engine("int4", recent_window=128)[0]
        rid_s = solo.submit(list(prompt), max_new_tokens=16)
        want = solo.run()[rid_s]
        rid = eng.submit(list(prompt), max_new_tokens=16, n=2)
        outs = eng.run()
        for branch in eng.branches(rid):
            assert outs[branch] == want

    def test_snapshot_roundtrip_preserves_ring(self, tmp_path):
        from tpu_flash.checkpoint.store import (
            restore_engine,
            snapshot_engine,
        )

        prompt = [3, 14, 15, 9, 2, 6, 53, 58]
        ref_eng, _, _ = _mk_engine("int4", recent_window=128)
        rid = ref_eng.submit(list(prompt), max_new_tokens=24)
        want = ref_eng.run()[rid]

        eng, model, params = _mk_engine("int4", recent_window=128)
        rid2 = eng.submit(list(prompt), max_new_tokens=24)
        for _ in range(6):
            eng.step()
        snapshot_engine(tmp_path / "snap", eng)
        eng2, _, _ = _mk_engine("int4", recent_window=128)
        restore_engine(tmp_path / "snap", eng2)
        assert np.asarray(
            jnp.abs(eng2.cache.k_recent - eng.cache.k_recent)
        ).max() == 0
        out = eng2.run()[rid2]
        assert out == want


class TestFusedRingKernel:
    @pytest.mark.parametrize("w,lens", [(64, [9, 40, 63]),
                                        (64, [70, 100, 128]),
                                        (32, [1, 32, 90])])
    def test_fused_matches_external_merge(self, w, lens):
        """paged_attention(recent_k/v) — the ring as a final in-kernel
        block — must match the two-call external-merge construction."""
        b, hq, hkv, d, ps, npages, pps = 3, 4, 2, 128, 16, 32, 8
        key = jax.random.PRNGKey(11)
        lengths = jnp.asarray(lens, jnp.int32)
        kt, vt, k_pages, v_pages, tables = _build_pages(
            key, b, hkv, d, ps, npages, pps, lens, jnp.bfloat16
        )
        q = jax.random.normal(jax.random.fold_in(key, 2), (b, hq, d),
                              jnp.float32)
        k_ring, v_ring = _ring_from(kt, vt, lens, w)
        fused = paged_attention(
            q, k_pages, v_pages, lengths, tables, interpret=True,
            recent_k=k_ring, recent_v=v_ring,
        )
        quant_len = jnp.maximum(lengths - w, 0)
        o1, m1, l1 = paged_attention(
            q, k_pages, v_pages, jnp.maximum(quant_len, 1), tables,
            interpret=True, return_state=True,
        )
        o2, m2, l2 = recent_tail_state(
            q, k_ring, v_ring, lengths, quant_len, sm_scale=d ** -0.5
        )
        want = merge_attention_states(
            o1, m1, l1, o2, m2, l2, part1_valid=quant_len > 0
        )
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(want), rtol=0, atol=8e-3
        )
        # And against the monolithic kernel over the same values.
        ref = paged_attention(q, k_pages, v_pages, lengths, tables,
                              interpret=True)
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(ref), rtol=0, atol=8e-3
        )

    def test_fused_with_sinks(self):
        b, hq, hkv, d, ps, npages, pps = 2, 4, 2, 128, 16, 32, 8
        w, lens = 32, [20, 80]
        key = jax.random.PRNGKey(13)
        lengths = jnp.asarray(lens, jnp.int32)
        kt, vt, k_pages, v_pages, tables = _build_pages(
            key, b, hkv, d, ps, npages, pps, lens, jnp.bfloat16
        )
        q = jax.random.normal(jax.random.fold_in(key, 2), (b, hq, d),
                              jnp.float32)
        sinks = jax.random.normal(jax.random.fold_in(key, 3), (hq,),
                                  jnp.float32)
        k_ring, v_ring = _ring_from(kt, vt, lens, w)
        fused = paged_attention(
            q, k_pages, v_pages, lengths, tables, interpret=True,
            recent_k=k_ring, recent_v=v_ring, sinks=sinks,
        )
        ref = paged_attention(q, k_pages, v_pages, lengths, tables,
                              interpret=True, sinks=sinks)
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(ref), rtol=0, atol=8e-3
        )


class TestRingInterplay:
    def test_sliding_window_layers_skip_ring(self):
        """A sliding-window model with an int4 ring cache must gate the
        ring off on windowed layers (the ring block has no window
        bookkeeping) and still generate full-length output."""
        from tpu_flash.engine.runner import InferenceEngine

        cfg = dataclasses.replace(
            TINY_TEST, head_dim=128, sliding_window=96
        )
        model = FlashTransformer(cfg)
        params = model.init(jax.random.PRNGKey(0))
        econfig = EngineConfig(
            max_batch_size=2,
            max_seq_len=256,
            prefill_chunk=64,
            cache=CacheConfig(
                page_size=128, num_pages=12, max_pages_per_seq=2,
                kv_dtype="int4", recent_window=128,
            ),
        )
        eng = InferenceEngine(model, params, econfig, interpret=True)
        rid = eng.submit([5, 9, 2, 7], max_new_tokens=20)
        out = eng.run()[rid]
        assert len(out) == 20

    def test_dp_fleet_with_ring_matches_single(self):
        """DP replicas with int4 ring caches reproduce the single-engine
        stream (the ring is per-replica device state)."""
        import jax as _jax

        if len(_jax.devices()) < 2:
            pytest.skip("needs >= 2 devices")
        from tpu_flash.engine.dp import DataParallelEngine
        from tpu_flash.engine.runner import InferenceEngine

        cfg = dataclasses.replace(TINY_TEST, head_dim=128)
        model = FlashTransformer(cfg)
        params = model.init(jax.random.PRNGKey(0))
        econfig = EngineConfig(
            max_batch_size=2,
            max_seq_len=256,
            prefill_chunk=64,
            cache=CacheConfig(
                page_size=128, num_pages=12, max_pages_per_seq=2,
                kv_dtype="int4", recent_window=128,
            ),
        )
        single = InferenceEngine(model, params, econfig, interpret=True)
        rid = single.submit([3, 14, 15, 9], max_new_tokens=16)
        want = single.run()[rid]
        dp = DataParallelEngine(
            model, params, econfig, replicas=2, interpret=True
        )
        rids = [dp.submit([3, 14, 15, 9], max_new_tokens=16)
                for _ in range(3)]
        outs = dp.run()
        for r in rids:
            assert outs[r] == want
