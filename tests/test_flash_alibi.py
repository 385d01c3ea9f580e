"""ALiBi (per-head linear distance bias, BLOOM/MPT) across the stack:
dense fwd (both grids) + backward vs the jnp oracle's autodiff, ragged
and paged-prefill kernels, paged decode, and end-to-end engine serving
of an ``attn_alibi`` model against the dense-forward oracle."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.core.config import BlockSizes, CacheConfig, EngineConfig
from tpu_flash.core.reference import (
    alibi_slopes,
    gather_pages_to_dense,
    reference_decode_attention,
    reference_gqa_attention,
)
from tpu_flash.ops.flash import flash_attention

F32_TOL = dict(atol=2e-5, rtol=2e-5)


def _qkv(key, b=2, hq=4, hkv=2, L=192, d=64, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (b, hq, L, d), dtype)
    k = jax.random.normal(ks[1], (b, hkv, L, d), dtype)
    v = jax.random.normal(ks[2], (b, hkv, L, d), dtype)
    return q, k, v


class TestSlopes:
    def test_power_of_two(self):
        s = np.asarray(alibi_slopes(8))
        np.testing.assert_allclose(s, [2.0 ** (-(i + 1)) for i in range(8)])

    def test_non_power_of_two(self):
        s = np.asarray(alibi_slopes(6))  # 4 base + 2 interleaved from 8
        base = np.asarray(alibi_slopes(4))
        eight = np.asarray(alibi_slopes(8))
        np.testing.assert_allclose(s[:4], base)
        np.testing.assert_allclose(s[4:], eight[0::2][:2])

    def test_descending_positive(self):
        s = np.asarray(alibi_slopes(12))
        assert (s > 0).all() and (np.diff(s[:8]) < 0).all()


class TestDenseAlibi:
    @pytest.mark.parametrize("triangular", [True, False])
    def test_forward_parity(self, triangular):
        q, k, v = _qkv(jax.random.PRNGKey(0))
        sl = alibi_slopes(q.shape[1])
        bs = dataclasses.replace(
            BlockSizes(block_q=64, block_kv_major=128, block_kv=128),
            triangular=triangular,
        )
        o = flash_attention(q, k, v, causal=True, alibi=sl, block_sizes=bs)
        ref = reference_gqa_attention(q, k, v, causal=True, alibi=sl)
        np.testing.assert_allclose(o, ref, **F32_TOL)

    def test_forward_with_window_and_offset(self):
        q, k, v = _qkv(jax.random.PRNGKey(1), L=128)
        q_chunk = q[:, :, 64:]
        sl = alibi_slopes(q.shape[1])
        o = flash_attention(
            q_chunk, k, v, causal=True, q_offset=64, alibi=sl, window=50
        )
        ref = reference_gqa_attention(
            q_chunk, k, v, causal=True, q_offset=64, alibi=sl, window=50
        )
        np.testing.assert_allclose(o, ref, **F32_TOL)

    @pytest.mark.parametrize("triangular", [True, False])
    def test_gradients_match_oracle_autodiff(self, triangular):
        q, k, v = _qkv(jax.random.PRNGKey(2), L=128)
        sl = alibi_slopes(q.shape[1])
        bs = dataclasses.replace(
            BlockSizes(
                block_q=64, block_kv_major=128, block_kv=128,
                block_q_dkv=64, block_kv_dkv=128,
                block_q_dq=64, block_kv_dq=128,
            ),
            triangular=triangular,
        )

        def loss_f(q, k, v):
            return (
                flash_attention(
                    q, k, v, causal=True, alibi=sl, block_sizes=bs
                ).astype(jnp.float32) ** 2
            ).sum()

        def loss_r(q, k, v):
            return (
                reference_gqa_attention(
                    q, k, v, causal=True, alibi=sl
                ).astype(jnp.float32) ** 2
            ).sum()

        gf = jax.grad(loss_f, (0, 1, 2))(q, k, v)
        gr = jax.grad(loss_r, (0, 1, 2))(q, k, v)
        for a, b, name in zip(gf, gr, "qkv"):
            np.testing.assert_allclose(
                a, b, atol=5e-4, rtol=5e-4, err_msg=f"d{name}"
            )

    def test_alibi_requires_causal(self):
        q, k, v = _qkv(jax.random.PRNGKey(3), L=64)
        with pytest.raises(ValueError, match="causal"):
            flash_attention(q, k, v, causal=False,
                            alibi=alibi_slopes(q.shape[1]))


class TestRaggedAlibi:
    def test_mixed_offsets(self):
        from tpu_flash.ops.flash import flash_attention_ragged

        b, hq, hkv, d = 2, 4, 2, 64
        hist_cap, q_len = 128, 64
        ks = jax.random.split(jax.random.PRNGKey(4), 3)
        q = jax.random.normal(ks[0], (b, hq, q_len, d))
        k = jax.random.normal(ks[1], (b, hkv, hist_cap + q_len, d))
        v = jax.random.normal(ks[2], (b, hkv, hist_cap + q_len, d))
        offs = jnp.asarray([128, 37], jnp.int32)
        sl = alibi_slopes(hq)
        out = flash_attention_ragged(
            q, k, v, offs, hist_cap=hist_cap, alibi=sl
        )
        for i in range(b):
            off = int(offs[i])
            k_row = jnp.concatenate(
                [k[i : i + 1, :, :off], k[i : i + 1, :, hist_cap:]], axis=2
            )
            v_row = jnp.concatenate(
                [v[i : i + 1, :, :off], v[i : i + 1, :, hist_cap:]], axis=2
            )
            ref = reference_gqa_attention(
                q[i : i + 1], k_row, v_row, causal=True, q_offset=off,
                alibi=sl,
            )
            np.testing.assert_allclose(out[i : i + 1], ref, **F32_TOL)


class TestPagedAlibi:
    def test_paged_prefill(self):
        from tests.test_paged_prefill import _oracle_ws, _setup  # reuse
        from tpu_flash.ops.flash import paged_prefill_attention

        q, ck, cv, kp, vp, tables, kh, vh = _setup(
            jax.random.PRNGKey(5), 2, 2, 4, 64, 256, 64, 64
        )
        offs = jnp.asarray([256, 100], jnp.int32)
        sl = alibi_slopes(4)
        out = paged_prefill_attention(
            q, ck, cv, kp, vp, offs, tables, hist_cap=256, alibi=sl
        )
        rows = []
        for i in range(q.shape[0]):
            off = int(offs[i])
            k_row = jnp.concatenate(
                [kh[i : i + 1, :, :off], ck[i : i + 1]], 2
            )
            v_row = jnp.concatenate(
                [vh[i : i + 1, :, :off], cv[i : i + 1]], 2
            )
            rows.append(
                reference_gqa_attention(
                    q[i : i + 1], k_row, v_row, causal=True, q_offset=off,
                    alibi=sl,
                )
            )
        np.testing.assert_allclose(
            out, jnp.concatenate(rows, 0), **F32_TOL
        )

    @pytest.mark.parametrize("kv_quant", [None, "int8"])
    def test_paged_decode(self, kv_quant):
        from tpu_flash.ops.decode import paged_attention
        from tpu_flash.ops.quant import dequantize, quantize_pages

        B, HQ, HKV, D, PS, CTX = 3, 8, 2, 128, 16, 128
        pps = CTX // PS
        npages = B * pps + 1
        ks = jax.random.split(jax.random.PRNGKey(6), 4)
        kp = jax.random.normal(ks[0], (HKV, npages, PS, D))
        vp = jax.random.normal(ks[1], (HKV, npages, PS, D))
        tables = (
            jax.random.permutation(ks[2], npages)[: B * pps]
            .reshape(B, pps)
            .astype(jnp.int32)
        )
        q = jax.random.normal(ks[3], (B, HQ, D))
        lengths = jnp.asarray([128, 77, 33], jnp.int32)
        sl = alibi_slopes(HQ)
        if kv_quant:
            kq, vq = quantize_pages(kp, kv_quant), quantize_pages(
                vp, kv_quant
            )
            kd = gather_pages_to_dense(dequantize(kq), tables)
            vd = gather_pages_to_dense(dequantize(vq), tables)
            out = paged_attention(q, kq, vq, lengths, tables, alibi=sl)
            tol = dict(atol=5e-2, rtol=5e-2)
        else:
            kd = gather_pages_to_dense(kp, tables)
            vd = gather_pages_to_dense(vp, tables)
            out = paged_attention(q, kp, vp, lengths, tables, alibi=sl)
            tol = F32_TOL
        ref = reference_decode_attention(q, kd, vd, lengths, alibi=sl)
        np.testing.assert_allclose(out, ref, **tol)


class TestAlibiModelServing:
    def test_engine_matches_dense_oracle(self):
        """An attn_alibi model (no rope) served end-to-end: chunked
        prefill + paged decode greedy outputs equal the model's own dense
        forward, which itself uses the alibi'd flash kernel."""
        from tpu_flash.engine.runner import InferenceEngine
        from tpu_flash.models import TINY_TEST, FlashTransformer

        cfg = dataclasses.replace(TINY_TEST, attn_alibi=True)
        model = FlashTransformer(cfg)
        params = model.init(jax.random.PRNGKey(0))
        ecfg = EngineConfig(
            max_batch_size=2, max_seq_len=128, prefill_chunk=8,
            cache=CacheConfig(
                page_size=8, num_pages=64, max_pages_per_seq=16,
                kv_dtype="float32",
            ),
            prefix_cache=False,
        )
        eng = InferenceEngine(model, params, ecfg, interpret=True)
        prompt = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]
        rid = eng.submit(prompt, 6)
        eng.run()

        toks = list(prompt)
        expect = []
        for _ in range(6):
            lg = model.forward(
                params, jnp.asarray(toks, jnp.int32)[None], interpret=True
            )
            t = int(jnp.argmax(lg[0, -1]))
            expect.append(t)
            toks.append(t)
        assert eng.outputs[rid] == expect

    def test_loss_fn_differs_from_rope(self):
        """ALiBi config must actually change the function (rope skipped,
        bias applied) — guard against silently ignoring the flag."""
        from tpu_flash.models import TINY_TEST, FlashTransformer

        base = FlashTransformer(TINY_TEST)
        params = base.init(jax.random.PRNGKey(0))
        alibi = FlashTransformer(
            dataclasses.replace(TINY_TEST, attn_alibi=True)
        )
        toks = jax.random.randint(
            jax.random.PRNGKey(1), (2, 32), 0, TINY_TEST.vocab_size
        )
        l1 = float(base.loss_fn(params, toks))
        l2 = float(alibi.loss_fn(params, toks))
        assert abs(l1 - l2) > 1e-6

    def test_ring_guard_noncausal(self):
        from tpu_flash.parallel.ring import ring_attention_local

        q = jnp.zeros((1, 2, 16, 32))
        with pytest.raises(ValueError, match="causal"):
            ring_attention_local(
                q, q, q, seq_axis="seq", n_ring=2, causal=False,
                alibi=alibi_slopes(2),
            )


requires_8 = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


class TestRingAlibi:
    """Ring ALiBi: diag/band branches carry exact in-kernel bias via their
    static q_offsets; the SHARED dense branch computes the bias at
    q_offset=blk_len and gets a per-(head, distance) constant m-shift —
    so the deduped branch table survives. Parity against the single-chip
    oracle is the whole proof."""

    @requires_8
    @pytest.mark.parametrize("window", [None, 100])
    def test_ring_parity_4way(self, window):
        from tpu_flash.core.config import MeshConfig
        from tpu_flash.parallel import build_mesh, ring_attention
        from tpu_flash.core.reference import reference_attention

        mesh = build_mesh(MeshConfig(data=1, model=1, seq=4))
        ks = jax.random.split(jax.random.PRNGKey(7), 3)
        q = jax.random.normal(ks[0], (1, 2, 256, 64))
        k = jax.random.normal(ks[1], (1, 2, 256, 64))
        v = jax.random.normal(ks[2], (1, 2, 256, 64))
        sl = alibi_slopes(2)
        out = ring_attention(
            q, k, v, mesh, causal=True, interpret=True, alibi=sl,
            window=window,
        )
        ref = reference_attention(
            q, k, v, causal=True, alibi=sl, window=window
        )
        np.testing.assert_allclose(out, ref, atol=3e-5, rtol=3e-5)

    @requires_8
    def test_ring_head_parallel_slopes_sliced(self):
        from tpu_flash.core.config import MeshConfig
        from tpu_flash.parallel import build_mesh, ring_attention
        from tpu_flash.core.reference import reference_attention

        mesh = build_mesh(MeshConfig(data=1, model=2, seq=4))
        ks = jax.random.split(jax.random.PRNGKey(8), 3)
        q = jax.random.normal(ks[0], (1, 4, 256, 64))
        k = jax.random.normal(ks[1], (1, 4, 256, 64))
        v = jax.random.normal(ks[2], (1, 4, 256, 64))
        sl = alibi_slopes(4)
        out = ring_attention(
            q, k, v, mesh, causal=True, interpret=True, alibi=sl
        )
        ref = reference_attention(q, k, v, causal=True, alibi=sl)
        np.testing.assert_allclose(out, ref, atol=3e-5, rtol=3e-5)

    @requires_8
    def test_ulysses_variants_passthrough(self):
        """Ulysses SP runs the plain kernel per head-slice, so every
        variant (window, softcap, sinks, alibi) must pass through with
        per-head arrays sliced to the chip's head range."""
        from tpu_flash.core.config import MeshConfig
        from tpu_flash.core.reference import reference_attention
        from tpu_flash.parallel import build_mesh, ulysses_attention

        mesh = build_mesh(MeshConfig(data=1, model=1, seq=4))
        ks = jax.random.split(jax.random.PRNGKey(9), 4)
        q = jax.random.normal(ks[0], (1, 4, 256, 64))
        k = jax.random.normal(ks[1], (1, 4, 256, 64))
        v = jax.random.normal(ks[2], (1, 4, 256, 64))
        sl = alibi_slopes(4)
        sinks = jax.random.normal(ks[3], (4,))
        fn = ulysses_attention(
            mesh, causal=True, interpret=True, window=90, alibi=sl,
            sinks=sinks,
        )
        out = fn(q, k, v)
        ref = reference_attention(
            q, k, v, causal=True, window=90, alibi=sl, sinks=sinks
        )
        np.testing.assert_allclose(out, ref, atol=3e-5, rtol=3e-5)

    @requires_8
    def test_sharded_train_step_matches_loss_fn(self):
        """DP x TP x SP training of an ALiBi model == model.loss_fn."""
        from tpu_flash.core.config import MeshConfig
        from tpu_flash.models import TINY_TEST, FlashTransformer
        from tpu_flash.parallel import build_mesh
        from tpu_flash.parallel.train import make_train_step

        cfg = dataclasses.replace(
            TINY_TEST, attn_alibi=True, head_dim=32
        )
        model = FlashTransformer(cfg)
        params = model.init(jax.random.PRNGKey(0))
        mesh = build_mesh(MeshConfig(data=2, model=2, seq=2))
        toks = jax.random.randint(
            jax.random.PRNGKey(1), (2, 64), 0, cfg.vocab_size
        )
        ref = model.loss_fn(params, toks)  # before the donating step
        shard_params, build = make_train_step(model, mesh, interpret=True)
        step = build(params)
        p = shard_params(params)
        _, loss = step(p, toks)
        np.testing.assert_allclose(
            float(loss), float(ref), atol=2e-4, rtol=2e-4
        )
