"""Parity tests: attention sinks (StreamingLLM / gpt-oss convention).

A per-head sink is a valueless softmax column: only the denominator (and
lse) change. Covers the dense fwd/bwd kernels on both grids (including
the analytic dsinks), the paged decode / ragged / paged-prefill serving
kernels, and end-to-end engine serving with a sinks model.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.core.config import BlockSizes, CacheConfig, EngineConfig
from tpu_flash.core.reference import (
    gather_pages_to_dense,
    reference_attention,
    reference_decode_attention,
    reference_gqa_attention,
)
from tpu_flash.ops.flash import flash_attention

F32_TOL = dict(atol=2e-5, rtol=2e-5)
GRAD_TOL = dict(atol=2e-4, rtol=2e-4)

SMALL_TRI = BlockSizes(
    block_q=64, block_kv_major=64, block_kv=64,
    block_q_dkv=64, block_kv_dkv=64, block_q_dq=64, block_kv_dq=64,
    triangular=True,
)


def _qkv(key, b, hq, hkv, sq, skv, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, hq, sq, d), dtype)
    k = jax.random.normal(kk, (b, hkv, skv, d), dtype)
    v = jax.random.normal(kv, (b, hkv, skv, d), dtype)
    return q, k, v


class TestSinksForward:
    @pytest.mark.parametrize("causal", [False, True])
    def test_parity(self, causal):
        q, k, v = _qkv(jax.random.PRNGKey(0), 2, 2, 2, 256, 256, 64)
        sinks = jax.random.normal(jax.random.PRNGKey(1), (2,)) * 3.0
        out = flash_attention(q, k, v, causal=causal, sinks=sinks)
        ref = reference_attention(q, k, v, causal=causal, sinks=sinks)
        np.testing.assert_allclose(out, ref, **F32_TOL)

    def test_tri_matches_rect(self):
        q, k, v = _qkv(jax.random.PRNGKey(2), 1, 2, 2, 256, 256, 64)
        sinks = jnp.asarray([1.5, -2.0])
        o_tri = flash_attention(
            q, k, v, causal=True, sinks=sinks, block_sizes=SMALL_TRI
        )
        o_rect = flash_attention(q, k, v, causal=True, sinks=sinks)
        np.testing.assert_allclose(o_tri, o_rect, atol=1e-6, rtol=1e-6)

    def test_gqa_with_window_softcap(self):
        q, k, v = _qkv(jax.random.PRNGKey(3), 1, 4, 2, 192, 192, 64)
        sinks = jax.random.normal(jax.random.PRNGKey(4), (4,)) * 2.0
        out = flash_attention(
            q, k, v, causal=True, window=80, softcap=20.0, sinks=sinks
        )
        ref = reference_gqa_attention(
            q, k, v, causal=True, window=80, softcap=20.0, sinks=sinks
        )
        np.testing.assert_allclose(out, ref, **F32_TOL)

    def test_large_sink_dominates(self):
        """A huge sink absorbs nearly all mass: output ~ 0."""
        q, k, v = _qkv(jax.random.PRNGKey(5), 1, 1, 1, 128, 128, 64)
        out = flash_attention(
            q, k, v, causal=True, sinks=jnp.asarray([200.0])
        )
        assert float(jnp.max(jnp.abs(out))) < 1e-4

    def test_lse_includes_sink(self):
        q, k, v = _qkv(jax.random.PRNGKey(6), 1, 1, 1, 128, 128, 64)
        sinks = jnp.asarray([0.7])
        _, lse = flash_attention(
            q, k, v, causal=True, sinks=sinks, save_residuals=True
        )
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (64**-0.5)
        pos = jnp.arange(128)
        s = jnp.where(
            (pos[None, :] <= pos[:, None])[None, None], s, -jnp.inf
        )
        sink_col = jnp.full((1, 1, 128, 1), 0.7)
        expected = jax.scipy.special.logsumexp(
            jnp.concatenate([s, sink_col], axis=-1), axis=-1
        )
        np.testing.assert_allclose(lse, expected, atol=1e-4, rtol=1e-4)

    def test_validation(self):
        q, k, v = _qkv(jax.random.PRNGKey(7), 1, 2, 2, 128, 128, 64)
        with pytest.raises(ValueError, match="sinks"):
            flash_attention(q, k, v, sinks=jnp.zeros((3,)))


class TestSinksBackward:
    @pytest.mark.parametrize("blocks", [None, SMALL_TRI],
                             ids=["default", "tri"])
    def test_grads_including_dsinks(self, blocks):
        q, k, v = _qkv(jax.random.PRNGKey(10), 1, 4, 2, 192, 192, 64)
        sinks = jax.random.normal(jax.random.PRNGKey(11), (4,)) * 2.0

        def loss_k(q, k, v, sk):
            o = flash_attention(
                q, k, v, causal=True, sinks=sk, block_sizes=blocks
            )
            return jnp.sum(o * o)

        def loss_r(q, k, v, sk):
            o = reference_gqa_attention(q, k, v, causal=True, sinks=sk)
            return jnp.sum(o * o)

        gk = jax.grad(loss_k, (0, 1, 2, 3))(q, k, v, sinks)
        gr = jax.grad(loss_r, (0, 1, 2, 3))(q, k, v, sinks)
        for a, b, name in zip(gk, gr, ["q", "k", "v", "sinks"]):
            np.testing.assert_allclose(a, b, err_msg=f"d{name}", **GRAD_TOL)

    def test_dsinks_through_residual_lse(self):
        """Ring-attention style: the lse output's cotangent must reach
        dsinks (lse depends on the sink)."""
        q, k, v = _qkv(jax.random.PRNGKey(12), 1, 2, 2, 128, 128, 64)
        sinks = jnp.asarray([0.5, -1.0])

        def loss_k(sk):
            o, lse = flash_attention(
                q, k, v, causal=True, sinks=sk, save_residuals=True
            )
            return jnp.sum(lse) + jnp.sum(o)

        def loss_r(sk):
            ref = reference_attention(q, k, v, causal=True, sinks=sk)
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (64**-0.5)
            pos = jnp.arange(128)
            s = jnp.where(
                (pos[None, :] <= pos[:, None])[None, None], s, -jnp.inf
            )
            sink_col = jnp.broadcast_to(
                sk[None, :, None, None], (1, 2, 128, 1)
            )
            lse = jax.scipy.special.logsumexp(
                jnp.concatenate([s, sink_col], axis=-1), axis=-1
            )
            return jnp.sum(lse) + jnp.sum(ref)

        np.testing.assert_allclose(
            jax.grad(loss_k)(sinks), jax.grad(loss_r)(sinks), **GRAD_TOL
        )


class TestSinksDecode:
    def _paged(self, key, hkv, num_pages, ps, d, batch, pps):
        kk, kv, kp = jax.random.split(key, 3)
        k_pages = jax.random.normal(kk, (hkv, num_pages, ps, d))
        v_pages = jax.random.normal(kv, (hkv, num_pages, ps, d))
        perm = jax.random.permutation(kp, num_pages)
        pidx = perm[: batch * pps].reshape(batch, pps).astype(jnp.int32)
        return k_pages, v_pages, pidx

    def test_decode_parity(self):
        from tpu_flash.ops.decode import paged_attention

        b, hq, hkv, d, ps, pps = 3, 4, 2, 128, 128, 4
        kq, kc, ks = jax.random.split(jax.random.PRNGKey(20), 3)
        kp, vp, pidx = self._paged(kc, hkv, 64, ps, d, b, pps)
        q = jax.random.normal(kq, (b, hq, d))
        lengths = jnp.array([512, 200, 1], jnp.int32)
        sinks = jax.random.normal(ks, (hq,)) * 3.0
        out = paged_attention(
            q, kp, vp, lengths, pidx, pages_per_compute_block=2, sinks=sinks
        )
        ref = reference_decode_attention(
            q, gather_pages_to_dense(kp, pidx),
            gather_pages_to_dense(vp, pidx), lengths, sinks=sinks,
        )
        np.testing.assert_allclose(out, ref, **F32_TOL)

    def test_decode_sinks_window_quantized(self):
        from tpu_flash.ops.decode import paged_attention
        from tpu_flash.ops.quant import dequantize, quantize_pages

        b, hq, hkv, d, ps, pps = 2, 4, 2, 128, 128, 4
        kq, kc, ks = jax.random.split(jax.random.PRNGKey(21), 3)
        kp, vp, pidx = self._paged(kc, hkv, 64, ps, d, b, pps)
        q = jax.random.normal(kq, (b, hq, d))
        lengths = jnp.array([512, 300], jnp.int32)
        sinks = jax.random.normal(ks, (hq,)) * 2.0
        k8, v8 = quantize_pages(kp, "int8"), quantize_pages(vp, "int8")
        out = paged_attention(
            q, k8, v8, lengths, pidx, pages_per_compute_block=2,
            sinks=sinks, window=150, int8_mxu=False,
        )
        ref = reference_decode_attention(
            q, gather_pages_to_dense(dequantize(k8), pidx),
            gather_pages_to_dense(dequantize(v8), pidx), lengths,
            sinks=sinks, window=150,
        )
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


class TestSinksServingKernels:
    def test_ragged_parity(self):
        from tpu_flash.ops.flash import flash_attention_ragged

        hist_cap, q_len = 256, 128
        kq, kk, kv, ks = jax.random.split(jax.random.PRNGKey(30), 4)
        q = jax.random.normal(kq, (3, 2, q_len, 64))
        k = jax.random.normal(kk, (3, 2, hist_cap + q_len, 64))
        v = jax.random.normal(kv, (3, 2, hist_cap + q_len, 64))
        sinks = jax.random.normal(ks, (2,)) * 2.0
        offs = jnp.asarray([0, 100, 256], jnp.int32)
        out = flash_attention_ragged(
            q, k, v, offs, hist_cap=hist_cap, sinks=sinks
        )
        rows = []
        for i, off in enumerate([0, 100, 256]):
            k_row = jnp.concatenate(
                [k[i : i + 1, :, :off], k[i : i + 1, :, hist_cap:]], 2
            )
            v_row = jnp.concatenate(
                [v[i : i + 1, :, :off], v[i : i + 1, :, hist_cap:]], 2
            )
            rows.append(
                reference_gqa_attention(
                    q[i : i + 1], k_row, v_row, causal=True, q_offset=off,
                    sinks=sinks,
                )
            )
        np.testing.assert_allclose(out, jnp.concatenate(rows), **F32_TOL)

    def test_paged_prefill_parity(self):
        from tpu_flash.ops.flash import paged_prefill_attention

        batch, hkv, hq, q_len, hist_cap, d, ps = 2, 2, 4, 64, 256, 64, 64
        ks = jax.random.split(jax.random.PRNGKey(31), 6)
        pages_per_seq = hist_cap // ps
        num_pages = batch * pages_per_seq + 1
        k_pages = jax.random.normal(ks[0], (hkv, num_pages, ps, d))
        v_pages = jax.random.normal(ks[1], (hkv, num_pages, ps, d))
        perm = jax.random.permutation(ks[2], num_pages)
        tables = perm[: batch * pages_per_seq].reshape(
            batch, pages_per_seq
        ).astype(jnp.int32)
        q = jax.random.normal(ks[3], (batch, hq, q_len, d))
        ck = jax.random.normal(ks[4], (batch, hkv, q_len, d))
        cv = jax.random.normal(ks[5], (batch, hkv, q_len, d))
        sinks = jax.random.normal(jax.random.PRNGKey(32), (hq,)) * 2.0
        offs = jnp.asarray([256, 128], jnp.int32)
        out = paged_prefill_attention(
            q, ck, cv, k_pages, v_pages, offs, tables, hist_cap=hist_cap,
            sinks=sinks,
        )
        kh = k_pages[:, tables].transpose(1, 0, 2, 3, 4).reshape(
            batch, hkv, hist_cap, d
        )
        vh = v_pages[:, tables].transpose(1, 0, 2, 3, 4).reshape(
            batch, hkv, hist_cap, d
        )
        rows = []
        for i, off in enumerate([256, 128]):
            k_row = jnp.concatenate(
                [kh[i : i + 1, :, :off], ck[i : i + 1]], 2
            )
            v_row = jnp.concatenate(
                [vh[i : i + 1, :, :off], cv[i : i + 1]], 2
            )
            rows.append(
                reference_gqa_attention(
                    q[i : i + 1], k_row, v_row, causal=True, q_offset=off,
                    sinks=sinks,
                )
            )
        np.testing.assert_allclose(out, jnp.concatenate(rows), **F32_TOL)


class TestSinksEngine:
    def _make(self, **kw):
        from tpu_flash.models import TINY_TEST, FlashTransformer

        cfg = dataclasses.replace(TINY_TEST, attn_sinks=True, **kw)
        model = FlashTransformer(cfg)
        params = model.init(jax.random.PRNGKey(0))
        # Non-zero sinks so the feature actually changes the math.
        for li, layer in enumerate(params["layers"]):
            layer["sinks"] = (
                jax.random.normal(jax.random.PRNGKey(li), (cfg.num_q_heads,))
                * 2.0
            )
        return model, params

    def _oracle(self, model, params, prompt, n_new):
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

    def _engine(self, model, params, **kw):
        from tpu_flash.engine.runner import InferenceEngine

        cfg = EngineConfig(
            max_batch_size=2, max_seq_len=256, prefill_chunk=64,
            cache=CacheConfig(
                page_size=8, num_pages=64, max_pages_per_seq=32,
            ),
            **kw,
        )
        return InferenceEngine(model, params, cfg, interpret=True)

    def test_sinks_engine_matches_oracle(self):
        model, params = self._make()
        engine = self._engine(model, params)
        prompt = [3, 14, 15, 9, 2, 6, 31, 41]
        rid = engine.submit(prompt, max_new_tokens=6)
        assert engine.run()[rid] == self._oracle(model, params, prompt, 6)

    def test_sinks_with_window_long_prompt(self):
        model, params = self._make(sliding_window=16)
        engine = self._engine(model, params)
        prompt = [
            int(x)
            for x in jax.random.randint(jax.random.PRNGKey(9), (120,), 0, 200)
        ]
        rid = engine.submit(prompt, max_new_tokens=4)
        assert engine.run()[rid] == self._oracle(model, params, prompt, 4)

    def test_sinks_paged_prefill_path(self):
        model, params = self._make()
        prompt = [
            int(x)
            for x in jax.random.randint(jax.random.PRNGKey(10), (100,), 0, 200)
        ]
        e1 = self._engine(model, params, paged_prefill=True)
        e2 = self._engine(model, params, paged_prefill=False)
        r1 = e1.submit(prompt, max_new_tokens=4)
        r2 = e2.submit(prompt, max_new_tokens=4)
        assert e1.run()[r1] == e2.run()[r2] == self._oracle(
            model, params, prompt, 4
        )

    def test_sinks_speculative_exact(self):
        from tpu_flash.engine.runner import InferenceEngine

        model, params = self._make()
        prompt = [5, 6, 7, 5, 6, 7, 5, 6, 7, 5, 6]
        base = self._engine(model, params)
        base.speculation_k = 0
        rb = base.submit(prompt, max_new_tokens=16)
        expected = base.run()[rb]

        cfg = EngineConfig(
            max_batch_size=2, max_seq_len=256, prefill_chunk=64,
            cache=CacheConfig(
                page_size=8, num_pages=64, max_pages_per_seq=32,
            ),
        )
        spec = InferenceEngine(
            model, params, cfg, interpret=True, draft=(model, params)
        )
        spec.speculation_k = 8
        rs = spec.submit(prompt, max_new_tokens=16)
        assert spec.run()[rs] == expected
        assert spec.speculation_stats()["proposed"] > 0

    def test_loss_fn_trains_sinks(self):
        model, params = self._make()
        tokens = jnp.asarray([[3, 14, 15, 27, 1, 8]], jnp.int32)
        g = jax.grad(lambda p: model.loss_fn(p, tokens))(params)
        gn = float(jnp.linalg.norm(g["layers"][0]["sinks"]))
        assert np.isfinite(gn) and gn > 0
