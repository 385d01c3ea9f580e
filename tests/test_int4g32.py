"""int4g32 — the 4-bit QUALITY tier: per-(token, 32-channel-group)
ASYMMETRIC affine KV quantization (x ≈ q*scale + zero, unsigned nibbles).

Scheme selected on trained-checkpoint evidence (BENCHLOG 2026-08-21 r5):
per-token symmetric int4 reads 0.33/0.20 greedy prefix-match beyond the
exact ring on the trained byte-Llama (the honest beyond-window stress
VERDICT r4 item 2 flagged), while group-asym cuts attention-output error
0.143 -> 0.094 on the same captured K/V tensors
(tools/quant_scheme_probe.py). Payload stays token-packed nibbles
(ops/quant/quantize.py); scales carry [ps, 2*d/32] (scale..., zero...)
rows per page; the decode kernel affine-dequants per lane group in VMEM
and feeds the bf16 MXU (ops/decode/paged.py::dequant_group); prefill
history takes the gather path (runner._paged_enabled).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.core.config import CacheConfig, EngineConfig
from tpu_flash.core.reference import (
    gather_pages_to_dense,
    reference_decode_attention,
)
from tpu_flash.engine.cache import PagedKVCache
from tpu_flash.engine.runner import InferenceEngine
from tpu_flash.models import TINY_TEST, FlashTransformer
from tpu_flash.ops.decode import paged_attention
from tpu_flash.ops.quant import dequantize, quantize_pages
from tpu_flash.ops.quant.quantize import (
    dequantize_group_asym,
    quantize_group_asym,
)


class TestGroupAsymQuant:
    def test_roundtrip_error_beats_symmetric(self):
        # On out-of-center data (nonzero per-group means) the affine
        # ranges must reconstruct better than symmetric absmax.
        x = jax.random.normal(jax.random.PRNGKey(0), (64, 128)) + 0.7
        q, scales = quantize_group_asym(x)
        rt = dequantize_group_asym(q, scales)
        from tpu_flash.ops.quant import quantize

        sym = dequantize(quantize(x, "int4"))
        err_g = float(jnp.max(jnp.abs(rt - x)))
        err_s = float(jnp.max(jnp.abs(sym - x)))
        assert err_g < err_s
        # Affine with 15 levels: per-group error <= range/15/2 + eps.
        assert err_g < 0.25

    def test_nibbles_unsigned_range(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (8, 128))
        q, _ = quantize_group_asym(x)
        assert int(q.min()) >= 0 and int(q.max()) <= 15

    def test_pages_roundtrip_token_packed(self):
        pages = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 16, 128))
        qt = quantize_pages(pages, "int4g32")
        assert qt.values.shape == (2, 3, 8, 128)  # ps/2 payload rows
        assert qt.scales.shape == (2, 3, 8, 16)  # [2*ng, ps] transposed
        rt = dequantize(qt)
        assert float(jnp.max(jnp.abs(rt - pages))) < 0.3


class TestPagedDecodeParity:
    @pytest.mark.parametrize("ragged", [False, True])
    def test_kernel_matches_dequant_oracle(self, ragged):
        b, hq, hkv, d, ctx, ps = 2, 8, 2, 128, 256, 64
        pps = ctx // ps
        num_pages = b * pps + 1
        kk, kv_, kq = jax.random.split(jax.random.PRNGKey(1), 3)
        k_pages = jax.random.normal(kk, (hkv, num_pages, ps, d))
        v_pages = jax.random.normal(kv_, (hkv, num_pages, ps, d))
        q = jax.random.normal(kq, (b, hq, d))
        page_indices = jnp.arange(b * pps, dtype=jnp.int32).reshape(b, pps)
        lengths = (
            jnp.asarray([ctx, ctx - 17], jnp.int32)
            if ragged else jnp.full((b,), ctx, jnp.int32)
        )
        kqt = quantize_pages(k_pages, "int4g32")
        vqt = quantize_pages(v_pages, "int4g32")
        out = paged_attention(
            q, kqt, vqt, lengths, page_indices, interpret=True
        )
        ref = reference_decode_attention(
            q,
            gather_pages_to_dense(dequantize(kqt), page_indices),
            gather_pages_to_dense(dequantize(vqt), page_indices),
            lengths,
        )
        np.testing.assert_allclose(out, ref, atol=5e-3)

    def test_quant_error_bounded_vs_exact(self):
        b, hq, hkv, d, ctx, ps = 1, 4, 2, 128, 128, 32
        pps = ctx // ps
        kk, kv_, kq = jax.random.split(jax.random.PRNGKey(3), 3)
        k_pages = jax.random.normal(kk, (hkv, pps + 1, ps, d))
        v_pages = jax.random.normal(kv_, (hkv, pps + 1, ps, d))
        q = jax.random.normal(kq, (b, hq, d))
        page_indices = jnp.arange(pps, dtype=jnp.int32)[None]
        lengths = jnp.full((b,), ctx, jnp.int32)
        out = paged_attention(
            q, quantize_pages(k_pages, "int4g32"),
            quantize_pages(v_pages, "int4g32"), lengths, page_indices,
            interpret=True,
        )
        ref = reference_decode_attention(
            q, gather_pages_to_dense(k_pages, page_indices),
            gather_pages_to_dense(v_pages, page_indices), lengths,
        )
        assert float(jnp.max(jnp.abs(out - ref))) < 0.12


class TestCacheLifecycle:
    def test_append_matches_bulk_quantize(self):
        cfg = CacheConfig(
            page_size=16, num_pages=8, max_pages_per_seq=4,
            kv_dtype="int4g32", recent_window=0,
        )
        cache = PagedKVCache.create(1, 2, 128, cfg)
        new_k = jax.random.normal(jax.random.PRNGKey(0), (16, 2, 128))
        new_v = jax.random.normal(jax.random.PRNGKey(1), (16, 2, 128))
        page_ids = jnp.zeros((16,), jnp.int32)
        offsets = jnp.arange(16, dtype=jnp.int32)
        cache = cache.append(0, new_k, new_v, page_ids, offsets)
        k, v = cache.layer_view(0)
        got = dequantize(k)[:, 0]  # page 0: [hkv, ps, d]
        want_q, want_s = quantize_group_asym(
            new_k.transpose(1, 0, 2)
        )  # [hkv, tok, d]
        want = dequantize_group_asym(want_q, want_s)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-6
        )


class TestEngineEndToEnd:
    def test_generation_runs_and_tracks_bf16(self):
        cfg = dataclasses.replace(TINY_TEST, head_dim=128)
        model = FlashTransformer(cfg)
        params = model.init(jax.random.PRNGKey(0))

        def run(kv_dtype):
            eng = InferenceEngine(
                model, params,
                EngineConfig(
                    max_batch_size=2, max_seq_len=128, prefill_chunk=32,
                    cache=CacheConfig(
                        page_size=32, num_pages=16, max_pages_per_seq=4,
                        kv_dtype=kv_dtype, recent_window=0,
                    ),
                ),
                interpret=True,
            )
            rid = eng.submit(
                [3, 14, 15, 9, 2, 6, 53, 58], max_new_tokens=8
            )
            return eng.run()[rid]

        got = run("int4g32")
        ref = run("bfloat16")
        assert len(got) == 8
        # Ringless 4-bit generation on a random-weight model: require
        # agreement on the first steps (quantization error cannot flip
        # the very first argmaxes) rather than the full stream.
        assert got[0] == ref[0]
