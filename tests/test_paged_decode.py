"""Paged GQA decode kernel: parity vs dense oracle, quantized KV paths.

Exercises the explicit-DMA double-buffered page pipeline (the framework's
``cuda::pipeline`` analogue) in interpreter mode, which executes the kernel
serially and catches indexing/slot races (SURVEY.md §5, race detection).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.core.reference import (
    gather_pages_to_dense,
    reference_decode_attention,
)
from tpu_flash.ops.decode import paged_attention
from tpu_flash.ops.quant import QuantizedTensor, dequantize, quantize_pages


def _make_paged_cache(key, num_kv_heads, num_pages, page_size, head_dim,
                      batch, pages_per_seq, lengths):
    """Random pages + a valid page table (each sequence gets distinct
    pages, shuffled to be non-contiguous)."""
    kk, kv, kp = jax.random.split(key, 3)
    k_pages = jax.random.normal(
        kk, (num_kv_heads, num_pages, page_size, head_dim)
    )
    v_pages = jax.random.normal(
        kv, (num_kv_heads, num_pages, page_size, head_dim)
    )
    perm = jax.random.permutation(kp, num_pages)
    needed = batch * pages_per_seq
    assert needed <= num_pages
    page_indices = perm[:needed].reshape(batch, pages_per_seq).astype(jnp.int32)
    return k_pages, v_pages, page_indices


class TestPagedDecode:
    @pytest.mark.parametrize("q_per_kv", [1, 4])
    def test_parity_vs_dense_oracle(self, q_per_kv):
        batch, hkv, d, ps, pps = 3, 2, 128, 128, 4
        hq = hkv * q_per_kv
        key = jax.random.PRNGKey(0)
        kq, kc = jax.random.split(key)
        lengths = jnp.array([512, 200, 1], dtype=jnp.int32)
        k_pages, v_pages, page_indices = _make_paged_cache(
            kc, hkv, 64, ps, d, batch, pps, lengths
        )
        q = jax.random.normal(kq, (batch, hq, d))

        out = paged_attention(
            q, k_pages, v_pages, lengths, page_indices,
            pages_per_compute_block=2,
        )
        k_dense = gather_pages_to_dense(k_pages, page_indices)
        v_dense = gather_pages_to_dense(v_pages, page_indices)
        ref = reference_decode_attention(q, k_dense, v_dense, lengths)
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)

    def test_bf16_pages_parity(self):
        """bf16 KV pages take the MXU-native path (no f32 convert); output
        must match the oracle computed on the SAME bf16-stored values at
        bf16-class tolerance (error comes from bf16 q/p rounding only)."""
        batch, hkv, d, ps, pps = 3, 2, 128, 128, 4
        key = jax.random.PRNGKey(3)
        kq, kc = jax.random.split(key)
        lengths = jnp.array([512, 200, 1], dtype=jnp.int32)
        k_pages, v_pages, page_indices = _make_paged_cache(
            kc, hkv, 64, ps, d, batch, pps, lengths
        )
        k_bf = k_pages.astype(jnp.bfloat16)
        v_bf = v_pages.astype(jnp.bfloat16)
        q = jax.random.normal(kq, (batch, 2 * hkv, d))

        out = paged_attention(
            q, k_bf, v_bf, lengths, page_indices,
            pages_per_compute_block=2,
        )
        k_dense = gather_pages_to_dense(
            k_bf.astype(jnp.float32), page_indices
        )
        v_dense = gather_pages_to_dense(
            v_bf.astype(jnp.float32), page_indices
        )
        ref = reference_decode_attention(q, k_dense, v_dense, lengths)
        np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)

    def test_fp8_native_mxu_tier_close_to_exact(self):
        """The v6e-native fp8 tier (e4m3 operands straight into the MXU,
        rank-1 renormalized q/P rows) must stay within fp8-class error of
        the exact f32-dequant tier. Forced on here (the capability probe
        says off for CPU/v5e) so the path is CI-covered before v6e
        hardware is available (VERDICT r1 item 10)."""
        batch, hkv, d, ps, pps = 2, 2, 128, 128, 4
        key = jax.random.PRNGKey(13)
        kq, kc = jax.random.split(key)
        lengths = jnp.array([512, 170], dtype=jnp.int32)
        k_pages, v_pages, page_indices = _make_paged_cache(
            kc, hkv, 32, ps, d, batch, pps, lengths
        )
        kq8 = quantize_pages(k_pages, "fp8")
        vq8 = quantize_pages(v_pages, "fp8")
        q = jax.random.normal(kq, (batch, 4 * hkv, d))
        exact = paged_attention(
            q, kq8, vq8, lengths, page_indices, pages_per_compute_block=2,
            fp8_native=False,
        )
        native = paged_attention(
            q, kq8, vq8, lengths, page_indices, pages_per_compute_block=2,
            fp8_native=True,
        )
        # q/P rows re-rounded to e4m3 (~2^-4 relative) on top of the
        # shared KV quantization error.
        np.testing.assert_allclose(
            np.asarray(native), np.asarray(exact), atol=8e-2, rtol=8e-2
        )

    def test_int4_bitwise_unpack_matches_i32_unpack(self):
        """The bitwise nibble path (i8 AND/XOR planes, bias/x16 folded
        into matmul corrections and scales) must agree with the classic
        i32 unpack path within the PV P-quantization split's rounding
        (K scores are bitwise-identical by construction; only the
        per-half P scales differ)."""
        batch, hkv, d, ps, pps = 2, 2, 128, 128, 4
        key = jax.random.PRNGKey(11)
        kq, kc = jax.random.split(key)
        lengths = jnp.array([512, 170], dtype=jnp.int32)
        k_pages, v_pages, page_indices = _make_paged_cache(
            kc, hkv, 32, ps, d, batch, pps, lengths
        )
        kq4 = quantize_pages(k_pages, "int4")
        vq4 = quantize_pages(v_pages, "int4")
        q = jax.random.normal(kq, (batch, 4 * hkv, d))
        old = paged_attention(
            q, kq4, vq4, lengths, page_indices, pages_per_compute_block=2,
            int4_bitwise_unpack=False,
        )
        new = paged_attention(
            q, kq4, vq4, lengths, page_indices, pages_per_compute_block=2,
            int4_bitwise_unpack=True,
        )
        np.testing.assert_allclose(
            np.asarray(new), np.asarray(old), atol=3e-2, rtol=3e-2
        )

    @pytest.mark.parametrize("slots", [3, 4])
    @pytest.mark.parametrize("quant", [None, "int8", "int4"])
    def test_pipeline_slots_exact_vs_double_buffer(self, slots, quant):
        """Deeper page pipelines (pipeline_slots > 2) rotate through more
        VMEM buffers with a longer DMA lookahead; results must be bitwise
        identical to the 2-slot double buffer — interpret mode executes the
        walk serially, so any slot/lookahead indexing bug shows up as a
        wrong tile, not a race."""
        batch, hkv, d, ps, pps = 3, 2, 128, 128, 4
        key = jax.random.PRNGKey(7)
        kq, kc = jax.random.split(key)
        # Ragged lengths so the active-cell walk skips blocks (the slot
        # rotation is driven by active-cell count, not grid position).
        lengths = jnp.array([512, 130, 1], dtype=jnp.int32)
        k_pages, v_pages, page_indices = _make_paged_cache(
            kc, hkv, 64, ps, d, batch, pps, lengths
        )
        if quant is not None:
            k_pages = quantize_pages(k_pages, quant)
            v_pages = quantize_pages(v_pages, quant)
        q = jax.random.normal(kq, (batch, 2 * hkv, d))

        base = paged_attention(
            q, k_pages, v_pages, lengths, page_indices,
            pages_per_compute_block=2, pipeline_slots=2,
        )
        out = paged_attention(
            q, k_pages, v_pages, lengths, page_indices,
            pages_per_compute_block=2, pipeline_slots=slots,
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(base))

    def test_partial_last_block_masked(self):
        # length cuts mid-page and mid-block.
        batch, hkv, d, ps, pps = 1, 1, 128, 128, 4
        key = jax.random.PRNGKey(1)
        kq, kc = jax.random.split(key)
        lengths = jnp.array([3 * 128 + 37], dtype=jnp.int32)
        k_pages, v_pages, page_indices = _make_paged_cache(
            kc, hkv, 16, ps, d, batch, pps, lengths
        )
        q = jax.random.normal(kq, (batch, 2, d))
        out = paged_attention(
            q, k_pages, v_pages, lengths, page_indices,
            pages_per_compute_block=2,
        )
        k_dense = gather_pages_to_dense(k_pages, page_indices)
        v_dense = gather_pages_to_dense(v_pages, page_indices)
        ref = reference_decode_attention(q, k_dense, v_dense, lengths)
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)

    @pytest.mark.parametrize("quant", ["int8", "int4", "fp8"])
    def test_quantized_kv_parity(self, quant):
        batch, hkv, d, ps, pps = 2, 2, 128, 128, 2
        key = jax.random.PRNGKey(2)
        kq, kc = jax.random.split(key)
        lengths = jnp.array([256, 130], dtype=jnp.int32)
        k_pages, v_pages, page_indices = _make_paged_cache(
            kc, hkv, 32, ps, d, batch, pps, lengths
        )
        q = jax.random.normal(kq, (batch, 4, d))

        k_qt = quantize_pages(k_pages, quant)
        v_qt = quantize_pages(v_pages, quant)
        out = paged_attention(
            q, k_qt, v_qt, lengths, page_indices, pages_per_compute_block=2,
            int8_mxu=False,  # the exact-dequant tier; MXU tier below
        )
        # Oracle on the *dequantized* cache: the kernel's fused dequant must
        # match explicit dequantization exactly (same scheme).
        k_dense = gather_pages_to_dense(dequantize(k_qt), page_indices)
        v_dense = gather_pages_to_dense(dequantize(v_qt), page_indices)
        ref = reference_decode_attention(q, k_dense, v_dense, lengths)
        np.testing.assert_allclose(out, ref, atol=5e-4, rtol=5e-3)

    @pytest.mark.parametrize("quant", ["int8", "int4"])
    def test_quantized_kv_close_to_fp(self, quant):
        # End-to-end quantization error vs the fp cache stays within the
        # scheme's expected delta (BASELINE config 3 contract).
        batch, hkv, d, ps, pps = 1, 1, 128, 128, 2
        key = jax.random.PRNGKey(3)
        kq, kc = jax.random.split(key)
        lengths = jnp.array([256], dtype=jnp.int32)
        k_pages, v_pages, page_indices = _make_paged_cache(
            kc, hkv, 8, ps, d, batch, pps, lengths
        )
        q = jax.random.normal(kq, (batch, 1, d))
        out_q = paged_attention(
            q, quantize_pages(k_pages, quant), quantize_pages(v_pages, quant),
            lengths, page_indices, pages_per_compute_block=2,
        )
        out_fp = paged_attention(
            q, k_pages, v_pages, lengths, page_indices,
            pages_per_compute_block=2,
        )
        # Default path = int8 MXU: KV quant error + ~0.4% q/P rounding.
        tol = 0.03 if quant == "int8" else 0.15
        assert float(jnp.max(jnp.abs(out_q - out_fp))) <= tol

    @pytest.mark.parametrize("quant", ["int8", "int4"])
    def test_int8_mxu_close_to_exact_dequant(self, quant):
        """The int8-MXU fast path (default) stays within q/P-rounding
        distance of the exact fused-dequant path on the same pages."""
        batch, hkv, d, ps, pps = 2, 2, 128, 128, 2
        key = jax.random.PRNGKey(6)
        kq, kc = jax.random.split(key)
        lengths = jnp.array([256, 130], dtype=jnp.int32)
        k_pages, v_pages, page_indices = _make_paged_cache(
            kc, hkv, 32, ps, d, batch, pps, lengths
        )
        q = jax.random.normal(kq, (batch, 4, d))
        kq_, vq_ = quantize_pages(k_pages, quant), quantize_pages(
            v_pages, quant
        )
        out_mxu = paged_attention(
            q, kq_, vq_, lengths, page_indices, pages_per_compute_block=2
        )
        out_exact = paged_attention(
            q, kq_, vq_, lengths, page_indices, pages_per_compute_block=2,
            int8_mxu=False,
        )
        assert float(jnp.max(jnp.abs(out_mxu - out_exact))) <= 3e-2

    def test_single_page_sequences(self):
        batch, hkv, d, ps = 2, 1, 128, 128
        key = jax.random.PRNGKey(4)
        kq, kc = jax.random.split(key)
        lengths = jnp.array([5, 128], dtype=jnp.int32)
        k_pages, v_pages, page_indices = _make_paged_cache(
            kc, hkv, 8, ps, d, batch, 1, lengths
        )
        q = jax.random.normal(kq, (batch, 1, d))
        out = paged_attention(q, k_pages, v_pages, lengths, page_indices)
        k_dense = gather_pages_to_dense(k_pages, page_indices)
        v_dense = gather_pages_to_dense(v_pages, page_indices)
        ref = reference_decode_attention(q, k_dense, v_dense, lengths)
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


class TestPagedDecodeWindow:
    """Sliding-window decode: in-window parity + below-window block skip."""

    def _run(self, window, lengths, softcap=None, quant=None, ppb=1,
             int8_mxu=True, q_per_kv=2):
        batch = len(lengths)
        hkv, d, ps, pps = 2, 128, 128, 4
        key = jax.random.PRNGKey(42)
        kq, kc = jax.random.split(key)
        lengths = jnp.asarray(lengths, jnp.int32)
        k_pages, v_pages, page_indices = _make_paged_cache(
            kc, hkv, 64, ps, d, batch, pps, lengths
        )
        q = jax.random.normal(kq, (batch, hkv * q_per_kv, d))
        if quant:
            kq_pages = quantize_pages(k_pages, quant)
            vq_pages = quantize_pages(v_pages, quant)
            out = paged_attention(
                q, kq_pages, vq_pages, lengths, page_indices,
                pages_per_compute_block=ppb, window=window, softcap=softcap,
                int8_mxu=int8_mxu,
            )
            k_dense = dequantize(
                QuantizedTensor(
                    kq_pages.values[:, page_indices], 
                    kq_pages.scales[:, page_indices],
                    quant, kq_pages.packing,
                ),
                jnp.float32,
            )
            hkv_, b_, pp_, ps_, d_ = k_dense.shape
            k_dense = k_dense.reshape(hkv_, b_, pp_ * ps_, d_).transpose(
                1, 0, 2, 3
            )
            v_dense = dequantize(
                QuantizedTensor(
                    vq_pages.values[:, page_indices],
                    vq_pages.scales[:, page_indices],
                    quant, vq_pages.packing,
                ),
                jnp.float32,
            )
            v_dense = v_dense.reshape(hkv_, b_, pp_ * ps_, d_).transpose(
                1, 0, 2, 3
            )
            tol = dict(atol=5e-2, rtol=5e-2)
        else:
            out = paged_attention(
                q, k_pages, v_pages, lengths, page_indices,
                pages_per_compute_block=ppb, window=window, softcap=softcap,
            )
            k_dense = gather_pages_to_dense(k_pages, page_indices)
            v_dense = gather_pages_to_dense(v_pages, page_indices)
            tol = dict(atol=2e-5, rtol=2e-5)
        ref = reference_decode_attention(
            q, k_dense, v_dense, lengths, window=window, softcap=softcap
        )
        np.testing.assert_allclose(out, ref, **tol)

    def test_window_within_one_block(self):
        self._run(window=50, lengths=[512, 200, 130])

    def test_window_spanning_blocks(self):
        self._run(window=300, lengths=[512, 400, 1])

    def test_window_exceeds_length(self):
        self._run(window=4096, lengths=[512, 3, 128])

    def test_window_at_block_boundary(self):
        # length 512, bk=128, window=128: first block = (512-128)//128 = 3
        self._run(window=128, lengths=[512, 256, 384])

    def test_window_multi_page_blocks(self):
        self._run(window=300, lengths=[512, 257, 100], ppb=2)

    def test_window_quantized_int8(self):
        self._run(window=200, lengths=[512, 300, 90], quant="int8")

    def test_window_quantized_int4(self):
        self._run(window=200, lengths=[512, 300, 90], quant="int4")

    def test_softcap_decode(self):
        self._run(window=None, lengths=[512, 200, 1], softcap=30.0)

    def test_window_and_softcap(self):
        self._run(window=150, lengths=[512, 300, 60], softcap=25.0)

    def test_window_validation(self):
        q = jnp.zeros((1, 2, 128))
        kp = jnp.zeros((2, 4, 128, 128))
        lengths = jnp.array([1], jnp.int32)
        pidx = jnp.zeros((1, 4), jnp.int32)
        with pytest.raises(ValueError, match="window"):
            paged_attention(q, kp, kp, lengths, pidx, window=0)
