"""Paged-prefill kernel: chunk attention over [paged history | chunk]
must match the gather-then-attend oracle for every payload dtype, offset
mix, and GQA grouping. Runs the explicit-DMA page pipeline in interpreter
mode (serial execution catches indexing/slot races)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.core.reference import reference_gqa_attention
from tpu_flash.ops.flash import paged_prefill_attention
from tpu_flash.ops.quant import dequantize, quantize_pages

F32_TOL = dict(atol=2e-5, rtol=2e-5)
BF16_TOL = dict(atol=1.5e-2, rtol=1.5e-2)


def _setup(key, batch, hkv, hq, q_len, hist_cap, d, page_size,
           kv_quant=None, dtype=jnp.float32):
    """Pages + tables + chunk tensors. Returns inputs plus a dense
    history view gathered exactly as the engine's gather path would."""
    pages_per_seq = hist_cap // page_size
    num_pages = batch * pages_per_seq + 1
    ks = jax.random.split(key, 5)
    k_pages = jax.random.normal(ks[0], (hkv, num_pages, page_size, d))
    v_pages = jax.random.normal(ks[1], (hkv, num_pages, page_size, d))
    perm = jax.random.permutation(ks[2], num_pages)
    tables = perm[: batch * pages_per_seq].reshape(
        batch, pages_per_seq
    ).astype(jnp.int32)
    q = jax.random.normal(ks[3], (batch, hq, q_len, d), dtype)
    ck = jax.random.normal(ks[4], (batch, hkv, q_len, d), dtype)
    cv = jax.random.normal(
        jax.random.fold_in(key, 9), (batch, hkv, q_len, d), dtype
    )
    if kv_quant:
        k_pages = quantize_pages(k_pages, kv_quant)
        v_pages = quantize_pages(v_pages, kv_quant)
        k_dense_pages = dequantize(k_pages).astype(dtype)
        v_dense_pages = dequantize(v_pages).astype(dtype)
    else:
        k_pages = k_pages.astype(dtype)
        v_pages = v_pages.astype(dtype)
        k_dense_pages = k_pages
        v_dense_pages = v_pages
    # [hkv, B, pps, ps, d] -> [B, hkv, hist_cap, d]
    kh = k_dense_pages[:, tables].transpose(1, 0, 2, 3, 4).reshape(
        batch, hkv, hist_cap, d
    )
    vh = v_dense_pages[:, tables].transpose(1, 0, 2, 3, 4).reshape(
        batch, hkv, hist_cap, d
    )
    return q, ck, cv, k_pages, v_pages, tables, kh, vh


def _oracle(q, ck, cv, kh, vh, offsets):
    rows = []
    for i in range(q.shape[0]):
        off = int(offsets[i])
        k_row = jnp.concatenate([kh[i : i + 1, :, :off], ck[i : i + 1]], 2)
        v_row = jnp.concatenate([vh[i : i + 1, :, :off], cv[i : i + 1]], 2)
        rows.append(
            reference_gqa_attention(
                q[i : i + 1].astype(jnp.float32),
                k_row.astype(jnp.float32),
                v_row.astype(jnp.float32),
                causal=True, q_offset=off,
            )
        )
    return jnp.concatenate(rows, axis=0)


class TestPagedPrefill:
    @pytest.mark.parametrize("offsets", [[256, 256], [0, 256], [64, 192]])
    def test_fp32_mixed_offsets(self, offsets):
        hist_cap, q_len, ps = 256, 64, 32
        q, ck, cv, kp, vp, tables, kh, vh = _setup(
            jax.random.PRNGKey(0), 2, 2, 2, q_len, hist_cap, 128, ps
        )
        offs = jnp.asarray(offsets, jnp.int32)
        out = paged_prefill_attention(
            q, ck, cv, kp, vp, offs, tables, hist_cap=hist_cap
        )
        ref = _oracle(q, ck, cv, kh, vh, offsets)
        np.testing.assert_allclose(out, ref.astype(out.dtype), **F32_TOL)

    @pytest.mark.parametrize("kv_quant", ["int8", "int4"])
    def test_quantized_pages(self, kv_quant):
        hist_cap, q_len, ps = 256, 64, 64
        q, ck, cv, kp, vp, tables, kh, vh = _setup(
            jax.random.PRNGKey(1), 2, 2, 4, q_len, hist_cap, 128, ps,
            kv_quant=kv_quant,
        )
        offsets = [256, 128]
        offs = jnp.asarray(offsets, jnp.int32)
        out = paged_prefill_attention(
            q, ck, cv, kp, vp, offs, tables, hist_cap=hist_cap
        )
        # Oracle on the dequantized pages: fused dequant must match
        # explicit dequantize-then-attend (same scheme, f32 chunk).
        ref = _oracle(q, ck, cv, kh, vh, offsets)
        np.testing.assert_allclose(
            out, ref.astype(out.dtype), atol=5e-4, rtol=5e-3
        )

    def test_bf16_gqa_multi_q_blocks(self):
        hist_cap, q_len, ps = 512, 256, 128
        q, ck, cv, kp, vp, tables, kh, vh = _setup(
            jax.random.PRNGKey(2), 2, 2, 8, q_len, hist_cap, 128, ps,
            dtype=jnp.bfloat16,
        )
        offsets = [512, 384]
        offs = jnp.asarray(offsets, jnp.int32)
        out = paged_prefill_attention(
            q, ck, cv, kp, vp, offs, tables, hist_cap=hist_cap,
            block_q=128,
        )
        ref = _oracle(q, ck, cv, kh, vh, offsets)
        np.testing.assert_allclose(
            out.astype(jnp.float32), np.asarray(ref), **BF16_TOL
        )

    def test_zero_history(self):
        """offs=0 rows read no pages; pure causal chunk attention."""
        hist_cap, q_len, ps = 128, 64, 32
        q, ck, cv, kp, vp, tables, kh, vh = _setup(
            jax.random.PRNGKey(3), 2, 2, 2, q_len, hist_cap, 128, ps
        )
        offs = jnp.asarray([0, 0], jnp.int32)
        out = paged_prefill_attention(
            q, ck, cv, kp, vp, offs, tables, hist_cap=hist_cap
        )
        ref = _oracle(q, ck, cv, kh, vh, [0, 0])
        np.testing.assert_allclose(out, ref.astype(out.dtype), **F32_TOL)

    def test_mid_page_offset_masked(self):
        """offs cutting mid-page must mask the page's tail (and garbage
        in later pages must not leak)."""
        hist_cap, q_len, ps = 256, 32, 64
        q, ck, cv, kp, vp, tables, kh, vh = _setup(
            jax.random.PRNGKey(4), 1, 1, 1, q_len, hist_cap, 128, ps
        )
        offs = jnp.asarray([100], jnp.int32)
        out = paged_prefill_attention(
            q, ck, cv, kp, vp, offs, tables, hist_cap=hist_cap
        )
        ref = _oracle(q, ck, cv, kh, vh, [100])
        np.testing.assert_allclose(out, ref.astype(out.dtype), **F32_TOL)


def _oracle_ws(q, ck, cv, kh, vh, offsets, window=None, softcap=None):
    rows = []
    for i in range(q.shape[0]):
        off = int(offsets[i])
        k_row = jnp.concatenate([kh[i : i + 1, :, :off], ck[i : i + 1]], 2)
        v_row = jnp.concatenate([vh[i : i + 1, :, :off], cv[i : i + 1]], 2)
        rows.append(
            reference_gqa_attention(
                q[i : i + 1].astype(jnp.float32),
                k_row.astype(jnp.float32),
                v_row.astype(jnp.float32),
                causal=True, q_offset=off, window=window, softcap=softcap,
            )
        )
    return jnp.concatenate(rows, axis=0)


class TestPagedPrefillWindowSoftcap:
    @pytest.mark.parametrize("window", [1, 30, 100, 400])
    def test_window_mixed_offsets(self, window):
        q, ck, cv, kp, vp, tables, kh, vh = _setup(
            jax.random.PRNGKey(21), 3, 2, 4, 64, 256, 64, 64
        )
        offs = jnp.asarray([256, 128, 0], jnp.int32)
        out = paged_prefill_attention(
            q, ck, cv, kp, vp, offs, tables, hist_cap=256, window=window
        )
        ref = _oracle_ws(q, ck, cv, kh, vh, offs, window=window)
        np.testing.assert_allclose(out, ref, **F32_TOL)

    @pytest.mark.parametrize("kv_quant", ["int8", "int4"])
    def test_window_quantized_pages(self, kv_quant):
        q, ck, cv, kp, vp, tables, kh, vh = _setup(
            jax.random.PRNGKey(22), 2, 2, 4, 64, 256, 64, 64,
            kv_quant=kv_quant,
        )
        offs = jnp.asarray([256, 192], jnp.int32)
        out = paged_prefill_attention(
            q, ck, cv, kp, vp, offs, tables, hist_cap=256, window=90
        )
        # Oracle over the SAME dequantized values: only fp error remains.
        ref = _oracle_ws(q, ck, cv, kh, vh, offs, window=90)
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)

    def test_window_multi_q_blocks(self):
        q, ck, cv, kp, vp, tables, kh, vh = _setup(
            jax.random.PRNGKey(23), 2, 2, 4, 128, 256, 64, 64,
            dtype=jnp.bfloat16,
        )
        offs = jnp.asarray([256, 64], jnp.int32)
        out = paged_prefill_attention(
            q, ck, cv, kp, vp, offs, tables, hist_cap=256, block_q=32,
            window=70,
        )
        ref = _oracle_ws(q, ck, cv, kh, vh, offs, window=70)
        np.testing.assert_allclose(
            out.astype(jnp.float32), ref.astype(jnp.float32), **BF16_TOL
        )

    def test_softcap(self):
        q, ck, cv, kp, vp, tables, kh, vh = _setup(
            jax.random.PRNGKey(24), 2, 2, 2, 64, 256, 64, 64
        )
        offs = jnp.asarray([256, 100], jnp.int32)
        out = paged_prefill_attention(
            q, ck, cv, kp, vp, offs, tables, hist_cap=256, softcap=20.0
        )
        ref = _oracle_ws(q, ck, cv, kh, vh, offs, softcap=20.0)
        np.testing.assert_allclose(out, ref, **F32_TOL)

    @pytest.mark.parametrize("window", [16, 48, 130])
    def test_window_aware_walk_stress(self, window):
        """Stresses the window-aware DMA walk: per-group first/next-cell
        bookkeeping with windows below one page block, deep chunk blocks
        that see no history at all, zero-history rows, and mid-page
        offsets (groups with disjoint block windows share the
        double-buffer slot parity chain)."""
        q, ck, cv, kp, vp, tables, kh, vh = _setup(
            jax.random.PRNGKey(26), 4, 2, 4, 192, 512, 64, 32
        )
        offs = jnp.asarray([512, 37, 0, 480], jnp.int32)
        out = paged_prefill_attention(
            q, ck, cv, kp, vp, offs, tables, hist_cap=512, block_q=64,
            window=window,
        )
        ref = _oracle_ws(q, ck, cv, kh, vh, offs, window=window)
        np.testing.assert_allclose(out, ref, **F32_TOL)

    def test_window_and_softcap(self):
        q, ck, cv, kp, vp, tables, kh, vh = _setup(
            jax.random.PRNGKey(25), 2, 2, 4, 64, 256, 64, 64
        )
        offs = jnp.asarray([200, 64], jnp.int32)
        out = paged_prefill_attention(
            q, ck, cv, kp, vp, offs, tables, hist_cap=256, window=80,
            softcap=12.0,
        )
        ref = _oracle_ws(q, ck, cv, kh, vh, offs, window=80, softcap=12.0)
        np.testing.assert_allclose(out, ref, **F32_TOL)
