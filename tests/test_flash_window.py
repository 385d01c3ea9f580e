"""Parity tests: sliding-window attention + logit softcapping.

Differential testing of the ``window`` (Mistral-style sliding window) and
``softcap`` (Gemma-2-style tanh logit capping) kernel options against the jnp
exact oracle, forward and backward, on both the rectangular and triangular
grids — the SURVEY.md §4 test strategy applied to the local-attention band
mask (the tile-level causal early-out of the reference, utils.cuh:36-45,
generalized to a two-sided band).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.core.config import BlockSizes
from tpu_flash.core.reference import (
    reference_attention,
    reference_gqa_attention,
)
from tpu_flash.ops.flash import flash_attention

F32_TOL = dict(atol=2e-5, rtol=2e-5)
GRAD_TOL = dict(atol=2e-4, rtol=2e-4)

SMALL_BLOCKS = BlockSizes(
    block_q=64, block_kv_major=64, block_kv=64,
    block_q_dkv=64, block_kv_dkv=64, block_q_dq=64, block_kv_dq=64,
)
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


class TestWindowForward:
    @pytest.mark.parametrize("blocks", [SMALL_BLOCKS, SMALL_TRI],
                             ids=["rect", "tri"])
    @pytest.mark.parametrize("window", [1, 7, 64, 100, 255])
    def test_window_parity(self, window, blocks):
        q, k, v = _qkv(jax.random.PRNGKey(0), 1, 2, 2, 256, 256, 64)
        out = flash_attention(
            q, k, v, causal=True, window=window, block_sizes=blocks
        )
        ref = reference_attention(q, k, v, causal=True, window=window)
        np.testing.assert_allclose(out, ref, **F32_TOL)

    @pytest.mark.parametrize("blocks", [SMALL_BLOCKS, SMALL_TRI],
                             ids=["rect", "tri"])
    def test_window_gqa(self, blocks):
        q, k, v = _qkv(jax.random.PRNGKey(1), 2, 4, 2, 192, 192, 64)
        out = flash_attention(
            q, k, v, causal=True, window=70, block_sizes=blocks
        )
        ref = reference_gqa_attention(q, k, v, causal=True, window=70)
        np.testing.assert_allclose(out, ref, **F32_TOL)

    @pytest.mark.parametrize("blocks", [SMALL_BLOCKS, SMALL_TRI],
                             ids=["rect", "tri"])
    def test_window_chunked_prefill_q_offset(self, blocks):
        """A later chunk of a long sequence: the window reaches back into
        history KV that precedes the chunk (q_offset > 0)."""
        hist, chunk, w = 256, 128, 150
        q, k, v = _qkv(
            jax.random.PRNGKey(2), 1, 2, 2, chunk, hist + chunk, 64
        )
        out = flash_attention(
            q, k, v, causal=True, window=w, q_offset=hist,
            block_sizes=blocks,
        )
        ref = reference_attention(
            q, k, v, causal=True, window=w, q_offset=hist
        )
        np.testing.assert_allclose(out, ref, **F32_TOL)

    def test_window_unaligned_seq_padded(self):
        """seq not a block multiple: padding tail interacts with the band."""
        q, k, v = _qkv(jax.random.PRNGKey(3), 1, 2, 2, 200, 200, 72)
        out = flash_attention(q, k, v, causal=True, window=90)
        ref = reference_attention(q, k, v, causal=True, window=90)
        np.testing.assert_allclose(out, ref, **F32_TOL)

    def test_window_covering_everything_is_causal(self):
        q, k, v = _qkv(jax.random.PRNGKey(4), 1, 1, 1, 128, 128, 64)
        out = flash_attention(q, k, v, causal=True, window=128)
        ref = flash_attention(q, k, v, causal=True)
        np.testing.assert_allclose(out, ref, atol=1e-6, rtol=1e-6)

    def test_window_one_attends_self_only(self):
        q, k, v = _qkv(jax.random.PRNGKey(5), 1, 1, 1, 128, 128, 64)
        out = flash_attention(q, k, v, causal=True, window=1)
        np.testing.assert_allclose(out, v, atol=1e-5, rtol=1e-5)

    def test_window_requires_causal(self):
        q, k, v = _qkv(jax.random.PRNGKey(6), 1, 1, 1, 128, 128, 64)
        with pytest.raises(ValueError, match="causal"):
            flash_attention(q, k, v, causal=False, window=32)
        with pytest.raises(ValueError, match="window"):
            flash_attention(q, k, v, causal=True, window=0)

    def test_window_bf16(self):
        q, k, v = _qkv(
            jax.random.PRNGKey(7), 1, 2, 2, 256, 256, 128, jnp.bfloat16
        )
        out = flash_attention(q, k, v, causal=True, window=100)
        ref = reference_attention(q, k, v, causal=True, window=100)
        np.testing.assert_allclose(
            out.astype(jnp.float32), ref.astype(jnp.float32),
            atol=2e-2, rtol=2e-2,
        )

    def test_window_with_residuals(self):
        """lse under a window must match the oracle's banded logsumexp."""
        q, k, v = _qkv(jax.random.PRNGKey(8), 1, 1, 1, 128, 128, 64)
        w = 40
        _, lse = flash_attention(
            q, k, v, causal=True, window=w, save_residuals=True
        )
        scale = 64**-0.5
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        qpos = jnp.arange(128)[:, None]
        kpos = jnp.arange(128)[None, :]
        mask = (kpos <= qpos) & (kpos > qpos - w)
        s = jnp.where(mask[None, None], s, -jnp.inf)
        expected = jax.scipy.special.logsumexp(s, axis=-1)
        np.testing.assert_allclose(lse, expected, atol=1e-4, rtol=1e-4)


class TestSoftcap:
    @pytest.mark.parametrize("causal", [False, True])
    def test_softcap_parity(self, causal):
        q, k, v = _qkv(jax.random.PRNGKey(10), 1, 2, 2, 192, 192, 64)
        out = flash_attention(q, k, v, causal=causal, softcap=30.0)
        ref = reference_attention(q, k, v, causal=causal, softcap=30.0)
        np.testing.assert_allclose(out, ref, **F32_TOL)

    def test_softcap_tri_matches_rect(self):
        q, k, v = _qkv(jax.random.PRNGKey(11), 1, 2, 2, 256, 256, 64)
        o_rect = flash_attention(
            q, k, v, causal=True, softcap=20.0, block_sizes=SMALL_BLOCKS
        )
        o_tri = flash_attention(
            q, k, v, causal=True, softcap=20.0, block_sizes=SMALL_TRI
        )
        np.testing.assert_allclose(o_rect, o_tri, atol=1e-6, rtol=1e-6)

    def test_softcap_with_window(self):
        q, k, v = _qkv(jax.random.PRNGKey(12), 1, 2, 2, 256, 256, 64)
        out = flash_attention(
            q, k, v, causal=True, window=100, softcap=15.0
        )
        ref = reference_attention(
            q, k, v, causal=True, window=100, softcap=15.0
        )
        np.testing.assert_allclose(out, ref, **F32_TOL)

    def test_softcap_caps_extreme_scores(self):
        """Scores far beyond the cap saturate: output ≈ uniform-weighted V
        over positions with equal (capped) scores."""
        q, k, v = _qkv(jax.random.PRNGKey(13), 1, 1, 1, 128, 128, 64)
        out = flash_attention(q * 100.0, k, v, causal=False, softcap=5.0)
        ref = reference_attention(q * 100.0, k, v, causal=False, softcap=5.0)
        np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)

    def test_softcap_validation(self):
        q, k, v = _qkv(jax.random.PRNGKey(14), 1, 1, 1, 128, 128, 64)
        with pytest.raises(ValueError, match="softcap"):
            flash_attention(q, k, v, softcap=0.0)


class TestWindowSoftcapBackward:
    def _grad_check(self, window=None, softcap=None, blocks=None, seq=192,
                    hq=2, hkv=2, q_offset=0):
        q, k, v = _qkv(
            jax.random.PRNGKey(20), 1, hq, hkv, seq, seq + q_offset, 64
        )

        def loss_kernel(q, k, v):
            o = flash_attention(
                q, k, v, causal=True, window=window, softcap=softcap,
                q_offset=q_offset, block_sizes=blocks,
            )
            return jnp.sum(o * o)

        def loss_ref(q, k, v):
            o = reference_gqa_attention(
                q, k, v, causal=True, window=window, softcap=softcap,
                q_offset=q_offset,
            )
            return jnp.sum(o * o)

        g_kernel = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for gk, gr, name in zip(g_kernel, g_ref, "qkv"):
            np.testing.assert_allclose(
                gk, gr, err_msg=f"d{name}", **GRAD_TOL
            )

    @pytest.mark.parametrize("blocks", [SMALL_BLOCKS, SMALL_TRI],
                             ids=["rect", "tri"])
    def test_window_grads(self, blocks):
        self._grad_check(window=70, blocks=blocks)

    def test_window_smaller_than_block_grads(self):
        self._grad_check(window=10, blocks=SMALL_BLOCKS)

    def test_window_chunked_grads(self):
        self._grad_check(window=100, q_offset=128, blocks=SMALL_TRI)

    def test_softcap_grads(self):
        self._grad_check(softcap=20.0, blocks=SMALL_BLOCKS)

    def test_window_softcap_gqa_grads(self):
        self._grad_check(window=80, softcap=25.0, hq=4, hkv=2,
                         blocks=SMALL_TRI)
