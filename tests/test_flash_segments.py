"""Parity tests: packed-sequence (segment-ids) attention.

Multiple documents packed into one row must not attend across document
boundaries — the segment-equality mask composes with causal, sliding
window, and softcap, forward and backward, on both the rectangular and
triangular grids. The per-document outputs must equal attention run on
each document alone (the strongest form of the isolation contract).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.core.config import BlockSizes
from tpu_flash.core.reference import reference_attention
from tpu_flash.ops.flash import SegmentIds, flash_attention

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


def _random_segments(key, b, s, p=0.03):
    """Random document boundaries: ids are a cumsum of boundary coins."""
    coins = jax.random.bernoulli(key, p, (b, s)).astype(jnp.int32)
    return jnp.cumsum(coins, axis=1)


class TestSegmentForward:
    @pytest.mark.parametrize("causal", [False, True])
    @pytest.mark.parametrize("blocks", [SMALL_BLOCKS, SMALL_TRI],
                             ids=["rect", "tri"])
    def test_parity_vs_oracle(self, causal, blocks):
        if blocks.triangular and not causal:
            pytest.skip("triangular grid is causal-only")
        q, k, v = _qkv(jax.random.PRNGKey(0), 2, 2, 2, 256, 256, 64)
        seg = _random_segments(jax.random.PRNGKey(1), 2, 256)
        out = flash_attention(
            q, k, v, causal=causal, segment_ids=SegmentIds(seg, seg),
            block_sizes=blocks,
        )
        ref = reference_attention(
            q, k, v, causal=causal, q_segment_ids=seg, kv_segment_ids=seg
        )
        np.testing.assert_allclose(out, ref, **F32_TOL)

    def test_documents_fully_isolated(self):
        """Packing two documents must give bit-for-bit the same math as
        attending each document alone (up to fp addition order)."""
        d1, d2 = 100, 156
        q, k, v = _qkv(jax.random.PRNGKey(2), 1, 2, 2, d1 + d2, d1 + d2, 64)
        seg = jnp.concatenate(
            [jnp.zeros((1, d1), jnp.int32), jnp.ones((1, d2), jnp.int32)], 1
        )
        packed = flash_attention(
            q, k, v, causal=True, segment_ids=SegmentIds(seg, seg)
        )
        alone1 = flash_attention(
            q[:, :, :d1], k[:, :, :d1], v[:, :, :d1], causal=True
        )
        alone2 = flash_attention(
            q[:, :, d1:], k[:, :, d1:], v[:, :, d1:], causal=True
        )
        np.testing.assert_allclose(packed[:, :, :d1], alone1, atol=1e-5,
                                   rtol=1e-5)
        np.testing.assert_allclose(packed[:, :, d1:], alone2, atol=1e-5,
                                   rtol=1e-5)

    def test_gqa_unaligned_padded(self):
        """Padding sentinels (-1 q / -2 kv) must keep pad columns masked."""
        q, k, v = _qkv(jax.random.PRNGKey(3), 1, 4, 2, 200, 200, 72)
        seg = _random_segments(jax.random.PRNGKey(4), 1, 200)
        out = flash_attention(
            q, k, v, causal=True, segment_ids=SegmentIds(seg, seg)
        )
        rep = jnp.repeat
        ref = reference_attention(
            rep(q, 1, 1), rep(k, 2, 1), rep(v, 2, 1), causal=True,
            q_segment_ids=seg, kv_segment_ids=seg,
        )
        np.testing.assert_allclose(out, ref, **F32_TOL)

    def test_segments_with_window_and_softcap(self):
        q, k, v = _qkv(jax.random.PRNGKey(5), 1, 2, 2, 256, 256, 64)
        seg = _random_segments(jax.random.PRNGKey(6), 1, 256)
        out = flash_attention(
            q, k, v, causal=True, window=90, softcap=20.0,
            segment_ids=SegmentIds(seg, seg),
        )
        ref = reference_attention(
            q, k, v, causal=True, window=90, softcap=20.0,
            q_segment_ids=seg, kv_segment_ids=seg,
        )
        np.testing.assert_allclose(out, ref, **F32_TOL)

    def test_residuals_lse_masked(self):
        q, k, v = _qkv(jax.random.PRNGKey(7), 1, 1, 1, 128, 128, 64)
        seg = jnp.concatenate(
            [jnp.zeros((1, 64), jnp.int32), jnp.ones((1, 64), jnp.int32)], 1
        )
        _, lse = flash_attention(
            q, k, v, causal=True, segment_ids=SegmentIds(seg, seg),
            save_residuals=True,
        )
        scale = 64**-0.5
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        pos = jnp.arange(128)
        mask = (pos[None, :] <= pos[:, None]) & (
            seg[0][None, :] == seg[0][:, None]
        )
        s = jnp.where(mask[None, None], s, -jnp.inf)
        expected = jax.scipy.special.logsumexp(s, axis=-1)
        np.testing.assert_allclose(lse, expected, atol=1e-4, rtol=1e-4)

    def test_validation(self):
        q, k, v = _qkv(jax.random.PRNGKey(8), 1, 1, 1, 128, 128, 64)
        bad = jnp.zeros((1, 64), jnp.int32)
        with pytest.raises(ValueError, match="segment ids"):
            flash_attention(q, k, v, segment_ids=SegmentIds(bad, bad))


class TestSegmentBackward:
    def _grad_check(self, causal, blocks, window=None, softcap=None,
                    hq=2, hkv=2):
        q, k, v = _qkv(jax.random.PRNGKey(10), 1, hq, hkv, 192, 192, 64)
        seg = _random_segments(jax.random.PRNGKey(11), 1, 192)
        sid = SegmentIds(seg, seg)
        rep = hq // hkv

        def loss_kernel(q, k, v):
            o = flash_attention(
                q, k, v, causal=causal, segment_ids=sid, window=window,
                softcap=softcap, block_sizes=blocks,
            )
            return jnp.sum(o * o)

        def loss_ref(q, k, v):
            o = reference_attention(
                q, jnp.repeat(k, rep, 1), jnp.repeat(v, rep, 1),
                causal=causal, q_segment_ids=seg, kv_segment_ids=seg,
                window=window, softcap=softcap,
            )
            return jnp.sum(o * o)

        gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
        def ref_with_gqa(q, k, v):
            return loss_ref(q, k, v)
        gr = jax.grad(ref_with_gqa, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gk, gr, "qkv"):
            np.testing.assert_allclose(a, b, err_msg=f"d{name}", **GRAD_TOL)

    @pytest.mark.parametrize("blocks", [SMALL_BLOCKS, SMALL_TRI],
                             ids=["rect", "tri"])
    def test_causal_grads(self, blocks):
        self._grad_check(causal=True, blocks=blocks)

    def test_noncausal_grads(self):
        self._grad_check(causal=False, blocks=SMALL_BLOCKS)

    def test_gqa_window_softcap_grads(self):
        self._grad_check(causal=True, blocks=SMALL_TRI, window=100,
                         softcap=15.0, hq=4, hkv=2)


class TestPackedModel:
    def test_packed_forward_equals_separate(self):
        """model.forward on a packed row [doc A | doc B] must produce the
        same logits as forwarding each document alone (rope restarts and
        the segment mask isolate them completely)."""
        from tpu_flash.models import TINY_TEST, FlashTransformer

        model = FlashTransformer(TINY_TEST)
        params = model.init(jax.random.PRNGKey(0))
        a = [3, 14, 15, 9, 2]
        bdoc = [27, 1, 8, 5]
        tokens = jnp.asarray([a + bdoc], jnp.int32)
        seg = jnp.asarray([[0] * len(a) + [1] * len(bdoc)], jnp.int32)
        packed = model.forward(
            params, tokens, interpret=True, segment_ids=seg
        )
        la = model.forward(params, jnp.asarray([a], jnp.int32),
                           interpret=True)
        lb = model.forward(params, jnp.asarray([bdoc], jnp.int32),
                           interpret=True)
        np.testing.assert_allclose(
            packed[0, : len(a)], la[0], atol=1e-4, rtol=1e-4
        )
        np.testing.assert_allclose(
            packed[0, len(a):], lb[0], atol=1e-4, rtol=1e-4
        )

    def test_packed_loss_masks_boundaries(self):
        """The loss must exclude cross-document next-token positions."""
        from tpu_flash.models import TINY_TEST, FlashTransformer

        model = FlashTransformer(TINY_TEST)
        params = model.init(jax.random.PRNGKey(0))
        tokens = jnp.asarray([[3, 14, 15, 27, 1, 8]], jnp.int32)
        seg = jnp.asarray([[0, 0, 0, 1, 1, 1]], jnp.int32)
        loss = model.loss_fn(params, tokens, segment_ids=seg)
        assert np.isfinite(float(loss))
        # Gradient flows (packing is trainable end-to-end).
        g = jax.grad(
            lambda p: model.loss_fn(p, tokens, segment_ids=seg)
        )(params)
        gnorm = float(
            jnp.linalg.norm(g["layers"][0]["wq"].astype(jnp.float32))
        )
        assert np.isfinite(gnorm) and gnorm > 0

    def test_packed_rejects_serving_seams(self):
        from tpu_flash.models import TINY_TEST, FlashTransformer

        model = FlashTransformer(TINY_TEST)
        params = model.init(jax.random.PRNGKey(0))
        tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
        seg = jnp.zeros_like(tokens)
        with pytest.raises(ValueError, match="packed"):
            model.forward(
                params, tokens, interpret=True, segment_ids=seg,
                kv_hook=lambda li, k, v: (k, v),
            )
