"""Core-layer tests: configs, jnp oracle self-consistency, softmax algebra.

The softmax-merge property tests are the direct analogue of the reference's
*untested* ``updateSoftmaxState`` (utils.cuh:58-81) — SURVEY.md §4 lists that
gap as one to fix.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.core.config import AttentionConfig, BlockSizes, MeshConfig
from tpu_flash.core.reference import (
    reference_attention,
    reference_decode_attention,
    reference_gqa_attention,
)
from tpu_flash.core.softmax import (
    SoftmaxState,
    empty_state,
    finalize,
    merge_softmax_states,
    state_from_block,
)


def _rand(key, *shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype=dtype)


class TestConfigs:
    def test_attention_config_gqa(self):
        cfg = AttentionConfig(num_q_heads=32, num_kv_heads=8, head_dim=128)
        assert cfg.q_per_kv == 4
        assert cfg.scale == pytest.approx(128**-0.5)

    def test_attention_config_rejects_bad_heads(self):
        with pytest.raises(ValueError):
            AttentionConfig(num_q_heads=30, num_kv_heads=8, head_dim=128)

    def test_block_sizes_divisibility(self):
        with pytest.raises(ValueError):
            BlockSizes(block_kv_major=256, block_kv=96)

    def test_mesh_config(self):
        assert MeshConfig(data=2, model=4).num_devices == 8


class TestReferenceOracle:
    """Pin the oracle against hand-rolled numpy softmax attention —
    the check.py (PyTorch) contract re-established in numpy."""

    def test_matches_numpy_exact(self):
        rng = np.random.default_rng(0)
        b, h, s, d = 2, 3, 17, 8
        q = rng.standard_normal((b, h, s, d), dtype=np.float32)
        k = rng.standard_normal((b, h, s, d), dtype=np.float32)
        v = rng.standard_normal((b, h, s, d), dtype=np.float32)
        scores = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
        w = np.exp(scores - scores.max(-1, keepdims=True))
        w /= w.sum(-1, keepdims=True)
        expected = np.einsum("bhqk,bhkd->bhqd", w, v)
        got = reference_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
        np.testing.assert_allclose(got, expected, atol=1e-5, rtol=1e-5)

    def test_causal_masks_future(self):
        key = jax.random.PRNGKey(1)
        q, k, v = (_rand(k_, 1, 1, 6, 4) for k_ in jax.random.split(key, 3))
        out = reference_attention(q, k, v, causal=True)
        # Row 0 attends only to kv 0 → equals v[0].
        np.testing.assert_allclose(
            out[0, 0, 0], v[0, 0, 0], atol=1e-6, rtol=1e-6
        )

    def test_causal_q_offset(self):
        key = jax.random.PRNGKey(2)
        kq, kk, kv_ = jax.random.split(key, 3)
        q = _rand(kq, 1, 2, 4, 8)
        k = _rand(kk, 1, 2, 12, 8)
        v = _rand(kv_, 1, 2, 12, 8)
        # Query chunk occupying global positions 8..11 of the kv sequence:
        out_chunk = reference_attention(q, k, v, causal=True, q_offset=8)
        full_q = jnp.concatenate([jnp.zeros((1, 2, 8, 8)), q], axis=2)
        out_full = reference_attention(full_q, k, v, causal=True)
        np.testing.assert_allclose(
            out_chunk, out_full[:, :, 8:], atol=1e-5, rtol=1e-5
        )

    def test_gqa_equals_repeated_mha(self):
        key = jax.random.PRNGKey(3)
        kq, kk, kv_ = jax.random.split(key, 3)
        q = _rand(kq, 2, 8, 10, 16)
        k = _rand(kk, 2, 2, 10, 16)
        v = _rand(kv_, 2, 2, 10, 16)
        out = reference_gqa_attention(q, k, v, causal=True)
        k_rep = jnp.repeat(k, 4, axis=1)
        v_rep = jnp.repeat(v, 4, axis=1)
        expected = reference_attention(q, k_rep, v_rep, causal=True)
        np.testing.assert_allclose(out, expected, atol=1e-6, rtol=1e-6)

    def test_segment_ids_block_cross_attention(self):
        key = jax.random.PRNGKey(4)
        kq, kk, kv_ = jax.random.split(key, 3)
        q = _rand(kq, 1, 1, 8, 4)
        k = _rand(kk, 1, 1, 8, 4)
        v = _rand(kv_, 1, 1, 8, 4)
        seg = jnp.array([[0, 0, 0, 0, 1, 1, 1, 1]])
        out = reference_attention(
            q, k, v, q_segment_ids=seg, kv_segment_ids=seg
        )
        # Segment 0 output must equal attention restricted to segment 0.
        out0 = reference_attention(
            q[:, :, :4], k[:, :, :4], v[:, :, :4]
        )
        np.testing.assert_allclose(out[:, :, :4], out0, atol=1e-5, rtol=1e-5)

    def test_decode_matches_full_attention(self):
        key = jax.random.PRNGKey(5)
        kq, kk, kv_ = jax.random.split(key, 3)
        b, hq, hkv, d, max_len = 3, 8, 2, 16, 24
        q = _rand(kq, b, hq, d)
        k_cache = _rand(kk, b, hkv, max_len, d)
        v_cache = _rand(kv_, b, hkv, max_len, d)
        lengths = jnp.array([24, 7, 1], dtype=jnp.int32)
        out = reference_decode_attention(q, k_cache, v_cache, lengths)
        for i, ln in enumerate([24, 7, 1]):
            exp = reference_gqa_attention(
                q[i : i + 1, :, None],
                k_cache[i : i + 1, :, :ln],
                v_cache[i : i + 1, :, :ln],
            )
            np.testing.assert_allclose(
                out[i], exp[0, :, 0], atol=1e-5, rtol=1e-5
            )


class TestSoftmaxMergeAlgebra:
    """Property tests for the online-softmax merge: associativity,
    identity, and agreement with exact softmax."""

    def _states(self, key, n_blocks, q, kv_per_block, d):
        keys = jax.random.split(key, 2 * n_blocks)
        states, all_s, all_v = [], [], []
        for i in range(n_blocks):
            s = _rand(keys[2 * i], q, kv_per_block) * 3.0
            v = _rand(keys[2 * i + 1], kv_per_block, d)
            states.append(state_from_block(s, v))
            all_s.append(s)
            all_v.append(v)
        return states, jnp.concatenate(all_s, -1), jnp.concatenate(all_v, 0)

    def test_merge_equals_exact_softmax(self):
        states, s_full, v_full = self._states(jax.random.PRNGKey(0), 4, 6, 5, 8)
        merged = states[0]
        for st in states[1:]:
            merged = merge_softmax_states(merged, st)
        expected = jnp.einsum(
            "qk,kd->qd",
            jax.nn.softmax(s_full, axis=-1),
            v_full,
            precision=jax.lax.Precision.HIGHEST,
        )
        np.testing.assert_allclose(
            finalize(merged), expected, atol=1e-5, rtol=1e-5
        )

    def test_associative(self):
        states, _, _ = self._states(jax.random.PRNGKey(1), 3, 4, 7, 8)
        a, b, c = states
        left = merge_softmax_states(merge_softmax_states(a, b), c)
        right = merge_softmax_states(a, merge_softmax_states(b, c))
        for x, y in zip(left, right):
            np.testing.assert_allclose(x, y, atol=1e-5, rtol=1e-5)

    def test_commutative(self):
        states, _, _ = self._states(jax.random.PRNGKey(2), 2, 4, 7, 8)
        a, b = states
        ab = merge_softmax_states(a, b)
        ba = merge_softmax_states(b, a)
        for x, y in zip(ab, ba):
            np.testing.assert_allclose(x, y, atol=1e-6, rtol=1e-6)

    def test_identity_element(self):
        (state,), _, _ = self._states(jax.random.PRNGKey(3), 1, 4, 7, 8)
        ident = empty_state((4,), 8)
        merged = merge_softmax_states(state, ident)
        for x, y in zip(merged, state):
            np.testing.assert_allclose(x, y, atol=1e-7, rtol=1e-7)
        merged = merge_softmax_states(ident, state)
        for x, y in zip(merged, state):
            np.testing.assert_allclose(x, y, atol=1e-7, rtol=1e-7)

    def test_extreme_score_magnitudes_stable(self):
        # Running-max rescaling must not overflow with huge score gaps —
        # the numerical property the reference's utils.cuh:58-81 provides.
        s1 = jnp.array([[1000.0, 999.0]])
        s2 = jnp.array([[-1000.0, 2.0]])
        v = jnp.ones((2, 4))
        merged = merge_softmax_states(
            state_from_block(s1, v), state_from_block(s2, v)
        )
        out = finalize(merged)
        assert bool(jnp.all(jnp.isfinite(out)))
        np.testing.assert_allclose(out, jnp.ones((1, 4)), atol=1e-5)
