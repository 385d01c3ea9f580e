"""Parity tests: ragged (mixed-stage) prefill kernel vs the jnp oracle.

Each batch row is a prefill chunk at a DIFFERENT stage of its own
sequence; the oracle recomputes every row independently as causal
attention at that row's q_offset over [its live history | the chunk].
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.core.reference import reference_gqa_attention
from tpu_flash.ops.flash import flash_attention_ragged

F32_TOL = dict(atol=2e-5, rtol=2e-5)
BF16_TOL = dict(atol=1e-2, rtol=1e-2)


def _ragged_oracle(q, k, v, offsets, hist_cap):
    """Per-row exact attention: row b's chunk attends its first offsets[b]
    history columns plus the chunk itself (causal at q_offset=offsets[b])."""
    b, _, q_len, _ = q.shape
    rows = []
    for i in range(b):
        off = int(offsets[i])
        k_row = jnp.concatenate(
            [k[i : i + 1, :, :off], k[i : i + 1, :, hist_cap:]], axis=2
        )
        v_row = jnp.concatenate(
            [v[i : i + 1, :, :off], v[i : i + 1, :, hist_cap:]], axis=2
        )
        rows.append(
            reference_gqa_attention(
                q[i : i + 1], k_row, v_row, causal=True, q_offset=off
            )
        )
    return jnp.concatenate(rows, axis=0)


def _inputs(key, b, hq, hkv, q_len, hist_cap, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, hq, q_len, d), dtype)
    k = jax.random.normal(kk, (b, hkv, hist_cap + q_len, d), dtype)
    v = jax.random.normal(kv, (b, hkv, hist_cap + q_len, d), dtype)
    return q, k, v


class TestRaggedParity:
    @pytest.mark.parametrize(
        "offsets", [[0, 128, 256, 193], [256, 256, 256, 256], [0, 0, 0, 0]]
    )
    def test_mixed_offsets_fp32(self, offsets):
        hist_cap, q_len = 256, 128
        q, k, v = _inputs(jax.random.PRNGKey(0), 4, 2, 2, q_len, hist_cap, 64)
        offs = jnp.asarray(
            [min(o, hist_cap) for o in offsets], jnp.int32
        )
        out = flash_attention_ragged(q, k, v, offs, hist_cap=hist_cap)
        ref = _ragged_oracle(q, k, v, offs, hist_cap)
        np.testing.assert_allclose(out, ref, **F32_TOL)

    def test_garbage_history_is_masked(self):
        """Columns in [offs, hist_cap) must not affect the output."""
        hist_cap, q_len = 256, 128
        q, k, v = _inputs(jax.random.PRNGKey(1), 2, 2, 2, q_len, hist_cap, 64)
        offs = jnp.asarray([64, 200], jnp.int32)
        out1 = flash_attention_ragged(q, k, v, offs, hist_cap=hist_cap)
        # Poison the dead region with huge-but-finite values (the engine's
        # contract: dead history columns hold trash-page garbage, which is
        # always finite; exact-zero weights then cancel it).
        k2, v2 = k, v
        for i, o in enumerate([64, 200]):
            k2 = k2.at[i, :, o:hist_cap].set(1e4)
            v2 = v2.at[i, :, o:hist_cap].set(-1e4)
        out2 = flash_attention_ragged(q, k2, v2, offs, hist_cap=hist_cap)
        np.testing.assert_allclose(out1, out2, atol=0, rtol=0)

    def test_gqa_bf16(self):
        hist_cap, q_len = 512, 256
        q, k, v = _inputs(
            jax.random.PRNGKey(2), 3, 8, 2, q_len, hist_cap, 128,
            jnp.bfloat16,
        )
        offs = jnp.asarray([0, 512, 384], jnp.int32)
        out = flash_attention_ragged(q, k, v, offs, hist_cap=hist_cap)
        ref = _ragged_oracle(q, k, v, offs, hist_cap)
        np.testing.assert_allclose(
            out.astype(jnp.float32), ref.astype(jnp.float32), **BF16_TOL
        )

    def test_unaligned_chunk_and_dim(self):
        # q_len not a block multiple, head_dim not lane-aligned.
        hist_cap, q_len = 128, 24
        q, k, v = _inputs(jax.random.PRNGKey(3), 2, 2, 2, q_len, hist_cap, 72)
        offs = jnp.asarray([128, 0], jnp.int32)
        out = flash_attention_ragged(q, k, v, offs, hist_cap=hist_cap)
        ref = _ragged_oracle(q, k, v, offs, hist_cap)
        np.testing.assert_allclose(out, ref, **F32_TOL)

    def test_matches_same_stage_flash(self):
        """All rows at the same stage == the product kernel with q_offset."""
        from tpu_flash.ops.flash import flash_attention

        hist_cap, q_len = 256, 128
        q, k, v = _inputs(jax.random.PRNGKey(4), 2, 4, 4, q_len, hist_cap, 64)
        offs = jnp.full((2,), hist_cap, jnp.int32)
        out = flash_attention_ragged(q, k, v, offs, hist_cap=hist_cap)
        ref = flash_attention(q, k, v, causal=True, q_offset=hist_cap)
        np.testing.assert_allclose(out, ref, atol=2e-6, rtol=2e-6)


def _ragged_oracle_ws(q, k, v, offsets, hist_cap, window=None, softcap=None):
    """Windowed/softcapped per-row oracle (same layout as _ragged_oracle)."""
    b = q.shape[0]
    rows = []
    for i in range(b):
        off = int(offsets[i])
        k_row = jnp.concatenate(
            [k[i : i + 1, :, :off], k[i : i + 1, :, hist_cap:]], axis=2
        )
        v_row = jnp.concatenate(
            [v[i : i + 1, :, :off], v[i : i + 1, :, hist_cap:]], axis=2
        )
        rows.append(
            reference_gqa_attention(
                q[i : i + 1], k_row, v_row, causal=True, q_offset=off,
                window=window, softcap=softcap,
            )
        )
    return jnp.concatenate(rows, axis=0)


class TestRaggedWindowSoftcap:
    @pytest.mark.parametrize("window", [1, 40, 130, 300])
    def test_window_mixed_offsets(self, window):
        hist_cap, q_len = 256, 128
        q, k, v = _inputs(jax.random.PRNGKey(7), 4, 2, 2, q_len, hist_cap, 64)
        offs = jnp.asarray([0, 128, 256, 200], jnp.int32)
        out = flash_attention_ragged(
            q, k, v, offs, hist_cap=hist_cap, window=window
        )
        ref = _ragged_oracle_ws(q, k, v, offs, hist_cap, window=window)
        np.testing.assert_allclose(out, ref, **F32_TOL)

    def test_window_gqa_below_window_garbage_masked(self):
        """History columns below the window must not affect the output
        even when poisoned — they are masked (and their tiles skipped)."""
        hist_cap, q_len, w = 256, 128, 64
        q, k, v = _inputs(jax.random.PRNGKey(8), 2, 4, 2, q_len, hist_cap, 64)
        offs = jnp.asarray([256, 130], jnp.int32)
        out1 = flash_attention_ragged(
            q, k, v, offs, hist_cap=hist_cap, window=w
        )
        # Poison everything below each row's earliest window start
        # (min over rows: offs + 0 - w + 1).
        k_p, v_p = k, v
        for i, off in enumerate([256, 130]):
            lo = max(0, off - w + 1)
            k_p = k_p.at[i, :, : max(lo - 8, 0)].set(1e9)
            v_p = v_p.at[i, :, : max(lo - 8, 0)].set(1e9)
        out2 = flash_attention_ragged(
            q, k_p, v_p, offs, hist_cap=hist_cap, window=w
        )
        np.testing.assert_allclose(out1, out2, atol=1e-6, rtol=1e-6)

    def test_softcap_mixed_offsets(self):
        hist_cap, q_len = 256, 128
        q, k, v = _inputs(jax.random.PRNGKey(9), 3, 2, 2, q_len, hist_cap, 64)
        offs = jnp.asarray([0, 100, 256], jnp.int32)
        out = flash_attention_ragged(
            q, k, v, offs, hist_cap=hist_cap, softcap=20.0
        )
        ref = _ragged_oracle_ws(q, k, v, offs, hist_cap, softcap=20.0)
        np.testing.assert_allclose(out, ref, **F32_TOL)

    def test_window_and_softcap(self):
        hist_cap, q_len = 256, 128
        q, k, v = _inputs(jax.random.PRNGKey(10), 2, 2, 2, q_len, hist_cap, 64)
        offs = jnp.asarray([192, 64], jnp.int32)
        out = flash_attention_ragged(
            q, k, v, offs, hist_cap=hist_cap, window=80, softcap=15.0
        )
        ref = _ragged_oracle_ws(
            q, k, v, offs, hist_cap, window=80, softcap=15.0
        )
        np.testing.assert_allclose(out, ref, **F32_TOL)

    def test_window_matches_same_stage_flash(self):
        """All rows at the same stage with a window == the dense windowed
        flash kernel at that q_offset."""
        from tpu_flash.ops.flash import flash_attention

        hist_cap, q_len, w = 256, 128, 100
        q, k, v = _inputs(jax.random.PRNGKey(11), 2, 2, 2, q_len, hist_cap, 64)
        offs = jnp.full((2,), hist_cap, jnp.int32)
        out = flash_attention_ragged(
            q, k, v, offs, hist_cap=hist_cap, window=w
        )
        ref = flash_attention(
            q, k, v, causal=True, q_offset=hist_cap, window=w
        )
        np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)
