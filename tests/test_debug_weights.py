"""Attention-probability debug surface (ops/flash/debug.py).

The reference's golden oracle returns ``(output, attn)`` (check.py:25) so
attention maps are inspectable; VERDICT r1 flagged that our kernels exposed
only (o, lse). These tests pin the kernel-extracted weights — normalized by
the production kernel's OWN lse residual — against the oracle's
``return_weights=True`` probabilities.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.core.reference import reference_attention
from tpu_flash.ops.flash.debug import attention_weights

TOL = dict(atol=2e-5, rtol=2e-5)


def _qkv(key, b, hq, hkv, sq, skv, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, hq, sq, d), dtype)
    k = jax.random.normal(kk, (b, hkv, skv, d), dtype)
    v = jax.random.normal(kv, (b, hkv, skv, d), dtype)
    return q, k, v


def _ref_weights(q, k, v, **kw):
    hq = q.shape[1]
    hkv = k.shape[1]
    if hq != hkv:
        rep = hq // hkv
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    return reference_attention(q, k, v, return_weights=True, **kw)


@pytest.mark.parametrize("causal", [False, True])
def test_weights_match_oracle(causal):
    q, k, v = _qkv(jax.random.PRNGKey(0), 1, 2, 2, 256, 256, 128)
    o, w = attention_weights(q, k, v, causal=causal, interpret=True)
    ref_o, ref_w = _ref_weights(q, k, v, causal=causal)
    np.testing.assert_allclose(w, ref_w, **TOL)
    np.testing.assert_allclose(o, ref_o, **TOL)
    # rows are probabilities
    np.testing.assert_allclose(jnp.sum(w, axis=-1), 1.0, atol=1e-4)


def test_weights_gqa_and_scale():
    q, k, v = _qkv(jax.random.PRNGKey(1), 2, 4, 2, 128, 128, 64)
    o, w = attention_weights(q, k, v, causal=True, sm_scale=0.2,
                             interpret=True)
    ref_o, ref_w = _ref_weights(q, k, v, causal=True, sm_scale=0.2)
    np.testing.assert_allclose(w, ref_w, **TOL)
    np.testing.assert_allclose(o, ref_o, **TOL)


def test_weights_window_and_softcap():
    q, k, v = _qkv(jax.random.PRNGKey(2), 1, 2, 2, 256, 256, 64)
    kw = dict(causal=True, window=128, softcap=30.0)
    o, w = attention_weights(q, k, v, interpret=True, **kw)
    ref_o, ref_w = _ref_weights(q, k, v, **kw)
    np.testing.assert_allclose(w, ref_w, **TOL)
    np.testing.assert_allclose(o, ref_o, **TOL)


def test_weights_alibi():
    q, k, v = _qkv(jax.random.PRNGKey(3), 1, 2, 2, 128, 128, 64)
    alibi = jnp.asarray([0.25, 0.0625], jnp.float32)
    o, w = attention_weights(q, k, v, causal=True, alibi=alibi,
                             interpret=True)
    ref_o, ref_w = _ref_weights(q, k, v, causal=True, alibi=alibi)
    np.testing.assert_allclose(w, ref_w, **TOL)
    np.testing.assert_allclose(o, ref_o, **TOL)


def test_weights_sinks_rows_sum_below_one():
    q, k, v = _qkv(jax.random.PRNGKey(4), 1, 2, 2, 128, 128, 64)
    sinks = jnp.asarray([1.0, 2.0], jnp.float32)
    o, w = attention_weights(q, k, v, causal=True, sinks=sinks,
                             interpret=True)
    ref_o, ref_w = _ref_weights(q, k, v, causal=True, sinks=sinks)
    np.testing.assert_allclose(w, ref_w, **TOL)
    np.testing.assert_allclose(o, ref_o, **TOL)
    assert float(jnp.max(jnp.sum(w, axis=-1))) < 1.0


def test_weights_decode_offset_and_kv_tail():
    # q_offset (decode-style suffix queries) + kv_len < padded kv.
    q, k, v = _qkv(jax.random.PRNGKey(5), 1, 2, 2, 128, 256, 64)
    kv_len = 200
    o, w = attention_weights(q, k, v, causal=True, q_offset=72,
                             kv_len=kv_len, interpret=True)
    ref_o, ref_w = _ref_weights(
        q, k[:, :, :kv_len], v[:, :, :kv_len], causal=True, q_offset=72
    )
    assert w.shape[-1] == kv_len
    np.testing.assert_allclose(w, ref_w, **TOL)
    np.testing.assert_allclose(o, ref_o, **TOL)
