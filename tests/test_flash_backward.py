"""Gradient parity: Pallas flash-attention backward vs jax.grad of the oracle.

The reference has no training path at all; this suite establishes the
gradient contract for the framework's custom_vjp (FA2-style dKV/dQ kernels).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.core.reference import reference_attention, reference_gqa_attention
from tpu_flash.ops.flash import flash_attention

TOL = dict(atol=2e-4, rtol=2e-3)


def _qkv(key, b, hq, hkv, sq, skv, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, hq, sq, d), dtype)
    k = jax.random.normal(kk, (b, hkv, skv, d), dtype)
    v = jax.random.normal(kv, (b, hkv, skv, d), dtype)
    return q, k, v


def _grads(fn, q, k, v, **kw):
    def loss(q, k, v):
        out = fn(q, k, v, **kw)
        # Non-uniform cotangent to exercise all positions.
        w = jnp.arange(out.size, dtype=out.dtype).reshape(out.shape) / out.size
        return jnp.sum(out * w)

    return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)


class TestGradParity:
    @pytest.mark.parametrize("causal", [False, True])
    @pytest.mark.parametrize("s,d", [(128, 64), (256, 128)])
    def test_mha_grads(self, s, d, causal):
        q, k, v = _qkv(jax.random.PRNGKey(0), 1, 2, 2, s, s, d)
        got = _grads(flash_attention, q, k, v, causal=causal)
        ref_fn = lambda q, k, v, **kw: reference_attention(q, k, v, **kw)
        exp = _grads(ref_fn, q, k, v, causal=causal)
        for g, e, name in zip(got, exp, "qkv"):
            np.testing.assert_allclose(
                g, e, err_msg=f"d{name} mismatch", **TOL
            )

    def test_gqa_grads_sum_over_group(self):
        q, k, v = _qkv(jax.random.PRNGKey(1), 1, 4, 2, 128, 128, 64)
        got = _grads(flash_attention, q, k, v, causal=True)
        exp = _grads(reference_gqa_attention, q, k, v, causal=True)
        for g, e, name in zip(got, exp, "qkv"):
            assert g.shape == e.shape, f"d{name} shape {g.shape} vs {e.shape}"
            np.testing.assert_allclose(
                g, e, err_msg=f"d{name} mismatch", **TOL
            )

    @pytest.mark.parametrize("causal", [False, True])
    def test_unaligned_grads(self, causal):
        # Padded rows/cols must contribute exactly zero gradient.
        q, k, v = _qkv(jax.random.PRNGKey(2), 1, 2, 2, 100, 180, 72)
        got = _grads(flash_attention, q, k, v, causal=causal)
        ref_fn = lambda q, k, v, **kw: reference_attention(q, k, v, **kw)
        exp = _grads(ref_fn, q, k, v, causal=causal)
        for g, e, name in zip(got, exp, "qkv"):
            np.testing.assert_allclose(
                g, e, err_msg=f"d{name} mismatch", **TOL
            )

    def test_cross_attention_grads(self):
        q, k, v = _qkv(jax.random.PRNGKey(3), 2, 2, 2, 64, 256, 64)
        got = _grads(flash_attention, q, k, v)
        ref_fn = lambda q, k, v: reference_attention(q, k, v)
        exp = _grads(ref_fn, q, k, v)
        for g, e, name in zip(got, exp, "qkv"):
            np.testing.assert_allclose(
                g, e, err_msg=f"d{name} mismatch", **TOL
            )

    def test_bf16_grads_tolerance(self):
        q, k, v = _qkv(
            jax.random.PRNGKey(4), 1, 2, 2, 128, 128, 128, jnp.bfloat16
        )
        got = _grads(flash_attention, q, k, v, causal=True)
        ref_fn = lambda q, k, v, **kw: reference_attention(q, k, v, **kw)
        exp = _grads(ref_fn, q, k, v, causal=True)
        for g, e, name in zip(got, exp, "qkv"):
            np.testing.assert_allclose(
                g.astype(jnp.float32),
                e.astype(jnp.float32),
                atol=5e-2,
                rtol=5e-2,
                err_msg=f"d{name} mismatch",
            )

    def test_grad_through_jit_and_vmap_free_path(self):
        # flash_attention must compose with jit(grad(...)).
        q, k, v = _qkv(jax.random.PRNGKey(5), 1, 1, 1, 128, 128, 64)

        @jax.jit
        def step(q, k, v):
            return jax.grad(lambda q: jnp.sum(flash_attention(q, k, v) ** 2))(q)

        g = step(q, k, v)
        assert g.shape == q.shape
        assert bool(jnp.all(jnp.isfinite(g)))


class TestBackwardOnepass:
    """Single-pass backward routing: qualifying shapes must take
    _backward_onepass; gated variants must fall through — both exact."""

    def test_routing_and_parity(self, monkeypatch):
        import tpu_flash.ops.flash.backward as bwd
        from tpu_flash.core.config import BlockSizes
        from tpu_flash.ops.flash import flash_attention

        calls = []
        real = bwd._backward_onepass

        def spy(*a, **kw):
            calls.append(kw["block"])
            return real(*a, **kw)

        monkeypatch.setattr(bwd, "_backward_onepass", spy)
        bs = BlockSizes(
            block_q=512, block_kv_major=512, block_kv=512,
            block_q_dkv=512, block_kv_dkv=512, block_q_dq=512,
            block_kv_dq=512, triangular=True, onepass=True,
        )
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 1024, 64))
        k = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 1024, 64))
        v = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 1024, 64))

        def loss(q_, k_, v_, **kw):
            return flash_attention(
                q_, k_, v_, causal=True, block_sizes=bs, interpret=True,
                **kw,
            ).astype(jnp.float32).sum()

        grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        assert calls == [512]

        bs_off = BlockSizes(
            block_q=512, block_kv_major=512, block_kv=512,
            block_q_dkv=512, block_kv_dkv=512, block_q_dq=512,
            block_kv_dq=512, triangular=True, onepass=False,
        )

        def loss_off(q_, k_, v_):
            return flash_attention(
                q_, k_, v_, causal=True, block_sizes=bs_off,
                interpret=True,
            ).astype(jnp.float32).sum()

        grads_off = jax.grad(loss_off, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(grads, grads_off):
            np.testing.assert_allclose(a, b, atol=2e-5, rtol=2e-5)
        # windowed call must NOT take onepass
        n = len(calls)
        jax.grad(lambda q_: loss(q_, k, v, window=100))(q)
        assert len(calls) == n
