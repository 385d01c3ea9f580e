"""Multi-device tests on the virtual 8-device CPU mesh: head-sharded TP
flash attention, KV-head-sharded paged decode, ring attention parity.

The fake-backend distributed test story the reference lacks (SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.core.config import MeshConfig
from tpu_flash.core.reference import (
    gather_pages_to_dense,
    reference_attention,
    reference_decode_attention,
    reference_gqa_attention,
)
from tpu_flash.parallel import (
    build_mesh,
    ring_attention,
    sharded_flash_attention,
    sharded_paged_attention,
)
from tpu_flash.parallel.mesh import mesh_for

requires_8 = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


def _qkv(key, b, hq, hkv, sq, skv, d):
    kq, kk, kv = jax.random.split(key, 3)
    return (
        jax.random.normal(kq, (b, hq, sq, d)),
        jax.random.normal(kk, (b, hkv, skv, d)),
        jax.random.normal(kv, (b, hkv, skv, d)),
    )


class TestMesh:
    @requires_8
    def test_build_mesh_axes(self):
        mesh = build_mesh(MeshConfig(data=2, model=4, seq=1))
        assert dict(mesh.shape) == {"data": 2, "seq": 1, "model": 4}

    @requires_8
    def test_mesh_for_factorization(self):
        mesh = mesh_for(8)
        assert int(np.prod(list(mesh.shape.values()))) == 8


class TestShardedFlash:
    @requires_8
    @pytest.mark.parametrize("causal", [False, True])
    def test_tp_dp_parity(self, causal):
        mesh = build_mesh(MeshConfig(data=2, model=4, seq=1))
        q, k, v = _qkv(jax.random.PRNGKey(0), 2, 8, 4, 128, 128, 64)
        fn = sharded_flash_attention(mesh, causal=causal, interpret=True)
        out = fn(q, k, v)
        ref = reference_gqa_attention(q, k, v, causal=causal)
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)

    @requires_8
    def test_gqa_groups_colocated(self):
        # 8 q heads / 4 kv heads on 4-way model axis: 2 q heads + 1 kv head
        # per chip — no cross-chip attention traffic.
        mesh = build_mesh(MeshConfig(data=1, model=4, seq=1))
        q, k, v = _qkv(jax.random.PRNGKey(1), 1, 8, 4, 64, 64, 64)
        fn = sharded_flash_attention(mesh, causal=True, interpret=True)
        out = fn(q, k, v)
        ref = reference_gqa_attention(q, k, v, causal=True)
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


class TestShardedPagedDecode:
    @requires_8
    def test_kv_head_sharded_decode(self):
        mesh = build_mesh(MeshConfig(data=1, model=4, seq=1))
        hkv, ps, d, batch, pps = 4, 128, 128, 2, 2
        key = jax.random.PRNGKey(2)
        kk, kv, kq = jax.random.split(key, 3)
        k_pages = jax.random.normal(kk, (hkv, 16, ps, d))
        v_pages = jax.random.normal(kv, (hkv, 16, ps, d))
        page_indices = jnp.arange(batch * pps, dtype=jnp.int32).reshape(
            batch, pps
        )
        lengths = jnp.array([200, 77], jnp.int32)
        q = jax.random.normal(kq, (batch, 8, d))
        fn = sharded_paged_attention(mesh, interpret=True)
        out = fn(q, k_pages, v_pages, lengths, page_indices)
        ref = reference_decode_attention(
            q,
            gather_pages_to_dense(k_pages, page_indices),
            gather_pages_to_dense(v_pages, page_indices),
            lengths,
        )
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


class TestRingAttention:
    @requires_8
    @pytest.mark.parametrize("causal", [False, True])
    def test_ring_parity_4way(self, causal):
        mesh = build_mesh(MeshConfig(data=1, model=1, seq=4))
        q, k, v = _qkv(jax.random.PRNGKey(3), 1, 2, 2, 256, 256, 64)
        out = ring_attention(
            q, k, v, mesh, causal=causal, interpret=True
        )
        ref = reference_attention(q, k, v, causal=causal)
        np.testing.assert_allclose(out, ref, atol=3e-5, rtol=3e-5)

    @requires_8
    def test_ring_with_head_parallel_2d(self):
        # 2D: ring on seq x heads on model (the BASELINE config 5 layout).
        mesh = build_mesh(MeshConfig(data=1, model=2, seq=4))
        q, k, v = _qkv(jax.random.PRNGKey(4), 1, 4, 4, 512, 512, 64)
        out = ring_attention(q, k, v, mesh, causal=True, interpret=True)
        ref = reference_attention(q, k, v, causal=True)
        np.testing.assert_allclose(out, ref, atol=3e-5, rtol=3e-5)

    @requires_8
    def test_ring_long_context_int4_seeded(self):
        # Long-context shape (scaled): 8K tokens over a 8-way ring.
        mesh = build_mesh(MeshConfig(data=1, model=1, seq=8))
        q, k, v = _qkv(jax.random.PRNGKey(5), 1, 1, 1, 1024, 1024, 64)
        out = ring_attention(q, k, v, mesh, causal=True, interpret=True)
        ref = reference_attention(q, k, v, causal=True)
        np.testing.assert_allclose(out, ref, atol=3e-5, rtol=3e-5)


class TestUlyssesAttention:
    """All-to-all SP (parallel/ulysses.py): same contract as ring, exact
    single-chip causal semantics after the head-scatter/seq-gather."""

    @requires_8
    @pytest.mark.parametrize("causal", [False, True])
    def test_ulysses_parity_4way(self, causal):
        from tpu_flash.parallel import ulysses_attention

        mesh = build_mesh(MeshConfig(data=1, model=1, seq=4))
        q, k, v = _qkv(jax.random.PRNGKey(6), 1, 4, 4, 256, 256, 64)
        fn = ulysses_attention(mesh, causal=causal, interpret=True)
        out = fn(q, k, v)
        ref = reference_attention(q, k, v, causal=causal)
        np.testing.assert_allclose(out, ref, atol=3e-5, rtol=3e-5)

    @requires_8
    def test_ulysses_gqa(self):
        from tpu_flash.parallel import ulysses_attention

        mesh = build_mesh(MeshConfig(data=1, model=1, seq=2))
        q, k, v = _qkv(jax.random.PRNGKey(7), 2, 8, 2, 256, 256, 64)
        fn = ulysses_attention(mesh, causal=True, interpret=True)
        out = fn(q, k, v)
        ref = reference_gqa_attention(q, k, v, causal=True)
        np.testing.assert_allclose(out, ref, atol=3e-5, rtol=3e-5)

    @requires_8
    def test_ulysses_head_divisibility_error(self):
        from tpu_flash.parallel import ulysses_attention

        mesh = build_mesh(MeshConfig(data=1, model=1, seq=4))
        # 2 kv heads over a 4-way seq axis: must refuse with guidance.
        q, k, v = _qkv(jax.random.PRNGKey(8), 1, 4, 2, 256, 256, 64)
        fn = ulysses_attention(mesh, causal=False, interpret=True)
        with pytest.raises(ValueError, match="ring attention"):
            fn(q, k, v)

    @requires_8
    def test_ulysses_matches_ring(self):
        from tpu_flash.parallel import ulysses_attention

        mesh = build_mesh(MeshConfig(data=1, model=1, seq=4))
        q, k, v = _qkv(jax.random.PRNGKey(9), 1, 4, 4, 512, 512, 64)
        out_u = ulysses_attention(mesh, causal=True, interpret=True)(q, k, v)
        out_r = ring_attention(q, k, v, mesh, causal=True, interpret=True)
        np.testing.assert_allclose(out_u, out_r, atol=3e-5, rtol=3e-5)
