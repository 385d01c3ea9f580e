"""Parity tests: Pallas flash-attention forward vs the jnp exact oracle.

Differential testing with asserted tolerances across shape x dtype x causal
sweeps — the upgrade of the reference's printed-not-asserted max-abs-diff
integration test (tests/main.cu:93-97) demanded by SURVEY.md §4.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.core.config import BlockSizes
from tpu_flash.core.reference import reference_attention, reference_gqa_attention
from tpu_flash.ops.flash import flash_attention

F32_TOL = dict(atol=2e-5, rtol=2e-5)
BF16_TOL = dict(atol=1e-2, rtol=1e-2)  # BASELINE config 1 gate


def _qkv(key, b, hq, hkv, sq, skv, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, hq, sq, d), dtype)
    k = jax.random.normal(kk, (b, hkv, skv, d), dtype)
    v = jax.random.normal(kv, (b, hkv, skv, d), dtype)
    return q, k, v


class TestParityFP32:
    @pytest.mark.parametrize("causal", [False, True])
    @pytest.mark.parametrize(
        "b,h,s,d",
        [
            (1, 1, 128, 64),  # BASELINE config 1 shape
            (2, 2, 256, 128),
            (1, 1, 384, 128),
        ],
    )
    def test_mha(self, b, h, s, d, causal):
        q, k, v = _qkv(jax.random.PRNGKey(0), b, h, h, s, s, d)
        out = flash_attention(q, k, v, causal=causal)
        ref = reference_attention(q, k, v, causal=causal)
        np.testing.assert_allclose(out, ref, **F32_TOL)

    def test_baseline_config1_tolerance(self):
        """BASELINE config 1: B=1, seq=128, d=64, FP32, non-causal, <=1e-2."""
        q, k, v = _qkv(jax.random.PRNGKey(7), 1, 1, 1, 128, 128, 64)
        out = flash_attention(q, k, v, causal=False)
        ref = reference_attention(q, k, v, causal=False)
        assert float(jnp.max(jnp.abs(out - ref))) <= 1e-2

    @pytest.mark.parametrize("causal", [False, True])
    def test_unaligned_shapes_padded_and_masked(self, causal):
        # seq not a multiple of any block, head_dim not a multiple of 128.
        q, k, v = _qkv(jax.random.PRNGKey(1), 1, 2, 2, 100, 100, 72)
        out = flash_attention(q, k, v, causal=causal)
        ref = reference_attention(q, k, v, causal=causal)
        np.testing.assert_allclose(out, ref, **F32_TOL)

    def test_cross_attention_different_kv_len(self):
        q, k, v = _qkv(jax.random.PRNGKey(2), 1, 2, 2, 64, 320, 64)
        out = flash_attention(q, k, v)
        ref = reference_attention(q, k, v)
        np.testing.assert_allclose(out, ref, **F32_TOL)

    @pytest.mark.parametrize("q_per_kv", [2, 4])
    def test_gqa(self, q_per_kv):
        hkv = 2
        q, k, v = _qkv(
            jax.random.PRNGKey(3), 1, hkv * q_per_kv, hkv, 128, 128, 64
        )
        out = flash_attention(q, k, v, causal=True)
        ref = reference_gqa_attention(q, k, v, causal=True)
        np.testing.assert_allclose(out, ref, **F32_TOL)

    def test_q_offset_chunked_prefill(self):
        # A 128-row query chunk at global offset 256 of a 512-key sequence
        # must match the same rows of full causal attention.
        q, k, v = _qkv(jax.random.PRNGKey(4), 1, 2, 2, 512, 512, 64)
        full = flash_attention(q, k, v, causal=True)
        chunk = flash_attention(
            q[:, :, 256:384], k, v, causal=True, q_offset=256
        )
        np.testing.assert_allclose(chunk, full[:, :, 256:384], **F32_TOL)

    def test_sm_scale_override(self):
        q, k, v = _qkv(jax.random.PRNGKey(5), 1, 1, 1, 128, 128, 64)
        out = flash_attention(q, k, v, sm_scale=0.05)
        ref = reference_attention(q, k, v, sm_scale=0.05)
        np.testing.assert_allclose(out, ref, **F32_TOL)

    def test_small_blocks_multi_kv_iters(self):
        # Force many KV grid steps + inner two-level tiling.
        bs = BlockSizes(block_q=128, block_kv_major=256, block_kv=128)
        q, k, v = _qkv(jax.random.PRNGKey(6), 1, 1, 1, 256, 1024, 64)
        out = flash_attention(q, k, v, causal=True, block_sizes=bs)
        ref = reference_attention(q, k, v, causal=True)
        np.testing.assert_allclose(out, ref, **F32_TOL)


class TestTriangularGrid:
    """The causal active-cell enumeration (BlockSizes.triangular, the
    default) must be bit-for-bit interchangeable with the rectangular
    predicated grid — same math, different cell walk."""

    @pytest.mark.parametrize(
        "b,hq,hkv,sq,skv,off",
        [
            (1, 2, 2, 256, 256, 0),
            (1, 4, 2, 256, 256, 0),     # GQA
            (2, 2, 1, 200, 200, 0),     # ragged kv tail (padding masked)
            (1, 2, 2, 128, 384, 256),   # chunked-prefill offset
        ],
    )
    def test_matches_rectangular(self, b, hq, hkv, sq, skv, off):
        q, k, v = _qkv(jax.random.PRNGKey(3), b, hq, hkv, sq, skv, 128)
        rect = BlockSizes(block_q=128, block_kv_major=128, block_kv=128,
                          triangular=False)
        tri = BlockSizes(block_q=128, block_kv_major=128, block_kv=128,
                         triangular=True)
        o_rect = flash_attention(q, k, v, causal=True, block_sizes=rect,
                                 q_offset=off)
        o_tri = flash_attention(q, k, v, causal=True, block_sizes=tri,
                                q_offset=off)
        np.testing.assert_allclose(o_rect, o_tri, atol=1e-6, rtol=1e-6)

    def test_residuals_match(self):
        q, k, v = _qkv(jax.random.PRNGKey(4), 1, 2, 2, 256, 256, 128)
        rect = BlockSizes(block_q=128, block_kv_major=128, block_kv=128,
                          triangular=False)
        tri = BlockSizes(block_q=128, block_kv_major=128, block_kv=128,
                         triangular=True)
        o1, lse1 = flash_attention(q, k, v, causal=True, block_sizes=rect,
                                   save_residuals=True)
        o2, lse2 = flash_attention(q, k, v, causal=True, block_sizes=tri,
                                   save_residuals=True)
        np.testing.assert_allclose(o1, o2, atol=1e-6, rtol=1e-6)
        np.testing.assert_allclose(lse1, lse2, atol=1e-6, rtol=1e-6)

    def test_bq_larger_than_bkv_major(self):
        q, k, v = _qkv(jax.random.PRNGKey(5), 1, 2, 2, 512, 512, 128)
        tri = BlockSizes(block_q=256, block_kv_major=128, block_kv=128,
                         triangular=True)
        out = flash_attention(q, k, v, causal=True, block_sizes=tri)
        ref = reference_attention(q, k, v, causal=True)
        np.testing.assert_allclose(out, ref, **F32_TOL)


class TestParityBF16:
    @pytest.mark.parametrize("causal", [False, True])
    def test_mha_bf16(self, causal):
        q, k, v = _qkv(
            jax.random.PRNGKey(0), 1, 4, 4, 256, 256, 128, jnp.bfloat16
        )
        out = flash_attention(q, k, v, causal=causal)
        ref = reference_attention(q, k, v, causal=causal)
        np.testing.assert_allclose(
            out.astype(jnp.float32), ref.astype(jnp.float32), **BF16_TOL
        )

    def test_llama2_prefill_shape_small(self):
        # Scaled-down Llama-2-7B attention: d=128, causal BF16, GQA=1.
        q, k, v = _qkv(
            jax.random.PRNGKey(1), 1, 8, 8, 512, 512, 128, jnp.bfloat16
        )
        out = flash_attention(q, k, v, causal=True)
        ref = reference_attention(q, k, v, causal=True)
        np.testing.assert_allclose(
            out.astype(jnp.float32), ref.astype(jnp.float32), **BF16_TOL
        )


class TestResiduals:
    def test_lse_matches_exact(self):
        q, k, v = _qkv(jax.random.PRNGKey(0), 1, 2, 2, 128, 128, 64)
        out, lse = flash_attention(q, k, v, causal=True, save_residuals=True)
        scale = 64**-0.5
        s = (
            jnp.einsum(
                "bhqd,bhkd->bhqk", q, k, precision=jax.lax.Precision.HIGHEST
            )
            * scale
        )
        mask = jnp.tril(jnp.ones((128, 128), bool))
        s = jnp.where(mask, s, -jnp.inf)
        expected_lse = jax.nn.logsumexp(s, axis=-1)
        np.testing.assert_allclose(lse, expected_lse, atol=1e-4, rtol=1e-4)


class TestStability:
    def test_large_scores_no_overflow(self):
        # Score magnitudes that would overflow exp() without running-max
        # rescaling — the property the reference kernel provides via
        # updateSoftmaxState (utils.cuh:58-81).
        key = jax.random.PRNGKey(0)
        q, k, v = _qkv(key, 1, 1, 1, 128, 128, 64)
        q = q * 100.0
        out = flash_attention(q, k, v)
        ref = reference_attention(q, k, v)
        assert bool(jnp.all(jnp.isfinite(out)))
        np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)

    def test_all_ones_like_reference_test(self):
        # The reference's integration test input (tests/main.cu:33-35).
        q = jnp.ones((1, 1, 16, 16))
        out = flash_attention(q, q, q)
        # softmax of constant rows = uniform; output = mean of V = ones.
        np.testing.assert_allclose(out, jnp.ones_like(q), atol=1e-5)


class TestDiagSubTiling:
    """Diagonal sub-tiling on the triangular grid (BlockSizes.diag_sub):
    row-sliced sub-tiles on diagonal cells + mask-free interior cells.
    Must be exact vs the plain path and fall back safely when gated off."""

    def _fwd(self, q, k, v, bq, sub, **kw):
        from tpu_flash.core.config import BlockSizes
        from tpu_flash.ops.flash.forward import flash_attention_forward

        bs = BlockSizes(
            block_q=bq, block_kv_major=bq, block_kv=bq,
            triangular=True, diag_sub=sub,
        )
        d = q.shape[-1]
        return flash_attention_forward(
            q, k, v, causal=True, sm_scale=d**-0.5, block_sizes=bs,
            triangular=True, interpret=True, **kw,
        )

    @pytest.mark.parametrize("bq,sub", [(256, 128), (512, 128), (512, 256)])
    def test_parity_vs_oracle(self, bq, sub):
        q, k, v = _qkv(jax.random.PRNGKey(0), 1, 2, 2, 1024, 1024, 64)
        out = self._fwd(q, k, v, bq, sub)
        ref = reference_attention(q, k, v, causal=True, sm_scale=64**-0.5)
        np.testing.assert_allclose(out, ref, **F32_TOL)

    def test_residuals_and_sinks(self):
        q, k, v = _qkv(jax.random.PRNGKey(1), 1, 2, 2, 512, 512, 64)
        out, lse = self._fwd(q, k, v, 256, 128, save_residuals=True)
        ref = reference_attention(q, k, v, causal=True, sm_scale=64**-0.5)
        np.testing.assert_allclose(out, ref, **F32_TOL)
        sinks = jnp.asarray([0.5, 1.5], jnp.float32)
        out2 = self._fwd(q, k, v, 256, 128, sinks=sinks)
        ref2 = reference_attention(
            q, k, v, causal=True, sm_scale=64**-0.5, sinks=sinks
        )
        np.testing.assert_allclose(out2, ref2, **F32_TOL)

    def test_gated_off_paths_still_exact(self):
        # window / q_offset / kv tail force the generic path; diag_sub set
        # on BlockSizes must not change results.
        q, k, v = _qkv(jax.random.PRNGKey(2), 1, 2, 2, 512, 512, 64)
        out = self._fwd(q, k, v, 256, 128, window=100)
        ref = reference_attention(
            q, k, v, causal=True, sm_scale=64**-0.5, window=100
        )
        np.testing.assert_allclose(out, ref, **F32_TOL)
        qs = q[:, :, :256]
        out2 = self._fwd(qs, k, v, 256, 128, q_offset=256)
        ref2 = reference_attention(
            qs, k, v, causal=True, sm_scale=64**-0.5, q_offset=256
        )
        np.testing.assert_allclose(out2, ref2, **F32_TOL)


class TestOnepass:
    """Single-pass short-sequence forward (BlockSizes.onepass): one masked
    softmax per q-block over its full causal extent, no online merge.
    Must match the oracle exactly-in-tolerance on every supported variant
    and fall through safely when the launcher gates it off."""

    def _fwd(self, q, k, v, bq, *, causal=True, onepass=True, **kw):
        from tpu_flash.ops.flash.forward import flash_attention_forward

        bs = BlockSizes(
            block_q=bq, block_kv_major=bq, block_kv=bq,
            triangular=True, onepass=onepass,
        )
        d = q.shape[-1]
        kw.setdefault("sm_scale", d**-0.5)
        return flash_attention_forward(
            q, k, v, causal=causal, block_sizes=bs, interpret=True, **kw,
        )

    @pytest.mark.parametrize("causal", [False, True])
    @pytest.mark.parametrize("nb", [1, 2, 4])
    def test_parity_vs_oracle(self, causal, nb):
        s = 512 * nb
        q, k, v = _qkv(jax.random.PRNGKey(0), 1, 2, 2, s, s, 64)
        out = self._fwd(q, k, v, 512, causal=causal)
        ref = reference_attention(q, k, v, causal=causal, sm_scale=64**-0.5)
        np.testing.assert_allclose(out, ref, **F32_TOL)

    def test_matches_triangular_path_bitwise(self):
        q, k, v = _qkv(jax.random.PRNGKey(1), 1, 2, 2, 512, 512, 64)
        on = self._fwd(q, k, v, 512, onepass=True)
        off = self._fwd(q, k, v, 512, onepass=False)
        ref = reference_attention(q, k, v, causal=True, sm_scale=64**-0.5)
        np.testing.assert_allclose(on, ref, **F32_TOL)
        np.testing.assert_allclose(off, ref, **F32_TOL)

    def test_gqa_residuals_sinks_softcap_alibi(self):
        q, k, v = _qkv(jax.random.PRNGKey(2), 2, 4, 2, 512, 512, 64)
        out, lse = self._fwd(q, k, v, 512, save_residuals=True)
        ref = reference_gqa_attention(q, k, v, causal=True, sm_scale=64**-0.5)
        out_t, lse_t = self._fwd(
            q, k, v, 512, save_residuals=True, onepass=False
        )
        np.testing.assert_allclose(out, ref, **F32_TOL)
        np.testing.assert_allclose(lse, lse_t, **F32_TOL)
        sinks = jnp.asarray([0.5, 1.5, -0.5, 0.0], jnp.float32)
        out2 = self._fwd(q, k, v, 512, sinks=sinks)
        ref2 = reference_gqa_attention(
            q, k, v, causal=True, sm_scale=64**-0.5, sinks=sinks
        )
        np.testing.assert_allclose(out2, ref2, **F32_TOL)
        out3 = self._fwd(q, k, v, 512, softcap=15.0)
        ref3 = reference_gqa_attention(
            q, k, v, causal=True, sm_scale=64**-0.5, softcap=15.0
        )
        np.testing.assert_allclose(out3, ref3, **F32_TOL)
        slopes = jnp.asarray([0.25, 0.5, 0.125, 1.0], jnp.float32)
        out4 = self._fwd(q, k, v, 512, alibi=slopes)
        ref4 = reference_gqa_attention(
            q, k, v, causal=True, sm_scale=64**-0.5, alibi=slopes
        )
        np.testing.assert_allclose(out4, ref4, **F32_TOL)

    def test_gated_off_variants_still_exact(self):
        # window / q_offset / ragged kv tail / segments must fall through
        # to the tiled grids with onepass=True set on BlockSizes.
        q, k, v = _qkv(jax.random.PRNGKey(3), 1, 2, 2, 512, 512, 64)
        out = self._fwd(q, k, v, 256, window=100)
        ref = reference_attention(
            q, k, v, causal=True, sm_scale=64**-0.5, window=100
        )
        np.testing.assert_allclose(out, ref, **F32_TOL)
        qs = q[:, :, :256]
        out2 = self._fwd(qs, k, v, 256, q_offset=256)
        ref2 = reference_attention(
            qs, k, v, causal=True, sm_scale=64**-0.5, q_offset=256
        )
        np.testing.assert_allclose(out2, ref2, **F32_TOL)
        out3 = self._fwd(q, k, v, 256, kv_len=384)
        ref3 = reference_attention(
            q, k[:, :, :384], v[:, :, :384], causal=True, sm_scale=64**-0.5
        )
        np.testing.assert_allclose(out3, ref3[:, :, : q.shape[2]], **F32_TOL)

    def test_bf16_headline_shape_small(self):
        q, k, v = _qkv(
            jax.random.PRNGKey(4), 1, 4, 4, 512, 512, 128, jnp.bfloat16
        )
        out = self._fwd(q, k, v, 256)
        ref = reference_attention(
            q.astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32), causal=True, sm_scale=128**-0.5,
        )
        np.testing.assert_allclose(
            out.astype(jnp.float32), ref, **BF16_TOL
        )

    def test_routing_selection(self, monkeypatch):
        # The launcher must route feasible shapes to the single-pass
        # kernel with the measured row counts (512 causal; largest
        # scores-feasible non-causal) and fall through otherwise.
        import tpu_flash.ops.flash.forward as fwd

        calls = []
        real = fwd._forward_onepass

        def spy(q, k, v, **kw):
            calls.append((q.shape[2], k.shape[2], kw["block_q"],
                          kw["causal"]))
            return real(q, k, v, **kw)

        monkeypatch.setattr(fwd, "_forward_onepass", spy)
        bs = BlockSizes(block_q=1024, block_kv_major=1024, block_kv=1024,
                        triangular=True, onepass=True)

        def run(sq, skv, causal):
            q, k, v = _qkv(jax.random.PRNGKey(0), 1, 1, 1, sq, skv, 64)
            fwd.flash_attention_forward(
                q, k, v, causal=causal, sm_scale=0.125, block_sizes=bs,
                interpret=True,
            )

        run(2048, 2048, True)
        # <=2K causal fuses the whole q range into one staircase cell
        # (block_q == q_len, 512-row stairs).
        assert calls[-1] == (2048, 2048, 2048, True)
        run(4096, 4096, True)
        assert calls[-1] == (4096, 4096, 512, True)
        run(2048, 2048, False)
        assert calls[-1] == (2048, 2048, 1024, False)
        n = len(calls)
        run(8192, 8192, True)   # nb > 8 -> triangular grid
        run(512, 8192, False)   # scores tile over budget at op_bq >= 512
        assert len(calls) == n


class TestTriPaired:
    """Paired-q triangular geometry (BlockSizes.tri_pair): two adjacent
    q-blocks share each K/V fetch. Must be exact vs the oracle, carry
    residuals/sinks/softcap, and fall back safely when gated off."""

    def _fwd(self, q, k, v, bq, **kw):
        from tpu_flash.core.config import BlockSizes
        from tpu_flash.ops.flash.forward import flash_attention_forward

        bs = BlockSizes(
            block_q=bq, block_kv_major=bq, block_kv=bq,
            triangular=True, tri_pair=True,
        )
        d = q.shape[-1]
        return flash_attention_forward(
            q, k, v, causal=True, sm_scale=d**-0.5, block_sizes=bs,
            triangular=True, interpret=True, **kw,
        )

    @pytest.mark.parametrize("bq,s", [(128, 512), (128, 1024), (256, 1024)])
    def test_parity_vs_oracle(self, bq, s):
        q, k, v = _qkv(jax.random.PRNGKey(0), 1, 2, 2, s, s, 64)
        out = self._fwd(q, k, v, bq)
        ref = reference_attention(q, k, v, causal=True, sm_scale=64**-0.5)
        np.testing.assert_allclose(out, ref, **F32_TOL)

    def test_gqa_matches_unpaired(self):
        q, k, v = _qkv(jax.random.PRNGKey(1), 2, 4, 2, 512, 512, 64)
        out = self._fwd(q, k, v, 128)
        from tpu_flash.core.config import BlockSizes
        from tpu_flash.ops.flash.forward import flash_attention_forward

        bs = BlockSizes(block_q=128, block_kv_major=128, block_kv=128,
                        triangular=True)
        ref = flash_attention_forward(
            q, k, v, causal=True, sm_scale=64**-0.5, block_sizes=bs,
            triangular=True, interpret=True,
        )
        np.testing.assert_allclose(out, ref, atol=1e-6, rtol=1e-6)

    def test_residuals_sinks_softcap(self):
        from tpu_flash.core.config import BlockSizes
        from tpu_flash.ops.flash.forward import flash_attention_forward

        q, k, v = _qkv(jax.random.PRNGKey(2), 1, 2, 2, 512, 512, 64)
        out, lse = self._fwd(q, k, v, 128, save_residuals=True)
        bs = BlockSizes(block_q=128, block_kv_major=128, block_kv=128,
                        triangular=True)
        ref, ref_lse = flash_attention_forward(
            q, k, v, causal=True, sm_scale=64**-0.5, block_sizes=bs,
            triangular=True, interpret=True, save_residuals=True,
        )
        np.testing.assert_allclose(out, ref, atol=1e-6, rtol=1e-6)
        np.testing.assert_allclose(lse, ref_lse, atol=1e-6, rtol=1e-6)
        sinks = jnp.asarray([0.5, 1.5], jnp.float32)
        out2 = self._fwd(q, k, v, 128, sinks=sinks)
        ref2 = reference_attention(
            q, k, v, causal=True, sm_scale=64**-0.5, sinks=sinks
        )
        np.testing.assert_allclose(out2, ref2, **F32_TOL)
        out3 = self._fwd(q, k, v, 128, softcap=10.0)
        ref3 = reference_attention(
            q, k, v, causal=True, sm_scale=64**-0.5, softcap=10.0
        )
        np.testing.assert_allclose(out3, ref3, **F32_TOL)

    def test_gated_off_paths_still_exact(self):
        # Odd q-block count, windows, offsets: tri_pair set must not
        # change results (falls back to the per-q-block grid).
        q, k, v = _qkv(jax.random.PRNGKey(3), 1, 2, 2, 384, 384, 64)
        out = self._fwd(q, k, v, 128)  # 3 q-blocks -> odd, falls back
        ref = reference_attention(q, k, v, causal=True, sm_scale=64**-0.5)
        np.testing.assert_allclose(out, ref, **F32_TOL)
        out2 = self._fwd(q, k, v, 128, window=100)
        ref2 = reference_attention(
            q, k, v, causal=True, sm_scale=64**-0.5, window=100
        )
        np.testing.assert_allclose(out2, ref2, **F32_TOL)
        qs = q[:, :, :128]
        out3 = self._fwd(qs, k, v, 128, q_offset=256)
        ref3 = reference_attention(
            qs, k, v, causal=True, sm_scale=64**-0.5, q_offset=256
        )
        np.testing.assert_allclose(out3, ref3, **F32_TOL)
