"""Quantized-input flash attention (BASELINE config 4 compute path).

Two-tier parity, mirroring the reference's differential-test strategy
(tests/main.cu:74-97, check.py:4-25) but with asserted tolerances:

1. EXACT tier: the fused kernel over quantized payloads must match the jnp
   oracle evaluated on the *dequantized* values almost exactly (same math,
   f32 accumulation) — pins the rank-1 scale fusion algebra.
2. QUANT-ERROR tier: against the oracle on the ORIGINAL fp values, the error
   must be bounded by the quantization scheme's expected Δ.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.core.config import BlockSizes
from tpu_flash.core.reference import reference_gqa_attention
from tpu_flash.ops.flash import (
    dequantize_attention_inputs,
    flash_attention_quantized,
    quantize_attention_inputs,
)

BS = BlockSizes(block_q=128, block_kv_major=128, block_kv=128)


def _rand_qkv(key, batch, hq, hkv, q_len, kv_len, d):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (batch, hq, q_len, d), jnp.float32)
    k = jax.random.normal(kk, (batch, hkv, kv_len, d), jnp.float32)
    v = jax.random.normal(kv, (batch, hkv, kv_len, d), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("dtype_name", ["int8", "fp8"])
@pytest.mark.parametrize("causal", [False, True])
class TestQuantizedParity:
    def test_matches_dequantized_oracle(self, dtype_name, causal):
        q, k, v = _rand_qkv(jax.random.PRNGKey(0), 1, 2, 2, 256, 256, 128)
        qi = quantize_attention_inputs(q, k, v, dtype_name)
        out = flash_attention_quantized(
            qi, causal=causal, block_sizes=BS, out_dtype=jnp.float32,
            interpret=True,
        )
        qd, kd, vd = dequantize_attention_inputs(qi)
        expected = reference_gqa_attention(qd, kd, vd, causal=causal)
        # Scores are exact (int32 / f32 accumulation); the only rounding is
        # the BF16 PV matmul — ~1e-3 typical, <2e-2 worst-case observed for
        # unit-normal inputs.
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(expected), atol=2e-2
        )

    def test_quant_error_bounded_vs_fp_oracle(self, dtype_name, causal):
        q, k, v = _rand_qkv(jax.random.PRNGKey(1), 1, 4, 2, 256, 256, 128)
        qi = quantize_attention_inputs(q, k, v, dtype_name)
        out = flash_attention_quantized(
            qi, causal=causal, block_sizes=BS, out_dtype=jnp.float32,
            interpret=True,
        )
        expected = reference_gqa_attention(q, k, v, causal=causal)
        err = float(jnp.max(jnp.abs(out - expected)))
        # Per-row symmetric 8-bit: observed worst-case output error for unit
        # normal inputs is ~1e-2 (int8) / ~3e-2 (fp8, 3 mantissa bits).
        bound = 0.03 if dtype_name == "int8" else 0.15
        assert err < bound, f"quant error {err} exceeds {bound}"


@pytest.mark.parametrize("causal", [False, True])
class TestFp8NativeTier:
    def test_fp8_native_close_to_software_tier(self, causal):
        """The v6e-native fp8 tier (e4m3 straight into the MXU, rank-1
        renormalized e4m3 P) must stay within fp8-class rounding of the
        software-cast tier. Forced on (the device probe says off for
        CPU/v5e) so the path is CI-covered pre-v6e (VERDICT r1 item 10)."""
        q, k, v = _rand_qkv(jax.random.PRNGKey(2), 1, 4, 2, 256, 256, 128)
        qi = quantize_attention_inputs(q, k, v, "fp8")
        soft = flash_attention_quantized(
            qi, causal=causal, block_sizes=BS, out_dtype=jnp.float32,
            interpret=True, fp8_native=False,
        )
        native = flash_attention_quantized(
            qi, causal=causal, block_sizes=BS, out_dtype=jnp.float32,
            interpret=True, fp8_native=True,
        )
        # P re-rounded to e4m3 (~2^-4 relative) is the only new rounding;
        # the scores matmul is the same e4m3 values either way.
        np.testing.assert_allclose(
            np.asarray(native), np.asarray(soft), atol=8e-2, rtol=8e-2
        )


class TestQuantizedShapes:
    def test_gqa_grouping(self):
        q, k, v = _rand_qkv(jax.random.PRNGKey(2), 2, 8, 2, 128, 256, 128)
        qi = quantize_attention_inputs(q, k, v, "int8")
        out = flash_attention_quantized(
            qi, causal=True, block_sizes=BS, out_dtype=jnp.float32,
            interpret=True,
        )
        qd, kd, vd = dequantize_attention_inputs(qi)
        expected = reference_gqa_attention(qd, kd, vd, causal=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(expected), atol=2e-2
        )

    def test_unaligned_length_raises(self):
        q, k, v = _rand_qkv(jax.random.PRNGKey(3), 1, 2, 2, 100, 128, 128)
        qi = quantize_attention_inputs(q, k, v, "int8")
        with pytest.raises(ValueError, match="q_len"):
            flash_attention_quantized(qi, block_sizes=BS, interpret=True)

    def test_bad_dtype_raises(self):
        q, k, v = _rand_qkv(jax.random.PRNGKey(4), 1, 1, 1, 128, 128, 128)
        with pytest.raises(ValueError, match="quant dtype"):
            quantize_attention_inputs(q, k, v, "int2")

    def test_out_dtype_bf16(self):
        q, k, v = _rand_qkv(jax.random.PRNGKey(5), 1, 2, 2, 128, 128, 128)
        qi = quantize_attention_inputs(q, k, v, "int8")
        out = flash_attention_quantized(
            qi, block_sizes=BS, interpret=True
        )
        assert out.dtype == jnp.bfloat16


class TestQuantizedTriangular:
    def test_triangular_matches_rectangular(self):
        """Causal active-cell enumeration == predicated rectangular grid,
        bitwise, including ragged kv_len masking."""
        q, k, v = _rand_qkv(jax.random.PRNGKey(9), 1, 4, 2, 256, 256, 128)
        qi = quantize_attention_inputs(q, k, v, "int8")
        rect = BlockSizes(block_q=128, block_kv_major=128, block_kv=128,
                          triangular=False)
        tri = BlockSizes(block_q=128, block_kv_major=128, block_kv=128,
                         triangular=True)
        for kv_len in (256, 219):
            o1 = flash_attention_quantized(
                qi, causal=True, block_sizes=rect, kv_len=kv_len
            )
            o2 = flash_attention_quantized(
                qi, causal=True, block_sizes=tri, kv_len=kv_len
            )
            np.testing.assert_array_equal(
                np.asarray(o1, np.float32), np.asarray(o2, np.float32)
            )


class TestScaleAlgebra:
    """The rank-1 fusion identities the kernel relies on, standalone."""

    def test_score_rescale_identity(self):
        key = jax.random.PRNGKey(6)
        q = jax.random.normal(key, (8, 128))
        k = jax.random.normal(jax.random.PRNGKey(7), (16, 128))
        sq = jnp.abs(jax.random.normal(jax.random.PRNGKey(8), (8, 1))) + 0.1
        sk = jnp.abs(jax.random.normal(jax.random.PRNGKey(9), (16, 1))) + 0.1
        lhs = (q * sq) @ (k * sk).T
        rhs = (q @ k.T) * sq * sk.T
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)

    def test_pv_rescale_identity(self):
        p = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(10), (8, 16)))
        v = jax.random.normal(jax.random.PRNGKey(11), (16, 128))
        sv = jnp.abs(jax.random.normal(jax.random.PRNGKey(12), (16, 1))) + 0.1
        lhs = p @ (v * sv)
        rhs = (p * sv.T) @ v
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)


class TestQuantizedWindowSoftcap:
    @pytest.mark.parametrize("window", [1, 100, 200])
    def test_window_matches_dequantized_oracle(self, window):
        q, k, v = _rand_qkv(jax.random.PRNGKey(20), 1, 2, 2, 256, 256, 128)
        qi = quantize_attention_inputs(q, k, v, "int8")
        out = flash_attention_quantized(
            qi, causal=True, block_sizes=BS, out_dtype=jnp.float32,
            interpret=True, window=window,
        )
        qd, kd, vd = dequantize_attention_inputs(qi)
        expected = reference_gqa_attention(
            qd, kd, vd, causal=True, window=window
        )
        np.testing.assert_allclose(out, expected, atol=2e-2, rtol=2e-2)

    def test_window_triangular_matches_rectangular(self):
        q, k, v = _rand_qkv(jax.random.PRNGKey(21), 1, 2, 2, 256, 256, 128)
        qi = quantize_attention_inputs(q, k, v, "int8")
        rect = BlockSizes(block_q=128, block_kv_major=128, block_kv=128)
        tri = BlockSizes(block_q=128, block_kv_major=128, block_kv=128,
                         triangular=True)
        o1 = flash_attention_quantized(
            qi, causal=True, block_sizes=rect, window=150
        )
        o2 = flash_attention_quantized(
            qi, causal=True, block_sizes=tri, window=150
        )
        np.testing.assert_array_equal(
            np.asarray(o1, np.float32), np.asarray(o2, np.float32)
        )

    def test_softcap_and_window(self):
        q, k, v = _rand_qkv(jax.random.PRNGKey(22), 1, 4, 2, 256, 256, 128)
        qi = quantize_attention_inputs(q, k, v, "int8")
        out = flash_attention_quantized(
            qi, causal=True, block_sizes=BS, out_dtype=jnp.float32,
            interpret=True, window=120, softcap=15.0,
        )
        qd, kd, vd = dequantize_attention_inputs(qi)
        expected = reference_gqa_attention(
            qd, kd, vd, causal=True, window=120, softcap=15.0
        )
        np.testing.assert_allclose(out, expected, atol=2e-2, rtol=2e-2)

    def test_window_requires_causal(self):
        q, k, v = _rand_qkv(jax.random.PRNGKey(23), 1, 2, 2, 128, 128, 128)
        qi = quantize_attention_inputs(q, k, v, "int8")
        with pytest.raises(ValueError, match="causal"):
            flash_attention_quantized(qi, causal=False, window=32)


class TestQuantizedSinksAlibi:
    """Sinks + ALiBi in the quantized-input kernel (completing the
    attention-variant matrix for the BASELINE config-4 compute path):
    parity against the dequantized oracle with the same variants."""

    def test_alibi_matches_dequantized_oracle(self):
        from tpu_flash.core.reference import alibi_slopes

        q, k, v = _rand_qkv(jax.random.PRNGKey(30), 1, 4, 2, 256, 256, 128)
        qi = quantize_attention_inputs(q, k, v, "int8")
        sl = alibi_slopes(4)
        out = flash_attention_quantized(
            qi, causal=True, block_sizes=BS, out_dtype=jnp.float32,
            interpret=True, alibi=sl,
        )
        qd, kd, vd = dequantize_attention_inputs(qi)
        expected = reference_gqa_attention(qd, kd, vd, causal=True, alibi=sl)
        np.testing.assert_allclose(out, expected, atol=2e-2, rtol=2e-2)

    def test_sinks_match_dequantized_oracle(self):
        q, k, v = _rand_qkv(jax.random.PRNGKey(31), 1, 4, 2, 256, 256, 128)
        qi = quantize_attention_inputs(q, k, v, "int8")
        sinks = jax.random.normal(jax.random.PRNGKey(32), (4,))
        out = flash_attention_quantized(
            qi, causal=True, block_sizes=BS, out_dtype=jnp.float32,
            interpret=True, sinks=sinks,
        )
        qd, kd, vd = dequantize_attention_inputs(qi)
        expected = reference_gqa_attention(
            qd, kd, vd, causal=True, sinks=sinks
        )
        np.testing.assert_allclose(out, expected, atol=2e-2, rtol=2e-2)

    def test_all_variants_triangular_matches_rectangular(self):
        from tpu_flash.core.reference import alibi_slopes

        q, k, v = _rand_qkv(jax.random.PRNGKey(33), 1, 4, 2, 256, 256, 128)
        qi = quantize_attention_inputs(q, k, v, "int8")
        sl = alibi_slopes(4)
        sinks = jax.random.normal(jax.random.PRNGKey(34), (4,))
        rect = BlockSizes(block_q=128, block_kv_major=128, block_kv=128,
                          triangular=False)
        tri = BlockSizes(block_q=128, block_kv_major=128, block_kv=128,
                         triangular=True)
        o1 = flash_attention_quantized(
            qi, causal=True, block_sizes=rect, window=150, alibi=sl,
            sinks=sinks,
        )
        o2 = flash_attention_quantized(
            qi, causal=True, block_sizes=tri, window=150, alibi=sl,
            sinks=sinks,
        )
        np.testing.assert_array_equal(
            np.asarray(o1, np.float32), np.asarray(o2, np.float32)
        )


class TestQuantOnepass:
    """INT8 single-pass short-seq path (quantized.py::_quant_onepass_
    kernel): the bf16 onepass geometry with rank-1 dequant + int8-MXU PV.
    Parity family: must stay within the tiled int8 kernel's own
    quantization tolerance of the fp oracle (the int8 P rows add
    ~1/127-scale rounding on top of the tiled path's bf16 P)."""

    @pytest.mark.parametrize("q_len", [1024, 2048])  # fused staircase
    def test_staircase_matches_oracle(self, q_len):
        from tpu_flash.core.reference import alibi_slopes

        q, k, v = _rand_qkv(
            jax.random.PRNGKey(3), 1, 4, 2, q_len, q_len, 128
        )
        qi = quantize_attention_inputs(q, k, v, "int8")
        bs_on = BlockSizes(
            block_q=512, block_kv_major=512, block_kv=512, onepass=True,
            onepass_diag=512,
        )
        bs_off = BlockSizes(
            block_q=512, block_kv_major=512, block_kv=512, onepass=False
        )
        sinks = jax.random.normal(jax.random.PRNGKey(9), (4,), jnp.float32)
        for extras in ({}, {"softcap": 20.0}, {"sinks": sinks},
                       {"alibi": alibi_slopes(4)}):
            want = reference_gqa_attention(
                q, k, v, causal=True, sm_scale=0.125, **extras
            )
            tiled = flash_attention_quantized(
                qi, causal=True, sm_scale=0.125, block_sizes=bs_off,
                out_dtype=jnp.float32, interpret=True, **extras
            )
            one = flash_attention_quantized(
                qi, causal=True, sm_scale=0.125, block_sizes=bs_on,
                out_dtype=jnp.float32, interpret=True, **extras
            )
            e_tiled = float(jnp.max(jnp.abs(tiled - want)))
            e_one = float(jnp.max(jnp.abs(one - want)))
            # Same error family as the tiled quantized path.
            assert e_one < max(2.0 * e_tiled, 0.03), (
                list(extras), e_one, e_tiled
            )

    def test_short_seq_falls_through_to_tiled(self, monkeypatch):
        import tpu_flash.ops.flash.quantized as qz

        called = []
        real = qz._forward_onepass_quant
        monkeypatch.setattr(
            qz, "_forward_onepass_quant",
            lambda *a, **kw: called.append(1) or real(*a, **kw),
        )
        q, k, v = _rand_qkv(jax.random.PRNGKey(1), 1, 2, 2, 512, 512, 128)
        qi = quantize_attention_inputs(q, k, v, "int8")
        bs_on = BlockSizes(
            block_q=512, block_kv_major=512, block_kv=512, onepass=True,
            onepass_diag=512,
        )
        flash_attention_quantized(
            qi, causal=True, block_sizes=bs_on, interpret=True
        )
        assert not called  # 512 stays tiled
        q, k, v = _rand_qkv(jax.random.PRNGKey(1), 1, 2, 2, 1024, 1024,
                            128)
        qi = quantize_attention_inputs(q, k, v, "int8")
        flash_attention_quantized(
            qi, causal=True, block_sizes=bs_on, interpret=True
        )
        assert called
