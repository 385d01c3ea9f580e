"""Quantization round-trip and error-bound tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.ops.quant import QuantizedTensor, dequantize, quantize, quantize_pallas


class TestQuantRoundTrip:
    @pytest.mark.parametrize("dtype_name,rel_err", [
        ("int8", 0.01), ("int4", 0.16), ("fp8", 0.07),
    ])
    def test_per_row_error_bound(self, dtype_name, rel_err):
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 64, 128))
        qt = quantize(x, dtype_name)
        back = dequantize(qt)
        # Symmetric absmax: worst-case error ~ absmax / (2*qmax) per element.
        absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        err = jnp.abs(back - x)
        assert float(jnp.max(err / absmax)) <= rel_err

    def test_int4_packing_exact(self):
        x = jnp.array([[-7.0, -3.0, 0.0, 1.0, 3.0, 7.0, 5.0, -1.0]])
        qt = quantize(x, "int4")
        assert qt.values.shape == (1, 4)  # packed two per byte
        assert qt.logical_shape == (1, 8)
        back = dequantize(qt)
        np.testing.assert_allclose(back, x, atol=1e-6)

    def test_int4_random_round_trip(self):
        x = jax.random.normal(jax.random.PRNGKey(9), (3, 5, 32))
        back = dequantize(quantize(x, "int4"))
        absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        # Half-step worst case: absmax / (2 * 7).
        assert float(jnp.max(jnp.abs(back - x) / absmax)) <= 0.5 / 7 + 1e-6

    def test_zero_rows_stable(self):
        x = jnp.zeros((4, 16))
        for dt in ("int8", "int4", "fp8"):
            back = dequantize(quantize(x, dt))
            np.testing.assert_array_equal(back, x)

    def test_scales_shape(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 16, 64))
        qt = quantize(x, "int8")
        assert qt.scales.shape == (2, 3, 16, 1)
        assert qt.values.dtype == jnp.int8

    def test_pallas_quant_matches_jnp(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 2, 64, 128))
        ref = quantize(x, "int8")
        got = quantize_pallas(x)
        np.testing.assert_array_equal(got.values, ref.values)
        np.testing.assert_allclose(got.scales, ref.scales, rtol=1e-6)
