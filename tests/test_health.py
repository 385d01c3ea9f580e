"""Failure-detection tests: NaN watchdog, step deadline, health status.

The reference's only failure handling is an abort macro (tests/main.cu:12-19)
and it computes garbage silently when inputs are bad. These tests pin the
engine-level watchdogs that replace that gap (SURVEY.md §5).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.core.config import CacheConfig, EngineConfig
from tpu_flash.engine.health import (
    DeadlineFetcher,
    HealthConfig,
    HealthMonitor,
    NumericsError,
    StepTimeoutError,
)
from tpu_flash.engine.runner import InferenceEngine
from tpu_flash.models import TINY_TEST, FlashTransformer


@pytest.fixture(scope="module")
def model_and_params():
    model = FlashTransformer(TINY_TEST)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def _engine(model, params, health=None):
    cfg = EngineConfig(
        max_batch_size=2,
        max_seq_len=256,
        prefill_chunk=64,
        cache=CacheConfig(
            page_size=8, num_pages=64, max_pages_per_seq=8,
            kv_dtype="float32",
        ),
        health=health,
    )
    return InferenceEngine(model, params, cfg, interpret=True)


class TestNaNWatchdog:
    def test_healthy_run_stays_healthy(self, model_and_params):
        model, params = model_and_params
        eng = _engine(model, params)
        eng.submit([3, 1, 4], max_new_tokens=3)
        eng.run()
        assert eng.health.status == "healthy"
        assert eng.health.steps > 0
        assert '"status": "healthy"' in eng.health.to_json()

    def test_nan_weights_raise_in_prefill(self, model_and_params):
        model, params = model_and_params
        poisoned = dict(params)
        poisoned["lm_head"] = params["lm_head"].at[0, 0].set(jnp.nan)
        eng = _engine(model, poisoned)
        eng.submit([3, 1, 4], max_new_tokens=3)
        with pytest.raises(NumericsError, match="prefill"):
            eng.run()
        assert eng.health.status == "failed"
        assert "numerics" in eng.health.failure

    def test_nan_mid_decode_names_requests(self, model_and_params):
        model, params = model_and_params
        eng = _engine(model, params)
        rid = eng.submit([3, 1, 4], max_new_tokens=4)
        eng.step()  # prefill OK
        # Poison the weights between steps: decode must trip, naming rid.
        eng.params = dict(eng.params)
        eng.params["final_norm"] = params["final_norm"] * jnp.nan
        with pytest.raises(NumericsError, match=f"requests .*{rid}"):
            eng.run()
        assert eng.health.status == "failed"

    def test_watchdog_can_be_disabled(self, model_and_params):
        model, params = model_and_params
        poisoned = dict(params)
        poisoned["lm_head"] = params["lm_head"] * jnp.nan
        eng = _engine(
            model, poisoned, health=HealthConfig(check_numerics=False)
        )
        eng.submit([3, 1, 4], max_new_tokens=2)
        out = eng.run()  # silent garbage, as configured
        assert len(out[0]) == 2
        assert eng.health.status == "healthy"


class TestDeadline:
    def test_fast_fetch_passes(self):
        f = DeadlineFetcher(timeout_s := 5.0)
        assert timeout_s
        x = jnp.arange(4)
        np.testing.assert_array_equal(f.fetch(x), np.arange(4))
        f.close()

    def test_timeout_raises(self):
        f = DeadlineFetcher(0.05)

        class Slow:
            def __array__(self):
                time.sleep(1.0)
                return np.zeros(1)

        with pytest.raises(StepTimeoutError, match="deadline"):
            f.fetch(Slow())
        f.close()

    def test_none_means_no_deadline(self):
        f = DeadlineFetcher(None)
        np.testing.assert_array_equal(f.fetch(jnp.ones(2)), np.ones(2))
        f.close()


class TestMonitor:
    def test_slow_steps_degrade(self):
        mon = HealthMonitor(HealthConfig(slow_step_factor=5.0))
        for _ in range(8):
            mon.record_step(0.01)
        assert mon.status == "healthy"
        for _ in range(2):
            mon.record_step(1.0)  # 100x the trailing mean
        assert mon.slow_steps == 2
        assert mon.status == "degraded"

    def test_config_validation(self):
        with pytest.raises(ValueError):
            HealthConfig(step_timeout_s=0)
        with pytest.raises(ValueError):
            HealthConfig(slow_step_factor=1.0)
