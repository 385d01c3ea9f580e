"""Data-parallel serving: replica engines over disjoint device groups.

DP is a pure scale-out — greedy outputs must match a single engine
request-for-request (replicas never interact), routing must balance load,
and snapshots must round-trip the whole replica set (SURVEY.md §2
parallelism checklist, DP row)."""

import jax
import pytest

from tpu_flash.checkpoint import restore_dp_engine, snapshot_dp_engine
from tpu_flash.core.config import CacheConfig, EngineConfig
from tpu_flash.engine import DataParallelEngine
from tpu_flash.engine.runner import InferenceEngine
from tpu_flash.models import TINY_TEST, FlashTransformer

requires_8 = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


@pytest.fixture(scope="module")
def model_and_params():
    model = FlashTransformer(TINY_TEST)
    return model, model.init(jax.random.PRNGKey(0))


def _config():
    return EngineConfig(
        max_batch_size=2,
        max_seq_len=256,
        prefill_chunk=16,
        cache=CacheConfig(
            page_size=8, num_pages=64, max_pages_per_seq=8,
            kv_dtype="float32",
        ),
    )


PROMPTS = [
    [3, 14, 15, 9, 2, 6],
    [27, 1, 8],
    [5, 5, 5, 5],
    [42, 17, 3, 99, 4],
]


class TestDataParallelEngine:
    @requires_8
    @pytest.mark.parametrize("tp", [1, 2])
    def test_dp_matches_single_engine(self, model_and_params, tp):
        model, params = model_and_params

        # Reference: each prompt alone through a single engine (greedy
        # decode is per-slot exact, so batching can't change tokens).
        expected = []
        for p in PROMPTS:
            ref = InferenceEngine(model, params, _config(), interpret=True)
            r = ref.submit(p, max_new_tokens=5)
            expected.append(ref.run()[r])
            ref.close()

        dp = DataParallelEngine(
            model, params, _config(), replicas=2, tp=tp, interpret=True
        )
        rids = [dp.submit(p, max_new_tokens=5) for p in PROMPTS]
        out = dp.run()
        for rid, exp in zip(rids, expected):
            assert out[rid] == exp
        dp.close()

    @requires_8
    def test_routing_balances_load(self, model_and_params):
        model, params = model_and_params
        dp = DataParallelEngine(
            model, params, _config(), replicas=2, tp=1, interpret=True
        )
        for p in PROMPTS:
            dp.submit(p, max_new_tokens=2)
        reps = [rep for rep, _ in dp._route.values()]
        assert sorted(reps) == [0, 0, 1, 1]
        dp.close()

    @requires_8
    def test_replicas_pinned_to_disjoint_devices(self, model_and_params):
        model, params = model_and_params
        dp = DataParallelEngine(
            model, params, _config(), replicas=2, tp=2, interpret=True
        )
        sets = [
            {d.id for d in eng.mesh.devices.flat} for eng in dp.engines
        ]
        assert sets[0].isdisjoint(sets[1])
        dp.close()

    @requires_8
    def test_too_few_devices_rejected(self, model_and_params):
        model, params = model_and_params
        with pytest.raises(ValueError, match="devices"):
            DataParallelEngine(
                model, params, _config(),
                replicas=jax.device_count(), tp=2, interpret=True,
            )

    @requires_8
    def test_snapshot_restore_mid_decode(self, model_and_params, tmp_path):
        model, params = model_and_params
        golden = DataParallelEngine(
            model, params, _config(), replicas=2, tp=1, interpret=True
        )
        rids = [golden.submit(p, max_new_tokens=6) for p in PROMPTS]
        expected = golden.run()
        golden.close()

        first = DataParallelEngine(
            model, params, _config(), replicas=2, tp=1, interpret=True
        )
        for eng in first.engines:
            eng.max_decode_burst = 2
        rids2 = [first.submit(p, max_new_tokens=6) for p in PROMPTS]
        assert rids2 == rids  # same routing ids
        for _ in range(3):
            first.step()
        assert first.has_work()  # genuinely interrupted
        snapshot_dp_engine(tmp_path / "dp", first)
        partial = {k: list(v) for k, v in first.outputs.items()}
        first.close()

        second = DataParallelEngine(
            model, params, _config(), replicas=2, tp=1, interpret=True
        )
        restore_dp_engine(tmp_path / "dp", second)
        assert {k: list(v) for k, v in second.outputs.items()} == partial
        assert second.run() == expected
        second.close()
