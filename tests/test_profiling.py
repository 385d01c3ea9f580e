"""Profiling/tracing subsystem tests (SURVEY.md §5 "Tracing / profiling").

The trace context must produce an XProf artifact tree; KernelProfile must
place measurements on the right roof; profile_step must time a real jitted
step end-to-end.
"""

import os

import jax.numpy as jnp
import pytest

from tpu_flash.utils.device import DeviceInfo
from tpu_flash.utils.profiling import (
    KernelProfile,
    profile_step,
    roofline_report,
    trace,
)

V5E = DeviceInfo(
    kind="TPU v5 lite",
    platform="tpu",
    num_devices=1,
    num_local_devices=1,
    hbm_bytes=16 * 2**30,
    hbm_bandwidth_gbps=819,
    vmem_bytes=128 * 2**20,
    peak_bf16_tflops=197,
)


class TestKernelProfile:
    def test_mxu_bound_placement(self):
        # High intensity (flash prefill-like): MXU roof applies.
        p = KernelProfile(
            name="prefill", seconds=1e-3, flops=100e12 * 1e-3,
            hbm_bytes=50e9 * 1e-3, device=V5E,
        )
        assert p.bound == "mxu"
        assert p.roofline_tflops == pytest.approx(197.0)
        assert p.roofline_frac == pytest.approx(100 / 197, rel=1e-3)
        assert p.tflops == pytest.approx(100.0)

    def test_hbm_bound_placement(self):
        # Low intensity (decode-like): bandwidth roof applies.
        p = KernelProfile(
            name="decode", seconds=1e-3, flops=1e12 * 1e-3,
            hbm_bytes=500e9 * 1e-3, device=V5E,
        )
        assert p.bound == "hbm"
        # roof = intensity * bw = (1e9/500e9 FLOP/B) * 819 GB/s
        assert p.roofline_tflops == pytest.approx(2 * 0.819, rel=1e-2)

    def test_report_formatting(self):
        p = KernelProfile(
            name="k", seconds=1e-3, flops=1e10, hbm_bytes=1e8, device=V5E,
        )
        rep = roofline_report([p])
        assert "TPU v5 lite" in rep
        assert "k" in rep
        assert "% of" in rep

    def test_empty_report(self):
        assert roofline_report([]) == "(no profiles)"


class TestProfileStep:
    def test_times_a_real_step(self):
        w = jnp.eye(128, dtype=jnp.float32)
        x0 = jnp.ones((128, 128), jnp.float32)

        def step(x, w):
            return x @ w

        p = profile_step(
            step, x0, w, name="matmul128", flops=2 * 128**3,
            hbm_bytes=3 * 128 * 128 * 4, inner=4,
        )
        assert p.seconds > 0
        assert p.tflops > 0
        assert "matmul128" in p.row()


class TestTrace:
    def test_trace_produces_profile_tree(self, tmp_path):
        logdir = str(tmp_path / "trace")
        with trace(logdir):
            x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
            x.block_until_ready()
        # XProf writes plugins/profile/<run>/...
        prof_root = os.path.join(logdir, "plugins", "profile")
        assert os.path.isdir(prof_root)
        runs = os.listdir(prof_root)
        assert runs, "no profiler run captured"
        files = os.listdir(os.path.join(prof_root, runs[0]))
        assert any(f.endswith(".xplane.pb") for f in files)
