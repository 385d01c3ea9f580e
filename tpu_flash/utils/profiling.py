"""Tracing, per-kernel profiling, and roofline reporting.

The reference has no profiling at all — its closest artifacts are the
device-property printout (main.cpp:5-26) and printf inspection in tests
(SURVEY.md §5 "Tracing / profiling: Absent"). This module provides the
TPU-native subsystem the build plan requires:

* ``trace(logdir)`` — context manager around ``jax.profiler`` emitting an
  XProf/Perfetto trace of everything inside (kernel timelines, HBM traffic,
  per-op breakdown; open with xprof/tensorboard).
* ``profile_step`` — wall-clock timing of a step function with the
  relay-safe chained-differential method, annotated with FLOPs/bytes.
* ``roofline_report`` — achieved vs achievable (min(MXU peak, intensity x
  HBM bandwidth)) per profile, feeding the BASELINE "≥90% of roofline"
  gate.
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Iterable, Optional

import jax

from tpu_flash.utils.device import DeviceInfo, device_info


@contextlib.contextmanager
def trace(logdir: str, *, host_tracer_level: int = 2):
    """Capture an XProf trace of the enclosed block.

    Produces a ``plugins/profile/...`` tree under ``logdir`` viewable with
    xprof / tensorboard-profile. On non-TPU backends this still records
    host/XLA events, so CI can smoke-test the integration.
    """
    options = jax.profiler.ProfileOptions()
    options.host_tracer_level = host_tracer_level
    jax.profiler.start_trace(logdir, profiler_options=options)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass(frozen=True)
class KernelProfile:
    """One profiled kernel/step: measured time + roofline placement."""

    name: str
    seconds: float
    flops: float
    hbm_bytes: float
    device: DeviceInfo

    @property
    def tflops(self) -> float:
        return self.flops / self.seconds / 1e12

    @property
    def hbm_gbps(self) -> float:
        return self.hbm_bytes / self.seconds / 1e9

    @property
    def intensity(self) -> float:
        """Arithmetic intensity, FLOP per HBM byte."""
        return self.flops / max(self.hbm_bytes, 1.0)

    @property
    def roofline_tflops(self) -> float:
        return self.device.roofline_attention_tflops(
            self.flops, self.hbm_bytes
        )

    @property
    def roofline_frac(self) -> float:
        r = self.roofline_tflops
        return self.tflops / r if r else 0.0

    @property
    def bound(self) -> str:
        """Which roof applies at this intensity: "mxu" or "hbm"."""
        bw_tflops = (
            self.intensity * self.device.hbm_bandwidth_gbps * 1e9 / 1e12
        )
        return "hbm" if bw_tflops < self.device.peak_bf16_tflops else "mxu"

    def row(self) -> str:
        return (
            f"{self.name:<44s} {self.seconds * 1e3:>8.3f} ms "
            f"{self.tflops:>7.1f} TF/s {self.hbm_gbps:>7.1f} GB/s "
            f"{100 * self.roofline_frac:>5.1f}% of {self.bound} roof"
        )


def profile_step(
    step,
    x0,
    *rest,
    name: str,
    flops: float,
    hbm_bytes: float,
    inner: int = 16,
    info: Optional[DeviceInfo] = None,
) -> KernelProfile:
    """Profile ``step(x, *rest) -> x`` with chained differential timing
    (bench/suite.py): jit once, time n vs 2n in-jit iterations, difference
    out dispatch/transfer overhead. Relay-safe (D2H fetch is the barrier)."""
    from tpu_flash.bench.suite import _time_chained

    secs = _time_chained(step, x0, *rest, inner=inner)
    return KernelProfile(
        name=name,
        seconds=secs,
        flops=flops,
        hbm_bytes=hbm_bytes,
        device=info or device_info(),
    )


def roofline_report(profiles: Iterable[KernelProfile]) -> str:
    """Multi-line report: achieved vs roofline per profile."""
    profiles = list(profiles)
    if not profiles:
        return "(no profiles)"
    info = profiles[0].device
    header = (
        f"device: {info.kind} | peak {info.peak_bf16_tflops:.0f} BF16 "
        f"TFLOP/s | HBM {info.hbm_bandwidth_gbps:.0f} GB/s\n"
        f"{'kernel':<44s} {'time':>11s} {'achieved':>12s} "
        f"{'hbm':>12s} {'roofline':>20s}"
    )
    return "\n".join([header] + [p.row() for p in profiles])
