"""TPU device probing.

TPU-native replacement for the reference's ``check_gpu_props`` CUDA probe
(main.cpp:5-26), which printed SM count, memory sizes, and warp width. Here
we report the per-chip characteristics that drive kernel tuning on TPU:
device kind/generation, HBM capacity & bandwidth, VMEM budget, MXU shape,
and the slice topology (core count, mesh shape over ICI).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax

# Per-generation hardware table. Bandwidth in GB/s, VMEM/HBM in bytes,
# peak dense TFLOP/s at bf16. native_fp8: the MXU multiplies e4m3
# operands directly (v6e+/Trillium); earlier generations emulate fp8
# matmuls with a software e4m3->bf16 cast per tile (~2.4x slower than
# int8 on v5e, BENCHLOG). Sources: public TPU spec sheets.
_GENERATION_TABLE = {
    # kind-substring:
    #   (hbm_gb, hbm_gbps, vmem_bytes, bf16_tflops, mxus_per_core, native_fp8)
    "v4": (32, 1228, 128 * 2**20, 275, 4, False),
    "v5 lite": (16, 819, 128 * 2**20, 197, 4, False),
    "v5e": (16, 819, 128 * 2**20, 197, 4, False),
    "v5p": (95, 2765, 128 * 2**20, 459, 8, False),
    "v5": (16, 819, 128 * 2**20, 197, 4, False),
    "v6e": (32, 1640, 128 * 2**20, 918, 8, True),
    "v6 lite": (32, 1640, 128 * 2**20, 918, 8, True),
    "v7": (192, 7400, 128 * 2**20, 2307, 8, True),
}
_DEFAULT_ROW = (16, 819, 128 * 2**20, 197, 4, False)


@dataclasses.dataclass(frozen=True)
class DeviceInfo:
    kind: str
    platform: str
    num_devices: int
    num_local_devices: int
    hbm_bytes: int
    hbm_bandwidth_gbps: float
    vmem_bytes: int
    peak_bf16_tflops: float
    mxu_shape: tuple = (128, 128)
    # e4m3 operands feed the MXU directly (no software cast): v6e+.
    native_fp8_matmul: bool = False

    @property
    def peak_fp32_tflops(self) -> float:
        return self.peak_bf16_tflops / 8  # MXU fp32 passes

    def roofline_attention_tflops(
        self, flops: float, hbm_bytes: float
    ) -> float:
        """Achievable TFLOP/s for a kernel with this FLOP:byte ratio."""
        intensity = flops / max(hbm_bytes, 1.0)
        bw = self.hbm_bandwidth_gbps * 1e9
        return min(self.peak_bf16_tflops * 1e12, intensity * bw) / 1e12


def device_info(device: Optional[jax.Device] = None) -> DeviceInfo:
    """Probe the current JAX device set (the check_gpu_props equivalent)."""
    devices = jax.devices()
    dev = device or devices[0]
    kind = getattr(dev, "device_kind", "cpu") or "cpu"
    row = _DEFAULT_ROW
    kind_l = kind.lower()
    for key in sorted(_GENERATION_TABLE, key=len, reverse=True):
        if key in kind_l:
            row = _GENERATION_TABLE[key]
            break
    hbm_gb, hbm_gbps, vmem, tflops, _, native_fp8 = row
    return DeviceInfo(
        kind=kind,
        platform=dev.platform,
        num_devices=len(devices),
        num_local_devices=len(jax.local_devices()),
        hbm_bytes=hbm_gb * 2**30,
        hbm_bandwidth_gbps=hbm_gbps,
        vmem_bytes=vmem,
        peak_bf16_tflops=tflops,
        native_fp8_matmul=native_fp8,
    )


def print_device_info() -> None:
    info = device_info()
    print(f"device kind        : {info.kind}")
    print(f"platform           : {info.platform}")
    print(f"devices (global)   : {info.num_devices}")
    print(f"devices (local)    : {info.num_local_devices}")
    print(f"HBM                : {info.hbm_bytes / 2**30:.0f} GiB")
    print(f"HBM bandwidth      : {info.hbm_bandwidth_gbps:.0f} GB/s")
    print(f"VMEM               : {info.vmem_bytes / 2**20:.0f} MiB")
    print(f"peak BF16 TFLOP/s  : {info.peak_bf16_tflops:.0f}")
    print(f"MXU                : {info.mxu_shape}")
    print(f"native fp8 MXU     : {info.native_fp8_matmul}")


if __name__ == "__main__":
    print_device_info()
