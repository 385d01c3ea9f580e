from tpu_flash.bench.suite import (
    bench_decode_tokens_per_s,
    bench_flash_prefill,
    attention_flops,
)
from tpu_flash.utils.profiling import (
    KernelProfile,
    profile_step,
    roofline_report,
    trace,
)

__all__ = [
    "KernelProfile",
    "attention_flops",
    "bench_decode_tokens_per_s",
    "bench_flash_prefill",
    "profile_step",
    "roofline_report",
    "trace",
]
