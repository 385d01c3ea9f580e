from tpu_flash.bench.suite import (
    bench_decode_tokens_per_s,
    bench_flash_prefill,
    attention_flops,
)

__all__ = [
    "bench_flash_prefill",
    "bench_decode_tokens_per_s",
    "attention_flops",
]
