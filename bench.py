#!/usr/bin/env python
"""Headline benchmark: attention TFLOP/s/chip on BASELINE config 2
(Llama-2-7B prefill shapes: 32 heads, d=128, seq 2K, causal BF16).

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline = fraction of the self-established roofline for this shape on
this chip (the reference publishes no numbers; BASELINE.md target is 0.90).
Details go to stderr.
"""

import json
import sys


def main():
    import jax

    on_tpu = jax.default_backend() == "tpu"
    from tpu_flash.bench.suite import bench_flash_prefill

    if on_tpu:
        # MEDIAN of 5 measurements. Relay timing drifts in BOTH
        # directions: dispatch congestion deflates a differential
        # reading, but drift BETWEEN the t(n) and t(2n) runs can inflate
        # one past the physical ceiling (a best-of-5 once recorded 186.7
        # TF/s — above the 171 TF/s raw-XLA matmul ceiling, so plainly a
        # timing artifact; BENCHLOG 2026-08-20). The median is robust to
        # both tails; paired in-process A/Bs remain the variant-decision
        # tool.
        runs = sorted(
            (
                bench_flash_prefill(
                    batch=1, num_q_heads=32, num_kv_heads=32, seq=2048,
                    head_dim=128, causal=True, iters=64,
                )
                for _ in range(5)
            ),
            key=lambda r: r.tflops,
        )
        res = runs[len(runs) // 2]
    else:
        # CPU fallback (no TPU attached): tiny shape, still one JSON line.
        res = bench_flash_prefill(
            batch=1, num_q_heads=2, num_kv_heads=2, seq=256, head_dim=64,
            causal=True, iters=3,
        )

    print(
        f"[bench] {res.name}: {res.seconds * 1e3:.3f} ms/iter, "
        f"{res.tflops:.2f} TFLOP/s (roofline {res.roofline_tflops:.1f}, "
        f"{res.roofline_frac * 100:.1f}%), HBM {res.hbm_gbps:.1f} GB/s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "attention TFLOP/s/chip (Llama-2-7B 2K causal BF16 prefill)",
                "value": round(res.tflops, 3),
                "unit": "TFLOP/s",
                "vs_baseline": round(res.roofline_frac, 4),
                # Fraction of the MEASURED compute ceiling for this
                # geometry: 171 TF/s raw-XLA matmul-chain rate x 0.8
                # useful/computed FLOPs of the single-pass bq512 causal
                # walk ~= 137 useful TF/s (BENCHLOG 2026-08-19/20).
                # vs_baseline keeps the nominal 197 TF/s roofline
                # denominator for cross-round comparability.
                "vs_measured_ceiling": round(res.tflops / 137.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
