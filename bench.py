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


def _backend_alive(timeout_s: float = 180.0) -> bool:
    """Probe the accelerator in a SUBPROCESS: a dead relay hangs backend
    init indefinitely (observed 2026-08-21), which would otherwise hang
    this whole script. Timeout => fall back to the CPU path."""
    import subprocess
    import sys as _sys

    try:
        r = subprocess.run(
            [
                _sys.executable,
                "-c",
                "import jax; import jax.numpy as jnp; "
                "jnp.zeros(()) + 1; print(jax.default_backend())",
            ],
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False
    return r.returncode == 0 and r.stdout.strip() == "tpu"


def main():
    alive = _backend_alive()
    import jax

    if not alive:
        print(
            "[bench] accelerator backend unavailable; CPU fallback",
            file=sys.stderr,
        )
        jax.config.update("jax_platforms", "cpu")
    on_tpu = alive and jax.default_backend() == "tpu"
    from tpu_flash.bench.suite import bench_flash_prefill

    if on_tpu:
        # MEDIAN of 5 measurements with the auto-calibrated large-window
        # differential (suite._time_chained: >=150 ms walls cancel the
        # ~23 ms relay dispatch overhead and its multi-ms jitter — the
        # source of r3's 111-157 TF/s cross-process band; BENCHLOG
        # 2026-08-20 round 4). min/max of the 5 go out as "spread" so
        # every headline row carries its own error bars.
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
        spread = {
            "min": round(runs[0].tflops, 3),
            "max": round(runs[-1].tflops, 3),
            "n": len(runs),
        }
    else:
        # CPU fallback (no TPU attached): tiny shape, still one JSON line.
        res = bench_flash_prefill(
            batch=1, num_q_heads=2, num_kv_heads=2, seq=256, head_dim=64,
            causal=True, iters=3,
        )
        spread = None

    print(
        f"[bench] {res.name}: {res.seconds * 1e3:.3f} ms/iter, "
        f"{res.tflops:.2f} TFLOP/s (roofline {res.roofline_tflops:.1f}, "
        f"{res.roofline_frac * 100:.1f}%), HBM {res.hbm_gbps:.1f} GB/s",
        file=sys.stderr,
    )
    out = {
        "metric": "attention TFLOP/s/chip (Llama-2-7B 2K causal BF16 prefill)",
        "value": round(res.tflops, 3),
        "unit": "TFLOP/s",
        "vs_baseline": round(res.roofline_frac, 4),
        # Fraction of the MEASURED compute ceiling for this
        # geometry: 167 TF/s raw-XLA score->pv matmul-chain rate
        # (stable large-window protocol, BENCHLOG 2026-08-20 r4) x
        # 0.8 useful/computed FLOPs of the 512-row causal staircase
        # ~= 133.6 useful TF/s. vs_baseline keeps the nominal 197
        # TF/s roofline denominator for cross-round comparability.
        "vs_measured_ceiling": round(res.tflops / 133.6, 4),
        # The ASSERTED gate (BASELINE.md rows 2/4/5, renegotiated r5):
        # >= 95% of the measured geometry ceiling. The nominal-roofline
        # >= 90% target is unreachable on this part — its own XLA
        # matmul-chain rate is 85-94% of nominal before any
        # attention-specific work (BENCHLOG 2026-08-20/21 probes).
        "target_measured_ceiling": 0.95,
        "ceiling_pass": bool(res.tflops / 133.6 >= 0.95) if on_tpu else None,
    }
    if spread is not None:
        out["spread"] = spread
    print(json.dumps(out))


if __name__ == "__main__":
    main()
