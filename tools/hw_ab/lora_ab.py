"""HW A/B: multi-LoRA serving overhead — steady-state engine decode
throughput with every request tagged with a full-coverage adapter
(all layers, all 7 projections) vs the untagged base engine.
Run on the TPU relay: `python tools/hw_ab/lora_ab.py`."""
import jax

from tpu_flash.bench.suite import bench_engine_tokens_per_s

print("backend:", jax.default_backend(), flush=True)

base = None
for rank in (0, 16, 64):
    tps, wall, m, _ = bench_engine_tokens_per_s(lora_rank=rank)
    tag = "base" if rank == 0 else f"lora r={rank}"
    if rank == 0:
        base = tps
        print(f"{tag}: {tps:.0f} tok/s (p50 step "
              f"{m.get('p50_step_ms', 0):.1f} ms)", flush=True)
    else:
        print(f"{tag}: {tps:.0f} tok/s ({tps / base:.3f}x base, p50 step "
              f"{m.get('p50_step_ms', 0):.1f} ms)", flush=True)
print("DONE", flush=True)
