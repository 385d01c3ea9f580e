"""HW sweep: decode burst cap (VERDICT r1 item 4) — steady-state engine
decode throughput vs ``max_decode_burst``. On dispatch-bound attachments
(the axon relay: ~100 ms/round-trip) bigger bursts amortize host work;
the cost is admission latency (a waiting request sits out up to a full
burst). Run: python tools/hw_ab/burst_sweep.py"""
import jax

from tpu_flash.bench.suite import bench_engine_tokens_per_s

print("backend:", jax.default_backend(), flush=True)

for burst in (1, 4, 8, 16, 32):
    tps, wall, m, _ = bench_engine_tokens_per_s(max_decode_burst=burst)
    print(f"burst={burst:3d}: {tps:7.0f} tok/s  wall {wall:.1f}s  "
          f"p50 step {m.get('p50_step_ms', 0):.1f} ms", flush=True)
print("DONE", flush=True)
