"""HW A/B: decode page-pipeline depth (VERDICT r1 item 9) — does a 3-slot
(or deeper) DMA pipeline beat the 2-slot double buffer? If the 2-slot
pipeline already hides all DMA latency behind compute, deeper pipelines
only cost VMEM. Interleaved round-robin timing so relay drift cancels.
Run: `python tools/hw_ab/pipeline_slots_ab.py`."""
import jax, jax.numpy as jnp, numpy as np
from tpu_flash.bench.suite import _time_chained
from tpu_flash.ops.decode import paged_attention
from tpu_flash.ops.quant import quantize_pages, QuantizedTensor

print("backend:", jax.default_backend(), flush=True)

B, HQ, HKV, D, PS = 8, 32, 8, 128, 1024
REPS = 3

for mode, ctx, bb in (("bf16", 8192, B), ("int8", 8192, B),
                      ("int4", 32768, 4)):
    pps = ctx // PS
    npages = bb * pps + 1
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    kf = jax.random.normal(ks[0], (HKV, npages, PS, D), jnp.float32)
    vf = jax.random.normal(ks[1], (HKV, npages, PS, D), jnp.float32)
    tables = jax.random.permutation(ks[2], npages)[: bb * pps].reshape(
        bb, pps).astype(jnp.int32)
    q = jax.random.normal(ks[3], (bb, HQ, D), jnp.bfloat16)
    lengths = jnp.full((bb,), ctx - 3, jnp.int32)
    if mode == "bf16":
        parts = (kf.astype(jnp.bfloat16), vf.astype(jnp.bfloat16))
        rebuild = lambda kv, vv: (kv, vv)
    else:
        kq, vq = quantize_pages(kf, mode), quantize_pages(vf, mode)
        pk = kq.packing
        parts = (kq.values, kq.scales, vq.values, vq.scales)
        rebuild = lambda kv, ks, vv, vs, mode=mode, pk=pk: (
            QuantizedTensor(kv, ks, mode, pk),
            QuantizedTensor(vv, vs, mode, pk),
        )

    # KV pages ride as raw-array jit ARGUMENTS (closure capture embeds
    # them as HLO constants and blows the relay's compile request limit;
    # QuantizedTensor has static string fields).
    steps = {
        ns: (lambda q, *p, ns=ns: paged_attention(
            q, *rebuild(*p), lengths, tables, pipeline_slots=ns))
        for ns in (2, 3, 4)
    }
    # parity on device first
    outs = {ns: np.asarray(jax.jit(fn)(q, *parts))
            for ns, fn in steps.items()}
    for ns in (3, 4):
        err = float(np.max(np.abs(outs[ns].astype(np.float32)
                                  - outs[2].astype(np.float32))))
        print(f"{mode} ctx{ctx}: parity {ns}v2 slots: {err:.1e}", flush=True)

    # interleaved timing: visit each variant REPS times round-robin
    acc = {ns: [] for ns in steps}
    for r in range(REPS):
        for ns, fn in steps.items():
            acc[ns].append(_time_chained(fn, q, *parts, inner=64))
    for ns in steps:
        t = float(np.median(acc[ns]))
        print(f"{mode} ctx{ctx} slots={ns}: {t*1e6:.0f} us/step "
              f"{bb/t/1e3:.1f}k tok/s  (runs: "
              + ",".join(f"{x*1e6:.0f}" for x in acc[ns]) + ")", flush=True)
print("DONE", flush=True)
