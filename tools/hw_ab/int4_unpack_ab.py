"""HW A/B: int4 decode nibble unpack (VERDICT r1 item 5, third attempt).

Old path: i8->i32 widening + 2 shifts + i32 concat + i32->i8 narrowing on
the whole [tokens, d] payload (the measured VPU bound: 174 us vs ~90 us
payload-DMA floor). New path (int4_bitwise_unpack=True): nibble planes via
i8 AND/XOR only — lo+8 = (byte & 0x0F) ^ 0x08, 16*hi = byte & 0xF0 — with
the bias/x16 folded into rank-1 matmul corrections and scales. K scores
are bitwise-identical; PV runs as two half-matmuls (per-half P scales).
Interleaved round-robin timing. Run: python tools/hw_ab/int4_unpack_ab.py
"""
import jax, jax.numpy as jnp, numpy as np
from tpu_flash.bench.suite import _time_chained
from tpu_flash.ops.decode import paged_attention
from tpu_flash.ops.quant import quantize_pages, QuantizedTensor

print("backend:", jax.default_backend(), flush=True)

HQ, HKV, D, PS = 32, 8, 128, 1024
REPS = 3

for ctx, bb in ((8192, 8), (32768, 4)):
    pps = ctx // PS
    npages = bb * pps + 1
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    kf = jax.random.normal(ks[0], (HKV, npages, PS, D), jnp.float32)
    vf = jax.random.normal(ks[1], (HKV, npages, PS, D), jnp.float32)
    tables = jax.random.permutation(ks[2], npages)[: bb * pps].reshape(
        bb, pps).astype(jnp.int32)
    q = jax.random.normal(ks[3], (bb, HQ, D), jnp.bfloat16)
    lengths = jnp.full((bb,), ctx - 3, jnp.int32)
    kq, vq = quantize_pages(kf, "int4"), quantize_pages(vf, "int4")
    parts = (kq.values, kq.scales, vq.values, vq.scales)
    rebuild = lambda kv, ksc, vv, vs: (
        QuantizedTensor(kv, ksc, "int4", "tokens"),
        QuantizedTensor(vv, vs, "int4", "tokens"),
    )

    steps = {
        name: (lambda q, *p, bw=bw: paged_attention(
            q, *rebuild(*p), lengths, tables, pages_per_compute_block=4,
            int4_bitwise_unpack=bw))
        for name, bw in (("unpack-i32", False), ("bitwise-i8", True))
    }
    outs = {n: np.asarray(jax.jit(fn)(q, *parts)) for n, fn in steps.items()}
    err = float(np.max(np.abs(outs["bitwise-i8"].astype(np.float32)
                              - outs["unpack-i32"].astype(np.float32))))
    print(f"ctx{ctx}: bitwise vs unpack max diff {err:.2e} "
          "(PV P-quant split differs; K scores bitwise-equal)", flush=True)

    acc = {n: [] for n in steps}
    for r in range(REPS):
        for n, fn in steps.items():
            acc[n].append(_time_chained(fn, q, *parts, inner=64))
    for n in steps:
        t = float(np.median(acc[n]))
        print(f"ctx{ctx} {n}: {t*1e6:.0f} us/step {bb/t/1e3:.1f}k tok/s "
              "(runs: " + ",".join(f"{x*1e6:.0f}" for x in acc[n]) + ")",
              flush=True)
print("DONE", flush=True)
