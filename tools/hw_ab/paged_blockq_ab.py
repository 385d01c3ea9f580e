"""HW A/B #3: paged-prefill tiling sweep — int8/int4 8K-history chunk
prefill across (block_q, pages_per_compute_block), paired in-process.
(rows=2048 tilings no longer compile: 25.3M scoped vmem vs the 16M
limit; the sweep stays at folded rows<=1024.)"""
import jax, jax.numpy as jnp, numpy as np
from tpu_flash.bench.suite import _time_chained
from tpu_flash.ops.flash import paged_prefill_attention
from tpu_flash.ops.quant import QuantizedTensor, quantize_pages

print("backend:", jax.default_backend(), flush=True)

B, HQ, HKV, D, PS = 1, 32, 8, 128, 128
HIST, CHUNK = 8192, 512
pps = HIST // PS
npages = B * pps + 1

for KV in ("int8", "int4"):
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    kf = jax.random.normal(ks[0], (HKV, npages, PS, D), jnp.float32)
    vf = jax.random.normal(ks[1], (HKV, npages, PS, D), jnp.float32)
    kq, vq = quantize_pages(kf, KV), quantize_pages(vf, KV)
    k_vals, k_scales = kq.values, kq.scales.squeeze(-1)
    v_vals, v_scales = vq.values, vq.scales.squeeze(-1)
    packing = "tokens" if KV == "int4" else "lanes"
    tables = jax.random.permutation(ks[2], npages)[: B * pps].reshape(
        B, pps).astype(jnp.int32)
    q = jax.random.normal(ks[3], (B, HQ, CHUNK, D), jnp.bfloat16)
    ck = jax.random.normal(ks[4], (B, HKV, CHUNK, D), jnp.bfloat16)
    cv = jax.random.normal(jax.random.fold_in(ks[4], 1),
                           (B, HKV, CHUNK, D), jnp.bfloat16)
    offs = jnp.full((B,), HIST, jnp.int32)

    def step(bq, ppb):
        def f(x, ck, cv, kv_, ks_, vv_, vs_, offs, tables):
            kp = QuantizedTensor(kv_, ks_[..., None], KV, packing)
            vp = QuantizedTensor(vv_, vs_[..., None], KV, packing)
            return paged_prefill_attention(
                x, ck, cv, kp, vp, offs, tables, hist_cap=HIST,
                block_q=bq, pages_per_compute_block=ppb,
                interpret=False).astype(x.dtype)
        return f

    args = (q, ck, cv, k_vals, k_scales, v_vals, v_scales, offs, tables)
    ref = None
    for bq, ppb in ((256, 16), (256, 8), (256, 32), (128, 16), (256, 64)):
        try:
            o = np.asarray(jax.jit(step(bq, ppb))(*args))
        except Exception as e:
            print(f"{KV} bq={bq} ppb={ppb}: FAIL "
                  f"{str(e).splitlines()[0][:90]}", flush=True)
            continue
        if ref is None:
            ref = o
        err = float(np.max(np.abs(o.astype(np.float32)
                                  - ref.astype(np.float32))))
        t = _time_chained(step(bq, ppb), *args, inner=32)
        print(f"{KV} bq={bq} ppb={ppb}: {t*1e6:.0f} us (err {err:.1e})",
              flush=True)
print("DONE", flush=True)
