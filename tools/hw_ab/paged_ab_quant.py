"""HW A/B #2: chunk prefill over 8K QUANTIZED history — in-kernel paged
sweep vs engine-faithful gather-to-dense (fancy-index pages, dequantize,
concat, dense flash). Llama-3-8B-ish GQA shapes."""
import time, jax, jax.numpy as jnp, numpy as np
from tpu_flash.bench.suite import _time_chained
from tpu_flash.ops.flash import paged_prefill_attention, flash_attention
from tpu_flash.ops.quant import QuantizedTensor, dequantize, quantize_pages

print("backend:", jax.default_backend(), flush=True)

B, HQ, HKV, D, PS = 1, 32, 8, 128, 128
HIST, CHUNK = 8192, 512
pps = HIST // PS
npages = B * pps + 1

for KV in ("int8", "int4"):
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    kf = jax.random.normal(ks[0], (HKV, npages, PS, D), jnp.float32)
    vf = jax.random.normal(ks[1], (HKV, npages, PS, D), jnp.float32)
    kq = quantize_pages(kf, KV)
    vq = quantize_pages(vf, KV)
    # cache layout: values [hkv, np, pr, d], scales [hkv, np, ps]
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

    def paged_step(x, ck, cv, kv_, ks_, vv_, vs_, offs, tables):
        kp = QuantizedTensor(kv_, ks_[..., None], KV, packing)
        vp = QuantizedTensor(vv_, vs_[..., None], KV, packing)
        return paged_prefill_attention(
            x, ck, cv, kp, vp, offs, tables, hist_cap=HIST,
            interpret=False).astype(x.dtype)

    def gather_step(x, ck, cv, kv_, ks_, vv_, vs_, tables):
        def g(vals, scales):
            v = vals[:, tables]           # [hkv, B, np, pr, d]
            s = scales[:, tables]         # [hkv, B, np, ps]
            dense = dequantize(
                QuantizedTensor(v, s[..., None], KV, packing), jnp.bfloat16)
            hkv, b, np_, ps_, d = dense.shape
            return dense.reshape(hkv, b, np_ * ps_, d)[:, :, :HIST
                ].transpose(1, 0, 2, 3)
        hk, hv = g(kv_, ks_), g(vv_, vs_)
        k_all = jnp.concatenate([hk, ck], axis=2)
        v_all = jnp.concatenate([hv, cv], axis=2)
        return flash_attention(x, k_all, v_all, causal=True, q_offset=HIST,
                               interpret=False).astype(x.dtype)

    o1 = np.asarray(jax.jit(paged_step)(
        q, ck, cv, k_vals, k_scales, v_vals, v_scales, offs, tables))
    print(KV, "paged compiled", flush=True)
    o2 = np.asarray(jax.jit(gather_step)(
        q, ck, cv, k_vals, k_scales, v_vals, v_scales, tables))
    err = float(np.max(np.abs(o1.astype(np.float32) - o2.astype(np.float32))))
    print(f"{KV}: parity paged-vs-gather max err {err:.3e}", flush=True)

    s_p = _time_chained(paged_step, q, ck, cv, k_vals, k_scales, v_vals,
                        v_scales, offs, tables, inner=32)
    print(f"{KV} paged:  {s_p*1e6:.0f} us/chunk", flush=True)
    s_g = _time_chained(gather_step, q, ck, cv, k_vals, k_scales, v_vals,
                        v_scales, tables, inner=32)
    print(f"{KV} gather: {s_g*1e6:.0f} us/chunk "
          f"({s_g/s_p:.2f}x vs paged)", flush=True)
print("DONE", flush=True)
