"""HW A/B: chunk prefill over 8K history — in-kernel paged sweep vs
gather-to-dense + flash. bf16 cache, Llama-3-8B-ish GQA shapes."""
import time, jax, jax.numpy as jnp, numpy as np
from tpu_flash.bench.suite import _time_chained
from tpu_flash.ops.flash import paged_prefill_attention, flash_attention
print("backend:", jax.default_backend(), flush=True)

B, HQ, HKV, D, PS = 1, 32, 8, 128, 128
HIST, CHUNK = 8192, 512
pps = HIST // PS
npages = B * pps + 1
ks = jax.random.split(jax.random.PRNGKey(0), 5)
k_pages = jax.random.normal(ks[0], (HKV, npages, PS, D), jnp.bfloat16)
v_pages = jax.random.normal(ks[1], (HKV, npages, PS, D), jnp.bfloat16)
tables = jax.random.permutation(ks[2], npages)[: B * pps].reshape(B, pps).astype(jnp.int32)
q = jax.random.normal(ks[3], (B, HQ, CHUNK, D), jnp.bfloat16)
ck = jax.random.normal(ks[4], (B, HKV, CHUNK, D), jnp.bfloat16)
cv = jax.random.normal(jax.random.fold_in(ks[4], 1), (B, HKV, CHUNK, D), jnp.bfloat16)
offs = jnp.full((B,), HIST, jnp.int32)

def paged_step(x, ck, cv, kp, vp, offs, tables):
    return paged_prefill_attention(x, ck, cv, kp, vp, offs, tables,
                                   hist_cap=HIST, interpret=False).astype(x.dtype)

def gather_step(x, ck, cv, kp, vp, tables):
    hk = kp[:, tables].transpose(1, 0, 2, 3, 4).reshape(B, HKV, HIST, D)
    hv = vp[:, tables].transpose(1, 0, 2, 3, 4).reshape(B, HKV, HIST, D)
    k_all = jnp.concatenate([hk, ck], axis=2)
    v_all = jnp.concatenate([hv, cv], axis=2)
    return flash_attention(x, k_all, v_all, causal=True, q_offset=HIST,
                           interpret=False).astype(x.dtype)

o1 = np.asarray(jax.jit(paged_step)(q, ck, cv, k_pages, v_pages, offs, tables))
print("paged compiled", flush=True)
o2 = np.asarray(jax.jit(gather_step)(q, ck, cv, k_pages, v_pages, tables))
err = float(np.max(np.abs(o1.astype(np.float32) - o2.astype(np.float32))))
print(f"parity paged-vs-gather max err {err:.3e}", flush=True)

s_p = _time_chained(paged_step, q, ck, cv, k_pages, v_pages, offs, tables, inner=32)
print(f"paged:  {s_p*1e6:.0f} us/chunk", flush=True)
s_g = _time_chained(gather_step, q, ck, cv, k_pages, v_pages, tables, inner=32)
print(f"gather: {s_g*1e6:.0f} us/chunk  ({s_g/s_p:.2f}x slower than paged)", flush=True)
print("DONE", flush=True)
