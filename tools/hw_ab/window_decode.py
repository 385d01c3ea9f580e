"""HW A/B: sliding-window paged decode — below-window block skipping
should make 32K-context decode cost scale with the window (~4K), not the
context. Llama-3-8B-ish GQA shapes, bf16 + int8 cache."""
import jax, jax.numpy as jnp, numpy as np
from tpu_flash.bench.suite import _time_chained
from tpu_flash.ops.decode import paged_attention
from tpu_flash.ops.quant import quantize_pages, QuantizedTensor

print("backend:", jax.default_backend(), flush=True)

B, HQ, HKV, D, PS = 4, 32, 8, 128, 128
CTX, W = 32768, 4096
pps = CTX // PS
npages = B * pps + 1
ks = jax.random.split(jax.random.PRNGKey(0), 4)
kf = jax.random.normal(ks[0], (HKV, npages, PS, D), jnp.float32)
vf = jax.random.normal(ks[1], (HKV, npages, PS, D), jnp.float32)
tables = jax.random.permutation(ks[2], npages)[: B * pps].reshape(
    B, pps).astype(jnp.int32)
q = jax.random.normal(ks[3], (B, HQ, D), jnp.bfloat16)
lengths = jnp.full((B,), CTX - 3, jnp.int32)

for mode in ("bf16", "int8"):
    if mode == "bf16":
        kp, vp = kf.astype(jnp.bfloat16), vf.astype(jnp.bfloat16)
        parts = (kp, vp)
        rebuild = lambda kv, vv: (kv, vv)
    else:
        kq8, vq8 = quantize_pages(kf, "int8"), quantize_pages(vf, "int8")
        parts = (kq8.values, kq8.scales, vq8.values, vq8.scales)
        rebuild = lambda kv, ks, vv, vs: (
            QuantizedTensor(kv, ks, "int8", "lanes"),
            QuantizedTensor(vv, vs, "int8", "lanes"),
        )

    # KV pages ride as jit ARGUMENTS (raw arrays — QuantizedTensor has
    # static string fields): captured device arrays embed as HLO
    # constants and blow the relay's remote-compile request limit.
    def step(q, window, *parts):
        kp, vp = rebuild(*parts)
        return paged_attention(q, kp, vp, lengths, tables, window=window)

    o_full = np.asarray(
        jax.jit(lambda q, *p: step(q, None, *p))(q, *parts))
    o_win = np.asarray(
        jax.jit(lambda q, *p: step(q, W, *p))(q, *parts))
    print(f"{mode}: compiled; outputs differ as expected "
          f"(window changes attention set): "
          f"{float(np.max(np.abs(o_full - o_win))):.3f}", flush=True)

    t_full = _time_chained(lambda q, *p: step(q, None, *p),
                           q, *parts, inner=32)
    t_win = _time_chained(lambda q, *p: step(q, W, *p),
                          q, *parts, inner=32)
    toks = B / t_win
    print(f"{mode}: full-ctx {t_full*1e6:.0f} us/step, window-{W} "
          f"{t_win*1e6:.0f} us/step ({t_full/t_win:.2f}x faster, "
          f"{toks/1e3:.1f}k tok/s)", flush=True)
print("DONE", flush=True)
