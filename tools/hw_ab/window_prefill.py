"""HW A/B: sliding-window paged PREFILL — the window-aware DMA walk
should make a 512-token chunk's prefill over 32K history cost ~window
worth of page streaming (~4K), not the full history. Llama-3-8B-ish GQA
shapes, bf16 cache. Run on the TPU relay: `python tools/hw_ab/window_prefill.py`."""
import jax, jax.numpy as jnp, numpy as np
from tpu_flash.bench.suite import _time_chained
from tpu_flash.ops.flash import paged_prefill_attention, flash_attention

print("backend:", jax.default_backend(), flush=True)

B, HQ, HKV, D, PS = 1, 32, 8, 128, 128
HIST, CHUNK, W = 32768, 512, 4096
pps = HIST // PS
npages = B * pps + 1
ks = jax.random.split(jax.random.PRNGKey(0), 5)
k_pages = jax.random.normal(ks[0], (HKV, npages, PS, D), jnp.bfloat16)
v_pages = jax.random.normal(ks[1], (HKV, npages, PS, D), jnp.bfloat16)
tables = jax.random.permutation(ks[2], npages)[: B * pps].reshape(
    B, pps).astype(jnp.int32)
q = jax.random.normal(ks[3], (B, HQ, CHUNK, D), jnp.bfloat16)
ck = jax.random.normal(ks[4], (B, HKV, CHUNK, D), jnp.bfloat16)
cv = jax.random.normal(jax.random.fold_in(ks[4], 1),
                       (B, HKV, CHUNK, D), jnp.bfloat16)
offs = jnp.full((B,), HIST, jnp.int32)


def paged_step(x, ck, cv, kp, vp, offs, tables, window):
    return paged_prefill_attention(
        x, ck, cv, kp, vp, offs, tables, hist_cap=HIST, window=window,
        interpret=False).astype(x.dtype)


def gather_step(x, ck, cv, kp, vp, tables, window):
    hk = kp[:, tables].transpose(1, 0, 2, 3, 4).reshape(B, HKV, HIST, D)
    hv = vp[:, tables].transpose(1, 0, 2, 3, 4).reshape(B, HKV, HIST, D)
    k_all = jnp.concatenate([hk, ck], axis=2)
    v_all = jnp.concatenate([hv, cv], axis=2)
    return flash_attention(x, k_all, v_all, causal=True, q_offset=HIST,
                           window=window, interpret=False).astype(x.dtype)


# parity first (windowed paged vs windowed gather)
o1 = np.asarray(jax.jit(lambda *a: paged_step(*a, W))(
    q, ck, cv, k_pages, v_pages, offs, tables))
print("windowed paged compiled", flush=True)
o2 = np.asarray(jax.jit(lambda *a: gather_step(*a, W))(
    q, ck, cv, k_pages, v_pages, tables))
err = float(np.max(np.abs(o1.astype(np.float32) - o2.astype(np.float32))))
print(f"parity windowed paged-vs-gather max err {err:.3e}", flush=True)

t_full = _time_chained(lambda *a: paged_step(*a, None),
                       q, ck, cv, k_pages, v_pages, offs, tables, inner=32)
print(f"paged full-hist:   {t_full*1e6:.0f} us/chunk", flush=True)
t_win = _time_chained(lambda *a: paged_step(*a, W),
                      q, ck, cv, k_pages, v_pages, offs, tables, inner=32)
print(f"paged window-{W}: {t_win*1e6:.0f} us/chunk "
      f"({t_full/t_win:.2f}x faster)", flush=True)
t_gw = _time_chained(lambda *a: gather_step(*a, W),
                     q, ck, cv, k_pages, v_pages, tables, inner=32)
print(f"gather window-{W}: {t_gw*1e6:.0f} us/chunk "
      f"({t_gw/t_win:.2f}x vs windowed paged)", flush=True)
print("DONE", flush=True)
