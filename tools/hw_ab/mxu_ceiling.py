"""HW probe: raw-XLA MXU ceilings for the flash kernel's matmul shapes.

The 2026-08-19 ablation pinned the 2K causal headline at ~89% of a
mask-free/exp-free pure-MXU Pallas proto (104 TF/s = 53% roofline).
This probe asks: is that proto ceiling a Pallas artifact or the chip's
behavior for these shapes? It times plain jnp.einsum chains (no Pallas)
of the exact per-cell matmuls:

  score shape: [q, d] x [d, kv]   (K = d = 128 contraction)
  pv shape:    [q, kv] x [kv, d]  (K = kv = 1024+ contraction)
  kernel mix:  score -> pv per block (the dependent chain a cell runs)
  square ref:  [2048, 2048] x [2048, 2048] (MXU best case)

If raw XLA matches ~100-110 TF/s on the kernel mix at 2K shapes, the
headline gap is the hardware's matmul efficiency at d=128 shapes, not
kernel overhead — and the BASELINE row should say so.
Run: python tools/hw_ab/mxu_ceiling.py
"""
import jax, jax.numpy as jnp, numpy as np
from tpu_flash.bench.suite import _time_chained

print("backend:", jax.default_backend(), flush=True)

H, D = 32, 128


def tf(flops, secs):
    return flops / secs / 1e12


# --- square reference: [n, n] x [n, n] ---
for n in (1024, 2048):
    k1 = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.bfloat16)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.bfloat16)

    def sq(x, k1):
        return jax.lax.dot(
            x, k1, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)

    t = _time_chained(sq, x0, k1, inner=64)
    print(f"square {n}x{n}x{n}: {tf(2 * n**3, t):.1f} TF/s", flush=True)

# --- score shape: batched [h, q, d] x [h, d, kv] (K = 128) ---
for q, kv in ((1024, 1024), (2048, 2048)):
    km = jax.random.normal(jax.random.PRNGKey(2), (H, D, kv), jnp.bfloat16)
    x0 = jax.random.normal(jax.random.PRNGKey(3), (H, q, D), jnp.bfloat16)

    def score_only(x, km):
        s = jnp.einsum(
            "hqd,hdk->hqk", x, km,
            preferred_element_type=jnp.float32,
        )
        return s[:, :, :D].astype(jnp.bfloat16)  # chain carrier

    t = _time_chained(score_only, x0, km, inner=32)
    fl = 2 * H * q * kv * D
    print(f"score [h{H} {q}x{D}x{kv}]: {tf(fl, t):.1f} TF/s", flush=True)

# --- kernel mix: score -> pv dependent chain, 2K and 8K shapes ---
for s_len, bq, bkv in ((2048, 1024, 1024), (8192, 1024, 1024)):
    n_cells = (s_len // bq) * (s_len // bkv)  # rect-grid cell count
    km = jax.random.normal(jax.random.PRNGKey(4), (H, D, bkv), jnp.bfloat16)
    vm = jax.random.normal(jax.random.PRNGKey(5), (H, bkv, D), jnp.bfloat16)
    x0 = jax.random.normal(jax.random.PRNGKey(6), (H, bq, D), jnp.bfloat16)

    def cell(x, km, vm):
        s = jnp.einsum(
            "hqd,hdk->hqk", x, km, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)
        o = jnp.einsum(
            "hqk,hkd->hqd", s, vm, preferred_element_type=jnp.float32
        )
        return o.astype(jnp.bfloat16)

    t = _time_chained(cell, x0, km, vm, inner=32)
    fl = 2 * H * bq * bkv * D * 2  # score + pv
    print(f"kernel-mix cell [h{H} bq{bq} bkv{bkv}]: {tf(fl, t):.1f} TF/s "
          f"(x{n_cells} cells at s={s_len})", flush=True)

# --- full-attention einsum (XLA's own flash-free attention), 2K causal ---
q0 = jax.random.normal(jax.random.PRNGKey(7), (1, H, 2048, D), jnp.bfloat16)
k0 = jax.random.normal(jax.random.PRNGKey(8), (1, H, 2048, D), jnp.bfloat16)
v0 = jax.random.normal(jax.random.PRNGKey(9), (1, H, 2048, D), jnp.bfloat16)


def xla_attn(q, k, v):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32)
    mask = jnp.tril(jnp.ones((2048, 2048), bool))
    s = jnp.where(mask, s * (D ** -0.5), -1e30)
    p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v,
                   preferred_element_type=jnp.float32)
    return o.astype(jnp.bfloat16)


t = _time_chained(lambda x, k, v: xla_attn(x, k, v), q0, k0, v0, inner=16)
fl = 2 * H * 2048 * 2048 * D * 2 / 2  # causal useful flops
print(f"XLA unfused causal attention 2K: {tf(fl, t):.1f} useful-TF/s",
      flush=True)
print("DONE", flush=True)
