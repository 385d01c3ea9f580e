"""HW probe: can a single-pass "lazy softmax" XLA attention beat the
Pallas flash kernel at SHORT sequences (the 2K headline)?

Rationale (mxu_ceiling.py, 2026-08-19): raw XLA runs the per-cell
score->PV chain at ~171 TF/s (87% peak) when the score block stays
VMEM-resident — vs the Pallas kernel's ~139 computed-TF/s with softmax.
At 2K the whole causal extent of a 1024-row q block is <= 2048 columns,
so scores fit VMEM *without tiling*: softmax becomes ONE pass per row
(no online (m,l) carry, no acc rescale). Structure: for each q block,
one batched-over-heads einsum against its full causal kv extent +
masked softmax + PV. q-block 0 pairs with kv [0,1024), block 1 with
[0,2048) — same 33% masked waste as the production tri grid.

Heads are processed in chunks (h_chunk) to bound the f32 score
intermediate ([hc, 1024, 2048] = hc x 8 MB) so XLA can keep it
VMEM-resident. Compares against the production flash kernel in the
same process. Run: python tools/hw_ab/xla_flash_probe.py
"""
import functools

import jax, jax.numpy as jnp, numpy as np
from tpu_flash.bench.suite import _time_chained
from tpu_flash.ops.flash import flash_attention

print("backend:", jax.default_backend(), flush=True)

H, D, S = 32, 128, 2048
BQ = 1024
SCALE = D ** -0.5

kq = jax.random.normal(jax.random.PRNGKey(0), (1, H, S, D), jnp.bfloat16)
kk = jax.random.normal(jax.random.PRNGKey(1), (1, H, S, D), jnp.bfloat16)
kv = jax.random.normal(jax.random.PRNGKey(2), (1, H, S, D), jnp.bfloat16)


def lazy_attn(q, k, v, h_chunk):
    # q,k,v: [1, H, S, D] -> [1, H, S, D]
    outs = []
    nq = S // BQ
    for hc in range(0, H, h_chunk):
        qh = q[0, hc : hc + h_chunk]  # [hc, S, D]
        kh = k[0, hc : hc + h_chunk]
        vh = v[0, hc : hc + h_chunk]
        blocks = []
        for qi in range(nq):
            ext = (qi + 1) * BQ  # causal kv extent of this q block
            qb = qh[:, qi * BQ : (qi + 1) * BQ]  # [hc, BQ, D]
            s = jnp.einsum(
                "hqd,hkd->hqk", qb, kh[:, :ext],
                preferred_element_type=jnp.float32,
            ) * SCALE  # [hc, BQ, ext]
            row = jax.lax.broadcasted_iota(jnp.int32, (BQ, ext), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (BQ, ext), 1)
            s = jnp.where(col <= row + qi * BQ, s, -1e30)
            # ONE softmax pass: no online merge, no acc rescale.
            p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
            o = jnp.einsum(
                "hqk,hkd->hqd", p, vh[:, :ext],
                preferred_element_type=jnp.float32,
            )
            blocks.append(o)
        outs.append(jnp.concatenate(blocks, axis=1))
    return jnp.concatenate(outs, axis=0)[None].astype(q.dtype)


# Useful causal FLOPs: per row i, (i+1) positions; QK^T + PV = 2 matmuls.
useful_fl = 2 * H * (S * (S + 1) // 2) * D * 2


def tfs(t):
    return useful_fl / t / 1e12


# parity vs production kernel first
prod = np.asarray(flash_attention(kq, kk, kv, causal=True))
for hc in (2, 4, 8):
    lz = np.asarray(jax.jit(functools.partial(lazy_attn, h_chunk=hc))(
        kq, kk, kv))
    err = float(np.max(np.abs(lz.astype(np.float32) - prod.astype(np.float32))))
    print(f"h_chunk={hc}: parity vs flash kernel {err:.2e}", flush=True)

t_prod = _time_chained(
    lambda x, k, v: flash_attention(x, k, v, causal=True), kq, kk, kv,
    inner=32)
print(f"prod flash kernel: {t_prod*1e6:.0f} us  {tfs(t_prod):.1f} "
      "useful-TF/s", flush=True)
for hc in (2, 4, 8):
    t = _time_chained(
        functools.partial(lazy_attn, h_chunk=hc), kq, kk, kv, inner=32)
    print(f"lazy-softmax XLA h_chunk={hc}: {t*1e6:.0f} us  {tfs(t):.1f} "
          "useful-TF/s ({:.2f}x prod)".format(t_prod / t), flush=True)
print("DONE", flush=True)
