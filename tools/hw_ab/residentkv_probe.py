"""HW probe: resident-KV chunked forward at 8K (the onepass geometry's
extension past the single-pass VMEM limit).

At 8K a [512, 8192] f32 scores tile (16 MiB) cannot be single-passed,
but K/V CAN stay VMEM-resident across a head's q-blocks (bf16 8K x 128
= 2 MiB each; the BlockSpec index is constant so Pallas fetches them
once per (batch, kv_head), like the 2K/4K onepass kernel). Each cell
then runs a chunked online softmax over its causal extent with the
(m, l, acc) state carried in VALUES (registers/VMEM temporaries), not
cross-cell scratch: bq512 cells cut the diagonal waste from the tri
grid's 0.89 to 0.97 useful/computed, with 16 cells/head instead of 36.

Usage: python tools/hw_ab/residentkv_probe.py [seq] [chunk] [modes]
"""

from __future__ import annotations

import functools
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", ".."))
sys.path.insert(0, _HERE)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import prefill_ablate as pa
from prefill_ablate import prod_forward, time_modes_interleaved

MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)
TRANS_B = (((1,), (1,)), ((), ()))


def _kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale, block_q, chunk,
            num_q_blocks):
    qb = pl.program_id(2)
    q = q_ref[0, 0] * sm_scale

    def _branch(i):
        extent = (i + 1) * block_q
        thr = i * block_q
        m = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
        l = jnp.zeros((block_q, 1), jnp.float32)
        acc = jnp.zeros((block_q, q_ref.shape[3]), jnp.float32)
        for lo in range(0, extent, chunk):
            width = min(chunk, extent - lo)
            k = k_ref[0, 0, lo : lo + width, :]
            s = jax.lax.dot_general(
                q, k, TRANS_B, preferred_element_type=jnp.float32
            )
            if lo + width > thr:  # chunk reaches the diagonal
                col = jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, width), 1
                )
                row = jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, width), 0
                )
                s = jnp.where((col - row) <= thr - lo, s, MASK_VALUE)
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m, m_curr)
            alpha = jnp.exp(m - m_next)
            p = jnp.exp(s - m_next)
            l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            m = m_next
            pv = jax.lax.dot(
                p.astype(v_ref.dtype), v_ref[0, 0, lo : lo + width, :],
                preferred_element_type=jnp.float32,
            )
            acc = acc * alpha + pv
        o_ref[0, 0] = (acc / l).astype(o_ref.dtype)

    for i in range(num_q_blocks):
        @pl.when(qb == i)
        def _b(i=i):
            _branch(i)


def residentkv_forward(q, k, v, *, block_q=512, chunk=2048):
    batch, heads, seq, d = q.shape
    nb = seq // block_q
    o = pl.pallas_call(
        functools.partial(
            _kernel, sm_scale=d ** -0.5, block_q=block_q, chunk=chunk,
            num_q_blocks=nb,
        ),
        grid=(batch, heads, nb),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, c: (b, h, c, 0)),
            pl.BlockSpec((1, 1, seq, d), lambda b, h, c: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, seq, d), lambda b, h, c: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda b, h, c: (b, h, c, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # The 16 MiB scoped-vmem default is far below the 128 MiB
            # physical VMEM; resident K/V + chunk transients need more.
            vmem_limit_bytes=100 * 2**20,
        ),
    )(q, k, v)
    return o


def main():
    seq = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    modes = (
        tuple(sys.argv[3].split(",")) if len(sys.argv) > 3
        else ("prod", "res512")
    )
    b, h, d = 1, 8, 128
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, h, seq, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, seq, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, h, seq, d), jnp.bfloat16)

    def fwd(q, k, v, mode):
        if mode == "prod":
            return prod_forward(q, k, v)
        bq = int(mode[3:])
        return residentkv_forward(q, k, v, block_q=bq, chunk=chunk)

    from tpu_flash.core.reference import reference_attention

    ref = reference_attention(
        q.astype(jnp.float32), k.astype(jnp.float32),
        v.astype(jnp.float32), causal=True, sm_scale=d ** -0.5,
    )
    for mode in modes:
        o = fwd(q, k, v, mode)
        err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - ref)))
        print(f"{mode} max_err={err:.3e}", flush=True)
        assert err < 2e-2, (mode, err)

    def _make_run(mode):
        @jax.jit
        def run(x, n, k, v):
            def body(c):
                i, x = c
                o = fwd(x, k, v, mode)
                return i + 1, o.astype(x.dtype)

            _, out = jax.lax.while_loop(
                lambda c: c[0] < n, body, (jnp.int32(0), x)
            )
            return jnp.sum(out.astype(jnp.float32))

        return run

    pa._make_run = _make_run
    secs = time_modes_interleaved(q, k, v, modes, inner=8, rounds=5)
    useful = 2.0 * b * h * seq * seq * d
    for m, s in secs.items():
        tf = useful / s / 1e12
        print(f"seq={seq} {m:8s} {s * 1e6:8.1f} us  {tf:6.1f} TF/s "
              f"({tf / 197 * 100:4.1f}%)", flush=True)


if __name__ == "__main__":
    main()
