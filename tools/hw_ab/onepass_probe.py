"""HW probe: single-pass causal prefill (no online-softmax merge).

Idea (BENCHLOG 2026-08-19 mxu_ceiling item 3): at short seq a q-block's
FULL causal KV extent fits VMEM, so softmax can be ONE masked pass (max,
exp, sum, PV, divide) instead of the online merge — no (m, l) scratch
round trips, no acc rescale, and one grid cell per q-block instead of
qb+1 (96 -> 64 cells at 2K h32). The lazy-softmax XLA probe of the same
geometry lost (0.72-0.80x) because XLA spilled the score block to HBM;
Pallas keeps it in VMEM.

Implementation: q-blocks grouped by causal extent; one pallas_call per
extent (static shapes). Modes:
  prod       — production triangular kernel (pairing anchor)
  onepass    — f32 exp output feeding PV (cast to bf16 at the dot)
  onepass16  — identical, kept for a p-dtype A/B hook

The per-tile hot chain corresponds to the reference's
kernels/computers.cuh:42-62 (score -> softmax -> PV); the single-pass
variant is what that loop degenerates to when the whole KV range is
resident — the reference's single-CTA design actually assumes this.

Usage: python tools/hw_ab/onepass_probe.py [seq[,seq]] [modes]
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", ".."))  # repo root
sys.path.insert(0, _HERE)
from prefill_ablate import prod_forward, time_modes_interleaved  # noqa: E402

MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)
TRANS_B = (((1,), (1,)), ((), ()))


def _onepass_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale, qb, block,
                    p_dtype):
    """One q-block vs its full causal extent, single-pass masked softmax."""
    extent = k_ref.shape[2]
    q = q_ref[0, 0] * sm_scale
    k = k_ref[0, 0]
    s = jax.lax.dot_general(q, k, TRANS_B, preferred_element_type=jnp.float32)
    # causal: global q row = qb*block + row, col is global. Mask only the
    # trailing diagonal block; the first qb blocks are fully active.
    col = jax.lax.broadcasted_iota(jnp.int32, (block, extent), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (block, extent), 0)
    s = jnp.where(col - row <= qb * block, s, MASK_VALUE)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    pv = jax.lax.dot(
        p.astype(p_dtype), v_ref[0, 0], preferred_element_type=jnp.float32
    )
    o_ref[0, 0] = (pv / l).astype(o_ref.dtype)


def onepass_forward(q, k, v, *, block=1024, p_dtype=jnp.bfloat16,
                    interpret=False):
    batch, heads, seq, d = q.shape
    nb = seq // block
    outs = []
    for qb in range(nb):
        extent = (qb + 1) * block
        spec_q = pl.BlockSpec((1, 1, block, d), lambda b, h: (b, h, 0, 0))
        spec_kv = pl.BlockSpec((1, 1, extent, d), lambda b, h: (b, h, 0, 0))
        kern = functools.partial(
            _onepass_kernel, sm_scale=d ** -0.5, qb=qb, block=block,
            p_dtype=p_dtype,
        )
        o = pl.pallas_call(
            kern,
            grid=(batch, heads),
            in_specs=[spec_q, spec_kv, spec_kv],
            out_specs=spec_q,
            out_shape=jax.ShapeDtypeStruct((batch, heads, block, d), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            interpret=interpret,
        )(
            jax.lax.dynamic_slice_in_dim(q, qb * block, block, axis=2),
            jax.lax.dynamic_slice_in_dim(k, 0, extent, axis=2),
            jax.lax.dynamic_slice_in_dim(v, 0, extent, axis=2),
        )
        outs.append(o)
    return jnp.concatenate(outs, axis=2)


def forward(q, k, v, mode):
    if mode == "prod":
        return prod_forward(q, k, v)
    if mode == "onepass":
        return onepass_forward(q, k, v, p_dtype=jnp.bfloat16)
    if mode == "onepass16":
        return onepass_forward(q, k, v, p_dtype=jnp.bfloat16)
    if mode.startswith("onepassblk"):
        return onepass_forward(q, k, v, block=int(mode[len("onepassblk"):]))
    raise ValueError(mode)


def _make_run(mode):
    @jax.jit
    def run(x, n, k, v):
        def body(c):
            i, x = c
            o = forward(x, k, v, mode)
            return i + 1, o.astype(x.dtype)

        _, out = jax.lax.while_loop(lambda c: c[0] < n, body, (jnp.int32(0), x))
        return jnp.sum(out.astype(jnp.float32))

    return run


def main():
    seqs = (
        [int(a) for a in sys.argv[1].split(",")] if len(sys.argv) > 1
        else [2048]
    )
    modes = (
        tuple(sys.argv[2].split(",")) if len(sys.argv) > 2
        else ("prod", "onepass", "onepassblk512")
    )
    batch, heads, d = 1, 32, 128
    from tpu_flash.core.reference import reference_attention

    for seq in seqs:
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(kq, (batch, heads, seq, d), jnp.bfloat16)
        k = jax.random.normal(kk, (batch, heads, seq, d), jnp.bfloat16)
        v = jax.random.normal(kv, (batch, heads, seq, d), jnp.bfloat16)
        ref = reference_attention(
            q.astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32), causal=True, sm_scale=d ** -0.5,
        )
        for mode in modes:
            o = forward(q, k, v, mode)
            err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - ref)))
            print(f"seq={seq} {mode:14s} max_err={err:.3e}", flush=True)
            assert err < 2e-2, (mode, err)
        useful = 2.0 * batch * heads * seq * seq * d
        # reuse the interleaved harness but with this file's runners
        import prefill_ablate as pa

        saved = pa._make_run
        pa._make_run = _make_run
        try:
            secs = time_modes_interleaved(q, k, v, modes)
        finally:
            pa._make_run = saved
        for mode in modes:
            sec = secs[mode]
            tf = useful / sec / 1e12
            print(
                f"seq={seq} {mode:14s} {sec * 1e6:8.1f} us  {tf:6.1f} TF/s "
                f"({tf / 197.0 * 100:4.1f}% roofline)",
                flush=True,
            )


if __name__ == "__main__":
    main()
