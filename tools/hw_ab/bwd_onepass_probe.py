"""HW probe: single-pass backward kernels (dQ q-major, dKV kv-major)
with the whole causal extent resident — the backward analogue of the
forward onepass win (BENCHLOG 2026-08-20). Compares a full grad step
(production custom_vjp, bt1024 and bt512) against fwd-onepass +
proto onepass backward.

Usage: python tools/hw_ab/bwd_onepass_probe.py [seq] [modes]
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

from prefill_ablate import time_modes_interleaved  # noqa: E402
import prefill_ablate as pa  # noqa: E402
from tpu_flash.core.config import BlockSizes  # noqa: E402
from tpu_flash.ops.flash import flash_attention  # noqa: E402
from tpu_flash.ops.flash.forward import (  # noqa: E402
    _forward_onepass,
)

NUM_LANES = 128
TRANS_B = (((1,), (1,)), ((), ()))
CONTRACT_0 = (((0,), (0,)), ((), ()))


def _dq_onepass_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
                       dq_ref, *, sm_scale, block_q, num_q_blocks):
    qb = pl.program_id(2)
    q = q_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)
    lse_col = lse_ref[0, 0][:, :1]
    di_col = di_ref[0, 0][:, :1]

    def _body(i):
        extent = (i + 1) * block_q
        k = k_ref[0, 0, :extent, :]
        v = v_ref[0, 0, :extent, :]
        s = jax.lax.dot_general(
            q, k, TRANS_B, preferred_element_type=jnp.float32
        ) * sm_scale
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, extent), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (block_q, extent), 0)
        p = jnp.exp(s - lse_col)
        p = jnp.where((col - row) <= i * block_q, p, 0.0)
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), TRANS_B,
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - di_col) * sm_scale).astype(k.dtype)
        dq_ref[0, 0] = jax.lax.dot(
            ds, k, preferred_element_type=jnp.float32
        ).astype(dq_ref.dtype)

    for i in range(num_q_blocks):
        @pl.when(qb == i)
        def _b(i=i):
            _body(i)


def _dkv_onepass_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
                        dk_ref, dv_ref, *, sm_scale, block_kv,
                        num_kv_blocks, seq):
    kvb = pl.program_id(2)
    k = k_ref[0, 0]
    v = v_ref[0, 0]

    def _body(j):
        start = j * block_kv
        rows = seq - start
        qs = q_ref[0, 0, start:, :]
        do = do_ref[0, 0, start:, :].astype(jnp.float32)
        lse_col = lse_ref[0, 0, start:, :][:, :1]
        di_col = di_ref[0, 0, start:, :][:, :1]
        s = jax.lax.dot_general(
            qs, k, TRANS_B, preferred_element_type=jnp.float32
        ) * sm_scale
        col = jax.lax.broadcasted_iota(jnp.int32, (rows, block_kv), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (rows, block_kv), 0)
        # global: col + start <= row + start  <=>  col <= row
        p = jnp.exp(s - lse_col)
        p = jnp.where(col <= row, p, 0.0)
        dv_ref[0, 0] = jax.lax.dot_general(
            p.astype(do.dtype), do, CONTRACT_0,
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), TRANS_B,
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - di_col) * sm_scale).astype(qs.dtype)
        dk_ref[0, 0] = jax.lax.dot_general(
            ds, qs, CONTRACT_0, preferred_element_type=jnp.float32
        ).astype(dk_ref.dtype)

    for j in range(num_kv_blocks):
        @pl.when(kvb == j)
        def _b(j=j):
            _body(j)


def bwd_onepass(q, k, v, o, lse, do, *, block=512, sm_scale):
    """(dq, dk, dv) via the two single-pass proto kernels."""
    batch, heads, seq, d = q.shape
    nb = seq // block
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    di_rep = jnp.broadcast_to(di[..., None], (*di.shape, NUM_LANES))
    lse_rep = jnp.broadcast_to(
        lse[..., None].astype(jnp.float32), (*lse.shape, NUM_LANES)
    )
    qb_spec = pl.BlockSpec((1, 1, block, d), lambda b, h, c: (b, h, c, 0))
    qb_res = pl.BlockSpec(
        (1, 1, block, NUM_LANES), lambda b, h, c: (b, h, c, 0)
    )
    full_spec = pl.BlockSpec((1, 1, seq, d), lambda b, h, c: (b, h, 0, 0))
    full_res = pl.BlockSpec(
        (1, 1, seq, NUM_LANES), lambda b, h, c: (b, h, 0, 0)
    )

    dq = pl.pallas_call(
        functools.partial(
            _dq_onepass_kernel, sm_scale=sm_scale, block_q=block,
            num_q_blocks=nb,
        ),
        grid=(batch, heads, nb),
        in_specs=[qb_spec, full_spec, full_spec, qb_spec, qb_res, qb_res],
        out_specs=qb_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v, do, lse_rep, di_rep)

    kv_spec = pl.BlockSpec((1, 1, block, d), lambda b, h, c: (b, h, c, 0))
    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_onepass_kernel, sm_scale=sm_scale, block_kv=block,
            num_kv_blocks=nb, seq=seq,
        ),
        grid=(batch, heads, nb),
        in_specs=[full_spec, kv_spec, kv_spec, full_spec, full_res,
                  full_res],
        out_specs=[kv_spec, kv_spec],
        out_shape=[jax.ShapeDtypeStruct(k.shape, k.dtype)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v, do, lse_rep, di_rep)
    return dq, dk, dv


def grad_step_prod(q, k, v, bt):
    d = q.shape[-1]
    bs = BlockSizes(
        block_q=1024, block_kv_major=1024, block_kv=1024,
        block_q_dkv=bt, block_kv_dkv=bt, block_q_dq=bt, block_kv_dq=bt,
        triangular=True, onepass=True,
    )

    def loss(q_, k_, v_):
        return jnp.sum(
            flash_attention(q_, k_, v_, causal=True,
                            block_sizes=bs).astype(jnp.float32)
        )

    return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)


def grad_step_onepass(q, k, v, block=512):
    d = q.shape[-1]
    sm_scale = d ** -0.5
    o, lse = _forward_onepass(
        q, k, v, causal=True, sm_scale=sm_scale, block_q=block,
        q_per_kv=1, save_residuals=True, interpret=False,
    )
    # do = ones (grad of sum)
    do = jnp.ones_like(o)
    return bwd_onepass(q, k, v, o, lse_to_rep(lse), do, block=block,
                       sm_scale=sm_scale)


def lse_to_rep(lse):
    return lse  # bwd_onepass broadcasts internally


def main():
    seq = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    modes = (
        tuple(sys.argv[2].split(",")) if len(sys.argv) > 2
        else ("bt1024", "bt512", "one512")
    )
    b, h, d = 1, 32, 128
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, h, seq, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, seq, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, h, seq, d), jnp.bfloat16)

    # parity: onepass proto vs production grads (only when the proto is
    # among the modes — its transients exceed scoped vmem past 2K)
    if any(m.startswith("one") for m in modes):
        dq0, dk0, dv0 = grad_step_prod(q, k, v, 512)
        dq1, dk1, dv1 = grad_step_onepass(q, k, v)
        for name, a, bb in (("dq", dq0, dq1), ("dk", dk0, dk1),
                            ("dv", dv0, dv1)):
            err = float(jnp.max(jnp.abs(
                a.astype(jnp.float32) - bb.astype(jnp.float32)
            )))
            print(f"{name} max|prod - onepass| = {err:.3e}", flush=True)
            assert err < 0.12, (name, err)  # bf16 grad accum noise

    def _make_run(mode):
        @jax.jit
        def run(x, n, k, v):
            def body(c):
                i, x = c
                if mode.startswith("bt"):
                    dq, dk, dv = grad_step_prod(x, k, v, int(mode[2:]))
                else:
                    dq, dk, dv = grad_step_onepass(x, k, v,
                                                   int(mode[3:]))
                out = dq + 0.001 * (dk + dv)
                return i + 1, out.astype(x.dtype)

            _, out = jax.lax.while_loop(
                lambda c: c[0] < n, body, (jnp.int32(0), x)
            )
            return jnp.sum(out.astype(jnp.float32))

        return run

    pa._make_run = _make_run
    secs = time_modes_interleaved(q, k, v, modes, inner=8, rounds=5)
    useful = 3.5 * 2.0 * b * h * seq * seq * d  # fwd+bwd, causal
    for m, s in secs.items():
        tf = useful / s / 1e12
        print(f"seq={seq} {m:8s} {s * 1e3:7.2f} ms  {tf:6.1f} TF/s "
              f"({tf / 197 * 100:4.1f}%)", flush=True)


if __name__ == "__main__":
    main()
