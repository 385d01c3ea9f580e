"""HW ablation + prototype for the causal prefill roofline gap (VERDICT r1 #1).

Measures, in ONE process (paired), on the headline shape (B=1 hq32 d128):
  base     — reproduction of the production triangular kernel body
  nomask   — base minus the causal compare+select      -> mask VPU cost
  noexp    — base with exp replaced by identity        -> transcendental cost
  mxu      — matmuls only (p = s * const)              -> pure MXU floor
  fast     — NEW design: per-cell kinds (0 = interior, mask-free;
             1 = diagonal, row-sliced sub-tiles so masked FLOPs shrink
             without more grid cells)

Only `base` and `fast` are numerically correct; ablations bound where the
cycles go (the reference's hot loop this instruments corresponds to
kernels/computers.cuh:42-62).

Usage: python tools/hw_ab/prefill_ablate.py [seq ...]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NUM_LANES = 128
MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)
TRANS_B = (((1,), (1,)), ((), ()))
SUB = 256  # diagonal sub-tile width


def build_cells(num_blocks: int):
    """(qmap, kvmap, islast, kind): kind 0 = strictly-below-diagonal
    (fully active, mask-free), 1 = on-diagonal (thr == 0)."""
    qm, km, il, kd = [], [], [], []
    for qb in range(num_blocks):
        for kvb in range(qb + 1):
            qm.append(qb)
            km.append(kvb)
            il.append(1 if kvb == qb else 0)
            kd.append(1 if kvb == qb else 0)
    to = lambda a: jnp.asarray(np.asarray(a, np.int32))
    return to(qm), to(km), to(il), to(kd)


def _softmax_update(m_scr, l_scr, acc_scr, s, v, lo, mode):
    """One online-softmax state update on scratch rows [lo:]."""
    m_prev = m_scr[lo:, :]
    l_prev = l_scr[lo:, :]
    if mode == "mxu":
        p = s * 0.001
        acc_scr[lo:, :] += jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        return
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    if mode == "noexp":
        alpha = m_prev - m_next + 1.0
        p = s - m_next[:, :1]
    else:
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
    l_curr = jnp.sum(p, axis=1, keepdims=True)
    l_scr[lo:, :] = l_prev * alpha + l_curr
    m_scr[lo:, :] = m_next
    pv = jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    acc_scr[lo:, :] = acc_scr[lo:, :] * alpha[:, :1] + pv


def _kernel(
    qmap, kvmap, islast, kind,
    q_ref, k_ref, v_ref, o_ref,
    m_scr, l_scr, acc_scr,
    *, sm_scale, mode,
):
    block = q_ref.shape[2]
    c = pl.program_id(2)
    kv_idx = kvmap[c]

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0] * sm_scale

    if mode == "fast":
        @pl.when(kind[c] == 0)
        def _interior():
            k = k_ref[0, 0]
            s = jax.lax.dot_general(
                q, k, TRANS_B, preferred_element_type=jnp.float32
            )
            _softmax_update(m_scr, l_scr, acc_scr, s, v_ref[0, 0], 0, "base")

        @pl.when(kind[c] == 1)
        def _diag():
            sub = min(SUB, block)
            for j in range(block // sub):
                lo = j * sub
                k = k_ref[0, 0, lo : lo + sub, :]
                s = jax.lax.dot_general(
                    q[lo:, :], k, TRANS_B,
                    preferred_element_type=jnp.float32,
                )
                rows = block - lo
                col = jax.lax.broadcasted_iota(jnp.int32, (rows, sub), 1)
                row = jax.lax.broadcasted_iota(jnp.int32, (rows, sub), 0)
                s = jnp.where(col <= row, s, MASK_VALUE)
                _softmax_update(
                    m_scr, l_scr, acc_scr, s, v_ref[0, 0, lo : lo + sub, :],
                    lo, "base",
                )
    else:
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, TRANS_B, preferred_element_type=jnp.float32
        )
        if mode not in ("nomask", "mxu"):
            q_idx = qmap[c]
            col = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
            row = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
            thr = (q_idx - kv_idx) * block
            s = jnp.where((col - row) <= thr, s, MASK_VALUE)
        _softmax_update(m_scr, l_scr, acc_scr, s, v_ref[0, 0], 0, mode)

    @pl.when(islast[c] == 1)
    def _fin():
        l = l_scr[:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)


def prod_forward(q, k, v, diag_sub=None, block=1024):
    """The production triangular kernel, for in-process pairing."""
    from tpu_flash.core.config import BlockSizes
    from tpu_flash.ops.flash.forward import flash_attention_forward

    d = q.shape[-1]
    bs = BlockSizes(
        block_q=block, block_kv_major=block, block_kv=block,
        triangular=True, diag_sub=diag_sub,
    )
    return flash_attention_forward(
        q, k, v, causal=True, sm_scale=d ** -0.5, block_sizes=bs,
        triangular=True,
    )


def proto_forward(q, k, v, *, block=1024, mode="base", interpret=False):
    if mode == "prod":
        return prod_forward(q, k, v)
    if mode.startswith("prodsub"):
        return prod_forward(q, k, v, diag_sub=int(mode[len("prodsub"):]))
    if mode.startswith("prodblk"):
        blk, sub = mode[len("prodblk"):].split("x")
        sub = None if sub == "0" else int(sub)
        return prod_forward(q, k, v, diag_sub=sub, block=int(blk))
    batch, heads, seq, d = q.shape
    nb = seq // block
    qm, km, il, kd = build_cells(nb)
    n_cells = qm.shape[0]
    spec_q = pl.BlockSpec(
        (1, 1, block, d), lambda b, h, c, qm, km, il, kd: (b, h, qm[c], 0)
    )
    spec_kv = pl.BlockSpec(
        (1, 1, block, d), lambda b, h, c, qm, km, il, kd: (b, h, km[c], 0)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(batch, heads, n_cells),
        in_specs=[spec_q, spec_kv, spec_kv],
        out_specs=[spec_q],
        scratch_shapes=[
            pltpu.VMEM((block, NUM_LANES), jnp.float32),
            pltpu.VMEM((block, NUM_LANES), jnp.float32),
            pltpu.VMEM((block, d), jnp.float32),
        ],
    )
    kern = functools.partial(_kernel, sm_scale=d ** -0.5, mode=mode)
    (o,) = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qm, km, il, kd, q, k, v)
    return o


def _make_run(mode):
    @jax.jit
    def run(x, n, k, v):
        def body(c):
            i, x = c
            o = proto_forward(x, k, v, mode=mode)
            return i + 1, o.astype(x.dtype)

        _, out = jax.lax.while_loop(lambda c: c[0] < n, body, (jnp.int32(0), x))
        return jnp.sum(out.astype(jnp.float32))

    return run


def time_modes_interleaved(q, k, v, modes, inner=16, rounds=5):
    """Differential chained timing, modes interleaved round-robin so slow
    relay-state drift (measured 1.6x across processes on 2026-08-19)
    cancels out of the A/B. Returns {mode: seconds_per_iter}."""
    runs = {m: _make_run(m) for m in modes}
    n1, n2 = jnp.int32(inner), jnp.int32(2 * inner)
    for m in modes:  # compile pass
        float(runs[m](q, n1, k, v))
    t1 = {m: [] for m in modes}
    t2 = {m: [] for m in modes}
    for _ in range(rounds):
        for m in modes:
            t0 = time.perf_counter()
            float(runs[m](q, n1, k, v))
            t1[m].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(runs[m](q, n2, k, v))
            t2[m].append(time.perf_counter() - t0)
    return {
        m: max((min(t2[m]) - min(t1[m])) / inner, 1e-9) for m in modes
    }


def main():
    seqs = (
        [int(a) for a in sys.argv[1].split(",")] if len(sys.argv) > 1
        else [2048, 8192]
    )
    batch, heads, d = 1, 32, 128
    for seq in seqs:
        key = jax.random.PRNGKey(0)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (batch, heads, seq, d), jnp.bfloat16)
        k = jax.random.normal(kk, (batch, heads, seq, d), jnp.bfloat16)
        v = jax.random.normal(kv, (batch, heads, seq, d), jnp.bfloat16)
        useful = 2.0 * batch * heads * seq * seq * d  # causal: 4*T^2/2*d
        # correctness check for the two real modes
        from tpu_flash.core.reference import reference_attention

        ref = reference_attention(
            q.astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32), causal=True, sm_scale=d ** -0.5,
        )
        modes_cli = (
            tuple(sys.argv[2].split(","))
            if len(sys.argv) > 2 and not sys.argv[2].isdigit()
            else ("prod", "base", "nomask", "noexp", "mxu", "fast")
        )
        exact = [m for m in modes_cli if m not in ("nomask", "noexp", "mxu")]
        for mode in exact:
            o = proto_forward(q, k, v, mode=mode)
            err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - ref)))
            print(f"seq={seq} {mode:12s} max_err={err:.3e}", flush=True)
            assert err < 2e-2, (mode, err)
        modes = ("prod", "base", "nomask", "noexp", "mxu", "fast")
        if len(sys.argv) > 2 and not sys.argv[2].isdigit():
            modes = tuple(sys.argv[2].split(","))
        secs = time_modes_interleaved(q, k, v, modes)
        for mode in modes:
            sec = secs[mode]
            tf = useful / sec / 1e12
            print(
                f"seq={seq} {mode:12s} {sec * 1e6:8.1f} us  {tf:6.1f} TF/s "
                f"({tf / 197.0 * 100:4.1f}% roofline)",
                flush=True,
            )


if __name__ == "__main__":
    main()
