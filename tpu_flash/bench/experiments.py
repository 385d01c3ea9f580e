"""Kernel-variant experiments for the causal prefill hot path.

Standalone parametrized copy of the forward kernel (ops/flash/forward.py)
used to A/B optimizations on real hardware before porting winners into the
product kernel. Run: ``python -m tpu_flash.bench.experiments``.

Variants (cumulative flags):
  * mask_mode="always"   — baseline: compare+select on every tile.
  * mask_mode="diag"     — pl.when-split body: tiles fully below the causal
    diagonal skip the two mask VPU passes entirely; only diagonal-crossing
    tiles pay them.
  * use_exp2             — fold log2(e) into the Q scale and use exp2
    (cheaper VPU transcendental on some generations).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NUM_LANES = 128
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
LOG2E = 1.4426950408889634


def _kernel(
    q_ref, k_ref, v_ref, o_ref,
    m_scratch, l_scratch, acc_scratch,
    *, sm_scale, block_kv, num_kv_blocks, mask_mode, use_exp2,
):
    block_q = q_ref.shape[2]
    block_kv_major = k_ref.shape[2]
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    max_q_pos = (q_idx + 1) * block_q - 1
    should_run = max_q_pos >= kv_idx * block_kv_major

    def body(apply_mask):
        q = q_ref[0, 0]
        scale = sm_scale * LOG2E if use_exp2 else sm_scale
        if scale != 1.0:
            q = q * scale
        exp = jnp.exp2 if use_exp2 else jnp.exp
        for start in range(0, block_kv_major, block_kv):
            k = k_ref[0, 0, start : start + block_kv, :]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if apply_mask:
                kv_base = kv_idx * block_kv_major + start
                col = jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_kv), 1
                )
                row = jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_kv), 0
                )
                mask = (col - row) <= (q_idx * block_q - kv_base)
                s = jnp.where(mask, s, MASK_VALUE)
            m_prev = m_scratch[...]
            l_prev = l_scratch[...]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = exp(m_prev - m_next)
            p = exp(s - m_next[:, :1])
            l_scratch[...] = l_prev * alpha + jnp.sum(
                p, axis=1, keepdims=True
            )
            m_scratch[...] = m_next
            v = v_ref[0, 0, start : start + block_kv, :]
            pv = jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )
            acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + pv

    if mask_mode == "always":

        @pl.when(should_run)
        def _run():
            body(apply_mask=True)

    else:  # "diag": only diagonal-crossing tiles mask
        min_q_pos = q_idx * block_q
        is_diag = jnp.logical_and(
            should_run, min_q_pos < (kv_idx + 1) * block_kv_major
        )
        is_full = jnp.logical_and(should_run, jnp.logical_not(is_diag))

        @pl.when(is_diag)
        def _run_diag():
            body(apply_mask=True)

        @pl.when(is_full)
        def _run_full():
            body(apply_mask=False)

    last_kv = jnp.minimum(
        num_kv_blocks - 1, ((q_idx + 1) * block_q - 1) // block_kv_major
    )

    @pl.when(kv_idx == last_kv)
    def _epilogue():
        l = l_scratch[:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)


def variant_attention(
    q, k, v, *, sm_scale, block_q, block_kv_major, block_kv,
    mask_mode="always", use_exp2=False, interpret=False,
):
    batch, heads, q_len, head_dim = q.shape
    num_q_blocks = q_len // block_q
    num_kv_blocks = q_len // block_kv_major

    def kv_index(qi, kv):
        return jnp.minimum(kv, ((qi + 1) * block_q - 1) // block_kv_major)

    grid = (batch, heads, num_q_blocks, num_kv_blocks)
    kernel = functools.partial(
        _kernel, sm_scale=sm_scale, block_kv=block_kv,
        num_kv_blocks=num_kv_blocks, mask_mode=mask_mode, use_exp2=use_exp2,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, head_dim),
                         lambda b, h, qi, kv: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_kv_major, head_dim),
                         lambda b, h, qi, kv: (b, h, kv_index(qi, kv), 0)),
            pl.BlockSpec((1, 1, block_kv_major, head_dim),
                         lambda b, h, qi, kv: (b, h, kv_index(qi, kv), 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, head_dim),
                               lambda b, h, qi, kv: (b, h, qi, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, head_dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel", "parallel", "parallel", "arbitrary",
            ),
        ),
        interpret=interpret,
    )(q, k, v)


def main():
    from tpu_flash.bench.suite import _time_chained, attention_flops

    b, h, s, d = 1, 32, 2048, 128
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, h, s, d), jnp.bfloat16)
    fl = attention_flops(b, h, s, s, d, True)
    sm = d**-0.5

    from tpu_flash.core.reference import reference_gqa_attention

    ref = reference_gqa_attention(q, k, v, causal=True)

    variants = []
    for blocks in [(1024, 1024, 1024), (512, 512, 512), (256, 512, 512),
                   (512, 1024, 1024), (1024, 512, 512)]:
        for mask_mode in ("always", "diag"):
            for use_exp2 in (False, True):
                variants.append((blocks, mask_mode, use_exp2))

    for (bq, bkvM, bkv), mask_mode, use_exp2 in variants:
        def step(x, k, v, bq=bq, bkvM=bkvM, bkv=bkv,
                 mask_mode=mask_mode, use_exp2=use_exp2):
            return variant_attention(
                x, k, v, sm_scale=sm, block_q=bq, block_kv_major=bkvM,
                block_kv=bkv, mask_mode=mask_mode, use_exp2=use_exp2,
            ).astype(x.dtype)

        # parity gate first
        out = step(q, k, v)
        err = float(jnp.max(jnp.abs(
            out.astype(jnp.float32) - ref.astype(jnp.float32))))
        if err > 2.5e-2:
            print(f"blocks={bq}/{bkvM}/{bkv} mask={mask_mode} "
                  f"exp2={use_exp2}: PARITY FAIL err={err:.3e}")
            continue
        secs = _time_chained(step, q, k, v, inner=32)
        print(f"blocks={bq}/{bkvM}/{bkv} mask={mask_mode:6s} "
              f"exp2={int(use_exp2)}: {secs * 1e3:7.3f} ms "
              f"{fl / secs / 1e12:6.1f} TFLOP/s (err {err:.1e})",
              flush=True)


if __name__ == "__main__":
    main()
