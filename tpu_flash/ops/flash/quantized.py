"""Quantized-input flash attention (INT8 / FP8 Q, K, V) — forward kernel.

BASELINE config 4's compute path: Q/K/V arrive quantized (per-row symmetric
scales, ops/quant/quantize.py) and are consumed *without materializing
dequantized operands in HBM*. Dequantization fuses into the matmuls as
rank-1 rescales:

    (q_i s_q) (k_j s_k)^T = s_q * (q_i k_j^T) * s_k      (scores)
    sum_j p_j (v_j s_vj)  = sum_j (p_j s_vj) v_j          (PV)

so the kernel loads 1-byte payloads from HBM (half the bandwidth of BF16,
which is the bottleneck for long-context attention), runs QK^T on the MXU
in the payload dtype (INT8 MXU; FP8 is cast to BF16 in VMEM — no native
e4m3 MXU on v5e), and applies the scales as VPU broadcasts per tile.

Measured on v5e (Llama-2-7B prefill shapes): ~0.93x the BF16 kernel's
TFLOP/s at equal shapes — the kernel is VPU-bound, so the INT8 MXU rate
does not show up and the scale multiplies add VPU passes. The win is
*memory*, not compute: half the HBM traffic and activation footprint,
which is what matters when attention inputs come from a quantized serving
stack (and is the enabler for 8K+ contexts per BASELINE config 4).
FP8 (e4m3) on v5e additionally pays a *software* fp8→bf16 cast per tile
(no native fp8 MXU until v6e) and measures ~2.4x slower than INT8 at the
same shapes — prefer INT8 on v5-generation chips.

Scale layouts (chosen so every tile the kernel touches is lane-aligned):
  * Q scales: lane-replicated  [b, hq, q_len, 128] f32 — a [block_q, 128]
    tile whose first column is the per-row scale (quantize_pallas's native
    output layout).
  * K/V scales: row-vector     [b, hkv, 1, kv_len] f32 — a [1, block_kv]
    tile broadcast across sublanes.

The reference is FP32-only (utils.cuh:13); this extends its fused-attention
capability per the BASELINE north star. Forward-only: quantized attention
is an inference feature, training runs the BF16 kernels (ops/flash/api.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_flash.core.config import BlockSizes
from tpu_flash.core.reference import DEFAULT_MASK_VALUE
from tpu_flash.ops.flash.forward import NUM_LANES
from tpu_flash.ops.quant.quantize import FP8_MAX, INT8_MAX
from tpu_flash.utils.tuning import default_block_sizes


class QuantizedAttentionInputs(NamedTuple):
    """Q/K/V quantized in the kernel's native scale layouts."""

    q_values: jax.Array  # [b, hq, s, d] int8 | fp8
    q_scales: jax.Array  # [b, hq, s, 128] f32, lane-replicated
    k_values: jax.Array  # [b, hkv, s, d]
    k_scales: jax.Array  # [b, hkv, 1, s] f32, row-vector
    v_values: jax.Array
    v_scales: jax.Array
    dtype_name: str  # "int8" | "fp8"


def quantize_attention_inputs(
    q: jax.Array, k: jax.Array, v: jax.Array, dtype_name: str = "int8"
) -> QuantizedAttentionInputs:
    """Per-row symmetric quantization of q/k/v into kernel scale layouts."""
    if dtype_name not in ("int8", "fp8"):
        raise ValueError(f"unsupported attention quant dtype {dtype_name!r}")
    qmax = INT8_MAX if dtype_name == "int8" else FP8_MAX
    payload = jnp.int8 if dtype_name == "int8" else jnp.float8_e4m3fn

    def quant(x):
        xf = x.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        scale = jnp.where(absmax == 0, 1.0, absmax / qmax)
        y = xf / scale
        if dtype_name == "int8":
            y = jnp.clip(jnp.round(y), -qmax, qmax)
        return y.astype(payload), scale  # scale: [..., s, 1]

    qv, qs = quant(q)
    kv_, ks = quant(k)
    vv, vs = quant(v)
    return QuantizedAttentionInputs(
        q_values=qv,
        q_scales=jnp.broadcast_to(qs, (*qs.shape[:-1], NUM_LANES)),
        k_values=kv_,
        k_scales=ks[..., 0][:, :, None, :],  # [b, hkv, 1, s]
        v_values=vv,
        v_scales=vs[..., 0][:, :, None, :],
        dtype_name=dtype_name,
    )


def _quant_fwd_kernel(
    *args,  # [prefetch qmap/kvmap/islast when triangular,] q_ref, qs_ref,
    # k_ref, ks_ref, v_ref, vs_ref, o_ref, m_scratch, l_scratch, acc_scratch
    causal: bool,
    sm_scale: float,
    block_kv: int,
    kv_len: int,
    num_kv_blocks: int,
    mask_kv_tail: bool,
    is_int8: bool,
    fp8_native: bool = False,
    triangular: bool = False,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    have_sink: bool = False,
    have_alibi: bool = False,
):
    it = iter(args)
    if triangular:
        qmap_ref, kvmap_ref, islast_ref = next(it), next(it), next(it)
    q_ref, qs_ref, k_ref, ks_ref, v_ref, vs_ref = (
        next(it), next(it), next(it), next(it), next(it), next(it),
    )
    sink_ref = next(it) if have_sink else None
    alibi_ref = next(it) if have_alibi else None
    o_ref, m_scratch, l_scratch, acc_scratch = (
        next(it), next(it), next(it), next(it),
    )
    if triangular:
        c = pl.program_id(2)
        q_idx = qmap_ref[c]
        kv_idx = kvmap_ref[c]
    else:
        q_idx = pl.program_id(2)
        kv_idx = pl.program_id(3)
    block_q = q_ref.shape[2]
    block_kv_major = k_ref.shape[2]

    if window is None:
        first_kv = 0
    else:
        first_kv = jnp.maximum(
            (q_idx * block_q - window + 1) // block_kv_major, 0
        )

    @pl.when(kv_idx == first_kv)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    if causal and not triangular:
        should_run = (q_idx + 1) * block_q - 1 >= kv_idx * block_kv_major
        if window is not None:
            should_run = jnp.logical_and(
                should_run,
                (kv_idx + 1) * block_kv_major - 1
                >= q_idx * block_q - window + 1,
            )
    else:
        should_run = True  # triangular: only active cells are enumerated

    @pl.when(should_run)
    def _run():
        if is_int8 or fp8_native:
            q = q_ref[0, 0]  # stays int8 / e4m3 for the MXU
        else:
            q = q_ref[0, 0].astype(jnp.bfloat16)  # software e4m3 cast
        # Per-row q scale column (lane-replicated input, use one lane),
        # with sm_scale folded in: one multiply covers both.
        q_scale = qs_ref[0, 0][:, :1] * sm_scale  # [block_q, 1]

        for start in range(0, block_kv_major, block_kv):
            k = k_ref[0, 0, start : start + block_kv, :]
            if is_int8:
                s_raw = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
            elif fp8_native:
                # v6e+ tier: the MXU consumes e4m3 operands directly.
                s_raw = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                s_raw = jax.lax.dot_general(
                    q, k.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            # Rank-1 dequant rescale: rows by (s_q * sm_scale), cols by s_k.
            k_scale = ks_ref[0, 0, :, start : start + block_kv]  # [1, bkv]
            s = s_raw * q_scale * k_scale
            if softcap is not None:
                s = softcap * jnp.tanh(s * (1.0 / softcap))

            kv_base = kv_idx * block_kv_major + start
            if causal or mask_kv_tail:
                col = jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_kv), 1
                )
                mask = None
                if causal:
                    row = jax.lax.broadcasted_iota(
                        jnp.int32, (block_q, block_kv), 0
                    )
                    thr = q_idx * block_q - kv_base
                    mask = (col - row) <= thr
                    if window is not None:
                        mask = jnp.logical_and(
                            mask, (col - row) > thr - window
                        )
                    if alibi_ref is not None:
                        s = s + alibi_ref[0:1, 0:1] * (
                            col - row - thr
                        ).astype(jnp.float32)
                if mask_kv_tail:
                    tail = col < kv_len - kv_base
                    mask = tail if mask is None else jnp.logical_and(mask, tail)
                s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

            m_prev = m_scratch[...]
            l_prev = l_scratch[...]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next[:, :1])
            l_scratch[...] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
            m_scratch[...] = m_next

            # PV with the V dequant folded into P's columns:
            # sum_j p_j (v_j s_vj) = sum_j (p_j s_vj) v_j.
            v_scale = vs_ref[0, 0, :, start : start + block_kv]  # [1, bkv]
            if fp8_native and not is_int8:
                # PV on the fp8 MXU: renormalize each (p * v_scale) row
                # into e4m3's range (rank-1, exact to e4m3 rounding) so
                # the V payload never leaves e4m3.
                pv_f = p * v_scale
                c = jnp.max(pv_f, axis=1, keepdims=True)
                c = jnp.where(c == 0.0, 1.0, c / FP8_MAX)
                p_f8 = (pv_f / c).astype(jnp.float8_e4m3fn)
                v = v_ref[0, 0, start : start + block_kv, :]
                pv = jax.lax.dot(
                    p_f8, v, preferred_element_type=jnp.float32
                ) * c
            else:
                p_scaled = (p * v_scale).astype(jnp.bfloat16)
                v = v_ref[0, 0, start : start + block_kv, :].astype(
                    jnp.bfloat16
                )
                pv = jax.lax.dot(
                    p_scaled, v, preferred_element_type=jnp.float32
                )
            acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + pv

    if triangular:
        is_last = islast_ref[c] == 1
    elif causal:
        is_last = kv_idx == jnp.minimum(
            num_kv_blocks - 1, ((q_idx + 1) * block_q - 1) // block_kv_major
        )
    else:
        is_last = kv_idx == num_kv_blocks - 1

    @pl.when(is_last)
    def _epilogue():
        if sink_ref is None:
            l = l_scratch[:, :1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[0, 0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)
        else:
            # Attention sink (shared epilogue math: ops/flash/forward).
            from tpu_flash.ops.flash.forward import sink_denominator

            scale_m, l_tot, _ = sink_denominator(
                m_scratch[...], l_scratch[...], sink_ref[0][None, :]
            )
            o_ref[0, 0] = (
                acc_scratch[...] * (scale_m[:, :1] / l_tot[:, :1])
            ).astype(o_ref.dtype)


def _quant_onepass_kernel(
    q_ref,  # [1, 1, block_q, head_dim] int8
    qs_ref,  # [1, 1, block_q, NUM_LANES] f32 lane-replicated row scales
    k_ref,  # [1, 1, kv_len, head_dim] int8 (FULL padded KV range)
    ks_ref,  # [1, 1, 1, kv_len] f32 per-token scales
    v_ref,
    vs_ref,
    sink_ref,  # [1, NUM_LANES] f32 or None
    alibi_ref,  # [1, NUM_LANES] f32 or None
    o_ref,  # [1, 1, block_q, head_dim]
    *,
    sm_scale: float,
    num_q_blocks: int,
    diag_rows: int,
    softcap: Optional[float] = None,
):
    """INT8-input single-pass causal forward: the two-part / staircase
    geometry of ops/flash/forward.py's onepass kernel (mask-free full-M
    prefix + one masked diagonal block per 512-row stair, merged once)
    with the quantized kernel's rank-1 dequant fused in. Scores run on
    the int8 MXU; PV re-quantizes the (V-scale-folded) P rows one-sided
    to int8 — the decode kernel's quant_mxu scheme — so V payloads never
    convert on the VPU. This is what makes the int8 MXU's higher matmul
    rate visible at short seq: the tiled int8 kernel is VPU-bound
    (module docstring) and measures ~0.93x bf16, while this geometry
    strips the per-cell mask iotas and per-tile bf16 casts."""
    block_q = q_ref.shape[2]
    qb = pl.program_id(2)

    def _write(lo, hi, m, l, pv):
        if sink_ref is None:
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[0, 0, lo:hi] = (pv * l_inv).astype(o_ref.dtype)
        else:
            from tpu_flash.ops.flash.forward import sink_denominator

            sk = sink_ref[0:1, 0:1]
            scale_m, l_tot, _ = sink_denominator(m, l, sk)
            o_ref[0, 0, lo:hi] = (pv * (scale_m / l_tot)).astype(
                o_ref.dtype
            )

    def _scores(lo, hi, start, extent, thr):
        """Rank-1-dequantized scores of q rows [lo, hi) against KV columns
        [start, start+extent); thr None = mask-free strict prefix."""
        rows = hi - lo
        q8 = q_ref[0, 0, lo:hi, :]
        k8 = k_ref[0, 0, start : start + extent, :]
        s = jax.lax.dot_general(
            q8, k8, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        q_scale = qs_ref[0, 0, lo:hi, :1] * sm_scale
        s = s * q_scale * ks_ref[0, 0, :, start : start + extent]
        if softcap is not None:
            s = softcap * jnp.tanh(s * (1.0 / softcap))
        if thr is not None or alibi_ref is not None:
            col = start + jax.lax.broadcasted_iota(
                jnp.int32, (rows, extent), 1
            )
            row = jax.lax.broadcasted_iota(jnp.int32, (rows, extent), 0)
            if alibi_ref is not None:
                base = thr if thr is not None else 0
                s = s + alibi_ref[0:1, 0:1] * (col - row - base).astype(
                    jnp.float32
                )
            if thr is not None:
                s = jnp.where((col - row) <= thr, s, DEFAULT_MASK_VALUE)
        return s

    def _softmax_pv(s, start, extent):
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        # PV on the int8 MXU: fold V's per-token scales into P's columns,
        # one-sided row quantization (P >= 0), rank-1 dequant.
        pv_f = p * vs_ref[0, 0, :, start : start + extent]
        p_abs = jnp.max(pv_f, axis=1, keepdims=True)
        p_scale = jnp.where(p_abs == 0.0, 1.0, p_abs / INT8_MAX)
        p8 = jnp.clip(
            jnp.round(pv_f / p_scale), 0, INT8_MAX
        ).astype(jnp.int8)
        pv = jax.lax.dot(
            p8, v_ref[0, 0, start : start + extent, :],
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * p_scale
        return m, l, pv

    def _stair(lo, base, rs):
        """One rs-row stair at global rows [base+lo, base+lo+rs): prefix
        [0, base+lo) mask-free, diagonal [base+lo, base+lo+rs) masked,
        merged once."""
        pre = base + lo
        s2 = _scores(lo, lo + rs, pre, rs, pre)
        m2, l2, pv2 = _softmax_pv(s2, pre, rs)
        if pre > 0:
            s1 = _scores(lo, lo + rs, 0, pre,
                         pre if alibi_ref is not None else None)
            m1, l1, pv1 = _softmax_pv(s1, 0, pre)
            m = jnp.maximum(m1, m2)
            a1 = jnp.exp(m1 - m)
            a2 = jnp.exp(m2 - m)
            _write(lo, lo + rs, m, l1 * a1 + l2 * a2,
                   pv1 * a1 + pv2 * a2)
        else:
            _write(lo, lo + rs, m2, l2, pv2)

    if num_q_blocks > 1:
        # Per-q-block two-part grid (4K: the fused staircase's scores
        # tiles exceed scoped VMEM, as for the bf16 kernel).
        for i in range(num_q_blocks):
            @pl.when(qb == i)
            def _branch(i=i):
                _stair(0, i * block_q, block_q)
    else:
        # Fused staircase: the whole q range in ONE grid cell.
        for lo in range(0, block_q, diag_rows):
            _stair(lo, 0, diag_rows)


def _forward_onepass_quant(
    qv, qs, kv_, ks, vv, vs, *, sm_scale, block_q, q_per_kv, out_dtype,
    interpret, softcap=None, sinks=None, alibi=None, diag_rows=512,
):
    """Launch the INT8 single-pass causal kernel (see
    _quant_onepass_kernel)."""
    batch, num_q_heads, q_len, head_dim = qv.shape
    kv_len = kv_.shape[2]
    num_q_blocks = q_len // block_q

    in_specs = [
        pl.BlockSpec(
            (1, 1, block_q, head_dim), lambda b, h, qb: (b, h, qb, 0)
        ),
        pl.BlockSpec(
            (1, 1, block_q, NUM_LANES), lambda b, h, qb: (b, h, qb, 0)
        ),
        pl.BlockSpec(
            (1, 1, kv_len, head_dim),
            lambda b, h, qb: (b, h // q_per_kv, 0, 0),
        ),
        pl.BlockSpec(
            (1, 1, 1, kv_len), lambda b, h, qb: (b, h // q_per_kv, 0, 0)
        ),
        pl.BlockSpec(
            (1, 1, kv_len, head_dim),
            lambda b, h, qb: (b, h // q_per_kv, 0, 0),
        ),
        pl.BlockSpec(
            (1, 1, 1, kv_len), lambda b, h, qb: (b, h // q_per_kv, 0, 0)
        ),
    ]
    extra_inputs = ()
    have_sink = sinks is not None
    if have_sink:
        sinks_l = jax.lax.broadcast_in_dim(
            sinks.astype(jnp.float32), (num_q_heads, NUM_LANES), (0,)
        )
        in_specs.append(pl.BlockSpec((1, NUM_LANES), lambda b, h, qb: (h, 0)))
        extra_inputs += (sinks_l,)
    have_alibi = alibi is not None
    if have_alibi:
        alibi_l = jax.lax.broadcast_in_dim(
            alibi.astype(jnp.float32), (num_q_heads, NUM_LANES), (0,)
        )
        in_specs.append(pl.BlockSpec((1, NUM_LANES), lambda b, h, qb: (h, 0)))
        extra_inputs += (alibi_l,)

    base_kernel = functools.partial(
        _quant_onepass_kernel,
        sm_scale=float(sm_scale),
        num_q_blocks=num_q_blocks,
        diag_rows=diag_rows,
        softcap=softcap,
    )

    def kernel(*refs):
        it = iter(refs)
        q_r, qs_r, k_r, ks_r, v_r, vs_r = (
            next(it), next(it), next(it), next(it), next(it), next(it),
        )
        sk_r = next(it) if have_sink else None
        al_r = next(it) if have_alibi else None
        o_r = next(it)
        return base_kernel(q_r, qs_r, k_r, ks_r, v_r, vs_r, sk_r, al_r,
                           o_r)

    rs = diag_rows if num_q_blocks == 1 else block_q
    n_stairs = q_len // rs
    cell_tokens = rs * rs * n_stairs * (n_stairs + 1) // 2
    cost = pl.CostEstimate(
        flops=4 * batch * num_q_heads * cell_tokens * head_dim,
        bytes_accessed=(
            qv.size + kv_.size + vv.size
            + qv.size * jnp.dtype(out_dtype).itemsize
        ),
        transcendentals=batch * num_q_heads * cell_tokens,
    )
    out = pl.pallas_call(
        kernel,
        grid=(batch, num_q_heads, num_q_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, block_q, head_dim), lambda b, h, qb: (b, h, qb, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(qv.shape, out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(qv, qs, kv_, ks, vv, vs, *extra_inputs)
    return out


def flash_attention_quantized(
    inputs: Union[QuantizedAttentionInputs, tuple],
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_sizes: Optional[BlockSizes] = None,
    out_dtype=jnp.bfloat16,
    kv_len: Optional[int] = None,
    interpret: Optional[bool] = None,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    sinks: Optional[jax.Array] = None,  # [num_q_heads] sink logits
    alibi: Optional[jax.Array] = None,  # [num_q_heads] ALiBi slopes
    fp8_native: Optional[bool] = None,
) -> jax.Array:
    """Fused attention over quantized Q/K/V (INT8 or FP8-e4m3 payloads).

    ``inputs`` comes from :func:`quantize_attention_inputs` (or an
    equivalent pipeline that already holds quantized activations). GQA is
    supported: hkv must divide hq. This inference path requires the
    *stored* lengths to be block-aligned (q_len % block_q == 0 and stored
    kv % block_kv_major == 0); for a ragged true KV length, zero-pad K/V
    to alignment and pass the true length as ``kv_len`` — the kernel masks
    the padded tail so it contributes no probability mass.

    ``fp8_native`` (fp8 payloads only): feed e4m3 operands to the MXU
    directly — scores as e4m3 x e4m3 and PV with a rank-1 renormalized
    e4m3 P — instead of the software e4m3->bf16 cast tier. Default
    (None) probes the attached device (native fp8 MXU is v6e+,
    utils/device.py); pass True/False to force a tier.
    """
    qv, qs, kv_, ks, vv, vs, dtype_name = inputs
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if fp8_native is None:
        from tpu_flash.utils.device import device_info

        fp8_native = (
            dtype_name == "fp8" and device_info().native_fp8_matmul
        )
    batch, num_q_heads, q_len, head_dim = qv.shape
    _, num_kv_heads, kv_len_stored, _ = kv_.shape
    if kv_len is None:
        kv_len = kv_len_stored
    if not 0 < kv_len <= kv_len_stored:
        raise ValueError(
            f"kv_len ({kv_len}) must be in (0, stored kv length "
            f"{kv_len_stored}]"
        )
    q_per_kv = num_q_heads // num_kv_heads
    if window is not None:
        if not causal:
            raise ValueError("window requires causal=True")
        if window < 1:
            raise ValueError(f"window must be >= 1, got {window}")
        if window >= q_len:
            window = None  # covers every position: plain causal
    if softcap is not None and softcap <= 0:
        raise ValueError(f"softcap must be > 0, got {softcap}")
    if alibi is not None and not causal:
        raise ValueError("alibi requires causal=True")
    if sm_scale is None:
        sm_scale = head_dim**-0.5
    if block_sizes is None:
        block_sizes = default_block_sizes(
            q_len, kv_len_stored, head_dim, "int8"
        )

    block_q = min(block_sizes.block_q, q_len)
    block_kv_major = min(block_sizes.block_kv_major, kv_len_stored)
    block_kv = min(block_sizes.block_kv, block_kv_major)
    if (
        q_len % block_q
        or kv_len_stored % block_kv_major
        or block_q % 8
        or block_kv_major % NUM_LANES
    ):
        raise ValueError(
            "quantized path needs q_len divisible by a sublane-aligned "
            f"block_q and the stored kv length by a lane-aligned "
            f"block_kv_major; got q_len={q_len}, stored kv="
            f"{kv_len_stored}, blocks=({block_q}, {block_kv_major})"
        )
    num_q_blocks = q_len // block_q
    num_kv_blocks = kv_len_stored // block_kv_major

    # INT8 single-pass short-seq path (the bf16 onepass geometry with
    # rank-1 dequant + int8-MXU PV): <= 2K fuses the whole q range into
    # one staircase cell per head. OPT-IN (onepass_diag must be set):
    # the only paired honest-protocol reading (2K: onepass 59.4 vs the
    # 512-tile tiled kernel's 51.7 TF/s, BENCHLOG 2026-08-21) beat a
    # HANDICAPPED baseline — the tiled kernel's default 1024 tiles are
    # expected well above both (the P re-quantization VPU chain costs
    # more than the int8-MXU rate saves; Mosaic int8 dots run only
    # 1.16x bf16 vs raw XLA's 1.77x, tools/hw_ab/mosaic_int8_ceiling).
    # Kept opt-in for v6e-era re-evaluation rather than auto-routed.
    if (
        getattr(block_sizes, "onepass", False)
        and block_sizes.onepass_diag is not None
        and dtype_name == "int8"
        and causal
        and window is None
        and kv_len == kv_len_stored == q_len
        and q_len % 512 == 0
        and 512 < q_len <= 2048
        # 4K per-q-block two-part OOMs scoped VMEM (17.1M > 16M): the
        # int8 path carries an extra int32 scores tile the bf16 kernel
        # doesn't, so only the <= 2K fused staircase fits.
    ):
        op_bq = q_len
        return _forward_onepass_quant(
            qv, qs, kv_, ks, vv, vs,
            sm_scale=sm_scale, block_q=op_bq, q_per_kv=q_per_kv,
            out_dtype=out_dtype, interpret=interpret, softcap=softcap,
            sinks=sinks, alibi=alibi, diag_rows=512,
        )

    if causal:

        def kv_block_index(q, kv):
            kv = jnp.minimum(
                kv, ((q + 1) * block_q - 1) // block_kv_major
            )
            if window is not None:
                kv = jnp.maximum(
                    kv,
                    jnp.maximum(
                        (q * block_q - window + 1) // block_kv_major, 0
                    ),
                )
            return kv

    else:

        def kv_block_index(q, kv):
            return kv

    grid = (batch, num_q_heads, num_q_blocks, num_kv_blocks)
    in_specs = [
        pl.BlockSpec(
            (1, 1, block_q, head_dim), lambda b, h, q, kv: (b, h, q, 0)
        ),
        pl.BlockSpec(
            (1, 1, block_q, NUM_LANES), lambda b, h, q, kv: (b, h, q, 0)
        ),
        pl.BlockSpec(
            (1, 1, block_kv_major, head_dim),
            lambda b, h, q, kv: (b, h // q_per_kv, kv_block_index(q, kv), 0),
        ),
        pl.BlockSpec(
            (1, 1, 1, block_kv_major),
            lambda b, h, q, kv: (b, h // q_per_kv, 0, kv_block_index(q, kv)),
        ),
        pl.BlockSpec(
            (1, 1, block_kv_major, head_dim),
            lambda b, h, q, kv: (b, h // q_per_kv, kv_block_index(q, kv), 0),
        ),
        pl.BlockSpec(
            (1, 1, 1, block_kv_major),
            lambda b, h, q, kv: (b, h // q_per_kv, 0, kv_block_index(q, kv)),
        ),
    ]

    triangular = causal and block_sizes.triangular

    kernel = functools.partial(
        _quant_fwd_kernel,
        causal=causal,
        sm_scale=float(sm_scale),
        block_kv=block_kv,
        kv_len=kv_len,
        num_kv_blocks=num_kv_blocks,
        mask_kv_tail=kv_len < kv_len_stored,
        is_int8=dtype_name == "int8",
        fp8_native=bool(fp8_native) and dtype_name == "fp8",
        triangular=triangular,
        window=int(window) if window is not None else None,
        softcap=float(softcap) if softcap is not None else None,
        have_sink=sinks is not None,
        have_alibi=alibi is not None,
    )

    extra_inputs = ()
    extra_rect_specs = []
    extra_tri_specs = []
    for vals in (sinks, alibi):
        if vals is None:
            continue
        extra_inputs = extra_inputs + (
            jax.lax.broadcast_in_dim(
                vals.astype(jnp.float32), (num_q_heads, NUM_LANES), (0,)
            ),
        )
        extra_rect_specs.append(
            pl.BlockSpec((1, NUM_LANES), lambda b, h, q, kv: (h, 0))
        )
        extra_tri_specs.append(
            pl.BlockSpec((1, NUM_LANES), lambda b, h, c, qm, km, il: (h, 0))
        )
    in_specs = in_specs + extra_rect_specs

    cost = pl.CostEstimate(
        flops=4 * batch * num_q_heads * q_len * kv_len * head_dim,
        bytes_accessed=int(
            qv.size + kv_.size + vv.size
            + qs.size * 4 + ks.size * 4 + vs.size * 4
            + batch * num_q_heads * q_len * head_dim
            * jnp.dtype(out_dtype).itemsize
        ),
        transcendentals=batch * num_q_heads * q_len * kv_len,
    )

    scratch_shapes = [
        pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
        pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
        pltpu.VMEM((block_q, head_dim), jnp.float32),
    ]
    out_shape = jax.ShapeDtypeStruct(
        (batch, num_q_heads, q_len, head_dim), out_dtype
    )

    if triangular:
        from tpu_flash.ops.flash.forward import build_tri_cells

        qmap, kvmap, islast = build_tri_cells(
            num_q_blocks, num_kv_blocks, block_q, block_kv_major, 0,
            window=window,
        )
        n_cells = qmap.shape[0]
        tri_in_specs = [
            pl.BlockSpec(
                (1, 1, block_q, head_dim),
                lambda b, h, c, qm, km, il: (b, h, qm[c], 0),
            ),
            pl.BlockSpec(
                (1, 1, block_q, NUM_LANES),
                lambda b, h, c, qm, km, il: (b, h, qm[c], 0),
            ),
            pl.BlockSpec(
                (1, 1, block_kv_major, head_dim),
                lambda b, h, c, qm, km, il: (b, h // q_per_kv, km[c], 0),
            ),
            pl.BlockSpec(
                (1, 1, 1, block_kv_major),
                lambda b, h, c, qm, km, il: (b, h // q_per_kv, 0, km[c]),
            ),
            pl.BlockSpec(
                (1, 1, block_kv_major, head_dim),
                lambda b, h, c, qm, km, il: (b, h // q_per_kv, km[c], 0),
            ),
            pl.BlockSpec(
                (1, 1, 1, block_kv_major),
                lambda b, h, c, qm, km, il: (b, h // q_per_kv, 0, km[c]),
            ),
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(batch, num_q_heads, n_cells),
            in_specs=tri_in_specs + extra_tri_specs,
            out_specs=pl.BlockSpec(
                (1, 1, block_q, head_dim),
                lambda b, h, c, qm, km, il: (b, h, qm[c], 0),
            ),
            scratch_shapes=scratch_shapes,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=cost,
            interpret=interpret,
        )(qmap, kvmap, islast, qv, qs, kv_, ks, vv, vs, *extra_inputs)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, block_q, head_dim), lambda b, h, q, kv: (b, h, q, 0)
        ),
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel", "parallel", "parallel", "arbitrary",
            ),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(qv, qs, kv_, ks, vv, vs, *extra_inputs)


def dequantize_attention_inputs(
    inputs: QuantizedAttentionInputs, dtype=jnp.float32
):
    """Exact dequantized q/k/v — the parity oracle for the fused kernel."""
    q = inputs.q_values.astype(jnp.float32) * inputs.q_scales[..., :1]
    k = (
        inputs.k_values.astype(jnp.float32)
        * inputs.k_scales[:, :, 0, :, None]
    )
    v = (
        inputs.v_values.astype(jnp.float32)
        * inputs.v_scales[:, :, 0, :, None]
    )
    return q.astype(dtype), k.astype(dtype), v.astype(dtype)
