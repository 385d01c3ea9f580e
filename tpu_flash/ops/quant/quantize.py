"""Quantization for activations and the KV cache.

The reference is FP32-only (helpers.hpp:13, utils.cuh:13); quantized Q/K/V
and a quantized KV cache are north-star extensions (BASELINE.json). Scheme:
symmetric per-row (per-token, per-head) absmax scaling — the last axis of a
tensor shares one scale, so dequantization fuses into the QK^T / PV matmuls
as a rank-1 rescale of the scores/outputs:

    (q_int * s_q) @ (k_int * s_k)^T == s_q * (q_int @ k_int^T) * s_k^T

which is how the attention kernels consume QuantizedTensor without ever
materializing dequantized operands in VMEM.

Supported payloads: int8, int4 (packed two-per-byte in int8 carrier), and
float8_e4m3fn. int4 packing keeps the *lane* dimension contiguous so a page
of packed KV is still a dense (page, head_dim/2) tile for DMA.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT8_MAX = 127.0
INT4_MAX = 7.0
FP8_MAX = 448.0  # e4m3fn
INT4_GROUP = 32  # channels per (scale, zero) group of the int4g32 tier
INT4_LEVELS = 15.0  # unsigned asymmetric nibbles span [0, 15]


def int4g32_num_groups(head_dim: int) -> int:
    """Groups per row of the int4g32 tier: d/32 when 32 divides d, else
    ONE whole-row group (per-token asymmetric — the graceful fallback
    for tiny test dims like d=16)."""
    if head_dim >= INT4_GROUP and head_dim % INT4_GROUP == 0:
        return head_dim // INT4_GROUP
    return 1


class QuantizedTensor(NamedTuple):
    """Payload + per-row scales.

    ``packing`` describes where int4 nibbles live:
      * "lanes"  — packed along the last (lane) dim: payload d/2 lanes.
      * "tokens" — packed along the second-to-last (token/sublane) dim:
        payload rows/2, full d lanes. This is the KV-page layout: TPU DMA
        slices must keep a 128-aligned lane dim, so pages pack two *tokens*
        per byte (row j = token j low nibble, token j + rows/2 high nibble).
    ``scales`` always has the *logical* shape with the last axis reduced
    to 1 — EXCEPT "int4g32" (group-wise asymmetric, the quality tier
    selected on trained-checkpoint evidence, BENCHLOG 2026-08-21 r5):
    there ``scales`` has last axis ``2 * d/32`` holding the per-32-channel
    group (scale..., zero...) pairs of each row, and nibbles are UNSIGNED
    (x ≈ q * scale + zero, q ∈ [0, 15]).
    """

    values: jax.Array
    scales: jax.Array
    dtype_name: str  # "int8" | "int4" | "int4g32" | "fp8"
    packing: str = "lanes"

    @property
    def logical_shape(self):
        if self.dtype_name in ("int4", "int4g32"):
            if self.packing == "tokens":
                return (
                    *self.values.shape[:-2],
                    self.values.shape[-2] * 2,
                    self.values.shape[-1],
                )
            return (*self.values.shape[:-1], self.values.shape[-1] * 2)
        return self.values.shape


def _pack_int4(x_int: jax.Array) -> jax.Array:
    """Pack int4 values in [-8, 7] into int8 with *split* layout: element j
    in the low nibble, element j + d/2 in the high nibble. Unpacking is then
    a lane-dim concat — free on TPU — instead of an interleave relayout."""
    d = x_int.shape[-1]
    lo = x_int[..., : d // 2] & 0xF
    hi = x_int[..., d // 2 :] & 0xF
    return (lo | (hi << 4)).astype(jnp.int8)


def _unpack_int4(packed: jax.Array) -> jax.Array:
    """Inverse of _pack_int4 (split layout), sign-extending each nibble."""
    packed = packed.astype(jnp.int32)
    lo = (packed << 28) >> 28  # sign-extend low nibble
    hi = (packed << 24) >> 28  # sign-extend high nibble
    return jnp.concatenate([lo, hi], axis=-1)


def _pack_int4_tokens(x_int: jax.Array) -> jax.Array:
    """Pack int4 along the second-to-last (token) dim: row j low nibble,
    row j + rows/2 high nibble. Lane dim stays full width (DMA-aligned)."""
    rows = x_int.shape[-2]
    lo = x_int[..., : rows // 2, :] & 0xF
    hi = x_int[..., rows // 2 :, :] & 0xF
    return (lo | (hi << 4)).astype(jnp.int8)


def _unpack_int4_tokens(packed: jax.Array) -> jax.Array:
    packed = packed.astype(jnp.int32)
    lo = (packed << 28) >> 28
    hi = (packed << 24) >> 28
    return jnp.concatenate([lo, hi], axis=-2)


def _unpack_uint4_tokens(packed: jax.Array) -> jax.Array:
    """Token-packed UNSIGNED nibbles (the int4g32 payload: q ∈ [0, 15],
    no sign extension)."""
    packed = packed.astype(jnp.int32)
    lo = packed & 0xF
    hi = (packed >> 4) & 0xF
    return jnp.concatenate([lo, hi], axis=-2)


def quantize_group_asym(
    x: jax.Array, group: Optional[int] = None
) -> "tuple[jax.Array, jax.Array]":
    """Group-wise ASYMMETRIC int4: per (row, ``group``-channel group)
    affine quantization x ≈ q * scale + zero with unsigned q ∈ [0, 15].

    The int4 quality tier: on the trained checkpoint's real K/V tensors
    this reads attention-output error 0.094 vs 0.143 for per-token
    symmetric (tools/quant_scheme_probe.py, BENCHLOG 2026-08-21 r5) —
    channel-group affine ranges absorb the per-channel offsets/outliers
    iid-random weights don't have.

    Returns (q [..., rows, d] int32 nibble values,
             scales [..., rows, 2 * d/group] = per-row [scale..., zero...]).
    """
    xf = x.astype(jnp.float32)
    *lead, rows, d = xf.shape
    if group is None:
        group = d // int4g32_num_groups(d)
    if d % group:
        raise ValueError(f"head_dim {d} must divide group {group}")
    ng = d // group
    xg = xf.reshape(*lead, rows, ng, group)
    lo = jnp.min(xg, axis=-1)
    hi = jnp.max(xg, axis=-1)
    scale = jnp.where(hi - lo == 0, 1.0, (hi - lo) / INT4_LEVELS)
    q = jnp.clip(
        jnp.round((xg - lo[..., None]) / scale[..., None]),
        0.0, INT4_LEVELS,
    ).astype(jnp.int32)
    scales = jnp.concatenate([scale, lo], axis=-1)  # [..., rows, 2*ng]
    return q.reshape(*lead, rows, d), scales


def dequantize_group_asym(
    q: jax.Array, scales: jax.Array, dtype=jnp.float32
) -> jax.Array:
    """Inverse of :func:`quantize_group_asym` (q unpacked, [..., rows, d]);
    the group count is inferred from the scales' trailing dim."""
    *lead, rows, d = q.shape
    ng = scales.shape[-1] // 2
    group = d // ng
    scale = scales[..., :ng]
    zero = scales[..., ng:]
    xg = (
        q.reshape(*lead, rows, ng, group).astype(jnp.float32)
        * scale[..., None]
        + zero[..., None]
    )
    return xg.reshape(*lead, rows, d).astype(dtype)


def quantize(
    x: jax.Array, dtype_name: str = "int8", packing: str = "lanes"
) -> QuantizedTensor:
    """Symmetric per-row (last-axis) absmax quantization."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    if dtype_name == "int8":
        scale = jnp.where(absmax == 0, 1.0, absmax / INT8_MAX)
        q = jnp.clip(jnp.round(xf / scale), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    elif dtype_name == "int4":
        scale = jnp.where(absmax == 0, 1.0, absmax / INT4_MAX)
        qi = jnp.clip(jnp.round(xf / scale), -INT4_MAX, INT4_MAX).astype(
            jnp.int32
        )
        if packing == "tokens":
            if x.shape[-2] % 2:
                raise ValueError("token packing needs an even row count")
            q = _pack_int4_tokens(qi)
        else:
            if x.shape[-1] % 2:
                raise ValueError("lane packing needs an even last dimension")
            q = _pack_int4(qi)
    elif dtype_name == "fp8":
        scale = jnp.where(absmax == 0, 1.0, absmax / FP8_MAX)
        q = (xf / scale).astype(jnp.float8_e4m3fn)
    else:
        raise ValueError(f"unsupported quant dtype {dtype_name!r}")
    return QuantizedTensor(
        values=q, scales=scale, dtype_name=dtype_name, packing=packing
    )


def quantize_pages(pages: jax.Array, dtype_name: str) -> QuantizedTensor:
    """Quantize KV pages [..., page_size, head_dim] in the cache layout:
    int8 keeps the page shape; int4/int4g32 token-pack to
    [..., page_size/2, d] (int4g32 carries [..., page_size, 2*d/32]
    group scale/zero rows instead of per-token scales)."""
    if dtype_name == "int4g32":
        q, scales = quantize_group_asym(pages)
        # Page layout stores the affine rows TRANSPOSED: [..., 2*ng, ps]
        # (group rows in sublanes, tokens in lanes) — the same
        # tokens-in-lanes layout the symmetric tiers use, so per-page DMA
        # slices stay lane-aligned and the kernel consumes them as
        # [1, bk] column vectors without any in-kernel transpose.
        return QuantizedTensor(
            values=_pack_int4_tokens(q),
            scales=jnp.swapaxes(scales, -1, -2),
            dtype_name="int4g32", packing="tokens",
        )
    packing = "tokens" if dtype_name == "int4" else "lanes"
    return quantize(pages, dtype_name, packing=packing)


def dequantize(qt: QuantizedTensor, dtype=jnp.float32) -> jax.Array:
    if qt.dtype_name == "int4g32":
        if qt.packing != "tokens":
            raise ValueError("int4g32 is a token-packed page format")
        q = _unpack_uint4_tokens(qt.values)
        # Scales ride transposed in the page layout ([..., 2*ng, ps]).
        return dequantize_group_asym(
            q, jnp.swapaxes(qt.scales, -1, -2), dtype=dtype
        )
    if qt.dtype_name == "int4":
        if qt.packing == "tokens":
            vals = _unpack_int4_tokens(qt.values).astype(jnp.float32)
        else:
            vals = _unpack_int4(qt.values).astype(jnp.float32)
    else:
        vals = qt.values.astype(jnp.float32)
    return (vals * qt.scales).astype(dtype)


# ---------------------------------------------------------------------------
# Fused Pallas quantization kernel (per-row, int8) — used on the KV-cache
# append path so new K/V tokens are quantized on-chip without an HBM
# round-trip of the fp values.
# ---------------------------------------------------------------------------


def _quant_kernel(x_ref, v_ref, s_ref):
    x = x_ref[...].astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax / INT8_MAX)
    v_ref[...] = jnp.clip(jnp.round(x / scale), -INT8_MAX, INT8_MAX).astype(
        jnp.int8
    )
    s_ref[...] = jnp.broadcast_to(scale, s_ref.shape).astype(s_ref.dtype)


def quantize_pallas(
    x: jax.Array, *, block_rows: int = 256, interpret: bool | None = None
) -> QuantizedTensor:
    """INT8 per-row quantization as a single fused Pallas pass.

    x: [..., rows, d] with rows % 8 == 0 and d % 128 == 0 preferred.
    Scales are emitted lane-replicated [..., rows, 128] then sliced, so the
    kernel writes lane-aligned tiles only.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    *lead, rows, d = x.shape
    x2 = x.reshape(-1, d)
    n = x2.shape[0]
    block_rows = min(block_rows, n)
    if n % block_rows:
        raise ValueError(f"rows ({n}) must divide block_rows ({block_rows})")

    vals, scales = pl.pallas_call(
        _quant_kernel,
        grid=(n // block_rows,),
        in_specs=[pl.BlockSpec((block_rows, d), lambda i: (i, 0))],
        out_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, 128), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, d), jnp.int8),
            jax.ShapeDtypeStruct((n, 128), jnp.float32),
        ],
        interpret=interpret,
    )(x2)
    return QuantizedTensor(
        values=vals.reshape(*lead, rows, d),
        scales=scales[:, :1].reshape(*lead, rows, 1),
        dtype_name="int8",
    )
