"""Paged KV-cache: device-side page arrays + jit-friendly append ops.

Layout per layer (matching ops/decode/paged.py):
  k_pages, v_pages: [num_layers, num_kv_heads, num_pages, page_size, d_pay]
  k_scales, v_scales (quantized): [num_layers, num_kv_heads, num_pages,
                                   page_size]

Appends are pure functions (returning updated arrays) so they jit/donate
cleanly; page allocation is host-side (engine/allocator.py). Quantized
caches quantize new tokens per-row at append time (INT8 or split-nibble
INT4, ops/quant/quantize.py), so the cache never holds fp K/V.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tpu_flash.core.config import CacheConfig
from tpu_flash.ops.quant.quantize import (
    FP8_MAX,
    INT4_MAX,
    INT8_MAX,
    QuantizedTensor,
)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PagedKVCache:
    """Device arrays of one model's KV pages across layers.

    ``k_recent``/``v_recent`` (quantized caches with
    CacheConfig.recent_window > 0): a per-slot bf16 ring of the last
    ``recent_window`` tokens' exact K/V — the KIVI-style residual window.
    Every append dual-writes (quantized page + ring), so the pages always
    hold the full context and any reader may ignore the ring; the decode
    path attends pages for [0, L - W) and the ring for [L - W, L), which
    is where 4-bit noise otherwise feeds back into generation (measured:
    int4 stress token-match 0.10 -> 0.66-1.0 depending on W vs context;
    BENCHLOG 2026-08-20 round 4). Ring layout: [layers, slots, hkv, W, d],
    token at position p lives at ring row p % W; validity is derived from
    lengths, so no positions are stored.
    """

    k_pages: jax.Array
    v_pages: jax.Array
    k_scales: Optional[jax.Array]
    v_scales: Optional[jax.Array]
    page_size: int
    kv_dtype: str  # bfloat16|float32|int8|int4|int4g32|k8v4|fp8
    k_recent: Optional[jax.Array] = None
    v_recent: Optional[jax.Array] = None

    def tree_flatten(self):
        children = (self.k_pages, self.v_pages, self.k_scales,
                    self.v_scales, self.k_recent, self.v_recent)
        aux = (self.page_size, self.kv_dtype)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children[:4], *aux, *children[4:])

    # -- construction -------------------------------------------------------

    @classmethod
    def create(
        cls,
        num_layers: int,
        num_kv_heads: int,
        head_dim: int,
        config: CacheConfig,
        num_slots: int = 0,
    ) -> "PagedKVCache":
        quant = config.quantized

        def side_layout(dtype_name):
            """(payload dtype, payload rows/page) of one cache side."""
            if dtype_name in ("int4", "int4g32"):
                # Token-packed nibbles: half the page rows, full lane
                # width (keeps DMA slices 128-lane aligned;
                # ops/quant/quantize.py).
                if config.page_size % 2:
                    raise ValueError(
                        "int4 cache requires an even page_size"
                    )
                return jnp.int8, config.page_size // 2
            if dtype_name == "int8":
                return jnp.int8, config.page_size
            if dtype_name == "fp8":
                # e4m3 payload (native MXU dtype on v6e+; software-cast
                # on v5e — BENCHLOG fp8 notes). Same per-token scale
                # layout as int8.
                return jnp.float8_e4m3fn, config.page_size
            return jnp.dtype(dtype_name), config.page_size

        k_dt, v_dt = side_dtypes(config.kv_dtype)
        k_payload, k_rows = side_layout(k_dt)
        v_payload, v_rows = side_layout(v_dt)
        k_pages = jnp.zeros(
            (num_layers, num_kv_heads, config.num_pages, k_rows, head_dim),
            k_payload,
        )
        v_pages = jnp.zeros(
            (num_layers, num_kv_heads, config.num_pages, v_rows, head_dim),
            v_payload,
        )
        # Scales are per *logical token* regardless of payload packing.
        # Distinct buffers (not one aliased array) so jit donation works.
        # int4g32 carries per-(token, 32-channel-group) affine pairs
        # instead, stored TRANSPOSED per page: [2 * d/32, page_size]
        # (group rows in sublanes, tokens in lanes — the layout the
        # decode kernel's column-broadcast dequant consumes without a
        # transpose; ops/quant/quantize.py::quantize_group_asym).
        if config.kv_dtype == "int4g32":
            from tpu_flash.ops.quant.quantize import int4g32_num_groups

            scale_shape = (num_layers, num_kv_heads, config.num_pages,
                           2 * int4g32_num_groups(head_dim),
                           config.page_size)
        else:
            scale_shape = (num_layers, num_kv_heads, config.num_pages,
                           config.page_size)
        k_scales = jnp.ones(scale_shape, jnp.float32) if quant else None
        v_scales = jnp.ones(scale_shape, jnp.float32) if quant else None
        k_recent = v_recent = None
        if quant and config.recent_window and num_slots:
            ring_shape = (num_layers, num_slots, num_kv_heads,
                          config.recent_window, head_dim)
            k_recent = jnp.zeros(ring_shape, jnp.bfloat16)
            v_recent = jnp.zeros(ring_shape, jnp.bfloat16)
        return cls(
            k_pages=k_pages,
            v_pages=v_pages,
            k_scales=k_scales,
            v_scales=v_scales,
            page_size=config.page_size,
            kv_dtype=config.kv_dtype,
            k_recent=k_recent,
            v_recent=v_recent,
        )

    @property
    def num_layers(self) -> int:
        return self.k_pages.shape[0]

    @property
    def quantized(self) -> bool:
        return self.kv_dtype in (
            "int8", "int4", "int4g32", "k8v4", "fp8"
        )

    def layer_view(self, layer: int):
        """(k, v) for ops/decode/paged.py — QuantizedTensor when quantized."""
        if not self.quantized:
            return self.k_pages[layer], self.v_pages[layer]
        if self.kv_dtype == "int4g32":
            # Group-affine scales keep their [*, page_size, 2*ng] shape.
            k = QuantizedTensor(
                self.k_pages[layer], self.k_scales[layer],
                self.kv_dtype, "tokens",
            )
            v = QuantizedTensor(
                self.v_pages[layer], self.v_scales[layer],
                self.kv_dtype, "tokens",
            )
            return k, v
        k_dt, v_dt = side_dtypes(self.kv_dtype)
        k = QuantizedTensor(
            self.k_pages[layer], self.k_scales[layer][..., None],
            k_dt, "tokens" if k_dt == "int4" else "lanes",
        )
        v = QuantizedTensor(
            self.v_pages[layer], self.v_scales[layer][..., None],
            v_dt, "tokens" if v_dt == "int4" else "lanes",
        )
        return k, v

    # -- appends ------------------------------------------------------------

    @property
    def recent_window(self) -> int:
        return 0 if self.k_recent is None else self.k_recent.shape[3]

    def append(
        self,
        layer: int,
        new_k: jax.Array,  # [num_tokens, num_kv_heads, head_dim]
        new_v: jax.Array,
        page_ids: jax.Array,  # [num_tokens] physical page per token
        offsets: jax.Array,  # [num_tokens] slot within the page
        slots: Optional[jax.Array] = None,  # [num_tokens] batch slot per token
        positions: Optional[jax.Array] = None,  # [num_tokens] absolute pos
    ) -> "PagedKVCache":
        """Scatter new tokens' K/V into their pages (pure update).

        When the cache carries a recent ring and the caller provides
        (slots, positions), the tokens are ALSO written into their slots'
        rings at row ``position % recent_window`` (dual write). Callers
        that cannot attribute tokens to slots may omit them — the pages
        alone stay complete and correct; those tokens just won't be
        readable from the ring (pass slots=None on paths that do not
        consume the ring).
        """
        k_dt, v_dt = side_dtypes(self.kv_dtype)
        kq, ks = _quantize_rows(new_k, k_dt)
        vq, vs = _quantize_rows(new_v, v_dt)
        def write_packed(pages, qi):
            # Token-packed nibbles: read-modify-write the shared byte at
            # payload row (offset % rows); low nibble holds tokens in the
            # first half of the page, high nibble the second half.
            #
            # COLLISION HANDLING (bug found+fixed 2026-08-21 r5): one
            # append call may carry BOTH nibble halves of the same byte
            # (any prefill chunk spanning a half-page boundary, e.g.
            # chunk >= page_size). A naive per-token RMW scatters
            # duplicate byte indices whose writes each contain the OTHER
            # token's field read from the STALE page — last writer wins
            # and the partner nibble is lost (measured: first-half tokens
            # of a 1-call full-page append dequantized to garbage). Fix:
            # every token's write value pre-merges its in-call partner's
            # nibble (a [T, T] pair matmul), so colliding writers write
            # IDENTICAL bytes and scatter order stops mattering.
            rows = pages.shape[3]
            prow = offsets % rows
            is_high = offsets >= rows  # [tok]
            byte_key = page_ids * rows + prow
            pair = jnp.logical_and(
                byte_key[:, None] == byte_key[None, :],
                is_high[:, None] != is_high[None, :],
            ).astype(jnp.int32)  # [T, T]: my in-call other-nibble partner
            has_partner = (jnp.sum(pair, axis=1) > 0)[:, None, None]
            hi3 = is_high[:, None, None]
            old = (
                pages[layer, :, page_ids, prow, :].astype(jnp.int32)
                & 0xFF
            )  # [tok, hkv, d] as unsigned bytes
            nib = qi.astype(jnp.int32) & 0xF
            mine = jnp.where(hi3, nib << 4, nib)
            partner = jnp.einsum(
                "tu,uhd->thd", pair, mine,
                preferred_element_type=jnp.int32,
            )
            my_field = jnp.where(hi3, 0xF0, 0x0F)
            keep = jnp.where(has_partner, 0x00, 0xFF ^ my_field)
            new = (old & keep) | mine | partner
            new = jax.lax.bitcast_convert_type(
                new.astype(jnp.uint8), jnp.int8
            )
            return pages.at[layer, :, page_ids, prow, :].set(new)

        def write_rows(pages, qi):
            # Mixed basic/advanced indexing moves the advanced (token)
            # dim to the front: the scatter target shape is
            # [tokens, hkv, d] — exactly the incoming tokens' layout.
            return pages.at[layer, :, page_ids, offsets, :].set(
                qi.astype(pages.dtype)
            )

        packed = ("int4", "int4g32")
        k_pages = (
            write_packed(self.k_pages, kq) if k_dt in packed
            else write_rows(self.k_pages, kq)
        )
        v_pages = (
            write_packed(self.v_pages, vq) if v_dt in packed
            else write_rows(self.v_pages, vq)
        )
        k_scales, v_scales = self.k_scales, self.v_scales
        if self.kv_dtype == "int4g32":
            # Affine rows live transposed: [.., np, 2*ng, ps]; each
            # token scatters its [2*ng] column at lane ``offset``.
            k_scales = k_scales.at[layer, :, page_ids, :, offsets].set(ks)
            v_scales = v_scales.at[layer, :, page_ids, :, offsets].set(vs)
        elif self.quantized:
            k_scales = k_scales.at[layer, :, page_ids, offsets].set(ks)
            v_scales = v_scales.at[layer, :, page_ids, offsets].set(vs)
        k_recent, v_recent = self.k_recent, self.v_recent
        if k_recent is not None and slots is not None:
            ring_row = positions % self.recent_window
            k_recent = k_recent.at[layer, slots, :, ring_row, :].set(
                new_k.astype(k_recent.dtype)
            )
            v_recent = v_recent.at[layer, slots, :, ring_row, :].set(
                new_v.astype(v_recent.dtype)
            )
        return dataclasses.replace(
            self,
            k_pages=k_pages,
            v_pages=v_pages,
            k_scales=k_scales,
            v_scales=v_scales,
            k_recent=k_recent,
            v_recent=v_recent,
        )

    def write_recent(
        self,
        layer: int,
        new_k: jax.Array,  # [num_tokens, num_kv_heads, head_dim]
        new_v: jax.Array,
        slots: jax.Array,  # [num_tokens] (trash slot for discarded tokens)
        positions: jax.Array,  # [num_tokens]
    ) -> "PagedKVCache":
        """Ring-only write (speculative verify: pages were appended before
        acceptance was known; accepted tokens' ring rows are healed here,
        rejected ones route to the trash slot)."""
        if self.k_recent is None:
            return self
        row = positions % self.recent_window
        return dataclasses.replace(
            self,
            k_recent=self.k_recent.at[layer, slots, :, row, :].set(
                new_k.astype(self.k_recent.dtype)
            ),
            v_recent=self.v_recent.at[layer, slots, :, row, :].set(
                new_v.astype(self.v_recent.dtype)
            ),
        )

    def copy_recent(self, src_slot: int, dst_slots) -> "PagedKVCache":
        """Copy one slot's recent ring into other slots (sampling forks:
        branches start from the parent's context, so they inherit its
        exact-tail window)."""
        if self.k_recent is None:
            return self
        dst = jnp.asarray(dst_slots)
        k_recent = self.k_recent.at[:, dst].set(
            self.k_recent[:, src_slot][:, None]
            if dst.ndim else self.k_recent[:, src_slot]
        )
        v_recent = self.v_recent.at[:, dst].set(
            self.v_recent[:, src_slot][:, None]
            if dst.ndim else self.v_recent[:, src_slot]
        )
        return dataclasses.replace(
            self, k_recent=k_recent, v_recent=v_recent
        )


def side_dtypes(kv_dtype: str):
    """(k_dtype, v_dtype) of a cache tier. "k8v4" is the mixed tier:
    K at int8 (generation quality tracks K precision much harder than
    V's — the r5 scheme sims read k8+v4 at 0.80 prefix vs 0.54 for
    uniform int4g32), V at token-packed int4."""
    if kv_dtype == "k8v4":
        return "int8", "int4"
    return kv_dtype, kv_dtype


def _quantize_rows(x: jax.Array, kv_dtype: str):
    """Per-row symmetric quantization of new tokens; identity for fp."""
    if kv_dtype == "fp8":
        xf = x.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        scale = jnp.where(absmax == 0, 1.0, absmax / FP8_MAX)
        q = (xf / scale).astype(jnp.float8_e4m3fn)
        return q, scale[..., 0]
    if kv_dtype == "int8":
        xf = x.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        scale = jnp.where(absmax == 0, 1.0, absmax / INT8_MAX)
        q = jnp.clip(jnp.round(xf / scale), -INT8_MAX, INT8_MAX).astype(
            jnp.int8
        )
        return q, scale[..., 0]
    if kv_dtype == "int4":
        xf = x.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        scale = jnp.where(absmax == 0, 1.0, absmax / INT4_MAX)
        qi = jnp.clip(jnp.round(xf / scale), -INT4_MAX, INT4_MAX).astype(
            jnp.int32
        )
        # Unpacked nibble values; append() packs them into the shared byte.
        return qi, scale[..., 0]
    if kv_dtype == "int4g32":
        from tpu_flash.ops.quant.quantize import quantize_group_asym

        # q [tok, hkv, d] unsigned nibbles; scales [tok, hkv, 2*ng]
        # (per-group scale rows then zero rows) — append() scatters the
        # whole trailing dim per token.
        return quantize_group_asym(x)
    return x, None


def positions_to_page_slots(
    positions: jax.Array, page_table_row: jax.Array, page_size: int
) -> Tuple[jax.Array, jax.Array]:
    """Map absolute token positions of one sequence to (physical page,
    in-page offset) using its page table row."""
    logical = positions // page_size
    offsets = positions % page_size
    return page_table_row[logical], offsets
