"""Multi-LoRA serving: per-request low-rank adapters over one base model.

vLLM-style multi-adapter serving for the continuous-batching engine: any
number of LoRA adapters register up front, each request names one (or
none), and every batched program — chunked/ragged prefill, fused decode,
speculative verify — applies each row's own adapter in the same dispatch.

Device layout (static shapes, jit-friendly): adapters stack into per-
layer, per-projection tensors padded to the maximum rank:

    A: [n_adapters + 1, fan_in,  R]     (index 0 = the null adapter)
    B: [n_adapters + 1, R, fan_out]

A row with adapter id ``i`` adds ``(x @ A[i]) @ B[i] * (alpha/r)`` to the
base projection — the scaling folds into B at registration, and ranks
below R pad with zeros, so the null adapter and shorter ranks are just
zero columns. Per-row application is two small einsums over gathered
[rows, fan, R] slices; for serving-sized R (8-64) this is negligible
next to the base matmul.

The reference project has no serving layer at all (SURVEY.md §1); this
extends the engine scope the same way the scheduler/prefix-cache do.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Projections an adapter may target (matching the model's layer params).
LORA_PROJS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


class LoRAStore:
    """Registered adapters, stacked into device tensors on demand.

    ``register(name, adapters, alpha=...)`` with
    ``adapters = {layer_idx: {proj: (A [in, r], B [r, out])}}``; missing
    layers/projections contribute nothing. Ids are dense ints starting
    at 1 (0 is the null adapter every un-adapted request uses).
    """

    def __init__(self, num_layers: int):
        self.num_layers = num_layers
        self._by_name: Dict[str, int] = {}
        self._adapters = []  # list of (name, {li: {proj: (A, B)}})
        self._stacks = None  # built lazily; invalidated on register

    def register(self, name: str, adapters: Mapping, *,
                 alpha: Optional[float] = None) -> int:
        """Add an adapter; returns its id. ``alpha`` scales the delta by
        alpha/r (the standard LoRA convention); None = 1.0 (pre-scaled
        weights)."""
        if name in self._by_name:
            raise ValueError(f"adapter {name!r} already registered")
        prepared: Dict[int, Dict[str, Tuple[np.ndarray, np.ndarray]]] = {}
        for li, projs in adapters.items():
            li = int(li)
            if not 0 <= li < self.num_layers:
                raise ValueError(f"layer {li} out of range")
            prepared[li] = {}
            for proj, (a, b) in projs.items():
                if proj not in LORA_PROJS:
                    raise ValueError(
                        f"unknown projection {proj!r}; expected one of "
                        f"{LORA_PROJS}"
                    )
                a = np.asarray(a, np.float32)
                b = np.asarray(b, np.float32)
                if a.ndim != 2 or b.ndim != 2 or a.shape[1] != b.shape[0]:
                    raise ValueError(
                        f"{proj}: A must be [in, r] and B [r, out] with "
                        f"matching r; got {a.shape} / {b.shape}"
                    )
                scale = 1.0 if alpha is None else alpha / a.shape[1]
                prepared[li][proj] = (a, b * scale)
        lora_id = len(self._adapters) + 1
        self._by_name[name] = lora_id
        self._adapters.append((name, prepared))
        self._stacks = None
        # Build the device stacks EAGERLY (outside any jit trace): the
        # jitted engine programs close over them as constants, and a
        # lazy build inside a trace would cache traced values (tracer
        # leak on the next dispatch).
        self.stacks()
        return lora_id

    def id_of(self, name: Optional[str]) -> int:
        if name is None:
            return 0
        if name not in self._by_name:
            raise ValueError(f"unknown adapter {name!r}")
        return self._by_name[name]

    @property
    def names(self):
        return list(self._by_name)

    @property
    def empty(self) -> bool:
        return not self._adapters

    def stacks(self):
        """Device pytree: {layer_idx: {proj: (A_stack, B_stack)}} with
        only the (layer, proj) slots any adapter actually uses. Rebuilt
        lazily after registration."""
        if self._stacks is not None:
            return self._stacks
        n = len(self._adapters)
        used: Dict[int, Dict[str, Tuple[int, int, int]]] = {}
        for _, prepared in self._adapters:
            for li, projs in prepared.items():
                for proj, (a, b) in projs.items():
                    fan_in, r = a.shape
                    out = b.shape[1]
                    prev = used.setdefault(li, {}).get(proj)
                    if prev is not None:
                        pi, po, pr = prev
                        if (pi, po) != (fan_in, out):
                            raise ValueError(
                                f"adapter shape mismatch at layer {li} "
                                f"{proj}: {(fan_in, out)} vs {(pi, po)}"
                            )
                        r = max(r, pr)
                    used[li][proj] = (fan_in, out, r)
        stacks = {}
        for li, projs in used.items():
            stacks[li] = {}
            for proj, (fan_in, out, rmax) in projs.items():
                a_stack = np.zeros((n + 1, fan_in, rmax), np.float32)
                b_stack = np.zeros((n + 1, rmax, out), np.float32)
                for i, (_, prepared) in enumerate(self._adapters):
                    ab = prepared.get(li, {}).get(proj)
                    if ab is None:
                        continue
                    a, b = ab
                    a_stack[i + 1, :, : a.shape[1]] = a
                    b_stack[i + 1, : b.shape[0], :] = b
                stacks[li][proj] = (
                    jnp.asarray(a_stack), jnp.asarray(b_stack),
                )
        self._stacks = stacks
        return stacks


def apply_lora(stacks, li: int, proj: str, x: jax.Array, y: jax.Array,
               ids: jax.Array, tp_axis: Optional[str] = None) -> jax.Array:
    """Add each row's adapter delta to a base projection output.

    x: [..., fan_in] activations, y: [..., fan_out] = x @ W_base,
    ids: [batch] int32 adapter ids aligned with x's LEADING axis.
    Supports [batch, fan] (decode) and [batch, seq, fan] (prefill) rows.

    Under tensor parallelism (``tp_axis`` inside a shard_map) the stacks
    hold GLOBAL shapes while x/y are this shard's slices; whichever side
    is sharded is inferred from the local shapes and the stack slices by
    axis index — column-sharded projections slice B's fan_out, row-
    sharded ones slice A's fan_in (the delta then joins the base psum).
    """
    ab = stacks.get(li, {}).get(proj)
    if ab is None:
        return y
    a_stack, b_stack = ab
    if tp_axis is not None:
        idx = jax.lax.axis_index(tp_axis)
        if a_stack.shape[1] != x.shape[-1]:  # row-sharded fan_in (wo/down)
            a_stack = jax.lax.dynamic_slice_in_dim(
                a_stack, idx * x.shape[-1], x.shape[-1], axis=1
            )
        if b_stack.shape[2] != y.shape[-1]:  # column-sharded fan_out
            b_stack = jax.lax.dynamic_slice_in_dim(
                b_stack, idx * y.shape[-1], y.shape[-1], axis=2
            )
    a = a_stack[ids]  # [batch, fan_in, R]
    b = b_stack[ids]  # [batch, R, fan_out]
    xf = x.astype(jnp.float32)
    if x.ndim == 2:
        t = jnp.einsum("bi,bir->br", xf, a)
        delta = jnp.einsum("br,bro->bo", t, b)
    elif x.ndim == 3:
        t = jnp.einsum("bsi,bir->bsr", xf, a)
        delta = jnp.einsum("bsr,bro->bso", t, b)
    else:
        raise ValueError(f"unsupported activation rank {x.ndim}")
    return y + delta.astype(y.dtype)
