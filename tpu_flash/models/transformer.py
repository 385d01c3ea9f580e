"""Flagship model: a Llama-style decoder transformer on tpu_flash kernels.

Pure-JAX pytree parameters (no framework dependency): RMSNorm → fused GQA
flash attention (ops/flash) with rotary embeddings → SwiGLU MLP, pre-norm
residuals, weight-tied-free LM head. Prefill uses the Pallas flash kernel
(causal, chunked via q_offset); decode uses the paged-attention kernel over
the quantized KV cache. The reference project stops at a single attention
kernel — this is the "model runner for the BASELINE attention shapes"
surface (SURVEY.md §7 layer 4) that the engine drives.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from tpu_flash.models.configs import ModelConfig
from tpu_flash.ops.flash import flash_attention

Params = Dict[str, Any]


def _rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps)).astype(dtype) * weight


def rope_frequencies(head_dim: int, theta: float) -> jax.Array:
    return 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )


def scaled_rope_frequencies(cfg) -> "tuple[jax.Array, float]":
    """(freqs, score_mult) for the config's RoPE context-extension scheme.

    - "linear": position interpolation — every frequency divided by the
      factor (positions effectively compressed into the trained range).
    - "ntk": NTK-aware base rescale — theta' = theta * s^(d/(d-2)), which
      interpolates low frequencies while keeping high ones near-original.
    - "yarn": per-band interpolation — dimensions that complete many
      rotations within the original context (high frequency, local
      information) keep their frequency; slow bands interpolate; a ramp
      blends between. Attention scores additionally scale by
      t^2 with t = 0.1*ln(s) + 1 (the YaRN temperature), folded into q
      post-rope so no kernel needs an sm_scale override.
    - "llama3": Llama-3.1's scheme — wavelengths past
      orig_ctx / rope_low_freq_factor fully interpolate, those below
      orig_ctx / rope_high_freq_factor stay unscaled, with a smooth
      blend between; NO attention temperature (HF attention_scaling=1).

    Also folds a Gemma-2-style ``query_pre_attn_scalar`` softmax-scale
    override into the returned q multiplier (scores become
    qk/sqrt(query_pre_attn_scalar) instead of qk/sqrt(head_dim)).
    """
    import math

    base = rope_frequencies(cfg.head_dim, cfg.rope_theta)
    s = float(cfg.rope_scaling_factor)
    kind = cfg.rope_scaling

    q_mult = 1.0
    qpas = getattr(cfg, "query_pre_attn_scalar", None)
    if qpas is not None:
        # Kernels scale by 1/sqrt(d); convert to 1/sqrt(qpas).
        q_mult *= math.sqrt(cfg.head_dim / qpas)

    if kind is None or s == 1.0:
        return base, q_mult
    if kind == "linear":
        return base / s, q_mult
    if kind == "ntk":
        d = cfg.head_dim
        theta2 = cfg.rope_theta * s ** (d / (d - 2))
        return rope_frequencies(d, theta2), q_mult
    if kind == "yarn":
        wavelengths = 2.0 * math.pi / base
        rotations = cfg.rope_orig_context / wavelengths
        beta_fast, beta_slow = 32.0, 1.0
        ramp = jnp.clip(
            (rotations - beta_slow) / (beta_fast - beta_slow), 0.0, 1.0
        )
        freqs = (1.0 - ramp) * (base / s) + ramp * base
        t = 0.1 * math.log(s) + 1.0
        return freqs, q_mult * t * t
    if kind == "llama3":
        low_f = getattr(cfg, "rope_low_freq_factor", 1.0)
        high_f = getattr(cfg, "rope_high_freq_factor", 4.0)
        wavelengths = 2.0 * math.pi / base
        low_wl = cfg.rope_orig_context / low_f
        high_wl = cfg.rope_orig_context / high_f
        # smooth in [0, 1]: 1 at high frequency (keep), 0 at low (divide).
        smooth = jnp.clip(
            (cfg.rope_orig_context / wavelengths - low_f)
            / (high_f - low_f),
            0.0,
            1.0,
        )
        freqs = jnp.where(
            wavelengths > low_wl,
            base / s,
            jnp.where(
                wavelengths < high_wl,
                base,
                (1.0 - smooth) * base / s + smooth * base,
            ),
        )
        return freqs, q_mult
    raise ValueError(
        f"unknown rope_scaling {kind!r}; expected linear|ntk|yarn|llama3"
    )


def apply_rope(
    x: jax.Array,  # [batch, heads, seq, head_dim]
    positions: jax.Array,  # [batch, seq] or [seq]
    freqs: jax.Array,  # [head_dim // 2]
) -> jax.Array:
    """Rotary position embedding (split-half convention)."""
    dtype = x.dtype
    if positions.ndim == 1:
        positions = positions[None, :]
    angles = positions[..., None].astype(jnp.float32) * freqs  # [b, s, d/2]
    cos = jnp.cos(angles)[:, None]  # [b, 1, s, d/2]
    sin = jnp.sin(angles)[:, None]
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2].astype(jnp.float32), x[..., d2:].astype(jnp.float32)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)
    return out.astype(dtype)


class FlashTransformer:
    """Stateless module: params are an explicit pytree."""

    def __init__(self, config: ModelConfig):
        self.config = config
        self.dtype = jnp.dtype(config.dtype)
        self.freqs, self._q_mult = scaled_rope_frequencies(config)
        if config.attn_alibi:
            from tpu_flash.core.reference import alibi_slopes

            # ALiBi replaces rotary embeddings (BLOOM/MPT): fixed slopes,
            # rope skipped in _qkv/decode_qkv.
            self._alibi = alibi_slopes(config.num_q_heads)
        else:
            self._alibi = None

    def alibi_for(self, num_q_heads_local: int, tp_axis=None):
        """Per-head ALiBi slopes for this shard's head range (None when
        the model doesn't use ALiBi). Under TP each shard holds a
        contiguous block of heads, so the slopes slice by axis index."""
        if self._alibi is None:
            return None
        if tp_axis is None or num_q_heads_local == self.config.num_q_heads:
            return self._alibi
        idx = jax.lax.axis_index(tp_axis)
        return jax.lax.dynamic_slice(
            self._alibi, (idx * num_q_heads_local,), (num_q_heads_local,)
        )

    # -- init ---------------------------------------------------------------

    def init(self, key: jax.Array) -> Params:
        cfg = self.config
        h, d = cfg.hidden_size, cfg.head_dim
        qd, kvd = cfg.num_q_heads * d, cfg.num_kv_heads * d
        n_keys = 4 + cfg.num_layers * 7
        keys = iter(jax.random.split(key, n_keys))

        def dense(key, fan_in, shape):
            return (
                jax.random.normal(key, shape, jnp.float32) * fan_in**-0.5
            ).astype(self.dtype)

        layers = []
        for _ in range(cfg.num_layers):
            layer = {
                "attn_norm": jnp.ones((h,), self.dtype),
                "wq": dense(next(keys), h, (h, qd)),
                "wk": dense(next(keys), h, (h, kvd)),
                "wv": dense(next(keys), h, (h, kvd)),
                "wo": dense(next(keys), qd, (qd, h)),
                "mlp_norm": jnp.ones((h,), self.dtype),
                "w_gate": dense(next(keys), h, (h, cfg.intermediate_size)),
                "w_up": dense(next(keys), h, (h, cfg.intermediate_size)),
                "w_down": dense(
                    next(keys), cfg.intermediate_size,
                    (cfg.intermediate_size, h),
                ),
            }
            if cfg.attn_sinks:
                # Learnable per-head sink logits (zero-init: exp(0) = 1
                # unit of denominator mass per head).
                layer["sinks"] = jnp.zeros((cfg.num_q_heads,), jnp.float32)
            layers.append(layer)
        return {
            "embed": dense(next(keys), 1, (cfg.vocab_size, h)),
            "layers": layers,
            "final_norm": jnp.ones((h,), self.dtype),
            "lm_head": dense(next(keys), h, (h, cfg.vocab_size)),
        }

    # -- qkv plumbing ---------------------------------------------------------

    def _qkv(self, layer: Params, x: jax.Array, positions: jax.Array,
             li: int = 0, proj_hook=None):
        """x: [batch, seq, hidden] -> q [b,hq,s,d], k/v [b,hkv,s,d] (roped
        q/k). Head counts derive from the WEIGHT shapes, not the config, so
        the same code serves full params and per-shard TP params (whose
        projections hold heads/n columns). ``proj_hook(li, name, x, y)``
        post-processes each projection output (the multi-LoRA seam)."""
        cfg = self.config
        b, s, _ = x.shape
        d = cfg.head_dim
        hq = layer["wq"].shape[1] // d
        hkv = layer["wk"].shape[1] // d

        def proj(name, y):
            return y if proj_hook is None else proj_hook(li, name, x, y)

        q = proj("wq", x @ layer["wq"]).reshape(b, s, hq, d)
        k = proj("wk", x @ layer["wk"]).reshape(b, s, hkv, d)
        v = proj("wv", x @ layer["wv"]).reshape(b, s, hkv, d)
        if self._alibi is not None:
            # ALiBi: no rotary embedding — position enters as the in-kernel
            # linear distance bias.
            return (
                q.transpose(0, 2, 1, 3),
                k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
            )
        q = apply_rope(q.transpose(0, 2, 1, 3), positions, self.freqs)
        k = apply_rope(k.transpose(0, 2, 1, 3), positions, self.freqs)
        if self._q_mult != 1.0:
            # YaRN temperature: scores scale by t^2 == scaling q by t^2.
            q = q * self._q_mult
        return q, k, v.transpose(0, 2, 1, 3)

    def _mlp(
        self, layer: Params, x: jax.Array, tp_axis: Optional[str] = None,
        li: int = 0, proj_hook=None,
    ) -> jax.Array:
        def proj(name, inp, y):
            return y if proj_hook is None else proj_hook(li, name, inp, y)

        gate = jax.nn.silu(
            proj("w_gate", x, x @ layer["w_gate"]).astype(jnp.float32)
        )
        up = proj("w_up", x, x @ layer["w_up"]).astype(jnp.float32)
        h = (gate * up).astype(x.dtype)
        out = proj("w_down", h, h @ layer["w_down"])
        if tp_axis is not None:
            # Row-sharded w_down: partial products sum over the TP axis.
            out = jax.lax.psum(out, tp_axis)
        return out

    # -- full forward (training / whole-prompt prefill) ----------------------

    def forward(
        self,
        params: Params,
        tokens: jax.Array,  # [batch, seq] int32
        *,
        q_offset: int = 0,
        interpret: Optional[bool] = None,
        return_kv: bool = False,
        kv_hook=None,
        tp_axis: Optional[str] = None,
        positions: Optional[jax.Array] = None,
        attention_fn=None,
        segment_ids: Optional[jax.Array] = None,
        proj_hook=None,
    ):
        """Causal forward over a token block using the flash prefill kernel.

        Returns logits [batch, seq, vocab]; with return_kv=True also a list
        of per-layer (k, v) [b, hkv, s, d] for cache appends.

        ``kv_hook(layer_idx, k, v) -> (k_all, v_all)`` lets a caller splice
        per-layer KV history in front of this block's K/V (and capture the
        new K/V for cache appends) — the engine's chunked-prefill path.
        Keeping the layer body HERE, with the hook as the only seam, means
        model changes can never silently diverge between whole-prompt and
        chunked forward.

        ``tp_axis``: run tensor-parallel inside a shard_map over that mesh
        axis — params arrive as per-shard slices (attention heads and MLP
        hidden columns local; wo/w_down rows local), activations stay
        replicated, and the two row-sharded projections psum their partial
        products. Requires num_{q,kv}_heads divisible by the axis size.

        ``positions``: dynamic absolute positions [seq] overriding the
        static ``q_offset + arange`` (speculative verification, where the
        block's offset is a traced value). ``attention_fn(q, k, v) ->
        attn`` replaces the causal flash call for paths whose masking the
        static-offset kernel can't express (again: dynamic-offset
        verification) — the rest of the layer body stays single-sourced.
        ``segment_ids`` [batch, seq]: packed multi-document training —
        rope positions restart at each document boundary and attention is
        segment-masked in-kernel. Incompatible with kv_hook/attention_fn
        (a packed row has no KV-cache serving path).
        """
        cfg = self.config
        seg_attn = None
        if segment_ids is not None:
            if kv_hook is not None or attention_fn is not None:
                raise ValueError(
                    "segment_ids (packed training) cannot combine with "
                    "kv_hook/attention_fn (serving seams)"
                )
            from tpu_flash.ops.flash import SegmentIds

            seg_attn = SegmentIds(segment_ids, segment_ids)
        x = params["embed"][tokens].astype(self.dtype)
        if positions is None:
            if segment_ids is not None:
                # Positions restart per document: arange minus the start
                # index of each row's current segment (cummax over boundary
                # indices).
                ar = jnp.arange(tokens.shape[1])
                boundary = jnp.concatenate(
                    [
                        jnp.ones_like(segment_ids[:, :1], dtype=bool),
                        segment_ids[:, 1:] != segment_ids[:, :-1],
                    ],
                    axis=1,
                )
                seg_start = jax.lax.cummax(
                    jnp.where(boundary, ar[None], 0), axis=1
                )
                positions = ar[None] - seg_start  # [batch, seq]
            else:
                positions = q_offset + jnp.arange(tokens.shape[1])
        kvs = []
        for li, layer in enumerate(params["layers"]):
            xn = _rms_norm(x, layer["attn_norm"], cfg.rms_eps)
            q, k, v = self._qkv(layer, xn, positions, li, proj_hook)
            if return_kv:
                kvs.append((k, v))
            if kv_hook is not None:
                k, v = kv_hook(li, k, v)
            if attention_fn is not None:
                attn = attention_fn(q, k, v)
            else:
                attn = flash_attention(
                    q, k, v, causal=True, q_offset=q_offset,
                    interpret=interpret, window=cfg.layer_window(li),
                    softcap=cfg.attn_softcap, segment_ids=seg_attn,
                    sinks=layer.get("sinks"),
                    alibi=self.alibi_for(q.shape[1], tp_axis),
                )
            b, h, s, d = attn.shape
            attn = attn.transpose(0, 2, 1, 3).reshape(b, s, h * d)
            proj = attn @ layer["wo"]
            if proj_hook is not None:
                proj = proj_hook(li, "wo", attn, proj)
            if tp_axis is not None:
                proj = jax.lax.psum(proj, tp_axis)  # row-sharded wo
            x = x + proj
            xn = _rms_norm(x, layer["mlp_norm"], cfg.rms_eps)
            x = x + self._mlp(layer, xn, tp_axis, li, proj_hook)
        x = _rms_norm(x, params["final_norm"], cfg.rms_eps)
        logits = (x @ params["lm_head"]).astype(jnp.float32)
        if return_kv:
            return logits, kvs
        return logits

    def loss_fn(
        self,
        params: Params,
        tokens: jax.Array,
        segment_ids: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Next-token cross-entropy over a batch — the training objective
        used by the multi-chip training step.

        ``segment_ids`` [batch, seq]: packed training — attention and rope
        restart per document, and positions whose next token belongs to a
        DIFFERENT document are excluded from the loss."""
        logits = self.forward(
            params, tokens[:, :-1],
            segment_ids=None if segment_ids is None else segment_ids[:, :-1],
        )
        targets = tokens[:, 1:]
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        if segment_ids is None:
            return jnp.mean(nll)
        same = (segment_ids[:, :-1] == segment_ids[:, 1:]).astype(nll.dtype)
        return jnp.sum(nll * same) / jnp.maximum(jnp.sum(same), 1.0)

    # -- decode (one token per sequence, vs KV arrays) ------------------------

    def decode_qkv(
        self,
        params: Params,
        layer_idx: int,
        x: jax.Array,  # [batch, hidden] current-token activations
        positions: jax.Array,  # [batch] absolute positions
        proj_hook=None,
    ):
        """Per-layer projections for the decode path: q [b, hq, d] and new
        k/v [b, hkv, d], rope applied."""
        layer = params["layers"][layer_idx]
        cfg = self.config
        b = x.shape[0]
        d = cfg.head_dim
        hq = layer["wq"].shape[1] // d  # shape-driven: supports TP shards
        hkv = layer["wk"].shape[1] // d

        def proj(name, y):
            return (
                y if proj_hook is None else proj_hook(layer_idx, name, x, y)
            )

        q = proj("wq", x @ layer["wq"]).reshape(b, hq, 1, d)
        k = proj("wk", x @ layer["wk"]).reshape(b, hkv, 1, d)
        v = proj("wv", x @ layer["wv"]).reshape(b, hkv, d)
        if self._alibi is not None:
            return q[:, :, 0], k[:, :, 0], v  # ALiBi: no rope
        q = apply_rope(q, positions[:, None], self.freqs)[:, :, 0]
        k = apply_rope(k, positions[:, None], self.freqs)[:, :, 0]
        if self._q_mult != 1.0:
            q = q * self._q_mult
        return q, k, v
