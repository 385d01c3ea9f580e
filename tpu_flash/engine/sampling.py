"""Token sampling: greedy, temperature, top-k, top-p (nucleus).

The reference has no sampling at all (its output is attention values, not
tokens); this is part of the serving-engine scope. Everything here is
jit-compatible with static shapes: per-slot parameter *arrays* ride through
the fused decode step, so one compiled program serves any mix of greedy and
sampled requests in the same batch.

Semantics (matching the common serving contract):
  * temperature <= 0  → greedy (argmax), other filters ignored.
  * top_k > 0         → restrict to the k highest-logit tokens.
  * top_p < 1         → restrict to the smallest prefix of the
    probability-sorted vocabulary with cumulative probability >= top_p
    (the top-1 token is always kept).
  * filters compose (intersection), then categorical-sample the remainder
    at the given temperature.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Per-request sampling configuration."""

    temperature: float = 0.0  # 0 → greedy
    top_k: int = 0  # 0 → no top-k filter
    top_p: float = 1.0  # 1 → no nucleus filter

    def __post_init__(self):
        if self.temperature < 0:
            raise ValueError("temperature must be >= 0")
        if self.top_k < 0:
            raise ValueError("top_k must be >= 0")
        if not 0.0 < self.top_p <= 1.0:
            raise ValueError("top_p must be in (0, 1]")


GREEDY = SamplingParams()


def sample_tokens(
    logits: jax.Array,  # [batch, vocab] f32
    key: jax.Array,  # PRNG key
    temperature: jax.Array,  # [batch] f32
    top_k: jax.Array,  # [batch] int32 (0 = off)
    top_p: jax.Array,  # [batch] f32
) -> jax.Array:
    """Vectorized sampling with per-row parameters. Returns [batch] int32."""
    batch, vocab = logits.shape
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    temp = jnp.maximum(temperature, 1e-6)[:, None]
    scaled = logits / temp

    # Sort once (descending); both filters derive from the sorted order.
    sorted_scaled = -jnp.sort(-scaled, axis=-1)  # [batch, vocab]

    # top-k: keep logits >= the k-th largest. k=0 → keep all.
    k = jnp.where(top_k > 0, top_k, vocab).astype(jnp.int32)
    kth = jnp.take_along_axis(
        sorted_scaled, jnp.clip(k - 1, 0, vocab - 1)[:, None], axis=-1
    )
    keep_k = scaled >= kth

    # top-p over the sorted probabilities: token at sorted position j stays
    # if the cumulative mass *before* it is < top_p (top-1 always kept).
    probs_sorted = jax.nn.softmax(sorted_scaled, axis=-1)
    cum_before = jnp.cumsum(probs_sorted, axis=-1) - probs_sorted
    stays = cum_before < top_p[:, None]  # [batch, vocab] in sorted order
    # Threshold value: the smallest sorted logit that stays.
    num_keep = jnp.maximum(jnp.sum(stays, axis=-1), 1)
    pth = jnp.take_along_axis(
        sorted_scaled, (num_keep - 1)[:, None], axis=-1
    )
    keep_p = scaled >= pth

    neg_inf = jnp.finfo(scaled.dtype).min
    filtered = jnp.where(keep_k & keep_p, scaled, neg_inf)
    sampled = jax.random.categorical(key, filtered, axis=-1).astype(
        jnp.int32
    )
    return jnp.where(temperature <= 0.0, greedy, sampled)
