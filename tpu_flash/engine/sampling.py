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
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Per-request sampling configuration."""

    temperature: float = 0.0  # 0 → greedy
    top_k: int = 0  # 0 → no top-k filter
    top_p: float = 1.0  # 1 → no nucleus filter
    min_p: float = 0.0  # 0 → no min-p filter

    def __post_init__(self):
        if self.temperature < 0:
            raise ValueError("temperature must be >= 0")
        if self.top_k < 0:
            raise ValueError("top_k must be >= 0")
        if not 0.0 < self.top_p <= 1.0:
            raise ValueError("top_p must be in (0, 1]")
        if not 0.0 <= self.min_p <= 1.0:
            raise ValueError("min_p must be in [0, 1]")


GREEDY = SamplingParams()


def filtered_logits(
    logits: jax.Array,  # [batch, vocab] f32
    temperature: jax.Array,  # [batch] f32
    top_k: jax.Array,  # [batch] int32 (0 = off)
    top_p: jax.Array,  # [batch] f32
    min_p: Optional[jax.Array] = None,  # [batch] f32 (0 = off)
) -> jax.Array:
    """The temperature-scaled, top-k/top-p-masked logits each row actually
    samples from. ``softmax`` of a row is its true sampling distribution;
    temperature <= 0 rows collapse to an exact one-hot at the argmax, so
    greedy is the same code path (this exactness is what speculative
    rejection sampling relies on)."""
    batch, vocab = logits.shape

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

    keep = keep_k & keep_p
    if min_p is not None:
        # min-p: drop tokens below min_p * max_prob of the TEMPERATURE-
        # SCALED distribution (the common implementation order); top-1
        # always survives (prob == max_prob). min_p == 0 keeps all.
        probs = probs_sorted[:, :1]  # max prob (sorted descending)
        row_probs = jax.nn.softmax(scaled, axis=-1)
        keep = keep & (row_probs >= min_p[:, None] * probs)

    neg_inf = jnp.finfo(scaled.dtype).min
    filtered = jnp.where(keep, scaled, neg_inf)
    # Greedy rows: exact one-hot mask at the argmax.
    greedy_mask = jnp.arange(vocab)[None] == jnp.argmax(
        logits, axis=-1, keepdims=True
    )
    greedy_filtered = jnp.where(greedy_mask, 0.0, neg_inf)
    return jnp.where(temperature[:, None] <= 0.0, greedy_filtered, filtered)


def sample_tokens(
    logits: jax.Array,  # [batch, vocab] f32
    key: jax.Array,  # PRNG key
    temperature: jax.Array,  # [batch] f32
    top_k: jax.Array,  # [batch] int32 (0 = off)
    top_p: jax.Array,  # [batch] f32
    min_p: Optional[jax.Array] = None,  # [batch] f32 (0 = off)
) -> jax.Array:
    """Vectorized sampling with per-row parameters. Returns [batch] int32."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    filtered = filtered_logits(logits, temperature, top_k, top_p, min_p)
    sampled = jax.random.categorical(key, filtered, axis=-1).astype(
        jnp.int32
    )
    # Greedy rows bypass the categorical draw entirely: argmax is exact and
    # costs no RNG (the filtered one-hot would sample identically).
    return jnp.where(temperature <= 0.0, greedy, sampled)


def speculative_sample(
    logits: jax.Array,  # [k+1, vocab] f32 — verify-pass logits; row i is
    # the target distribution AFTER consuming draft token i-1 (row 0: after
    # the last committed token)
    draft: jax.Array,  # [k] int32 proposed tokens
    key: jax.Array,  # PRNG key
    temperature: jax.Array,  # scalar f32 (one request's params)
    top_k: jax.Array,  # scalar int32
    top_p: jax.Array,  # scalar f32
    draft_len: Optional[jax.Array] = None,  # scalar int32: only the first
    min_p: Optional[jax.Array] = None,  # scalar f32 (0 = off)
    # draft_len proposals are real (batched speculation pads rows to a
    # common k); None = all k. draft_len=0 degenerates to one plain sample.
):
    """Exact speculative rejection sampling for a *deterministic* draft.

    The draft proposal q is a point mass at ``draft[i]``, so the classic
    accept-with-p/q rule reduces to: accept draft[i] with probability
    p_i(draft[i]); on the first rejection sample the correction from the
    residual ``p_i`` with draft[i] zeroed out (= normalize(max(p − q, 0)));
    if all k accepted, sample one bonus token from row k. Every emitted
    token is an exact sample from the target (filtered) distribution — the
    output process is distributionally identical to non-speculative
    sampling. With temperature <= 0 the filtered rows are one-hot, making
    acceptance and correction deterministic argmax — greedy speculation is
    the same code path.

    Returns (tokens [k+1] int32, n_emit scalar int32): the first ``n_emit``
    entries of ``tokens`` are the accepted prefix plus one correction/bonus
    token.
    """
    n_tok, vocab = logits.shape
    k = n_tok - 1
    temp_rows = jnp.full((n_tok,), temperature)
    probs = jax.nn.softmax(
        filtered_logits(
            logits,
            temp_rows,
            jnp.full((n_tok,), top_k),
            jnp.full((n_tok,), top_p),
            None if min_p is None else jnp.full((n_tok,), min_p),
        ),
        axis=-1,
    )
    key_u, key_c = jax.random.split(key)
    p_draft = jnp.take_along_axis(probs[:k], draft[:, None], axis=-1)[:, 0]
    u = jax.random.uniform(key_u, (k,)) if k else jnp.zeros((0,))
    accept = u < p_draft
    if draft_len is not None:
        accept = jnp.logical_and(accept, jnp.arange(k) < draft_len)
    # Number of leading accepts: stops at the first rejection.
    a = jnp.sum(jnp.cumprod(accept.astype(jnp.int32))).astype(jnp.int32)

    # Correction (a < effective draft length): residual of row a = p with
    # draft[a] zeroed. Bonus (all real proposals accepted): row a
    # unmodified — a pad position is a plain sample, not a rejection, so
    # its token must NOT be zeroed out of the distribution.
    k_eff = k if draft_len is None else draft_len
    p_row = probs[a]
    if k:
        rejected_tok = jnp.where(
            a < k_eff, draft[jnp.minimum(a, k - 1)], -1
        )
    else:  # empty draft: plain sample, nothing to reject
        rejected_tok = jnp.int32(-1)
    p_adj = jnp.where(jnp.arange(vocab) == rejected_tok, 0.0, p_row)
    correction = jax.random.categorical(key_c, jnp.log(p_adj)).astype(
        jnp.int32
    )

    draft_padded = jnp.concatenate(
        [draft.astype(jnp.int32), jnp.zeros((1,), jnp.int32)]
    )
    tokens = jnp.where(jnp.arange(n_tok) < a, draft_padded, correction)
    return tokens, a + 1
