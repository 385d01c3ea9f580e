"""Rank int4 KV-quantization schemes by greedy token-match on the
config-9 stress model (random weights, d=128) WITHOUT the engine:
teacher-forced full forward per step with a fake-quant kv_hook.

Schemes (all per-(token-row) unless noted; K and V independent):
  pt-sym     per-token symmetric absmax over d=128 (current production)
  pt-asym    per-token asymmetric (min/max affine)
  g32-sym    per-token, 4 groups of 32 channels, symmetric
  g32-asym   groups of 32, asymmetric
  kivi-W     most recent W tokens exact, older pt-sym int4
  chaneq     per-chunk channel equalizer (absmax over tokens per channel,
             folded out) + per-token symmetric residual int4
Run: python tools/quant_quality_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import functools

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from tpu_flash.models import TINY_TEST, FlashTransformer

PROMPTS = [
    [3, 14, 15, 9, 2, 6, 53, 58],
    [97, 93, 23, 84, 62, 64, 33, 83],
    [11, 200, 47, 5, 130, 77, 8, 99],
]
NEW = 32


def qdq_sym(x, maxq, axis=-1, group=None):
    """Symmetric absmax quantize-dequantize along ``axis`` (optionally in
    ``group``-sized chunks of that axis)."""
    xf = x.astype(jnp.float32)
    if group is not None:
        d = xf.shape[-1]
        xg = xf.reshape(*xf.shape[:-1], d // group, group)
        out = qdq_sym(xg, maxq, axis=-1)
        return out.reshape(*xf.shape).astype(x.dtype)
    absmax = jnp.max(jnp.abs(xf), axis=axis, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax / maxq)
    q = jnp.clip(jnp.round(xf / scale), -maxq, maxq)
    return (q * scale).astype(x.dtype)


def qdq_asym(x, levels, group=None):
    xf = x.astype(jnp.float32)
    if group is not None:
        d = xf.shape[-1]
        xg = xf.reshape(*xf.shape[:-1], d // group, group)
        out = qdq_asym(xg, levels)
        return out.reshape(*xf.shape).astype(x.dtype)
    lo = jnp.min(xf, axis=-1, keepdims=True)
    hi = jnp.max(xf, axis=-1, keepdims=True)
    scale = jnp.where(hi == lo, 1.0, (hi - lo) / levels)
    q = jnp.clip(jnp.round((xf - lo) / scale), 0, levels)
    return (q * scale + lo).astype(x.dtype)


def qdq_chaneq(x, maxq):
    """Channel equalizer over the token axis (-2) then per-token sym."""
    xf = x.astype(jnp.float32)
    c = jnp.max(jnp.abs(xf), axis=-2, keepdims=True)
    c = jnp.where(c == 0, 1.0, c)
    return (qdq_sym(xf / c, maxq) * c).astype(x.dtype)


def hook_from(fn_k, fn_v):
    def hook(layer_idx, k, v):
        return fn_k(k), fn_v(v)

    return hook


def greedy(model, params, prompt, hook):
    toks = list(prompt)
    for _ in range(NEW):
        t = jnp.asarray([toks], jnp.int32)
        logits = model.forward(params, t, interpret=True, kv_hook=hook)
        toks.append(int(jnp.argmax(logits[0, -1])))
    return toks[len(prompt):]


def rates(ref, got):
    prefix = 0
    for a, b in zip(ref, got):
        if a != b:
            break
        prefix += 1
    return prefix / len(ref)


def main():
    cfg = dataclasses.replace(TINY_TEST, head_dim=128)
    model = FlashTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0))

    ident = lambda x: x
    i4 = functools.partial(qdq_sym, maxq=7.0)
    i8 = functools.partial(qdq_sym, maxq=127.0)

    def kivi(w, inner=i4):
        def f(x):
            t = x.shape[-2]
            if t <= w:
                return x
            old = inner(x[..., : t - w, :])
            return jnp.concatenate([old, x[..., t - w :, :]], axis=-2)

        return f

    schemes = {
        "pt-sym int4 (current)": hook_from(i4, i4),
        "pt-asym int4": hook_from(
            functools.partial(qdq_asym, levels=15.0),
            functools.partial(qdq_asym, levels=15.0),
        ),
        "g32-sym int4": hook_from(
            functools.partial(qdq_sym, maxq=7.0, group=32),
            functools.partial(qdq_sym, maxq=7.0, group=32),
        ),
        "g32-asym int4": hook_from(
            functools.partial(qdq_asym, levels=15.0, group=32),
            functools.partial(qdq_asym, levels=15.0, group=32),
        ),
        "K-int8 V-int4": hook_from(i8, i4),
        "K-int4 V-int8": hook_from(i4, i8),
        "kivi-16 int4": hook_from(kivi(16), kivi(16)),
        "kivi-32 int4": hook_from(kivi(32), kivi(32)),
        "chaneq+pt int4": hook_from(
            functools.partial(qdq_chaneq, maxq=7.0),
            functools.partial(qdq_chaneq, maxq=7.0),
        ),
        "chaneq+g32-asym": hook_from(
            lambda x: qdq_asym(
                x / jnp.where(
                    (c := jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-2,
                                  keepdims=True)) == 0, 1.0, c),
                levels=15.0, group=32) * c,
            lambda x: qdq_asym(x, levels=15.0, group=32),
        ),
        "pt-sym int8 (ref)": hook_from(i8, i8),
    }

    refs = [greedy(model, params, p, None) for p in PROMPTS]
    for name, hook in schemes.items():
        outs = [greedy(model, params, p, hook) for p in PROMPTS]
        r = sum(rates(a, b) for a, b in zip(refs, outs)) / len(refs)
        print(f"{name:26s} prefix_match {r:.3f}", flush=True)


if __name__ == "__main__":
    main()
