#!/usr/bin/env python
"""Offline int4 scheme selection on the TRAINED model's real K/V tensors
(VERDICT r4 item 2 / ROADMAP R7: per-token symmetric int4 reads 0.33
prefix-match beyond the ring on trained weights — find the scheme that
fixes it BEFORE rewriting cache+kernel paths).

Method: run the trained checkpoint's forward on held-out text, capture
every layer's (Q, K, V) (models/transformer.py return_kv), fake-quantize
K/V under each candidate scheme, and score
  * attention-output relative error  ||O_q - O||/||O||
  * attention-logit max error (what actually flips argmax)
per layer, plus K-only / V-only attribution. Schemes:

  tok-sym      per-token symmetric absmax over d (the shipping scheme)
  tok-asym     per-token asymmetric (min/max affine)
  g32-sym      per-token, 32-channel groups, symmetric
  g32-asym     per-token, 32-channel groups, asymmetric
  chan-sym     per-channel symmetric over a 512-token page
  chan-asym    per-channel asymmetric over a 512-token page (KIVI-K)

Run: python tools/quant_scheme_probe.py [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def fake_quant(x: np.ndarray, *, bits=4, group_axis=-1, group=None,
               asym=False) -> np.ndarray:
    """Quantize-dequantize x along ``group_axis`` in groups of ``group``
    (None = the whole axis)."""
    x = np.asarray(x, np.float32)
    ax = group_axis % x.ndim
    n = x.shape[ax]
    g = group or n
    assert n % g == 0
    # reshape axis into (n//g, g), with g innermost for reduction
    new_shape = x.shape[:ax] + (n // g, g) + x.shape[ax + 1:]
    xg = x.reshape(new_shape)
    red_ax = ax + 1
    qmax = 2 ** (bits - 1) - 1  # 7
    if asym:
        lo = xg.min(axis=red_ax, keepdims=True)
        hi = xg.max(axis=red_ax, keepdims=True)
        levels = 2**bits - 1  # 15
        scale = np.where(hi - lo == 0, 1.0, (hi - lo) / levels)
        q = np.clip(np.round((xg - lo) / scale), 0, levels)
        out = q * scale + lo
    else:
        absmax = np.abs(xg).max(axis=red_ax, keepdims=True)
        scale = np.where(absmax == 0, 1.0, absmax / qmax)
        q = np.clip(np.round(xg / scale), -qmax, qmax)
        out = q * scale
    return out.reshape(x.shape)


SCHEMES = {
    "tok-sym": dict(group_axis=-1, group=None, asym=False),
    "tok-asym": dict(group_axis=-1, group=None, asym=True),
    "g32-sym": dict(group_axis=-1, group=32, asym=False),
    "g32-asym": dict(group_axis=-1, group=32, asym=True),
    # per-channel over tokens (seq axis is -2); 512-token pages
    "chan-sym": dict(group_axis=-2, group=512, asym=False),
    "chan-asym": dict(group_axis=-2, group=512, asym=True),
}


def attn(q, k, v, scale):
    """Dense causal GQA attention in f32 numpy. q [h,s,d], k/v [hk,s,d]."""
    h, s, d = q.shape
    hk = k.shape[0]
    rep = h // hk
    kf = np.repeat(k, rep, axis=0)
    vf = np.repeat(v, rep, axis=0)
    logits = np.einsum("hqd,hkd->hqk", q, kf) * scale
    mask = np.tril(np.ones((s, s), bool))
    logits = np.where(mask[None], logits, -1e30)
    logits -= logits.max(-1, keepdims=True)
    p = np.exp(logits)
    p /= p.sum(-1, keepdims=True)
    return np.einsum("hqk,hkd->hqd", p, vf), logits


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="checkpoints/tiny-byte-llama")
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tools.trained_model_quality import held_out_prompts
    from tpu_flash.checkpoint.convert import load_hf_dir

    model, params = load_hf_dir(args.ckpt, dtype="float32")
    prompt = held_out_prompts(1, args.seq)[0]
    tokens = jnp.asarray([prompt], jnp.int32)

    # Capture per-layer (q, k, v) via the attention_fn seam (the forward
    # runs eagerly here, so arrays are concrete).
    from tpu_flash.core.reference import reference_gqa_attention

    captured = []

    def attention_fn(q, k, v):
        captured.append(
            (np.asarray(q[0], np.float32), np.asarray(k[0], np.float32),
             np.asarray(v[0], np.float32))
        )
        return reference_gqa_attention(q, k, v, causal=True).astype(q.dtype)

    model.forward(params, tokens, attention_fn=attention_fn)
    scale = model.config.head_dim ** -0.5
    print(f"captured {len(captured)} layers, seq {args.seq}",
          file=sys.stderr)

    rows = []
    for name, kw in SCHEMES.items():
        errs, logit_errs = [], []
        for (q, k, v) in captured:
            o_ref, l_ref = attn(q, k, v, scale)
            kq = fake_quant(k, **kw)
            vq = fake_quant(v, **kw)
            o_q, l_q = attn(q, kq, vq, scale)
            errs.append(
                np.linalg.norm(o_q - o_ref) / np.linalg.norm(o_ref)
            )
            valid = l_ref > -1e29
            logit_errs.append(np.abs((l_q - l_ref) * valid).max())
        row = {
            "scheme": name,
            "o_rel_err": round(float(np.mean(errs)), 5),
            "logit_max_err": round(float(np.mean(logit_errs)), 4),
        }
        rows.append(row)
        print(f"  {name:10s} O-err {row['o_rel_err']:.4f} "
              f"logit-err {row['logit_max_err']:.3f}", file=sys.stderr)

    # K-only vs V-only attribution for the shipping scheme.
    for which in ("K-only", "V-only"):
        errs = []
        for (q, k, v) in captured:
            o_ref, _ = attn(q, k, v, scale)
            kq = fake_quant(k, group_axis=-1) if which == "K-only" else k
            vq = fake_quant(v, group_axis=-1) if which == "V-only" else v
            o_q, _ = attn(q, kq, vq, scale)
            errs.append(
                np.linalg.norm(o_q - o_ref) / np.linalg.norm(o_ref)
            )
        rows.append({"scheme": f"tok-sym {which}",
                     "o_rel_err": round(float(np.mean(errs)), 5)})
        print(f"  tok-sym {which}: O-err {rows[-1]['o_rel_err']:.4f}",
              file=sys.stderr)

    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
