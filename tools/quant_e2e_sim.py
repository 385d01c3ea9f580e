#!/usr/bin/env python
"""End-to-end GENERATION simulation of candidate int4 schemes — predicts
engine greedy token-match without touching cache/kernel code (the scheme
probe's O-err ranking needs this validation: a 1.5x error cut may or may
not fix argmax flips over 128 generated tokens).

Method: greedy-generate with the trained model twice — once exact, once
with every layer's K/V fake-quantized under the candidate scheme (the
attention_fn seam swaps in reference attention over quantized K/V; no
ring, so this matches the engine's beyond-window stress configuration) —
and score prefix/positionwise token match. The engine's measured numbers
for tok-sym (ring32 stress prefix 0.199) anchor the simulation's
calibration.

Run: python tools/quant_e2e_sim.py [--cpu] [--schemes tok-sym,g32-asym]
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

from tools.quant_scheme_probe import SCHEMES, fake_quant  # noqa: E402

MIXED = {
    # K at int8 per-token symmetric, V at int4 (and vice versa):
    # attribution said K and V errors are comparable, but the feedback
    # dynamics of generation can weight them differently.
    "k8-v4sym": ("int8", dict(group_axis=-1, group=None, asym=False)),
    "k4sym-v8": (dict(group_axis=-1, group=None, asym=False), "int8"),
}


def _apply(x, spec):
    if spec == "int8":
        return fake_quant(x, bits=8, group_axis=-1)
    if spec is None:
        return x
    return fake_quant(x, **spec)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="checkpoints/tiny-byte-llama")
    ap.add_argument("--prompt-len", type=int, default=384)
    ap.add_argument("--new-tokens", type=int, default=96)
    ap.add_argument("--prompts", type=int, default=2)
    ap.add_argument("--schemes",
                    default="tok-sym,tok-asym,g32-sym,g32-asym,g16-asym")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tools.trained_model_quality import held_out_prompts
    from tpu_flash.checkpoint.convert import load_hf_dir
    from tpu_flash.core.reference import reference_gqa_attention

    SCHEMES.setdefault("g16-asym",
                       dict(group_axis=-1, group=16, asym=True))
    SCHEMES.setdefault("g64-asym",
                       dict(group_axis=-1, group=64, asym=True))

    model, params = load_hf_dir(args.ckpt, dtype="float32")
    prompts = held_out_prompts(args.prompts, args.prompt_len, seed=23)

    def generate(prompt, quant_kv):
        toks = list(prompt)
        for _ in range(args.new_tokens):
            arr = jnp.asarray([toks], jnp.int32)

            def attention_fn(q, k, v):
                kq, vq = k, v
                if quant_kv is not None:
                    kq = jnp.asarray(
                        _apply(np.asarray(k, np.float32), quant_kv[0])
                    ).astype(k.dtype)
                    vq = jnp.asarray(
                        _apply(np.asarray(v, np.float32), quant_kv[1])
                    ).astype(v.dtype)
                return reference_gqa_attention(
                    q, kq, vq, causal=True
                ).astype(q.dtype)

            logits = model.forward(params, arr, attention_fn=attention_fn)
            toks.append(int(jnp.argmax(logits[0, -1])))
        return toks[len(prompt):]

    refs = [generate(p, None) for p in prompts]

    def rates(ref, got):
        prefix = 0
        for a, b in zip(ref, got):
            if a != b:
                break
            prefix += 1
        pos = sum(1 for a, b in zip(ref, got) if a == b)
        return prefix / len(ref), pos / len(ref)

    rows = []
    wanted = [s.strip() for s in args.schemes.split(",")]
    for name in wanted:
        if name in MIXED:
            spec = MIXED[name]
        elif name in SCHEMES:
            spec = (SCHEMES[name], SCHEMES[name])
        else:
            print(f"unknown scheme {name}", file=sys.stderr)
            continue
        pre, pos = [], []
        for p, ref in zip(prompts, refs):
            got = generate(p, spec)
            a, b = rates(ref, got)
            pre.append(a)
            pos.append(b)
        rows.append({
            "scheme": name,
            "prefix_match": round(float(np.mean(pre)), 4),
            "positionwise_match": round(float(np.mean(pos)), 4),
        })
        print(f"  {name:10s} prefix {rows[-1]['prefix_match']:.3f} "
              f"positionwise {rows[-1]['positionwise_match']:.3f}",
              file=sys.stderr)
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
