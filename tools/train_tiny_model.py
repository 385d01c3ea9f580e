#!/usr/bin/env python
"""Train a small byte-level Llama-architecture model on LOCAL text and
export it in HuggingFace checkpoint layout.

Why this exists (VERDICT r4 item 1): every quality/parity number in the
repo came from random-weight toy models, and quantization quality on iid
random weights is known to be unrepresentative (no channel outliers, no
real argmax margins). The build environment has zero network egress and
no local pretrained checkpoints, so the honest substitute is a model
*trained from scratch here* on local text — giving genuinely trained
weight/activation statistics — exported through the HF layout so the
full ``checkpoint/convert.py::load_hf_dir`` import path (config mapping,
safetensors shards, weight transposes, shape validation) is exercised
end to end, the way a real deployment would arrive.

Corpus: the repo's own markdown/python plus the Python standard library
sources (tens of MB of real text). Byte-level vocab (256) — no tokenizer
dependency, and 1-byte granularity makes greedy token-match a sensitive
quality metric.

Usage:
    python tools/train_tiny_model.py [--steps 3000] [--out checkpoints/tiny-byte-llama]

The training loop runs the repo's OWN forward/loss (flash-attention
kernels, models/transformer.py::loss_fn) — so a training session is also
an end-to-end exercise of the training path on real data. Steps are
chained ``--chain`` per dispatch (lax.scan) to amortize relay dispatch
latency (BENCHLOG: ~23 ms fixed cost per dispatch on the axon relay).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def build_corpus(max_bytes: int = 48 * 2**20) -> bytes:
    """Concatenate local text: repo docs+code, then Python stdlib sources."""
    roots = []
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    roots.append((repo, (".md", ".py")))
    import sysconfig

    stdlib = sysconfig.get_paths().get("stdlib")
    if stdlib and os.path.isdir(stdlib):
        roots.append((stdlib, (".py",)))
    purelib = sysconfig.get_paths().get("purelib")
    if purelib and os.path.isdir(purelib):
        roots.append((purelib, (".py", ".md")))
    chunks, total = [], 0
    for root, exts in roots:
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames[:] = sorted(
                d for d in dirnames
                if d not in (".git", "__pycache__", "node_modules",
                             "site-packages", "test", "tests")
            )
            for fn in sorted(filenames):
                if not fn.endswith(exts):
                    continue
                try:
                    with open(os.path.join(dirpath, fn), "rb") as f:
                        data = f.read()
                except OSError:
                    continue
                # Text files only (skip anything with NUL bytes).
                if b"\x00" in data:
                    continue
                chunks.append(data)
                chunks.append(b"\n\n")
                total += len(data) + 2
                if total >= max_bytes:
                    return b"".join(chunks)[:max_bytes]
    return b"".join(chunks)


def model_config():
    from tpu_flash.models import ModelConfig

    # head_dim 128 so the trained model serves on REAL TPUs (paged decode
    # DMA-slices the head dim, which must be lane-aligned; CLAUDE.md).
    return ModelConfig(
        name="tiny-byte-llama",
        vocab_size=256,
        hidden_size=256,
        num_layers=4,
        num_q_heads=4,
        num_kv_heads=2,
        head_dim=128,
        intermediate_size=1024,
        rope_theta=10000.0,
        dtype="float32",
    )


def export_hf(params, cfg, out_dir: str, meta: dict) -> None:
    """Write the trained params as an HF-layout checkpoint directory
    (config.json + model.safetensors), the exact format
    ``checkpoint/convert.py::load_hf_dir`` consumes. Dense weights
    transpose back to torch's [out, in] convention (convert.py:48)."""
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    hf_config = {
        "model_type": "llama",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_q_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "head_dim": cfg.head_dim,
        "intermediate_size": cfg.intermediate_size,
        "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.rms_eps,
        "max_position_embeddings": 2048,
    }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(hf_config, f, indent=1)

    def t(x):  # [in, out] -> torch [out, in], f32 numpy
        return np.asarray(x, np.float32).T.copy()

    state = {"model.embed_tokens.weight": np.asarray(
        params["embed"], np.float32)}
    for i, layer in enumerate(params["layers"]):
        p = f"model.layers.{i}."
        state[p + "input_layernorm.weight"] = np.asarray(
            layer["attn_norm"], np.float32)
        state[p + "self_attn.q_proj.weight"] = t(layer["wq"])
        state[p + "self_attn.k_proj.weight"] = t(layer["wk"])
        state[p + "self_attn.v_proj.weight"] = t(layer["wv"])
        state[p + "self_attn.o_proj.weight"] = t(layer["wo"])
        state[p + "post_attention_layernorm.weight"] = np.asarray(
            layer["mlp_norm"], np.float32)
        state[p + "mlp.gate_proj.weight"] = t(layer["w_gate"])
        state[p + "mlp.up_proj.weight"] = t(layer["w_up"])
        state[p + "mlp.down_proj.weight"] = t(layer["w_down"])
    state["model.norm.weight"] = np.asarray(params["final_norm"], np.float32)
    state["lm_head.weight"] = t(params["lm_head"])
    save_file(state, os.path.join(out_dir, "model.safetensors"))
    with open(os.path.join(out_dir, "train_meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    size = os.path.getsize(os.path.join(out_dir, "model.safetensors"))
    print(f"exported {out_dir} ({size / 2**20:.1f} MiB)", file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--chain", type=int, default=25,
                    help="train steps per dispatch (lax.scan)")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--out", default="checkpoints/tiny-byte-llama")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from tpu_flash.models import FlashTransformer

    cfg = model_config()
    model = FlashTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0))
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"model: {n_params / 1e6:.2f}M params, backend "
          f"{jax.default_backend()}", file=sys.stderr)

    corpus = build_corpus()
    # Hold out the final 1 MiB for eval prompts / held-out loss.
    split = len(corpus) - 2**20
    train_bytes = np.frombuffer(corpus[:split], np.uint8)
    print(f"corpus: {len(corpus) / 2**20:.1f} MiB "
          f"({split / 2**20:.1f} train / 1.0 held out)", file=sys.stderr)

    tokens_dev = jnp.asarray(train_bytes)  # uint8 on device
    n_tok = int(tokens_dev.shape[0])

    warmup = min(200, max(1, args.steps // 10))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=warmup,
        decay_steps=max(args.steps, warmup + 1),
        end_value=args.lr * 0.1,
    )
    opt = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, weight_decay=0.01),
    )
    opt_state = opt.init(params)

    def sample_batch(key):
        offs = jax.random.randint(
            key, (args.batch,), 0, n_tok - args.seq - 1
        )

        def row(o):
            return jax.lax.dynamic_slice(
                tokens_dev, (o,), (args.seq + 1,)
            ).astype(jnp.int32)

        return jax.vmap(row)(offs)

    def one_step(carry, _):
        p, o, key, step_i = carry
        key, sub = jax.random.split(key)
        batch = sample_batch(sub)
        loss, grads = jax.value_and_grad(model.loss_fn)(p, batch)
        updates, o = opt.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return (p, o, key, step_i + 1), loss

    @jax.jit
    def train_chain(p, o, key, step_i):
        (p, o, key, step_i), losses = jax.lax.scan(
            one_step, (p, o, key, step_i), None, length=args.chain
        )
        return p, o, key, step_i, losses

    key = jax.random.PRNGKey(42)
    step_i = jnp.int32(0)
    history = []
    t0 = time.time()
    done = 0
    while done < args.steps:
        params, opt_state, key, step_i, losses = train_chain(
            params, opt_state, key, step_i
        )
        losses = np.asarray(losses)
        done += args.chain
        history.append(
            {"step": done, "loss": float(losses.mean()),
             "last": float(losses[-1])}
        )
        el = time.time() - t0
        print(f"step {done}/{args.steps} loss {losses.mean():.4f} "
              f"(last {losses[-1]:.4f}) {el:.0f}s "
              f"{done / el:.1f} steps/s", file=sys.stderr)

    # Held-out loss: fixed windows from the held-out tail.
    held = np.frombuffer(corpus[split:], np.uint8)
    rng = np.random.default_rng(3)
    offs = rng.integers(0, len(held) - args.seq - 1, 16)
    eval_batch = jnp.asarray(
        np.stack([held[o:o + args.seq + 1] for o in offs]).astype(np.int32)
    )
    eval_loss = float(jax.jit(model.loss_fn)(params, eval_batch))
    print(f"held-out loss: {eval_loss:.4f} "
          f"({np.exp(eval_loss):.2f} ppl/byte)", file=sys.stderr)

    meta = {
        "steps": args.steps, "batch": args.batch, "seq": args.seq,
        "lr": args.lr, "corpus_mib": round(len(corpus) / 2**20, 1),
        "final_train_loss": history[-1]["loss"] if history else None,
        "held_out_loss": eval_loss,
        "history": history[-20:],
        "n_params": n_params,
    }
    export_hf(jax.device_get(params), cfg, args.out, meta)


if __name__ == "__main__":
    main()
