"""Serve a model over HTTP:  python -m tpu_flash.serve [options]

Without --hf-dir this serves a small randomly-initialized demo model (the
full stack is real: continuous batching, paged quantized KV cache, prefix
cache, streaming) — useful for smoke tests and client development. Point
--hf-dir at a converted HuggingFace checkpoint directory for real weights
(tpu_flash.checkpoint.convert).
"""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--kv-dtype", default="bfloat16",
                    choices=["bfloat16", "float32", "int8", "int4",
                             "int4g32", "k8v4", "fp8"])
    ap.add_argument("--max-batch-size", type=int, default=8)
    ap.add_argument("--max-seq-len", type=int, default=2048)
    ap.add_argument("--page-size", type=int, default=None,
                    help="tokens per page; default: the engine's "
                    "regime-aware auto policy (utils/tuning.py)")
    ap.add_argument("--hf-dir", default=None,
                    help="HF checkpoint dir (config.json + weights)")
    ap.add_argument("--byte-tokenizer", action="store_true",
                    help="accept text prompts via the byte-level codec")
    args = ap.parse_args()

    import jax

    from tpu_flash.core.config import CacheConfig, EngineConfig
    from tpu_flash.engine.runner import InferenceEngine
    from tpu_flash.models import FlashTransformer, ModelConfig
    from tpu_flash.serve import ByteTokenizer, serve

    if args.hf_dir:
        from tpu_flash.checkpoint.convert import load_hf_dir

        model, params = load_hf_dir(args.hf_dir)
    else:
        cfg = ModelConfig(
            name="demo", vocab_size=512, hidden_size=256, num_layers=2,
            num_q_heads=8, num_kv_heads=4, head_dim=128,
            intermediate_size=512, dtype="bfloat16",
        )
        model = FlashTransformer(cfg)
        params = model.init(jax.random.PRNGKey(0))

    if args.page_size is None:  # auto layout (resolved at engine init)
        cache = CacheConfig(kv_dtype=args.kv_dtype)
    else:
        pps = -(-args.max_seq_len // args.page_size)
        cache = CacheConfig(
            page_size=args.page_size,
            num_pages=args.max_batch_size * pps + 8,
            max_pages_per_seq=pps,
            kv_dtype=args.kv_dtype,
        )
    engine = InferenceEngine(
        model, params,
        EngineConfig(
            max_batch_size=args.max_batch_size,
            max_seq_len=args.max_seq_len,
            cache=cache,
        ),
    )
    tok = ByteTokenizer(offset=0) if args.byte_tokenizer else None
    print(f"serving {model.config.name} on http://{args.host}:{args.port}")
    serve(engine, host=args.host, port=args.port, tokenizer=tok,
          model_name=model.config.name, block=True)


if __name__ == "__main__":
    main()
