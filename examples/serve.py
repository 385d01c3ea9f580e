"""End-to-end serving example: the full tpu_flash stack in one file.

Runs anywhere (CPU interpret mode without a TPU; real kernels on TPU):

    PYTHONPATH=. python examples/serve.py

Demonstrates: model init (or HF import), continuous-batching engine with
a quantized paged KV cache, prefix caching, sampling + stop tokens,
parallel sampling (n completions per prompt), priorities, optimistic
admission with preemption, speculative decoding, per-token logprobs,
engine snapshot/resume, and scale-out (tensor-parallel and data-parallel
serving) when multiple devices are present.
"""

import os
import tempfile

import jax

# CPU unless explicitly pointed at TPU hardware (the example must run on
# boxes where the TPU is busy or absent); mirrors examples/train.py.
if os.environ.get("TPU_FLASH_EXAMPLE_BACKEND", "cpu") != "tpu":
    jax.config.update("jax_platforms", "cpu")

from tpu_flash.checkpoint import restore_engine, snapshot_engine
from tpu_flash.core.config import CacheConfig, EngineConfig
from tpu_flash.engine import DataParallelEngine
from tpu_flash.engine.runner import InferenceEngine
from tpu_flash.engine.sampling import SamplingParams
from tpu_flash.models import FlashTransformer, ModelConfig


def main():
    # A small demo model; for real weights use
    # tpu_flash.checkpoint.params_from_hf_llama(state_dict, config).
    cfg = ModelConfig(
        name="demo", vocab_size=512, hidden_size=256, num_layers=2,
        num_q_heads=8, num_kv_heads=4, head_dim=128,
        intermediate_size=512, dtype="float32",
    )
    model = FlashTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0))

    engine_cfg = EngineConfig(
        max_batch_size=4,
        max_seq_len=512,
        prefill_chunk=64,
        # bf16 KV: quality-safe default. For long context switch to
        # kv_dtype="int8"/"int4" with page_size 512-1024 (see CacheConfig).
        cache=CacheConfig(
            page_size=16, num_pages=256, max_pages_per_seq=16,
            kv_dtype="bfloat16",
        ),
    )

    engine = InferenceEngine(model, params, engine_cfg)

    # Mixed workload: greedy, sampled, stop-token'd; the shared prefix is
    # served from the prefix cache after the first request writes it
    # (matches land on the prefill_chunk grid, so share >= one chunk).
    system = [7, 8, 9, 7, 8, 9, 7, 8] * 8  # a 64-token "system prompt"
    r1 = engine.submit(system + [1, 2, 3], max_new_tokens=12)
    r2 = engine.submit(
        system + [4, 5], max_new_tokens=12,
        sampling=SamplingParams(temperature=0.8, top_p=0.9),
    )
    r3 = engine.submit([9, 8, 7, 9, 8, 7, 9, 8], max_new_tokens=12,
                       stop_tokens=[0])
    # Parallel sampling: 3 completions, ONE prefill, shared prompt pages.
    r5 = engine.submit(
        system + [2, 2], max_new_tokens=8, n=3,
        sampling=SamplingParams(temperature=1.0, min_p=0.05),
        priority=1,  # admits ahead of same-arrival lower-priority work
    )
    # logit_bias: OpenAI-style token bans/boosts on any request.
    r6 = engine.submit(system + [4], max_new_tokens=6,
                       logit_bias={0: -1e9, 1: -1e9})
    outputs = engine.run()
    print("outputs:", {r: outputs[r] for r in (r1, r2, r3)})
    print("parallel samples:",
          [outputs[b] for b in engine.branches(r5)])
    print("logprobs[r1]:", [round(x, 3) for x in engine.logprobs[r1]])
    print("prefix cache:", engine.prefix_stats())
    print("speculation:", engine.speculation_stats())
    print("metrics:", engine.metrics.summary())

    # Snapshot / resume mid-serving.
    r4 = engine.submit(system + [6], max_new_tokens=8)
    engine.step()  # partially run it
    with tempfile.TemporaryDirectory() as td:
        snapshot_engine(td, engine)
        resumed = InferenceEngine(model, params, engine_cfg)
        restore_engine(td, resumed)
        print("resumed outputs:", resumed.run()[r4])
        resumed.close()
    engine.close()

    # Sliding-window + softcap models (Mistral / Gemma-2 class): every
    # serving path masks in-kernel, and decode skips below-window KV
    # blocks (cost tracks the window, not the context).
    import dataclasses

    wcfg = dataclasses.replace(cfg, sliding_window=32, attn_softcap=30.0)
    wmodel = FlashTransformer(wcfg)
    wparams = wmodel.init(jax.random.PRNGKey(1))
    wengine = InferenceEngine(wmodel, wparams, engine_cfg)
    rw = wengine.submit(system + [1, 2, 3], max_new_tokens=8)
    print("windowed outputs:", wengine.run()[rw])
    wengine.close()

    # Multi-LoRA: register adapters once, then any request names one —
    # rows with different adapters (and base rows) share every batched
    # dispatch. Streaming: engine.stream() yields tokens as steps commit.
    import numpy as _np

    rng = _np.random.default_rng(0)
    adapters = {
        0: {"wq": (rng.normal(size=(cfg.hidden_size, 4)) * 0.2,
                   rng.normal(size=(4, cfg.num_q_heads * cfg.head_dim)))}
    }
    lengine = InferenceEngine(model, params, engine_cfg)
    lengine.register_lora("style-a", adapters)
    lr = lengine.submit(system + [5], max_new_tokens=6, lora="style-a")
    br = lengine.submit(system + [5], max_new_tokens=6)  # base row
    streamed = [(rid, tok) for rid, _i, tok in lengine.stream()]
    print("lora stream:", [t for rid, t in streamed if rid == lr])
    print("base stream:", [t for rid, t in streamed if rid == br])
    lengine.close()

    # Optimistic admission: prompt pages at admission, per-step top-up;
    # a deliberately tiny pool forces preemption — victims swap their KV
    # through host memory and resume exactly where they left off.
    tight = EngineConfig(
        max_batch_size=4, max_seq_len=512, prefill_chunk=64,
        cache=CacheConfig(page_size=16, num_pages=16,
                          max_pages_per_seq=16, kv_dtype="bfloat16"),
        admission="optimistic", preemption="swap", prefix_cache=False,
    )
    oengine = InferenceEngine(model, params, tight)
    orids = [oengine.submit(system + [i], max_new_tokens=32)
             for i in range(3)]
    oouts = oengine.run()
    print("optimistic outputs:", {r: oouts[r][:6] for r in orids})
    print("preemptions:", oengine.scheduler.num_preemptions)
    oengine.close()

    # Scale-out when devices allow: TP shards one engine over a "model"
    # axis; DP runs independent replicas (optionally TP inside each).
    n = jax.device_count()
    if n >= 2:
        dp = DataParallelEngine(
            model, params, engine_cfg, replicas=2,
            tp=2 if n >= 4 and cfg.num_kv_heads % 2 == 0 else 1,
        )
        rids = [dp.submit(system + [i], max_new_tokens=6) for i in range(4)]
        outs = dp.run()
        print(f"DP x TP ({dp.replicas} replicas, tp={dp.tp}):",
              {r: outs[r] for r in rids})
        print("DP stats:", dp.stats())
        dp.close()


if __name__ == "__main__":
    main()
