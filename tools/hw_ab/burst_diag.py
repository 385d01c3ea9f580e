"""Diagnose the burst-sweep inversion (burst_sweep.py 2026-08-19): on the
relay, engine rounds get SLOWER as max_decode_burst grows, opposite of
the fused-burst design. Times each layer of the stack in isolation:
the raw jitted decode-burst call, its host-side prep (rng split, param
asarray), the result fetches, and full engine.step() calls.
Run: python tools/hw_ab/burst_diag.py"""
import time

import jax, jax.numpy as jnp, numpy as np

from tpu_flash.core.config import CacheConfig, EngineConfig
from tpu_flash.engine.runner import InferenceEngine
from tpu_flash.models import FlashTransformer, ModelConfig

print("backend:", jax.default_backend(), flush=True)

cfg = ModelConfig(
    name="diag", vocab_size=8192, hidden_size=1024, num_layers=4,
    num_q_heads=8, num_kv_heads=8, head_dim=128, intermediate_size=2048,
    dtype="bfloat16",
)
model = FlashTransformer(cfg)
params = model.init(jax.random.PRNGKey(0))
batch, prompt_len, new_tokens = 8, 512, 64
ctx = prompt_len + new_tokens
pps = -(-ctx // 128)

rng = np.random.default_rng(1)


def fresh_engine(burst):
    ecfg = EngineConfig(
        max_batch_size=batch, max_seq_len=ctx, prefill_chunk=512,
        max_decode_burst=burst,
        cache=CacheConfig(page_size=128, num_pages=batch * pps + 8,
                          max_pages_per_seq=pps, kv_dtype="int8"),
    )
    return InferenceEngine(model, params, ecfg)


for burst in (1, 8):
    eng = fresh_engine(burst)
    for _ in range(batch):
        eng.submit(rng.integers(0, 8192, prompt_len).tolist(),
                   max_new_tokens=new_tokens)
    # run prefills + first decode (compiles)
    t0 = time.perf_counter()
    steps = 0
    step_times = []
    while eng.scheduler.has_work():
        s0 = time.perf_counter()
        eng.step()
        step_times.append(time.perf_counter() - s0)
        steps += 1
    wall = time.perf_counter() - t0
    st = np.array(step_times)
    print(f"burst={burst} round1 (compiles): wall {wall:.1f}s steps={steps} "
          f"p50 {np.median(st)*1e3:.0f} ms  max {st.max():.2f}s",
          flush=True)
    # round 2: steady state, per-step walls
    for _ in range(batch):
        eng.submit(rng.integers(0, 8192, prompt_len).tolist(),
                   max_new_tokens=new_tokens)
    step_times = []
    t0 = time.perf_counter()
    while eng.scheduler.has_work():
        s0 = time.perf_counter()
        eng.step()
        step_times.append(time.perf_counter() - s0)
    wall = time.perf_counter() - t0
    st = np.array(step_times)
    big = ", ".join(f"{x:.2f}" for x in sorted(st)[-6:])
    print(f"burst={burst} round2: wall {wall:.1f}s steps={len(st)} "
          f"p50 {np.median(st)*1e3:.0f} ms  top: {big}", flush=True)

# isolate the raw burst fn at n=8 on the warm engine
eng8 = eng  # burst=8 engine, warm
n = 8
fn = eng8._decode_multi_fns.get(n)
if fn is None:
    print("no n=8 decode fn compiled; keys:",
          list(eng8._decode_multi_fns), flush=True)
else:
    eng8._rng, sub = jax.random.split(eng8._rng)
    keys = jax.random.split(sub, n)
    args = (
        eng8.params, eng8.cache, eng8.last_tokens, eng8.lengths,
        eng8.page_tables, jnp.asarray(eng8.active), keys,
        jnp.asarray(eng8.temps), jnp.asarray(eng8.top_ks),
        jnp.asarray(eng8.top_ps), jnp.asarray(eng8.min_ps),
        jnp.asarray(eng8.lora_ids), eng8.logit_bias,
    )
    for rep in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        t1 = time.perf_counter()
        toks = np.asarray(out[3])
        t2 = time.perf_counter()
        print(f"raw n=8 call {rep}: dispatch {t1-t0:.3f}s "
              f"fetch {t2-t1:.3f}s", flush=True)
        args = (eng8.params, out[0]) + args[2:]  # reuse donated cache out
print("DONE", flush=True)
