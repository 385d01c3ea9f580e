"""Benchmark harness: per-config kernel benchmarks + roofline comparison.

The reference has no timing code at all (SURVEY.md §6); this module
self-establishes the BASELINE.md numbers. Timing discipline: jit + warmup
compile, then N timed iterations bracketed by ``jax.block_until_ready``.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from tpu_flash.core.config import BlockSizes
from tpu_flash.ops.flash import flash_attention
from tpu_flash.utils.device import device_info


def attention_flops(
    batch: int, heads: int, q_len: int, kv_len: int, head_dim: int,
    causal: bool,
) -> float:
    """Matmul FLOPs of one attention call (QK^T + PV, 2*M*N*K each)."""
    full = 4.0 * batch * heads * q_len * kv_len * head_dim
    return full / 2 if causal else full


def attention_hbm_bytes(
    batch, q_heads, kv_heads, q_len, kv_len, head_dim, itemsize
) -> float:
    q = batch * q_heads * q_len * head_dim
    kv = 2 * batch * kv_heads * kv_len * head_dim
    o = q
    return (q + kv + o) * itemsize


def _time_chained(
    step: Callable[..., jax.Array],
    x0: jax.Array,
    *rest: jax.Array,
    inner: int = 16,
    repeats: int = 4,
    target_window: float = 0.15,
    max_inner: int = 4096,
) -> float:
    """Seconds per op via differential timing of in-jit chained loops.

    ``step(x, *rest)`` must map x -> same-shape x (the data dependency
    defeats CSE/DCE and forces sequential execution). The result is fetched
    to host — on remote execution paths ``block_until_ready`` can return
    before the device finishes, so only a D2H transfer bounds completion.
    Timing inner vs 2*inner iterations cancels dispatch/transfer overhead.
    ``rest`` operands are explicit jit args (closure capture would embed
    them as constants in the compile payload).

    The chain length auto-calibrates upward until one wall covers
    ``target_window`` seconds: the relay's fixed dispatch overhead is
    ~23 ms with multi-ms jitter (BENCHLOG 2026-08-20 round 4), so a
    differential over ~15-30 ms windows measures the jitter, not the
    kernel (the r3 headline's 111-157 TF/s cross-process band). With
    >=150 ms windows the same kernel repeats within +-1% in-process and
    a few % across processes. ``inner`` is the calibration floor.
    """

    @jax.jit
    def run(x, n, *rest):
        def cond(c):
            return c[0] < n

        def body(c):
            return c[0] + 1, step(c[1], *rest)

        _, out = jax.lax.while_loop(cond, body, (jnp.int32(0), x))
        return jnp.sum(out.astype(jnp.float32))

    n = max(inner, 1)
    float(run(x0, jnp.int32(n), *rest))  # compile once (dynamic trip count)
    # Calibrate the window (dynamic trip count: no recompiles).
    while n < max_inner:
        w = _wall(lambda: float(run(x0, jnp.int32(n), *rest)))
        if w >= target_window:
            break
        # Jump straight to the projected target, minus the overhead share.
        grow = max(2.0, target_window / max(w, 1e-6))
        n = min(max_inner, max(n + 1, int(n * min(grow, 16.0))))
    n1, n2 = jnp.int32(n), jnp.int32(2 * n)
    t1 = min(
        _wall(lambda: float(run(x0, n1, *rest))) for _ in range(repeats)
    )
    t2 = min(
        _wall(lambda: float(run(x0, n2, *rest))) for _ in range(repeats)
    )
    return max((t2 - t1) / n, 1e-9)


def _wall(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


@dataclasses.dataclass
class BenchResult:
    name: str
    seconds: float
    tflops: float
    roofline_tflops: float
    hbm_gbps: float

    @property
    def roofline_frac(self) -> float:
        return self.tflops / self.roofline_tflops if self.roofline_tflops else 0.0


def bench_flash_prefill(
    batch: int = 1,
    num_q_heads: int = 32,
    num_kv_heads: int = 32,
    seq: int = 2048,
    head_dim: int = 128,
    dtype=jnp.bfloat16,
    causal: bool = True,
    block_sizes: Optional[BlockSizes] = None,
    iters: int = 20,
) -> BenchResult:
    """BASELINE config 2 by default: Llama-2-7B prefill shapes."""
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (batch, num_q_heads, seq, head_dim), dtype)
    k = jax.random.normal(kk, (batch, num_kv_heads, seq, head_dim), dtype)
    v = jax.random.normal(kv, (batch, num_kv_heads, seq, head_dim), dtype)

    def step(x, k, v):
        o = flash_attention(x, k, v, causal=causal, block_sizes=block_sizes)
        return o.astype(x.dtype)

    secs = _time_chained(step, q, k, v, inner=max(4, iters // 2))

    flops = attention_flops(
        batch, num_q_heads, seq, seq, head_dim, causal
    )
    bytes_ = attention_hbm_bytes(
        batch, num_q_heads, num_kv_heads, seq, seq, head_dim,
        jnp.dtype(dtype).itemsize,
    )
    info = device_info()
    roofline = info.roofline_attention_tflops(flops, bytes_)
    return BenchResult(
        name=f"flash_prefill b{batch} h{num_q_heads} s{seq} d{head_dim} "
        f"{jnp.dtype(dtype).name}{' causal' if causal else ''}",
        seconds=secs,
        tflops=flops / secs / 1e12,
        roofline_tflops=roofline,
        hbm_gbps=bytes_ / secs / 1e9,
    )


def bench_decode_tokens_per_s(
    batch: int = 8,
    num_q_heads: int = 32,
    num_kv_heads: int = 8,
    head_dim: int = 128,
    context: int = 4096,
    page_size: int = 128,
    kv_quant: Optional[str] = "int8",
    pages_per_compute_block: int = 8,
    iters: int = 20,
    fp_dtype=jnp.float32,
    window: Optional[int] = None,
):
    """BASELINE config 3 by default: Llama-3-8B GQA decode, INT8 KV, 4K ctx.
    ``fp_dtype`` sets the unquantized page payload (bfloat16 takes the
    MXU-native decode path). ``window`` benches sliding-window decode:
    below-window KV blocks are skipped in-kernel, so cost tracks the
    window, not the context; the GB/s figure counts only attended bytes.
    Returns (tokens_per_second, seconds_per_step, hbm_gbps)."""
    from tpu_flash.core.reference import gather_pages_to_dense  # noqa: F401
    from tpu_flash.ops.decode import paged_attention
    from tpu_flash.ops.quant import quantize_pages

    pages_per_seq = context // page_size
    num_pages = batch * pages_per_seq + 1
    key = jax.random.PRNGKey(0)
    kk, kv, kq = jax.random.split(key, 3)
    k_pages = jax.random.normal(
        kk, (num_kv_heads, num_pages, page_size, head_dim), jnp.float32
    )
    v_pages = jax.random.normal(
        kv, (num_kv_heads, num_pages, page_size, head_dim), jnp.float32
    )
    if kv_quant:
        k_pages = quantize_pages(k_pages, kv_quant)
        v_pages = quantize_pages(v_pages, kv_quant)
    else:
        k_pages = k_pages.astype(fp_dtype)
        v_pages = v_pages.astype(fp_dtype)
    page_indices = (
        jnp.arange(batch * pages_per_seq, dtype=jnp.int32)
        .reshape(batch, pages_per_seq)
    )
    lengths = jnp.full((batch,), context, jnp.int32)
    q = jax.random.normal(kq, (batch, num_q_heads, head_dim), jnp.float32)

    # QuantizedTensor has static string fields; ship raw arrays across the
    # jit boundary and rebuild inside.
    if kv_quant:
        packing = k_pages.packing
        parts = (
            k_pages.values, k_pages.scales, v_pages.values, v_pages.scales,
        )

        def step(x, lengths, page_indices, kv_, ks_, vv_, vs_):
            from tpu_flash.ops.quant import QuantizedTensor

            kq_ = QuantizedTensor(kv_, ks_, kv_quant, packing)
            vq_ = QuantizedTensor(vv_, vs_, kv_quant, packing)
            o = paged_attention(
                x, kq_, vq_, lengths, page_indices,
                pages_per_compute_block=pages_per_compute_block,
                window=window,
            )
            return o.astype(x.dtype)

    else:
        parts = (k_pages, v_pages)

        def step(x, lengths, page_indices, k_, v_):
            o = paged_attention(
                x, k_, v_, lengths, page_indices,
                pages_per_compute_block=pages_per_compute_block,
                window=window,
            )
            return o.astype(x.dtype)

    secs = _time_chained(
        step, q, lengths, page_indices, *parts, inner=max(4, iters // 2)
    )

    payload_itemsize = 1 if kv_quant else jnp.dtype(fp_dtype).itemsize
    attended = min(window, context) if window else context
    kv_bytes = (
        2 * batch * num_kv_heads * attended * head_dim * payload_itemsize
    )
    if kv_quant in ("int4", "int4g32"):
        kv_bytes /= 2
    if kv_quant == "int4g32":  # per-(token, 32-group) scale+zero pairs
        from tpu_flash.ops.quant.quantize import int4g32_num_groups

        kv_bytes += (2 * batch * num_kv_heads * attended
                     * 2 * int4g32_num_groups(head_dim) * 4)
    elif kv_quant:
        kv_bytes += 2 * batch * num_kv_heads * attended * 4  # scales
    return batch / secs, secs, kv_bytes / secs / 1e9


def bench_paged_prefill_chunk(
    batch: int = 1,
    num_q_heads: int = 32,
    num_kv_heads: int = 8,
    head_dim: int = 128,
    hist: int = 8192,
    chunk: int = 512,
    page_size: int = 128,
    kv_quant: Optional[str] = None,
    fp_dtype=jnp.bfloat16,
    window: Optional[int] = None,
    iters: int = 32,
):
    """One engine prefill-chunk attention over the paged cache (the
    in-kernel paged sweep, ops/flash/paged_prefill.py). ``window``
    exercises the window-aware DMA walk: below-window history pages are
    neither streamed nor visited, so chunk cost tracks the window, not
    the history. Returns (seconds_per_chunk, attended_kv_gbps)."""
    from tpu_flash.ops.flash import paged_prefill_attention
    from tpu_flash.ops.quant import quantize_pages

    pages_per_seq = hist // page_size
    num_pages = batch * pages_per_seq + 1
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    k_pages = jax.random.normal(
        ks[0], (num_kv_heads, num_pages, page_size, head_dim), jnp.float32
    )
    v_pages = jax.random.normal(
        ks[1], (num_kv_heads, num_pages, page_size, head_dim), jnp.float32
    )
    if kv_quant:
        k_pages = quantize_pages(k_pages, kv_quant)
        v_pages = quantize_pages(v_pages, kv_quant)
    else:
        k_pages = k_pages.astype(fp_dtype)
        v_pages = v_pages.astype(fp_dtype)
    tables = (
        jnp.arange(batch * pages_per_seq, dtype=jnp.int32)
        .reshape(batch, pages_per_seq)
    )
    q = jax.random.normal(
        ks[2], (batch, num_q_heads, chunk, head_dim), fp_dtype
    )
    ck = jax.random.normal(
        ks[3], (batch, num_kv_heads, chunk, head_dim), fp_dtype
    )
    cv = jax.random.normal(
        ks[4], (batch, num_kv_heads, chunk, head_dim), fp_dtype
    )
    offs = jnp.full((batch,), hist, jnp.int32)

    if kv_quant:
        packing = k_pages.packing
        parts = (
            k_pages.values, k_pages.scales, v_pages.values, v_pages.scales,
        )

        def step(x, ck, cv, offs, tables, kv_, ksc_, vv_, vsc_):
            from tpu_flash.ops.quant import QuantizedTensor

            kq_ = QuantizedTensor(kv_, ksc_, kv_quant, packing)
            vq_ = QuantizedTensor(vv_, vsc_, kv_quant, packing)
            o = paged_prefill_attention(
                x, ck, cv, kq_, vq_, offs, tables, hist_cap=hist,
                window=window,
            )
            return o.astype(x.dtype)

    else:
        parts = (k_pages, v_pages)

        def step(x, ck, cv, offs, tables, k_, v_):
            o = paged_prefill_attention(
                x, ck, cv, k_, v_, offs, tables, hist_cap=hist,
                window=window,
            )
            return o.astype(x.dtype)

    secs = _time_chained(
        step, q, ck, cv, offs, tables, *parts, inner=max(4, iters // 2)
    )

    payload_itemsize = 1 if kv_quant else jnp.dtype(fp_dtype).itemsize
    attended = min(window, hist) if window else hist
    kv_bytes = (
        2 * batch * num_kv_heads * attended * head_dim * payload_itemsize
    )
    if kv_quant in ("int4", "int4g32"):
        kv_bytes /= 2
    if kv_quant == "int4g32":  # per-(token, 32-group) scale+zero pairs
        from tpu_flash.ops.quant.quantize import int4g32_num_groups

        kv_bytes += (2 * batch * num_kv_heads * attended
                     * 2 * int4g32_num_groups(head_dim) * 4)
    elif kv_quant:
        kv_bytes += 2 * batch * num_kv_heads * attended * 4  # scales
    return secs, kv_bytes / secs / 1e9


def _bench_engine(
    num_layers, hidden, num_q_heads, num_kv_heads, head_dim, batch, ctx,
    page_size, kv_dtype, recent_window=None, **engine_kwargs
):
    """Shared engine construction for the engine-level benches.
    ``recent_window`` overrides the CacheConfig default (0 disables the
    exact recent ring — the ring-cost A/B lever). ``page_size=None``
    leaves the whole cache layout on the engine's regime-aware auto
    policy (utils/tuning.py::select_cache_policy) — the
    measured-defaults path VERDICT r4 item 3 asks the benches to
    exercise with no hand flags."""
    from tpu_flash.core.config import CacheConfig, EngineConfig
    from tpu_flash.engine.runner import InferenceEngine
    from tpu_flash.models import FlashTransformer, ModelConfig

    cfg = ModelConfig(
        name="bench-engine",
        vocab_size=8192,
        hidden_size=hidden,
        num_layers=num_layers,
        num_q_heads=num_q_heads,
        num_kv_heads=num_kv_heads,
        head_dim=head_dim,
        intermediate_size=2 * hidden,
        dtype="bfloat16",
    )
    model = FlashTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0))
    ring_kw = (
        {} if recent_window is None else {"recent_window": recent_window}
    )
    if page_size is None:  # full auto layout (regime-aware policy)
        cache = CacheConfig(kv_dtype=kv_dtype, **ring_kw)
    else:
        pages_per_seq = -(-ctx // page_size)
        cache = CacheConfig(
            page_size=page_size,
            num_pages=batch * pages_per_seq + 8,
            max_pages_per_seq=pages_per_seq,
            kv_dtype=kv_dtype,
            **ring_kw,
        )
    ecfg = EngineConfig(
        max_batch_size=batch,
        max_seq_len=ctx,
        prefill_chunk=512,
        cache=cache,
        **engine_kwargs,
    )
    return InferenceEngine(model, params, ecfg)


def bench_engine_tokens_per_s(
    num_layers: int = 4,
    hidden: int = 1024,
    num_q_heads: int = 8,
    num_kv_heads: int = 8,
    head_dim: int = 128,
    batch: int = 8,
    prompt_len: int = 512,
    new_tokens: int = 64,
    kv_dtype: str = "int8",
    page_size: int = 128,
    shared_prefix: int = 0,
    staggered: bool = False,
    fused_mixed_step="auto",
    lora_rank: int = 0,
    lora_count: int = 2,
    max_decode_burst: int = 8,
):
    """End-to-end continuous-batching engine throughput (full serving stack:
    scheduler, chunked prefill, paged decode, sampling, watchdogs). Returns
    (decode_tokens_per_s, total_wall_s, metrics_summary, prefix_stats).
    Layer count is reduced — scale judgments should use per-layer rates.

    ``staggered`` submits arrivals in waves so prefill and decode phases
    overlap (the regime where ``fused_mixed_step`` merges each step's
    prefill + decode into one dispatch — the lever when dispatch latency
    dominates, e.g. relay-attached devices)."""
    import time

    import numpy as np

    engine = _bench_engine(
        num_layers, hidden, num_q_heads, num_kv_heads, head_dim, batch,
        prompt_len + new_tokens, page_size, kv_dtype,
        fused_mixed_step=fused_mixed_step,
        max_decode_burst=max_decode_burst,
    )
    model, cfg = engine.model, engine.model.config
    # Host-side prompt generation: device arrays here would mean one D2H
    # fetch per TOKEN on remote/relay backends (minutes of pure latency).
    host_rng = np.random.default_rng(1)
    prefix = host_rng.integers(0, 8192, shared_prefix).tolist()

    # Optional multi-LoRA overhead mode: every request is tagged with one
    # of ``lora_count`` rank-``lora_rank`` adapters covering ALL layers
    # and projections (worst case: every projection pays the per-row
    # low-rank einsums).
    lora_names: list = []
    if lora_rank:
        qd = num_q_heads * head_dim
        kvd = num_kv_heads * head_dim
        dims = {"wq": (hidden, qd), "wk": (hidden, kvd),
                "wv": (hidden, kvd), "wo": (qd, hidden),
                "w_gate": (hidden, 2 * hidden), "w_up": (hidden, 2 * hidden),
                "w_down": (2 * hidden, hidden)}
        for i in range(lora_count):
            adapters = {
                li: {p: (host_rng.standard_normal((fi, lora_rank),
                                                  dtype=np.float32)
                         * (0.01 / fi**0.5),
                         host_rng.standard_normal((lora_rank, fo),
                                                  dtype=np.float32))
                     for p, (fi, fo) in dims.items()}
                for li in range(num_layers)
            }
            name = f"bench-lora-{i}"
            engine.register_lora(name, adapters)
            lora_names.append(name)
    n_submitted = [0]

    def submit_one():
        tail = host_rng.integers(
            0, 8192, prompt_len - shared_prefix
        ).tolist()
        lora = (lora_names[n_submitted[0] % len(lora_names)]
                if lora_names else None)
        n_submitted[0] += 1
        engine.submit(prefix + tail, max_new_tokens=new_tokens, lora=lora)

    def run_round():
        if not staggered:
            for _ in range(batch):
                submit_one()
            engine.run()
            return
        # Waves: half up front (at least one), the rest dribbling in
        # while earlier requests decode — every wave creates mixed
        # prefill+decode steps. Drain any leftovers if the engine goes
        # idle early so the tok/s denominator covers ALL the work.
        first = max(1, batch // 2)
        for _ in range(first):
            submit_one()
        left = batch - first
        while engine.scheduler.has_work() or left:
            if not engine.scheduler.has_work():
                submit_one()
                left -= 1
                continue
            engine.step()
            if left:
                submit_one()
                left -= 1

    # Round 1 compiles every program (prefill buckets, decode burst sizes);
    # round 2 is the steady-state measurement.
    run_round()
    engine.metrics = type(engine.metrics)()
    t0 = time.perf_counter()
    run_round()
    wall = time.perf_counter() - t0
    m = engine.metrics.summary()
    total_tokens = batch * new_tokens
    return total_tokens / wall, wall, m, engine.prefix_stats()


def bench_engine_device_decode(
    num_layers: int = 4,
    hidden: int = 1024,
    num_q_heads: int = 8,
    num_kv_heads: int = 8,
    head_dim: int = 128,
    batch: int = 8,
    prompt_len: int = 512,
    kv_dtype: str = "int8",
    page_size: int = 128,
    burst: int = 8,
    inner: int = 8,
    max_ctx: int = 1024,
    recent_window=None,
    engine=None,
    vocab: int = 8192,
):
    """DEVICE-side serving decode throughput: time the engine's own jitted
    burst program (every layer: RMSNorm, QKV, cache append, paged
    attention, MLP, sampling) in a chained loop, isolating device time
    from host dispatch. On relay-attached devices ``bench_engine_tokens_
    per_s`` measures mostly relay round-trips (~96 ms p50/step, BENCHLOG
    2026-08-17); this is the number a directly-attached deployment gets,
    which VERDICT r1 item 4 asks for.

    Methodology: real engine, real prefill (so the cache/page tables are
    live at batch occupancy), then the burst program re-runs with the
    LENGTHS HELD CONSTANT — each burst re-appends at the same page
    offsets, a steady-state-equivalent workload that cannot overflow the
    page pool however long the timing chain runs. Differential timing
    (t(2n) - t(n)) cancels the chain's fixed costs; the D2H fetch of the
    summed tokens is the completion barrier.

    Returns (decode_tokens_per_s, seconds_per_token, seconds_per_step).
    """
    import functools as _ft

    import numpy as np

    if engine is None:
        engine = _bench_engine(
            num_layers, hidden, num_q_heads, num_kv_heads, head_dim, batch,
            max_ctx, page_size, kv_dtype, recent_window=recent_window,
        )
    else:  # prebuilt engine (e.g. a trained checkpoint): honor ITS shapes
        batch = engine.config.max_batch_size
        max_ctx = engine.config.max_seq_len
        prompt_len = min(prompt_len, max_ctx - 2)
    host_rng = np.random.default_rng(1)
    for _ in range(batch):
        engine.submit(
            host_rng.integers(0, vocab, prompt_len).tolist(),
            max_new_tokens=max_ctx - prompt_len - 1,
        )
    # Step until every request has cleared prefill (generated >= 1) so the
    # burst program sees live caches at full batch occupancy.
    for _ in range(64):
        if engine.scheduler.active and not engine.scheduler.waiting and all(
            r.generated >= 1 for r in engine.scheduler.active.values()
        ):
            break
        engine.step()

    impl = _ft.partial(engine._decode_multi_impl, burst)
    active_mask = jnp.asarray(engine.active)
    keys = jax.random.split(jax.random.PRNGKey(7), burst)
    consts = (
        engine.page_tables, active_mask, keys,
        jnp.asarray(engine.temps), jnp.asarray(engine.top_ks),
        jnp.asarray(engine.top_ps), jnp.asarray(engine.min_ps),
        jnp.asarray(engine.lora_ids), engine.logit_bias,
    )

    @jax.jit
    def chain(n, params, cache, tokens, lengths, page_tables, active,
              keys, temps, tks, tps, mps, lids, lbias):
        # params ride as an ARGUMENT: closing over them embeds the whole
        # model as compile-payload constants (2.4 GB at production shapes
        # — breaks the relay's remote_compile transport).
        def body(c):
            i, cache, tokens = c
            cache, tokens, _, _, _, _ = impl(
                params, cache, tokens, lengths, page_tables,
                active, keys, temps, tks, tps, mps, lids, lbias,
            )
            return i + 1, cache, tokens

        _, cache, tokens = jax.lax.while_loop(
            lambda c: c[0] < n, body, (jnp.int32(0), cache, tokens)
        )
        return jnp.sum(tokens.astype(jnp.float32))

    args = (engine.params, engine.cache, engine.last_tokens,
            engine.lengths, *consts)
    float(chain(jnp.int32(inner), *args))  # compile (dynamic trip count)
    # Auto-calibrate the window like _time_chained: small-window
    # differentials measure relay dispatch jitter, not the program
    # (BENCHLOG 2026-08-20 round 4).
    n = inner
    while n < 512:
        w = _wall(lambda: float(chain(jnp.int32(n), *args)))
        if w >= 0.15:
            break
        n = min(512, max(n + 1, int(n * min(max(2.0, 0.15 / max(w, 1e-6)),
                                            16.0))))
    n1, n2 = jnp.int32(n), jnp.int32(2 * n)
    inner = n
    t1 = min(_wall(lambda: float(chain(n1, *args))) for _ in range(4))
    t2 = min(_wall(lambda: float(chain(n2, *args))) for _ in range(4))
    sec_per_chain_step = max((t2 - t1) / inner, 1e-9)
    n_active = int(active_mask.sum())
    sec_per_step = sec_per_chain_step / burst
    toks_per_s = n_active / sec_per_step
    return toks_per_s, sec_per_step / max(n_active, 1), sec_per_step


def bench_train_step(
    batch: int = 1,
    num_q_heads: int = 32,
    num_kv_heads: int = 32,
    seq: int = 2048,
    head_dim: int = 128,
    dtype=jnp.bfloat16,
    causal: bool = True,
    iters: int = 8,
) -> BenchResult:
    """Attention TRAINING throughput: forward + the FA2 custom_vjp
    backward kernels (dq + dk + dv), chained through dq. Useful FLOPs =
    3.5x the forward's (fwd 2 matmuls; bwd 5: score recompute, dp, ds*k,
    ds^T*q, p^T*do), causal halves both."""
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (batch, num_q_heads, seq, head_dim), dtype)
    k = jax.random.normal(kk, (batch, num_kv_heads, seq, head_dim), dtype)
    v = jax.random.normal(kv, (batch, num_kv_heads, seq, head_dim), dtype)

    def loss(q_, k_, v_):
        return jnp.sum(
            flash_attention(q_, k_, v_, causal=causal).astype(jnp.float32)
        )

    grad = jax.grad(loss, argnums=(0, 1, 2))

    def step(x, k, v):
        dq, dk, dv = grad(x, k, v)
        # dk/dv fold into the carrier so the backward kernels can't be
        # dead-code-eliminated (MHA default: all three share x's shape).
        out = dq
        if dk.shape == out.shape:
            out = out + 0.001 * (dk + dv)
        return out.astype(x.dtype)

    seconds = _time_chained(step, q, k, v, inner=iters)
    causal_frac = 0.5 if causal else 1.0
    fwd_flops = 4 * batch * num_q_heads * seq * seq * head_dim * causal_frac
    flops = 3.5 * fwd_flops
    from tpu_flash.utils.device import device_info

    roofline = (
        device_info().peak_bf16_tflops if dtype == jnp.bfloat16 else 0.0
    )
    bytes_moved = 2 * (q.size + k.size + v.size) * q.dtype.itemsize * 2
    return BenchResult(
        name=(
            f"flash_train b{batch} h{num_q_heads} s{seq} d{head_dim} "
            f"{jnp.dtype(dtype).name}{' causal' if causal else ''}"
        ),
        seconds=seconds,
        tflops=flops / seconds / 1e12,
        roofline_tflops=roofline,
        hbm_gbps=bytes_moved / seconds / 1e9,
    )


def bench_engine_speculative(
    num_layers: int = 4,
    hidden: int = 1024,
    num_q_heads: int = 8,
    num_kv_heads: int = 8,
    head_dim: int = 128,
    batch: int = 4,
    prompt_len: int = 48,
    new_tokens: int = 96,
    kv_dtype: str = "bfloat16",
    spec_k: int = 8,
    mode: str = "self-draft",  # "self-draft" | "prompt-lookup" | "off"
    model_and_params=None,  # e.g. a trained checkpoint (see config 12)
    prompts=None,  # token lists; default: random in [0, 8192)
):
    """Serving-level speculative-decoding measurement (VERDICT r4 item 5:
    the feature was implemented + correctness-tested with zero measured
    perf). Returns a dict: wall tokens/s, engine steps, decode tokens per
    step, and the acceptance rate — the last two are attachment-
    independent (wall tok/s on a relay attachment is dominated by the
    ~96 ms dispatch round-trips that speculation amortizes).

    Modes:
      * "self-draft": the draft model IS the target model — drafts match
        the target's greedy stream wherever the draft's 64-token sliding
        window sees enough context, so this measures the verify
        machinery's speedup near its acceptance ceiling (prompt_len is
        kept under the draft window for that reason).
      * "prompt-lookup": bigram prompt-lookup drafting on random prompts
        — the low-acceptance regime; measures speculation OVERHEAD when
        drafts rarely verify.
      * "off": speculation_k = 0 baseline (plain burst decode, same
        prompts/shapes).
    """
    import time

    import numpy as np

    from tpu_flash.core.config import CacheConfig, EngineConfig
    from tpu_flash.engine.runner import InferenceEngine
    from tpu_flash.models import FlashTransformer, ModelConfig

    if model_and_params is not None:
        model, params = model_and_params
    else:
        cfg = ModelConfig(
            name="bench-spec",
            vocab_size=8192,
            hidden_size=hidden,
            num_layers=num_layers,
            num_q_heads=num_q_heads,
            num_kv_heads=num_kv_heads,
            head_dim=head_dim,
            intermediate_size=2 * hidden,
            dtype="bfloat16",
        )
        model = FlashTransformer(cfg)
        params = model.init(jax.random.PRNGKey(0))
    if prompts is not None:
        prompt_len = max(len(p) for p in prompts)
        batch = len(prompts)
    ctx = prompt_len + new_tokens + spec_k + 2
    page_size = 128
    pages_per_seq = -(-ctx // page_size)
    ecfg = EngineConfig(
        max_batch_size=batch,
        max_seq_len=ctx,
        prefill_chunk=64,
        cache=CacheConfig(
            page_size=page_size,
            num_pages=batch * pages_per_seq + 8,
            max_pages_per_seq=pages_per_seq,
            kv_dtype=kv_dtype,
        ),
    )
    draft = (model, params) if mode == "self-draft" else None
    engine = InferenceEngine(model, params, ecfg, draft=draft)
    engine.speculation_k = 0 if mode == "off" else spec_k

    if prompts is None:
        host_rng = np.random.default_rng(7)
        prompts = [
            host_rng.integers(0, 8192, prompt_len).tolist()
            for _ in range(batch)
        ]

    def run_round():
        for p in prompts:
            engine.submit(list(p), max_new_tokens=new_tokens)
        return engine.run()

    run_round()  # compile warmup (all programs: prefill, verify, burst)
    engine.metrics = type(engine.metrics)()
    engine._spec_proposed = 0
    engine._spec_accepted = 0
    t0 = time.perf_counter()
    outs = run_round()
    wall = time.perf_counter() - t0
    total = sum(len(v) for v in outs.values())
    m = engine.metrics.summary()
    stats = engine.speculation_stats()
    return {
        "mode": mode,
        "tokens_per_s": total / wall,
        "wall_s": wall,
        "steps": m["steps"],
        "decode_tokens_per_step": (
            m["decode_tokens"] / m["steps"] if m["steps"] else 0.0
        ),
        "acceptance_rate": stats["acceptance_rate"],
        "proposed": stats["proposed"],
        "outputs": outs,
    }
