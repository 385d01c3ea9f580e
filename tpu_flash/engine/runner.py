"""Inference engine: continuous-batching decode over the paged KV cache.

Ties together the flagship model (models/transformer.py), the paged cache
(engine/cache.py), the native page allocator, and the scheduler
(engine/scheduler.py):

  * prefill: chunked causal forward through the flash kernel. Each chunk
    attends to the sequence's paged history (gathered dense + dequantized
    per layer, exactly what decode reads) plus itself with a static
    ``q_offset``; its K/V append (quantizing on the fly) into the
    sequence's pages. The final chunk's last-position logits emit the
    first generated token. Prompts of any length up to the cache's
    max_context stream through ``prefill_chunk``-sized steps, interleaving
    with decode of running sequences (continuous batching).
  * decode: one fused step for the whole batch — per layer: project Q/K/V
    for the current token, append K/V to pages, run the paged GQA decode
    kernel. Inactive batch slots write to a reserved trash page so the
    static-shape step never corrupts live pages.
  * Greedy sampling; per-request token buffers host-side.

Everything device-side is jitted with static shapes: prompts pad to
power-of-two buckets, decode is a single fixed-shape program.
"""

from __future__ import annotations

import functools
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpu_flash.core.config import EngineConfig
from tpu_flash.engine.cache import PagedKVCache
from tpu_flash.engine.health import (
    DeadlineFetcher,
    HealthConfig,
    HealthMonitor,
    StepTimer,
    watchdog_check,
)
from tpu_flash.engine.metrics import EngineMetrics
from tpu_flash.engine.sampling import GREEDY, SamplingParams, sample_tokens
from tpu_flash.engine.scheduler import Request, RequestState, Scheduler
from tpu_flash.models.transformer import FlashTransformer, _rms_norm


def _pow2_bucket(n: int, lo: int = 8) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


class InferenceEngine:
    def __init__(
        self,
        model: FlashTransformer,
        params,
        config: EngineConfig,
        interpret: Optional[bool] = None,
        seed: int = 0,
        mesh=None,
        draft=None,
    ):
        """``mesh``: a jax.sharding.Mesh with a "model" axis turns on
        tensor-parallel serving — params shard per parallel/train.py
        param_specs (attention heads + MLP hidden columns local, output
        projections row-sharded + psum), the KV cache shards over KV heads,
        and every prefill/decode program runs under shard_map across the
        axis. num_{q,kv}_heads must divide the axis size.

        ``draft``: an optional ``(FlashTransformer, params)`` pair — a small
        draft model for speculative decoding. When set, drafts come from
        the draft model (greedy, over a sliding context window) instead of
        prompt lookup; verification is identical either way, so outputs
        stay exact."""
        cfg = model.config
        self.model = model
        self.params = params
        # Resolve auto (None) cache-layout knobs from the serving regime
        # (kv_dtype, context, batch) — the measured policy lives in
        # utils/tuning.py::select_cache_policy so defaults track the
        # hardware A/Bs instead of one frozen workload (VERDICT r4 item 3).
        if not config.cache.resolved:
            import dataclasses as _dc

            from tpu_flash.utils.tuning import resolve_cache_config

            config = _dc.replace(
                config,
                cache=resolve_cache_config(
                    config.cache,
                    max_seq_len=config.max_seq_len,
                    max_batch_size=config.max_batch_size,
                ),
            )
        self.config = config
        self.mesh = mesh
        self._tp_axis = None
        if mesh is not None:
            if "model" not in mesh.axis_names:
                raise ValueError('engine mesh needs a "model" axis')
            n_tp = mesh.shape["model"]
            if cfg.num_q_heads % n_tp or cfg.num_kv_heads % n_tp:
                raise ValueError(
                    f"model axis ({n_tp}) must divide q heads "
                    f"({cfg.num_q_heads}) and kv heads ({cfg.num_kv_heads})"
                )
            self._tp_axis = "model"
        # Sliding-window / softcap attention options, threaded through every
        # attention dispatch site (prefill, ragged, paged sweep, decode,
        # speculative verify) so windowed models serve on all paths.
        # Per-layer windows (Gemma-style local/global alternation) ride in
        # _windows; _window stays set only when every layer shares one
        # window (it gates the window-clamped history gather, which needs
        # a uniform attention offset across layers).
        self._windows = tuple(
            cfg.layer_window(li) for li in range(cfg.num_layers)
        )
        self._window = (
            cfg.sliding_window
            if cfg.sliding_window_pattern is None
            else None
        )
        self._softcap = cfg.attn_softcap
        self.interpret = (
            interpret
            if interpret is not None
            else jax.default_backend() != "tpu"
        )
        # Page num_pages-1 is the trash page for inactive-slot writes; the
        # scheduler's allocator never hands it out.
        if config.cache.num_pages < 2:
            raise ValueError("need at least 2 pages (one is reserved)")
        self.trash_page = config.cache.num_pages - 1
        self.scheduler = Scheduler(config)
        self.scheduler.allocator = __import__(
            "tpu_flash.engine.allocator", fromlist=["PageAllocator"]
        ).PageAllocator(config.cache.num_pages - 1)
        self.prefix_index = None
        if config.prefix_cache:
            from tpu_flash.engine.prefix import PrefixIndex

            self.prefix_index = PrefixIndex(
                self.scheduler.allocator, config.cache.page_size
            )
            self.scheduler.prefix_index = self.prefix_index
        # +1 ring slot: row max_batch_size is the trash slot for tokens
        # that must not land in any live sequence's recent ring (prefill
        # padding, rejected speculative drafts).
        self.cache = PagedKVCache.create(
            cfg.num_layers, cfg.num_kv_heads, cfg.head_dim, config.cache,
            num_slots=config.max_batch_size + 1,
        )
        self.trash_slot = config.max_batch_size
        if mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            from tpu_flash.parallel.train import param_specs

            self._pspecs = param_specs(params)
            to_sharding = lambda spec: NamedSharding(mesh, spec)  # noqa: E731
            self.params = jax.device_put(
                params,
                jax.tree.map(
                    to_sharding, self._pspecs,
                    is_leaf=lambda x: isinstance(x, P),
                ),
            )
            self._cspecs = self._cache_spec_tree()
            self.cache = jax.device_put(
                self.cache,
                jax.tree.map(
                    to_sharding, self._cspecs,
                    is_leaf=lambda x: isinstance(x, P),
                ),
            )
        mb = config.max_batch_size
        pps = config.cache.max_pages_per_seq
        self.page_tables = jnp.zeros((mb, pps), jnp.int32)
        self.lengths = jnp.zeros((mb,), jnp.int32)
        self.last_tokens = jnp.zeros((mb,), jnp.int32)
        self.active = np.zeros((mb,), bool)
        # Per-slot sampling parameters (engine/sampling.py); greedy default.
        self.temps = np.zeros((mb,), np.float32)
        self.top_ks = np.zeros((mb,), np.int32)
        self.top_ps = np.ones((mb,), np.float32)
        self.min_ps = np.zeros((mb,), np.float32)
        # Per-slot additive logit bias (submit(logit_bias={token: bias})):
        # a dense [mb, vocab] device array added to the logits of every
        # sampling path; rows update only when a slot's request changes.
        self.logit_bias = jnp.zeros((mb, cfg.vocab_size), jnp.float32)
        self._slot_bias = np.zeros((mb,), bool)
        self._slot_bias_req = np.full((mb,), -1, np.int64)
        self._rng = jax.random.PRNGKey(seed)
        self._sample_fn = jax.jit(sample_tokens)
        self.outputs: Dict[int, List[int]] = {}
        self.logprobs: Dict[int, List[float]] = {}  # per emitted token
        # Parallel sampling: request id -> [id, child ids...]; survives
        # retirement so callers can map a submit() id to all completions.
        self._branch_ids: Dict[int, List[int]] = {}
        # Fork page-copy programs, keyed on the (pow2) number of pages
        # copied in one dispatch.
        self._fork_fns: Dict[int, object] = {}
        # Multi-LoRA serving (engine/lora.py): per-request adapters over
        # the base params. lora_ids mirrors the batch slots; compiled
        # program caches clear on registration (the stacks bake into the
        # executables as constants).
        from tpu_flash.engine.lora import LoRAStore

        self.lora = LoRAStore(cfg.num_layers)
        self.lora_ids = np.zeros((mb,), np.int32)
        # Preemption (optimistic admission): host-side stash of swapped-out
        # KV pages (req_id -> numpy arrays), plus the scheduler hooks that
        # execute the policy.
        self._swapped: Dict[int, dict] = {}
        self._swap_gather_fns: Dict[int, object] = {}
        self._swap_scatter_fns: Dict[int, object] = {}
        self.scheduler.preempt_hook = self._host_preempt_recompute
        self.scheduler.swap_out_hook = self._host_swap_out
        self.metrics = EngineMetrics()
        self.health_config = config.health or HealthConfig()
        self.health = HealthMonitor(self.health_config)
        self._fetcher = DeadlineFetcher(self.health_config.step_timeout_s)
        self._next_id = 0
        # Decode runs in fused bursts (lax.scan over single steps): one
        # dispatch + one fetch per burst. Cap keeps admission latency low.
        self.max_decode_burst = config.max_decode_burst
        self._decode_multi_fns: Dict[int, object] = {}
        self._prefill_fns: Dict[tuple, object] = {}
        # Ragged (mixed-stage) prefill: chunks of requests at DIFFERENT
        # prompt positions fuse into one dispatch (ops/flash/ragged.py);
        # keyed on (hist_cap, token bucket, row bucket).
        self._ragged_fns: Dict[tuple, object] = {}
        # Speculative decoding (prompt-lookup or draft-model proposals):
        # 0 disables. ALL active decode slots verify their drafts in ONE
        # batched forward over the paged cache (slots without a usable
        # draft ride along as a plain 1-token sample); accepted prefix +
        # one correction/bonus token commit per slot per step. Greedy
        # verifies by argmax; sampled requests use exact rejection
        # sampling (sampling.py speculative_sample), so the output
        # distribution matches non-speculative decoding.
        self.speculation_k = 8
        # Verification gathers each row's whole page table densely
        # (static shape); cap the TOTAL (row-bucket x table) tokens it's
        # worth that for — beyond it, burst decode.
        self.speculation_max_table_tokens = 32768
        self._verify_fns: Dict[tuple, object] = {}
        self._spec_proposed = 0
        self._spec_accepted = 0
        # Draft-model speculation: a small model greedy-generates the k
        # draft tokens in ONE jitted scan (k dense forwards over a sliding
        # window, one dispatch). Falls back to prompt lookup when unset.
        self.draft_model = draft[0] if draft is not None else None
        self.draft_params = draft[1] if draft is not None else None
        self.draft_window = 64  # context tokens the draft model sees
        self._draft_fns: Dict[tuple, object] = {}

    # -- sharding plumbing -----------------------------------------------------

    def _cache_spec_tree(self):
        """PartitionSpec pytree matching PagedKVCache: pages and scales
        shard over KV heads on the "model" axis."""
        from jax.sharding import PartitionSpec as P

        quant = self.cache.quantized
        kv_spec = P(None, "model")
        ring = self.cache.k_recent is not None
        ring_spec = P(None, None, "model")  # [L, slots, hkv, W, d]
        return PagedKVCache(
            k_pages=kv_spec,
            v_pages=kv_spec,
            k_scales=kv_spec if quant else None,
            v_scales=kv_spec if quant else None,
            page_size=self.cache.page_size,
            kv_dtype=self.cache.kv_dtype,
            k_recent=ring_spec if ring else None,
            v_recent=ring_spec if ring else None,
        )

    def _jit_impl(self, impl, in_kinds: str, out_kinds: str, donate):
        """jit an engine program; with a mesh, wrap it in shard_map first.
        Kind letters: p=params, c=cache, r=replicated."""
        if self.mesh is None:
            return jax.jit(impl, donate_argnums=donate)
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        kind = {"p": self._pspecs, "c": self._cspecs, "r": P()}
        return jax.jit(
            shard_map(
                impl,
                mesh=self.mesh,
                in_specs=tuple(kind[k] for k in in_kinds),
                out_specs=tuple(kind[k] for k in out_kinds),
                check_vma=False,
            ),
            donate_argnums=donate,
        )

    # -- client API ----------------------------------------------------------

    def submit(
        self,
        prompt: List[int],
        max_new_tokens: int,
        sampling: SamplingParams = GREEDY,
        stop_tokens: Optional[List[int]] = None,
        n: int = 1,
        priority: int = 0,
        lora: Optional[str] = None,
        logit_bias: Optional[Dict[int, float]] = None,
    ) -> int:
        """Queue a request; returns its id. ``n > 1`` asks for n parallel
        completions of the same prompt (OpenAI-style ``n``): the prompt
        prefills ONCE, then forks into n decode branches sharing the
        prompt's KV pages (branch ids via :meth:`branches`; each branch
        has its own outputs/logprobs entry). Higher ``priority`` admits
        first and is preferred as a survivor under optimistic-admission
        preemption. ``lora`` names a registered adapter
        (:meth:`register_lora`) applied to every projection for this
        request; adapted requests bypass the prefix cache (their KV is
        adapter-specific). ``logit_bias`` maps token ids to additive
        logit offsets (OpenAI convention: ~-100 bans a token, ~+100
        forces it) applied before sampling filters on every path;
        reported logprobs are of the biased distribution."""
        if n < 1:
            raise ValueError("n must be >= 1")
        if n > 1 and max_new_tokens < 1:
            raise ValueError("parallel sampling needs max_new_tokens >= 1")
        if n > self.config.max_batch_size:
            raise ValueError(
                f"n={n} exceeds max_batch_size "
                f"{self.config.max_batch_size}: the branch group needs n "
                f"batch slots at once"
            )
        # Reject work that could never fit the page pool even when idle —
        # it would wait (or, under optimistic admission, self-preempt)
        # forever. num_pages-1: one page is the reserved trash page.
        ps = self.config.cache.page_size
        total = -(-(len(prompt) + max_new_tokens) // ps)
        own = total - len(prompt) // ps
        if total + (n - 1) * own > self.config.cache.num_pages - 1:
            raise ValueError(
                "request needs more KV pages than the cache has "
                f"({total + (n - 1) * own} > "
                f"{self.config.cache.num_pages - 1})"
            )
        req_id = self._next_id
        self._next_id += 1
        req = Request(
            req_id=req_id,
            prompt_len=len(prompt),
            max_new_tokens=max_new_tokens,
            sampling=sampling,
            stop_tokens=tuple(stop_tokens or ()),
            n_branches=n,
            priority=priority,
            lora_id=self.lora.id_of(lora),
        )
        req._prompt = list(prompt)  # host-side stash
        if logit_bias:
            vocab = self.model.config.vocab_size
            for t in logit_bias:
                if not 0 <= int(t) < vocab:
                    raise ValueError(
                        f"logit_bias token {t} outside vocab [0, {vocab})"
                    )
            req._logit_bias = dict(logit_bias)
        if n > 1:
            children = []
            for _ in range(n - 1):
                cid = self._next_id
                self._next_id += 1
                ch = Request(
                    req_id=cid,
                    prompt_len=len(prompt),
                    max_new_tokens=max_new_tokens,
                    sampling=sampling,
                    stop_tokens=tuple(stop_tokens or ()),
                    parent_id=req_id,
                    priority=priority,
                    lora_id=req.lora_id,
                )
                ch._prompt = req._prompt  # branches never prefill; for
                # snapshots + introspection only
                if logit_bias:
                    ch._logit_bias = dict(logit_bias)
                children.append(ch)
                self.outputs[cid] = []
                self.logprobs[cid] = []
            req.child_ids = tuple(ch.req_id for ch in children)
            req._children_reqs = children
        self.scheduler.add_request(req)
        self.outputs[req_id] = []
        self.logprobs[req_id] = []
        self._branch_ids[req_id] = [req_id, *req.child_ids]
        return req_id

    def register_lora(self, name: str, adapters, *, alpha=None) -> int:
        """Register a LoRA adapter for per-request serving
        (``submit(lora=name)``). Compiled engine programs are rebuilt on
        the next step (the adapter stacks are program constants; under a
        TP mesh each shard slices its fan range by axis index)."""
        lora_id = self.lora.register(name, adapters, alpha=alpha)
        self._prefill_fns.clear()
        self._ragged_fns.clear()
        self._decode_multi_fns.clear()
        self._verify_fns.clear()
        return lora_id

    def _lora_hook(self, ids):
        """proj_hook(li, name, x, y) applying each row's adapter, or None
        when no adapters are registered (zero overhead)."""
        if self.lora.empty:
            return None
        stacks = self.lora.stacks()
        from tpu_flash.engine.lora import apply_lora

        tp_axis = self._tp_axis

        def hook(li, name, x, y):
            return apply_lora(stacks, li, name, x, y, ids, tp_axis)

        return hook

    def branches(self, req_id: int) -> List[int]:
        """All completion ids of a request: itself plus any parallel-
        sampling branch ids (submission order). Valid for live and
        finished requests alike."""
        return list(self._branch_ids.get(req_id, [req_id]))

    def cancel(self, req_id: int) -> bool:
        """Cancel a submitted request and its parallel-sampling branches
        (serving tier: client disconnects). Waiting requests are dropped
        immediately; active ones are marked stopped and retire on the
        next step through the scheduler's normal retirement (pages,
        slots, and prefix refcounts released there). Already-emitted
        tokens remain in ``outputs``. Returns True if anything was live
        to cancel."""
        sched = self.scheduler
        comp = set(self.branches(req_id))
        hit = False
        for cid in comp:
            req = sched.active.get(cid)
            if req is not None:
                req.stopped = True
                slot = req.batch_slot
                if slot is not None and sched.slots[slot] == cid:
                    self.active[slot] = False
                hit = True
        kept = [
            r for r in sched.waiting
            if r.req_id not in comp
            and getattr(r, "parent_id", None) != req_id
        ]
        if len(kept) != len(sched.waiting):
            sched.waiting.clear()
            sched.waiting.extend(kept)
            hit = True
        # Drop host-side swap stashes for EVERY branch of the group: a
        # swap-preempted child cancelled via its parent would otherwise
        # leak its stash forever (and snapshots serialize _swapped, so the
        # dead stash would ride along into every later snapshot).
        for cid in comp | {req_id}:
            if self._swapped.pop(cid, None) is not None:
                hit = True
        return hit

    def run(self) -> Dict[int, List[int]]:
        """Drive the engine until all requests finish."""
        while self.scheduler.has_work():
            self.step()
        return self.outputs

    def stream(self):
        """Generator driving the engine until idle, yielding
        ``(req_id, index, token)`` for every newly committed token after
        each step — tokens surface at step granularity (a fused burst or
        an accepted speculative draft yields several at once). New
        requests may be submitted between yields; iteration ends when no
        work remains."""
        emitted = {rid: len(t) for rid, t in self.outputs.items()}
        while self.scheduler.has_work():
            self.step()
            # list(): submit() between yields may grow the dict.
            for rid, toks in list(self.outputs.items()):
                start = emitted.get(rid, 0)
                for i in range(start, len(toks)):
                    yield rid, i, toks[i]
                emitted[rid] = len(toks)

    def close(self) -> None:
        """Shut down host-side resources (the deadline fetcher's worker)."""
        self._fetcher.close()

    def __del__(self):  # pragma: no cover - GC timing dependent
        try:
            self.close()
        except Exception:
            pass

    def prefix_stats(self) -> Dict[str, float]:
        """Prefix-cache observability: hit rate + retained pages."""
        if self.prefix_index is None:
            return {"enabled": 0.0}
        return {
            "enabled": 1.0,
            "hit_rate": self.prefix_index.hit_rate,
            "hits_tokens": float(self.prefix_index.hits_tokens),
            "misses_tokens": float(self.prefix_index.misses_tokens),
            "indexed_pages": float(self.prefix_index.num_indexed_pages),
        }

    # -- engine step ----------------------------------------------------------

    def step(self) -> None:
        # Most tokens one plan can commit per slot: burst decode or a
        # fully-accepted draft + bonus. The scheduler tops page capacity
        # up to this under optimistic admission.
        self.scheduler.max_step_tokens = max(
            self.max_decode_burst, self.speculation_k + 1
        )
        plan = self.scheduler.step()
        t0 = time.perf_counter()
        for rid in plan.swap_in:
            req = self.scheduler.active.get(rid)
            if req is not None and rid in self._swapped:
                self._swap_restore(req)
        for slot in plan.refresh_tables:
            rid = self.scheduler.slots[slot]
            if rid is None:
                continue
            self._install_table_row(slot, rid)
        with StepTimer(self.health):
            groups: Dict[int, list] = {}
            for chunk in plan.prefill:
                groups.setdefault(chunk.start, []).append(chunk)
            n_decoded = 0
            fuse = self.config.fused_mixed_step
            decode_live = [
                s
                for s in plan.decode_slots
                if self.active[s] and self.scheduler.slots[s] is not None
            ]
            if fuse == "auto":
                fuse = 0 < len(decode_live) <= len(plan.prefill)
            if fuse and plan.prefill and decode_live:
                # ONE dispatch for the whole step: decode slots ride the
                # ragged prefill program as length-1 rows.
                n_decoded = self._run_prefill_ragged(
                    plan.prefill, decode_slots=decode_live
                )
            else:
                if len(groups) > 1:
                    # Mixed stages: ONE ragged dispatch for every chunk
                    # this step instead of one program call per stage.
                    self._run_prefill_ragged(plan.prefill)
                else:
                    for group in groups.values():
                        self._run_prefill_group(group)
                if plan.decode_slots:
                    n_decoded = self._run_decode(plan.decode_slots)
        self.metrics.record_step(
            prefill_tokens=sum(c.length for c in plan.prefill),
            decode_tokens=n_decoded,
            step_seconds=time.perf_counter() - t0,
            batch_occupancy=self.scheduler.num_active()
            / self.config.max_batch_size,
        )

    # -- prefill ---------------------------------------------------------------

    def _paged_enabled(self, verify: bool = False) -> bool:
        """Resolve config.paged_prefill ("auto" | True | False) for a
        dispatch site. "auto" = True for every cache dtype: the in-kernel
        paged sweep measured parity-or-better vs gather+dense-flash on
        v5e for int8/int4 (BENCHLOG 2026-08-17) AND for bf16 once the
        GQA-folded tile was capped at 1024 rows (BENCHLOG 2026-08-18:
        674 vs 684 us/chunk at 8K history) — and it never materializes
        the dense (dequantized) history intermediate, nor gathers the
        whole page table per layer for speculative verify.

        "int4g32" (group-affine quality tier) always takes the gather
        path: its per-group affine dequant is not implemented in the
        paged-prefill kernel (decode IS in-kernel; prefill history
        gather measured ~parity with the paged sweep anyway)."""
        if self.config.cache.kv_dtype in ("int4g32", "k8v4"):
            return False
        mode = self.config.paged_prefill
        if mode == "auto":
            return True
        return bool(mode)

    def _gather_history(self, cache, layer: int, table_rows, hist_len: int,
                        start_page: int = 0):
        """Dense (dequantized) K/V of cached tokens
        [start_page * page_size, start_page * page_size + hist_len) of a
        batch of sequences (``table_rows`` [B, pps]) — exactly the bytes
        the decode kernel would read, materialized for the chunk's
        flash-attention call. ``hist_len`` is static (chunk starts are
        multiples of prefill_chunk), so shapes and the q_offset of the
        attention call compile once per chunk index. ``start_page`` drops
        leading pages a sliding window can never attend. Returns k/v
        [B, hkv, hist_len, d]."""
        from tpu_flash.engine.cache import side_dtypes
        from tpu_flash.ops.quant import QuantizedTensor, dequantize

        ps = self.config.cache.page_size
        n_pages = -(-hist_len // ps)
        pages = table_rows[:, start_page : start_page + n_pages]  # [B, np]
        dtype = self.model.dtype
        k_dt, v_dt = side_dtypes(cache.kv_dtype)

        def gather(pages_arr, scales_arr, side_dtype):
            # [hkv, B, np, page_rows, d] via fancy page indexing.
            vals = pages_arr[layer][:, pages]
            if side_dtype == "int4g32":
                # Group-affine scales ride with their full trailing
                # [ps, 2*ng] shape (quantize.py::dequantize_group_asym).
                scales = scales_arr[layer][:, pages]
                dense = dequantize(
                    QuantizedTensor(vals, scales, "int4g32", "tokens"),
                    dtype,
                )
            elif cache.quantized:
                packing = "tokens" if side_dtype == "int4" else "lanes"
                scales = scales_arr[layer][:, pages]  # [hkv, B, np, ps]
                dense = dequantize(
                    QuantizedTensor(
                        vals, scales[..., None], side_dtype, packing
                    ),
                    dtype,
                )
            else:
                dense = vals.astype(dtype)
            hkv, b, np_, ps_, d = dense.shape
            dense = dense.reshape(hkv, b, np_ * ps_, d)[:, :, :hist_len]
            return dense.transpose(1, 0, 2, 3)

        return (
            gather(cache.k_pages, cache.k_scales, k_dt),
            gather(cache.v_pages, cache.v_scales, v_dt),
        )

    def _chunked_prefill_impl(self, hist_len, params, cache, tokens,
                              table_rows, n_valids, lora_ids, slots):
        """One BATCH of same-stage prefill chunks: tokens [B, bucket], all
        at absolute positions [hist_len, hist_len + bucket) of their own
        sequences (same-stage = same static hist_len, so one compiled
        program serves a burst of simultaneous arrivals in one dispatch
        instead of B). Each row attends to its own paged history plus
        itself (causal, static q_offset = hist_len); each row's first
        n_valids[b] tokens' K/V append into that sequence's pages (pads go
        to the trash page). Returns (cache, per-row last-valid-position
        logits [B, vocab], finite flag).

        The layer math is the model's own ``forward`` — this path only
        supplies a kv_hook that splices history in and captures the new
        K/V for the cache append, so chunked and whole-prompt prefill can
        never diverge."""
        ps = self.config.cache.page_size
        b, bucket = tokens.shape
        rel = jnp.arange(bucket)
        positions = hist_len + rel  # shared: same stage for every row
        valid = rel[None, :] < n_valids[:, None]  # [B, bucket]
        page_ids = jnp.where(
            valid, table_rows[:, positions // ps], self.trash_page
        )
        offsets = jnp.broadcast_to(positions % ps, (b, bucket))
        cache_cell = [cache]
        li_cell = [0]
        # In-kernel paged history (each page read once) when the stage is
        # page-aligned; otherwise gather-to-dense (3x the history bytes).
        use_paged = (
            self._paged_enabled() and hist_len > 0 and hist_len % ps == 0
        )
        # Sliding window: drop whole leading pages no chunk row can attend
        # (earliest window start = hist_len - window + 1), so the gather
        # and the attention sweep scale with the window, not the history.
        # The band mask is translation-invariant, so attention runs at
        # q_offset = kept history length; rope positions stay absolute.
        drop_pages = 0
        if self._window is not None and hist_len > 0:
            drop_pages = max(0, hist_len - self._window + 1) // ps
        hist_keep = hist_len - drop_pages * ps

        ring = cache.k_recent is not None
        tok_slots = (
            jnp.where(valid, slots[:, None], self.trash_slot).reshape(-1)
            if ring else None
        )
        tok_pos = jnp.broadcast_to(positions, (b, bucket)).reshape(-1)

        def kv_hook(li, k, v):
            if hist_len and not use_paged:
                hk, hv = self._gather_history(
                    cache_cell[0], li, table_rows, hist_keep,
                    start_page=drop_pages,
                )
                k_all = jnp.concatenate([hk, k.astype(hk.dtype)], axis=2)
                v_all = jnp.concatenate([hv, v.astype(hv.dtype)], axis=2)
            else:
                k_all, v_all = k, v
            hkv, d = k.shape[1], k.shape[3]
            cache_cell[0] = cache_cell[0].append(
                li,
                k.transpose(0, 2, 1, 3).reshape(b * bucket, hkv, d),
                v.transpose(0, 2, 1, 3).reshape(b * bucket, hkv, d),
                page_ids.reshape(-1), offsets.reshape(-1),
                slots=tok_slots, positions=tok_pos,
            )
            li_cell[0] = li
            return k_all, v_all

        attention_fn = None
        if use_paged:
            from tpu_flash.ops.flash import paged_prefill_attention

            starts_b = jnp.full((b,), hist_len, jnp.int32)

            def attention_fn(q, k, v):
                # k/v here are the CHUNK's own tensors (the hook appended
                # them to the pages already; history stays paged).
                kp, vp = cache_cell[0].layer_view(li_cell[0])
                return paged_prefill_attention(
                    q, k, v, kp, vp, starts_b, table_rows,
                    hist_cap=hist_len, interpret=self.interpret,
                    window=self._windows[li_cell[0]],
                    softcap=self._softcap,
                    sinks=params["layers"][li_cell[0]].get("sinks"),
                    alibi=self.model.alibi_for(q.shape[1], self._tp_axis),
                )

        logits = self.model.forward(
            params, tokens, q_offset=hist_keep, interpret=self.interpret,
            kv_hook=kv_hook, tp_axis=self._tp_axis,
            attention_fn=attention_fn,
            positions=positions,  # absolute (rope); attention band shifts
            proj_hook=self._lora_hook(lora_ids),
        )
        last = logits[jnp.arange(b), n_valids - 1]  # [B, vocab]
        # NaN-watchdog flag: fused into the step, fetched with its results
        # (engine/health.py). Pad positions are real computations on pad
        # tokens, so the whole chunk is checked.
        finite = jnp.all(jnp.isfinite(logits))
        return cache_cell[0], last, finite

    def _run_prefill_group(self, chunks) -> None:
        """Prefill a group of SAME-STAGE chunks (equal ``start``, so equal
        static hist_len) as one batched dispatch — a burst of simultaneous
        arrivals streams through prefill together instead of one program
        call per request (the batched form of ragged prefill: rows pad to
        the group's bucket, shorter rows masked via n_valids)."""
        start = chunks[0].start
        bucket = _pow2_bucket(max(max(c.length for c in chunks), 8))
        bb = _pow2_bucket(len(chunks), lo=1)
        key = (start, bucket, bb)
        if key not in self._prefill_fns:
            self._prefill_fns[key] = self._jit_impl(
                functools.partial(self._chunked_prefill_impl, start),
                "pcrrrrr", "crr", donate=(1,),
            )
        pps = self.config.cache.max_pages_per_seq
        tok_rows, table_rs, n_valids, tables, lids = [], [], [], [], []
        slot_rows = []
        for c in chunks:
            req = self.scheduler.active[c.req_id]
            toks = req._prompt[c.start : c.start + c.length]
            tok_rows.append(toks + [0] * (bucket - c.length))
            table = self.scheduler.page_table(c.req_id)
            tables.append(table)
            table_rs.append(
                table + [self.trash_page] * (pps - len(table))
            )
            n_valids.append(c.length)
            lids.append(req.lora_id)
            slot_rows.append(
                req.batch_slot if req.batch_slot >= 0 else self.trash_slot
            )
        for _ in range(bb - len(chunks)):
            # Pad rows write only the trash page; 1 valid token keeps the
            # last-logits gather index in range.
            tok_rows.append([0] * bucket)
            table_rs.append([self.trash_page] * pps)
            n_valids.append(1)
            lids.append(0)
            slot_rows.append(self.trash_slot)
        self.cache, last_logits, finite = self._prefill_fns[key](
            self.params, self.cache,
            jnp.asarray(tok_rows, jnp.int32),
            jnp.asarray(table_rs, jnp.int32),
            jnp.asarray(n_valids, jnp.int32),
            jnp.asarray(lids, jnp.int32),
            jnp.asarray(slot_rows, jnp.int32),
        )
        if self.health_config.check_numerics:
            watchdog_check(
                self.health, self._fetcher.fetch(finite),
                phase="prefill", request_ids=[c.req_id for c in chunks],
            )
        for i, c in enumerate(chunks):
            self._finish_prefill_chunk(
                self.scheduler.active[c.req_id], c,
                jnp.asarray(table_rs[i], jnp.int32), tables[i],
                last_logits[i],
            )

    def _ragged_prefill_impl(self, hist_cap, params, cache, tokens,
                             table_rows, starts, n_valids, lora_ids,
                             slots):
        """A BATCH of prefill chunks at DIFFERENT stages in one dispatch:
        row b's tokens sit at absolute positions [starts[b],
        starts[b] + n_valids[b]) of its own sequence. Every row's history
        gathers to the static ``hist_cap`` (dead columns masked inside the
        ragged kernel via the per-row offset), the chunk's K/V append into
        the row's pages, and attention runs through
        ops/flash/ragged.flash_attention_ragged — the mixed-stage
        generalization of _chunked_prefill_impl. Same layer math: the
        model's own ``forward`` with kv_hook + attention_fn seams."""
        from tpu_flash.ops.flash import (
            flash_attention_ragged,
            paged_prefill_attention,
        )

        ps = self.config.cache.page_size
        b, bucket = tokens.shape
        rel = jnp.arange(bucket)
        positions = starts[:, None] + rel[None, :]  # [B, bucket]
        valid = rel[None, :] < n_valids[:, None]
        page_ids = jnp.where(
            valid,
            jnp.take_along_axis(table_rows, positions // ps, axis=1),
            self.trash_page,
        )
        offsets = positions % ps
        cache_cell = [cache]
        li_cell = [0]
        use_paged = self._paged_enabled() and hist_cap % ps == 0

        ring = cache.k_recent is not None
        tok_slots = (
            jnp.where(valid, slots[:, None], self.trash_slot).reshape(-1)
            if ring else None
        )
        tok_pos = positions.reshape(-1)

        def kv_hook(li, k, v):
            if use_paged:
                k_all, v_all = k, v  # history stays paged
            else:
                hk, hv = self._gather_history(
                    cache_cell[0], li, table_rows, hist_cap
                )
                k_all = jnp.concatenate([hk, k.astype(hk.dtype)], axis=2)
                v_all = jnp.concatenate([hv, v.astype(hv.dtype)], axis=2)
            hkv, d = k.shape[1], k.shape[3]
            cache_cell[0] = cache_cell[0].append(
                li,
                k.transpose(0, 2, 1, 3).reshape(b * bucket, hkv, d),
                v.transpose(0, 2, 1, 3).reshape(b * bucket, hkv, d),
                page_ids.reshape(-1), offsets.reshape(-1),
                slots=tok_slots, positions=tok_pos,
            )
            li_cell[0] = li
            return k_all, v_all

        if use_paged:

            def attention_fn(q, k, v):
                # Mixed stages in one in-kernel paged sweep: per-row
                # offsets bound each row's history read; rows whose chunk
                # K/V were just appended below their hist_cap are masked
                # by the same offsets.
                kp, vp = cache_cell[0].layer_view(li_cell[0])
                return paged_prefill_attention(
                    q, k, v, kp, vp, starts, table_rows,
                    hist_cap=hist_cap, interpret=self.interpret,
                    window=self._windows[li_cell[0]],
                    softcap=self._softcap,
                    sinks=params["layers"][li_cell[0]].get("sinks"),
                    alibi=self.model.alibi_for(q.shape[1], self._tp_axis),
                )

        else:

            def attention_fn(q, k, v):
                return flash_attention_ragged(
                    q, k, v, starts, hist_cap=hist_cap,
                    interpret=self.interpret,
                    window=self._windows[li_cell[0]],
                    softcap=self._softcap,
                    sinks=params["layers"][li_cell[0]].get("sinks"),
                    alibi=self.model.alibi_for(q.shape[1], self._tp_axis),
                )

        logits = self.model.forward(
            params, tokens, interpret=self.interpret, kv_hook=kv_hook,
            tp_axis=self._tp_axis, positions=positions,
            attention_fn=attention_fn,
            proj_hook=self._lora_hook(lora_ids),
        )
        last = logits[jnp.arange(b), n_valids - 1]  # [B, vocab]
        finite = jnp.all(jnp.isfinite(logits))
        return cache_cell[0], last, finite

    def _run_prefill_ragged(self, chunks, decode_slots=()) -> int:
        """Fuse prefill chunks at MIXED stages into one program call.

        Histories pad to the power-of-two bucket of the deepest stage
        (bounding compiled variants); each row's live-history length rides
        in as a runtime array, so one executable serves any stage mix.

        ``decode_slots`` (config.fused_mixed_step) additionally folds the
        step's decode work into the SAME dispatch: each decoding slot
        rides as a length-1 row feeding its pending token at its current
        KV position — identical append + attention semantics to the
        decode step — and its next token samples from the row's last
        logits afterwards. One dispatch per engine step instead of two;
        speculation is skipped on fused steps (it shines in pure-decode
        phases, which keep the burst/speculative path). Returns the
        number of decode tokens committed."""
        ditems = []
        for s in decode_slots:
            rid = self.scheduler.slots[s]
            req = self.scheduler.active.get(rid)
            if req is None or not self.active[s]:
                continue
            # Feed position: KV is written for all but the newest emitted
            # token (same invariant the decode step maintains).
            feed = req.prefilled + req.generated - 1
            ditems.append((req, s, feed))
        bucket = _pow2_bucket(max(max(c.length for c in chunks), 8))
        bb = _pow2_bucket(len(chunks) + len(ditems), lo=1)
        pps = self.config.cache.max_pages_per_seq
        ps = self.config.cache.page_size
        max_start = max(
            [c.start for c in chunks] + [it[2] for it in ditems]
        )
        hist_cap = min(
            _pow2_bucket(max_start,
                         lo=max(self.config.prefill_chunk, 8)),
            pps * ps,
        )
        key = (hist_cap, bucket, bb)
        if key not in self._ragged_fns:
            self._ragged_fns[key] = self._jit_impl(
                functools.partial(self._ragged_prefill_impl, hist_cap),
                "pcrrrrrr", "crr", donate=(1,),
            )
        tok_rows, table_rs, starts, n_valids, tables = [], [], [], [], []
        lids, slot_rows = [], []
        for c in chunks:
            req = self.scheduler.active[c.req_id]
            toks = req._prompt[c.start : c.start + c.length]
            tok_rows.append(toks + [0] * (bucket - c.length))
            table = self.scheduler.page_table(c.req_id)
            tables.append(table)
            table_rs.append(table + [self.trash_page] * (pps - len(table)))
            starts.append(c.start)
            n_valids.append(c.length)
            lids.append(req.lora_id)
            slot_rows.append(
                req.batch_slot if req.batch_slot >= 0 else self.trash_slot
            )
        for req, _s, feed in ditems:
            tok_rows.append(
                [self.outputs[req.req_id][-1]] + [0] * (bucket - 1)
            )
            table = self.scheduler.page_table(req.req_id)
            table_rs.append(table + [self.trash_page] * (pps - len(table)))
            starts.append(feed)
            n_valids.append(1)
            lids.append(req.lora_id)
            slot_rows.append(_s)
        for _ in range(bb - len(chunks) - len(ditems)):
            tok_rows.append([0] * bucket)
            table_rs.append([self.trash_page] * pps)
            starts.append(0)
            n_valids.append(1)
            lids.append(0)
            slot_rows.append(self.trash_slot)
        self.cache, last_logits, finite = self._ragged_fns[key](
            self.params, self.cache,
            jnp.asarray(tok_rows, jnp.int32),
            jnp.asarray(table_rs, jnp.int32),
            jnp.asarray(starts, jnp.int32),
            jnp.asarray(n_valids, jnp.int32),
            jnp.asarray(lids, jnp.int32),
            jnp.asarray(slot_rows, jnp.int32),
        )
        if self.health_config.check_numerics:
            watchdog_check(
                self.health, self._fetcher.fetch(finite),
                phase="prefill",
                request_ids=[c.req_id for c in chunks]
                + [it[0].req_id for it in ditems],
            )
        for i, c in enumerate(chunks):
            self._finish_prefill_chunk(
                self.scheduler.active[c.req_id], c,
                jnp.asarray(table_rs[i], jnp.int32), tables[i],
                last_logits[i],
            )
        if not ditems:
            return 0
        # Commit the fused decode rows: one batched sample with per-row
        # parameters, then the same per-slot bookkeeping as the decode
        # step.
        dlog = last_logits[len(chunks) : len(chunks) + len(ditems)]
        dslots = [it[1] for it in ditems]
        if any(self._slot_bias[ds] for ds in dslots):
            dlog = dlog + self.logit_bias[jnp.asarray(dslots, jnp.int32)]
        self._rng, sk = jax.random.split(self._rng)
        toks_dev = self._sample_fn(
            dlog, sk,
            jnp.asarray(
                [it[0].sampling.temperature for it in ditems], jnp.float32
            ),
            jnp.asarray(
                [it[0].sampling.top_k for it in ditems], jnp.int32
            ),
            jnp.asarray(
                [it[0].sampling.top_p for it in ditems], jnp.float32
            ),
            jnp.asarray(
                [it[0].sampling.min_p for it in ditems], jnp.float32
            ),
        )
        toks = self._fetcher.fetch(toks_dev)
        logps = self._fetcher.fetch(
            jnp.take_along_axis(
                jax.nn.log_softmax(dlog, axis=-1), toks_dev[:, None],
                axis=-1,
            )[:, 0]
        )
        nd = 0
        for i, (req, s, feed) in enumerate(ditems):
            tok = int(toks[i])
            self.outputs[req.req_id].append(tok)
            self.logprobs[req.req_id].append(float(logps[i]))
            self.last_tokens = self.last_tokens.at[s].set(tok)
            self.lengths = self.lengths.at[s].set(feed + 1)
            self.scheduler.report_decoded(req.req_id)
            if tok in req.stop_tokens:
                req.stopped = True
            if req.done:
                self.active[s] = False
            nd += 1
        return nd

    def _finish_prefill_chunk(self, req: Request, chunk, table_row, table,
                              last_logits) -> None:
        """Host-side per-request bookkeeping after a prefill dispatch."""
        prompt = req._prompt
        slot = req.batch_slot
        new_len = chunk.start + chunk.length
        self.page_tables = self.page_tables.at[slot].set(table_row)
        self.lengths = self.lengths.at[slot].set(new_len)
        sp = req.sampling
        self.temps[slot] = sp.temperature
        self.top_ks[slot] = sp.top_k
        self.top_ps[slot] = sp.top_p
        self.min_ps[slot] = sp.min_p
        self.lora_ids[slot] = req.lora_id
        self._install_logit_bias(slot, req)
        # Index the prompt's full pages written SO FAR for prefix reuse —
        # incremental (per chunk, not just at completion), so a request
        # arriving while a long same-prefix prompt is mid-prefill already
        # shares its finished pages. Pages are immutable once fully
        # written; decode appends go past them. Adapter-specific KV
        # (LoRA) never registers: base-model requests must not alias it.
        if self.prefix_index is not None and not req.lora_id:
            self.prefix_index.register(prompt[:new_len], table)
        if new_len >= req.prompt_len:
            if req.resume_token is not None:
                # Preempted-and-recomputed sequence: the prompt now holds
                # everything whose KV was re-prefilled; decode resumes by
                # feeding the already-emitted newest token (re-sampling it
                # would fork the stream the client already saw).
                self.last_tokens = self.last_tokens.at[slot].set(
                    req.resume_token
                )
                self.active[slot] = True
                req.resume_token = None
                return
            # Final chunk: its last-position logits emit the first token,
            # sampled with the request's parameters.
            if self._slot_bias[slot]:
                last_logits = last_logits + self.logit_bias[slot]
            self._rng, sk = jax.random.split(self._rng)
            next_token = int(
                self._fetcher.fetch(
                    self._sample_fn(
                        last_logits[None], sk,
                        jnp.asarray([sp.temperature], jnp.float32),
                        jnp.asarray([sp.top_k], jnp.int32),
                        jnp.asarray([sp.top_p], jnp.float32),
                        jnp.asarray([sp.min_p], jnp.float32),
                    )[0]
                )
            )
            self.last_tokens = self.last_tokens.at[slot].set(next_token)
            self.active[slot] = True
            self.outputs[req.req_id].append(next_token)
            self.logprobs[req.req_id].append(
                float(
                    self._fetcher.fetch(
                        jax.nn.log_softmax(last_logits)[next_token]
                    )
                )
            )
            self.scheduler.report_decoded(req.req_id)
            if next_token in req.stop_tokens:
                req.stopped = True  # stop token included, then end
                self.active[slot] = False
            if req.child_ids:
                self._fork_branches(req, table, last_logits)

    # -- preemption (optimistic admission) ----------------------------------------

    def _install_logit_bias(self, slot: int, req: Request) -> None:
        bias = getattr(req, "_logit_bias", None)
        if bias:
            if self._slot_bias_req[slot] == req.req_id:
                return  # already installed (prefill runs this per chunk)
            row = np.zeros(
                (self.model.config.vocab_size,), np.float32
            )
            for t, v in bias.items():
                row[int(t)] = float(v)
            self.logit_bias = self.logit_bias.at[slot].set(
                jnp.asarray(row)
            )
            self._slot_bias[slot] = True
            self._slot_bias_req[slot] = req.req_id
        elif self._slot_bias[slot]:
            self.logit_bias = self.logit_bias.at[slot].set(0.0)
            self._slot_bias[slot] = False
            self._slot_bias_req[slot] = -1

    def _install_table_row(self, slot: int, rid: int) -> None:
        pps = self.config.cache.max_pages_per_seq
        table = self.scheduler.page_table(rid)
        row = table + [self.trash_page] * (pps - len(table))
        self.page_tables = self.page_tables.at[slot].set(
            jnp.asarray(row, jnp.int32)
        )

    def _host_preempt_recompute(self, req: Request) -> None:
        """Scheduler hook (preemption="recompute"): fold the generated
        tokens into the prompt so re-admission re-prefills them, and mark
        the newest token — already emitted, never re-sampled — as the
        decode resume point. Budget accounting moves with the fold:
        generated resets to 1 (the resume token), max_new_tokens drops by
        the folded count, so remaining budget and the done-check are
        unchanged."""
        if req.batch_slot >= 0:
            self.active[req.batch_slot] = False
        outs = self.outputs.get(req.req_id, [])
        g = req.generated
        if g > 0 and outs:
            # Written KV covers prompt + all but the newest emitted token.
            req._prompt = list(req._prompt) + outs[len(outs) - g : -1]
            req.prompt_len = len(req._prompt)
            req.resume_token = outs[-1]
            req.max_new_tokens -= g - 1
            req.generated = 1
        req.swap_npages = 0

    def _swap_gather_impl(self, cache, idx):
        out = [cache.k_pages[:, :, idx], cache.v_pages[:, :, idx]]
        if cache.quantized:
            out += [cache.k_scales[:, :, idx], cache.v_scales[:, :, idx]]
        return tuple(out)

    def _swap_scatter_impl(self, cache, idx, k, v, ks=None, vs=None):
        import dataclasses as _dc

        k_pages = cache.k_pages.at[:, :, idx].set(k)
        v_pages = cache.v_pages.at[:, :, idx].set(v)
        k_scales, v_scales = cache.k_scales, cache.v_scales
        if cache.quantized:
            k_scales = k_scales.at[:, :, idx].set(ks)
            v_scales = v_scales.at[:, :, idx].set(vs)
        return _dc.replace(
            cache, k_pages=k_pages, v_pages=v_pages,
            k_scales=k_scales, v_scales=v_scales,
        )

    def _host_swap_out(self, req: Request, pages: List[int]) -> None:
        """Scheduler hook (preemption="swap"): stash the sequence's KV
        pages host-side before its device pages are released. A victim
        preempted again before its restore keeps the original stash."""
        if req.batch_slot >= 0:
            self.active[req.batch_slot] = False
        rid = req.req_id
        if rid in self._swapped or not pages:
            return
        m = _pow2_bucket(len(pages), lo=1)
        idx = jnp.asarray(
            pages + [self.trash_page] * (m - len(pages)), jnp.int32
        )
        if m not in self._swap_gather_fns:
            # Plain jit (no shard_map): a pure page-axis gather keeps the
            # cache's existing shardings; np.asarray is the D2H fetch.
            self._swap_gather_fns[m] = jax.jit(self._swap_gather_impl)
        data = self._swap_gather_fns[m](self.cache, idx)
        self._swapped[rid] = {
            "n": len(pages),
            "arrays": [np.asarray(a) for a in data],
        }
        if self.cache.k_recent is not None and req.batch_slot >= 0:
            self._swapped[rid]["recent"] = (
                np.asarray(self.cache.k_recent[:, req.batch_slot]),
                np.asarray(self.cache.v_recent[:, req.batch_slot]),
            )

    def _swap_restore(self, req: Request) -> None:
        """Write a swapped-out sequence's KV back into its newly-allocated
        pages and reinstate its decode slot state."""
        rid = req.req_id
        stash = self._swapped.pop(rid)
        pages = self.scheduler.page_table(rid)[: stash["n"]]
        m = _pow2_bucket(stash["n"], lo=1)
        idx = jnp.asarray(
            pages + [self.trash_page] * (m - len(pages)), jnp.int32
        )
        arrays = [jnp.asarray(a) for a in stash["arrays"]]
        if m not in self._swap_scatter_fns:
            self._swap_scatter_fns[m] = jax.jit(
                self._swap_scatter_impl, donate_argnums=(0,)
            )
        self.cache = self._swap_scatter_fns[m](self.cache, idx, *arrays)
        slot = req.batch_slot
        if "recent" in stash and self.cache.k_recent is not None \
                and slot >= 0:
            kr, vr = stash["recent"]
            import dataclasses as _dc

            self.cache = _dc.replace(
                self.cache,
                k_recent=self.cache.k_recent.at[:, slot].set(
                    jnp.asarray(kr)
                ),
                v_recent=self.cache.v_recent.at[:, slot].set(
                    jnp.asarray(vr)
                ),
            )
        self._install_table_row(slot, rid)
        sp = req.sampling
        self.temps[slot] = sp.temperature
        self.top_ks[slot] = sp.top_k
        self.top_ps[slot] = sp.top_p
        self.min_ps[slot] = sp.min_p
        self.lora_ids[slot] = req.lora_id
        self._install_logit_bias(slot, req)
        if req.generated > 0:
            # Mid-decode victim: KV exists for all but the newest emitted
            # token; decode resumes by feeding that token at its position.
            self.lengths = self.lengths.at[slot].set(
                req.prefilled + req.generated - 1
            )
            self.last_tokens = self.last_tokens.at[slot].set(
                self.outputs[rid][-1]
            )
            self.active[slot] = True
        req.swap_npages = 0

    # -- parallel sampling (n>1 branches per prompt) -----------------------------

    def _fork_copy_impl(self, cache, src, dst):
        """Copy whole KV pages ``src[i] -> dst[i]`` across every layer and
        head (pure update). Fork-time COW: branches share the prompt's
        full pages read-only; only the partial tail page — which decode
        appends into — is duplicated per branch."""
        k_pages = cache.k_pages.at[:, :, dst].set(cache.k_pages[:, :, src])
        v_pages = cache.v_pages.at[:, :, dst].set(cache.v_pages[:, :, src])
        k_scales, v_scales = cache.k_scales, cache.v_scales
        if cache.quantized:
            k_scales = k_scales.at[:, :, dst].set(k_scales[:, :, src])
            v_scales = v_scales.at[:, :, dst].set(v_scales[:, :, src])
        import dataclasses as _dc

        return (
            _dc.replace(
                cache,
                k_pages=k_pages,
                v_pages=v_pages,
                k_scales=k_scales,
                v_scales=v_scales,
            ),
        )

    def _fork_branches(self, req: Request, table, last_logits) -> None:
        """Turn the parent's FORK_WAIT children into RUNNING decode
        branches: copy the prompt's partial tail page into each child's
        own page, sample each child's first token from the parent's final
        prefill logits, and install per-slot decode state. Children then
        decode as ordinary independent sequences."""
        sched = self.scheduler
        children = [
            sched.active[cid]
            for cid in req.child_ids
            if cid in sched.active
            and sched.active[cid].state is RequestState.FORK_WAIT
        ]
        if not children:
            return
        ps = self.config.cache.page_size
        pps = self.config.cache.max_pages_per_seq
        shared_n = req.prompt_len // ps
        if req.prompt_len % ps:
            src_page = table[shared_n]
            src, dst = [], []
            for ch in children:
                src.append(src_page)
                dst.append(sched.page_table(ch.req_id)[shared_n])
            m = _pow2_bucket(len(src), lo=1)
            src += [self.trash_page] * (m - len(src))
            dst += [self.trash_page] * (m - len(dst))
            if m not in self._fork_fns:
                self._fork_fns[m] = self._jit_impl(
                    self._fork_copy_impl, "crr", "c", donate=(0,)
                )
            (self.cache,) = self._fork_fns[m](
                self.cache,
                jnp.asarray(src, jnp.int32),
                jnp.asarray(dst, jnp.int32),
            )
        if self.cache.k_recent is not None and req.batch_slot >= 0:
            # Branches inherit the parent's exact-tail ring (the prompt's
            # last recent_window tokens) along with its pages.
            self.cache = self.cache.copy_recent(
                req.batch_slot, [ch.batch_slot for ch in children]
            )
        # One batched draw: n independent samples from the same logits
        # (categorical draws rows iid), same sampling params as the parent.
        sp = req.sampling
        nch = len(children)
        self._rng, sk = jax.random.split(self._rng)
        # last_logits arrive ALREADY biased (the caller applies the
        # parent's logit_bias before its own sample and passes them on).
        logits_n = jnp.broadcast_to(
            last_logits, (nch,) + last_logits.shape
        )
        toks_dev = self._sample_fn(
            logits_n, sk,
            jnp.full((nch,), sp.temperature, jnp.float32),
            jnp.full((nch,), sp.top_k, jnp.int32),
            jnp.full((nch,), sp.top_p, jnp.float32),
            jnp.full((nch,), sp.min_p, jnp.float32),
        )
        toks = self._fetcher.fetch(toks_dev)
        lps = self._fetcher.fetch(
            jnp.take(jax.nn.log_softmax(last_logits), toks_dev)
        )
        for i, ch in enumerate(children):
            slot = ch.batch_slot
            ctable = sched.page_table(ch.req_id)
            row = ctable + [self.trash_page] * (pps - len(ctable))
            self.page_tables = self.page_tables.at[slot].set(
                jnp.asarray(row, jnp.int32)
            )
            self.lengths = self.lengths.at[slot].set(req.prompt_len)
            tok = int(toks[i])
            self.last_tokens = self.last_tokens.at[slot].set(tok)
            self.temps[slot] = sp.temperature
            self.top_ks[slot] = sp.top_k
            self.top_ps[slot] = sp.top_p
            self.min_ps[slot] = sp.min_p
            self.lora_ids[slot] = ch.lora_id
            self._install_logit_bias(slot, ch)
            self.active[slot] = True
            ch.state = RequestState.RUNNING
            ch.prefilled = req.prompt_len
            self.outputs[ch.req_id].append(tok)
            self.logprobs[ch.req_id].append(float(lps[i]))
            sched.report_decoded(ch.req_id)
            if tok in ch.stop_tokens:
                ch.stopped = True
                self.active[slot] = False
        # The group is live: a later preemption of the parent must not
        # re-admit the (now independent) branches as pending children.
        req._children_reqs = []

    # -- decode ------------------------------------------------------------------

    def _decode_step_impl(self, params, cache, tokens, lengths, page_tables,
                          active_mask, key, temps, top_ks, top_ps,
                          min_ps, lora_ids, logit_bias):
        """One decode token for every batch slot (inactive slots write to
        the trash page and their outputs are ignored)."""
        model = self.model
        cfg = model.config
        ps = self.config.cache.page_size
        positions = lengths  # new token position == current length
        hook = self._lora_hook(lora_ids)
        x = params["embed"][tokens].astype(model.dtype)  # [mb, hidden]

        page_ids = jnp.where(
            active_mask,
            jnp.take_along_axis(
                page_tables, (positions // ps)[:, None], axis=1
            )[:, 0],
            self.trash_page,
        )
        offsets = positions % ps
        attn_lengths = jnp.maximum(jnp.where(active_mask, lengths + 1, 1), 1)

        mb = tokens.shape[0]
        slot_ids = jnp.arange(mb, dtype=jnp.int32)  # decode row == slot
        ring = cache.k_recent is not None
        for li, layer in enumerate(params["layers"]):
            xn = _rms_norm(x, layer["attn_norm"], cfg.rms_eps)
            q, k_new, v_new = model.decode_qkv(
                params, li, xn, positions, proj_hook=hook
            )
            cache = cache.append(
                li, k_new, v_new, page_ids, offsets,
                slots=slot_ids if ring else None, positions=positions,
            )
            k_view, v_view = cache.layer_view(li)
            from tpu_flash.ops.decode import paged_attention

            # Exact recent-window tail (KIVI-style): quantized caches with
            # a ring attend pages for [0, max(L - W, 1)) and the ring for
            # the rest as a final in-kernel block (one dispatch, shared
            # softmax state) — generation stops feeding 4-bit noise back
            # through the newest (highest-attention) tokens. Sliding-
            # window layers keep the plain path (ring rows fall outside
            # the kernel's window bookkeeping).
            use_tail = ring and self._windows[li] is None
            attn = paged_attention(
                q, k_view, v_view, attn_lengths, page_tables,
                interpret=self.interpret,
                window=None if use_tail else self._windows[li],
                softcap=cfg.attn_softcap, sinks=layer.get("sinks"),
                alibi=model.alibi_for(q.shape[1], self._tp_axis),
                recent_k=cache.k_recent[li, :mb] if use_tail else None,
                recent_v=cache.v_recent[li, :mb] if use_tail else None,
            )  # [mb, hq, d]
            attn = attn.reshape(x.shape[0], -1)
            proj = attn @ layer["wo"]
            if hook is not None:
                proj = hook(li, "wo", attn, proj)
            if self._tp_axis is not None:
                proj = jax.lax.psum(proj, self._tp_axis)
            x = x + proj
            xn = _rms_norm(x, layer["mlp_norm"], cfg.rms_eps)
            x = x + model._mlp(layer, xn, self._tp_axis, li, hook)
        x = _rms_norm(x, params["final_norm"], cfg.rms_eps)
        logits = (x @ params["lm_head"]).astype(jnp.float32) + logit_bias
        sampled = sample_tokens(logits, key, temps, top_ks, top_ps,
                                min_ps)
        # Inactive slots keep their current token: the returned array is the
        # next step's feedback AND the engine's last_tokens state, so writing
        # an inactive slot's (trash-page) sample would corrupt a sequence
        # that resumes decoding later.
        next_tokens = jnp.where(active_mask, sampled, tokens)
        logps = jnp.take_along_axis(
            jax.nn.log_softmax(logits, axis=-1),
            next_tokens[:, None], axis=-1,
        )[:, 0]
        new_lengths = jnp.where(active_mask, lengths + 1, lengths)
        # NaN watchdog over ACTIVE slots only (inactive slots attend to the
        # trash page and may legitimately produce garbage).
        finite = jnp.all(
            jnp.where(
                active_mask[:, None], jnp.isfinite(logits), True
            )
        )
        return cache, next_tokens, new_lengths, finite, logps

    def _decode_multi_impl(self, n_steps, params, cache, tokens, lengths,
                           page_tables, active_mask, keys, temps, top_ks,
                           top_ps, min_ps, lora_ids, logit_bias):
        """``n_steps`` fused decode steps via lax.scan — ONE dispatch and
        ONE host fetch for the whole burst. Amortizes per-call dispatch
        latency (dominant on remote/relay execution paths); safe because
        the burst size is capped at the minimum remaining budget of the
        active requests, so no request can overshoot mid-burst."""

        def body(carry, key):
            cache, tokens, lengths = carry
            cache, next_tokens, lengths, finite, logps = (
                self._decode_step_impl(
                    params, cache, tokens, lengths, page_tables,
                    active_mask, key, temps, top_ks, top_ps, min_ps,
                    lora_ids, logit_bias,
                )
            )
            return (cache, next_tokens, lengths), (
                next_tokens, finite, logps,
            )

        (cache, tokens, lengths), (all_tokens, all_finite, all_logps) = (
            jax.lax.scan(
                body, (cache, tokens, lengths), keys, length=n_steps
            )
        )
        return (
            cache, tokens, lengths, all_tokens, jnp.all(all_finite),
            all_logps,
        )

    # -- speculative decoding ----------------------------------------------------

    @staticmethod
    def _find_draft(context: List[int], k: int, ngram: int = 2) -> List[int]:
        """Prompt-lookup drafting: find the latest earlier occurrence of the
        context's final n-gram and propose the tokens that followed it."""
        if len(context) < ngram + 1 or k < 1:
            return []
        key = tuple(context[-ngram:])
        for i in range(len(context) - ngram - 1, -1, -1):
            if tuple(context[i : i + ngram]) == key:
                return list(context[i + ngram : i + ngram + k])
        return []

    def _draft_impl(self, k, params_d, windows, lengths):
        """Greedy-generate ``k`` draft tokens per row with the draft model
        in ONE jitted scan over a batch of context windows. ``windows``
        [B, W] holds each row's last ``lengths[b]`` context tokens
        left-aligned (right-padded); each step runs a dense causal forward
        over the [B, W + k] buffer and appends each row's argmax at its
        own frontier. Window-relative positions: the draft is a
        sliding-window policy — only acceptance rate depends on it, never
        output correctness. Returns drafts [B, k]."""
        b = windows.shape[0]
        buf0 = jnp.concatenate(
            [windows, jnp.zeros((b, k), jnp.int32)], axis=1
        )

        def body(carry, _):
            buf, pos = carry  # pos [B]: index of each row's next slot
            logits = self.draft_model.forward(
                params_d, buf, interpret=self.interpret
            )
            preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            nxt = jnp.take_along_axis(
                preds, (pos - 1)[:, None], axis=1
            )[:, 0]
            buf = buf.at[jnp.arange(b), pos].set(nxt)
            return (buf, pos + 1), nxt

        (_, _), drafts = jax.lax.scan(
            body, (buf0, lengths), None, length=k
        )
        return drafts.T  # [B, k]

    def _propose_drafts(
        self, contexts: List[List[int]], k: int
    ) -> List[List[int]]:
        """Draft up to k tokens per context: from the draft model when
        configured (ONE batched dispatch for all rows), else host-side
        prompt lookup. Both are deterministic proposals, verified by the
        same exact rejection-sampling sweep."""
        if self.draft_model is None:
            return [self._find_draft(c, k) for c in contexts]
        w = self.draft_window
        bb = _pow2_bucket(len(contexts), lo=1)
        rows, lens = [], []
        for c in contexts:
            tail = c[-w:]
            rows.append(tail + [0] * (w - len(tail)))
            lens.append(len(tail))
        for _ in range(bb - len(contexts)):
            rows.append([0] * w)
            lens.append(1)
        key = (k, w, bb)
        if key not in self._draft_fns:
            self._draft_fns[key] = jax.jit(
                functools.partial(self._draft_impl, k)
            )
        drafts = self._fetcher.fetch(
            self._draft_fns[key](
                self.draft_params,
                jnp.asarray(rows, jnp.int32),
                jnp.asarray(lens, jnp.int32),
            )
        )
        return [
            [int(t) for t in drafts[i]] for i in range(len(contexts))
        ]

    def _propose_draft(self, context: List[int], k: int) -> List[int]:
        return self._propose_drafts([context], k)[0]

    def _verify_impl(self, n_tok, params, cache, tokens, lengths_b,
                     table_rows, key, temps, top_ks, top_ps, draft_lens,
                     min_ps, lora_ids, logit_bias, slots):
        """Verify a BATCH of [last_token, draft...] rows ([B, n_tok]) in
        one forward over the paged cache at per-row dynamic offsets
        ``lengths_b``, then run exact speculative rejection sampling
        on-device per row (engine/sampling.py ``speculative_sample`` —
        greedy rows flow through the same one-hot math deterministically;
        rows with draft_len 0 just sample their next token). Appends every
        row's n_tok tokens' KV (rejected drafts' entries are masked by
        lengths and overwritten when their positions are legitimately
        reached). Returns (cache, emit [B, n_tok], n_emit [B],
        logps [B, n_tok], finite)."""
        from tpu_flash.ops.flash import paged_prefill_attention

        ps = self.config.cache.page_size
        pps = self.config.cache.max_pages_per_seq
        hist_full = pps * ps
        b = tokens.shape[0]
        positions = lengths_b[:, None] + jnp.arange(n_tok)[None]
        # Positions past the reserved pages land on trash (table padding).
        page_ids = jnp.take_along_axis(table_rows, positions // ps, axis=1)
        offsets = positions % ps
        cache_cell = [cache]
        li_cell = [0]
        # The draft rows are a tiny "prefill chunk" at per-row dynamic
        # offsets — exactly the paged-prefill kernel's contract. It reads
        # each row's live history pages once (skipping trash/padding rows,
        # offs = 0) instead of gathering the WHOLE table densely and
        # attending it with a head-replicated f32 einsum.
        use_paged = self._paged_enabled(verify=True)

        kv_stash = {}

        def kv_hook(li, k, v):
            hkv, d = k.shape[1], k.shape[3]
            kn = k.transpose(0, 2, 1, 3).reshape(b * n_tok, hkv, d)
            vn = v.transpose(0, 2, 1, 3).reshape(b * n_tok, hkv, d)
            # Pages take every draft row now (rejected entries are masked
            # by lengths and later overwritten); the recent ring must NOT
            # — acceptance is unknown until the rejection sampler runs, so
            # the ring write happens after it (see the heal below).
            cache_cell[0] = cache_cell[0].append(
                li, kn, vn, page_ids.reshape(-1), offsets.reshape(-1),
            )
            if cache_cell[0].k_recent is not None:
                kv_stash[li] = (kn, vn)
            li_cell[0] = li
            if use_paged:
                return k, v  # history stays paged
            # Whole-table dense gather (static shape); the dynamic-length
            # mask lives in attention_fn.
            return self._gather_history(
                cache_cell[0], li, table_rows, hist_full
            )

        if use_paged:

            def attention_fn(q, k, v):
                # k/v are the draft rows' own K/V (already appended to the
                # pages above; the offs mask keeps them out of the history
                # sweep — they're attended via the dense chunk input).
                kp, vp = cache_cell[0].layer_view(li_cell[0])
                return paged_prefill_attention(
                    q, k, v, kp, vp, lengths_b, table_rows,
                    hist_cap=hist_full, interpret=self.interpret,
                    window=self._windows[li_cell[0]],
                    softcap=self._softcap,
                    sinks=params["layers"][li_cell[0]].get("sinks"),
                    alibi=self.model.alibi_for(q.shape[1], self._tp_axis),
                )

        else:

            def attention_fn(q, k, v):
                # Exact attention with the per-row dynamic-offset causal
                # mask. q [B,hq,n_tok,d]; k/v [B,hkv,hist_full,d]. Compute
                # is O(B * n_tok * ctx) — decode-class, negligible; the
                # HBM sweep is the point (n_tok tokens verified per pass
                # over the KV).
                rep = q.shape[1] // k.shape[1]
                kf = jnp.repeat(k.astype(jnp.float32), rep, axis=1)
                vf = jnp.repeat(v.astype(jnp.float32), rep, axis=1)
                scale = self.model.config.head_dim**-0.5
                s_ = (
                    jnp.einsum(
                        "bhqd,bhkd->bhqk", q.astype(jnp.float32), kf
                    )
                    * scale
                )
                if self._softcap is not None:
                    s_ = self._softcap * jnp.tanh(s_ / self._softcap)
                key_pos = jnp.arange(hist_full)[None, None, None, :]
                allow = key_pos <= positions[:, None, :, None]
                win_l = self._windows[li_cell[0]]
                if win_l is not None:
                    allow = jnp.logical_and(
                        allow,
                        key_pos > positions[:, None, :, None] - win_l,
                    )
                al_ = self.model.alibi_for(q.shape[1], self._tp_axis)
                if al_ is not None:
                    s_ = s_ + al_[None, :, None, None] * (
                        key_pos - positions[:, None, :, None]
                    ).astype(jnp.float32)
                s_ = jnp.where(allow, s_, -1e30)
                sinks_l = params["layers"][li_cell[0]].get("sinks")
                if sinks_l is not None:
                    sink_col = jnp.broadcast_to(
                        sinks_l.astype(jnp.float32)[None, :, None, None],
                        (*s_.shape[:3], 1),
                    )
                    full_ = jnp.concatenate([s_, sink_col], axis=-1)
                    w = jax.nn.softmax(full_, axis=-1)[..., :-1]
                else:
                    w = jax.nn.softmax(s_, axis=-1)
                return jnp.einsum("bhqk,bhkd->bhqd", w, vf).astype(q.dtype)

        logits = self.model.forward(
            params, tokens, interpret=self.interpret, kv_hook=kv_hook,
            tp_axis=self._tp_axis, positions=positions,
            attention_fn=attention_fn,
            proj_hook=self._lora_hook(lora_ids),
        )  # [B, n_tok, vocab]
        logits = logits + logit_bias[:, None, :]
        from tpu_flash.engine.sampling import speculative_sample

        keys = jax.random.split(key, b)
        emit, n_emit = jax.vmap(
            lambda lg, dr, ky, t, tk, tp_, dl, mp: speculative_sample(
                lg.astype(jnp.float32), dr, ky, t, tk, tp_, dl, min_p=mp
            )
        )(
            logits, tokens[:, 1:], keys, temps, top_ks, top_ps, draft_lens,
            min_ps,
        )
        # Reported logprobs are the raw model distribution's (pre-filter),
        # matching the burst-decode path's convention.
        logps = jnp.take_along_axis(
            jax.nn.log_softmax(logits, axis=-1), emit[..., None], axis=-1
        )[..., 0]
        finite = jnp.all(jnp.isfinite(logits))
        if kv_stash:
            # Ring heal: this round fills positions [L, L + n_emit) with
            # correct K/V (row = [last_token, accepted drafts...]); route
            # those offsets to the row's slot, the rest to the trash slot
            # so rejected drafts never shadow live ring rows.
            accept = jnp.arange(n_tok)[None, :] < n_emit[:, None]
            wslots = jnp.where(
                accept, slots[:, None], self.trash_slot
            ).reshape(-1)
            wpos = positions.reshape(-1)
            for li, (kn, vn) in kv_stash.items():
                cache_cell[0] = cache_cell[0].write_recent(
                    li, kn, vn, wslots, wpos
                )
        return cache_cell[0], emit, n_emit, finite, logps

    def _run_speculative(self, items) -> int:
        """Verify every item's draft in ONE batched sweep.

        ``items``: list of (req, slot, draft) — all active decode slots;
        items with an empty draft ride along (draft_len 0 = one plain
        sampled/greedy token through the same program). Rows bucket to a
        power of two so compiled variants stay bounded at
        (n_tok, row-bucket)."""
        max_k = max(len(d) for _, _, d in items)
        n_tok = 1 + max_k
        bb = _pow2_bucket(len(items), lo=1)
        fn_key = (n_tok, bb)
        if fn_key not in self._verify_fns:
            self._verify_fns[fn_key] = self._jit_impl(
                functools.partial(self._verify_impl, n_tok),
                "pcrrrrrrrrrrrr", "crrrr", donate=(1,),
            )
        pps = self.config.cache.max_pages_per_seq
        tok_rows, dlens, temps, tks, tps, mps = [], [], [], [], [], []
        vlids = []
        slots = [slot for _, slot, _ in items]
        for req, slot, draft in items:
            last = (self.outputs[req.req_id] or req._prompt)[-1]
            tok_rows.append([last] + draft + [0] * (max_k - len(draft)))
            dlens.append(len(draft))
            sp = req.sampling
            temps.append(sp.temperature)
            tks.append(sp.top_k)
            tps.append(sp.top_p)
            mps.append(sp.min_p)
            vlids.append(req.lora_id)
        n_pad = bb - len(items)
        for _ in range(n_pad):
            tok_rows.append([0] * n_tok)
            dlens.append(0)
            temps.append(0.0)
            tks.append(0)
            tps.append(1.0)
            mps.append(0.0)
            vlids.append(0)
        slots_arr = jnp.asarray(slots, jnp.int32)
        lengths_b = jnp.concatenate(
            [self.lengths[slots_arr], jnp.zeros((n_pad,), jnp.int32)]
        )
        table_rows = jnp.concatenate(
            [
                self.page_tables[slots_arr],
                jnp.full((n_pad, pps), self.trash_page, jnp.int32),
            ]
        )
        self._rng, sk = jax.random.split(self._rng)
        (
            self.cache, emit_dev, n_emit_dev, finite, logps_dev,
        ) = self._verify_fns[fn_key](
            self.params, self.cache,
            jnp.asarray(tok_rows, jnp.int32), lengths_b, table_rows, sk,
            jnp.asarray(temps, jnp.float32), jnp.asarray(tks, jnp.int32),
            jnp.asarray(tps, jnp.float32), jnp.asarray(dlens, jnp.int32),
            jnp.asarray(mps, jnp.float32), jnp.asarray(vlids, jnp.int32),
            jnp.concatenate(
                [
                    self.logit_bias[slots_arr],
                    jnp.zeros(
                        (n_pad, self.logit_bias.shape[1]), jnp.float32
                    ),
                ]
            ),
            jnp.concatenate(
                [
                    slots_arr,
                    jnp.full((n_pad,), self.trash_slot, jnp.int32),
                ]
            ),
        )
        emit_host = self._fetcher.fetch(emit_dev)
        n_emit_host = self._fetcher.fetch(n_emit_dev)
        logps = self._fetcher.fetch(logps_dev)
        if self.health_config.check_numerics:
            watchdog_check(
                self.health, self._fetcher.fetch(finite),
                phase="decode", request_ids=[r.req_id for r, _, _ in items],
            )
        total = 0
        for i, (req, slot, draft) in enumerate(items):
            n_emit = int(n_emit_host[i])
            emit = [int(emit_host[i, j]) for j in range(n_emit)]
            emit = emit[: req.max_new_tokens - req.generated]
            final: List[int] = []
            for t in emit:
                final.append(t)
                if t in req.stop_tokens:
                    req.stopped = True
                    break
            self._spec_proposed += len(draft)
            self._spec_accepted += n_emit - 1
            self.outputs[req.req_id].extend(final)
            self.logprobs[req.req_id].extend(
                float(logps[i, j]) for j in range(len(final))
            )
            self.scheduler.report_decoded(req.req_id, len(final))
            self.lengths = self.lengths.at[slot].add(len(final))
            self.last_tokens = self.last_tokens.at[slot].set(final[-1])
            if req.done:
                self.active[slot] = False
            total += len(final)
        return total

    def speculation_stats(self) -> Dict[str, float]:
        return {
            "proposed": float(self._spec_proposed),
            "accepted": float(self._spec_accepted),
            "acceptance_rate": (
                self._spec_accepted / self._spec_proposed
                if self._spec_proposed
                else 0.0
            ),
        }

    def _run_decode(self, decode_slots: List[int]) -> int:
        mask = np.zeros((self.config.max_batch_size,), bool)
        for s in decode_slots:
            mask[s] = True
        mask &= self.active
        active_mask = jnp.asarray(mask)

        # Burst size: as many steps as every active request can still take,
        # capped so prefill admission latency stays bounded.
        rids = [
            self.scheduler.slots[s]
            for s in decode_slots
            if mask[s] and self.scheduler.slots[s] is not None
        ]

        # Speculative path: verify every slot's draft in one batched KV
        # sweep instead of k sequential sweeps. Non-greedy requests
        # speculate too — rejection sampling in the verify step keeps the
        # output distribution exact (the draft is deterministic, so
        # accept-prob = p(draft); corrections sample the residual).
        table_tokens = (
            self.config.cache.max_pages_per_seq
            * self.config.cache.page_size
        )
        if (
            self.speculation_k > 0
            and rids
            and not self.scheduler.waiting
            and table_tokens * _pow2_bucket(len(rids), lo=1)
            <= self.speculation_max_table_tokens
        ):
            items = []
            want = []  # (items index, context, k): rows needing proposals
            for rid in rids:
                req = self.scheduler.active.get(rid)
                if req is None:
                    continue
                k = min(
                    self.speculation_k,
                    req.max_new_tokens - req.generated - 1,
                )
                items.append((req, req.batch_slot, []))
                if k > 0:
                    want.append(
                        (
                            len(items) - 1,
                            req._prompt + self.outputs[req.req_id],
                            k,
                        )
                    )
            if want:
                # One batched proposal call for all rows (a draft model
                # drafts every row in a single dispatch).
                max_k = max(k for _, _, k in want)
                proposals = self._propose_drafts(
                    [c for _, c, _ in want], max_k
                )
                for (idx, _, k), d in zip(want, proposals):
                    req, slot, _ = items[idx]
                    items[idx] = (req, slot, d[:k])
            total_draft = sum(len(d) for _, _, d in items)
            # Engage when the draft mass beats what one fused burst step
            # would yield anyway: a lone short draft among many idle slots
            # isn't worth preempting burst decode for.
            if items and total_draft >= max(1, len(items)):
                return self._run_speculative(items)
        remaining = [
            self.scheduler.active[r].max_new_tokens
            - self.scheduler.active[r].generated
            for r in rids
            if r in self.scheduler.active
        ]
        n_steps = max(1, min(remaining + [self.max_decode_burst]))
        # Admission fairness: single-step while work is waiting.
        if self.scheduler.waiting:
            n_steps = 1

        self._rng, sub = jax.random.split(self._rng)
        keys = jax.random.split(sub, n_steps)
        if n_steps not in self._decode_multi_fns:
            self._decode_multi_fns[n_steps] = self._jit_impl(
                functools.partial(self._decode_multi_impl, n_steps),
                "pcrrrrrrrrrrr", "crrrrr", donate=(1,),
            )
        (
            self.cache, self.last_tokens, self.lengths, all_tokens, finite,
            all_logps,
        ) = self._decode_multi_fns[n_steps](
            self.params, self.cache, self.last_tokens, self.lengths,
            self.page_tables, active_mask, keys,
            jnp.asarray(self.temps), jnp.asarray(self.top_ks),
            jnp.asarray(self.top_ps), jnp.asarray(self.min_ps),
            jnp.asarray(self.lora_ids), self.logit_bias,
        )
        # Deadline scales with the burst: the per-STEP timeout contract
        # holds whether the engine runs 1 or max_decode_burst fused steps.
        tokens_host = self._fetcher.fetch(all_tokens, scale=n_steps)
        logps_host = self._fetcher.fetch(all_logps, scale=n_steps)
        if self.health_config.check_numerics:
            watchdog_check(
                self.health, self._fetcher.fetch(finite, scale=n_steps),
                phase="decode", request_ids=rids,
            )
        n = 0
        for s in decode_slots:
            if not mask[s]:
                continue
            rid = self.scheduler.slots[s]
            if rid is None:
                continue
            req = self.scheduler.active.get(rid)
            stops = req.stop_tokens if req is not None else ()
            taken = 0
            for i in range(n_steps):
                tok = int(tokens_host[i, s])
                self.outputs[rid].append(tok)
                self.logprobs[rid].append(float(logps_host[i, s]))
                taken += 1
                if tok in stops:
                    # Stop token included, then generation ends; the
                    # burst's remaining tokens for this slot (and their
                    # speculatively-appended KV) are discarded with the
                    # sequence's pages at retirement.
                    if req is not None:
                        req.stopped = True
                    break
            self.scheduler.report_decoded(rid, taken)
            if req is not None and req.done:
                self.active[s] = False
            n += taken
        return n
