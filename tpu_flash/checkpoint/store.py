"""Orbax-backed checkpointing: params, training state, engine KV snapshots.

Three surfaces (SURVEY.md §5 "Checkpoint / resume" build obligations):

* ``save_params`` / ``restore_params`` — one-shot weight checkpoints for the
  BASELINE model shapes (Llama-2-7B / Llama-3-8B attention configs).
* ``TrainCheckpointManager`` — step-indexed keep-N checkpoints of
  (params, opt_state) for training resume.
* ``snapshot_engine`` / ``restore_engine`` — a *consistent* snapshot of the
  decode engine's paged KV cache plus the host-side state that gives the
  pages meaning (page tables, sequence lengths, allocator ownership,
  scheduler request progress), so an interrupted serving process can resume
  decoding mid-sequence.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _abs(path) -> pathlib.Path:
    return pathlib.Path(path).absolute()


# ---------------------------------------------------------------------------
# Params (weights)
# ---------------------------------------------------------------------------


def save_params(path, params, *, force: bool = True) -> None:
    """Write a param pytree checkpoint (orbax PyTree format)."""
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(_abs(path), params, force=force)


def restore_params(path, like: Optional[Any] = None):
    """Restore a param pytree. ``like`` (an abstract or concrete pytree of
    the same structure) pins structure/dtypes; without it the tree is
    restored from saved metadata."""
    with ocp.PyTreeCheckpointer() as ckptr:
        if like is None:
            return ckptr.restore(_abs(path))
        template = jax.tree.map(np.asarray, like)
        return ckptr.restore(_abs(path), item=template)


# ---------------------------------------------------------------------------
# Training resume
# ---------------------------------------------------------------------------


class TrainCheckpointManager:
    """Step-indexed keep-N checkpoints of {params, opt_state}.

    Thin policy wrapper over ``orbax.checkpoint.CheckpointManager``; training
    loops call ``save(step, params, opt_state)`` every K steps and
    ``restore_latest()`` on restart.
    """

    def __init__(self, directory, *, max_to_keep: int = 3):
        self._mgr = ocp.CheckpointManager(
            _abs(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, params, opt_state=None) -> None:
        state = {"params": params}
        if opt_state is not None:
            state["opt_state"] = opt_state
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore_latest(self, like_params=None, like_opt_state=None):
        """Returns (step, params, opt_state) or None if no checkpoint."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        if like_params is not None:
            template = {"params": jax.tree.map(np.asarray, like_params)}
            if like_opt_state is not None:
                template["opt_state"] = jax.tree.map(
                    np.asarray, like_opt_state
                )
            state = self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        else:
            state = self._mgr.restore(step)
        return step, state["params"], state.get("opt_state")

    def close(self) -> None:
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# ---------------------------------------------------------------------------
# Engine / KV-cache snapshots
# ---------------------------------------------------------------------------

_ENGINE_META = "engine_meta.json"
_ENGINE_ARRAYS = "engine_arrays.npz"


def snapshot_engine(path, engine) -> None:
    """Snapshot a live ``InferenceEngine``: KV pages (+ scales), page tables,
    lengths, last tokens, allocator ownership, and per-request scheduler
    progress. The snapshot is host-side (npz + json) — KV pages for serving
    snapshots are bulk data, not sharded training state, so plain npz is the
    right weight class."""
    path = _abs(path)
    path.mkdir(parents=True, exist_ok=True)
    cache = engine.cache

    def _np_save(x):
        # np.savez writes ml_dtypes dtypes (bfloat16, float8_e4m3fn) as
        # raw void dtypes that np.load can't hand back to JAX; store as
        # f32 (lossless for both) — restore casts back to the engine's
        # payload dtype.
        a = np.asarray(x)
        if str(a.dtype) in ("bfloat16", "float8_e4m3fn"):
            return a.astype(np.float32)
        return a

    arrays = {
        "k_pages": _np_save(cache.k_pages),
        "v_pages": _np_save(cache.v_pages),
        "page_tables": np.asarray(engine.page_tables),
        "lengths": np.asarray(engine.lengths),
        "last_tokens": np.asarray(engine.last_tokens),
        "active": np.asarray(engine.active),
        "temps": np.asarray(engine.temps),
        "top_ks": np.asarray(engine.top_ks),
        "top_ps": np.asarray(engine.top_ps),
        "min_ps": np.asarray(engine.min_ps),
        "lora_ids": np.asarray(engine.lora_ids),
        "logit_bias": np.asarray(engine.logit_bias),
        "slot_bias": np.asarray(engine._slot_bias),
        "rng": np.asarray(engine._rng),
    }
    if cache.quantized:
        arrays["k_scales"] = np.asarray(cache.k_scales)
        arrays["v_scales"] = np.asarray(cache.v_scales)
    if cache.k_recent is not None:
        # Exact recent-window rings (engine/cache.py): per-slot state, so
        # they restore positionally with the slot arrays above.
        arrays["k_recent"] = _np_save(cache.k_recent)
        arrays["v_recent"] = _np_save(cache.v_recent)
    # Swapped-out KV stashes (preemption="swap"): already host-side numpy.
    for rid, stash in getattr(engine, "_swapped", {}).items():
        for j, a in enumerate(stash["arrays"]):
            arrays[f"swap_{rid}_{j}"] = _np_save(a)
        if "recent" in stash:
            arrays[f"swap_{rid}_rk"] = _np_save(stash["recent"][0])
            arrays[f"swap_{rid}_rv"] = _np_save(stash["recent"][1])
    np.savez_compressed(path / _ENGINE_ARRAYS, **arrays)

    sched = engine.scheduler

    def req_dict(req):
        d = {
            "req_id": req.req_id,
            "prompt_len": req.prompt_len,
            "max_new_tokens": req.max_new_tokens,
            "state": req.state.name,
            "batch_slot": req.batch_slot,
            "prefilled": req.prefilled,
            "generated": req.generated,
            "prompt": list(getattr(req, "_prompt", [])),
            "sampling": [
                req.sampling.temperature, req.sampling.top_k,
                req.sampling.top_p, req.sampling.min_p,
            ],
            "stop_tokens": list(req.stop_tokens),
            "stopped": req.stopped,
            "n_branches": req.n_branches,
            "parent_id": req.parent_id,
            "child_ids": list(req.child_ids),
            "resume_token": req.resume_token,
            "swap_npages": req.swap_npages,
            "priority": req.priority,
            "lora_id": req.lora_id,
            "logit_bias": {
                str(t): v
                for t, v in (getattr(req, "_logit_bias", None) or {}).items()
            },
            "arrival": getattr(req, "_arrival", 0),
            "admit_seq": getattr(req, "_admit_seq", 0),
        }
        # A WAITING parallel-sampling parent still carries its un-admitted
        # child Requests; serialize them inline so restore can rebuild the
        # group atomically.
        pending = getattr(req, "_children_reqs", None)
        if req.state.name == "WAITING" and pending:
            d["pending_children"] = [req_dict(c) for c in pending]
        return d

    requests = {str(rid): req_dict(r) for rid, r in sched.active.items()}
    # Requests still queued (not yet admitted) must survive the snapshot
    # too — dropping them would silently lose accepted work.
    waiting = [req_dict(r) for r in sched.waiting]
    # Pages are allocated per req_id at admission and released at retirement,
    # so scheduler.active is exactly the set of sequences that own pages.
    meta = {
        "page_size": cache.page_size,
        "kv_dtype": cache.kv_dtype,
        "requests": requests,
        "waiting": waiting,
        "alloc": {
            str(rid): sched.allocator.pages_of(rid) for rid in sched.active
        },
        "outputs": {str(k): v for k, v in engine.outputs.items()},
        "logprobs": {str(k): v for k, v in engine.logprobs.items()},
        "next_id": engine._next_id,
        "branch_ids": {
            str(k): list(v)
            for k, v in getattr(engine, "_branch_ids", {}).items()
        },
        "lora_names": getattr(engine, "lora", None).names
        if getattr(engine, "lora", None) is not None
        else [],
        "swapped": {
            str(rid): {"n": stash["n"], "k": len(stash["arrays"])}
            for rid, stash in getattr(engine, "_swapped", {}).items()
        },
    }
    (path / _ENGINE_META).write_text(json.dumps(meta))


def restore_engine(path, engine) -> None:
    """Restore a snapshot into a freshly-constructed engine of the same
    config (shapes must match). Resumes mid-decode: page ownership, request
    progress and device state all round-trip."""
    import jax.numpy as jnp

    from tpu_flash.engine.scheduler import Request, RequestState

    path = _abs(path)
    meta = json.loads((path / _ENGINE_META).read_text())
    data = np.load(path / _ENGINE_ARRAYS)

    if meta["page_size"] != engine.cache.page_size:
        raise ValueError("snapshot page_size mismatch")
    if meta["kv_dtype"] != engine.cache.kv_dtype:
        raise ValueError("snapshot kv_dtype mismatch")
    if data["k_pages"].shape != engine.cache.k_pages.shape:
        raise ValueError(
            f"snapshot cache shape {data['k_pages'].shape} != engine "
            f"{engine.cache.k_pages.shape}"
        )

    engine.cache = dataclasses.replace(
        engine.cache,
        k_pages=jnp.asarray(data["k_pages"]).astype(
            engine.cache.k_pages.dtype
        ),
        v_pages=jnp.asarray(data["v_pages"]).astype(
            engine.cache.v_pages.dtype
        ),
        k_scales=(
            jnp.asarray(data["k_scales"]) if engine.cache.quantized else None
        ),
        v_scales=(
            jnp.asarray(data["v_scales"]) if engine.cache.quantized else None
        ),
        k_recent=(
            jnp.asarray(data["k_recent"]).astype(
                engine.cache.k_recent.dtype
            )
            if engine.cache.k_recent is not None and "k_recent" in data
            else engine.cache.k_recent
        ),
        v_recent=(
            jnp.asarray(data["v_recent"]).astype(
                engine.cache.v_recent.dtype
            )
            if engine.cache.v_recent is not None and "v_recent" in data
            else engine.cache.v_recent
        ),
    )
    if engine.mesh is not None:
        # Re-apply the TP shardings a live engine's cache carries (KV heads
        # over the "model" axis) — otherwise restored pages land replicated
        # on one device and the first donated shard_map step either copies
        # or OOMs at real scale.
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        engine.cache = jax.device_put(
            engine.cache,
            jax.tree.map(
                lambda spec: NamedSharding(engine.mesh, spec),
                engine._cspecs,
                is_leaf=lambda x: isinstance(x, P),
            ),
        )
    engine.page_tables = jnp.asarray(data["page_tables"])
    engine.lengths = jnp.asarray(data["lengths"])
    engine.last_tokens = jnp.asarray(data["last_tokens"])
    engine.active = np.asarray(data["active"])
    if "temps" in data:  # snapshots from before sampling support lack these
        engine.temps = np.asarray(data["temps"])
        engine.top_ks = np.asarray(data["top_ks"])
        engine.top_ps = np.asarray(data["top_ps"])
        engine._rng = jnp.asarray(data["rng"])
    if "min_ps" in data:  # pre-min_p snapshots default to 0 (off)
        engine.min_ps = np.asarray(data["min_ps"])
    if "lora_ids" in data:
        engine.lora_ids = np.asarray(data["lora_ids"])
    if "logit_bias" in data:
        engine.logit_bias = jnp.asarray(data["logit_bias"])
        engine._slot_bias = np.asarray(data["slot_bias"])
    engine.outputs = {int(k): list(v) for k, v in meta["outputs"].items()}
    engine.logprobs = {
        int(k): list(v) for k, v in meta.get("logprobs", {}).items()
    }
    # Pre-logprobs snapshots: seed empty lists so resume can append.
    for rid in engine.outputs:
        engine.logprobs.setdefault(rid, [])
    engine._next_id = meta["next_id"]
    # Adapters are params-like: re-register the SAME adapters in the SAME
    # order before restoring (ids are positional).
    want = meta.get("lora_names", [])
    if want and engine.lora.names != want:
        raise ValueError(
            f"snapshot was taken with LoRA adapters {want}; re-register "
            f"them (same order) before restore — engine has "
            f"{engine.lora.names}"
        )

    sched = engine.scheduler
    for sid, pages in meta["alloc"].items():
        # Rebind each sequence to its original *physical* pages — page ids
        # are baked into the snapshotted page tables, so a fresh alloc of
        # arbitrary free pages would not do. A page already rebound by an
        # earlier sequence was prefix-SHARED at snapshot time: share again.
        # (The prefix index itself restores cold — retention refs are
        # rebuilt as new prompts register.)
        for page in pages:
            if sched.allocator.refcount(page) > 0:
                ok = sched.allocator.share(int(sid), [page])
            else:
                ok = sched.allocator.alloc_exact(int(sid), [page])
            if not ok:
                raise ValueError(
                    f"snapshot page {page} for seq {sid} unavailable in "
                    f"this allocator"
                )
    def build_req(rd):
        req = Request(
            req_id=rd["req_id"],
            prompt_len=rd["prompt_len"],
            max_new_tokens=rd["max_new_tokens"],
        )
        if "sampling" in rd:
            from tpu_flash.engine.sampling import SamplingParams

            t, k, p, *rest = rd["sampling"]
            req.sampling = SamplingParams(
                temperature=t, top_k=int(k), top_p=p,
                min_p=rest[0] if rest else 0.0,
            )
        req.state = RequestState[rd["state"]]
        req.batch_slot = rd["batch_slot"]
        req.prefilled = rd["prefilled"]
        req.generated = rd["generated"]
        req.stop_tokens = tuple(rd.get("stop_tokens", ()))
        req.stopped = rd.get("stopped", False)
        req._prompt = list(rd["prompt"])
        req.n_branches = rd.get("n_branches", 1)
        req.parent_id = rd.get("parent_id")
        req.child_ids = tuple(rd.get("child_ids", ()))
        req.resume_token = rd.get("resume_token")
        req.swap_npages = rd.get("swap_npages", 0)
        req.priority = rd.get("priority", 0)
        req.lora_id = rd.get("lora_id", 0)
        lb = rd.get("logit_bias")
        if lb:
            req._logit_bias = {int(t): float(v) for t, v in lb.items()}
        req._arrival = rd.get("arrival", 0)
        req._admit_seq = rd.get("admit_seq", 0)
        if rd.get("pending_children"):
            req._children_reqs = [
                build_req(c) for c in rd["pending_children"]
            ]
        return req

    for rid, rd in meta["requests"].items():
        req = build_req(rd)
        sched.active[int(rid)] = req
        if req.batch_slot is not None and req.batch_slot >= 0:
            sched.slots[req.batch_slot] = req.req_id
    for rd in meta.get("waiting", []):
        sched.waiting.append(build_req(rd))
    # Branch map: persisted directly (covers FINISHED groups too); the
    # live-request rebuild below keeps pre-branch_ids snapshots working.
    engine._branch_ids = {
        int(k): list(v) for k, v in meta.get("branch_ids", {}).items()
    }
    for req in list(sched.active.values()) + list(sched.waiting):
        if req.child_ids or req.n_branches > 1:
            engine._branch_ids[req.req_id] = [req.req_id, *req.child_ids]
    # Scheduler ordering counters resume past every restored request.
    all_reqs = list(sched.active.values()) + list(sched.waiting)
    if all_reqs:
        sched._arrival_counter = 1 + max(
            getattr(r, "_arrival", 0) for r in all_reqs
        )
        sched._admit_counter = 1 + max(
            getattr(r, "_admit_seq", 0) for r in all_reqs
        )
    # Swapped-out KV stashes: page payloads cast back to the cache's
    # payload dtype (bf16 was stored as f32); scale arrays stay f32.
    engine._swapped = {}
    pay_dtype = np.asarray(engine.cache.k_pages).dtype
    for rid, info in meta.get("swapped", {}).items():
        arrays = []
        for j in range(info["k"]):
            a = data[f"swap_{rid}_{j}"]
            if j < 2:
                a = a.astype(pay_dtype)
            arrays.append(a)
        stash = {"n": info["n"], "arrays": arrays}
        if f"swap_{rid}_rk" in data:
            rdt = (
                np.asarray(engine.cache.k_recent).dtype
                if engine.cache.k_recent is not None
                else np.float32
            )
            stash["recent"] = (
                data[f"swap_{rid}_rk"].astype(rdt),
                data[f"swap_{rid}_rv"].astype(rdt),
            )
        engine._swapped[int(rid)] = stash


# ---------------------------------------------------------------------------
# Data-parallel engine snapshots
# ---------------------------------------------------------------------------

_DP_META = "dp_meta.json"


def snapshot_dp_engine(path, dp_engine) -> None:
    """Snapshot a ``DataParallelEngine``: one per-replica engine snapshot
    plus the request routing table. Replicas are independent, so the
    per-replica format is exactly ``snapshot_engine``'s."""
    path = _abs(path)
    path.mkdir(parents=True, exist_ok=True)
    for i, eng in enumerate(dp_engine.engines):
        snapshot_engine(path / f"replica_{i}", eng)
    meta = {
        "replicas": dp_engine.replicas,
        "tp": dp_engine.tp,
        "route": {str(k): list(v) for k, v in dp_engine._route.items()},
        "branch_ids": {
            str(k): list(v) for k, v in dp_engine._branch_ids.items()
        },
        "next_id": dp_engine._next_id,
        "rr": dp_engine._rr,
    }
    (path / _DP_META).write_text(json.dumps(meta))


def restore_dp_engine(path, dp_engine) -> None:
    """Restore into a freshly-constructed ``DataParallelEngine`` of the same
    config and replica count."""
    path = _abs(path)
    meta = json.loads((path / _DP_META).read_text())
    if meta["replicas"] != dp_engine.replicas:
        raise ValueError(
            f"snapshot has {meta['replicas']} replicas; engine has "
            f"{dp_engine.replicas}"
        )
    for i, eng in enumerate(dp_engine.engines):
        restore_engine(path / f"replica_{i}", eng)
    dp_engine._route = {
        int(k): tuple(v) for k, v in meta["route"].items()
    }
    dp_engine._branch_ids = {
        int(k): list(v) for k, v in meta.get("branch_ids", {}).items()
    }
    dp_engine._next_id = meta["next_id"]
    dp_engine._rr = meta.get("rr", 0)
