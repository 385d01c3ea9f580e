"""Data-parallel serving: R replica engines over disjoint device groups.

Completes the parallelism checklist's DP row (SURVEY.md §2: "Mesh `data`
axis over batch/requests in the decode engine"). The design matches how
production serving stacks scale out: each replica is an independent SPMD
program over its own devices (optionally TP-sharded over a "model" axis
within the group — the DP×TP topology), and the host routes requests to the
least-loaded replica. Replicas never communicate — the KV cache, page pool,
and scheduler are replica-local — so scaling is embarrassingly parallel and
a replica failure degrades capacity, not correctness.

Steps run concurrently, one host thread per replica (a replica's step
blocks on its own device fetch), so R decode bursts execute in parallel
on their disjoint devices instead of serializing on the host loop.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Tuple

import jax

from tpu_flash.core.config import EngineConfig, MeshConfig
from tpu_flash.engine.runner import InferenceEngine
from tpu_flash.engine.sampling import GREEDY, SamplingParams
from tpu_flash.parallel.mesh import build_mesh


class DataParallelEngine:
    """R independent ``InferenceEngine`` replicas behind one submit/run API.

    ``replicas * tp`` devices are taken from ``devices`` (default: all);
    each replica gets a contiguous group — with ``tp > 1`` the group becomes
    a TP mesh ("model" axis), with ``tp == 1`` a single-device mesh pins the
    replica to its device (otherwise every replica would compile onto
    device 0).
    """

    def __init__(
        self,
        model,
        params,
        config: EngineConfig,
        *,
        replicas: int,
        tp: int = 1,
        interpret: Optional[bool] = None,
        seed: int = 0,
        devices=None,
    ):
        if replicas < 1:
            raise ValueError("need at least 1 replica")
        devices = list(devices) if devices is not None else jax.devices()
        need = replicas * tp
        if need > len(devices):
            raise ValueError(
                f"DP×TP needs {need} devices; {len(devices)} present"
            )
        self.replicas = replicas
        self.tp = tp
        self.engines: List[InferenceEngine] = []
        for i in range(replicas):
            group = devices[i * tp : (i + 1) * tp]
            mesh = build_mesh(
                MeshConfig(data=1, seq=1, model=tp), devices=group
            )
            self.engines.append(
                InferenceEngine(
                    model,
                    params,
                    config,
                    interpret=interpret,
                    # Decorrelate sampling streams across replicas.
                    seed=seed + i,
                    mesh=mesh,
                )
            )
        self._route: Dict[int, Tuple[int, int]] = {}  # rid -> (rep, local)
        self._branch_ids: Dict[int, List[int]] = {}  # rid -> [rid, kids...]
        self._next_id = 0
        self._rr = 0  # round-robin tiebreak
        # One thread per replica: each InferenceEngine.step() blocks on its
        # own D2H fetch, so concurrent threads are what lets R replicas'
        # device work overlap (engines share no state; JAX execution is
        # thread-safe).
        self._pool = (
            ThreadPoolExecutor(max_workers=replicas) if replicas > 1
            else None
        )

    # -- client API ----------------------------------------------------------

    def _load(self, eng: InferenceEngine) -> int:
        return len(eng.scheduler.waiting) + eng.scheduler.num_active()

    def submit(
        self,
        prompt: List[int],
        max_new_tokens: int,
        sampling: SamplingParams = GREEDY,
        stop_tokens: Optional[List[int]] = None,
        n: int = 1,
        priority: int = 0,
        lora: Optional[str] = None,
        logit_bias=None,
    ) -> int:
        loads = [self._load(e) for e in self.engines]
        best = min(loads)
        # Least-loaded; round-robin among ties so a burst of arrivals
        # spreads instead of piling onto replica 0.
        order = [
            (self._rr + i) % self.replicas for i in range(self.replicas)
        ]
        rep = next(i for i in order if loads[i] == best)
        self._rr = (rep + 1) % self.replicas
        local = self.engines[rep].submit(
            prompt, max_new_tokens, sampling=sampling,
            stop_tokens=stop_tokens, n=n, priority=priority, lora=lora,
            logit_bias=logit_bias,
        )
        rid = self._next_id
        self._next_id += 1
        self._route[rid] = (rep, local)
        # Parallel-sampling branches (n>1) route to the same replica; each
        # branch gets its own fleet-level id so outputs/logprobs surface
        # all n completions.
        branch_rids = [rid]
        for child_local in self.engines[rep].branches(local)[1:]:
            crid = self._next_id
            self._next_id += 1
            self._route[crid] = (rep, child_local)
            branch_rids.append(crid)
        self._branch_ids[rid] = branch_rids
        return rid

    def branches(self, rid: int) -> List[int]:
        """Fleet-level completion ids of a request (itself + parallel-
        sampling branches)."""
        return list(self._branch_ids.get(rid, [rid]))

    def register_lora(self, name: str, adapters, *, alpha=None) -> int:
        """Register an adapter on EVERY replica (ids are positional and
        identical across the fleet)."""
        ids = {eng.register_lora(name, adapters, alpha=alpha)
               for eng in self.engines}
        assert len(ids) == 1
        return ids.pop()

    def has_work(self) -> bool:
        return any(e.scheduler.has_work() for e in self.engines)

    def step(self) -> None:
        """One step on every replica that has work, run CONCURRENTLY (one
        thread per replica): a replica's step blocks the calling thread on
        its own D2H fetch, so threading is what makes the replicas' device
        work overlap on their disjoint device groups."""
        busy = [e for e in self.engines if e.scheduler.has_work()]
        if self._pool is not None and len(busy) > 1:
            futures = [self._pool.submit(e.step) for e in busy]
            for f in futures:
                f.result()  # surface exceptions
        else:
            for eng in busy:
                eng.step()

    def run(self) -> Dict[int, List[int]]:
        while self.has_work():
            self.step()
        return self.outputs

    def close(self) -> None:
        if self._pool is not None:
            self._pool.shutdown(wait=True)
        for eng in self.engines:
            eng.close()

    # -- results & observability ----------------------------------------------

    @property
    def outputs(self) -> Dict[int, List[int]]:
        return {
            rid: self.engines[rep].outputs[local]
            for rid, (rep, local) in self._route.items()
        }

    @property
    def logprobs(self) -> Dict[int, List[float]]:
        return {
            rid: self.engines[rep].logprobs[local]
            for rid, (rep, local) in self._route.items()
        }

    def stats(self) -> Dict[str, object]:
        per = []
        for eng in self.engines:
            per.append(
                {
                    "active": eng.scheduler.num_active(),
                    "waiting": len(eng.scheduler.waiting),
                    "decode_tokens": eng.metrics.decode_tokens,
                    "prefill_tokens": eng.metrics.prefill_tokens,
                }
            )
        return {
            "replicas": self.replicas,
            "tp": self.tp,
            "per_replica": per,
            "decode_tokens": sum(p["decode_tokens"] for p in per),
            "prefill_tokens": sum(p["prefill_tokens"] for p in per),
        }
