"""Per-request logit_bias (OpenAI convention) and the streaming token
generator: bans/boosts must hold on EVERY sampling path (prefill first
token, burst decode, speculative verify, fused rows) without touching
other slots; stream() must yield exactly the final outputs in order."""

import jax
import jax.numpy as jnp
import pytest

from tpu_flash.core.config import CacheConfig, EngineConfig
from tpu_flash.engine.runner import InferenceEngine
from tpu_flash.models import TINY_TEST, FlashTransformer


@pytest.fixture(scope="module")
def mp():
    model = FlashTransformer(TINY_TEST)
    return model, model.init(jax.random.PRNGKey(0))


def _engine(model, params, fused="auto"):
    cfg = EngineConfig(
        max_batch_size=3, max_seq_len=128, prefill_chunk=8,
        cache=CacheConfig(
            page_size=8, num_pages=64, max_pages_per_seq=8,
            kv_dtype="float32",
        ),
        prefix_cache=False, fused_mixed_step=fused,
    )
    return InferenceEngine(model, params, cfg, interpret=True)


PROMPT = [3, 1, 4, 1, 5, 9, 2, 6]


def _greedy_banned(model, params, prompt, n, banned):
    """Dense-forward oracle: greedy with `banned` excluded."""
    toks = list(prompt)
    out = []
    for _ in range(n):
        lg = model.forward(
            params, jnp.asarray(toks, jnp.int32)[None], interpret=True
        )[0, -1]
        lg = lg.at[jnp.asarray(sorted(banned))].set(-jnp.inf)
        t = int(jnp.argmax(lg))
        out.append(t)
        toks.append(t)
    return out


class TestLogitBias:
    def test_ban_holds_on_every_step(self, mp):
        """Ban the tokens an unbiased run would emit: the biased stream
        must match the ban-aware oracle and never contain them —
        covering prefill first-token, decode, and speculative verify."""
        model, params = mp
        plain = _engine(model, params)
        r = plain.submit(PROMPT, 6)
        plain.run()
        banned = set(plain.outputs[r][:3])

        expect = _greedy_banned(model, params, PROMPT, 6, banned)
        eng = _engine(model, params)
        rb = eng.submit(PROMPT, 6,
                        logit_bias={t: -1e9 for t in banned})
        eng.run()
        assert eng.outputs[rb] == expect
        assert not banned & set(eng.outputs[rb])

    def test_force_token(self, mp):
        model, params = mp
        eng = _engine(model, params)
        r = eng.submit(PROMPT, 5, logit_bias={42: 1e9})
        eng.run()
        assert eng.outputs[r] == [42] * 5

    def test_isolation_and_reuse(self, mp):
        """A biased slot must not leak into its neighbor, and a LATER
        request reusing the slot must not inherit the bias."""
        model, params = mp
        plain = _engine(model, params)
        a = plain.submit(PROMPT, 5)
        plain.run()
        expect_plain = plain.outputs[a]

        eng = _engine(model, params)
        rb = eng.submit(PROMPT, 5, logit_bias={42: 1e9})
        ra = eng.submit(PROMPT, 5)
        eng.run()
        assert eng.outputs[rb] == [42] * 5
        assert eng.outputs[ra] == expect_plain
        r2 = eng.submit(PROMPT, 5)  # reuses a previously-biased slot
        eng.run()
        assert eng.outputs[r2] == expect_plain

    def test_bias_with_fused_steps(self, mp):
        model, params = mp
        eng = _engine(model, params, fused=True)
        rb = eng.submit(PROMPT, 8, logit_bias={42: 1e9})
        eng.step(), eng.step()
        eng.submit([2, 7, 1, 8] * 4, 4)  # prefill overlaps rb's decode
        eng.run()
        assert eng.outputs[rb] == [42] * 8

    def test_validation(self, mp):
        model, params = mp
        eng = _engine(model, params)
        with pytest.raises(ValueError, match="vocab"):
            eng.submit(PROMPT, 4, logit_bias={10**6: 1.0})

    def test_snapshot_roundtrip(self, mp, tmp_path):
        from tpu_flash.checkpoint.store import (
            restore_engine,
            snapshot_engine,
        )

        model, params = mp
        eng = _engine(model, params)
        r = eng.submit(PROMPT, 6, logit_bias={42: 1e9})
        eng.step(), eng.step()
        snapshot_engine(tmp_path / "s", eng)
        fresh = _engine(model, params)
        restore_engine(tmp_path / "s", fresh)
        fresh.run()
        assert fresh.outputs[r] == [42] * 6


class TestStreaming:
    def test_stream_matches_run(self, mp):
        model, params = mp
        ref = _engine(model, params)
        a = ref.submit(PROMPT, 6)
        b = ref.submit([7, 7, 2], 4)
        ref.run()

        eng = _engine(model, params)
        a2 = eng.submit(PROMPT, 6)
        b2 = eng.submit([7, 7, 2], 4)
        seen = {a2: [], b2: []}
        order_ok = True
        for rid, i, tok in eng.stream():
            order_ok &= i == len(seen[rid])
            seen[rid].append(tok)
        assert order_ok
        assert seen[a2] == ref.outputs[a]
        assert seen[b2] == ref.outputs[b]

    def test_stream_with_parallel_sampling(self, mp):
        model, params = mp
        eng = _engine(model, params)
        g = eng.submit(PROMPT, 4, n=2)
        seen = {}
        for rid, i, tok in eng.stream():
            seen.setdefault(rid, []).append(tok)
        for bid in eng.branches(g):
            assert seen[bid] == eng.outputs[bid]
