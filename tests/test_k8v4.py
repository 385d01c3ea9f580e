"""k8v4 — the MIXED cache tier: K pages at int8 (per-token symmetric),
V pages at token-packed int4.

Why: generation quality tracks K precision much harder than V's — the
trained-checkpoint generation sims read K8+V4 at 0.80 prefix match vs
0.54 for uniform group-affine int4 at comparable bytes/token (BENCHLOG
2026-08-21 r5). The kernel consumes per-side dtypes natively
(ops/decode/paged.py: K rides the int8-MXU score path, V the int4
unpack + int8-MXU PV path); cache create/append/layer_view split per
side (engine/cache.py::side_dtypes); prefill history takes the gather
path.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpu_flash.core.config import CacheConfig, EngineConfig
from tpu_flash.core.reference import (
    gather_pages_to_dense,
    reference_decode_attention,
)
from tpu_flash.engine.cache import PagedKVCache, side_dtypes
from tpu_flash.engine.runner import InferenceEngine
from tpu_flash.models import TINY_TEST, FlashTransformer
from tpu_flash.ops.decode import paged_attention
from tpu_flash.ops.quant import dequantize, quantize_pages


def test_side_dtypes():
    assert side_dtypes("k8v4") == ("int8", "int4")
    assert side_dtypes("int8") == ("int8", "int8")
    assert side_dtypes("bfloat16") == ("bfloat16", "bfloat16")


def test_kernel_parity_mixed():
    b, hq, hkv, d, ctx, ps = 2, 8, 2, 128, 256, 64
    pps = ctx // ps
    num_pages = b * pps + 1
    kk, kv_, kq = jax.random.split(jax.random.PRNGKey(1), 3)
    k_pages = jax.random.normal(kk, (hkv, num_pages, ps, d))
    v_pages = jax.random.normal(kv_, (hkv, num_pages, ps, d))
    q = jax.random.normal(kq, (b, hq, d))
    pi = jnp.arange(b * pps, dtype=jnp.int32).reshape(b, pps)
    lengths = jnp.asarray([ctx, ctx - 17], jnp.int32)
    kq8 = quantize_pages(k_pages, "int8")
    vq4 = quantize_pages(v_pages, "int4")
    out = paged_attention(q, kq8, vq4, lengths, pi, interpret=True)
    ref = reference_decode_attention(
        q, gather_pages_to_dense(dequantize(kq8), pi),
        gather_pages_to_dense(dequantize(vq4), pi), lengths,
    )
    np.testing.assert_allclose(out, ref, atol=2e-2)


def test_cache_per_side_layout_and_append():
    cfg = CacheConfig(
        page_size=16, num_pages=8, max_pages_per_seq=4,
        kv_dtype="k8v4", recent_window=0,
    )
    cache = PagedKVCache.create(1, 2, 128, cfg)
    assert cache.k_pages.shape[-2] == 16  # int8 full rows
    assert cache.v_pages.shape[-2] == 8  # int4 packed rows
    new_k = jax.random.normal(jax.random.PRNGKey(0), (16, 2, 128))
    new_v = jax.random.normal(jax.random.PRNGKey(1), (16, 2, 128))
    cache = cache.append(
        0, new_k, new_v, jnp.zeros((16,), jnp.int32),
        jnp.arange(16, dtype=jnp.int32),
    )
    k, v = cache.layer_view(0)
    assert k.dtype_name == "int8" and v.dtype_name == "int4"
    k_err = float(jnp.max(jnp.abs(
        dequantize(k)[:, 0] - new_k.transpose(1, 0, 2)
    )))
    v_err = float(jnp.max(jnp.abs(
        dequantize(v)[:, 0] - new_v.transpose(1, 0, 2)
    )))
    assert k_err < 0.05  # int8 floor
    assert v_err < 0.5  # int4 floor (both nibble halves intact)


def test_engine_generation_tracks_bf16():
    cfg = dataclasses.replace(TINY_TEST, head_dim=128)
    model = FlashTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0))

    def run(kv_dtype):
        eng = InferenceEngine(
            model, params,
            EngineConfig(
                max_batch_size=2, max_seq_len=128, prefill_chunk=32,
                cache=CacheConfig(
                    page_size=32, num_pages=16, max_pages_per_seq=4,
                    kv_dtype=kv_dtype, recent_window=0,
                ),
            ),
            interpret=True,
        )
        rid = eng.submit([3, 14, 15, 9, 2, 6, 53, 58], max_new_tokens=8)
        return eng.run()[rid]

    got = run("k8v4")
    ref = run("bfloat16")
    assert len(got) == 8
    assert got[0] == ref[0]


def test_snapshot_restore_roundtrip(tmp_path):
    """Engine KV snapshot/restore must carry the mixed tier's per-side
    payload shapes and scales (checkpoint/store.py is layout-generic;
    this pins it for k8v4 — CLAUDE.md KV-lifecycle rule)."""
    from tpu_flash.checkpoint.store import restore_engine, snapshot_engine

    cfg = dataclasses.replace(TINY_TEST, head_dim=128)
    model = FlashTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0))

    def mk():
        return InferenceEngine(
            model, params,
            EngineConfig(
                max_batch_size=2, max_seq_len=128, prefill_chunk=32,
                cache=CacheConfig(
                    page_size=32, num_pages=16, max_pages_per_seq=4,
                    kv_dtype="k8v4", recent_window=0,
                ),
            ),
            interpret=True,
        )

    eng = mk()
    rid = eng.submit([3, 14, 15, 9, 2, 6, 53, 58], max_new_tokens=6)
    # Run prefill + a few decode steps, snapshot mid-generation.
    for _ in range(3):
        if eng.scheduler.has_work():
            eng.step()
    snapshot_engine(str(tmp_path / "snap"), eng)
    finished = dict(eng.run())

    eng2 = mk()
    restore_engine(str(tmp_path / "snap"), eng2)
    resumed = eng2.run()
    assert resumed[rid] == finished[rid]
