"""Attribute the fused recent-ring's engine cost at toy decode shapes.

The in-process A/B (bench_engine_device_decode, int8 toy row, 2026-08-21)
reads ring=128 at 999 us/step vs ring=0 at 760 — +240 us/step at 4
layers. Two candidate sinks: (a) the paged kernel's final ring block,
(b) the cache append's dual-write scatters into
k_recent/v_recent[layer, slots, :, row, :]. This probe times each in
isolation with the chained differential protocol.

Usage: python tools/ring_cost_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpu_flash.bench.suite import _time_chained
from tpu_flash.ops.decode import paged_attention
from tpu_flash.ops.quant import QuantizedTensor, quantize_pages

BATCH, HQ, HKV, D, CTX, PS, W, LAYERS = 8, 8, 8, 128, 512, 128, 128, 4


def kernel_ab():
    pages_per_seq = CTX // PS
    num_pages = BATCH * pages_per_seq + 1
    kk, kv, kq, kr = jax.random.split(jax.random.PRNGKey(0), 4)
    k_pages = quantize_pages(
        jax.random.normal(kk, (HKV, num_pages, PS, D), jnp.float32), "int8"
    )
    v_pages = quantize_pages(
        jax.random.normal(kv, (HKV, num_pages, PS, D), jnp.float32), "int8"
    )
    page_indices = (
        jnp.arange(BATCH * pages_per_seq, dtype=jnp.int32)
        .reshape(BATCH, pages_per_seq)
    )
    lengths = jnp.full((BATCH,), CTX, jnp.int32)
    q = jax.random.normal(kq, (BATCH, HQ, D), jnp.float32)
    rk = jax.random.normal(kr, (BATCH, HKV, W, D), jnp.float32).astype(
        jnp.bfloat16
    )
    rv = rk * 0.5
    packing = k_pages.packing
    parts = (k_pages.values, k_pages.scales, v_pages.values, v_pages.scales)

    def mk(use_ring):
        def step(x, lengths, page_indices, kv_, ks_, vv_, vs_, rk_, rv_):
            kq_ = QuantizedTensor(kv_, ks_, "int8", packing)
            vq_ = QuantizedTensor(vv_, vs_, "int8", packing)
            o = paged_attention(
                x, kq_, vq_, lengths, page_indices,
                recent_k=rk_ if use_ring else None,
                recent_v=rv_ if use_ring else None,
            )
            return o.astype(x.dtype)

        return step

    for label, use in (("no-ring", False), ("ring", True), ("no-ring2", False)):
        secs = _time_chained(
            mk(use), q, lengths, page_indices, *parts, rk, rv, inner=64
        )
        print(f"kernel {label}: {secs * 1e6:.1f} us")


def scatter_ab():
    ring = jnp.zeros((LAYERS, BATCH + 1, HKV, W, D), jnp.bfloat16)
    slots = jnp.arange(BATCH, dtype=jnp.int32)

    def step(x, ring):
        kvnew = x.astype(jnp.bfloat16)  # [BATCH, HKV, D]
        pos = jax.lax.convert_element_type(
            jnp.abs(x[:, 0, 0]) * 7.0, jnp.int32
        ) % W
        r = ring
        for layer in range(LAYERS):
            r = r.at[layer, slots, :, pos, :].set(kvnew)
            r = r.at[layer, slots, :, pos, :].set(kvnew * 2.0)
        back = r[0, slots, 0, pos, :1]  # [BATCH, 1] touch the writes
        return x + back[:, None, :].astype(x.dtype)

    x0 = jax.random.normal(jax.random.PRNGKey(1), (BATCH, HKV, D), jnp.float32)
    secs = _time_chained(step, x0, ring, inner=64)
    print(f"scatter 8x (4L k+v): {secs * 1e6:.1f} us "
          f"({secs / (2 * LAYERS) * 1e6:.1f} us each)")


if __name__ == "__main__":
    kernel_ab()
    scatter_ab()
