"""A/B on TPU: int4 decode, packed-byte MXU path vs unpack path.
Parity (bitwise) + paired timing at 8K and 32K."""
import time, functools, jax, jax.numpy as jnp, numpy as np
from tpu_flash.bench.suite import _time_chained
from tpu_flash.ops.decode import paged_attention
from tpu_flash.ops.quant import QuantizedTensor, quantize_pages
print("backend:", jax.default_backend(), flush=True)

def setup(context, page_size=1024, batch=8, hkv=8, hq=32, d=128):
    pages_per_seq = context // page_size
    num_pages = batch * pages_per_seq + 1
    kk, kv, kq = jax.random.split(jax.random.PRNGKey(0), 3)
    k_pages = quantize_pages(jax.random.normal(kk, (hkv, num_pages, page_size, d), jnp.float32), "int4")
    v_pages = quantize_pages(jax.random.normal(kv, (hkv, num_pages, page_size, d), jnp.float32), "int4")
    page_indices = jnp.arange(batch * pages_per_seq, dtype=jnp.int32).reshape(batch, pages_per_seq)
    lengths = jnp.full((batch,), context, jnp.int32)
    q = jax.random.normal(kq, (batch, hq, d), jnp.float32)
    return q, k_pages, v_pages, lengths, page_indices

def run_case(context, ppb):
    q, kq_, vq_, lengths, page_indices = setup(context)
    packing = kq_.packing
    parts = (kq_.values, kq_.scales, vq_.values, vq_.scales)
    outs = {}
    for packed in (True, False):
        def step(x, lengths, page_indices, kv_, ks_, vv_, vs_, packed=packed):
            kqt = QuantizedTensor(kv_, ks_, "int4", packing)
            vqt = QuantizedTensor(vv_, vs_, "int4", packing)
            return paged_attention(
                x, kqt, vqt, lengths, page_indices,
                pages_per_compute_block=ppb, int4_packed_mxu=packed,
            ).astype(x.dtype)
        # parity fetch
        o = np.asarray(jax.jit(step)(q, lengths, page_indices, *parts))
        outs[packed] = o
        secs = _time_chained(step, q, lengths, page_indices, *parts, inner=32)
        toks = q.shape[0] / secs
        print(f"ctx={context} packed={packed}: {secs*1e6:.1f} us/step, {toks:.0f} tok/s", flush=True)
    diff = np.max(np.abs(outs[True] - outs[False]))
    print(f"ctx={context} parity max|packed-unpacked| = {diff}", flush=True)

run_case(8192, ppb=4)
run_case(32768, ppb=4)
print("DONE", flush=True)
