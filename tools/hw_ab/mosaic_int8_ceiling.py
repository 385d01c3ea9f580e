"""int8-MXU ceiling probes: raw XLA vs Mosaic lowering (2026-08-20).

Measured on v5e: raw-XLA int8 x int8 -> int32 batched matmuls run 2.17x
bf16 at K=2048 and 2.19x at K=128 (276.9 / 325.7 TOP/s), but the SAME
dot through a Pallas kernel at the flash kernel's tile shapes measures
only 1.38x (121.2 vs 87.7) — Mosaic's int8 lowering does not reach the
XLA fast path. This bounds the quantized-input prefill kernel (config
4): its int8 score matmul saves ~14% of matmul time, which the i32->f32
convert + rank-1 rescale of the [1024, 1024] scores then cancels —
matching the long-recorded ~0.93-1.0x "int8-MXU for prefill" result.
The config-4 ">= 90% roofline" target needs either Mosaic int8-dot
parity with XLA or a native-fp8 generation (v6e). Chained-measurement
pitfalls (CSE hoisting, sliced-feedback DCE) are noted in BENCHLOG.
"""

import sys, time, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N, CELLS = 1024, 128, 1024, 256

def kernel(a_ref, b_ref, o_ref, *, int8):
    a = a_ref[0]
    b = b_ref[0]
    pt = jnp.int32 if int8 else jnp.float32
    y = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                            preferred_element_type=pt)
    o_ref[0] = jnp.sum(y.astype(jnp.float32), axis=1, keepdims=True)

def run_case(int8):
    dt = jnp.int8 if int8 else jnp.bfloat16
    a0 = jax.random.randint(jax.random.PRNGKey(0), (CELLS, M, K), -127, 127, jnp.int8).astype(dt)
    b = jax.random.randint(jax.random.PRNGKey(1), (CELLS, K, N), -127, 127, jnp.int8).astype(dt)
    f = pl.pallas_call(
        functools.partial(kernel, int8=int8),
        grid=(CELLS,),
        in_specs=[pl.BlockSpec((1, M, K), lambda c: (c, 0, 0)),
                  pl.BlockSpec((1, K, N), lambda c: (c, 0, 0))],
        out_specs=pl.BlockSpec((1, M, 1), lambda c: (c, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((CELLS, M, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )
    @jax.jit
    def chain(n, a, b):
        def body(c):
            i, a = c
            r = f(a, b)  # [CELLS, M, 1]
            if int8:
                a2 = ((a.astype(jnp.int32) + (r.astype(jnp.int32) & 1)) & 127).astype(jnp.int8)
            else:
                a2 = (a + r * jnp.bfloat16(1e-6)).astype(jnp.bfloat16)
            return i + 1, a2
        _, a = jax.lax.while_loop(lambda c: c[0] < n, body, (jnp.int32(0), a))
        return jnp.sum(a.astype(jnp.float32))
    def t(n):
        t0 = time.perf_counter(); float(chain(jnp.int32(n), a0, b)); return time.perf_counter() - t0
    float(chain(jnp.int32(2), a0, b))
    # Large-window differential (>= 150 ms walls): small windows measure
    # the relay's ~23 ms dispatch jitter (BENCHLOG 2026-08-20 round 4).
    sec = max((min(t(512) for _ in range(4)) - min(t(256) for _ in range(4))) / 256, 1e-9)
    flops = 2.0 * CELLS * M * K * N
    print(f"{'int8' if int8 else 'bf16'}: {sec*1e6:8.1f} us/iter  {flops/sec/1e12:6.1f} T(FL)OP/s", flush=True)

run_case(False)
run_case(True)
