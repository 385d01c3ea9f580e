"""In-process A/B probe for the single-pass forward kernel geometries.

Relay-stable protocol (BENCHLOG 2026-08-20, round 4): large-inner
differential — wall(2n) - wall(n) with n=256 chained in-jit iterations,
min-of-4 walls each — cancels the ~23 ms fixed relay dispatch overhead
while keeping each wall ~100-350 ms so drift between the two windows is
small relative to the differential. Repeated 3x per config, report all.

Usage: python tools/probe_onepass.py "2048:512:None:0,2048:512:128:2,..."
Each spec is seq:block_q:diag_rows:diag_min_block.
"""

import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import tpu_flash.ops.flash.forward as F
from tpu_flash.bench.suite import _wall, attention_flops

key = jax.random.PRNGKey(0)


def mk(seq, bq, dr, dmin):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 32, seq, 128), jnp.bfloat16)
    k = jax.random.normal(kk, (1, 32, seq, 128), jnp.bfloat16)
    v = jax.random.normal(kv, (1, 32, seq, 128), jnp.bfloat16)

    def step(x, k, v):
        o = F._forward_onepass(
            x, k, v, causal=True, sm_scale=0.088, block_q=bq, q_per_kv=1,
            save_residuals=False, interpret=False, diag_rows=dr,
            diag_min_block=dmin,
        )
        return o.astype(x.dtype)

    @jax.jit
    def run(x, n, k, v):
        def body(c):
            return c[0] + 1, step(c[1], k, v)

        _, out = jax.lax.while_loop(
            lambda c: c[0] < n, body, (jnp.int32(0), x)
        )
        return jnp.sum(out.astype(jnp.float32))

    return run, q, k, v


def t_diff(run, q, k, v, n1=256, reps=4):
    a, b = jnp.int32(n1), jnp.int32(2 * n1)
    float(run(q, a, k, v))
    t1 = min(_wall(lambda: float(run(q, a, k, v))) for _ in range(reps))
    t2 = min(_wall(lambda: float(run(q, b, k, v))) for _ in range(reps))
    return (t2 - t1) / n1


def main():
    specs = []
    for part in sys.argv[1].split(","):
        seq, bq, dr, dmin = part.split(":")
        specs.append(
            (int(seq), int(bq), None if dr == "None" else int(dr), int(dmin))
        )
    data = {}
    for rep in range(3):
        for c in specs:
            run, q, k, v = mk(*c)
            s = t_diff(run, q, k, v)
            fl = attention_flops(1, 32, c[0], c[0], 128, True)
            data.setdefault(c, []).append(fl / s / 1e12)
    for c, vals in data.items():
        print(
            f"seq={c[0]} bq={c[1]} dr={c[2]} dmin={c[3]}:",
            [f"{v:.1f}" for v in vals],
            f"median {statistics.median(vals):.1f}",
        )


if __name__ == "__main__":
    main()
