"""End-to-end quantized-cache generation-quality gate.

The reference never ties numerical tolerance to *generation* quality —
its checks print a max-abs-diff and assert nothing
(/root/reference/tests/main.cu:97). BASELINE.md row 3 promises quantized
decode "within stated delta"; this test backs that promise with a
measured, asserted end-to-end number: greedy-decode the same prompts
through the serving engine with a float32 cache (zero quantization
error) and with an int8 cache, and require the int8 engine to reproduce
the float32 token stream. Greedy decode is deterministic, so any
divergence is attributable to KV quantization error alone.

int8 per-token/per-head absmax (ops/quant/quantize.py) introduces
~2e-3 logit-scale error — far below the argmax margins even of this
random-weight tiny model, so the gate is exact-match. int4 (~1.6e-1)
and fp8 measurably diverge on random weights (prefix-match 0.09 / 0.59,
BENCHLOG 2026-08-19) — they are *reported* by bench config 9, not gated
here, because random-weight logit margins overstate production error.
"""

from tpu_flash.bench.quality import quant_quality_report
from tpu_flash.models import TINY_TEST, FlashTransformer

import jax

PROMPTS = [
    [3, 14, 15, 9, 2, 6, 53, 58],
    [97, 93, 23, 84, 62, 64, 33, 83],
]


def test_int8_cache_reproduces_fp_generation():
    model = FlashTransformer(TINY_TEST)
    params = model.init(jax.random.PRNGKey(0))
    report = quant_quality_report(
        model,
        params,
        PROMPTS,
        max_new_tokens=8,
        kv_dtypes=("int8",),
        baseline_dtype="float32",
    )
    r = report["int8"]
    assert r["n_tokens"] == 16.0
    assert r["prefix_match"] >= 0.95, report
    assert r["positionwise_match"] >= 0.95, report
