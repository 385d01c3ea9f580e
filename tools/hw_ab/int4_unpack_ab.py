#!/usr/bin/env python
"""ROADMAP R8 re-justification probe (VERDICT r4 item 6): measure the
int4 nibble-unpack tax at PRODUCTION page sizes under the honest
protocol, paired in ONE process so relay session wobble cancels.

R8 (pre-separated nibble-plane page format) was scoped on the ps=128-era
number (174 us unpack vs ~90 us byte floor at 8K). The honest-protocol
re-measurement said 15-25 us at ps=1024 (BENCHLOG "RESOLVED-BY-TUNING").
This probe decides R8's fate: the nibble-plane format's CEILING is the
int4-minus-int8-scaled delta — int4 moves HALF the payload bytes of
int8, so with a free unpack int4 decode should cost ~(int8_kv_time/2 +
fixed); any excess above that is what a page-format change could
recover.

Run:  python tools/hw_ab/int4_unpack_ab.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from tpu_flash.bench.suite import bench_decode_tokens_per_s  # noqa: E402


def main():
    rows = []
    for ps in (512, 1024):
        for dtype in ("int8", "int4", "int4g32"):
            tps, secs, gbps = bench_decode_tokens_per_s(
                context=8192, kv_quant=dtype, page_size=ps, iters=64,
            )
            rows.append({
                "kv": dtype, "ps": ps, "tokens_per_s": round(tps, 1),
                "step_us": round(secs * 1e6, 2),
                "kv_hbm_gbps": round(gbps, 1),
            })
            print(f"  {dtype} ps{ps}: {tps:.0f} tok/s "
                  f"({secs * 1e6:.1f} us/step, {gbps:.0f} GB/s)",
                  file=sys.stderr)
    for ps in (512, 1024):
        i8 = next(r for r in rows if r["kv"] == "int8" and r["ps"] == ps)
        i4 = next(r for r in rows if r["kv"] == "int4" and r["ps"] == ps)
        delta = i4["step_us"] - i8["step_us"]
        # int4 payload is half int8's; scales identical. If unpack were
        # free, int4 would save ~half the int8 KV-read time. The
        # nibble-plane ceiling = measured int4 step - (int8 step - half
        # its KV-read share); report the raw delta as the upper bound.
        print(f"ps{ps}: int4 - int8 = {delta:+.1f} us/step "
              f"({100 * delta / i8['step_us']:+.1f}% vs int8) — "
              f"nibble-plane format can recover AT MOST this plus the "
              f"halved-payload advantage int4 isn't showing",
              file=sys.stderr)
        rows.append({"kv": "delta", "ps": ps,
                     "int4_minus_int8_us": round(delta, 2),
                     "pct_vs_int8": round(100 * delta / i8["step_us"], 1)})
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
