"""Paired-q triangular geometry A/B at 8K causal (VERDICT r3 item 5 /
ROADMAP R1): tri (per-q-block cells, diag_sub == block default) vs
tri_pair (two adjacent q-blocks share each K/V fetch — ~45% less K/V
HBM traffic at 8 q-blocks). In-process paired runs, honest chained
protocol. Usage: python tools/hw_ab/tri_pair_ab.py [seq]
"""

import os
import sys

sys.path.insert(
    0,
    os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ),
)

from tpu_flash.bench.suite import bench_flash_prefill
from tpu_flash.core.config import BlockSizes


def run(seq=8192, heads=8):
    variants = [
        ("tri-1024", BlockSizes(block_q=1024, block_kv_major=1024,
                                block_kv=1024, triangular=True)),
        ("pair-1024", BlockSizes(block_q=1024, block_kv_major=1024,
                                 block_kv=1024, triangular=True,
                                 tri_pair=True)),
        ("pair-512", BlockSizes(block_q=512, block_kv_major=512,
                                block_kv=512, triangular=True,
                                tri_pair=True)),
        ("tri-1024b", BlockSizes(block_q=1024, block_kv_major=1024,
                                 block_kv=1024, triangular=True)),
        ("pair-1024b", BlockSizes(block_q=1024, block_kv_major=1024,
                                  block_kv=1024, triangular=True,
                                  tri_pair=True)),
    ]
    for name, bs in variants:
        r = bench_flash_prefill(
            batch=1, num_q_heads=heads, num_kv_heads=heads, seq=seq,
            head_dim=128, causal=True, block_sizes=bs,
        )
        print(f"{name}: {r.tflops:.1f} TF/s ({r.seconds * 1e3:.3f} ms)")


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 8192)
