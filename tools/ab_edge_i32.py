"""A/B the raw-i32 edge-coefficient slab (DMRT_EDGE_I32).

Runs bench.bench_tri_scaled twice in one process -- split-half edge
decoding (default) vs the raw int32 second slab (tri_binned._edge_i32) --
on the live backend. The flag is read at trace time, so flipping the env
var between jit traces is enough. Run on the real TPU:

    python tools/ab_edge_i32.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from bench import bench_tri_scaled

    os.environ.pop("DMRT_EDGE_I32", None)
    ms1 = bench_tri_scaled(iters=3)
    print(f"EDGE_I32=0: {ms1:8.3f} ms/frame", flush=True)

    os.environ["DMRT_EDGE_I32"] = "1"
    ms2 = bench_tri_scaled(iters=3)
    print(f"EDGE_I32=1: {ms2:8.3f} ms/frame", flush=True)
    print(f"delta: {ms1 - ms2:+.3f} ms ({(ms1 - ms2) / ms1 * 100:+.1f}%)")


if __name__ == "__main__":
    main()
