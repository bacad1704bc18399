"""A/B the backward-kernel face-loop software pipelining (DMRT_UNROLL).

Runs bench.bench_tri_scaled twice in one process -- default loop vs the
pair-unrolled loop with hoisted scalar loads (tri_binned._face_loop) -- on
the live backend. The flag is read at trace time, so flipping the env var
between jit traces is enough. Run on the real TPU:

    python tools/ab_unroll.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from bench import bench_tri_scaled

    os.environ["DMRT_UNROLL"] = "1"
    ms1 = bench_tri_scaled(iters=3)
    print(f"UNROLL=1: {ms1:8.3f} ms/frame", flush=True)

    os.environ["DMRT_UNROLL"] = "2"
    ms2 = bench_tri_scaled(iters=3)
    print(f"UNROLL=2: {ms2:8.3f} ms/frame", flush=True)
    print(f"delta: {ms1 - ms2:+.3f} ms ({(ms1 - ms2) / ms1 * 100:+.1f}%)")


if __name__ == "__main__":
    main()
