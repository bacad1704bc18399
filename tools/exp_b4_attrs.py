"""B=1/2/4 per-view cost with the attr-table residual kept vs recomputed
(VERDICT r2 W2 / task 3: test the residual-memory hypothesis for the
super-linear B=4 backward degradation).

Run: python tools/exp_b4_attrs.py [recompute01] [views...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import dmesh_renderer_tpu.ops.tri_binned as tb
    import bench

    rec = bool(int(sys.argv[1])) if len(sys.argv) > 1 else False
    views = [int(v) for v in sys.argv[2:]] or [1, 2, 4]
    tb.RECOMPUTE_BWD_ATTRS = rec
    print(f"RECOMPUTE_BWD_ATTRS={rec}")
    for b in views:
        ms = bench.bench_tri_scaled(n_views=b, chain=2, iters=3)
        print(f"B={b}: {ms:8.2f} ms/view (fwd+bwd, all five grads)",
              flush=True)


if __name__ == "__main__":
    main()
