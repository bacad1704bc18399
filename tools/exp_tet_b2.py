"""VERDICT r4 #1: reconcile the tet B=2 number (BENCH_r04 197.8 ms/view at
chain=4/iters=2 vs BASELINE.md's 129.2).

Hypotheses: (a) measurement artifact of the short chain/iters; (b) real
B>=2 super-linearity in the tet path (lockstep march over the union of the
views' walks, first-hit capacity, replay batch shapes crossing the
~20-30 MB scatter target cliff at 2x M rows).

This runs bench_tet_scaled at B=1 and B=2 with MATCHED chain/iters and
prints ms/view for each, then (if super-linear) the stage split at B=2
via one-shot jits like tools/profile_tet_stages.py.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import bench_tet_scaled  # noqa: E402

out = {}
for n_views, chain, iters in [(1, 8, 3), (2, 8, 3), (2, 4, 2)]:
    t0 = time.time()
    ms, nfaces = bench_tet_scaled(n_views=n_views, chain=chain, iters=iters)
    out[f"B{n_views}_chain{chain}_iters{iters}"] = round(ms, 2)
    print(f"B={n_views} chain={chain} iters={iters}: {ms:.2f} ms/view "
          f"(wall {time.time()-t0:.0f}s incl compile)", flush=True)

print(json.dumps(out))
