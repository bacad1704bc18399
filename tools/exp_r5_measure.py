"""Round-5 headline measurements after the mega-split + backward levers.

1. tet B=1 and B=2 fwd+bwd at matched protocol (chain=8, iters=3) --
   VERDICT r4 #1 done-criterion: B=2 per-view within ~1.15x of B=1.
2. tri headline (chain=16) with livebit+zdma+slabskip, plus A/B of the
   two new levers (zdma, slabskip) at chain=8.

Run stages are independent; each prints as it lands.
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")

out = {}


def p(k, v):
    out[k] = round(v, 2)
    print(f"{k}: {v:.2f}", flush=True)


stage = sys.argv[1] if len(sys.argv) > 1 else "all"

if stage in ("tet", "all"):
    from bench import bench_tet_scaled

    ms1, _ = bench_tet_scaled(n_views=1, chain=8, iters=3)
    p("tet_B1", ms1)
    ms2, _ = bench_tet_scaled(n_views=2, chain=8, iters=3)
    p("tet_B2_per_view", ms2)
    p("tet_B2_over_B1", ms2 / ms1)

if stage in ("tri", "all"):
    from bench import bench_tri_scaled

    p("tri_headline_chain16", bench_tri_scaled(iters=3, chain=16))

if stage in ("tri_ab", "all"):
    import importlib

    import bench

    for name, env in (
        ("tri_all_on", {}),
        ("tri_no_slabskip", {"DMRT_BWD_SLABSKIP": "0"}),
        ("tri_no_zdma_no_skip", {"DMRT_BWD_SLABSKIP": "0",
                                 "DMRT_BWD_ZDMA": "0"}),
    ):
        for k in ("DMRT_BWD_SLABSKIP", "DMRT_BWD_ZDMA"):
            os.environ.pop(k, None)
        os.environ.update(env)
        importlib.reload(bench)
        p(name, bench.bench_tri_scaled(iters=3, chain=8))
    for k in ("DMRT_BWD_SLABSKIP", "DMRT_BWD_ZDMA"):
        os.environ.pop(k, None)

print(json.dumps(out))
