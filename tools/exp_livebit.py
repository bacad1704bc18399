"""A/B the backward liveness-bit skip (VERDICT r4 #2, DMRT_BWD_LIVEBIT).

The forward kernel records a per-visit any-pixel-blended bit; the backward
branches on it as ONE SMEM scalar before any vector work, skipping the
coverage pass AND the heavy gradient math on dead visits (38.8% of walked
visits at the bench scene). Unlike the round-4 per-visit
lax.cond(jnp.any(active)) -- which lost because it computed the full
coverage pass before it could branch -- this branch costs a scalar
compare.

Runs bench_tri_scaled at the headline scene with the bit off/on.
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")

out = {}
for flag in ("0", "1"):
    os.environ["DMRT_BWD_LIVEBIT"] = flag
    from bench import bench_tri_scaled  # re-read each trace

    ms = bench_tri_scaled(iters=3, chain=8)
    out[f"livebit_{flag}"] = round(ms, 2)
    print(f"DMRT_BWD_LIVEBIT={flag}: {ms:.2f} ms/frame", flush=True)

print(json.dumps(out))
