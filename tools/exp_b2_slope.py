"""Per-step slope of the REAL tet forward at B=1 vs B=2 (VERDICT r4 #1).

All march pieces are sub-linear in isolation (exp_b2_march_pieces*), so
the B=2 super-linearity lives in the composed loop. Forward-only timings
at max_steps = 1 / 9 / 17 give setup (intercept) and per-step cost
(slope) for each B.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

from bench import _build
from dmesh_renderer_tpu.ops.binning import recommended_key_capacity
from dmesh_renderer_tpu.ops.tet import render_tet_core
from dmesh_renderer_tpu.runtime.native import build_tet_connectivity
from dmesh_renderer_tpu.utils.connectivity import freudenthal_grid

H = W = 800
verts, tets = freudenthal_grid(20, jitter=0.15, seed=2)
faces, face_tets, tet_faces = build_tet_connectivity(tets)
rng = np.random.RandomState(0)
vcolor = rng.rand(verts.shape[0], 3).astype(np.float32)
fopacity = rng.uniform(0.3, 0.9, faces.shape[0]).astype(np.float32)
mv2, proj2 = _build(1, 2, H, W)[4:6]

out = {}
for B in (1, 2):
    mv, proj = mv2[:B], proj2[:B]
    fint = rng.uniform(0.5, 1.0, (B, faces.shape[0])).astype(np.float32)
    kcap = recommended_key_capacity(verts, faces, mv, proj, H, W,
                                    exact=False, margin=1.03125, bucket=8192)
    a = tuple(map(jnp.asarray, (
        verts, faces, vcolor, fopacity, mv, proj,
        np.linalg.inv(mv), np.linalg.inv(proj), fint,
        tets, face_tets, tet_faces)))
    bg = jnp.asarray(np.array([0.1, 0.1, 0.1], np.float32))

    for ms_steps in (1, 9, 17):
        def fwd(fo):
            c, d, _ = render_tet_core(
                a[0], a[1], a[2], fo, a[4], a[5], a[6], a[7], a[8],
                a[9], a[10], a[11], bg, H, W, 0, max_steps=ms_steps,
                kcap=kcap)
            return jnp.sum(c) + jnp.sum(d)

        @jax.jit
        def chained(fo):
            def body(fo, _):
                o = fwd(fo)
                return fo + 1e-12 * o, o
            fo, outs = lax.scan(body, fo, None, length=3)
            return jnp.sum(outs)

        float(chained(a[3]))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(a[3]))
            ts.append(time.perf_counter() - t0)
        v = min(ts) * 1000 / 3
        out[f"B{B}_steps{ms_steps}"] = round(v, 2)
        print(f"B={B} max_steps={ms_steps}: {v:8.2f} ms", flush=True)

for B in (1, 2):
    s_early = (out[f"B{B}_steps9"] - out[f"B{B}_steps1"]) / 8
    s_late = (out[f"B{B}_steps17"] - out[f"B{B}_steps9"]) / 8
    out[f"B{B}_slope_1_9"] = round(s_early, 2)
    out[f"B{B}_slope_9_17"] = round(s_late, 2)
    print(f"B={B}: slope steps1-9 {s_early:.2f} ms/step, "
          f"steps9-17 {s_late:.2f} ms/step, setup {out[f'B{B}_steps1']:.1f}")
print(json.dumps(out))
