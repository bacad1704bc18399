"""Re-measure the B=2 march slope after the materialized per-view mega
tables (_split_mega_views). Expect ~6.2-6.6 ms/step (size-linear; the
800x1600 single-view control measured 6.64) vs the 14.5 before the fix.
Also re-times max_steps=17 as a full-frame forward proxy.
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
B = 2
verts, tets = freudenthal_grid(20, jitter=0.15, seed=2)
faces, face_tets, tet_faces = build_tet_connectivity(tets)
rng = np.random.RandomState(0)
vcolor = rng.rand(verts.shape[0], 3).astype(np.float32)
fopacity = rng.uniform(0.3, 0.9, faces.shape[0]).astype(np.float32)
mv, proj = _build(1, B, H, W)[4:6]
fint = rng.uniform(0.5, 1.0, (B, faces.shape[0])).astype(np.float32)
kcap = recommended_key_capacity(verts, faces, mv, proj, H, W,
                                exact=False, margin=1.03125, bucket=8192)
a = tuple(map(jnp.asarray, (
    verts, faces, vcolor, fopacity, mv, proj,
    np.linalg.inv(mv), np.linalg.inv(proj), fint,
    tets, face_tets, tet_faces)))
bg = jnp.asarray(np.array([0.1, 0.1, 0.1], np.float32))

out = {}
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
    out[f"steps{ms_steps}"] = round(v, 2)
    print(f"B=2 max_steps={ms_steps}: {v:8.2f} ms", flush=True)
sl = (out["steps9"] - out["steps1"]) / 8
out["slope_1_9"] = round(sl, 2)
print(f"B=2 after fix: slope {sl:.2f} ms/step "
      f"(before: 14.5; size-linear control: 6.64)", flush=True)
print(json.dumps(out))
