"""Root-cause the tet B=2 super-linearity (VERDICT r4 #1).

Hypotheses:
  H1 camera-difficulty conflation: bench "ms/view at B=2" averages two
     DIFFERENT cameras (ring angle 0.3 and pi+0.3). If view 1 alone is
     intrinsically slower (deeper walks), the per-view average rises with
     no pipeline regression at all.
  H2 lockstep union: the march runs max(p100_view0, p100_view1) steps over
     the union buffer -- if depths differ, the shallow view pays the deep
     view's step count.
  H3 a real B>=2 pipeline cliff (scatter target, capacity, compile shapes).

Measures, per camera set [view0], [view1], [view0, view1]:
  - walk-depth stats (n_contrib p50/p100 per view)
  - fwd+bwd ms/view at chain=4
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import _build
from dmesh_renderer_tpu.ops.binning import recommended_key_capacity
from dmesh_renderer_tpu.ops.tet import (
    LOG_CAP, _render_tet_forward, render_tet_core,
)
from dmesh_renderer_tpu.runtime.native import build_tet_connectivity
from dmesh_renderer_tpu.utils.connectivity import freudenthal_grid

H = W = 800

verts, tets = freudenthal_grid(20, jitter=0.15, seed=2)
faces, face_tets, tet_faces = build_tet_connectivity(tets)
rng = np.random.RandomState(0)
vcolor = rng.rand(verts.shape[0], 3).astype(np.float32)
fopacity = rng.uniform(0.3, 0.9, faces.shape[0]).astype(np.float32)

mv2, proj2 = _build(1, 2, H, W)[4:6]  # both ring cameras, transposed

out = {}
for name, sel in [("view0", [0]), ("view1", [1]), ("both", [0, 1])]:
    B = len(sel)
    mv = mv2[sel]
    proj = proj2[sel]
    fint = rng.uniform(0.5, 1.0, (B, faces.shape[0])).astype(np.float32)
    kcap = recommended_key_capacity(verts, faces, mv, proj, H, W,
                                    exact=False, margin=1.03125, bucket=8192)
    a = tuple(map(jnp.asarray, (
        verts, faces, vcolor, fopacity, mv, proj,
        np.linalg.inv(mv), np.linalg.inv(proj), fint,
        tets, face_tets, tet_faces)))
    bg = jnp.asarray(np.array([0.1, 0.1, 0.1], np.float32))

    @jax.jit
    def depth_stats():
        _c, _d, _act, saved = _render_tet_forward(
            a[0], a[1], a[2], a[3], a[4], a[5], a[6], a[7], a[8],
            a[9], a[10], a[11], bg, H, W, 0, LOG_CAP, kcap)
        nc = saved["n_contrib"].reshape(B, -1)
        return (jnp.percentile(nc.astype(jnp.float32), 50, axis=1),
                jnp.max(nc, axis=1), jnp.sum(nc))

    p50, p100, events = depth_stats()
    out[f"{name}_p50"] = [float(x) for x in np.array(p50)]
    out[f"{name}_p100"] = [int(x) for x in np.array(p100)]
    out[f"{name}_blend_events"] = int(events)
    print(name, "p50", out[f"{name}_p50"], "p100", out[f"{name}_p100"],
          "events", out[f"{name}_blend_events"], flush=True)

    def loss(vc, fo):
        c, d, _ = render_tet_core(
            a[0], a[1], vc, fo, a[4], a[5], a[6], a[7], a[8],
            a[9], a[10], a[11], bg, H, W, 0, max_steps=LOG_CAP, kcap=kcap)
        return jnp.sum(c) + jnp.sum(d)

    grad_fn = jax.grad(loss, argnums=(0, 1))

    @jax.jit
    def gsteps(fo):
        def body(fo, _):
            gs = grad_fn(a[2], fo)
            return fo - 1e-6 * gs[1], jnp.sum(gs[0])
        fo, acc = jax.lax.scan(body, fo, None, length=4)
        return jnp.sum(acc)

    float(gsteps(a[3]))
    ts = []
    for it in range(2):
        t0 = time.perf_counter()
        float(gsteps(a[3] * (1.0 - 1e-3 * (it + 1))))
        ts.append(time.perf_counter() - t0)
    out[f"{name}_ms_per_view"] = round(min(ts) * 1000 / (B * 4), 2)
    print(name, "ms/view:", out[f"{name}_ms_per_view"], flush=True)

print(json.dumps(out))
