"""Stage split of the tet B=2 super-linearity (VERDICT r4 #1, step 2).

exp_b2_split.py established H3 (a real pipeline effect: each view alone is
~128 ms, together 198/view, identical walk stats). This splits first-hit /
forward-march / replay-backward at B=1 and B=2 to find which stage scales
super-linearly.
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
from dmesh_renderer_tpu.ops.geometry import preprocess_faces, project_verts
from dmesh_renderer_tpu.ops.rays import generate_rays
from dmesh_renderer_tpu.ops.tet import LOG_CAP, render_tet_core
from dmesh_renderer_tpu.ops.tet_first_hit import first_intersection_binned
from dmesh_renderer_tpu.ops.tri_binned import TILE as KTILE
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

    def timed(name, make_fn, reps=3, iters=3):
        @jax.jit
        def chained(fo):
            def body(fo, _):
                o = make_fn(fo)
                return fo + 1e-12 * o, o
            fo, outs = lax.scan(body, fo, None, length=reps)
            return jnp.sum(outs)

        float(chained(a[3]))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(chained(a[3]))
            ts.append(time.perf_counter() - t0)
        ms = min(ts) * 1000 / reps
        out[f"B{B}_{name}"] = round(ms, 2)
        print(f"B={B} {name:>10}: {ms:8.2f} ms ({ms/B:7.2f} /view)",
              flush=True)
        return ms

    def fh_only(fo):
        ndc, img = project_verts(a[0], a[4], a[5], W, H)
        pre = preprocess_faces(ndc, img, a[1], W, H, KTILE, KTILE)
        _ro, ray_d = generate_rays(a[6], a[7], W, H, norm_eps_mode="tet")
        ff, rt, iu, iv, _aux = first_intersection_binned(
            a[0], a[1], pre, img, a[6][:, 3, :3], ray_d, H, W, B, kcap)
        return jnp.sum(rt) + jnp.sum(ff) + jnp.sum(fo)

    def fwd_only(fo):
        c, d, _ = render_tet_core(
            a[0], a[1], a[2], fo, a[4], a[5], a[6], a[7], a[8],
            a[9], a[10], a[11], bg, H, W, 0, max_steps=LOG_CAP, kcap=kcap)
        return jnp.sum(c) + jnp.sum(d)

    def loss(vc, fo):
        c, d, _ = render_tet_core(
            a[0], a[1], vc, fo, a[4], a[5], a[6], a[7], a[8],
            a[9], a[10], a[11], bg, H, W, 0, max_steps=LOG_CAP, kcap=kcap)
        return jnp.sum(c) + jnp.sum(d)

    gf = jax.grad(loss, argnums=(0, 1))

    def fwdbwd(fo):
        g = gf(a[2], fo)
        return jnp.sum(g[0]) + jnp.sum(g[1])

    timed("first_hit", fh_only)
    timed("forward", fwd_only)
    timed("fwd_bwd", fwdbwd)

for st in ("first_hit", "forward", "fwd_bwd"):
    r = out[f"B2_{st}"] / (2 * out[f"B1_{st}"])
    out[f"ratio_{st}"] = round(r, 3)
    print(f"{st}: B2/view / B1 = {r:.3f}")
print(json.dumps(out))
