"""Stage timing + march statistics for the tet renderer at scale.

Times first-hit / forward / forward+backward separately (chained inside one
jit to amortize the remote runtime's fixed dispatch cost) and reports the
march-length distribution (n_contrib) that governs the lockstep while_loop.

Run: python tools/profile_tet_stages.py [n_grid] [size]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_grid = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 800

    import jax
    import jax.numpy as jnp
    from jax import lax

    from dmesh_renderer_tpu.ops import tet as tet_mod
    from dmesh_renderer_tpu.ops.tet import render_tet_core, _render_tet_forward
    from dmesh_renderer_tpu.runtime.native import build_tet_connectivity
    from dmesh_renderer_tpu.utils.connectivity import freudenthal_grid
    from bench import _build

    H = W = size
    verts, tets = freudenthal_grid(n_grid, jitter=0.15, seed=2)
    faces, face_tets, tet_faces = build_tet_connectivity(tets)
    rng = np.random.RandomState(0)
    vcolor = rng.rand(verts.shape[0], 3).astype(np.float32)
    fopacity = rng.uniform(0.3, 0.9, faces.shape[0]).astype(np.float32)
    fintense = rng.uniform(0.5, 1.0, (1, faces.shape[0])).astype(np.float32)
    mv, proj = _build(1, 1, H, W)[4:6]

    args = tuple(map(jnp.asarray, (
        verts, faces, vcolor, fopacity, mv, proj,
        np.linalg.inv(mv), np.linalg.inv(proj), fintense,
        tets, face_tets, tet_faces,
    )))
    bg = jnp.asarray(np.array([0.1, 0.1, 0.1], np.float32))
    print(f"scene: {faces.shape[0]} faces, {tets.shape[0]} tets, {size}px")

    def timed(name, make_fn, reps=2, iters=3):
        @jax.jit
        def chained(fo):
            def body(fo, _):
                out = make_fn(fo)
                return fo + 1e-12 * out, out
            fo, outs = lax.scan(body, fo, None, length=reps)
            return jnp.sum(outs)

        float(chained(args[3]))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(chained(args[3]))
            ts.append(time.perf_counter() - t0)
        ms = min(ts) * 1000 / reps
        print(f"{name:>28}: {ms:8.2f} ms")
        return ms

    # 1. first-hit only
    from dmesh_renderer_tpu.ops.binning import default_key_capacity
    from dmesh_renderer_tpu.ops.geometry import (
        preprocess_faces, project_verts,
    )
    from dmesh_renderer_tpu.ops.rays import generate_rays
    from dmesh_renderer_tpu.ops.tet_first_hit import first_intersection_binned
    from dmesh_renderer_tpu.ops.tri_binned import TILE as KTILE

    def fh_only(fo):
        ndc, img = project_verts(args[0], args[4], args[5], W, H)
        pre = preprocess_faces(ndc, img, args[1], W, H, KTILE, KTILE)
        ray_o, ray_d = generate_rays(args[6], args[7], W, H,
                                     norm_eps_mode="tet")
        kcap = default_key_capacity(1, args[1].shape[0], avg_tiles_per_face=8)
        ff, rt, iu, iv, _aux = first_intersection_binned(
            args[0], args[1], pre, img, args[6][:, 3, :3], ray_d, H, W, 1,
            kcap)
        return jnp.sum(rt) + jnp.sum(ff) + jnp.sum(fo)

    timed("first-hit (binned)", fh_only)

    # 2. forward only
    def fwd_only(fo):
        c, d, a = render_tet_core(
            args[0], args[1], args[2], fo, args[4], args[5], args[6],
            args[7], args[8], args[9], args[10], args[11], bg, H, W, 0)
        return jnp.sum(c) + jnp.sum(d)

    timed("forward", fwd_only)

    # 3. fwd + bwd
    def loss(vcolor, fo):
        c, d, _a = render_tet_core(
            args[0], args[1], vcolor, fo, args[4], args[5], args[6],
            args[7], args[8], args[9], args[10], args[11], bg, H, W, 0)
        return jnp.sum(c) + jnp.sum(d)

    gf = jax.grad(loss, argnums=(0, 1))

    def fwdbwd(fo):
        g = gf(args[2], fo)
        return jnp.sum(g[0]) + jnp.sum(g[1])

    timed("fwd+bwd", fwdbwd)

    # 4. march statistics from the saved forward state
    @jax.jit
    def stats(fo):
        _c, _d, _a, saved = _render_tet_forward(
            args[0], args[1], args[2], fo, args[4], args[5], args[6],
            args[7], args[8], args[9], args[10], args[11], bg, H, W, 0,
            tet_mod.DEFAULT_MAX_MARCH_STEPS)
        return saved["n_contrib"], saved["is_active"]

    nc, act = jax.device_get(stats(args[3]))
    nc = nc.ravel()
    act = act.ravel()
    print(f"\nmarch stats over {nc.size} rays:")
    print(f"  active: {act.mean():.3f}  hit (nc>0): {(nc > 0).mean():.3f}")
    for q in (50, 90, 99, 99.9, 100):
        print(f"  n_contrib p{q}: {np.percentile(nc, q):.0f}")
    alive_at = {
        k: int((nc >= k).sum()) for k in (1, 2, 4, 8, 16, 32, 64, 128, 256)
    }
    print(f"  rays alive at step k: {alive_at}")
    print(f"  total blend steps: {int(nc.sum())}")


if __name__ == "__main__":
    main()
