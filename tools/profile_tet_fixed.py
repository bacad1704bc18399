"""Bisect the tet forward's FIXED (non-march) cost by timing jitted
prefixes of _render_tet_forward's pipeline.

Run on TPU: python tools/profile_tet_fixed.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from dmesh_renderer_tpu.ops import tet as tm
    from dmesh_renderer_tpu.ops.geometry import preprocess_faces, project_verts
    from dmesh_renderer_tpu.ops.rays import generate_rays
    from dmesh_renderer_tpu.runtime.native import build_tet_connectivity
    from dmesh_renderer_tpu.utils.connectivity import freudenthal_grid
    from bench import _build

    H = W = 800
    verts, tets = freudenthal_grid(20, jitter=0.15, seed=2)
    faces, face_tets, tet_faces = build_tet_connectivity(tets)
    rng = np.random.RandomState(0)
    vcol = rng.rand(verts.shape[0], 3).astype(np.float32)
    fop = rng.uniform(0.3, 0.9, faces.shape[0]).astype(np.float32)
    fint = rng.uniform(0.5, 1.0, (1, faces.shape[0])).astype(np.float32)
    mv, proj = _build(1, 1, H, W)[4:6]
    A = tuple(map(jnp.asarray, (
        verts, faces, vcol, fop, mv, proj,
        np.linalg.inv(mv), np.linalg.inv(proj), fint, tets, face_tets,
        tet_faces)))
    bg = jnp.zeros(3)
    B, N = 1, H * W

    def timeit(name, fn):
        f = jax.jit(fn)
        float(f(*A))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(*A))
            ts.append(time.perf_counter() - t0)
        print(f"{name:>42}: {min(ts)*1000:8.1f} ms")
        return min(ts) * 1000

    def csum(*xs):
        return sum(jnp.sum(x.astype(jnp.float32)) for x in xs)

    def s1(verts, faces, vcol, fop, mv_t, proj_t, imv, ipj, fint, tets,
           ft, tf):
        ndc, img = project_verts(verts, mv_t, proj_t, W, H)
        from dmesh_renderer_tpu.ops.tri_binned import TILE
        pre = preprocess_faces(ndc, img, faces, W, H, TILE, TILE)
        return csum(pre["depth"], pre["tiles"])

    timeit("1 project+preprocess", s1)

    def s2(verts, faces, vcol, fop, mv_t, proj_t, imv, ipj, fint, tets,
           ft, tf):
        ray_o, ray_d = generate_rays(imv, ipj, W, H, norm_eps_mode="tet",
                                     jitter_seed=1)
        return csum(ray_o, ray_d)

    timeit("2 generate_rays (jittered)", s2)

    def s3(verts, faces, vcol, fop, mv_t, proj_t, imv, ipj, fint, tets,
           ft, tf):
        ndc, img = project_verts(verts, mv_t, proj_t, W, H)
        from dmesh_renderer_tpu.ops.binning import default_key_capacity
        from dmesh_renderer_tpu.ops.tet_first_hit import (
            first_intersection_binned,
        )
        from dmesh_renderer_tpu.ops.tri_binned import TILE
        pre = preprocess_faces(ndc, img, faces, W, H, TILE, TILE)
        ray_o, ray_d = generate_rays(imv, ipj, W, H, norm_eps_mode="tet",
                                     jitter_seed=1)
        kcap = default_key_capacity(B, faces.shape[0], avg_tiles_per_face=8)
        ff, rt, iu, iv, _aux = first_intersection_binned(
            verts, faces, pre, img, imv[:, 3, :3], ray_d, H, W, B, kcap)
        return csum(ff, rt)

    timeit("3 (1)+(2)+binned first-hit", s3)

    def s4(verts, faces, vcol, fop, mv_t, proj_t, imv, ipj, fint, tets,
           ft, tf):
        march = tm._march_tables(verts, faces, tets, tf, ft, vcol, fop, fint)
        return csum(march["tet_pack"], march["shade"])

    timeit("4 march tables alone", s4)

    def s5(verts, faces, vcol, fop, mv_t, proj_t, imv, ipj, fint, tets,
           ft, tf):
        c, d, a, _ = tm._render_tet_forward(
            verts, faces, vcol, fop, mv_t, proj_t, imv, ipj, fint, tets,
            ft, tf, bg, H, W, 1, 0)
        return csum(c, d)

    timeit("5 full forward, max_steps=0", s5)

    def s6(verts, faces, vcol, fop, mv_t, proj_t, imv, ipj, fint, tets,
           ft, tf):
        c, d, a, _ = tm._render_tet_forward(
            verts, faces, vcol, fop, mv_t, proj_t, imv, ipj, fint, tets,
            ft, tf, bg, H, W, 1, 512)
        return csum(c, d)

    timeit("6 full forward, max_steps=512", s6)


if __name__ == "__main__":
    main()
