"""Stage-by-stage timing of the tile-binned tri pipeline on the live backend.

Each stage is timed as an incremental jit: stage k's function runs stages
1..k and reduces the result to a scalar (the remote runtime does not block
on block_until_ready, so a host scalar pull is the only reliable fence).
Stage cost = time(1..k) - time(1..k-1). Run on the real TPU:

    python tools/profile_tri_stages.py [n_tris] [size] [views]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    n_views = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    import jax
    import jax.numpy as jnp

    from bench import _build
    from dmesh_renderer_tpu.ops import tri_binned as tb
    from dmesh_renderer_tpu.ops.binning import (
        align_to_slabs, aligned_capacity, emit_and_sort,
        recommended_key_capacity, recommended_run_capacity,
    )
    from dmesh_renderer_tpu.ops.geometry import preprocess_faces, project_verts
    from dmesh_renderer_tpu.ops.rays import generate_rays

    H = W = size
    (verts, faces, vcolor, fopacity, mv_t, proj_t, inv_mv_t, inv_proj_t,
     vdepth, fintense) = _build(n_tris, n_views, H, W)
    # same measured+margin sizing as bench.py
    kcap = recommended_key_capacity(verts, faces, mv_t, proj_t, H, W,
                                    margin=1.03125, bucket=8192)
    rcap = recommended_run_capacity(verts, faces, mv_t, proj_t, H, W,
                                    margin=1.03125, bucket=8192)
    args = tuple(map(jnp.asarray, (
        verts, faces, vcolor, fopacity, mv_t, proj_t, inv_mv_t, inv_proj_t,
        vdepth, fintense)))
    bg = jnp.asarray(np.array([0.1, 0.1, 0.1], np.float32))

    B = n_views
    gx = (W + tb.TILE - 1) // tb.TILE
    gy = (H + tb.TILE - 1) // tb.TILE
    n_tiles = B * gx * gy
    cap = aligned_capacity(kcap, n_tiles, tb.SLAB)

    def csum(t):
        return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(t))

    def s_project(a):
        ndc, img = project_verts(a[0], a[4], a[5], W, H)
        pre = preprocess_faces(ndc, img, a[1], W, H, tb.TILE, tb.TILE)
        return ndc, img, pre

    def s_emit(a):
        ndc, img, pre = s_project(a)
        raw = emit_and_sort(pre, gx, gy, kcap, tile_px=tb.TILE,
                            run_cap=rcap)
        return img, pre, raw

    def s_align(a):
        img, pre, raw = s_emit(a)
        keys = align_to_slabs(raw, n_tiles, tb.SLAB, cap)
        return img, keys

    def s_attrs(a):
        img, keys = s_align(a)
        cam_o = a[6][:, 3, :3]
        face_tab = tb._build_face_table(
            a[0], a[1], a[2], a[3], a[8], a[9], img, cam_o)
        attr_tab = tb._build_slot_attrs(face_tab, keys)
        return keys, attr_tab

    def s_fwd(a):
        keys, attr_tab = s_attrs(a)
        ray_o, ray_d = generate_rays(a[6], a[7], W, H, norm_eps_mode="tri")
        rayd_t = tb._tileify(ray_d, B, H, W, gx, gy)
        pix_t = tb._pixel_coords(B, gx, gy)
        out, _bits = tb._run_fwd_kernel(keys.starts, keys.ends, attr_tab,
                                 rayd_t, pix_t, n_tiles, H, W)
        return out

    def s_full_fwd(a):
        c, d = tb.render_tri_binned(
            a[0], a[1], a[2], a[3], a[4], a[5], a[6], a[7], a[8], a[9],
            bg, H, W, kcap, False, rcap)
        return c, d

    def loss(verts, vcolor, fo, vdepth, fint):
        c, d = tb.render_tri_binned(
            verts, args[1], vcolor, fo, args[4], args[5], args[6],
            args[7], vdepth, fint, bg, H, W, kcap, False, rcap)
        return jnp.sum(c) + jnp.sum(d)

    grad_fn = jax.grad(loss, argnums=(0, 1, 2, 3, 4))

    def s_fwd_bwd(a):
        return csum(grad_fn(a[0], a[2], a[3], a[8], a[9]))

    stages = [
        ("project+faces", s_project),
        ("emit+sort", s_emit),
        ("align", s_align),
        ("attr gathers", s_attrs),
        ("fwd kernel", s_fwd),
        ("full fwd (api)", s_full_fwd),
        ("fwd+bwd", s_fwd_bwd),
    ]

    def timed(fn, iters=5):
        f = jax.jit(lambda a: csum(fn(a)))
        float(f(args))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(f(args))
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1000

    prev = 0.0
    print(f"config: {n_tris} tris, {size}x{size}, B={n_views}, kcap={kcap}")
    for name, fn in stages:
        ms = timed(fn)
        print(f"{name:>16}: {ms:8.2f} ms cumulative   (+{ms - prev:7.2f})")
        prev = ms


if __name__ == "__main__":
    main()
