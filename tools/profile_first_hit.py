"""Split the tet binned first-hit's cost (incremental jits, chained).

Stages: preprocess -> emit+sort+align -> attr tables -> kernel.
Also times the forward's non-march prologue (first-tet selection etc.)
by running a max_steps=0 forward.

Run: python tools/profile_first_hit.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 6


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from dmesh_renderer_tpu.ops import tet as tet_mod
    from dmesh_renderer_tpu.ops import tet_first_hit as fh
    from dmesh_renderer_tpu.ops.binning import (
        align_to_slabs, aligned_capacity, emit_and_sort,
    )
    from dmesh_renderer_tpu.ops.tri_binned import (
        TILE, _build_face_table, _build_slot_attrs, _tileify,
    )
    from dmesh_renderer_tpu.ops.geometry import project_verts
    from dmesh_renderer_tpu.ops.rays import generate_rays
    from dmesh_renderer_tpu.ops.geometry import preprocess_faces
    from dmesh_renderer_tpu.runtime.native import build_tet_connectivity
    from dmesh_renderer_tpu.utils.connectivity import freudenthal_grid
    from bench import _build

    H = W = 800
    B = 1
    verts, tets = freudenthal_grid(20, jitter=0.15, seed=2)
    faces, face_tets, tet_faces = build_tet_connectivity(tets)
    mv, proj = _build(1, 1, H, W)[4:6]
    inv_mv = np.linalg.inv(mv)
    inv_proj = np.linalg.inv(proj)
    verts, faces = jnp.asarray(verts), jnp.asarray(faces)
    mv_t, proj_t = jnp.asarray(mv), jnp.asarray(proj)
    inv_mv_t, inv_proj_t = jnp.asarray(inv_mv), jnp.asarray(inv_proj)

    from dmesh_renderer_tpu.ops.binning import default_key_capacity
    kcap = default_key_capacity(B, int(faces.shape[0]),
                                avg_tiles_per_face=5)
    gx = (W + TILE - 1) // TILE
    gy = (H + TILE - 1) // TILE
    n_tiles = B * gx * gy
    cap = aligned_capacity(kcap, n_tiles, fh.SLAB)
    print(f"faces {faces.shape[0]}, kcap {kcap}, cap {cap}, "
          f"tiles {n_tiles}")

    def chain(fn):
        def wrapped(x):
            def it(c, _):
                return fn(c), 0.0
            out, _ = lax.scan(it, x, None, length=REPS)
            return out
        return wrapped

    def timeit(name, fn, x):
        f = jax.jit(chain(fn))
        o = f(x)
        jax.block_until_ready(o)
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            o = f(x)
            float(jnp.sum(o))
            ts.append(time.perf_counter() - t0)
        print(f"{name:>22}: {min(ts)*1000/REPS:8.2f} ms", flush=True)

    v0 = verts

    def s_pre(v):
        ndc, img = project_verts(v, mv_t, proj_t, W, H)
        pre = preprocess_faces(ndc, img, faces, W, H, TILE, TILE)
        return v + 1e-30 * (jnp.sum(pre["min_depth"]) + jnp.sum(img))

    timeit("preprocess", s_pre, v0)

    def s_emit(v):
        ndc, img = project_verts(v, mv_t, proj_t, W, H)
        pre = preprocess_faces(ndc, img, faces, W, H, TILE, TILE)
        raw = emit_and_sort(pre, gx, gy, kcap, sort_by="min_depth")
        keys = align_to_slabs(raw, n_tiles, fh.SLAB, cap)
        return v + 1e-30 * (jnp.sum(keys.starts) + jnp.sum(keys.flat))

    timeit("+emit+sort+align", s_emit, v0)

    def s_attr(v):
        ndc, img = project_verts(v, mv_t, proj_t, W, H)
        pre = preprocess_faces(ndc, img, faces, W, H, TILE, TILE)
        raw = emit_and_sort(pre, gx, gy, kcap, sort_by="min_depth")
        keys = align_to_slabs(raw, n_tiles, fh.SLAB, cap)
        F = faces.shape[0]
        P = v.shape[0]
        face_tab = _build_face_table(
            v, faces, jnp.zeros((P, 3), jnp.float32),
            jnp.zeros((F,), jnp.float32), jnp.zeros((B, P), jnp.float32),
            jnp.zeros((B, F), jnp.float32), img, inv_mv_t[:, 3, :3],
            min_depth=pre["min_depth"], max_depth=pre["max_depth"],
        )
        attr_tab = _build_slot_attrs(face_tab, keys)
        return v + 1e-30 * jnp.sum(attr_tab[:, 0])

    timeit("+attr tables", s_attr, v0)

    def s_full(v):
        ndc, img = project_verts(v, mv_t, proj_t, W, H)
        pre = preprocess_faces(ndc, img, faces, W, H, TILE, TILE)
        _ro, ray_d = generate_rays(inv_mv_t, inv_proj_t, W, H,
                                   norm_eps_mode="tet")
        ff, rt, iu, iv, _aux = fh.first_intersection_binned(
            v, faces, pre, img, inv_mv_t[:, 3, :3], ray_d, H, W, B, kcap)
        return v + 1e-30 * (jnp.sum(rt) + jnp.sum(iu))

    timeit("full first-hit", s_full, v0)


if __name__ == "__main__":
    main()
