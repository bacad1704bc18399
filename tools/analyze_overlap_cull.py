"""Measure how many emitted (face, tile) pairs could be culled by an exact
conservative triangle-vs-tile edge test instead of the bbox rect.

The binning pipeline emits one slot per (face, tile) in the face's screen
bbox rect (like the reference's getRectFromTri). Thin/diagonal triangles
touch far fewer tiles than their bbox covers; every culled pair shrinks
every slot-scale stage (sort, align, attr gather, kernel slabs, backward
records, record scatter).

The test mirrors the kernel's fixed-point coverage: edge s_e(p) =
A_e px + B_e py + C_e >= 0 (with the top-left bias folded into C) for all
three edges. s_e is affine in p, so max over the tile's corner sample
points bounds max over all pixels in the tile: if max_corners s_e < 0 for
some edge, no pixel in the tile can be covered.

Run: python tools/analyze_overlap_cull.py [n_tris] [size]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 800

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bench import _build
    from dmesh_renderer_tpu.ops import tri_binned as tb
    from dmesh_renderer_tpu.ops.geometry import preprocess_faces, project_verts

    H = W = size
    (verts, faces, vcolor, fopacity, mv_t, proj_t, inv_mv_t, inv_proj_t,
     vdepth, fintense) = _build(n_tris, 1, H, W)

    ndc, img = project_verts(jnp.asarray(verts), jnp.asarray(mv_t),
                             jnp.asarray(proj_t), W, H)
    pre = preprocess_faces(ndc, img, jnp.asarray(faces), W, H,
                           tb.TILE, tb.TILE)

    tiles = np.asarray(pre["tiles"][0])          # [F] bbox tile counts
    rmin = np.asarray(pre["rect_min"][0])        # [F, 2]
    rmax = np.asarray(pre["rect_max"][0])        # [F, 2]
    img0 = np.asarray(img[0])                    # [P, 2] pixel coords

    fv = faces
    x = img0[fv, 0]  # [F, 3]
    y = img0[fv, 1]

    # fixed-point edge coefficients exactly as _build_face_table: 16
    # subpixel units, vertices at pixel centers
    xs = np.round(x * 16.0).astype(np.int64)
    ys = np.round(y * 16.0).astype(np.int64)

    def edge(x0, y0, x1, y1):
        # s(p) = (y1-y0)*(px-x0) - (x1-x0)*(py-y0) >= 0 for inside
        A = ys[:, y1] - ys[:, y0] if False else None

    A1 = ys[:, 1] - ys[:, 0]
    B1 = xs[:, 0] - xs[:, 1]
    A2 = ys[:, 2] - ys[:, 1]
    B2 = xs[:, 1] - xs[:, 2]
    A3 = ys[:, 0] - ys[:, 2]
    B3 = xs[:, 2] - xs[:, 0]
    C1 = -(A1 * xs[:, 0] + B1 * ys[:, 0])
    C2 = -(A2 * xs[:, 1] + B2 * ys[:, 1])
    C3 = -(A3 * xs[:, 2] + B3 * ys[:, 2])
    area = A1 * B3 - A3 * B1  # winding sign proxy

    emitted = 0
    kept = 0
    per_face_kept = np.zeros(len(tiles), np.int64)
    T = tb.TILE
    for f in np.nonzero(tiles > 0)[0]:
        sgn = 1 if area[f] >= 0 else -1
        for ty in range(rmin[f, 1], rmax[f, 1]):
            for tx in range(rmin[f, 0], rmax[f, 0]):
                emitted += 1
                # pixel-center sample extremes of this tile in subpixel
                px0, px1 = tx * T * 16, (tx * T + T - 1) * 16
                py0, py1 = ty * T * 16, (ty * T + T - 1) * 16
                ok = True
                for (A, B, C) in ((A1[f], B1[f], C1[f]),
                                  (A2[f], B2[f], C2[f]),
                                  (A3[f], B3[f], C3[f])):
                    a, b, c = sgn * A, sgn * B, sgn * C
                    smax = (a * (px1 if a > 0 else px0)
                            + b * (py1 if b > 0 else py0) + c)
                    if smax < 0:
                        ok = False
                        break
                if ok:
                    kept += 1
                    per_face_kept[f] += 1

    print(f"faces emitting: {(tiles > 0).sum()} / {len(tiles)}")
    print(f"bbox pairs emitted: {emitted}")
    print(f"pairs with possible coverage: {kept} "
          f"({100.0 * kept / max(emitted, 1):.1f}%)")
    print(f"cull factor: {emitted / max(kept, 1):.2f}x")
    h = np.bincount(np.minimum(tiles[tiles > 0], 40))
    print("bbox tiles/face histogram (clamped 40):", h)


if __name__ == "__main__":
    main()
