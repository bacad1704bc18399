"""Binning pipeline vs a brute-force NumPy emission."""

import numpy as np
import jax.numpy as jnp

from dmesh_renderer_tpu.ops.binning import emit_and_sort, default_key_capacity
from dmesh_renderer_tpu.ops.geometry import preprocess_faces, project_verts
import scenes

H = W = 64
TILE = 16


def _pre(n_tris=20, n_views=2, seed=4):
    soup = scenes.random_triangle_soup(n_tris, seed=seed)
    mv, proj = scenes.ring_cameras(n_views)
    mv_t = jnp.asarray(np.swapaxes(mv, 1, 2))
    proj_t = jnp.asarray(np.swapaxes(proj, 1, 2))
    ndc, img = project_verts(jnp.asarray(soup["verts"]), mv_t, proj_t, W, H)
    pre = preprocess_faces(ndc, img, jnp.asarray(soup["faces"]), W, H,
                           TILE, TILE)
    return pre


def _brute_force_emission(pre, gx, gy):
    """Replicates duplicateWithKeys: per face, row-major over its rect."""
    tiles = np.array(pre["tiles"])
    rmin = np.array(pre["rect_min"])
    rmax = np.array(pre["rect_max"])
    depth = np.array(pre["depth"])
    B, F = tiles.shape
    rows = []  # (tile_key, depth, emission_idx, face, batch)
    e = 0
    for b in range(B):
        for f in range(F):
            if tiles[b, f] == 0:
                continue
            for ty in range(rmin[b, f, 1], rmax[b, f, 1]):
                for tx in range(rmin[b, f, 0], rmax[b, f, 0]):
                    rows.append((b * gx * gy + ty * gx + tx,
                                 depth[b, f], e, f, b))
                    e += 1
    return rows


def test_emission_matches_brute_force():
    pre = _pre()
    gx, gy = W // TILE, H // TILE
    rows = _brute_force_emission(pre, gx, gy)
    total = len(rows)
    kcap = default_key_capacity(2, 20)
    out = emit_and_sort(pre, gx, gy, kcap)

    assert int(out.total) == total
    assert not bool(out.overflow)

    # stable sort by (tile_key, depth) with emission order as tiebreak
    rows_sorted = sorted(rows, key=lambda r: (r[0], r[1], r[2]))
    want_face = np.array([r[3] for r in rows_sorted])
    want_batch = np.array([r[4] for r in rows_sorted])
    got_face = np.array(out.face)[:total]
    got_batch = np.array(out.batch)[:total]
    np.testing.assert_array_equal(got_face, want_face)
    np.testing.assert_array_equal(got_batch, want_batch)

    # ranges partition the sorted slots
    starts = np.array(out.starts)
    ends = np.array(out.ends)
    tk = np.array(out.tile_key)[:total]
    for t in range(2 * gx * gy):
        inside = np.nonzero(tk == t)[0]
        if inside.size:
            assert starts[t] == inside[0]
            assert ends[t] == inside[-1] + 1
        else:
            assert starts[t] == ends[t]


def test_overflow_flag():
    pre = _pre()
    gx, gy = W // TILE, H // TILE
    out = emit_and_sort(pre, gx, gy, kcap=16)
    assert bool(out.overflow)
    assert out.face.shape == (16,)
