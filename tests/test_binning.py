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


def _covered_pairs(pre, soup, mv_t, proj_t, gx, gy):
    """Ground truth: (b, f, tile) triples with at least one covered pixel,
    via the scalar in_tri test at every pixel center."""
    from dmesh_renderer_tpu.ops.geometry import in_tri

    img = np.array(project_verts(
        jnp.asarray(soup["verts"]), mv_t, proj_t, W, H)[1])
    faces = soup["faces"]
    covered = set()
    B = img.shape[0]
    ys, xs = np.mgrid[0:H, 0:W]
    pix = jnp.asarray(
        np.stack([xs + 0.5 * 0, ys * 0 + ys], -1).astype(np.float32))
    for b in range(B):
        p = img[b][faces]  # [F, 3, 2]
        for f in range(len(faces)):
            cov = np.array(in_tri(
                jnp.asarray(np.stack([xs, ys], -1).astype(np.float32)
                            + 0.5),
                jnp.asarray(p[f, 0]), jnp.asarray(p[f, 1]),
                jnp.asarray(p[f, 2])))
            if not cov.any():
                continue
            tys, txs = np.nonzero(cov)
            for t in set(zip(tys // TILE, txs // TILE)):
                covered.add((b, f, t[0] * gx + t[1]))
    return covered


def test_exact_emission_superset_of_coverage_subset_of_bbox():
    """The exact-coverage emission must contain every (face, tile) pair
    with real pixel coverage (conservative test never culls a covered
    tile) and stay within the bbox emission; per-tile face order matches
    the bbox path's on the shared pairs."""
    soup = scenes.random_triangle_soup(30, seed=11)
    mv, proj = scenes.ring_cameras(2)
    mv_t = jnp.asarray(np.swapaxes(mv, 1, 2))
    proj_t = jnp.asarray(np.swapaxes(proj, 1, 2))
    ndc, img = project_verts(jnp.asarray(soup["verts"]), mv_t, proj_t, W, H)
    pre = preprocess_faces(ndc, img, jnp.asarray(soup["faces"]), W, H,
                           TILE, TILE)
    gx, gy = W // TILE, H // TILE
    kcap = default_key_capacity(2, 30)

    bbox = emit_and_sort(pre, gx, gy, kcap)
    exact = emit_and_sort(pre, gx, gy, kcap, tile_px=TILE)
    nb, ne = int(bbox.total), int(exact.total)
    assert ne <= nb
    assert not bool(exact.overflow)

    def pairs(out, n):
        tk = np.array(out.tile_key)[:n]
        fc = np.array(out.face)[:n]
        bt = np.array(out.batch)[:n]
        ntl = gx * gy
        return list(zip(bt, fc, tk % ntl))

    set_b = set(pairs(bbox, nb))
    set_e = set(pairs(exact, ne))
    assert set_e <= set_b

    covered = _covered_pairs(pre, soup, mv_t, proj_t, gx, gy)
    missing = covered - set_e
    assert not missing, f"exact emission culled covered pairs: {missing}"

    # per-tile order on shared pairs is identical (same stable ordering)
    seq_b = [p for p in pairs(bbox, nb) if p in set_e]
    assert seq_b == pairs(exact, ne)


def test_oversized_kcap_falls_back_to_bbox(monkeypatch):
    """Key capacities beyond the exact path's int32 cumsum budget
    (_EXACT_KCAP_MAX) must fall back to bbox emission gracefully, not
    raise; the emitted totals then match the bbox path. The gate is
    monkeypatched small so the fallback exercises without allocating a
    2^28-slot table; a capacity just above the OLD 2^22 packed-fill limit
    now stays on the exact path (the telescoped delta keys removed that
    packing)."""
    from dmesh_renderer_tpu.ops import binning

    pre = _pre()
    gx, gy = W // TILE, H // TILE
    bbox = emit_and_sort(pre, gx, gy, kcap=2048)
    exact = emit_and_sort(pre, gx, gy, kcap=2048, tile_px=TILE)

    # above the old 2^22 packing limit: still exact (fewer pairs than bbox)
    big = (1 << 22) + 128
    still_exact = emit_and_sort(pre, gx, gy, kcap=big, tile_px=TILE)
    assert int(still_exact.total) == int(exact.total)

    monkeypatch.setattr(binning, "_EXACT_KCAP_MAX", 4096)
    fb = emit_and_sort(pre, gx, gy, kcap=8192, tile_px=TILE)
    assert int(fb.total) == int(bbox.total)


def test_binned_rejects_empty_faces():
    """Direct binned calls with zero faces raise a clear error (the public
    dispatch routes empty scenes to the dense path, mirroring the
    reference's P != 0 / F != 0 guards at the binding layer)."""
    import jax.numpy as jnp
    import pytest

    from dmesh_renderer_tpu.ops.tri_binned import render_tri_binned

    eye = jnp.eye(4)[None]
    with pytest.raises(ValueError, match="at least one face"):
        render_tri_binned(
            jnp.zeros((3, 3)), jnp.zeros((0, 3), jnp.int32),
            jnp.zeros((3, 3)), jnp.zeros(0), eye, eye, eye, eye,
            jnp.zeros((1, 3)), jnp.zeros((1, 0)), jnp.zeros(3), 32, 32,
            1024)
