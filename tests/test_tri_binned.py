"""Binned (Pallas) tri renderer vs the oracle: forward + gradient parity.

Runs the actual Pallas kernels in interpreter mode on CPU (small scenes).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dmesh_renderer_tpu.ops.tri_oracle import render_tri_oracle
from dmesh_renderer_tpu.ops.tri_binned import render_tri_binned
import scenes

H, W = 48, 40  # non-multiples of the 32px tile to exercise padding/cropping
N_TRIS = 24
B = 2


@pytest.fixture(scope="module")
def args():
    soup = scenes.random_triangle_soup(N_TRIS, seed=13)
    mv, proj = scenes.ring_cameras(B, radius=3.0)
    vdepth, fintense = scenes.soup_view_attrs(soup, B, seed=14)
    bg = np.array([0.15, 0.25, 0.35], np.float32)
    mv_t = np.swapaxes(mv, 1, 2).copy()
    proj_t = np.swapaxes(proj, 1, 2).copy()
    return (
        jnp.asarray(soup["verts"]), jnp.asarray(soup["faces"]),
        jnp.asarray(soup["verts_color"]), jnp.asarray(soup["faces_opacity"]),
        jnp.asarray(mv_t), jnp.asarray(proj_t),
        jnp.asarray(np.linalg.inv(mv_t)), jnp.asarray(np.linalg.inv(proj_t)),
        jnp.asarray(vdepth), jnp.asarray(fintense), jnp.asarray(bg),
    )


def test_forward_matches_oracle(args):
    c_o, d_o = render_tri_oracle(*args, H, W)
    c_b, d_b = render_tri_binned(*args, H, W)
    np.testing.assert_allclose(np.array(c_b), np.array(c_o), atol=2e-5)
    np.testing.assert_allclose(np.array(d_b), np.array(d_o), atol=2e-5)


def test_backward_matches_oracle(args):
    rng = np.random.RandomState(3)
    wc = jnp.asarray(rng.randn(B, 3, H, W).astype(np.float32))
    wd = jnp.asarray(rng.randn(B, 1, H, W).astype(np.float32))

    def loss(render):
        def fn(verts, vcolor, fop, vdepth, fint):
            c, d = render(
                verts, args[1], vcolor, fop, args[4], args[5], args[6],
                args[7], vdepth, fint, args[10], H, W,
            )
            return jnp.sum(c * wc) + jnp.sum(d * wd)
        return fn

    diff_args = (args[0], args[2], args[3], args[8], args[9])
    g_o = jax.grad(loss(render_tri_oracle), argnums=tuple(range(5)))(*diff_args)
    g_b = jax.grad(loss(render_tri_binned), argnums=tuple(range(5)))(*diff_args)

    names = ["verts", "verts_color", "faces_opacity", "verts_depth",
             "faces_intense"]
    for a, b, name in zip(g_o, g_b, names):
        a, b = np.array(a, np.float64), np.array(b, np.float64)
        scale = max(1.0, np.abs(a).max())
        err = np.abs(a - b).max() / scale
        assert err < 1e-4, f"{name}: rel Linf {err}"


def test_wide_reduce_path_matches_oracle(args, monkeypatch):
    """The large-B*F record-reduce layout ([F, 19+4B] original-face keyed
    wide table, used above the scatter-target size cliff) must produce
    the same five gradients as the sorted-space path: force it by zeroing
    the size threshold."""
    import dmesh_renderer_tpu.ops.tri_binned as tb

    monkeypatch.setattr(tb, "REDUCE_TARGET_BYTES_MAX", 0)
    rng = np.random.RandomState(7)
    wc = jnp.asarray(rng.randn(B, 3, H, W).astype(np.float32))
    wd = jnp.asarray(rng.randn(B, 1, H, W).astype(np.float32))

    def loss(render):
        def fn(verts, vcolor, fop, vdepth, fint):
            c, d = render(
                verts, args[1], vcolor, fop, args[4], args[5], args[6],
                args[7], vdepth, fint, args[10], H, W,
            )
            return jnp.sum(c * wc) + jnp.sum(d * wd)
        return fn

    diff_args = (args[0], args[2], args[3], args[8], args[9])
    g_o = jax.grad(loss(render_tri_oracle),
                   argnums=tuple(range(5)))(*diff_args)
    g_b = jax.grad(loss(render_tri_binned),
                   argnums=tuple(range(5)))(*diff_args)
    names = ["verts", "verts_color", "faces_opacity", "verts_depth",
             "faces_intense"]
    for a, b, name in zip(g_o, g_b, names):
        a, b = np.array(a, np.float64), np.array(b, np.float64)
        scale = max(1.0, np.abs(a).max())
        err = np.abs(a - b).max() / scale
        assert err < 1e-4, f"{name}: rel Linf {err}"


def _near_plane_scene():
    """Scene with vertices projected near the w=0 plane: fixed-point edge
    coefficients past 2^24 and edge functions past int32 range (the
    _edge_wrap_risk regime). Returns (render args tuple, h, w)."""
    soup = scenes.random_triangle_soup(24, seed=13)
    mv, proj = scenes.ring_cameras(1, radius=3.0)
    v = soup["verts"].copy()
    inv = np.linalg.inv(mv[0])
    for i, (zv, xv) in enumerate([(1e-4, 0.5), (5e-5, -0.8), (2e-4, 1.2),
                                  (1e-3, 2.0), (-1e-4, 0.7), (3e-4, -1.5)]):
        pv = np.array([xv, 0.3 * i - 0.6, zv, 1.0])
        v[i] = (inv @ pv)[:3]
    # one vertex far past 2^24 subpixel units
    v[soup["faces"][6][0]] = (inv @ np.array([30.0, 5.0, 1e-5, 1.0]))[:3]
    h = w = 48
    mv_t = np.swapaxes(mv, 1, 2).copy()
    proj_t = np.swapaxes(proj, 1, 2).copy()
    vdepth, fintense = scenes.soup_view_attrs(soup, 1, seed=14)
    bg = np.array([0., 0., 0.], np.float32)
    a = tuple(map(jnp.asarray, (
        v, soup["faces"], soup["verts_color"], soup["faces_opacity"],
        mv_t, proj_t, np.linalg.inv(mv_t), np.linalg.inv(proj_t),
        vdepth, fintense, bg)))
    return a, h, w


def test_near_plane_faces_match_oracle():
    """Round-3 regression: vertices near the w=0 plane wrap int32 edge
    functions, where in_tri (and the CUDA reference) WRAP too. The
    exact-coverage cull must not trust true-sign intervals there (full
    bbox emission via _edge_wrap_risk), and the attr table must store A/B
    split-half exact so the kernel wraps identically to the oracle
    (plain-f32 A/B measured 0.14 L-inf off on this scene)."""
    a, h, w = _near_plane_scene()
    co, do_ = render_tri_oracle(*a, h, w)
    cb, db = render_tri_binned(*a, h, w)
    np.testing.assert_allclose(np.array(cb), np.array(co), atol=2e-5)
    np.testing.assert_allclose(np.array(db), np.array(do_), atol=2e-5)


def test_wrapped_coverage_outside_rect_not_rendered():
    """Fuzz-found (tools/fuzz_tri_parity.py seed=1000, round 3): a face
    with a vertex just behind the w=0 plane projects to huge image coords;
    its int32 edge functions WRAP and in_tri can pass at pixels whose tile
    is OUTSIDE the face's bbox rect. The reference never tests those
    pixels (duplicateWithKeys only emits the face into rect tiles,
    rasterizer_impl.cu:44-97) and neither does the binned path -- the
    dense oracle must apply the same rect restriction (it rendered 77
    phantom pixels here, 0.6 L-inf off the binned image, before the fix).
    """
    from dmesh_renderer_tpu.ops.geometry import (
        in_tri, preprocess_faces, project_verts,
    )
    from dmesh_renderer_tpu.utils.config import BIN_TILE

    tri = np.array(
        [[0.456025093793869, -0.7886804938316345, 0.6957451701164246],
         [4.529575347900391, -0.9736150503158569, -0.21224737167358398],
         [0.7446367144584656, -0.45834046602249146, 0.3057740330696106]],
        np.float32)
    mv_t = np.array(
        [[[0.29552021622657776, 0.19194255769252777,
           -0.9358556866645813, 0.0],
          [0.0, -0.979608416557312, -0.20091617107391357, 0.0],
          [-0.9553365111351013, 0.059374790638685226,
           -0.2894940972328186, 0.0],
          [2.2837982903534224e-16, -1.689350799580926e-17,
           3.981760025024414, 1.0]]], np.float32)
    proj_t = np.array(
        [[[2.4142136573791504, 0.0, 0.0, 0.0],
          [0.0, 2.4142136573791504, 0.0, 0.0],
          [0.0, 0.0, 1.0202020406723022, 1.0],
          [0.0, 0.0, -0.20202019810676575, 0.0]]], np.float32)
    h, w = 48, 40
    faces = np.array([[0, 1, 2]], np.int32)

    # premise: wrapped in_tri coverage exists OUTSIDE the tile rect
    ndc, img = project_verts(jnp.asarray(tri), jnp.asarray(mv_t),
                             jnp.asarray(proj_t), w, h)
    pre = preprocess_faces(ndc, img, jnp.asarray(faces), w, h,
                           BIN_TILE, BIN_TILE)
    imgn = np.array(img)
    rmin = np.array(pre["rect_min"])[0, 0]
    rmax = np.array(pre["rect_max"])[0, 0]
    ys, xs = np.meshgrid(np.arange(h) + 0.5, np.arange(w) + 0.5,
                         indexing="ij")
    pix = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1)
                      .astype(np.float32))
    cov = np.array(in_tri(pix, jnp.asarray(imgn[0, 0]),
                          jnp.asarray(imgn[0, 1]),
                          jnp.asarray(imgn[0, 2]))).reshape(h, w)
    py, px = np.where(cov)
    outside = ((px // BIN_TILE < rmin[0]) | (px // BIN_TILE >= rmax[0])
               | (py // BIN_TILE < rmin[1]) | (py // BIN_TILE >= rmax[1]))
    assert outside.sum() > 0, "scene no longer exercises wrapped coverage"

    bg = np.array([0.3, 0.5, 0.7], np.float32)
    a = tuple(map(jnp.asarray, (
        tri, faces, np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32),
        np.array([0.745], np.float32), mv_t, proj_t,
        np.linalg.inv(mv_t), np.linalg.inv(proj_t),
        np.full((1, 3), 0.5, np.float32), np.ones((1, 1), np.float32), bg)))
    co, do_ = render_tri_oracle(*a, h, w)
    cb, db = render_tri_binned(*a, h, w)
    np.testing.assert_allclose(np.array(cb), np.array(co), atol=2e-6)
    np.testing.assert_allclose(np.array(db), np.array(do_), atol=2e-6)
    # out-of-rect wrapped pixels are pure background in both paths
    co_np = np.array(co)[0]
    oy, ox = py[outside], px[outside]
    np.testing.assert_allclose(co_np[:, oy, ox],
                               bg[:, None] * np.ones((3, len(oy))),
                               atol=1e-6)


def test_exact_counts_equal_emission_total_wrap_risk():
    """The capacity-sizing count pass (exact_tile_counts, the basis of
    recommended_key_capacity) must equal the emission path's actual total
    EXACTLY -- including on wrap-risk scenes, where both take the
    full-bbox branch (_edge_wrap_risk). The bench relies on this: it sizes
    capacity with a tight margin on the grounds that the count pass is
    exact for a static scene (the analog of the reference's exact
    post-readback sizing, rasterizer_impl.cu:287-299). A drift between the
    two paths would silently drop geometry at tight margins."""
    from dmesh_renderer_tpu.ops.binning import (
        _edge_wrap_risk, emit_and_sort, exact_tile_counts,
    )
    from dmesh_renderer_tpu.ops.geometry import (
        preprocess_faces, project_verts,
    )

    a, h, w = _near_plane_scene()
    verts, faces, _vc, _fo, mv_t, proj_t, *_ = a
    gx, gy = (w + 31) // 32, (h + 31) // 32
    ndc, img = project_verts(verts, mv_t, proj_t, w, h)
    pre = preprocess_faces(ndc, img, faces, w, h, 32, 32)
    # the scene must actually exercise the wrap-risk branch
    assert bool(jnp.any(_edge_wrap_risk(pre, gx, gy, 32)
                        & (pre["tiles"] > 0)))
    counts = int(jnp.sum(exact_tile_counts(pre, gx, gy, 32)))
    keys = emit_and_sort(pre, gx, gy, kcap=1 << 18, tile_px=32)
    assert int(keys.total) == counts
    assert not bool(keys.overflow)


def test_exact_emission_matches_bbox_renders(args, monkeypatch):
    """Exact-coverage emission culls only (face, tile) pairs that cover no
    pixel, so full renders AND all five gradients must be identical (not
    just close) to the bbox-rect emission the reference uses
    (rasterizer_impl.cu:44-97): per-tile face order is the same and the
    culled pairs never blend."""
    import dmesh_renderer_tpu.ops.tri_binned as tb
    from dmesh_renderer_tpu.ops import binning

    real = binning.emit_and_sort

    def bbox_only(pre, gx, gy, kcap, sort_by="depth", tile_px=None,
                  run_cap=None):
        return real(pre, gx, gy, kcap, sort_by=sort_by, tile_px=None)

    def run():
        rng = np.random.RandomState(21)
        wc = jnp.asarray(rng.randn(B, 3, H, W).astype(np.float32))
        wd = jnp.asarray(rng.randn(B, 1, H, W).astype(np.float32))

        def fn(verts, vcolor, fop, vdepth, fint):
            c, d = render_tri_binned(
                verts, args[1], vcolor, fop, args[4], args[5], args[6],
                args[7], vdepth, fint, args[10], H, W,
            )
            return jnp.sum(c * wc) + jnp.sum(d * wd)

        da = (args[0], args[2], args[3], args[8], args[9])
        c, d = render_tri_binned(*args, H, W)
        g = jax.grad(fn, argnums=tuple(range(5)))(*da)
        return [np.array(x) for x in (c, d) + g]

    out_exact = run()
    monkeypatch.setattr(tb, "emit_and_sort", bbox_only)
    out_bbox = run()
    for a, b in zip(out_exact, out_bbox):
        np.testing.assert_array_equal(a, b)


def test_recompute_bwd_attrs_matches_oracle(args, monkeypatch):
    """RECOMPUTE_BWD_ATTRS=True drops the [cap, 128] slot table from the
    custom_vjp residuals and rebuilds it in the backward (memory/time
    trade); gradients must be identical to the residual-saving default."""
    import dmesh_renderer_tpu.ops.tri_binned as tb

    monkeypatch.setattr(tb, "RECOMPUTE_BWD_ATTRS", True)
    rng = np.random.RandomState(11)
    wc = jnp.asarray(rng.randn(B, 3, H, W).astype(np.float32))
    wd = jnp.asarray(rng.randn(B, 1, H, W).astype(np.float32))

    def loss(render):
        def fn(verts, vcolor, fop, vdepth, fint):
            c, d = render(
                verts, args[1], vcolor, fop, args[4], args[5], args[6],
                args[7], vdepth, fint, args[10], H, W,
            )
            return jnp.sum(c * wc) + jnp.sum(d * wd)
        return fn

    diff_args = (args[0], args[2], args[3], args[8], args[9])
    g_o = jax.grad(loss(render_tri_oracle),
                   argnums=tuple(range(5)))(*diff_args)
    g_b = jax.grad(loss(render_tri_binned),
                   argnums=tuple(range(5)))(*diff_args)
    for a, b in zip(g_o, g_b):
        a, b = np.array(a, np.float64), np.array(b, np.float64)
        scale = max(1.0, np.abs(a).max())
        assert np.abs(a - b).max() / scale < 1e-4


def test_overflow_flag_surfaces(args):
    """with_aux must report overflow=True and the true emitted total when
    keys are dropped, and overflow=False at ample capacity."""
    c2, d2, (ovf2, total2) = render_tri_binned(*args, H, W, 8192, True)
    assert not bool(ovf2)
    total_true = int(total2)
    assert total_true > 2  # sanity: scene emits something

    small = max(1, total_true // 2)
    c, d, (ovf, total) = render_tri_binned(*args, H, W, small, True)
    assert bool(ovf), "overflow flag not set despite kcap < total"
    assert int(total) == total_true, "emitted total must not depend on kcap"
    # and the aux path must not perturb the image
    np.testing.assert_array_equal(np.array(c2), np.array(render_tri_binned(
        *args, H, W, 8192)[0]))


def test_run_capacity_plumbing(args):
    """A measured run_cap must not change results (bitwise), and a
    too-small run table must raise the overflow flag (row_overflow folds
    into BinnedKeys.overflow) instead of silently corrupting keys."""
    from dmesh_renderer_tpu.ops.binning import recommended_run_capacity

    rcap = recommended_run_capacity(args[0], args[1], args[4], args[5],
                                    H, W, margin=1.25, bucket=128)
    c0, d0 = render_tri_binned(*args, H, W, 8192)
    c1, d1, (ovf, _t) = render_tri_binned(*args, H, W, 8192, True, rcap)
    np.testing.assert_array_equal(np.array(c0), np.array(c1))
    np.testing.assert_array_equal(np.array(d0), np.array(d1))
    assert not bool(ovf)

    # gradients agree bitwise too (run_cap only sizes the run table)
    def loss(rc):
        def f(fo):
            c, d = render_tri_binned(
                args[0], args[1], args[2], fo, *args[4:], H, W, 8192,
                False, rc)
            return jnp.sum(c) + jnp.sum(d)
        return np.array(jax.grad(f)(args[3]))
    np.testing.assert_array_equal(loss(None), loss(rcap))

    # run-table overflow surfaces as data (1024 is the internal floor)
    _c, _d, (ovf2, _t2) = render_tri_binned(*args, H, W, 8192, True, 1024)
    n_rows_true = int(recommended_run_capacity(
        args[0], args[1], args[4], args[5], H, W, margin=1.0, bucket=1))
    if n_rows_true > 1024:
        assert bool(ovf2)


def test_overflow_flag_via_public_api(args, monkeypatch):
    """The overflow signal must reach a render_tri caller (VERDICT round 1:
    'a user cannot silently render with dropped geometry')."""
    import dmesh_renderer_tpu.ops.tri as tri_dispatch
    from dmesh_renderer_tpu.api import TriRenderSettings, render_tri

    # route this small scene onto the binned path (the one with a capacity)
    monkeypatch.setattr(tri_dispatch, "BINNED_THRESHOLD_CPU", 0)

    settings = TriRenderSettings(H, W, np.array([0.15, 0.25, 0.35],
                                                np.float32), 16)
    # api.render_tri takes untransposed-call-path args: reuse the already
    # transposed matrices (render_tri expects transposed, like _RenderTri)
    c, d, (ovf, total) = render_tri(
        args[0], args[1], args[2], args[3], args[4], args[5], args[8],
        args[9], settings, return_aux=True,
    )
    assert bool(ovf) and int(total) > 16


def test_degenerate_and_offscreen_parity():
    """Binned path matches the oracle on pathological geometry the fixed
    scenes lack: zero-area (repeated-vertex) triangles and faces far
    outside the frustum, on a non-tile-aligned image. Distilled from a
    6-config fuzz sweep (round 3; all configs ≤7e-6 rel L∞)."""
    seed, n_tris, b = 102, 24, 1
    rng = np.random.RandomState(seed)
    soup = scenes.random_triangle_soup(n_tris, seed=seed)
    v = soup["verts"].copy()
    for i in range(5):  # zero-area faces
        f = soup["faces"][i]
        v[f[1]] = v[f[0]]
    for i in range(5, 10):  # far outside the frustum
        v[soup["faces"][i]] += 50.0
    mv, proj = scenes.ring_cameras(b, radius=2.5)
    vdepth, fintense = scenes.soup_view_attrs(soup, b, seed=seed + 1)
    mv_t = np.swapaxes(mv, 1, 2).copy()
    proj_t = np.swapaxes(proj, 1, 2).copy()
    bg = rng.rand(3).astype(np.float32)
    h, w = 33, 40
    a = tuple(map(jnp.asarray, (
        v, soup["faces"], soup["verts_color"], soup["faces_opacity"],
        mv_t, proj_t, np.linalg.inv(mv_t), np.linalg.inv(proj_t),
        vdepth, fintense, bg)))
    wc = jnp.asarray(rng.randn(b, 3, h, w).astype(np.float32))
    wd = jnp.asarray(rng.randn(b, 1, h, w).astype(np.float32))

    def loss(render):
        def fn(verts, vcolor, fop, vdep, fint):
            c, d = render(verts, a[1], vcolor, fop, a[4], a[5], a[6],
                          a[7], vdep, fint, a[10], h, w)
            return jnp.sum(c * wc) + jnp.sum(d * wd)
        return fn

    co, do_ = render_tri_oracle(*a, h, w)
    cb, db = render_tri_binned(*a, h, w)
    np.testing.assert_allclose(np.array(cb), np.array(co), atol=2e-5)
    np.testing.assert_allclose(np.array(db), np.array(do_), atol=2e-5)

    da = (a[0], a[2], a[3], a[8], a[9])
    go = jax.grad(loss(render_tri_oracle), argnums=tuple(range(5)))(*da)
    gb = jax.grad(loss(render_tri_binned), argnums=tuple(range(5)))(*da)
    for x, y in zip(go, gb):
        x, y = np.array(x, np.float64), np.array(y, np.float64)
        s = max(1.0, np.abs(x).max())
        assert np.abs(x - y).max() / s < 1e-4


def test_recommended_key_capacity_right_sizes(args):
    """recommended_key_capacity (the measure-once + margin replacement for
    the reference's exact post-readback sizing, rasterizer_impl.cu:287-299)
    must return a capacity that (a) renders the measured scene without
    overflow, (b) carries the requested margin over the true emitted
    total, and (c) rounds up to the compile-sharing bucket."""
    from dmesh_renderer_tpu.ops.binning import recommended_key_capacity

    (verts, faces, _vc, _fo, mv_t, proj_t, *_rest) = args
    kcap = recommended_key_capacity(verts, faces, mv_t, proj_t, H, W,
                                    margin=1.25, bucket=128)
    assert kcap % 128 == 0
    _c, _d, (ovf, total) = render_tri_binned(*args, H, W, kcap, True)
    assert not bool(ovf)
    t = int(total)
    # bucket rounding means capacity - margin*total < one bucket (or the
    # 1024 floor dominates on tiny scenes)
    assert kcap >= t
    assert kcap <= max(1024, int(np.ceil(t * 1.25)) + 128)

    # the bbox variant (tet first-hit sizing) can only be larger: bbox
    # rects are a superset of exact-coverage tiles
    kcap_bbox = recommended_key_capacity(verts, faces, mv_t, proj_t, H, W,
                                         margin=1.25, bucket=128,
                                         exact=False)
    assert kcap_bbox >= kcap


def test_overflow_drop_policy_is_farthest_first(args):
    """Keys are dropped farthest-first: emission is per-view depth-sorted,
    so with kcap cut exactly at the k-th nearest face's emission boundary,
    the image equals rendering only the k NEAREST faces (the least visible
    geometry degrades first; B=1 here so view-major plays no role)."""
    from dmesh_renderer_tpu.ops.geometry import (
        preprocess_faces, project_verts,
    )

    (verts, faces, vcolor, fopacity, mv_t, proj_t, inv_mv_t, inv_proj_t,
     vdepth, fintense, bg) = args

    # single view to make the boundary exact
    one = (mv_t[:1], proj_t[:1], inv_mv_t[:1], inv_proj_t[:1],
           vdepth[:1], fintense[:1])

    from dmesh_renderer_tpu.ops.binning import exact_tile_counts

    ndc, img = project_verts(verts, one[0], one[1], W, H)
    pre = preprocess_faces(ndc, img, faces, W, H, 32, 32)
    gx = (W + 31) // 32
    gy = (H + 31) // 32
    # the production path uses exact-coverage emission counts
    tiles = np.array(exact_tile_counts(pre, gx, gy, 32)[0])  # [F]
    depth = np.array(pre["depth"][0])
    key = np.where(tiles > 0, depth, np.inf)
    order = np.argsort(key, kind="stable")  # per-view face emission order
    csum = np.cumsum(tiles[order])
    # pick a depth-order boundary near the middle with a nonzero tail
    k = N_TRIS // 2
    while k > 1 and csum[k - 1] == csum[-1]:
        k -= 1
    kcap_cut = int(csum[k - 1])
    assert kcap_cut < csum[-1], "need a real cut for this test"

    near = np.sort(order[:k])  # the k nearest emitting faces
    c_cut, _ = render_tri_binned(
        verts, faces, vcolor, fopacity, *one[:4], one[4], one[5], bg,
        H, W, kcap_cut,
    )
    c_near, _ = render_tri_binned(
        verts, faces[near], vcolor, fopacity[near], *one[:4], one[4],
        fintense[:1, near], bg, H, W, kcap_cut,
    )
    np.testing.assert_allclose(np.array(c_cut), np.array(c_near), atol=1e-6)


def test_walked_compaction_reduce_matches_full(args, monkeypatch):
    """The record reduce compacts the walked slot prefixes before its
    segment scatter-add (tri_binned._walked_scatter_add): the compacted
    path, the runtime overflow fallback (walked total > static compacted
    capacity), and the plain full-capacity scatter must all produce
    BIT-IDENTICAL gradients -- compaction only removes provably-zero rows
    and preserves the add order of every nonzero one."""
    import dmesh_renderer_tpu.ops.tri_binned as tb

    rng = np.random.RandomState(21)
    wc = jnp.asarray(rng.randn(B, 3, H, W).astype(np.float32))
    wd = jnp.asarray(rng.randn(B, 1, H, W).astype(np.float32))

    def grads():
        def fn(verts, vcolor, fop, vdepth, fint):
            c, d = render_tri_binned(
                verts, args[1], vcolor, fop, args[4], args[5], args[6],
                args[7], vdepth, fint, args[10], H, W,
            )
            return jnp.sum(c * wc) + jnp.sum(d * wd)
        diff_args = (args[0], args[2], args[3], args[8], args[9])
        return [np.array(g) for g in
                jax.grad(fn, argnums=tuple(range(5)))(*diff_args)]

    # plain scatter (compaction statically disabled: w_cap == cap)
    monkeypatch.setattr(tb, "_walked_cap", lambda cap, n_tiles: cap)
    g_plain = grads()
    # compacted branch active (w_cap just under cap leaves room)
    monkeypatch.setattr(tb, "_walked_cap",
                        lambda cap, n_tiles: cap - tb.SLAB)
    g_comp = grads()
    # runtime overflow fallback: w_cap below the walked total
    monkeypatch.setattr(tb, "_walked_cap",
                        lambda cap, n_tiles: tb.SLAB)  # 1 slab total
    g_fb = grads()

    for gc, gf, gp in zip(g_comp, g_fb, g_plain):
        np.testing.assert_array_equal(gc, gp)
        np.testing.assert_array_equal(gf, gp)


def test_unrolled_face_loop_bit_identical(args, monkeypatch):
    """DMRT_UNROLL=2 pair-pipelines the kernels' per-face loops (both
    faces' SMEM scalar loads hoisted ahead of the pair's vector work, odd
    tail in a 0/1-iteration loop). Same ops in the same order => forward
    AND all five gradients must be BIT-identical to the default loop."""
    rng = np.random.RandomState(7)
    wc = jnp.asarray(rng.randn(B, 3, H, W).astype(np.float32))
    wd = jnp.asarray(rng.randn(B, 1, H, W).astype(np.float32))

    def run():
        def fn(verts, vcolor, fop, vdepth, fint):
            c, d = render_tri_binned(
                verts, args[1], vcolor, fop, args[4], args[5], args[6],
                args[7], vdepth, fint, args[10], H, W,
            )
            return jnp.sum(c * wc) + jnp.sum(d * wd)
        diff_args = (args[0], args[2], args[3], args[8], args[9])
        c, d = render_tri_binned(*args, H, W)
        g = jax.grad(fn, argnums=tuple(range(5)))(*diff_args)
        return [np.array(c), np.array(d)] + [np.array(x) for x in g]

    monkeypatch.setenv("DMRT_UNROLL", "1")
    base = run()
    monkeypatch.setenv("DMRT_UNROLL", "2")
    unrolled = run()
    for b, u in zip(base, unrolled):
        np.testing.assert_array_equal(b, u)


def test_edge_i32_slab_bit_identical(args, monkeypatch):
    """DMRT_EDGE_I32=1 stores the 9 int32 edge coefficients as raw bit
    patterns and reads them through an int32 bitcast view of the attr
    table (second SMEM slab) instead of reassembling split halves with
    scalar ALU ops. The kernel consumes the same int32 values => forward
    AND all five gradients must be BIT-identical to the default encoding
    (including near-plane faces whose coefficients exceed 2^24)."""
    rng = np.random.RandomState(11)
    wc = jnp.asarray(rng.randn(B, 3, H, W).astype(np.float32))
    wd = jnp.asarray(rng.randn(B, 1, H, W).astype(np.float32))

    def run():
        def fn(verts, vcolor, fop, vdepth, fint):
            c, d = render_tri_binned(
                verts, args[1], vcolor, fop, args[4], args[5], args[6],
                args[7], vdepth, fint, args[10], H, W,
            )
            return jnp.sum(c * wc) + jnp.sum(d * wd)
        diff_args = (args[0], args[2], args[3], args[8], args[9])
        c, d = render_tri_binned(*args, H, W)
        g = jax.grad(fn, argnums=tuple(range(5)))(*diff_args)
        return [np.array(c), np.array(d)] + [np.array(x) for x in g]

    monkeypatch.setenv("DMRT_EDGE_I32", "0")
    base = run()
    monkeypatch.setenv("DMRT_EDGE_I32", "1")
    i32 = run()
    for b, u in zip(base, i32):
        np.testing.assert_array_equal(b, u)
