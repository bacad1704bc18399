"""Tet renderer tests: active-mask semantics, blend math, connectivity walk,
and finite-difference gradient checks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dmesh_renderer_tpu.ops.tet import render_tet_core
from dmesh_renderer_tpu.utils.connectivity import build_tet_connectivity
import scenes

H = W = 32


def _cam(eye=(0.31, 0.17, 4.0), fovy=60.0):
    # Slightly off-axis eye: a perfectly centered camera sends the center ray
    # through a tet *edge* of the symmetric test tet, which the reference
    # (and we) classify as a walk failure -> inactive pixel.
    mv = scenes.look_at(eye, [0, 0, 0], [0, 1, 0])[None]
    proj = scenes.perspective(fovy, 1.0, 0.1, 10.0)[None]
    mv_t = np.swapaxes(mv, 1, 2).copy()
    proj_t = np.swapaxes(proj, 1, 2).copy()
    return mv_t, proj_t


def _args_single_tet(opacity=(0.5, 0.5, 0.5, 0.5), color=1.0, bg=(0.0, 0.0, 0.0)):
    verts, faces, tets, face_tets, tet_faces = scenes.single_tet()
    P, F = verts.shape[0], faces.shape[0]
    vcolor = np.full((P, 3), color, np.float32)
    fopacity = np.asarray(opacity, np.float32)
    mv_t, proj_t = _cam()
    fintense = np.ones((1, F), np.float32)
    return dict(
        verts=jnp.asarray(verts), faces=jnp.asarray(faces),
        verts_color=jnp.asarray(vcolor), faces_opacity=jnp.asarray(fopacity),
        mv_t=jnp.asarray(mv_t), proj_t=jnp.asarray(proj_t),
        inv_mv_t=jnp.asarray(np.linalg.inv(mv_t)),
        inv_proj_t=jnp.asarray(np.linalg.inv(proj_t)),
        faces_intense=jnp.asarray(fintense),
        tets=jnp.asarray(tets), face_tets=jnp.asarray(face_tets),
        tet_faces=jnp.asarray(tet_faces), bg=jnp.asarray(bg, jnp.float32),
    )


def _render(a, seed=0):
    return render_tet_core(
        a["verts"], a["faces"], a["verts_color"], a["faces_opacity"],
        a["mv_t"], a["proj_t"], a["inv_mv_t"], a["inv_proj_t"],
        a["faces_intense"], a["tets"], a["face_tets"], a["tet_faces"],
        a["bg"], H, W, seed,
    )


def test_single_tet_active_and_blend():
    a = _args_single_tet(opacity=(0.4, 0.4, 0.4, 0.4), color=1.0,
                         bg=(0.2, 0.0, 0.0))
    color, depth, active = _render(a)
    color = np.array(color)
    active = np.array(active)

    assert active.shape == (1, H, W)
    n_active = active.sum()
    assert 0 < n_active < H * W, "tet silhouette should cover part of image"

    # Center pixel: ray passes through two faces with alpha 0.4 each.
    # white color: out = a + (1-a)a + (1-a)^2 * bg
    cy, cx = H // 2, W // 2
    assert active[0, cy, cx]
    aop = 0.4
    expect_white = aop + (1 - aop) * aop
    expect_r = expect_white + (1 - aop) ** 2 * 0.2
    got = color[0, :, cy, cx]
    assert np.allclose(got[1], expect_white, atol=1e-5), got
    assert np.allclose(got[0], expect_r, atol=1e-5), got

    # Inactive pixels are pure background.
    inactive = ~active[0]
    assert np.allclose(color[0, 0][inactive], 0.2, atol=1e-6)
    assert np.allclose(color[0, 1][inactive], 0.0, atol=1e-6)

    # Active silhouette matches brute-force ray/tet intersection.
    from dmesh_renderer_tpu.ops.rays import generate_rays
    from dmesh_renderer_tpu.ops.geometry import (ray_tri_intersection,
                                                 strict_hit)
    ro, rd = generate_rays(a["inv_mv_t"], a["inv_proj_t"], W, H,
                           norm_eps_mode="tet")
    p = a["verts"][a["faces"]]  # [F,3,3]
    tuv, nd = ray_tri_intersection(
        ro[0][:, :, None, :], rd[0][:, :, None, :],
        p[None, None, :, 0], p[None, None, :, 1], p[None, None, :, 2],
    )
    hits = np.array(strict_hit(tuv, nd)).sum(-1)  # [H, W]
    # Every active pixel needs an entry and an exit hit; edge-degenerate
    # rays may be inactive despite >=2 hits (reference walk-error semantics),
    # but those are a thin silhouette-boundary set.
    assert np.all(hits[active[0]] >= 2)
    mismatch = np.mean(active[0] != (hits >= 2))
    assert mismatch < 0.05, f"active mask diverges on {mismatch:.1%} of pixels"


def test_single_tet_depth_in_range():
    a = _args_single_tet()
    _, depth, active = _render(a)
    depth = np.array(depth)[0, 0]
    active = np.array(active)[0]
    assert np.all(depth[~active] == 1.0)
    # active depths: blend of NDC z in [-1,1] and bg 1.0
    assert depth[active].min() >= -1.0 - 1e-5
    assert depth[active].max() <= 1.0 + 1e-5


def test_opaque_face_terminates():
    a = _args_single_tet(opacity=(1.0, 1.0, 1.0, 1.0), color=0.7)
    color, _, active = _render(a)
    color = np.array(color)
    active = np.array(active)
    cy, cx = H // 2, W // 2
    assert active[0, cy, cx]
    # fully opaque entry face: color == 0.7, no bg contribution
    assert np.allclose(color[0, :, cy, cx], 0.7, atol=1e-5)


def test_two_tet_walk():
    """Ray must walk through the shared interior face of two stacked tets."""
    verts = np.array(
        [
            [0.0, 1.0, 1.0],
            [-1.0, -1.0, 1.0],
            [1.0, -1.0, 1.0],
            [0.0, 0.0, -0.3],   # apex behind
            [0.0, 0.0, 2.0],    # apex in front
        ],
        np.float32,
    )
    tets = np.array([[0, 1, 2, 3], [0, 1, 2, 4]], np.int64)
    faces, face_tets, tet_faces = build_tet_connectivity(tets)

    P, F = verts.shape[0], faces.shape[0]
    mv_t, proj_t = _cam()
    a = dict(
        verts=jnp.asarray(verts), faces=jnp.asarray(faces),
        verts_color=jnp.asarray(np.full((P, 3), 1.0, np.float32)),
        faces_opacity=jnp.asarray(np.full(F, 0.3, np.float32)),
        mv_t=jnp.asarray(mv_t), proj_t=jnp.asarray(proj_t),
        inv_mv_t=jnp.asarray(np.linalg.inv(mv_t)),
        inv_proj_t=jnp.asarray(np.linalg.inv(proj_t)),
        faces_intense=jnp.asarray(np.ones((1, F), np.float32)),
        tets=jnp.asarray(tets, jnp.int32),
        face_tets=jnp.asarray(face_tets), tet_faces=jnp.asarray(tet_faces),
        bg=jnp.zeros(3, jnp.float32),
    )
    color, _, active = _render(a)
    active = np.array(active)[0]
    color = np.array(color)[0]
    cy, cx = H // 2, W // 2
    assert active[cy, cx]
    # center ray crosses 3 faces (front face of tet1, shared face, back face
    # of tet0), each alpha=0.3, white:
    aop = 0.3
    expect = aop + (1 - aop) * aop + (1 - aop) ** 2 * aop
    assert np.allclose(color[1, cy, cx], expect, atol=1e-5), color[:, cy, cx]


def test_gradients_finite_difference():
    a = _args_single_tet(opacity=(0.3, 0.5, 0.6, 0.4), color=0.8,
                         bg=(0.1, 0.1, 0.1))
    rng = np.random.RandomState(5)
    wc = jnp.asarray(rng.randn(1, 3, H, W).astype(np.float32))
    wd = jnp.asarray(rng.randn(1, 1, H, W).astype(np.float32))

    def loss(fopacity, vcolor):
        c, d, _ = render_tet_core(
            a["verts"], a["faces"], vcolor, fopacity,
            a["mv_t"], a["proj_t"], a["inv_mv_t"], a["inv_proj_t"],
            a["faces_intense"], a["tets"], a["face_tets"], a["tet_faces"],
            a["bg"], H, W, 0,
        )
        return jnp.sum(c * wc) + jnp.sum(d * wd)

    g_op, g_vc = jax.grad(loss, argnums=(0, 1))(
        a["faces_opacity"], a["verts_color"]
    )

    eps = 1e-3
    # FD on each face opacity
    for i in range(4):
        dv = np.zeros(4, np.float32)
        dv[i] = eps
        lp = float(loss(a["faces_opacity"] + dv, a["verts_color"]))
        lm = float(loss(a["faces_opacity"] - dv, a["verts_color"]))
        fd = (lp - lm) / (2 * eps)
        assert np.isclose(float(g_op[i]), fd, rtol=2e-2, atol=1e-2), (
            i, float(g_op[i]), fd,
        )
    # FD on two vertex color entries
    for (p, c) in [(0, 1), (2, 0)]:
        dv = np.zeros((4, 3), np.float32)
        dv[p, c] = eps
        lp = float(loss(a["faces_opacity"], a["verts_color"] + dv))
        lm = float(loss(a["faces_opacity"], a["verts_color"] - dv))
        fd = (lp - lm) / (2 * eps)
        assert np.isclose(float(g_vc[p, c]), fd, rtol=2e-2, atol=1e-2), (
            (p, c), float(g_vc[p, c]), fd,
        )


def test_jitter_changes_edges_only_slightly():
    a = _args_single_tet()
    c0, _, act0 = _render(a, seed=0)
    c1, _, act1 = _render(a, seed=7)
    c2, _, act2 = _render(a, seed=7)
    # same seed -> deterministic
    assert np.array_equal(np.array(c1), np.array(c2))
    # jitter should change only a small fraction of pixels (silhouette edge)
    frac = np.mean(np.array(act0) != np.array(act1))
    assert frac < 0.2


def test_connectivity_builder():
    tets = np.array([[0, 1, 2, 3], [0, 1, 2, 4]], np.int64)
    faces, face_tets, tet_faces = build_tet_connectivity(tets)
    assert faces.shape == (7, 3)
    # shared face {0,1,2} is adjacent to both tets
    shared = [i for i, f in enumerate(faces) if sorted(f) == [0, 1, 2]]
    assert len(shared) == 1
    assert set(face_tets[shared[0]]) == {0, 1}
    # every tet's faces contain it
    for t in range(2):
        for f in tet_faces[t]:
            assert t in face_tets[f]
    # boundary faces have one -1
    n_boundary = sum(1 for f in range(7) if face_tets[f, 1] == -1)
    assert n_boundary == 6


def test_freudenthal_grid_conformal():
    from dmesh_renderer_tpu.utils.connectivity import freudenthal_grid

    verts, tets = freudenthal_grid(3, jitter=0.1, seed=1)
    assert verts.shape == (64, 3)
    assert tets.shape == (162, 4)
    faces, face_tets, tet_faces = build_tet_connectivity(tets)
    # conformal: every face is shared by 1 (boundary) or 2 (interior) tets
    shared = (face_tets >= 0).sum(1)
    assert set(np.unique(shared)) == {1, 2}
    # Euler-style count for the Kuhn split: F = 2T + surface/... just pin it
    assert faces.shape[0] == 378
    # boundary face count of an n^3 Kuhn grid: 6 sides * n^2 squares * 2 tris
    assert int((shared == 1).sum()) == 6 * 9 * 2


def test_freudenthal_grid_renders_and_differentiates():
    """End-to-end tet render of a small conformal grid: most rays through
    the cube must terminate validly (active), colors finite, and the
    vcolor/fopacity gradients finite and nonzero."""
    from dmesh_renderer_tpu.utils.connectivity import freudenthal_grid

    verts, tets = freudenthal_grid(2, jitter=0.05, seed=3)
    faces, face_tets, tet_faces = build_tet_connectivity(tets)
    rng = np.random.RandomState(0)
    vcolor = rng.rand(verts.shape[0], 3).astype(np.float32)
    fopacity = rng.uniform(0.4, 0.9, faces.shape[0]).astype(np.float32)
    fintense = np.ones((1, faces.shape[0]), np.float32)

    mv, proj = scenes.ring_cameras(1, radius=3.0)
    mv_t = np.swapaxes(mv, 1, 2).copy()
    proj_t = np.swapaxes(proj, 1, 2).copy()
    H = W = 32
    bg = jnp.asarray(np.array([0.0, 0.0, 0.0], np.float32))
    args = tuple(map(jnp.asarray, (
        verts, faces, vcolor, fopacity, mv_t, proj_t,
        np.linalg.inv(mv_t), np.linalg.inv(proj_t), fintense,
        tets, face_tets, tet_faces,
    )))

    def loss(vc, fo):
        c, d, act = render_tet_core(
            args[0], args[1], vc, fo, args[4], args[5], args[6], args[7],
            args[8], args[9], args[10], args[11], bg, H, W, 0,
        )
        return jnp.sum(c) + jnp.sum(d), act

    (val, act), (g_vc, g_fo) = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(args[2], args[3])
    act = np.array(act)
    assert np.isfinite(float(val))
    # the cube covers the image center; most of the center should be active
    center = act[:, H // 4: 3 * H // 4, W // 4: 3 * W // 4]
    assert center.mean() > 0.8
    assert np.isfinite(np.array(g_vc)).all()
    assert np.isfinite(np.array(g_fo)).all()
    assert float(jnp.sum(jnp.abs(g_vc))) > 0
    assert float(jnp.sum(jnp.abs(g_fo))) > 0


def test_replay_survivor_overflow_fallback_identical():
    """The replay reduction's compact path (one-hot run extraction) and
    its overflow fallback (full-width scatter of raw records) must produce
    matching gradients: force the fallback by shrinking the per-block run
    budget to zero."""
    import dmesh_renderer_tpu.ops.tet as tet_mod

    a = _args_single_tet(opacity=(0.3, 0.5, 0.6, 0.4), color=0.8,
                         bg=(0.1, 0.1, 0.1))

    def loss(vc, fo):
        c, d, _act = render_tet_core(
            a["verts"], a["faces"], vc, fo, a["mv_t"], a["proj_t"],
            a["inv_mv_t"], a["inv_proj_t"], a["faces_intense"], a["tets"],
            a["face_tets"], a["tet_faces"], a["bg"], H, W, 0)
        return jnp.sum(c * c) + jnp.sum(d)

    g1 = jax.grad(loss, argnums=(0, 1))(a["verts_color"],
                                        a["faces_opacity"])
    old = tet_mod.REPLAY_BLOCK_K
    try:
        tet_mod.REPLAY_BLOCK_K = 0  # any block with a run -> overflow path
        g2 = jax.grad(loss, argnums=(0, 1))(a["verts_color"],
                                            a["faces_opacity"])
    finally:
        tet_mod.REPLAY_BLOCK_K = old
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.array(a), np.array(b),
                                   rtol=1e-6, atol=1e-7)


def test_marching_fallback_with_compaction_matches(monkeypatch):
    """The marching-backward fallback's active-ray compaction
    (_compacted_while) moves state through packed row gathers/scatters;
    forcing BOTH the fallback (small LOG_CAP) and compaction (small
    COMPACT_MIN_SIZE) must reproduce the replay path's gradients."""
    import dmesh_renderer_tpu.ops.tet as tet_mod
    from dmesh_renderer_tpu.utils.connectivity import freudenthal_grid

    verts, tets = freudenthal_grid(2, jitter=0.05, seed=3)
    faces, face_tets, tet_faces = build_tet_connectivity(tets)
    rng = np.random.RandomState(1)
    vcolor = rng.rand(verts.shape[0], 3).astype(np.float32)
    fopacity = rng.uniform(0.2, 0.6, faces.shape[0]).astype(np.float32)
    fintense = np.ones((1, faces.shape[0]), np.float32)
    mv, proj = scenes.ring_cameras(1, radius=3.0)
    mv_t = np.swapaxes(mv, 1, 2).copy()
    proj_t = np.swapaxes(proj, 1, 2).copy()
    h = w = 32
    bg = jnp.asarray(np.array([0.1, 0.2, 0.3], np.float32))
    args = tuple(map(jnp.asarray, (
        verts, faces, vcolor, fopacity, mv_t, proj_t,
        np.linalg.inv(mv_t), np.linalg.inv(proj_t), fintense,
        tets, face_tets, tet_faces,
    )))

    def grads():
        def loss(vc, fo):
            c, d, _act = render_tet_core(
                args[0], args[1], vc, fo, args[4], args[5], args[6],
                args[7], args[8], args[9], args[10], args[11], bg, h, w, 0)
            return jnp.sum(c * c) + jnp.sum(d)

        return jax.tree.map(
            np.array, jax.grad(loss, argnums=(0, 1))(args[2], args[3]))

    g_replay = grads()
    monkeypatch.setattr(tet_mod, "LOG_CAP", 2)          # force fallback
    monkeypatch.setattr(tet_mod, "COMPACT_MIN_SIZE", 128)  # force compaction
    assert tet_mod._march_phase_sizes(1024) == [1024, 128]
    g_march = grads()
    for a, b in zip(g_replay, g_march):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-7)


def test_phased_march_matches_single_phase():
    """Forcing the compacted tail phases on a small scene must reproduce
    the single-phase march: images/active bit-identical (the per-ray blend
    math is unchanged by compaction), gradients equal up to reduction
    order. Exercises the segmented march log + deepest-first replay."""
    import dmesh_renderer_tpu.ops.tet as tet_mod
    from dmesh_renderer_tpu.utils.connectivity import freudenthal_grid

    verts, tets = freudenthal_grid(2, jitter=0.05, seed=3)
    faces, face_tets, tet_faces = build_tet_connectivity(tets)
    rng = np.random.RandomState(1)
    vcolor = rng.rand(verts.shape[0], 3).astype(np.float32)
    fopacity = rng.uniform(0.2, 0.6, faces.shape[0]).astype(np.float32)
    fintense = np.ones((1, faces.shape[0]), np.float32)
    mv, proj = scenes.ring_cameras(1, radius=3.0)
    mv_t = np.swapaxes(mv, 1, 2).copy()
    proj_t = np.swapaxes(proj, 1, 2).copy()
    h = w = 32
    bg = jnp.asarray(np.array([0.1, 0.2, 0.3], np.float32))
    args = tuple(map(jnp.asarray, (
        verts, faces, vcolor, fopacity, mv_t, proj_t,
        np.linalg.inv(mv_t), np.linalg.inv(proj_t), fintense,
        tets, face_tets, tet_faces,
    )))

    def run():
        def loss(vc, fo):
            c, d, act = render_tet_core(
                args[0], args[1], vc, fo, args[4], args[5], args[6],
                args[7], args[8], args[9], args[10], args[11], bg, h, w, 0)
            return jnp.sum(c * c) + jnp.sum(d), (c, d, act)

        (_, out), grads = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(args[2], args[3])
        return jax.tree.map(np.array, (out, grads))

    assert tet_mod._march_phase_sizes(1024) == [1024]
    out1, g1 = run()

    old_min = tet_mod.COMPACT_MIN_SIZE
    try:
        tet_mod.COMPACT_MIN_SIZE = 128  # [1024, 128]: two phases
        assert tet_mod._march_phase_sizes(1024) == [1024, 128]
        out2, g2 = run()
    finally:
        tet_mod.COMPACT_MIN_SIZE = old_min

    for a, b in zip(out1, out2):  # color, depth, active: bit-identical
        np.testing.assert_array_equal(a, b)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)
