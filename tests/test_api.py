"""Drop-in API parity layer: reference-style usage with torch tensors."""

import numpy as np
import pytest

th = pytest.importorskip("torch")

import jax.numpy as jnp

from dmesh_renderer_tpu import (
    TriRenderSettings, TriRenderer, render_tri,
    TetRenderSettings, TetRenderer,
)
import scenes

H = W = 24


def test_tri_renderer_torch_inputs():
    soup = scenes.random_triangle_soup(8, seed=1)
    mv, proj = scenes.ring_cameras(2)
    vdepth, fintense = scenes.soup_view_attrs(soup, 2)

    settings = TriRenderSettings(H, W, th.tensor([0.1, 0.2, 0.3]))
    renderer = TriRenderer(settings)
    color, depth = renderer(
        th.tensor(soup["verts"]), th.tensor(soup["faces"]).long(),
        th.tensor(soup["verts_color"]), th.tensor(soup["faces_opacity"]),
        th.tensor(mv), th.tensor(proj), th.tensor(vdepth),
        th.tensor(fintense),
    )
    assert color.shape == (2, 3, H, W)
    assert depth.shape == (2, 1, H, W)
    assert np.isfinite(np.array(color)).all()

    # functional API with pre-transposed mats must agree with the module
    mv_t = np.swapaxes(mv, 1, 2).copy()
    proj_t = np.swapaxes(proj, 1, 2).copy()
    c2, d2 = render_tri(
        soup["verts"], soup["faces"], soup["verts_color"],
        soup["faces_opacity"], mv_t, proj_t, vdepth, fintense, settings,
    )
    # torch path runs under jit, jax path eager: f32 fusion-order noise
    np.testing.assert_allclose(np.array(color), np.array(c2), atol=1e-5)


def test_tet_renderer_torch_inputs():
    verts, faces, tets, face_tets, tet_faces = scenes.single_tet()
    mv = scenes.look_at([0.3, 0.2, 4.0], [0, 0, 0], [0, 1, 0])[None]
    proj = scenes.perspective(60.0, 1.0, 0.1, 10.0)[None]

    settings = TetRenderSettings(H, W, th.tensor([0.0, 0.0, 0.0]), 0)
    renderer = TetRenderer(settings)
    color, depth, active = renderer(
        th.tensor(verts), th.tensor(faces).long(), th.full((4, 3), 0.8),
        th.tensor([0.5] * 4), th.tensor(mv), th.tensor(proj),
        th.zeros(1, 4), th.ones(1, 4), th.tensor(tets).long(),
        th.tensor(face_tets).long(), th.tensor(tet_faces).long(),
    )
    assert color.shape == (1, 3, H, W)
    # torch inputs route through the autograd bridge -> torch.bool active
    # (reference parity: _RenderTet returns a thresholded bool tensor)
    assert np.asarray(active).dtype == np.bool_
    assert bool(np.array(active).any())


def test_unused_verts_depth_api_parity():
    """verts_depth is accepted but unused by the tet renderer
    (reference __init__.py:448-450)."""
    verts, faces, tets, face_tets, tet_faces = scenes.single_tet()
    mv = scenes.look_at([0.3, 0.2, 4.0], [0, 0, 0], [0, 1, 0])[None]
    proj = scenes.perspective(60.0, 1.0, 0.1, 10.0)[None]
    settings = TetRenderSettings(H, W, th.tensor([0.0, 0.0, 0.0]), 0)
    renderer = TetRenderer(settings)

    def run(vd):
        return renderer(
            th.tensor(verts), th.tensor(faces), th.full((4, 3), 0.8),
            th.tensor([0.5] * 4), th.tensor(mv), th.tensor(proj),
            vd, th.ones(1, 4), th.tensor(tets), th.tensor(face_tets),
            th.tensor(tet_faces),
        )

    c1, d1, _ = run(th.zeros(1, 4))
    c2, d2, _ = run(th.rand(1, 4))
    np.testing.assert_array_equal(np.array(c1), np.array(c2))
    np.testing.assert_array_equal(np.array(d1), np.array(d2))


def test_reference_package_name_alias():
    """`import dmesh_renderer` (the reference's package name) must expose
    the full public API so reference user code runs unmodified."""
    import dmesh_renderer as dr
    import dmesh_renderer_tpu as drt

    for name in ("TriRenderSettings", "TriRenderer", "render_tri",
                 "TetRenderSettings", "TetRenderer", "render_tet"):
        assert getattr(dr, name) is getattr(drt, name)


# =============================================================================
# Empty / degenerate geometry parity (reference render.cu:87-130, :288-334)
# =============================================================================

def _identity_mats(B):
    eye = np.eye(4, dtype=np.float32)
    return np.tile(eye, (B, 1, 1)), np.tile(eye, (B, 1, 1))


def test_tri_zero_verts_renders_zeros():
    """P == 0: the reference never launches the pipeline and returns the
    zero-initialized outputs verbatim (render.cu:87-88, :104-105)."""
    B = 2
    mv, proj = _identity_mats(B)
    settings = TriRenderSettings(H, W, np.array([0.2, 0.4, 0.6], np.float32))
    color, depth = TriRenderer(settings)(
        np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32),
        np.zeros((0, 3), np.float32), np.zeros((0,), np.float32),
        mv, proj, np.zeros((B, 0), np.float32), np.zeros((B, 0), np.float32),
    )
    np.testing.assert_array_equal(np.array(color), 0.0)
    np.testing.assert_array_equal(np.array(depth), 0.0)


def test_tri_zero_faces_renders_background():
    """P > 0, F == 0: the pipeline runs with empty tile ranges, so every
    pixel blends nothing -> bg color, depth = 1 (forward.cu:478-488)."""
    B = 2
    mv, proj = _identity_mats(B)
    bg = np.array([0.2, 0.4, 0.6], np.float32)
    settings = TriRenderSettings(H, W, bg)
    color, depth = TriRenderer(settings)(
        np.zeros((5, 3), np.float32), np.zeros((0, 3), np.int32),
        np.zeros((5, 3), np.float32), np.zeros((0,), np.float32),
        mv, proj, np.zeros((B, 5), np.float32), np.zeros((B, 0), np.float32),
    )
    np.testing.assert_allclose(
        np.array(color), np.broadcast_to(bg.reshape(1, 3, 1, 1),
                                         (B, 3, H, W)), atol=1e-7)
    np.testing.assert_allclose(np.array(depth), 1.0, atol=1e-7)


def test_tri_zero_faces_force_binned_does_not_raise():
    """render_tri_auto must handle F == 0 even when the binned path is
    forced (it reroutes to the oracle; the binned path needs F >= 1)."""
    from dmesh_renderer_tpu.ops.tri import render_tri_auto
    import jax.numpy as jnp

    B = 1
    mv, proj = _identity_mats(B)
    mv_t = jnp.asarray(np.swapaxes(mv, 1, 2))
    proj_t = jnp.asarray(np.swapaxes(proj, 1, 2))
    color, depth = render_tri_auto(
        jnp.zeros((5, 3)), jnp.zeros((0, 3), jnp.int32), jnp.zeros((5, 3)),
        jnp.zeros((0,)), mv_t, proj_t, jnp.linalg.inv(mv_t),
        jnp.linalg.inv(proj_t), jnp.zeros((B, 5)), jnp.zeros((B, 0)),
        jnp.array([1.0, 0.0, 0.0]), H, W, force="binned",
    )
    np.testing.assert_allclose(np.array(color[:, 0]), 1.0, atol=1e-7)


def test_tet_empty_geometry_renders_inactive_background():
    """F == 0 / T == 0: no pixel finds a first hit, so the inactive fill
    applies everywhere: bg color, depth = 1, active = false
    (cuda_renderer/forward.cu:533-558, :806-814)."""
    from dmesh_renderer_tpu import render_tet

    B = 2
    mv, proj = _identity_mats(B)
    bg = np.array([0.2, 0.4, 0.6], np.float32)
    settings = TetRenderSettings(H, W, bg, 0)
    color, depth, active = TetRenderer(settings)(
        np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32),
        np.zeros((0, 3), np.float32), np.zeros((0,), np.float32),
        mv, proj, np.zeros((B, 0), np.float32), np.zeros((B, 0), np.float32),
        np.zeros((0, 4), np.int32), np.zeros((0, 2), np.int32),
        np.zeros((0, 4), np.int32),
    )
    np.testing.assert_allclose(
        np.array(color), np.broadcast_to(bg.reshape(1, 3, 1, 1),
                                         (B, 3, H, W)), atol=1e-7)
    np.testing.assert_allclose(np.array(depth), 1.0, atol=1e-7)
    assert not np.array(active).any()


def test_empty_geometry_gradients():
    """Differentiating through the empty-geometry paths yields zero-size
    (hence trivially correct) gradients without raising."""
    import jax
    import jax.numpy as jnp
    from dmesh_renderer_tpu import render_tri

    B = 1
    mv, proj = _identity_mats(B)
    mv_t = jnp.asarray(np.swapaxes(mv, 1, 2))
    proj_t = jnp.asarray(np.swapaxes(proj, 1, 2))
    settings = TriRenderSettings(H, W, np.zeros(3, np.float32))

    def loss(vcolor, fopacity):
        c, d = render_tri(
            jnp.zeros((5, 3)), jnp.zeros((0, 3), jnp.int32), vcolor,
            fopacity, mv_t, proj_t, jnp.zeros((B, 5)), jnp.zeros((B, 0)),
            settings,
        )
        return jnp.sum(c) + jnp.sum(d)

    gv, gf = jax.grad(loss, argnums=(0, 1))(
        jnp.zeros((5, 3)), jnp.zeros((0,)))
    assert gv.shape == (5, 3) and gf.shape == (0,)
    assert np.isfinite(np.array(gv)).all()
