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
    np.testing.assert_allclose(np.array(color), np.array(c2), atol=1e-6)


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
    assert active.dtype == jnp.bool_
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
