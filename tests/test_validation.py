"""API boundary validation (binding-layer shape checks, render.cu parity)."""

import numpy as np
import pytest

from dmesh_renderer_tpu import TriRenderSettings, render_tri
import scenes


def test_bad_shapes_raise():
    soup = scenes.random_triangle_soup(4, seed=0)
    mv, proj = scenes.ring_cameras(1)
    mv_t = np.swapaxes(mv, 1, 2).copy()
    proj_t = np.swapaxes(proj, 1, 2).copy()
    settings = TriRenderSettings(8, 8, np.zeros(3, np.float32))

    good = dict(
        verts=soup["verts"], faces=soup["faces"],
        verts_color=soup["verts_color"], faces_opacity=soup["faces_opacity"],
        mv_mats=mv_t, proj_mats=proj_t,
        verts_depth=np.zeros((1, soup["verts"].shape[0]), np.float32),
        faces_intense=np.ones((1, 4), np.float32),
    )

    def run(**over):
        kw = dict(good, **over)
        return render_tri(kw["verts"], kw["faces"], kw["verts_color"],
                          kw["faces_opacity"], kw["mv_mats"], kw["proj_mats"],
                          kw["verts_depth"], kw["faces_intense"], settings)

    run()  # sanity: good shapes pass

    with pytest.raises(ValueError, match="verts_color"):
        run(verts_color=np.zeros((3, 3), np.float32))
    with pytest.raises(ValueError, match="faces_opacity"):
        run(faces_opacity=np.zeros(7, np.float32))
    with pytest.raises(ValueError, match="verts_depth"):
        run(verts_depth=np.zeros((2, 5), np.float32))
    with pytest.raises(ValueError, match="faces_intense"):
        run(faces_intense=np.ones((1, 9), np.float32))
    with pytest.raises(ValueError, match=r"mv_mats"):
        run(mv_mats=np.eye(4, dtype=np.float32))
