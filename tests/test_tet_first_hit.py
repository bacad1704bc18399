"""Binned (Pallas) tet first-hit vs the dense min-reduction."""

import numpy as np
import jax.numpy as jnp

from dmesh_renderer_tpu.ops import tet as T
from dmesh_renderer_tpu.ops.tet_first_hit import first_intersection_binned
from dmesh_renderer_tpu.ops.binning import default_key_capacity
from dmesh_renderer_tpu.ops.geometry import preprocess_faces, project_verts
from dmesh_renderer_tpu.ops.rays import generate_rays
from dmesh_renderer_tpu.utils.connectivity import build_tet_connectivity
from test_native_runtime import _random_tet_grid
import scenes

H = W = 40
B = 2


def test_binned_first_hit_matches_dense():
    tets = _random_tet_grid(3)  # 135 tets, ~300 faces
    faces, face_tets, tet_faces = build_tet_connectivity(tets)
    n = 4
    grid_pts = np.stack(np.meshgrid(*([np.linspace(-1, 1, n)] * 3),
                                    indexing="ij"), -1).reshape(-1, 3)
    verts = jnp.asarray(grid_pts.astype(np.float32))
    facesj = jnp.asarray(faces)

    mv, proj = scenes.ring_cameras(B, radius=4.0)
    mv_t = jnp.asarray(np.swapaxes(mv, 1, 2))
    proj_t = jnp.asarray(np.swapaxes(proj, 1, 2))
    inv_mv_t = jnp.linalg.inv(mv_t)
    inv_proj_t = jnp.linalg.inv(proj_t)

    ndc, img = project_verts(verts, mv_t, proj_t, W, H)
    pre = preprocess_faces(ndc, img, facesj, W, H, 32, 32)

    ray_o, ray_d_img = generate_rays(inv_mv_t, inv_proj_t, W, H,
                                     norm_eps_mode="tet")
    ray_o = ray_o.reshape(B, H * W, 3)
    ray_d = ray_d_img.reshape(B, H * W, 3)

    order = jnp.argsort(
        jnp.where(pre["valid"], pre["min_depth"], jnp.inf), axis=1,
        stable=True,
    )
    ff_d, t_d, u_d, v_d = T._first_intersection(
        verts, facesj, pre["valid"], order, ray_o, ray_d
    )

    kcap = default_key_capacity(B, faces.shape[0])
    ff_b, t_b, u_b, v_b, (ovf, total, walked) = first_intersection_binned(
        verts, facesj, pre, img, inv_mv_t[:, 3, :3], ray_d_img, H, W, B, kcap,
    )
    assert not bool(ovf)
    assert int(total) > 0
    # the depth-window scan must walk at least every hit pixel's first slab
    assert int(walked) > 0

    ff_d, ff_b = np.array(ff_d), np.array(ff_b)
    hit_d = ff_d >= 0
    hit_b = ff_b >= 0
    # The binned kernel uses the reference's depth-window early-out, the
    # dense version is a global min -- they agree away from pathological
    # depth-window interleavings (none in this scene).
    np.testing.assert_array_equal(hit_d, hit_b)
    same = hit_d & (ff_d == ff_b)
    assert same.sum() / max(hit_d.sum(), 1) > 0.999, (
        f"face mismatch on {(hit_d & ~same).sum()} pixels"
    )
    m = hit_d & same
    np.testing.assert_allclose(np.array(t_b)[m], np.array(t_d)[m], rtol=1e-5)
    np.testing.assert_allclose(np.array(u_b)[m], np.array(u_d)[m],
                               rtol=1e-4, atol=1e-6)


def test_tet_render_binned_path_matches_dense():
    """Force the binned first hit through the full renderer by lowering the
    threshold, and compare against the dense path end-to-end."""
    tets = _random_tet_grid(2)  # 40 tets
    faces, face_tets, tet_faces = build_tet_connectivity(tets)
    n = 3
    grid_pts = np.stack(np.meshgrid(*([np.linspace(-1, 1, n)] * 3),
                                    indexing="ij"), -1).reshape(-1, 3)
    verts = grid_pts.astype(np.float32)

    from dmesh_renderer_tpu.ops.tet import render_tet_core
    import dmesh_renderer_tpu.ops.tet as tet_mod

    mv, proj = scenes.ring_cameras(1, radius=4.0)
    mv_t = jnp.asarray(np.swapaxes(mv, 1, 2))
    proj_t = jnp.asarray(np.swapaxes(proj, 1, 2))
    rng = np.random.RandomState(3)
    args = (
        jnp.asarray(verts), jnp.asarray(faces),
        jnp.asarray(rng.rand(verts.shape[0], 3).astype(np.float32)),
        jnp.asarray(rng.uniform(0.2, 0.8, faces.shape[0]).astype(np.float32)),
        mv_t, proj_t, jnp.linalg.inv(mv_t), jnp.linalg.inv(proj_t),
        jnp.asarray(np.ones((1, faces.shape[0]), np.float32)),
        jnp.asarray(tets.astype(np.int32)), jnp.asarray(face_tets),
        jnp.asarray(tet_faces), jnp.zeros(3), H, W, 0,
    )

    old = tet_mod.BINNED_FIRST_HIT_THRESHOLD
    try:
        tet_mod.BINNED_FIRST_HIT_THRESHOLD = 10**9
        c_dense, d_dense, a_dense = render_tet_core(*args)
        tet_mod.BINNED_FIRST_HIT_THRESHOLD = 1
        c_bin, d_bin, a_bin = render_tet_core(*args)
    finally:
        tet_mod.BINNED_FIRST_HIT_THRESHOLD = old

    np.testing.assert_array_equal(np.array(a_dense), np.array(a_bin))
    np.testing.assert_allclose(np.array(c_bin), np.array(c_dense), atol=1e-5)
    np.testing.assert_allclose(np.array(d_bin), np.array(d_dense), atol=1e-5)


def test_tet_first_hit_overflow_surfaced_as_data():
    """A too-small key capacity must flip the aux overflow flag through the
    public render_tet API (VERDICT r2 W3: the axon backend cannot print
    warnings -- binning.py overflow_warning -- so data is the only reliable
    channel; a dropped first-hit face yields a wrong image AND wrong active
    mask with no other signal)."""
    import jax
    from dmesh_renderer_tpu.api import TetRenderSettings, render_tet
    import dmesh_renderer_tpu.ops.tet as tet_mod

    tets = _random_tet_grid(3)
    faces, face_tets, tet_faces = build_tet_connectivity(tets)
    n = 4
    grid_pts = np.stack(np.meshgrid(*([np.linspace(-1, 1, n)] * 3),
                                    indexing="ij"), -1).reshape(-1, 3)
    verts = grid_pts.astype(np.float32)

    mv, proj = scenes.ring_cameras(1, radius=4.0)
    rng = np.random.RandomState(3)
    common = (
        verts, faces,
        rng.rand(verts.shape[0], 3).astype(np.float32),
        rng.uniform(0.2, 0.8, faces.shape[0]).astype(np.float32),
        np.swapaxes(mv, 1, 2), np.swapaxes(proj, 1, 2),
        np.zeros((1, verts.shape[0]), np.float32),
        np.ones((1, faces.shape[0]), np.float32),
        tets.astype(np.int32), face_tets, tet_faces,
    )

    old = tet_mod.BINNED_FIRST_HIT_THRESHOLD
    try:
        tet_mod.BINNED_FIRST_HIT_THRESHOLD = 1  # force the binned path

        def run(kcap):
            s = TetRenderSettings(H, W, np.zeros(3, np.float32),
                                  key_capacity=kcap)
            # jit: the flag must be observable as traced data
            f = jax.jit(lambda: render_tet(*common, s, return_aux=True)[3])
            ovf, total = f()
            return bool(ovf), int(total)

        ovf_big, total = run(200_000)
        assert not ovf_big and total > 0
        ovf_small, _ = run(128)  # far below the real pair count
        assert ovf_small
    finally:
        tet_mod.BINNED_FIRST_HIT_THRESHOLD = old
