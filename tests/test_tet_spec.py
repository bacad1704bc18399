"""Tet renderer vs. the scalar NumPy executable spec + golden lock.

The spec (tests/numpy_reference.py: render_tet_np / render_tet_np_backward)
transcribes the CUDA tet renderer semantics (cuda_renderer/forward.cu:485-815,
backward.cu:86-487) with plain per-pixel loops; this pins the vectorized JAX
march (masking, compaction, lockstep invariants) against an independent
implementation. The golden npz locks against drift between rounds.

Regenerate the golden intentionally with: python tests/test_tet_spec.py --regen
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

from dmesh_renderer_tpu.ops.tet import render_tet_core
from dmesh_renderer_tpu.utils.connectivity import (
    build_tet_connectivity, freudenthal_grid,
)
import scenes
from numpy_reference import render_tet_np, render_tet_np_backward

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "tet_scene.npz")
H, W, B = 24, 24, 2


def _scene():
    verts, tets = freudenthal_grid(2, jitter=0.12, seed=7)
    faces, face_tets, tet_faces = build_tet_connectivity(tets)
    rng = np.random.RandomState(11)
    vcolor = rng.rand(verts.shape[0], 3).astype(np.float32)
    fopacity = rng.uniform(0.25, 0.95, faces.shape[0]).astype(np.float32)
    # exercise the alpha == 1.0 special case (forward.cu:636-642)
    fopacity[3] = 1.0
    fintense = rng.uniform(0.5, 1.0, (B, faces.shape[0])).astype(np.float32)
    mv, proj = scenes.ring_cameras(B, radius=3.0)
    mv_t = np.swapaxes(mv, 1, 2).copy()
    proj_t = np.swapaxes(proj, 1, 2).copy()
    bg = np.array([0.15, 0.05, 0.25], np.float32)
    return (verts, faces, vcolor, fopacity, mv_t, proj_t, fintense,
            tets, face_tets, tet_faces, bg)


def _jax_render_and_grads(sc):
    (verts, faces, vcolor, fopacity, mv_t, proj_t, fintense,
     tets, face_tets, tet_faces, bg) = map(jnp.asarray, sc)
    rng = np.random.RandomState(5)
    wc = jnp.asarray(rng.randn(B, 3, H, W).astype(np.float32))
    wd = jnp.asarray(rng.randn(B, 1, H, W).astype(np.float32))

    def loss(vc, fo):
        c, d, act = render_tet_core(
            verts, faces, vc, fo, mv_t, proj_t,
            jnp.linalg.inv(mv_t), jnp.linalg.inv(proj_t), fintense,
            tets, face_tets, tet_faces, bg, H, W, 0,
        )
        return jnp.sum(c * wc) + jnp.sum(d * wd), (c, d, act)

    (_, (c, d, act)), (g_vc, g_fo) = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(vcolor, fopacity)
    return (np.array(c), np.array(d), np.array(act), np.array(g_vc),
            np.array(g_fo), np.array(wc), np.array(wd))


def test_tet_matches_numpy_spec():
    sc = _scene()
    (verts, faces, vcolor, fopacity, mv_t, proj_t, fintense,
     tets, face_tets, tet_faces, bg) = sc
    c_j, d_j, act_j, g_vc_j, g_fo_j, wc, wd = _jax_render_and_grads(sc)

    c_n, d_n, act_n, aux = render_tet_np(
        verts, faces, vcolor, fopacity, mv_t, proj_t, fintense,
        tets, face_tets, tet_faces, bg, H, W,
    )
    # active masks must agree exactly (bit-for-bit contract, SURVEY section 5)
    np.testing.assert_array_equal(act_j, act_n)
    np.testing.assert_allclose(c_j, c_n, atol=2e-5)
    np.testing.assert_allclose(d_j, d_n, atol=2e-5)

    g = render_tet_np_backward(
        verts, faces, vcolor, fopacity, mv_t, proj_t, fintense,
        tets, face_tets, tet_faces, bg, H, W, wc, wd, aux,
    )
    for got, want, name in (
        (g_vc_j, g["verts_color"], "verts_color"),
        (g_fo_j, g["faces_opacity"], "faces_opacity"),
    ):
        scale = max(1.0, np.abs(want).max())
        err = np.abs(got - want).max() / scale
        assert err < 2e-4, f"{name}: rel Linf {err}"


def test_tet_camera_inside_tessellation_matches_spec():
    """Camera INSIDE the tessellation (ring radius smaller than the grid
    extent): the first hit starts mid-walk and the entry-normal selection
    sees faces from both sides -- a regime the golden scene's outside
    cameras never exercise. Distilled from the round-3 fuzz sweep (jittered
    grids at 5 configs all matched; zero-jitter regular grids are
    fp-degenerate by construction -- see the ops/tet.py module docstring)."""
    verts, tets = freudenthal_grid(2, jitter=0.12, seed=25)
    faces, face_tets, tet_faces = build_tet_connectivity(tets)
    rng = np.random.RandomState(26)
    vcolor = rng.rand(verts.shape[0], 3).astype(np.float32)
    fopacity = rng.uniform(0.25, 0.95, faces.shape[0]).astype(np.float32)
    fintense = rng.uniform(0.5, 1.0, (1, faces.shape[0])).astype(np.float32)
    mv, proj = scenes.ring_cameras(1, radius=0.6)
    mv_t = np.swapaxes(mv, 1, 2).copy()
    proj_t = np.swapaxes(proj, 1, 2).copy()
    bg = np.array([0.3, 0.1, 0.2], np.float32)
    sc = (verts, faces, vcolor, fopacity, mv_t, proj_t, fintense,
          tets, face_tets, tet_faces, bg)
    scj = list(map(jnp.asarray, sc))
    h = w = 24
    wc = jnp.asarray(np.random.RandomState(27).randn(1, 3, h, w)
                     .astype(np.float32))
    wd = jnp.asarray(np.random.RandomState(28).randn(1, 1, h, w)
                     .astype(np.float32))

    def loss(vc, fo):
        c, d, act = render_tet_core(
            scj[0], scj[1], vc, fo, scj[4], scj[5],
            jnp.linalg.inv(scj[4]), jnp.linalg.inv(scj[5]), scj[6],
            scj[7], scj[8], scj[9], scj[10], h, w, 0)
        return jnp.sum(c * wc) + jnp.sum(d * wd), (c, d, act)

    (_, (c, d, act)), (g_vc, g_fo) = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(scj[2], scj[3])

    c_n, d_n, act_n, aux = render_tet_np(*sc, h, w)
    np.testing.assert_array_equal(np.array(act), act_n)
    assert 0 < act_n.sum()  # rays from inside do hit
    np.testing.assert_allclose(np.array(c), c_n, atol=2e-5)
    np.testing.assert_allclose(np.array(d), d_n, atol=2e-5)
    g = render_tet_np_backward(*sc, h, w, np.array(wc), np.array(wd), aux)
    for got, want in ((np.array(g_vc), g["verts_color"]),
                      (np.array(g_fo), g["faces_opacity"])):
        scale = max(1.0, np.abs(want).max())
        assert np.abs(got - want).max() / scale < 2e-4


def test_marching_backward_fallback_matches_replay(monkeypatch):
    """Walks deeper than the march log fall back from the log-replay
    backward to the re-walking marching backward (ops/tet._tet_bwd cond on
    nc_max <= log_depth). Force that branch by shrinking LOG_CAP below the
    scene's deepest walk and check the two backward algorithms agree."""
    import dmesh_renderer_tpu.ops.tet as tet_mod

    sc = _scene()
    (verts, faces, vcolor, fopacity, mv_t, proj_t, fintense,
     tets, face_tets, tet_faces, bg) = sc
    # the golden scene's deepest walk exceeds 4 steps: truncating the
    # march at 4 steps changes the image
    scj0 = list(map(jnp.asarray, sc))

    def render(ms):
        return render_tet_core(
            scj0[0], scj0[1], scj0[2], scj0[3], scj0[4], scj0[5],
            jnp.linalg.inv(scj0[4]), jnp.linalg.inv(scj0[5]), scj0[6],
            scj0[7], scj0[8], scj0[9], scj0[10], H, W, 0, max_steps=ms)[0]

    assert float(jnp.abs(render(4) - render(24)).max()) > 1e-4

    def grads(max_steps):
        scj = list(map(jnp.asarray, sc))
        rng = np.random.RandomState(5)
        wc = jnp.asarray(rng.randn(B, 3, H, W).astype(np.float32))
        wd = jnp.asarray(rng.randn(B, 1, H, W).astype(np.float32))

        def loss(vc, fo):
            c, d, act = render_tet_core(
                scj[0], scj[1], vc, fo, scj[4], scj[5],
                jnp.linalg.inv(scj[4]), jnp.linalg.inv(scj[5]), scj[6],
                scj[7], scj[8], scj[9], scj[10], H, W, 0,
                max_steps=max_steps)
            return jnp.sum(c * wc) + jnp.sum(d * wd)

        return jax.grad(loss, argnums=(0, 1))(scj[2], scj[3])

    g_replay = grads(max_steps=24)  # log covers the walk: replay path
    monkeypatch.setattr(tet_mod, "LOG_CAP", 4)
    g_march = grads(max_steps=24)  # log too short: marching backward runs
    for a, b, name in zip(g_replay, g_march, ["verts_color",
                                              "faces_opacity"]):
        a, b = np.array(a, np.float64), np.array(b, np.float64)
        scale = max(1.0, np.abs(a).max())
        err = np.abs(a - b).max() / scale
        assert err < 2e-4, f"{name}: rel Linf {err}"


def _golden_payload():
    sc = _scene()
    c, d, act, g_vc, g_fo, _, _ = _jax_render_and_grads(sc)
    return {"color": c, "depth": d, "active": act,
            "g_vcolor": g_vc, "g_fopacity": g_fo}


def test_tet_matches_golden():
    golden = dict(np.load(GOLDEN))
    got = _golden_payload()
    np.testing.assert_array_equal(got["active"], golden["active"])
    for k in ("color", "depth", "g_vcolor", "g_fopacity"):
        scale = max(1.0, np.abs(golden[k]).max())
        err = np.abs(got[k] - golden[k]).max() / scale
        assert err < 1e-5, f"{k}: rel Linf {err}"


if __name__ == "__main__" and "--regen" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    np.savez(GOLDEN, **_golden_payload())
    print(f"wrote {GOLDEN}")
