"""Oracle tri renderer: parity vs the NumPy executable spec + metamorphic
tests (SURVEY.md section 4 test strategy)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dmesh_renderer_tpu.ops.tri_oracle import render_tri_oracle
import scenes
import numpy_reference as ref


H = W = 24
N_TRIS = 12
B = 2


@pytest.fixture(scope="module")
def scene():
    soup = scenes.random_triangle_soup(N_TRIS, seed=7)
    mv, proj = scenes.ring_cameras(B, radius=3.0)
    vdepth, fintense = scenes.soup_view_attrs(soup, B, seed=8)
    bg = np.array([0.1, 0.2, 0.3], np.float32)
    mv_t = np.swapaxes(mv, 1, 2).copy()
    proj_t = np.swapaxes(proj, 1, 2).copy()
    return dict(
        soup=soup, mv_t=mv_t, proj_t=proj_t, vdepth=vdepth,
        fintense=fintense, bg=bg,
    )


def _jax_args(s):
    soup = s["soup"]
    inv_mv_t = np.linalg.inv(s["mv_t"])
    inv_proj_t = np.linalg.inv(s["proj_t"])
    return (
        jnp.asarray(soup["verts"]), jnp.asarray(soup["faces"]),
        jnp.asarray(soup["verts_color"]), jnp.asarray(soup["faces_opacity"]),
        jnp.asarray(s["mv_t"]), jnp.asarray(s["proj_t"]),
        jnp.asarray(inv_mv_t), jnp.asarray(inv_proj_t),
        jnp.asarray(s["vdepth"]), jnp.asarray(s["fintense"]),
        jnp.asarray(s["bg"]), H, W,
    )


@pytest.fixture(scope="module")
def np_result(scene):
    s = scene
    soup = s["soup"]
    return ref.render_tri_np(
        soup["verts"], soup["faces"], soup["verts_color"],
        soup["faces_opacity"], s["mv_t"], s["proj_t"], s["vdepth"],
        s["fintense"], s["bg"], H, W,
    )


def test_forward_matches_numpy_spec(scene, np_result):
    color_np, depth_np, _ = np_result
    color, depth = render_tri_oracle(*_jax_args(scene))
    assert color.shape == (B, 3, H, W)
    assert depth.shape == (B, 1, H, W)
    assert np.max(np.abs(np.array(color) - color_np)) < 1e-4
    assert np.max(np.abs(np.array(depth) - depth_np)) < 1e-4


def test_backward_matches_numpy_spec(scene, np_result):
    s = scene
    soup = s["soup"]
    _, _, aux = np_result

    rng = np.random.RandomState(11)
    dL_dcolor = rng.randn(B, 3, H, W).astype(np.float32)
    dL_ddepth = rng.randn(B, 1, H, W).astype(np.float32)

    grads_np = ref.render_tri_np_backward(
        soup["verts"], soup["faces"], soup["verts_color"],
        soup["faces_opacity"], s["mv_t"], s["proj_t"], s["vdepth"],
        s["fintense"], s["bg"], H, W, dL_dcolor, dL_ddepth, aux,
    )

    args = _jax_args(scene)

    def loss(verts, vcolor, fopacity, vdepth, fintense):
        color, depth = render_tri_oracle(
            verts, args[1], vcolor, fopacity, args[4], args[5], args[6],
            args[7], vdepth, fintense, args[10], H, W,
        )
        return jnp.sum(color * dL_dcolor) + jnp.sum(depth * dL_ddepth)

    g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        args[0], args[2], args[3], args[8], args[9]
    )
    names = ["verts", "verts_color", "faces_opacity", "verts_depth",
             "faces_intense"]
    for got, name in zip(g, names):
        want = grads_np[name]
        scale = max(1.0, np.abs(want).max())
        err = np.abs(np.array(got, np.float64) - want).max() / scale
        assert err < 2e-4, f"{name}: rel Linf {err}"


def test_background_only(scene):
    """Zero-opacity faces leave pure background (transmittance conservation)."""
    s = scene
    args = list(_jax_args(scene))
    args[3] = jnp.zeros_like(args[3])  # opacity 0
    color, depth = render_tri_oracle(*args)
    want = np.broadcast_to(s["bg"][None, :, None, None], (B, 3, H, W))
    assert np.allclose(np.array(color), want, atol=1e-6)
    assert np.allclose(np.array(depth), 1.0, atol=1e-6)


def test_opaque_occlusion(scene):
    """A fully opaque front face hides everything behind it."""
    soup = scenes.random_triangle_soup(2, seed=3)
    # Big triangle in front (z toward camera 0), small behind
    verts = np.array(
        [
            # front triangle (closer to ring camera at radius 3)
            [-2.0, -2.0, 1.0], [2.0, -2.0, 1.0], [0.0, 2.5, 1.0],
            # back triangle
            [-2.0, -2.0, -1.0], [2.0, -2.0, -1.0], [0.0, 2.5, -1.0],
        ],
        np.float32,
    )
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    vcolor = np.zeros((6, 3), np.float32)
    vcolor[:3] = [1.0, 0.0, 0.0]
    vcolor[3:] = [0.0, 1.0, 0.0]
    fopacity = np.array([1.0, 1.0], np.float32)
    # Head-on camera so both triangles project concentrically.
    mv = scenes.look_at([0, 0, 4], [0, 0, 0], [0, 1, 0])[None]
    proj = scenes.perspective(60.0, 1.0, 0.1, 10.0)[None]
    mv_t = np.swapaxes(mv, 1, 2).copy()
    proj_t = np.swapaxes(proj, 1, 2).copy()
    vdepth = np.zeros((1, 6), np.float32)
    fintense = np.ones((1, 2), np.float32)
    bg = np.zeros(3, np.float32)

    color, _ = render_tri_oracle(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(vcolor),
        jnp.asarray(fopacity), jnp.asarray(mv_t), jnp.asarray(proj_t),
        jnp.asarray(np.linalg.inv(mv_t)), jnp.asarray(np.linalg.inv(proj_t)),
        jnp.asarray(vdepth), jnp.asarray(fintense), jnp.asarray(bg), H, W,
    )
    c = np.array(color)[0]
    # Wherever anything was hit, it must be pure red (front face), never green.
    hit = c.sum(0) > 0
    assert hit.any()
    assert np.all(c[1][hit] < 1e-6), "back face leaked through opaque front"


def test_jit_compiles(scene):
    f = jax.jit(render_tri_oracle, static_argnums=(11, 12))
    c1, d1 = f(*_jax_args(scene))
    c2, d2 = render_tri_oracle(*_jax_args(scene))
    assert np.allclose(c1, c2, atol=1e-6)


def test_spec_wrap_coverage_matches_oracle():
    """The scalar spec must reproduce the production coverage semantics on
    near-plane (int32-wrapping) faces: XLA's saturating f32->s32 convert,
    two's-complement edge-function wrap (numpy_reference._fx_i32/_w32), and
    the tile-rect membership restriction (rect granularity = BIN_TILE).
    Before the round-3 fix the spec used Python ints (no wrap) and no rect
    test, and deviated 1.4 L-inf from both production paths here -- too far
    off to arbitrate fuzz disagreements (tools/fuzz_tri_parity.spec_grads).
    """
    from test_tri_binned import _near_plane_scene

    from dmesh_renderer_tpu.utils.config import BIN_TILE

    a, h, w = _near_plane_scene()
    co, do_ = render_tri_oracle(*a, h, w)
    v, faces, vcolor, fo = (np.asarray(x) for x in a[:4])
    mv_t, proj_t = np.asarray(a[4]), np.asarray(a[5])
    vdepth, fint, bg = np.asarray(a[8]), np.asarray(a[9]), np.asarray(a[10])
    c_np, d_np, _aux = ref.render_tri_np(
        v, faces, vcolor, fo, mv_t, proj_t, vdepth, fint, bg, h, w,
        tile=BIN_TILE,
    )
    assert np.max(np.abs(np.array(co) - c_np)) < 1e-4
    assert np.max(np.abs(np.array(do_) - d_np)) < 1e-4
