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


def test_overflow_truncates_gracefully(args):
    c, d = render_tri_binned(*args, H, W, 256)
    assert np.isfinite(np.array(c)).all()
    assert np.isfinite(np.array(d)).all()
