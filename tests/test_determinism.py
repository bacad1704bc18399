"""Gradients must be bitwise deterministic across runs.

The CUDA reference's atomicAdd scatter (backward.cu:389-418) is NOT
deterministic; the TPU design replaces it with ordered segment reductions.
This is a structural improvement we lock in with a property test
(SURVEY.md section 5, race detection row).
"""

import numpy as np
import jax
import jax.numpy as jnp

from dmesh_renderer_tpu.ops.tri_oracle import render_tri_oracle
from dmesh_renderer_tpu.ops.tri_binned import render_tri_binned
from dmesh_renderer_tpu.ops.tet import render_tet_core
import scenes

H = W = 24


def _tri_args():
    soup = scenes.random_triangle_soup(10, seed=5)
    mv, proj = scenes.ring_cameras(2)
    vdepth, fintense = scenes.soup_view_attrs(soup, 2)
    mv_t = np.swapaxes(mv, 1, 2).copy()
    proj_t = np.swapaxes(proj, 1, 2).copy()
    return (
        jnp.asarray(soup["verts"]), jnp.asarray(soup["faces"]),
        jnp.asarray(soup["verts_color"]), jnp.asarray(soup["faces_opacity"]),
        jnp.asarray(mv_t), jnp.asarray(proj_t),
        jnp.asarray(np.linalg.inv(mv_t)), jnp.asarray(np.linalg.inv(proj_t)),
        jnp.asarray(vdepth), jnp.asarray(fintense),
        jnp.asarray(np.array([0.1, 0.2, 0.3], np.float32)),
    )


def _grads(render, args):
    def loss(verts, vcolor, fop, vdepth, fint):
        c, d = render(
            verts, args[1], vcolor, fop, args[4], args[5], args[6], args[7],
            vdepth, fint, args[10], H, W,
        )
        return jnp.sum(c * c) + jnp.sum(d)

    return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        args[0], args[2], args[3], args[8], args[9]
    )


def test_tri_oracle_grads_bitwise_deterministic():
    args = _tri_args()
    g1 = _grads(render_tri_oracle, args)
    g2 = _grads(render_tri_oracle, args)
    for a, b in zip(g1, g2):
        assert np.array_equal(np.array(a), np.array(b))


def test_tri_binned_grads_bitwise_deterministic():
    args = _tri_args()
    g1 = _grads(render_tri_binned, args)
    g2 = _grads(render_tri_binned, args)
    for a, b in zip(g1, g2):
        assert np.array_equal(np.array(a), np.array(b))


def test_tet_grads_bitwise_deterministic():
    verts, faces, tets, face_tets, tet_faces = scenes.single_tet()
    mv = scenes.look_at([0.3, 0.2, 4.0], [0, 0, 0], [0, 1, 0])[None]
    proj = scenes.perspective(60.0, 1.0, 0.1, 10.0)[None]
    mv_t = jnp.asarray(np.swapaxes(mv, 1, 2))
    proj_t = jnp.asarray(np.swapaxes(proj, 1, 2))

    def loss(vc, fo):
        c, d, _ = render_tet_core(
            jnp.asarray(verts), jnp.asarray(faces), vc, fo, mv_t, proj_t,
            jnp.linalg.inv(mv_t), jnp.linalg.inv(proj_t),
            jnp.ones((1, 4)), jnp.asarray(tets), jnp.asarray(face_tets),
            jnp.asarray(tet_faces), jnp.zeros(3), H, W, 0,
        )
        return jnp.sum(c) + jnp.sum(d)

    vc = jnp.full((4, 3), 0.6)
    fo = jnp.asarray([0.3, 0.4, 0.5, 0.6])
    g1 = jax.grad(loss, argnums=(0, 1))(vc, fo)
    g2 = jax.grad(loss, argnums=(0, 1))(vc, fo)
    for a, b in zip(g1, g2):
        assert np.array_equal(np.array(a), np.array(b))
