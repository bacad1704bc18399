"""Golden-image regression: locks rendered output against parity drift.

The golden arrays are generated once by the oracle renderer (CPU) and
committed (tests/golden/). Any change to coverage rules, sort order,
blending, or gradients that shifts output beyond float-noise fails here.
Regenerate intentionally with: python tests/test_golden.py --regen
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

from dmesh_renderer_tpu.ops.tri_oracle import render_tri_oracle
from dmesh_renderer_tpu.ops.tri_binned import render_tri_binned
import scenes

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "tri_scene.npz")
H, W, B, N_TRIS = 32, 32, 2, 16


def _args():
    soup = scenes.random_triangle_soup(N_TRIS, seed=42)
    mv, proj = scenes.ring_cameras(B, radius=3.0)
    vdepth, fintense = scenes.soup_view_attrs(soup, B, seed=43)
    mv_t = np.swapaxes(mv, 1, 2).copy()
    proj_t = np.swapaxes(proj, 1, 2).copy()
    return (
        jnp.asarray(soup["verts"]), jnp.asarray(soup["faces"]),
        jnp.asarray(soup["verts_color"]), jnp.asarray(soup["faces_opacity"]),
        jnp.asarray(mv_t), jnp.asarray(proj_t),
        jnp.asarray(np.linalg.inv(mv_t)), jnp.asarray(np.linalg.inv(proj_t)),
        jnp.asarray(vdepth), jnp.asarray(fintense),
        jnp.asarray(np.array([0.2, 0.1, 0.3], np.float32)),
    )


def _render_and_grads(render):
    args = _args()
    color, depth = render(*args, H, W)

    def loss(verts, vcolor, fop, vdepth, fint):
        c, d = render(args[0], args[1], vcolor, fop, args[4], args[5],
                      args[6], args[7], vdepth, fint, args[10], H, W)
        # verts grad via the primal verts argument
        c2, d2 = render(verts, args[1], args[2], args[3], args[4], args[5],
                        args[6], args[7], args[8], args[9], args[10], H, W)
        return jnp.sum(c * c) + jnp.sum(d) + jnp.sum(c2 * d2)

    g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        args[0], args[2], args[3], args[8], args[9]
    )
    return {
        "color": np.array(color), "depth": np.array(depth),
        "g_verts": np.array(g[0]), "g_vcolor": np.array(g[1]),
        "g_fop": np.array(g[2]), "g_vdepth": np.array(g[3]),
        "g_fint": np.array(g[4]),
    }


def test_oracle_matches_golden():
    golden = dict(np.load(GOLDEN))
    got = _render_and_grads(render_tri_oracle)
    for k, want in golden.items():
        scale = max(1.0, np.abs(want).max())
        err = np.abs(got[k] - want).max() / scale
        assert err < 1e-5, f"{k}: rel Linf {err}"


def test_binned_matches_golden():
    golden = dict(np.load(GOLDEN))
    got = _render_and_grads(render_tri_binned)
    for k, want in golden.items():
        scale = max(1.0, np.abs(want).max())
        err = np.abs(got[k] - want).max() / scale
        assert err < 1e-4, f"{k}: rel Linf {err}"


if __name__ == "__main__" and "--regen" in sys.argv:
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    np.savez(GOLDEN, **_render_and_grads(render_tri_oracle))
    print(f"wrote {GOLDEN}")
