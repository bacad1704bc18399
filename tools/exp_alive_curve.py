"""Alive-ray curve of the tet march at the bench scene: how many rays are
still marching at step k (fwd), and the n_contrib distribution. Drives the
compaction schedule design.

Run: python tools/exp_alive_curve.py [n_grid] [size]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_grid = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 800

    import jax
    import jax.numpy as jnp

    from dmesh_renderer_tpu.ops import tet as tet_mod
    from dmesh_renderer_tpu.ops.tet import _render_tet_forward
    from dmesh_renderer_tpu.runtime.native import build_tet_connectivity
    from dmesh_renderer_tpu.utils.connectivity import freudenthal_grid
    from bench import _build

    H = W = size
    verts, tets = freudenthal_grid(n_grid, jitter=0.15, seed=2)
    faces, face_tets, tet_faces = build_tet_connectivity(tets)
    rng = np.random.RandomState(0)
    vcolor = rng.rand(verts.shape[0], 3).astype(np.float32)
    fopacity = rng.uniform(0.3, 0.9, faces.shape[0]).astype(np.float32)
    fintense = rng.uniform(0.5, 1.0, (1, faces.shape[0])).astype(np.float32)
    mv, proj = _build(1, 1, H, W)[4:6]

    args = tuple(map(jnp.asarray, (
        verts, faces, vcolor, fopacity, mv, proj,
        np.linalg.inv(mv), np.linalg.inv(proj), fintense,
        tets, face_tets, tet_faces,
    )))
    bg = jnp.asarray(np.array([0.1, 0.1, 0.1], np.float32))
    print(f"scene: {faces.shape[0]} faces, {tets.shape[0]} tets, {size}px")

    @jax.jit
    def stats(fo):
        _c, _d, _a, saved = _render_tet_forward(
            args[0], args[1], args[2], fo, args[4], args[5], args[6],
            args[7], args[8], args[9], args[10], args[11], bg, H, W, 0,
            tet_mod.DEFAULT_MAX_MARCH_STEPS)
        return saved["n_contrib"], saved["is_active"]

    nc, act = jax.device_get(stats(args[3]))
    nc = nc.ravel().astype(np.int64)
    act = act.ravel()
    M = nc.size
    print(f"rays: {M}  active: {act.mean():.3f}  hit (nc>0): "
          f"{(nc > 0).mean():.3f}")
    for q in (50, 90, 99, 99.9, 100):
        print(f"  n_contrib p{q}: {np.percentile(nc, q):.0f}")
    print(f"  total blend steps: {int(nc.sum())}")
    # alive(k): the march's walk length is n_contrib for terminated rays
    # (+ trailing walk for err/exit rays -- n_contrib underestimates those
    # slightly); alive(k) ~= #(nc >= k)
    ks = [0, 1, 2, 3, 4, 6, 8, 10, 12, 16, 20, 24, 32, 48, 64, 96, 128,
          192, 256, 384, 512]
    print("  k -> #rays with nc >= k:")
    for k in ks:
        print(f"    {k:4d}: {(nc >= k).sum():8d}")


if __name__ == "__main__":
    main()
