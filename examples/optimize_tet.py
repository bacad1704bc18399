"""Fit tet-face colors and opacities to target images (DMesh phase 2).

The tet renderer gives exact depth ordering through a tetrahedral
tessellation; DMesh optimizes per-face opacities (which faces exist) and
vertex colors against multi-view targets, using the active mask to exclude
pixels whose ray walk left the tessellation or broke an invariant.

Run (CPU):
    JAX_PLATFORMS=cpu python examples/optimize_tet.py
On the axon environment, force CPU in-process (see tests/conftest.py) or
let it run on the TPU.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dmesh_renderer_tpu.models.dmesh import (
    TetGeometry, TetScene, TetViewBatch, init_tet_train_state,
    make_tet_train_step,
)
from dmesh_renderer_tpu.parallel.sharding import (
    make_view_mesh, shard_view_batch,
)
from dmesh_renderer_tpu.runtime.native import build_tet_connectivity
from dmesh_renderer_tpu.utils.connectivity import freudenthal_grid


def look_cameras(n, radius=3.0):
    mvs = []
    fl = 1.0 / np.tan(np.deg2rad(45.0) / 2)
    proj = np.zeros((4, 4), np.float32)
    proj[0, 0] = fl
    proj[1, 1] = fl
    proj[2, 2] = (10.0 + 0.1) / (10.0 - 0.1)
    proj[2, 3] = -2 * 10.0 * 0.1 / (10.0 - 0.1)
    proj[3, 2] = 1.0
    for i in range(n):
        ang = 2 * np.pi * i / n + 0.35
        eye = np.array([radius * np.cos(ang), 0.7, radius * np.sin(ang)])
        f = -eye / np.linalg.norm(eye)
        s = np.cross(f, [0, 1, 0]); s /= np.linalg.norm(s)
        u = np.cross(s, f)
        m = np.eye(4, dtype=np.float32)
        m[0, :3], m[1, :3], m[2, :3] = s, -u, f
        m[:3, 3] = -m[:3, :3] @ eye
        mvs.append(m)
    return np.stack(mvs), np.stack([proj] * n)


def main():
    H = W = 64
    B = max(1, min(4, len(jax.devices())))

    verts, tets = freudenthal_grid(3, jitter=0.1, seed=0)
    faces, face_tets, tet_faces = build_tet_connectivity(tets)
    print(f"tessellation: {tets.shape[0]} tets, {faces.shape[0]} faces")

    rng = np.random.RandomState(0)
    geom = TetGeometry(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(tets),
        jnp.asarray(face_tets), jnp.asarray(tet_faces),
    )
    # ground-truth scene to recover
    gt = TetScene(
        jnp.asarray(rng.rand(verts.shape[0], 3).astype(np.float32)),
        jnp.asarray(rng.uniform(0.5, 0.95,
                                faces.shape[0]).astype(np.float32)),
    )
    mv, proj = look_cameras(B)
    mv_t = np.swapaxes(mv, 1, 2).copy()
    proj_t = np.swapaxes(proj, 1, 2).copy()
    fintense = np.ones((B, faces.shape[0]), np.float32)
    bg = jnp.zeros(3, jnp.float32)

    # render the targets from the ground truth
    from dmesh_renderer_tpu.ops.tet import render_tet_core

    target, _, _ = render_tet_core(
        geom.verts, geom.faces, gt.verts_color, gt.faces_opacity,
        jnp.asarray(mv_t), jnp.asarray(proj_t),
        jnp.asarray(np.linalg.inv(mv_t)), jnp.asarray(np.linalg.inv(proj_t)),
        jnp.asarray(fintense), geom.tets, geom.face_tets, geom.tet_faces,
        bg, H, W, 0,
    )

    batch = TetViewBatch(
        jnp.asarray(mv_t), jnp.asarray(proj_t),
        jnp.asarray(np.linalg.inv(mv_t)), jnp.asarray(np.linalg.inv(proj_t)),
        jnp.asarray(fintense), target,
    )

    # random init, optimize
    scene = TetScene(
        jnp.full((verts.shape[0], 3), 0.5, jnp.float32),
        jnp.full((faces.shape[0],), 0.5, jnp.float32),
    )
    optimizer = optax.adam(2e-2)
    mesh = make_view_mesh(B) if len(jax.devices()) >= B > 1 else None
    step = make_tet_train_step(optimizer, geom, bg, H, W, mesh=mesh)
    state = init_tet_train_state(scene, optimizer)
    if mesh is not None:
        batch = shard_view_batch(mesh, batch)

    for i in range(60):
        state, loss = step(state, batch)
        if i % 10 == 0 or i == 59:
            print(f"step {i:4d}  masked-mse {float(loss):.6f}")

    err = float(jnp.mean(jnp.abs(state.scene.verts_color - gt.verts_color)))
    print(f"mean |vcolor - gt|: {err:.4f}")


if __name__ == "__main__":
    main()
