"""Fit a semi-transparent triangle soup to target images.

The canonical use case of the reference renderer: DMesh-style multi-view
optimization. Renders N views of a randomly-initialized soup, compares
against target images, and gradient-descends vertex positions, colors and
face opacities -- with the view batch sharded over every available device
and checkpoint/resume.

Run (CPU):
    JAX_PLATFORMS=cpu python examples/optimize_triangles.py
On this repo's axon environment, force CPU in-process (see tests/conftest.py)
or let it run on the TPU.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dmesh_renderer_tpu.models.dmesh import (
    TriScene, ViewBatch, init_train_state, make_train_step, render_views,
)
from dmesh_renderer_tpu.parallel.sharding import (
    make_view_mesh, shard_view_batch,
)
from dmesh_renderer_tpu.utils.checkpoint import (
    restore_checkpoint, save_checkpoint,
)


def look_at(eye):
    eye = np.asarray(eye, np.float64)
    f = -eye / np.linalg.norm(eye)
    s = np.cross(f, [0, 1, 0]); s /= np.linalg.norm(s)
    u = np.cross(s, f)
    m = np.eye(4); m[0, :3] = s; m[1, :3] = -u; m[2, :3] = f
    m[:3, 3] = -m[:3, :3] @ eye
    return m.astype(np.float32)


def main(steps=60, n_tris=48, n_views=None, H=48, W=48, out_dir="/tmp/dmrt_fit"):
    devices = jax.devices()
    n_views = n_views or max(2, min(8, len(devices)))
    mesh = make_view_mesh(min(n_views, len(devices)))
    print(f"devices: {len(devices)}, views: {n_views}")

    rng = np.random.RandomState(0)

    # --- target scene: a colored "flower" of triangles ---
    ang = np.linspace(0, 2 * np.pi, 9)[:-1]
    tgt_verts, tgt_faces, tgt_col = [], [], []
    for i, a in enumerate(ang):
        c = np.array([np.cos(a), np.sin(a), 0.0]) * 0.7
        tgt_verts += [c + [0, 0, 0.1 * i - 0.4], c + [0.5, 0, 0.1 * i - 0.4],
                      c + [0, 0.5, 0.1 * i - 0.4]]
        tgt_faces.append([3 * i, 3 * i + 1, 3 * i + 2])
        col = np.zeros(3); col[i % 3] = 1.0
        tgt_col += [col] * 3
    tgt = dict(
        verts=np.asarray(tgt_verts, np.float32),
        faces=np.asarray(tgt_faces, np.int32),
        colors=np.asarray(tgt_col, np.float32),
        opacity=np.full(len(tgt_faces), 0.9, np.float32),
    )

    fl = 1.0 / np.tan(np.deg2rad(25.0))
    proj = np.zeros((4, 4), np.float32)
    proj[0, 0] = fl; proj[1, 1] = fl
    proj[2, 2] = (10 + 0.1) / (10 - 0.1); proj[2, 3] = -2 * 10 * 0.1 / (10 - 0.1)
    proj[3, 2] = 1.0
    mvs = np.stack([
        look_at([3 * np.cos(t), 0.6, 3 * np.sin(t)])
        for t in np.linspace(0, 2 * np.pi, n_views, endpoint=False)
    ])
    mv_t = np.swapaxes(mvs, 1, 2).copy()
    proj_t = np.broadcast_to(proj.T, (n_views, 4, 4)).copy()
    inv_mv_t = np.linalg.inv(mv_t)
    inv_proj_t = np.linalg.inv(proj_t)

    bg = jnp.zeros(3, jnp.float32)
    P_t = tgt["verts"].shape[0]
    F_t = tgt["faces"].shape[0]
    target_scene = TriScene(jnp.asarray(tgt["verts"]),
                            jnp.asarray(tgt["colors"]),
                            jnp.asarray(tgt["opacity"]))
    tgt_batch = ViewBatch(
        jnp.asarray(mv_t), jnp.asarray(proj_t), jnp.asarray(inv_mv_t),
        jnp.asarray(inv_proj_t), jnp.zeros((n_views, P_t)),
        jnp.ones((n_views, F_t)), jnp.zeros((n_views, 3, H, W)),
    )
    target_imgs, _ = render_views(target_scene, jnp.asarray(tgt["faces"]),
                                  tgt_batch, bg, H, W)

    # --- learnable soup ---
    P = 3 * n_tris
    scene = TriScene(
        jnp.asarray((rng.rand(P, 3).astype(np.float32) - 0.5) * 2.0),
        jnp.asarray(rng.rand(P, 3).astype(np.float32)),
        jnp.full((n_tris,), 0.5, jnp.float32),
    )
    faces = jnp.asarray(np.arange(P, dtype=np.int32).reshape(n_tris, 3))
    batch = ViewBatch(
        jnp.asarray(mv_t), jnp.asarray(proj_t), jnp.asarray(inv_mv_t),
        jnp.asarray(inv_proj_t), jnp.zeros((n_views, P)),
        jnp.ones((n_views, n_tris)), target_imgs,
    )
    batch = shard_view_batch(mesh, batch)

    optimizer = optax.adam(2e-2)
    state = init_train_state(scene, optimizer)
    step = make_train_step(optimizer, faces, bg, H, W, mesh=mesh)

    ckpt = os.path.join(out_dir, "ckpt")
    for i in range(steps):
        state, loss = step(state, batch)
        if i % 10 == 0 or i == steps - 1:
            print(f"step {i:4d}  loss {float(loss):.6f}")
        if i == steps // 2:
            save_checkpoint(ckpt, state)
            print(f"checkpointed at step {i} -> {ckpt}")

    # resume demo: restore the midpoint checkpoint and take one step
    restored = restore_checkpoint(ckpt, state)
    _, loss_r = step(restored, batch)
    print(f"resumed-from-checkpoint loss: {float(loss_r):.6f}")
    return float(loss)


if __name__ == "__main__":
    main()
