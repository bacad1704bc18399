"""Fit a triangle soup from a PLAIN PYTORCH training loop.

This is the exact shape of the reference's intended usage
(/root/reference/dmesh_renderer/__init__.py: torch autograd Functions
driven by DMesh's torch optimizer): build `TriRenderer`, call it with torch
tensors, `loss.backward()`, `optimizer.step()`. The renderers detect torch
inputs and route through the torch_interop autograd bridge -- the forward
runs the jitted JAX pipeline, the backward replays the stored JAX VJP, and
gradients land in the torch tensors' `.grad`.

Run (CPU):
    PYTHONPATH= JAX_PLATFORMS=cpu python examples/optimize_triangles_torch.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def look_at(eye):
    eye = np.asarray(eye, np.float64)
    f = -eye / np.linalg.norm(eye)
    s = np.cross(f, [0, 1, 0]); s /= np.linalg.norm(s)
    u = np.cross(s, f)
    m = np.eye(4); m[0, :3] = s; m[1, :3] = -u; m[2, :3] = f
    m[:3, 3] = -m[:3, :3] @ eye
    return m.astype(np.float32)


def perspective(fov_deg=60.0, near=0.1, far=10.0):
    fl = 1.0 / np.tan(np.deg2rad(fov_deg) / 2)
    p = np.zeros((4, 4), np.float32)
    p[0, 0] = fl; p[1, 1] = fl
    p[2, 2] = (far + near) / (far - near)
    p[2, 3] = -2 * far * near / (far - near)
    p[3, 2] = 1.0
    return p


def main(steps=40, n_tris=32, n_views=2, H=48, W=48):
    import torch as th

    from dmesh_renderer_tpu import TriRenderSettings, TriRenderer

    rng = np.random.RandomState(0)
    centers = rng.uniform(-0.8, 0.8, size=(n_tris, 1, 3))
    offsets = rng.uniform(-0.3, 0.3, size=(n_tris, 3, 3))
    verts0 = (centers + offsets).reshape(-1, 3).astype(np.float32)
    faces = th.tensor(
        np.arange(3 * n_tris, dtype=np.int64).reshape(n_tris, 3))

    mv = np.stack([look_at([2.5 * np.cos(a), 0.7, 2.5 * np.sin(a)])
                   for a in np.linspace(0.3, 2 * np.pi + 0.3, n_views,
                                        endpoint=False)])
    proj = np.stack([perspective()] * n_views)
    vdepth = th.zeros(n_views, verts0.shape[0])
    fintense = th.ones(n_views, n_tris)

    renderer = TriRenderer(TriRenderSettings(H, W, th.zeros(3)))

    # learnable torch parameters, exactly like DMesh's optimizer state
    verts = th.tensor(verts0, requires_grad=True)
    vcolor = th.tensor(rng.rand(verts0.shape[0], 3).astype(np.float32),
                       requires_grad=True)
    fopacity = th.tensor(rng.uniform(0.3, 0.8, n_tris).astype(np.float32),
                         requires_grad=True)
    opt = th.optim.Adam([verts, vcolor, fopacity], lr=8e-3)

    # target: a blue-ish disk on black
    yy, xx = np.mgrid[0:H, 0:W]
    disk = (((yy - H / 2) ** 2 + (xx - W / 2) ** 2) < (H / 3) ** 2)
    target = th.zeros(n_views, 3, H, W)
    target[:, 2] = th.tensor(disk.astype(np.float32))

    loss0 = None
    for it in range(steps):
        opt.zero_grad()
        color, _depth = renderer(
            verts, faces, vcolor.clamp(0, 1), fopacity.clamp(0.02, 1),
            th.tensor(mv), th.tensor(proj), vdepth, fintense)
        loss = (color - target).square().mean()
        loss.backward()
        opt.step()
        if loss0 is None:
            loss0 = float(loss)
        if it % 10 == 0 or it == steps - 1:
            print(f"step {it:3d}: loss {float(loss):.5f}")

    assert float(loss) < 0.92 * loss0, "expected the fit to make progress"
    print("done -- torch loop trained through the JAX renderer.")


if __name__ == "__main__":
    os.environ.setdefault("DMRT_CHUNK", "8")
    main()
