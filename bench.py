"""Benchmark harness. Prints ONE JSON line for the driver.

Headline metric (BASELINE.json): fwd+bwd ms/frame for the tri renderer.
Runs on whatever the default JAX backend is (the real TPU under the driver).

Configs map to BASELINE.md:
  1. tri fwd+bwd, ~1k tris @ 256x256  (always run; headline for now)
  2. tri at scale, 100k tris @ 800x800 (runs once the binned path lands)

No published reference numbers exist (BASELINE.md: "published": {}), so
vs_baseline reports our latest-vs-first-round tracking ratio placeholder 1.0
until a measured reference baseline is recorded.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _build(n_tris, n_views, height, width, seed=0):
    from __graft_entry__ import _scene

    verts, faces, vcolor, fopacity, mv, proj, vdepth, fintense = _scene(
        n_tris, n_views, height, width, seed
    )
    mv_t = np.swapaxes(mv, 1, 2).copy()
    proj_t = np.swapaxes(proj, 1, 2).copy()
    return (verts, faces, vcolor, fopacity, mv_t, proj_t,
            np.linalg.inv(mv_t), np.linalg.inv(proj_t), vdepth, fintense)


def bench_tri(n_tris=1000, height=256, width=256, n_views=1, iters=10):
    import jax
    import jax.numpy as jnp

    from dmesh_renderer_tpu.ops.tri import render_tri_auto

    (verts, faces, vcolor, fopacity, mv_t, proj_t, inv_mv_t, inv_proj_t,
     vdepth, fintense) = _build(n_tris, n_views, height, width)

    args = tuple(map(jnp.asarray, (
        verts, faces, vcolor, fopacity, mv_t, proj_t, inv_mv_t, inv_proj_t,
        vdepth, fintense,
    )))
    bg = jnp.asarray(np.array([0.1, 0.1, 0.1], np.float32))

    def loss(verts, vcolor, fopacity, vdepth, fintense):
        color, depth = render_tri_auto(
            verts, args[1], vcolor, fopacity, args[4], args[5], args[6],
            args[7], vdepth, fintense, bg, height, width,
        )
        return jnp.sum(color) + jnp.sum(depth)

    step = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))

    # Warmup / compile.
    g = step(args[0], args[2], args[3], args[8], args[9])
    jax.block_until_ready(g)

    t0 = time.perf_counter()
    for _ in range(iters):
        g = step(args[0], args[2], args[3], args[8], args[9])
    jax.block_until_ready(g)
    dt = (time.perf_counter() - t0) / iters
    return dt * 1000.0 / n_views  # ms per frame (per view)


def main():
    ms = bench_tri()
    print(json.dumps({
        "metric": "tri_fwd_bwd_ms_per_frame_1k_tris_256px",
        "value": round(ms, 3),
        "unit": "ms/frame",
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()
