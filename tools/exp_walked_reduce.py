"""A/B the walked-prefix record-reduce compaction on the live backend.

Times the full fwd+bwd (all five gradients) at the bench scene with
tri_binned._walked_cap forced to cap (plain full-capacity scatter, the
pre-compaction behavior) vs the shipped default (walked compaction).
The delta attributes the record-reduce stage win directly.

Run on TPU: python tools/exp_walked_reduce.py [n_tris] [size] [views]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from bench import _build
    from dmesh_renderer_tpu.ops import tri_binned as tb
    from dmesh_renderer_tpu.ops.binning import recommended_key_capacity

    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    n_views = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    H = W = size
    (verts, faces, vcolor, fopacity, mv_t, proj_t, inv_mv_t, inv_proj_t,
     vdepth, fintense) = _build(n_tris, n_views, H, W)
    kcap = recommended_key_capacity(verts, faces, mv_t, proj_t, H, W,
                                    margin=1.03125, bucket=8192)
    args = tuple(map(jnp.asarray, (
        verts, faces, vcolor, fopacity, mv_t, proj_t, inv_mv_t, inv_proj_t,
        vdepth, fintense)))
    bg = jnp.asarray(np.array([0.1, 0.1, 0.1], np.float32))

    def loss(vc, fo):
        c, d = tb.render_tri_binned(
            args[0], args[1], vc, fo, args[4], args[5], args[6], args[7],
            args[8], args[9], bg, H, W, kcap)
        return jnp.sum(c) + jnp.sum(d)

    grad_fn = jax.grad(loss, argnums=(0, 1))

    def timed(tag):
        f = jax.jit(lambda vc, fo: sum(jnp.sum(g) for g in grad_fn(vc, fo)))
        float(f(args[2], args[3]))
        ts = []
        for i in range(5):
            fo = args[3] * (1.0 - 1e-3 * (i + 1))
            t0 = time.perf_counter()
            float(f(args[2], fo))
            ts.append(time.perf_counter() - t0)
        ms = min(ts) * 1000
        print(f"{tag:>24}: {ms:8.2f} ms fwd+bwd", flush=True)
        return ms

    orig = tb._walked_cap
    try:
        tb._walked_cap = lambda cap, n_tiles: cap  # plain scatter
        plain = timed("plain (cap scatter)")
        tb._walked_cap = orig
        comp = timed("walked compaction")
    finally:
        tb._walked_cap = orig
    print(f"delta: {plain - comp:+.2f} ms")


if __name__ == "__main__":
    main()
