"""Split the tri backward at B=2 vs B=4: Pallas kernel vs record reduce.

The B=4 per-view backward degrades 2.6x vs B=2 (tools/profile_tri_stages)
while the forward scales linearly; residual memory was ruled out
(exp_b4_attrs: RECOMPUTE_BWD_ATTRS changes nothing). This isolates which
backward piece is super-linear.

Run: python tools/exp_b4_split.py [views...]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 4


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from bench import _build
    from dmesh_renderer_tpu.ops import tri_binned as tb
    from dmesh_renderer_tpu.ops.binning import aligned_capacity

    views = [int(v) for v in sys.argv[1:]] or [2, 4]
    n_tris, size = 100_000, 800
    H = W = size

    for B in views:
        kcap = 983_040 * B
        (verts, faces, vcolor, fopacity, mv_t, proj_t, inv_mv_t,
         inv_proj_t, vdepth, fintense) = map(
            jnp.asarray, _build(n_tris, B, H, W))
        bg = jnp.asarray(np.array([0.1, 0.1, 0.1], np.float32))

        gx = (W + tb.TILE - 1) // tb.TILE
        gy = (H + tb.TILE - 1) // tb.TILE
        n_tiles = B * gx * gy
        cap = aligned_capacity(kcap, n_tiles, tb.SLAB)

        @jax.jit
        def prep(vc, fo):
            keys, attr_tab, rayd_t, pix_t, _meta = tb._binned_prepare(
                verts, faces, vc, fo, mv_t, proj_t, inv_mv_t,
                inv_proj_t, vdepth, fintense, H, W, kcap)
            out, _bits = tb._run_fwd_kernel(keys.starts, keys.ends, attr_tab,
                                     rayd_t, pix_t, n_tiles, H, W)
            return keys, attr_tab, rayd_t, pix_t, out

        keys, attr_tab, rayd_t, pix_t, out = prep(vcolor, fopacity)
        jax.block_until_ready(attr_tab)
        fwd_t = out[:, 4:7]
        gin_t = jnp.ones((n_tiles, 5, tb.PSUB, tb.PLANE), jnp.float32)

        def timeit(name, fn, *args):
            f = jax.jit(fn)
            o = f(*args)
            jax.block_until_ready(o)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                o = f(*args)
                float(jnp.sum(o if not isinstance(o, tuple) else o[0]))
                ts.append(time.perf_counter() - t0)
            ms = min(ts) * 1000 / REPS
            print(f"B={B} {name:>24}: {ms:8.2f} ms total "
                  f"({ms/B:6.2f} /view)", flush=True)

        def chain_kernel(gin_t, starts, ends, attr_tab, rayd_t, pix_t,
                         fwd_t):
            def it(g, _):
                rec4 = tb._run_bwd_kernel(
                    starts, ends, attr_tab, rayd_t, pix_t,
                    fwd_t, g, n_tiles, cap)
                # feed a scalar back so steps can't be elided
                g = g + rec4[0, 0] * 1e-30
                return g, 0.0
            g, _ = lax.scan(it, gin_t, None, length=REPS)
            return g

        timeit("bwd kernel", chain_kernel, gin_t, keys.starts, keys.ends,
               attr_tab, rayd_t, pix_t, fwd_t)

        rec4 = jax.jit(tb._run_bwd_kernel, static_argnums=(7, 8))(
            keys.starts, keys.ends, attr_tab, rayd_t, pix_t, fwd_t,
            gin_t, n_tiles, cap)
        jax.block_until_ready(rec4)
        F = n_tris

        def chain_reduce(rec4, flat, sigma):
            def it(r, _):
                rec = r.reshape(cap, tb.REC_COLS)
                face_g_sorted = (
                    jnp.zeros((B * F, tb.NG_USED), jnp.float32)
                    .at[flat].add(rec[:, :tb.NG_USED]))
                face_g = (
                    jnp.zeros((B * F, tb.NG_USED), jnp.float32)
                    .at[sigma].set(face_g_sorted,
                                   unique_indices=True))
                r = r + jnp.sum(face_g) * 1e-30
                return r, 0.0
            r, _ = lax.scan(it, rec4, None, length=REPS)
            return r

        timeit("record reduce", chain_reduce, rec4, keys.flat, keys.sigma)


if __name__ == "__main__":
    main()
