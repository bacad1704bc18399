"""Split (a) the forward's untile/finalize cost vs the raw kernel, and
(b) the backward into kernel / record-reduce / final-scatter pieces.

The round-3 stage profile shows "full fwd (api)" costing ~16 ms more than
the stage-composed forward whose scalar consumes the raw kernel output;
this isolates where that goes. Run on TPU:

    python tools/exp_finalize_split.py
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

    n_tris, size, n_views = 100_000, 800, 1
    kcap = 983_040
    H = W = size
    args = tuple(map(jnp.asarray, _build(n_tris, n_views, H, W)))
    (verts, faces, vcolor, fopacity, mv_t, proj_t, inv_mv_t, inv_proj_t,
     vdepth, fintense) = args
    bg = jnp.asarray(np.array([0.1, 0.1, 0.1], np.float32))
    B = n_views
    gx = (W + tb.TILE - 1) // tb.TILE
    gy = (H + tb.TILE - 1) // tb.TILE
    n_tiles = B * gx * gy

    def csum(t):
        return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(t))

    def timed(fn, tag, iters=5):
        f = jax.jit(lambda a: csum(fn(a)))
        float(f(args))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(f(args))
            ts.append(time.perf_counter() - t0)
        print(f"{tag:>32}: {min(ts)*1000:8.2f} ms", flush=True)
        return min(ts) * 1000

    def prep(a):
        return tb._binned_prepare(a[0], a[1], a[2], a[3], a[4], a[5], a[6],
                                  a[7], a[8], a[9], H, W, kcap)

    def s_kernel(a):
        keys, attr_tab, rayd_t, pix_t, _ = prep(a)
        return tb._run_fwd_kernel(keys.starts, keys.ends, attr_tab, rayd_t,
                                  pix_t, n_tiles, H, W)

    def s_untile(a):
        out = s_kernel(a)
        img = tb._untile(out[:, 0:4], B, H, W, gx, gy)
        state = tb._untile(out[:, 4:7], B, H, W, gx, gy)
        return img, state

    def s_final_nhwc(a):
        out = s_kernel(a)
        img = tb._untile(out[:, 0:4], B, H, W, gx, gy)
        state = tb._untile(out[:, 4:7], B, H, W, gx, gy)
        T = state[..., 0]
        color = img[..., 0:3] + T[..., None] * bg[None, None, None, :]
        depth = img[..., 3] + T * 1.0
        return color, depth, out[:, 4:7]

    def s_api(a):
        c, d = tb.render_tri_binned(
            a[0], a[1], a[2], a[3], a[4], a[5], a[6], a[7], a[8], a[9],
            bg, H, W, kcap)
        return c, d

    timed(s_kernel, "fwd kernel out")
    timed(s_untile, "+ untile")
    timed(s_final_nhwc, "+ finalize (NHWC, no transpose)")
    timed(s_api, "full api (NCHW out)")

    # ---- backward split ----
    def loss(vertsx, vc, fo, vd, fi):
        c, d = tb.render_tri_binned(
            vertsx, faces, vc, fo, mv_t, proj_t, inv_mv_t, inv_proj_t,
            vd, fi, bg, H, W, kcap)
        return jnp.sum(c) + jnp.sum(d)

    grad_fn = jax.grad(loss, argnums=(0, 1, 2, 3, 4))

    def s_fwd_bwd(a):
        return csum(grad_fn(a[0], a[2], a[3], a[8], a[9]))

    # kernel-only backward: run fwd impl, then the bwd kernel, consume rec4
    def bwd_pieces(a, upto):
        color, depth, fwd_state_t, keys, saved = tb._render_binned_impl(
            a[0], a[1], a[2], a[3], a[4], a[5], a[6], a[7], a[8], a[9],
            bg, H, W, kcap)
        attr_tab, rayd_t, pix_t, _bits = saved
        cap = fwd_state_t.shape[0] * 0 + tb.aligned_capacity(
            kcap, n_tiles, tb.SLAB) if False else None
        from dmesh_renderer_tpu.ops.binning import aligned_capacity
        cap = aligned_capacity(kcap, n_tiles, tb.SLAB)
        gcol = jnp.ones((B, H, W, 3), jnp.float32)
        gdep = jnp.ones((B, H, W), jnp.float32)
        bg_dot = jnp.einsum("c,bhwc->bhw", bg, gcol) + gdep
        gin = jnp.concatenate(
            [gcol, gdep[..., None], bg_dot[..., None]], axis=-1)
        gin_t = tb._tileify(gin, B, H, W, gx, gy)
        rec4 = tb._run_bwd_kernel(keys.starts, keys.ends, attr_tab, rayd_t,
                                  pix_t, fwd_state_t, gin_t, n_tiles, cap)
        if upto == "kernel":
            return color, depth, rec4
        rec = rec4.reshape(cap, tb.REC_COLS)
        F = faces.shape[0]
        face_g_sorted = (
            jnp.zeros((B * F, tb.NG_USED), jnp.float32)
            .at[keys.flat].add(rec[:, :tb.NG_USED]))
        if upto == "scatter":
            return color, depth, face_g_sorted
        face_g = (
            jnp.zeros((B * F, tb.NG_USED), jnp.float32)
            .at[keys.sigma].set(face_g_sorted, unique_indices=True)
            .reshape(B, F, tb.NG_USED))
        return color, depth, face_g

    timed(lambda a: bwd_pieces(a, "kernel"), "fwd impl + bwd kernel")
    timed(lambda a: bwd_pieces(a, "scatter"), "+ record scatter")
    timed(lambda a: bwd_pieces(a, "unperm"), "+ un-permute")
    timed(s_fwd_bwd, "full fwd+bwd (api grads)")


if __name__ == "__main__":
    main()
