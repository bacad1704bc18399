"""Split the tri backward's cost OUTSIDE the kernel: fwd / +bwd-kernel /
+record-reduce / full fwd+bwd, timed as incremental jits on the live
backend (deltas isolate each stage; each measurement carries the same
fixed dispatch cost).

Run on TPU: python tools/profile_bwd_split.py
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
    from dmesh_renderer_tpu.ops.binning import (
        recommended_key_capacity, recommended_run_capacity,
    )

    n_tris, size, n_views = 100_000, 800, 1
    H = W = size
    (verts, faces, vcolor, fopacity, mv_t, proj_t, inv_mv_t, inv_proj_t,
     vdepth, fintense) = _build(n_tris, n_views, H, W)
    kcap = recommended_key_capacity(verts, faces, mv_t, proj_t, H, W,
                                    margin=1.03125, bucket=8192)
    rcap = recommended_run_capacity(verts, faces, mv_t, proj_t, H, W,
                                    margin=1.03125, bucket=8192)
    (verts, faces, vcolor, fopacity, mv_t, proj_t, inv_mv_t, inv_proj_t,
     vdepth, fintense) = map(jnp.asarray, (
         verts, faces, vcolor, fopacity, mv_t, proj_t, inv_mv_t,
         inv_proj_t, vdepth, fintense))
    bg = jnp.asarray(np.array([0.1, 0.1, 0.1], np.float32))

    B = n_views
    gx = gy = (W + tb.TILE - 1) // tb.TILE
    n_tiles = B * gx * gy
    from dmesh_renderer_tpu.ops.binning import aligned_capacity
    cap = aligned_capacity(kcap, n_tiles, tb.SLAB)

    def fwd_all(fo):
        color, depth, fwd_state_t, keys, saved = tb._render_binned_impl(
            verts, faces, vcolor, fo, mv_t, proj_t, inv_mv_t,
            inv_proj_t, vdepth, fintense, bg, H, W, kcap, rcap)
        return color, depth, fwd_state_t, keys, saved

    def fwd_product(fo):
        # sum only product-consumed outputs: keys.face/keys.batch are
        # diagnostic cap-scale gathers, DCE'd in the real pipeline
        color, depth, fwd_state_t, keys, saved = fwd_all(fo)
        return (color, depth, fwd_state_t, keys.flat, keys.sigma,
                keys.starts, keys.ends, saved)

    rng = np.random.RandomState(3)
    gcol = jnp.asarray(rng.randn(B, 3, H, W).astype(np.float32))
    gdep = jnp.asarray(rng.randn(B, 1, H, W).astype(np.float32))

    def bwd_kernel_only(fo):
        color, depth, fwd_state_t, keys, saved = fwd_all(fo)
        del depth
        attr_tab, rayd_t, pix_t, _bits = saved
        gc = gcol.transpose(0, 2, 3, 1)
        gd = gdep[:, 0]
        bg_dot = jnp.einsum("c,bhwc->bhw", bg, gc) + gd
        gin = jnp.concatenate([gc, gd[..., None], bg_dot[..., None]], axis=-1)
        gin_t = tb._tileify(gin, B, H, W, gx, gy)
        rec4 = tb._run_bwd_kernel(keys.starts, keys.ends, attr_tab, rayd_t,
                                  pix_t, fwd_state_t, gin_t, n_tiles, cap)
        return jnp.sum(rec4), color

    def reduce_too(fo):
        color, depth, fwd_state_t, keys, saved = fwd_all(fo)
        attr_tab, rayd_t, pix_t, _bits = saved
        gc = gcol.transpose(0, 2, 3, 1)
        gd = gdep[:, 0]
        bg_dot = jnp.einsum("c,bhwc->bhw", bg, gc) + gd
        gin = jnp.concatenate([gc, gd[..., None], bg_dot[..., None]], axis=-1)
        gin_t = tb._tileify(gin, B, H, W, gx, gy)
        rec4 = tb._run_bwd_kernel(keys.starts, keys.ends, attr_tab, rayd_t,
                                  pix_t, fwd_state_t, gin_t, n_tiles, cap)

        def mk_small(r, take):
            gin_ = jnp.einsum("cj,cj->c", take(attr_tab)[:, tb._C0:tb._C0 + 9],
                              r[:, tb._G_VC:tb._G_VC + 9])
            upd = jnp.concatenate([r[:, :tb.NG_USED], gin_[:, None]], axis=1)
            return upd, take(keys.flat)

        face_g_sorted = tb._reduce_records(
            rec4, keys, fwd_state_t, cap, n_tiles,
            B * faces.shape[0], mk_small)
        return face_g_sorted, keys.sigma, color

    def finalize_manual(fo, upto="all"):
        face_g_sorted, sigma, color = reduce_too(fo)
        F = faces.shape[0]
        P = verts.shape[0]
        face_g = (
            jnp.zeros((B * F, tb.NG_USED + 1), jnp.float32)
            .at[sigma].set(face_g_sorted, unique_indices=True)
            .reshape(B, F, tb.NG_USED + 1))
        if upto == "unperm":
            return (face_g, color)
        g_fopacity = jnp.sum(face_g[..., tb._G_ALPHA], axis=0)
        g_fintense = face_g[..., tb.NG_USED]
        gp = jnp.sum(face_g[..., tb._G_P:tb._G_P + 9], axis=0).reshape(F, 3, 3)
        gvc = jnp.sum(
            face_g[..., tb._G_VC:tb._G_VC + 9] * fintense[..., None], axis=0
        ).reshape(F, 3, 3)
        gvd = face_g[..., tb._G_VD:tb._G_VD + 3]
        nw = max(17, 6 + B)  # scatter width cliff: tools/exp_scatter_width.py
        upd = jnp.concatenate([gp, gvc, gvd.transpose(1, 2, 0)], axis=-1)
        if upto == "viewsums":
            return (upd, g_fopacity, g_fintense, color)
        upd = jnp.pad(upd, ((0, 0), (0, 0), (0, nw - (6 + B))))
        acc = jnp.zeros((P, nw), jnp.float32).at[faces].add(upd)
        return (acc, g_fopacity, g_fintense, color)

    def full_bwd(fo):
        def loss(verts_, vc_, fo_, vd_, fi_):
            c, d = tb.render_tri_binned(
                verts_, faces, vc_, fo_, mv_t, proj_t, inv_mv_t,
                inv_proj_t, vd_, fi_, bg, H, W, kcap, False, rcap)
            return jnp.sum(c * gcol) + jnp.sum(d * gdep)
        gs = jax.grad(loss, (0, 1, 2, 3, 4))(
            verts, vcolor, fo, vdepth, fintense)
        return sum(jnp.sum(g) for g in gs)

    def timed(name, fn, iters=4):
        f = jax.jit(lambda fo: jnp.sum(
            sum(jnp.sum(x) for x in jax.tree.leaves(fn(fo)))))
        float(f(fopacity))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(f(fopacity))
            ts.append(time.perf_counter() - t0)
        ms = min(ts) * 1000
        print(f"{name:>22}: {ms:8.2f} ms", flush=True)
        return ms

    t0 = timed("fwd (product)", fwd_product)
    t1 = timed("+ bwd kernel", bwd_kernel_only)
    t2 = timed("+ record reduce", reduce_too)
    t2u = timed("+ unperm", lambda fo: finalize_manual(fo, "unperm"))
    t2v = timed("+ view sums", lambda fo: finalize_manual(fo, "viewsums"))
    t2b = timed("+ finalize (manual)", finalize_manual)
    t3 = timed("full fwd+bwd", full_bwd)
    print(f"\nbwd kernel: {t1-t0:6.2f}  reduce: {t2-t1:6.2f}  "
          f"unperm: {t2u-t2:6.2f}  viewsums: {t2v-t2u:6.2f}  "
          f"vscatter: {t2b-t2v:6.2f}  vjp glue: {t3-t2b:6.2f}")


if __name__ == "__main__":
    main()
