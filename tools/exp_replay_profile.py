"""Isolate the cost of the tet replay backward's pieces on the real scene.

Times: forward (for reference), full replay bwd, replay with the
sort-reduce replaced by a plain sum (isolates the scan/log-read), and the
sort-reduce alone on captured recs.

Run: python tools/exp_replay_profile.py
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
    from jax import lax

    from dmesh_renderer_tpu.ops import tet as tet_mod
    from dmesh_renderer_tpu.runtime.native import build_tet_connectivity
    from dmesh_renderer_tpu.utils.connectivity import freudenthal_grid
    from bench import _build

    H = W = 800
    verts, tets = freudenthal_grid(20, jitter=0.15, seed=2)
    faces, face_tets, tet_faces = build_tet_connectivity(tets)
    rng = np.random.RandomState(0)
    vcolor = rng.rand(verts.shape[0], 3).astype(np.float32)
    fop = rng.uniform(0.3, 0.9, faces.shape[0]).astype(np.float32)
    fint = rng.uniform(0.5, 1.0, (1, faces.shape[0])).astype(np.float32)
    mv, proj = _build(1, 1, H, W)[4:6]

    args = tuple(map(jnp.asarray, (
        verts, faces, vcolor, fop, mv, proj,
        np.linalg.inv(mv), np.linalg.inv(proj), fint,
        tets, face_tets, tet_faces,
    )))
    bg = jnp.asarray(np.array([0.1, 0.1, 0.1], np.float32))
    B = 1
    print(f"scene: {faces.shape[0]} faces, {tets.shape[0]} tets")

    @jax.jit
    def fwd(fo):
        c, d, a, saved = tet_mod._render_tet_forward(
            args[0], args[1], args[2], fo, args[4], args[5], args[6],
            args[7], args[8], args[9], args[10], args[11], bg, H, W, 0,
            512)
        return c, d, saved

    c, d, saved = fwd(args[3])
    jax.block_until_ready(c)
    saved = jax.tree.map(jnp.asarray, saved)
    gcol = jnp.ones_like(c)
    gdep = jnp.ones_like(d)

    def timed(name, fn, *xs, reps=4, iters=3):
        # saved rides as a jit ARGUMENT (closing over the ~120 MB march
        # log embeds it as an HLO constant and the axon remote-compile
        # request blows its size limit: HTTP 413)
        @jax.jit
        def chained(fo, saved, *xs):
            def body(salt, _):
                out = fn(fo + salt * 1e-12, saved, *xs)
                s = sum(jnp.sum(o) for o in out)
                return salt + s * 1e-20, None
            salt, _ = lax.scan(body, jnp.float32(0), None, length=reps)
            return salt

        float(chained(args[3], saved, *xs))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(chained(args[3], saved, *xs))
            ts.append(time.perf_counter() - t0)
        print(f"{name:>40}: {min(ts)*1000/reps:8.2f} ms", flush=True)

    # full replay
    def replay(fo, saved):
        return tet_mod._render_tet_backward_replay(
            args[0], args[1], bg, saved, gcol * (1 + fo[0] * 0), gdep,
            B, H, W)

    timed("full replay bwd", replay)

    # scan-only: monkeypatch the reduce away by calling with a huge
    # REPLAY_REDUCE_BATCH? Instead: copy of the replay with sum-reduce.
    orig = tet_mod.REPLAY_REDUCE_BATCH

    # sum-reduce variant: set batch so large that one cond covers all, and
    # replace sort by nothing -- emulate by timing the scan part manually
    F = faces.shape[0]
    log = saved["march_segs"][0]["log"]
    D, G = log.shape[0], log.shape[1]

    def scan_only(fo, saved):
        # replicate the replay scan, then just sum the recs (no sort)
        return _replay_scan_sum(tet_mod, args[0], args[1], bg, saved,
                                gcol * (1 + fo[0] * 0), gdep, B, H, W)

    timed("replay scan only (sum-reduce)", scan_only)

    # marching backward for comparison
    def marching(fo, saved):
        return tet_mod._render_tet_backward(
            args[0], args[1], args[2], fo, args[4], args[5], args[6],
            args[7], args[8], args[9], args[10], args[11], bg, H, W, 0,
            512, saved, gcol, gdep)

    timed("marching bwd (old path)", marching)


def _replay_scan_sum(tet_mod, verts, faces, bg, saved, dL_dcolor, dL_ddepth,
                     B, height, width):
    import jax.numpy as jnp
    from jax import lax

    P = verts.shape[0]
    F = faces.shape[0]
    N = height * width
    M0 = B * N
    log = saved["march_segs"][0]["log"]
    D, G = log.shape[0], log.shape[1]
    M = G * 128

    def flat(x, fill=0):
        x = x.reshape(M0)
        if M > M0:
            x = jnp.concatenate([x, jnp.full((M - M0,), fill, x.dtype)])
        return x.reshape(G, 128)

    gc = [flat(dL_dcolor[:, ch].reshape(B, N)) for ch in range(3)]
    gdep = flat(dL_ddepth.reshape(B, N))
    bg_dot = bg[0] * gc[0] + bg[1] * gc[1] + bg[2] * gc[2] + gdep
    fT = jnp.exp(flat(saved["final_log_T"]))
    fpT = jnp.exp(flat(saved["final_prev_log_T"]))
    nc = flat(saved["n_contrib"]).astype(jnp.float32)
    valid_ray = flat(saved["is_active"].astype(jnp.float32)) != 0.0

    L_CF, L_ALPHA, L_TBEF, L_U, L_V, L_CR, L_CG, L_CB, L_DEP, L_INTEN = \
        range(10)

    def step(carry, s):
        la, lcr, lcg, lcb, ld, ar, ag, ab, ad = carry
        slab = log[s]
        L = lambda r: slab[:, r, :]
        cf = L(L_CF); alpha = L(L_ALPHA); prev_T = L(L_TBEF)
        u, v = L(L_U), L(L_V)
        cr, cg_, cb = L(L_CR), L(L_CG), L(L_CB)
        dep = L(L_DEP); inten = L(L_INTEN)
        m = valid_ray & (s.astype(jnp.float32) < nc) & (cf >= 0.0)
        mf = m.astype(jnp.float32)
        ar_n = la * lcr + (1.0 - la) * ar
        ag_n = la * lcg + (1.0 - la) * ag
        ab_n = la * lcb + (1.0 - la) * ab
        ad_n = la * ld + (1.0 - la) * ad
        dL_dop = ((cr - ar_n) * gc[0] + (cg_ - ag_n) * gc[1]
                  + (cb - ab_n) * gc[2] + (dep - ad_n) * gdep) * prev_T
        bg_coef = jnp.where(alpha == 1.0, -fpT,
                            -fT / jnp.maximum(1.0 - alpha, 1e-37))
        dL_dop = (dL_dop + bg_coef * bg_dot) * mf
        wm = inten * prev_T * alpha * mf
        i1, i2 = u, v
        i0 = 1.0 - u - v
        recs = (wm * i0 * gc[0], wm * i0 * gc[1], wm * i0 * gc[2],
                wm * i1 * gc[0], wm * i1 * gc[1], wm * i1 * gc[2],
                wm * i2 * gc[0], wm * i2 * gc[1], wm * i2 * gc[2],
                dL_dop)
        la = jnp.where(m, alpha, la)
        lcr = jnp.where(m, cr, lcr)
        lcg = jnp.where(m, cg_, lcg)
        lcb = jnp.where(m, cb, lcb)
        ld = jnp.where(m, dep, ld)
        ar = jnp.where(m, ar_n, ar)
        ag = jnp.where(m, ag_n, ag)
        ab = jnp.where(m, ab_n, ab)
        ad = jnp.where(m, ad_n, ad)
        # sum-reduce instead of keyed reduce (isolates scan cost)
        out = sum(jnp.sum(r) for r in recs) + jnp.sum(cf)
        return (la, lcr, lcg, lcb, ld, ar, ag, ab, ad), out

    zero = jnp.zeros((G, 128), jnp.float32)
    ss = jnp.arange(D - 1, -1, -1, dtype=jnp.int32)
    _, outs = lax.scan(step, (zero,) * 9, ss)
    return (jnp.sum(outs).reshape(1),)


if __name__ == "__main__":
    main()
