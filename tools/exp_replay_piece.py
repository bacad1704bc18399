"""Time ONE piece of the tet replay backward per invocation (keeps each
process under the compile-time budget).

Usage: python tools/exp_replay_piece.py {replay|scan|sortred|marching|fwdres}
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pieces = sys.argv[1:]

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
    F = faces.shape[0]

    @jax.jit
    def fwd(fo):
        c, d, a, saved = tet_mod._render_tet_forward(
            args[0], args[1], args[2], fo, args[4], args[5], args[6],
            args[7], args[8], args[9], args[10], args[11], bg, H, W, 0,
            512)
        return c, d, saved

    t0 = time.time()
    c, d, saved = fwd(args[3])
    jax.block_until_ready(c)
    print(f"fwd built in {time.time()-t0:.0f}s", flush=True)
    saved = jax.tree.map(jnp.asarray, saved)
    gcol = jnp.ones_like(c)
    gdep = jnp.ones_like(d)
    log = saved["march_segs"][0]["log"]
    D, G = log.shape[0], log.shape[1]

    def timed(name, fn, reps=4, iters=3):
        @jax.jit
        def chained(fo):
            def body(salt, _):
                out = fn(fo + salt * 1e-12)
                s = sum(jnp.sum(o) for o in out)
                return salt + s * 1e-20, None
            salt, _ = lax.scan(body, jnp.float32(0), None, length=reps)
            return salt

        t0 = time.time()
        float(chained(args[3]))
        print(f"  (compile {time.time()-t0:.0f}s)", flush=True)
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(chained(args[3]))
            ts.append(time.perf_counter() - t0)
        print(f"{name:>40}: {min(ts)*1000/reps:8.2f} ms", flush=True)

    for which in pieces:
        run_piece(which, timed, tet_mod, args, bg, saved, gcol, gdep, B, H, W, F, G)


def run_piece(which, timed, tet_mod, args, bg, saved, gcol, gdep, B, H, W, F, G):
    import numpy as np
    import jax.numpy as jnp
    from jax import lax
    if which == "replay":
        def replay(fo):
            return tet_mod._render_tet_backward_replay(
                args[0], args[1], bg, saved, gcol * (1 + fo[0] * 0), gdep,
                B, H, W)
        timed("full replay bwd", replay)

    elif which == "scan":
        from exp_replay_profile import _replay_scan_sum

        def scanonly(fo):
            return _replay_scan_sum(tet_mod, args[0], args[1], bg, saved,
                                    gcol * (1 + fo[0] * 0), gdep, B, H, W)
        timed("replay scan only", scanonly)

    elif which == "sortred":
        rngk = np.random.RandomState(1)
        Nb = tet_mod.REPLAY_REDUCE_BATCH * G * 128
        keys0 = jnp.asarray(rngk.randint(0, F, Nb).astype(np.int32))
        vals = [jnp.asarray(rngk.rand(Nb).astype(np.float32))
                for _ in range(10)]

        def sortred(fo):
            ks = lax.sort((keys0 + (fo[0] * 0).astype(jnp.int32),) +
                          tuple(vals), num_keys=1, is_stable=True)
            colsum = jnp.cumsum(jnp.stack(ks[1:]), axis=1)
            bnd = jnp.searchsorted(ks[0],
                                   jnp.arange(F + 1, dtype=jnp.int32))
            z = jnp.concatenate(
                [jnp.zeros((10, 1), jnp.float32), colsum], axis=1)
            return (z[:, bnd[1:]] - z[:, bnd[:-1]],)
        timed(f"one sort-reduce batch ({Nb})", sortred)

        def sortonly(fo):
            ks = lax.sort((keys0 + (fo[0] * 0).astype(jnp.int32),) +
                          tuple(vals), num_keys=1, is_stable=True)
            return (ks[1],)
        timed("  sort only", sortonly)

        ks_sorted = jnp.sort(keys0)

        def ssonly(fo):
            bnd = jnp.searchsorted(
                ks_sorted + (fo[0] * 0).astype(jnp.int32),
                jnp.arange(F + 1, dtype=jnp.int32))
            return (bnd,)
        timed("  searchsorted only", ssonly)

    elif which == "marching":
        def marching(fo):
            return tet_mod._render_tet_backward(
                args[0], args[1], args[2], fo, args[4], args[5], args[6],
                args[7], args[8], args[9], args[10], args[11], bg, H, W, 0,
                512, saved, gcol, gdep)
        timed("marching bwd (fallback)", marching)


if __name__ == "__main__":
    main()
