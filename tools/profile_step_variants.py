"""Isolate the expensive part of tet._step_through_tet (20 ms/op measured
vs ~1.5 ms of gather+math). Builds the function up piece by piece.

Run on the TPU: python tools/profile_step_variants.py [M] [T]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 8


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 640_000
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 48_000
    F = 98_400

    import jax
    import jax.numpy as jnp
    from jax import lax

    from dmesh_renderer_tpu.ops import tet as tet_mod
    from dmesh_renderer_tpu.ops.geometry import strict_hit

    rng = np.random.RandomState(0)
    A = {
        "tet_pack": jnp.asarray(rng.rand(T, 48).astype(np.float32)),
        "ct": jnp.asarray(rng.randint(0, T, M).astype(np.int32)),
        "cf": jnp.asarray(rng.randint(0, F, M).astype(np.int32)),
        "rayo": jnp.asarray(rng.rand(M, 3).astype(np.float32)),
        "rayd": jnp.asarray(rng.rand(M, 3).astype(np.float32)),
        "w": jnp.asarray(rng.rand(M).astype(np.float32)),
        "seg": jnp.asarray(rng.randint(0, F, M).astype(np.int32)),
        "vals10": jnp.asarray(rng.rand(M, 10).astype(np.float32)),
    }

    def measure(fn, iters=3):
        @jax.jit
        def chained(a):
            def body(salt, _):
                out = fn(a, salt)
                s = jnp.sum(out.ravel()[:8].astype(jnp.float32))
                return (salt + s.astype(jnp.int32) % 2).astype(jnp.int32), None
            salt, _ = lax.scan(body, jnp.int32(0), None, length=REPS)
            return salt

        float(chained(A))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(chained(A))
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1000

    base = measure(lambda a, s: s[None].astype(jnp.float32))
    print(f"{'baseline':>52}: {base:8.2f} ms total")

    def timed(name, fn):
        ms = (measure(fn) - base) / REPS
        print(f"{name:>52}: {ms:8.2f} ms/op")

    def gat(a, s):
        return a["tet_pack"][(a["ct"] + s) % T]

    timed("a) gather [M,48] + sum", lambda a, s: jnp.sum(gat(a, s), axis=-1))

    def b(a, s):
        pack = gat(a, s)
        geo_j = pack[..., 0:36].reshape((M, 4, 9))
        sign_j = pack[..., 36:40]
        tf = pack[..., 40:44].astype(jnp.int32)
        nbr_j = pack[..., 44:48].astype(jnp.int32)
        return (jnp.sum(geo_j, axis=(-1, -2)) + jnp.sum(sign_j, axis=-1)
                + (jnp.sum(tf + nbr_j, axis=-1)).astype(jnp.float32))

    timed("b) + reshape/slices/astype", b)

    def c(a, s):
        pack = gat(a, s)
        geo_j = pack[..., 0:36].reshape((M, 4, 9))
        p0j = geo_j[..., 0:3]
        e1j = geo_j[..., 3:6]
        e2j = geo_j[..., 6:9]
        n_j = jnp.cross(e1j, e2j)
        norm_j = jnp.maximum(jnp.sqrt(jnp.sum(n_j * n_j, axis=-1)), 1e-4)
        nhat_j = n_j / norm_j[..., None]
        outd = pack[..., 36:40] * jnp.sum(
            nhat_j * a["rayd"][..., None, :], axis=-1)
        return jnp.sum(outd, axis=-1) + jnp.sum(p0j[..., 0], axis=-1)

    timed("c) + cross/norm/outdot", c)

    def d(a, s):
        pack = gat(a, s)
        geo_j = pack[..., 0:36].reshape((M, 4, 9))
        p0j = geo_j[..., 0:3]
        e1j = geo_j[..., 3:6]
        e2j = geo_j[..., 6:9]
        tuv, nd = tet_mod._mt_from_edges(
            a["rayo"][..., None, :], a["rayd"][..., None, :], p0j, e1j, e2j)
        hit = strict_hit(tuv, nd)
        return jnp.sum(jnp.where(hit, tuv[..., 0], 0.0), axis=-1)

    timed("d) + MT + strict_hit", d)

    def e(a, s):
        err, nf, nt, t2, u2, v2 = tet_mod._step_through_tet(
            {"tet_pack": a["tet_pack"]}, a["cf"], (a["ct"] + s) % T,
            a["rayo"], a["rayd"], +1)
        return t2

    timed("e) full _step_through_tet (t only)", e)

    def f(a, s):
        err, nf, nt, t2, u2, v2 = tet_mod._step_through_tet(
            {"tet_pack": a["tet_pack"]}, a["cf"], (a["ct"] + s) % T,
            a["rayo"], a["rayd"], +1)
        return (t2 + u2 + v2 + nf.astype(jnp.float32)
                + nt.astype(jnp.float32) + err.astype(jnp.float32))

    timed("f) full _step_through_tet (all outputs)", f)

    timed("scatter-add [M]x10 f32 -> [F,10] (fused grads)",
          lambda a, s: jnp.zeros((F, 10), jnp.float32).at[
              (a["seg"] + s) % F].add(a["vals10"], mode="drop"))

    timed("scatter-add [M]x12 f32 -> [F,12]",
          lambda a, s: jnp.zeros((F, 12), jnp.float32).at[
              (a["seg"] + s) % F].add(
                  jnp.pad(a["vals10"], ((0, 0), (0, 2))), mode="drop"))


if __name__ == "__main__" and not any(k.startswith("VARIANTS") for k in os.environ):
    main()


def variants2():
    """Follow-up: why does consuming all outputs cost 5x more than one?"""
    M = 640_000
    T = 48_000

    import jax
    import jax.numpy as jnp
    from jax import lax

    from dmesh_renderer_tpu.ops import tet as tet_mod

    rng = np.random.RandomState(0)
    A = {
        "tet_pack": jnp.asarray(rng.rand(T, 48).astype(np.float32)),
        "ct": jnp.asarray(rng.randint(0, T, M).astype(np.int32)),
        "cf": jnp.asarray(rng.randint(0, 98_400, M).astype(np.int32)),
        "rayo": jnp.asarray(rng.rand(M, 3).astype(np.float32)),
        "rayd": jnp.asarray(rng.rand(M, 3).astype(np.float32)),
    }

    def measure(fn, iters=3):
        @jax.jit
        def chained(a):
            def body(salt, _):
                out = fn(a, salt)
                s = jnp.sum(out.ravel()[:8].astype(jnp.float32))
                return (salt + s.astype(jnp.int32) % 2).astype(jnp.int32), None
            salt, _ = lax.scan(body, jnp.int32(0), None, length=REPS)
            return salt
        float(chained(A))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(chained(A))
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1000

    base = measure(lambda a, s: s[None].astype(jnp.float32))

    def timed(name, fn):
        ms = (measure(fn) - base) / REPS
        print(f"{name:>52}: {ms:8.2f} ms/op")

    def full_barrier(a, s):
        march = {"tet_pack": a["tet_pack"]}
        ct = (a["ct"] + s) % T
        pack = march["tet_pack"][jnp.maximum(ct, 0)]
        pack = lax.optimization_barrier(pack)

        # inline _step_through_tet body on the barriered pack
        shape = ct.shape
        geo_j = pack[..., 0:36].reshape(shape + (4, 9))
        sign_j = pack[..., 36:40]
        tf = pack[..., 40:44].astype(jnp.int32)
        nbr_j = pack[..., 44:48].astype(jnp.int32)
        is_entry = tf == a["cf"][..., None]
        other = ~is_entry
        cnt = jnp.sum(other.astype(jnp.int32), axis=-1)
        err1 = cnt != 3
        p0j = geo_j[..., 0:3]
        e1j = geo_j[..., 3:6]
        e2j = geo_j[..., 6:9]
        n_j = jnp.cross(e1j, e2j)
        norm_j = jnp.maximum(jnp.sqrt(jnp.sum(n_j * n_j, axis=-1)), 1e-4)
        nhat_j = n_j / norm_j[..., None]
        outdot_j = sign_j * jnp.sum(nhat_j * a["rayd"][..., None, :], axis=-1)
        d_entry = jnp.sum(jnp.where(is_entry, outdot_j, 0.0), axis=-1)
        err2 = d_entry >= 0.0
        from dmesh_renderer_tpu.ops.geometry import strict_hit
        tuv, nd = tet_mod._mt_from_edges(
            a["rayo"][..., None, :], a["rayd"][..., None, :], p0j, e1j, e2j)
        hit = strict_hit(tuv, nd)
        dir_ok = outdot_j > 0.0
        exit_j = other & hit & dir_ok
        n_exit = jnp.sum(exit_j.astype(jnp.int32), axis=-1)
        err3 = n_exit != 1
        jidx = jnp.broadcast_to(jnp.arange(4, dtype=jnp.int32), exit_j.shape)
        sel = jnp.max(jnp.where(exit_j, jidx, -1), axis=-1)
        sel_safe = jnp.maximum(sel, 0)
        next_face = tet_mod._select4(tf, sel_safe)
        next_t = tet_mod._select4(tuv[..., 0], sel_safe)
        next_u = tet_mod._select4(tuv[..., 1], sel_safe)
        next_v = tet_mod._select4(tuv[..., 2], sel_safe)
        next_tet = tet_mod._select4(nbr_j, sel_safe)
        err = err1 | err2 | err3
        return (next_t + next_u + next_v + next_face.astype(jnp.float32)
                + next_tet.astype(jnp.float32) + err.astype(jnp.float32))

    timed("g) full with optimization_barrier after gather", full_barrier)


if __name__ == "__main__" and os.environ.get("VARIANTS2"):
    variants2()


def variants3():
    """SoA rewrite test: gather [M,48] -> transpose [48,M] -> all math on
    [M] vectors with the 4 face slots unrolled."""
    M = 640_000
    T = 48_000

    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.RandomState(0)
    A = {
        "tet_pack": jnp.asarray(rng.rand(T, 48).astype(np.float32)),
        "ct": jnp.asarray(rng.randint(0, T, M).astype(np.int32)),
        "cf": jnp.asarray(rng.randint(0, 98_400, M).astype(np.int32)),
        "rayo": jnp.asarray(rng.rand(M, 3).astype(np.float32)),
        "rayd": jnp.asarray(rng.rand(M, 3).astype(np.float32)),
    }

    def measure(fn, iters=3):
        @jax.jit
        def chained(a):
            def body(salt, _):
                out = fn(a, salt)
                s = jnp.sum(out.ravel()[:8].astype(jnp.float32))
                return (salt + s.astype(jnp.int32) % 2).astype(jnp.int32), None
            salt, _ = lax.scan(body, jnp.int32(0), None, length=REPS)
            return salt
        float(chained(A))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(chained(A))
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1000

    base = measure(lambda a, s: s[None].astype(jnp.float32))

    def timed(name, fn):
        ms = (measure(fn) - base) / REPS
        print(f"{name:>52}: {ms:8.2f} ms/op")

    def soa_step(a, s):
        ct = (a["ct"] + s) % T
        pack = a["tet_pack"][ct]          # [M, 48]
        cols = pack.T                     # [48, M] one relayout
        ox, oy, oz = a["rayo"][:, 0], a["rayo"][:, 1], a["rayo"][:, 2]
        dx, dy, dz = a["rayd"][:, 0], a["rayd"][:, 1], a["rayd"][:, 2]
        cf = a["cf"]

        best_sel = jnp.zeros((M,), jnp.int32)
        nt_ = jnp.zeros((M,), jnp.float32)
        nu_ = jnp.zeros((M,), jnp.float32)
        nv_ = jnp.zeros((M,), jnp.float32)
        nface = jnp.zeros((M,), jnp.float32)
        ntet = jnp.zeros((M,), jnp.float32)
        n_other = jnp.zeros((M,), jnp.int32)
        n_exit = jnp.zeros((M,), jnp.int32)
        d_entry = jnp.zeros((M,), jnp.float32)

        for j in range(4):
            p0x, p0y, p0z = cols[9*j+0], cols[9*j+1], cols[9*j+2]
            e1x, e1y, e1z = cols[9*j+3], cols[9*j+4], cols[9*j+5]
            e2x, e2y, e2z = cols[9*j+6], cols[9*j+7], cols[9*j+8]
            sgn = cols[36+j]
            tfj = cols[40+j]
            nbj = cols[44+j]
            # normal + outdot
            nx = e1y*e2z - e1z*e2y
            ny = e1z*e2x - e1x*e2z
            nz = e1x*e2y - e1y*e2x
            nn = jnp.maximum(jnp.sqrt(nx*nx+ny*ny+nz*nz), 1e-4)
            outd = sgn * (nx*dx+ny*dy+nz*dz) / nn
            # MT
            tvx, tvy, tvz = ox-p0x, oy-p0y, oz-p0z
            pvx = dy*e2z - dz*e2y
            pvy = dz*e2x - dx*e2z
            pvz = dx*e2y - dy*e2x
            qvx = tvy*e1z - tvz*e1y
            qvy = tvz*e1x - tvx*e1z
            qvz = tvx*e1y - tvy*e1x
            den = pvx*e1x+pvy*e1y+pvz*e1z
            nd = den != 0.0
            inv = 1.0/jnp.where(nd, den, 1.0)
            t = (qvx*e2x+qvy*e2y+qvz*e2z)*inv
            u = (pvx*tvx+pvy*tvy+pvz*tvz)*inv
            v = (qvx*dx+qvy*dy+qvz*dz)*inv
            hit = nd & (t >= 0) & (u >= 0) & (v >= 0) & (u+v <= 1.0)
            is_entry = tfj == cf.astype(jnp.float32)
            other = ~is_entry
            n_other = n_other + other.astype(jnp.int32)
            d_entry = d_entry + jnp.where(is_entry, outd, 0.0)
            ex = other & hit & (outd > 0.0)
            n_exit = n_exit + ex.astype(jnp.int32)
            # last matching slot wins
            nt_ = jnp.where(ex, t, nt_)
            nu_ = jnp.where(ex, u, nu_)
            nv_ = jnp.where(ex, v, nv_)
            nface = jnp.where(ex, tfj, nface)
            ntet = jnp.where(ex, nbj, ntet)
            best_sel = jnp.where(ex, j, best_sel)

        err = (n_other != 3) | (d_entry >= 0.0) | (n_exit != 1)
        return (nt_ + nu_ + nv_ + nface + ntet + err.astype(jnp.float32)
                + best_sel.astype(jnp.float32))

    timed("h) SoA step: gather + transpose + unrolled math", soa_step)

    def soa_no_transpose(a, s):
        # same but slicing columns straight from [M, 48]
        ct = (a["ct"] + s) % T
        pack = a["tet_pack"][ct]
        cols = [pack[:, c] for c in range(48)]
        dx, dy, dz = a["rayd"][:, 0], a["rayd"][:, 1], a["rayd"][:, 2]
        acc = jnp.zeros((M,), jnp.float32)
        for j in range(4):
            e1x, e1y, e1z = cols[9*j+3], cols[9*j+4], cols[9*j+5]
            e2x, e2y, e2z = cols[9*j+6], cols[9*j+7], cols[9*j+8]
            nx = e1y*e2z - e1z*e2y
            ny = e1z*e2x - e1x*e2z
            nz = e1x*e2y - e1y*e2x
            acc = acc + nx*dx + ny*dy + nz*dz + cols[36+j] + cols[40+j]
        return acc

    timed("i) col slices from [M,48], math (no transpose)", soa_no_transpose)

    timed("j) transpose [M,48] -> [48,M] alone",
          lambda a, s: jnp.sum((a["tet_pack"][(a["ct"] + s) % T]).T, axis=0))


if __name__ == "__main__" and os.environ.get("VARIANTS3"):
    variants3()


def variants4():
    """Force materialization of the [48,M] transposed pack, then SoA math."""
    M = 640_000
    T = 48_000

    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.RandomState(0)
    A = {
        "tet_pack": jnp.asarray(rng.rand(T, 48).astype(np.float32)),
        "tet_pack_t": jnp.asarray(rng.rand(48, T).astype(np.float32)),
        "ct": jnp.asarray(rng.randint(0, T, M).astype(np.int32)),
        "cf": jnp.asarray(rng.randint(0, 98_400, M).astype(np.int32)),
        "rayo": jnp.asarray(rng.rand(M, 3).astype(np.float32)),
        "rayd": jnp.asarray(rng.rand(M, 3).astype(np.float32)),
    }

    def measure(fn, iters=3):
        @jax.jit
        def chained(a):
            def body(salt, _):
                out = fn(a, salt)
                s = jnp.sum(out.ravel()[:8].astype(jnp.float32))
                return (salt + s.astype(jnp.int32) % 2).astype(jnp.int32), None
            salt, _ = lax.scan(body, jnp.int32(0), None, length=REPS)
            return salt
        float(chained(A))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(chained(A))
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1000

    base = measure(lambda a, s: s[None].astype(jnp.float32))

    def timed(name, fn):
        ms = (measure(fn) - base) / REPS
        print(f"{name:>52}: {ms:8.2f} ms/op")

    def soa_math(cols, a):
        dx, dy, dz = a["rayd"][:, 0], a["rayd"][:, 1], a["rayd"][:, 2]
        ox, oy, oz = a["rayo"][:, 0], a["rayo"][:, 1], a["rayo"][:, 2]
        cf = a["cf"].astype(jnp.float32)
        nt_ = jnp.zeros((M,), jnp.float32)
        nface = jnp.zeros((M,), jnp.float32)
        ntet = jnp.zeros((M,), jnp.float32)
        n_other = jnp.zeros((M,), jnp.int32)
        n_exit = jnp.zeros((M,), jnp.int32)
        d_entry = jnp.zeros((M,), jnp.float32)
        nu_ = jnp.zeros((M,), jnp.float32)
        nv_ = jnp.zeros((M,), jnp.float32)
        for j in range(4):
            p0x, p0y, p0z = cols[9*j+0], cols[9*j+1], cols[9*j+2]
            e1x, e1y, e1z = cols[9*j+3], cols[9*j+4], cols[9*j+5]
            e2x, e2y, e2z = cols[9*j+6], cols[9*j+7], cols[9*j+8]
            sgn, tfj, nbj = cols[36+j], cols[40+j], cols[44+j]
            nx = e1y*e2z - e1z*e2y
            ny = e1z*e2x - e1x*e2z
            nz = e1x*e2y - e1y*e2x
            nn = jnp.maximum(jnp.sqrt(nx*nx+ny*ny+nz*nz), 1e-4)
            outd = sgn * (nx*dx+ny*dy+nz*dz) / nn
            tvx, tvy, tvz = ox-p0x, oy-p0y, oz-p0z
            pvx = dy*e2z - dz*e2y
            pvy = dz*e2x - dx*e2z
            pvz = dx*e2y - dy*e2x
            qvx = tvy*e1z - tvz*e1y
            qvy = tvz*e1x - tvx*e1z
            qvz = tvx*e1y - tvy*e1x
            den = pvx*e1x+pvy*e1y+pvz*e1z
            nd = den != 0.0
            inv = 1.0/jnp.where(nd, den, 1.0)
            t = (qvx*e2x+qvy*e2y+qvz*e2z)*inv
            u = (pvx*tvx+pvy*tvy+pvz*tvz)*inv
            v = (qvx*dx+qvy*dy+qvz*dz)*inv
            hit = nd & (t >= 0) & (u >= 0) & (v >= 0) & (u+v <= 1.0)
            is_entry = tfj == cf
            other = ~is_entry
            n_other = n_other + other.astype(jnp.int32)
            d_entry = d_entry + jnp.where(is_entry, outd, 0.0)
            ex = other & hit & (outd > 0.0)
            n_exit = n_exit + ex.astype(jnp.int32)
            nt_ = jnp.where(ex, t, nt_)
            nu_ = jnp.where(ex, u, nu_)
            nv_ = jnp.where(ex, v, nv_)
            nface = jnp.where(ex, tfj, nface)
            ntet = jnp.where(ex, nbj, ntet)
        err = (n_other != 3) | (d_entry >= 0.0) | (n_exit != 1)
        return nt_ + nu_ + nv_ + nface + ntet + err.astype(jnp.float32)

    def k(a, s):
        ct = (a["ct"] + s) % T
        cols = lax.optimization_barrier(a["tet_pack"][ct].T)
        return soa_math(cols, a)

    timed("k) gather -> .T -> BARRIER -> SoA math", k)

    def l(a, s):
        ct = (a["ct"] + s) % T
        pack = lax.optimization_barrier(a["tet_pack"][ct])
        cols = lax.optimization_barrier(pack.T)
        return soa_math(cols, a)

    timed("l) barrier gather AND barrier transpose", l)

    def m(a, s):
        # 48 separate single-column gathers from a transposed [48, T] table
        ct = (a["ct"] + s) % T
        cols = [a["tet_pack_t"][c][ct] for c in range(48)]
        return soa_math(cols, a)

    timed("m) 48 x 1-D gathers from [48,T] rows", m)


if __name__ == "__main__" and os.environ.get("VARIANTS4"):
    variants4()


def variants5():
    """Calibrate raw VPU elementwise throughput at M=640k."""
    M = 640_000

    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.RandomState(0)
    A = {
        "x": jnp.asarray(rng.rand(M).astype(np.float32)),
        "y": jnp.asarray(rng.rand(M).astype(np.float32)),
    }

    def measure(fn, iters=3):
        @jax.jit
        def chained(a):
            def body(salt, _):
                out = fn(a, salt)
                s = jnp.sum(out.ravel()[:8].astype(jnp.float32))
                return (salt + s.astype(jnp.int32) % 2).astype(jnp.int32), None
            salt, _ = lax.scan(body, jnp.int32(0), None, length=REPS)
            return salt
        float(chained(A))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(chained(A))
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1000

    base = measure(lambda a, s: s[None].astype(jnp.float32))

    def timed(name, fn):
        ms = (measure(fn) - base) / REPS
        print(f"{name:>52}: {ms:8.2f} ms/op")

    def fma_chain(n):
        def f(a, s):
            x = a["x"] + s.astype(jnp.float32)
            y = a["y"]
            for i in range(n):
                x = x * 1.000001 + y
            return x
        return f

    timed("fma chain n=32 on [M]", fma_chain(32))
    timed("fma chain n=128 on [M]", fma_chain(128))
    timed("fma chain n=512 on [M]", fma_chain(512))

    def div_chain(n):
        def f(a, s):
            x = a["x"] + s.astype(jnp.float32)
            y = a["y"] + 1.5
            for i in range(n):
                x = x / y + 1.0
            return x
        return f

    timed("divide chain n=32 on [M]", div_chain(32))

    def where_chain(n):
        def f(a, s):
            x = a["x"] + s.astype(jnp.float32)
            y = a["y"]
            for i in range(n):
                x = jnp.where(x > y, x * 0.999, x + 0.001)
            return x
        return f

    timed("compare+where chain n=32 on [M]", where_chain(32))

    def i32_chain(n):
        def f(a, s):
            x = (a["x"] * 1000).astype(jnp.int32) + s
            for i in range(n):
                x = x * 3 + 1 - (x // 7)
            return x.astype(jnp.float32)
        return f

    timed("int32 mul/div chain n=32 on [M]", i32_chain(32))


if __name__ == "__main__" and os.environ.get("VARIANTS5"):
    variants5()


def variants6():
    """Column extraction to 1-D [M] arrays, then full SoA math."""
    M = 640_000
    T = 48_000

    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.RandomState(0)
    A = {
        "tet_pack": jnp.asarray(rng.rand(T, 48).astype(np.float32)),
        "ct": jnp.asarray(rng.randint(0, T, M).astype(np.int32)),
        "cf": jnp.asarray(rng.randint(0, 98_400, M).astype(np.int32)),
        "rayo": jnp.asarray(rng.rand(M, 3).astype(np.float32)),
        "rayd": jnp.asarray(rng.rand(M, 3).astype(np.float32)),
    }

    def measure(fn, iters=3):
        @jax.jit
        def chained(a):
            def body(salt, _):
                out = fn(a, salt)
                s = jnp.sum(out.ravel()[:8].astype(jnp.float32))
                return (salt + s.astype(jnp.int32) % 2).astype(jnp.int32), None
            salt, _ = lax.scan(body, jnp.int32(0), None, length=REPS)
            return salt
        float(chained(A))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(chained(A))
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1000

    base = measure(lambda a, s: s[None].astype(jnp.float32))

    def timed(name, fn):
        ms = (measure(fn) - base) / REPS
        print(f"{name:>52}: {ms:8.2f} ms/op")

    def full_math(cols, a):
        dx, dy, dz = a["rayd"][:, 0], a["rayd"][:, 1], a["rayd"][:, 2]
        ox, oy, oz = a["rayo"][:, 0], a["rayo"][:, 1], a["rayo"][:, 2]
        cf = a["cf"].astype(jnp.float32)
        nt_ = jnp.zeros((M,), jnp.float32)
        nu_ = jnp.zeros((M,), jnp.float32)
        nv_ = jnp.zeros((M,), jnp.float32)
        nface = jnp.zeros((M,), jnp.float32)
        ntet = jnp.zeros((M,), jnp.float32)
        n_other = jnp.zeros((M,), jnp.int32)
        n_exit = jnp.zeros((M,), jnp.int32)
        d_entry = jnp.zeros((M,), jnp.float32)
        for j in range(4):
            p0x, p0y, p0z = cols[9*j+0], cols[9*j+1], cols[9*j+2]
            e1x, e1y, e1z = cols[9*j+3], cols[9*j+4], cols[9*j+5]
            e2x, e2y, e2z = cols[9*j+6], cols[9*j+7], cols[9*j+8]
            sgn, tfj, nbj = cols[36+j], cols[40+j], cols[44+j]
            nx = e1y*e2z - e1z*e2y
            ny = e1z*e2x - e1x*e2z
            nz = e1x*e2y - e1y*e2x
            nn = jnp.maximum(jnp.sqrt(nx*nx+ny*ny+nz*nz), 1e-4)
            outd = sgn * (nx*dx+ny*dy+nz*dz) / nn
            tvx, tvy, tvz = ox-p0x, oy-p0y, oz-p0z
            pvx = dy*e2z - dz*e2y
            pvy = dz*e2x - dx*e2z
            pvz = dx*e2y - dy*e2x
            qvx = tvy*e1z - tvz*e1y
            qvy = tvz*e1x - tvx*e1z
            qvz = tvx*e1y - tvy*e1x
            den = pvx*e1x+pvy*e1y+pvz*e1z
            nd = den != 0.0
            inv = 1.0/jnp.where(nd, den, 1.0)
            t = (qvx*e2x+qvy*e2y+qvz*e2z)*inv
            u = (pvx*tvx+pvy*tvy+pvz*tvz)*inv
            v = (qvx*dx+qvy*dy+qvz*dz)*inv
            hit = nd & (t >= 0) & (u >= 0) & (v >= 0) & (u+v <= 1.0)
            is_entry = tfj == cf
            other = ~is_entry
            n_other = n_other + other.astype(jnp.int32)
            d_entry = d_entry + jnp.where(is_entry, outd, 0.0)
            ex = other & hit & (outd > 0.0)
            n_exit = n_exit + ex.astype(jnp.int32)
            nt_ = jnp.where(ex, t, nt_)
            nu_ = jnp.where(ex, u, nu_)
            nv_ = jnp.where(ex, v, nv_)
            nface = jnp.where(ex, tfj, nface)
            ntet = jnp.where(ex, nbj, ntet)
        err = (n_other != 3) | (d_entry >= 0.0) | (n_exit != 1)
        return (nt_ + nu_ + nv_ + nface + ntet + err.astype(jnp.float32))

    def n_direct(a, s):
        ct = (a["ct"] + s) % T
        pack = a["tet_pack"][ct]
        cols = [pack[:, c] for c in range(48)]
        return full_math(cols, a)

    timed("n) direct col slices, full math", n_direct)

    def o_barrier(a, s):
        ct = (a["ct"] + s) % T
        pack = a["tet_pack"][ct]
        cols = lax.optimization_barrier(
            tuple(pack[:, c] for c in range(48)))
        return full_math(list(cols), a)

    timed("o) BARRIER tuple of 48 [M] cols, full math", o_barrier)

    def p_reshaped(a, s):
        # extraction via one reshape [M,48]->[48] split of a transposed
        # copy forced through 1-D: cols from a [48*M] flat bitcast-able
        ct = (a["ct"] + s) % T
        pack = a["tet_pack"][ct]
        packT = jnp.swapaxes(pack.reshape(M // 128, 128, 48), 1, 2)
        # [M/128, 48, 128]: lanes = the 128-ray chunk, clean layout
        cols = lax.optimization_barrier(packT)
        c = [cols[:, k, :].reshape(M) for k in range(48)]
        return full_math(c, a)

    timed("p) [M/128,48,128] relayout, full math", p_reshaped)


if __name__ == "__main__" and os.environ.get("VARIANTS6"):
    variants6()


def variants7():
    """Per-step gradient reduction alternatives: scatter-add vs sort+segsum."""
    M = 640_000
    F = 98_400

    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.RandomState(0)
    A = {
        "cf": jnp.asarray(rng.randint(0, F, M).astype(np.int32)),
        "rec": jnp.asarray(rng.rand(M, 10).astype(np.float32)),
        "rec_rows": tuple(jnp.asarray(rng.rand(M).astype(np.float32))
                          for _ in range(10)),
    }

    def measure(fn, iters=3):
        @jax.jit
        def chained(a):
            def body(salt, _):
                out = fn(a, salt)
                s = jnp.sum(out.ravel()[:8].astype(jnp.float32))
                return (salt + s.astype(jnp.int32) % 2).astype(jnp.int32), None
            salt, _ = lax.scan(body, jnp.int32(0), None, length=REPS)
            return salt
        float(chained(A))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(chained(A))
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1000

    base = measure(lambda a, s: s[None].astype(jnp.float32))

    def timed(name, fn):
        ms = (measure(fn) - base) / REPS
        print(f"{name:>52}: {ms:8.2f} ms/op")

    timed("a) scatter-add [M,10] -> [F,10]",
          lambda a, s: jnp.zeros((F, 10), jnp.float32).at[
              (a["cf"] + s) % F].add(a["rec"], mode="drop"))

    def sort_segsum_ss(a, s):
        key = (a["cf"] + s) % F
        out = lax.sort((key,) + a["rec_rows"], num_keys=1, is_stable=True)
        skey, svals = out[0], out[1:]
        cs = [jnp.cumsum(v) for v in svals]
        ends = jnp.searchsorted(skey, jnp.arange(F, dtype=jnp.int32),
                                side="right")
        tots = [jnp.where(ends > 0, c[jnp.maximum(ends - 1, 0)], 0.0)
                for c in cs]
        segs = [t - jnp.concatenate([jnp.zeros(1, t.dtype), t[:-1]])
                for t in tots]
        return jnp.stack(segs, axis=1)

    timed("b) sort + cumsum + searchsorted diff", sort_segsum_ss)

    def sort_segsum_sc(a, s):
        key = (a["cf"] + s) % F
        out = lax.sort((key,) + a["rec_rows"], num_keys=1, is_stable=True)
        skey, svals = out[0], out[1:]
        cs = [jnp.cumsum(v) for v in svals]
        is_last = jnp.concatenate(
            [skey[:-1] != skey[1:], jnp.ones(1, bool)])
        pos = jnp.where(is_last, skey, F)
        tots = [jnp.zeros((F,), jnp.float32).at[pos].max(c, mode="drop")
                for c in cs]
        # cummax over F to forward-fill empty faces, then diff
        filled = [lax.cummax(t) for t in tots]
        segs = [t - jnp.concatenate([jnp.zeros(1, t.dtype), t[:-1]])
                for t in filled]
        return jnp.stack(segs, axis=1)

    timed("c) sort + cumsum + boundary scatter-set", sort_segsum_sc)

    timed("d) cumsum x10 [M] alone",
          lambda a, s: sum(jnp.cumsum(v + s.astype(jnp.float32))[-1]
                           for v in a["rec_rows"])[None])

    timed("e) sort 1key+10pay alone",
          lambda a, s: lax.sort((( a["cf"] + s) % F,) + a["rec_rows"],
                                num_keys=1, is_stable=True)[1])


if __name__ == "__main__" and os.environ.get("VARIANTS7"):
    variants7()


def variants8():
    """Scatter-add collision sensitivity: spread the [F,10] target."""
    M = 640_000
    F = 98_400

    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.RandomState(0)
    A = {
        "cf": jnp.asarray(rng.randint(0, F, M).astype(np.int32)),
        "rec": jnp.asarray(rng.rand(M, 10).astype(np.float32)),
    }

    def measure(fn, iters=3):
        @jax.jit
        def chained(a):
            def body(salt, _):
                out = fn(a, salt)
                s = jnp.sum(out.ravel()[:8].astype(jnp.float32))
                return (salt + s.astype(jnp.int32) % 2).astype(jnp.int32), None
            salt, _ = lax.scan(body, jnp.int32(0), None, length=REPS)
            return salt
        float(chained(A))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(chained(A))
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1000

    base = measure(lambda a, s: s[None].astype(jnp.float32))

    def timed(name, fn):
        ms = (measure(fn) - base) / REPS
        print(f"{name:>52}: {ms:8.2f} ms/op")

    timed("scatter-add [M]x10 -> [F,10] (baseline)",
          lambda a, s: jnp.zeros((F, 10), jnp.float32).at[
              (a["cf"] + s) % F].add(a["rec"], mode="drop"))

    def spread(k):
        def f(a, s):
            idx = ((a["cf"] + s) % F) * k + (
                jnp.arange(M, dtype=jnp.int32) % k)
            wide = jnp.zeros((F * k, 10), jnp.float32).at[idx].add(
                a["rec"], mode="drop")
            return wide.reshape(F, k, 10).sum(axis=1)
        return f

    timed("spread x4 -> [4F,10] + fold", spread(4))
    timed("spread x8 -> [8F,10] + fold", spread(8))

    timed("scatter-add [M]x10 SORTED cf -> [F,10]",
          lambda a, s: jnp.zeros((F, 10), jnp.float32).at[
              jnp.sort((a["cf"] + s) % F)].add(a["rec"], mode="drop"))

    timed("scatter-add [M]x1 -> [F] (1 col)",
          lambda a, s: jnp.zeros((F,), jnp.float32).at[
              (a["cf"] + s) % F].add(a["rec"][:, 0], mode="drop"))

    timed("scatter-add [M/2]x10 -> [F,10] (half rows)",
          lambda a, s: jnp.zeros((F, 10), jnp.float32).at[
              (a["cf"][:M // 2] + s) % F].add(a["rec"][:M // 2],
                                             mode="drop"))


if __name__ == "__main__" and os.environ.get("VARIANTS8"):
    variants8()
