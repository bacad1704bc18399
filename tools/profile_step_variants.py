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


if __name__ == "__main__":
    main()
