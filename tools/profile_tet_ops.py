"""Micro-benchmarks of the ops inside one tet-march step at bench scale.

Splits the per-step cost of the lockstep march (tet.py body / backward
body) into its constituent gathers, scatters, and compute, each chained
REPS times inside one jit (same methodology as bench_primitives.py).

Run on the TPU: python tools/profile_tet_ops.py [M] [T] [F]
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
    F = int(sys.argv[3]) if len(sys.argv) > 3 else 98_400
    P = 9_261

    import jax
    import jax.numpy as jnp
    from jax import lax

    from dmesh_renderer_tpu.ops import tet as tet_mod

    rng = np.random.RandomState(0)
    A = {
        "tet_pack": jnp.asarray(rng.rand(T, 48).astype(np.float32)),
        "shade": jnp.asarray(rng.rand(F, 16).astype(np.float32)),
        "ct": jnp.asarray(rng.randint(0, T, M).astype(np.int32)),
        "cf": jnp.asarray(rng.randint(0, F, M).astype(np.int32)),
        "fv": jnp.asarray(rng.randint(0, P, (M, 3)).astype(np.int32)),
        "rayo": jnp.asarray(rng.rand(M, 3).astype(np.float32)),
        "rayd": jnp.asarray(rng.rand(M, 3).astype(np.float32)),
        "w": jnp.asarray(rng.rand(M).astype(np.float32)),
        "upd9": jnp.asarray(rng.rand(M, 3, 3).astype(np.float32)),
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
    print(f"{'baseline (dispatch+scan)':>46}: {base:8.2f} ms total")

    def timed(name, fn):
        ms = (measure(fn) - base) / REPS
        print(f"{name:>46}: {ms:8.2f} ms/op")

    timed(f"pack gather [{M}] rows x48 from [T,48]",
          lambda a, s: a["tet_pack"][(a["ct"] + s) % T])

    timed(f"shade gather [{M}] rows x16 from [F,16]",
          lambda a, s: a["shade"][(a["cf"] + s) % F])

    timed("scatter-add [M,3]x3 f32 -> [P,3] (vcolor)",
          lambda a, s: jnp.zeros((P, 3), jnp.float32).at[
              (a["fv"] + s) % P].add(a["upd9"], mode="drop"))

    timed("scatter-add [M] f32 -> [F] (fopacity)",
          lambda a, s: jnp.zeros((F,), jnp.float32).at[
              (a["cf"] + s) % F].add(a["w"], mode="drop"))

    def step_compute(a, s):
        pack = a["tet_pack"][(a["ct"] + s) % T]
        err, nf, nt, t2, u2, v2 = tet_mod._step_through_tet(
            {"tet_pack": a["tet_pack"]}, a["cf"], (a["ct"] + s) % T,
            a["rayo"], a["rayd"], +1)
        del pack
        return t2 + u2 + v2 + nf.astype(jnp.float32)

    timed("full _step_through_tet (gather + 4-face MT)", step_compute)

    def step_math_only(a, s):
        # the per-step vector math on a pre-gathered pack (no gather)
        pack = jnp.broadcast_to(
            a["tet_pack"][:1], (M, 48)) + s.astype(jnp.float32)
        geo_j = pack[..., 0:36].reshape((M, 4, 9))
        p0j, e1j, e2j = geo_j[..., 0:3], geo_j[..., 3:6], geo_j[..., 6:9]
        n_j = jnp.cross(e1j, e2j)
        norm_j = jnp.maximum(jnp.sqrt(jnp.sum(n_j * n_j, axis=-1)), 1e-4)
        nhat_j = n_j / norm_j[..., None]
        outd = jnp.sum(nhat_j * a["rayd"][..., None, :], axis=-1)
        tuv, nd = tet_mod._mt_from_edges(
            a["rayo"][..., None, :], a["rayd"][..., None, :], p0j, e1j, e2j)
        return jnp.sum(tuv, axis=(-1, -2)) + outd[..., 0] + nd[..., 0]

    timed("step vector math only (no gather)", step_math_only)

    timed("exp [M]", lambda a, s: jnp.exp(a["w"] + s.astype(jnp.float32)))

    timed("argsort [M] i32 (compaction)",
          lambda a, s: jnp.argsort(a["ct"] + s, stable=True))

    timed("gather [M] rows x16 SORTED ids",
          lambda a, s: a["shade"][
              jnp.sort((a["cf"] + s) % F)])

    timed("sort [M] 1key+10pay f32 (record reduce alt)",
          lambda a, s: lax.sort(
              (a["cf"] + s,) + tuple(a["upd9"].reshape(M, 9).T)
              + (a["w"],), num_keys=1, is_stable=True)[1])


if __name__ == "__main__":
    main()
