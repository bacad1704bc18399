"""Per-step cost of the real tet forward-march body, with ablations.

Runs N chained iterations of a faithful copy of the forward body at full
width (no compaction, no while_loop exit check) to separate: the two
gather+split stages, the connectivity step, blend math, and state update
overhead.

Run on the TPU: python tools/profile_march_body.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 8


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from dmesh_renderer_tpu.ops import tet as tet_mod
    from dmesh_renderer_tpu.ops.tet import (
        _march_state_gather, _march_tables, _step_through_tet,
    )
    from dmesh_renderer_tpu.ops.geometry import clamp_w
    from dmesh_renderer_tpu.runtime.native import build_tet_connectivity
    from dmesh_renderer_tpu.utils.connectivity import freudenthal_grid
    from dmesh_renderer_tpu.utils.config import T_EPS

    M = 640_000
    verts, tets = freudenthal_grid(20, jitter=0.15, seed=2)
    faces, face_tets, tet_faces = build_tet_connectivity(tets)
    F = faces.shape[0]
    T = tets.shape[0]
    rng = np.random.RandomState(0)
    vcolor = jnp.asarray(rng.rand(verts.shape[0], 3).astype(np.float32))
    fop = jnp.asarray(rng.uniform(0.3, 0.9, F).astype(np.float32))
    fint = jnp.asarray(rng.uniform(0.5, 1.0, (1, F)).astype(np.float32))

    march = _march_tables(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(tets),
        jnp.asarray(tet_faces), jnp.asarray(face_tets), vcolor, fop, fint)
    march = {k: jax.device_put(v) for k, v in march.items()}

    A = {
        "march_tet": march["tet_pack"],
        "march_shade": march["shade"],
        "cf": jnp.asarray(rng.randint(0, F, M).astype(np.int32)),
        "ct": jnp.asarray(rng.randint(0, T, M).astype(np.int32)),
        **{k: jnp.asarray(rng.rand(M).astype(np.float32))
           for k in ("rox", "roy", "roz", "rdx", "rdy", "rdz",
                     "phoz", "phow", "phdz", "phdw",
                     "cu", "cv", "ctt", "logT", "Tc")},
        "fbase": jnp.zeros((M,), jnp.int32),
    }

    def measure(fn, iters=3):
        @jax.jit
        def chained(a):
            def body(c, _):
                out = fn(a, c)
                return out, None
            c0 = (a["ctt"], a["cu"], a["cv"], a["cf"], a["ct"],
                  jnp.zeros((M,), jnp.float32))
            c, _ = lax.scan(body, c0, None, length=REPS)
            return c[5][:8].sum()
        float(chained(A))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(chained(A))
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1000

    base = measure(lambda a, c: c)
    print(f"{'baseline':>46}: {base:8.2f} ms")

    def timed(name, fn):
        ms = (measure(fn) - base) / REPS
        print(f"{name:>46}: {ms:8.2f} ms/step")

    mm = {"tet_pack": A["march_tet"], "shade": A["march_shade"]}

    def step_only(a, c):
        t, u, v, cf, ct, acc = c
        err, nf, nt, t2, u2, v2 = _step_through_tet(
            mm, cf, ct, (a["rox"], a["roy"], a["roz"]),
            (a["rdx"], a["rdy"], a["rdz"]), +1)
        return (t2, u2, v2, nf, jnp.maximum(nt, 0) % T if False else
                jnp.minimum(jnp.maximum(nt, 0), T - 1),
                acc + err.astype(jnp.float32))

    timed("connectivity step only", step_only)

    def shade_only(a, c):
        t, u, v, cf, ct, acc = c
        c9, alpha, inten, l1a = _march_state_gather(mm, a["fbase"], cf)
        col = [(c9[ch] + (c9[3 + ch] - c9[ch]) * u
                + (c9[6 + ch] - c9[ch]) * v) * inten for ch in range(3)]
        return (t + l1a * 1e-9, u, v,
                jnp.minimum(cf + alpha.astype(jnp.int32), F - 1), ct,
                acc + col[0] + col[1] + col[2])

    timed("shade gather + blend only", shade_only)

    def full_body(a, c):
        t, u, v, cf, ct, acc = c
        c9, alpha, inten, l1a = _march_state_gather(mm, a["fbase"], cf)
        col = [(c9[ch] + (c9[3 + ch] - c9[ch]) * u
                + (c9[6 + ch] - c9[ch]) * v) * inten for ch in range(3)]
        w = alpha * 0.5
        dep = (a["phoz"] + t * a["phdz"]) / clamp_w(a["phow"] + t * a["phdw"])
        logT = acc * 1e-9 + l1a
        Tc = jnp.exp(logT)
        err, nf, nt, t2, u2, v2 = _step_through_tet(
            mm, cf, ct, (a["rox"], a["roy"], a["roz"]),
            (a["rdx"], a["rdy"], a["rdz"]), +1)
        adv = ~err & (Tc > T_EPS)
        return (jnp.where(adv, t2, t), jnp.where(adv, u2, u),
                jnp.where(adv, v2, v),
                jnp.where(adv, nf, cf),
                jnp.minimum(jnp.maximum(jnp.where(adv, nt, ct), 0), T - 1),
                acc + col[0] * w + col[1] * w + col[2] * w + dep * w)

    timed("full body (step + shade + blend + exp)", full_body)


if __name__ == "__main__":
    main()
