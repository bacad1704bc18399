"""Isolate the tri backward FINALIZE stage's pieces with synthetic data
(shapes match the bench scene: F=100k soup faces, P=300k verts, B=1).

Round-4 profile_bwd_split found ~10.5 ms between "+ record reduce" and
"full fwd+bwd" that the per-row cost model prices at ~5: this times each
piece alone, plus vertex-scatter variants probing the TWO-CLIFF CONFLICT:
the width cliff demands >= 17 update lanes at a 300k-row target, but the
17-lane pad makes the target [300k, 17] = 20.4 MB -- the size-cliff edge
(tools/exp_scatter_scale.py). Variants:

  fused17     current production form ([P, 17] target)
  width7      no pad (width cliff expected: ~85 ns/row)
  split2      two [P/2, 17] targets (each 10.2 MB, under the size cliff),
              every scatter processing all rows, out-of-range dropped
  split4      four [P/4, 17]
  reshape     soup upper bound (faces == arange: scatter is a reshape)

Run on TPU: python tools/exp_finalize_pieces.py
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

    F, P, B = 100_000, 300_000, 1
    NGU = 22
    rng = np.random.RandomState(0)

    sigma = jnp.asarray(rng.permutation(B * F).astype(np.int32))
    face_g_sorted = jnp.asarray(rng.randn(B * F, NGU + 1).astype(np.float32))
    # soup faces (bench) and a shared-mesh variant (P/6 verts, random)
    faces_soup = jnp.asarray(
        np.arange(3 * F, dtype=np.int32).reshape(F, 3))
    faces_shared = jnp.asarray(
        rng.randint(0, P // 6, size=(F, 3)).astype(np.int32))
    upd17 = jnp.asarray(rng.randn(F, 3, 17).astype(np.float32))

    def timed(tag, fn, *args, iters=5):
        f = jax.jit(fn)
        jax.block_until_ready(f(*args))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = f(*args)
            # axon: block_until_ready does not block; pull a scalar
            float(jnp.sum(out) if not isinstance(out, tuple)
                  else sum(jnp.sum(o) for o in out))
            ts.append(time.perf_counter() - t0)
        print(f"{tag:>28}: {min(ts)*1000:8.2f} ms", flush=True)
        return min(ts) * 1000

    base = timed("noop (dispatch)", lambda s: s * 1.0, face_g_sorted)

    timed("unperm set [100k,23]",
          lambda fg, sg: jnp.zeros((B * F, NGU + 1), jnp.float32)
          .at[sg].set(fg, unique_indices=True), face_g_sorted, sigma)

    def fused17(fa, up, p):
        return jnp.zeros((p, 17), jnp.float32).at[fa].add(up)

    def width7(fa, up, p):
        return jnp.zeros((p, 7), jnp.float32).at[fa].add(up[..., :7])

    def splitk(fa, up, p, k):
        outs = []
        step = (p + k - 1) // k
        for i in range(k):
            outs.append(jnp.zeros((step, 17), jnp.float32).at[
                fa - i * step].add(up, mode="drop"))
        return tuple(outs)

    for name, fa in (("soup", faces_soup), ("shared", faces_shared)):
        p = P if name == "soup" else P // 6
        print(f"-- faces={name} (P={p}) --")
        timed(f"fused17 [{p},17]", lambda u, f=fa, pp=p: fused17(f, u, pp),
              upd17)
        timed("width7", lambda u, f=fa, pp=p: width7(f, u, pp), upd17)
        timed("split2", lambda u, f=fa, pp=p: splitk(f, u, pp, 2), upd17)
        timed("split4", lambda u, f=fa, pp=p: splitk(f, u, pp, 4), upd17)
    timed("reshape bound", lambda u: u.reshape(3 * F, 17) * 1.0, upd17)
    print(f"(dispatch baseline {base:.2f} ms is included in every row)")


if __name__ == "__main__" and not os.environ.get("DMRT_VARIANTS"):
    main()


def variants():
    """Scatter-form variants at the in-context shapes: the production
    finalize measures ~4.15 ms for the [F,3,17] .at[faces].add into
    [300k, 17] while the standalone form above is ~1.8. Probe whether the
    3-D index form, the pad, or the target width is responsible."""
    import jax
    import jax.numpy as jnp
    import time

    F, P, B = 100_000, 300_000, 1
    rng = np.random.RandomState(0)
    faces = jnp.asarray(np.arange(3 * F, dtype=np.int32).reshape(F, 3))
    faces_flat = faces.reshape(3 * F)
    face_g = jnp.asarray(rng.randn(F, 23).astype(np.float32))

    def timed(tag, fn, iters=5):
        f = jax.jit(fn)
        float(jnp.sum(f(face_g)))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = f(face_g)
            float(jnp.sum(out))
            ts.append(time.perf_counter() - t0)
        print(f"{tag:>34}: {min(ts)*1000:8.2f} ms", flush=True)

    def build_upd(fg):
        gp = fg[:, 1:10].reshape(F, 3, 3)
        gvc = (fg[:, 10:19] * 1.000001).reshape(F, 3, 3)
        gvd = fg[:, 19:22].reshape(F, 1, 3).transpose(0, 2, 1)  # [F,3,1]
        upd = jnp.concatenate([gp, gvc, gvd], axis=-1)  # [F, 3, 7]
        return jnp.pad(upd, ((0, 0), (0, 0), (0, 10)))

    timed("3D idx [F,3] pad17 (prod form)",
          lambda fg: jnp.zeros((P, 17), jnp.float32)
          .at[faces].add(build_upd(fg)))
    timed("flat idx [3F] pad17",
          lambda fg: jnp.zeros((P, 17), jnp.float32)
          .at[faces_flat].add(build_upd(fg).reshape(3 * F, 17)))
    timed("flat idx pad24",
          lambda fg: jnp.zeros((P, 24), jnp.float32)
          .at[faces_flat].add(
              jnp.pad(build_upd(fg), ((0, 0), (0, 0), (0, 7)))
              .reshape(3 * F, 24)))
    timed("flat idx width7 (no pad)",
          lambda fg: jnp.zeros((P, 7), jnp.float32)
          .at[faces_flat].add(build_upd(fg)[..., :7].reshape(3 * F, 7)))
    # no-build baseline: how much of prod form is the upd build chain
    upd_pre = jnp.asarray(rng.randn(F, 3, 17).astype(np.float32))
    timed("3D idx precomputed upd",
          lambda fg: jnp.zeros((P, 17), jnp.float32)
          .at[faces].add(upd_pre * fg[0, 0]))


if __name__ == "__main__" and os.environ.get("DMRT_VARIANTS"):
    variants()
