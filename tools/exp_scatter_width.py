"""XLA:TPU scatter-add UPDATE-WIDTH cliff (round 3).

Measured on v5e: a row scatter-add whose update rows are NARROWER than 17
lanes lowers into a ~7x slower per-element path once the TARGET table has
a few hundred thousand rows -- independent of index pattern (coherent,
permuted, or hashed all measure the same):

    src 300k -> tgt [300k, w] add, dispatch-corrected ms:
      w = 1                  ~0    (special-cased)
      w = 2..16              ~24-31  (~85 ns/row)
      w = 17..64             ~3     (~9-13 ns/row)
    src 300k -> tgt [100k, 7]  ~4   (small targets stay fast at any width)

This is DISTINCT from the accumulation-target SIZE cliff
(tools/exp_scatter_scale.py, ~20-30 MB): the width cliff hits narrow
updates on big-row-count targets even when the target is only a few MB.
Fix: pad update rows to >= 17 lanes (dead columns ride the fast path for
free) -- see tri_binned._b_bwd's fused [P, max(17, 6+B)] vertex scatter,
which this finding took from ~26 ms to ~3 ms at the 100k-tri bench.

Run on TPU: python tools/exp_scatter_width.py
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

    rng = np.random.RandomState(0)

    def timed(name, fn, *a):
        f = jax.jit(fn)
        float(jnp.sum(sum(jnp.sum(x) for x in jax.tree.leaves(f(*a)))))
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            float(jnp.sum(sum(jnp.sum(x) for x in jax.tree.leaves(f(*a)))))
            ts.append(time.perf_counter() - t0)
        print(f"{name:>38}: {min(ts)*1000:8.2f} ms", flush=True)

    src = tgt = 300_000
    idx = jnp.asarray(
        (np.arange(src, dtype=np.int64) * 7919 % tgt).astype(np.int32))
    for cols in [1, 4, 8, 16, 17, 22, 32]:
        u = jnp.asarray(rng.randn(src, cols).astype(np.float32))

        def mk(c):
            def s(idx, u):
                return jnp.zeros((tgt, c), jnp.float32).at[idx].add(u)
            return s

        timed(f"300k -> [300k,{cols}] add", mk(cols), idx, u)

    for t2 in (100_000, 200_000):
        u = jnp.asarray(rng.randn(src, 7).astype(np.float32))
        idx2 = jnp.asarray(
            (np.arange(src, dtype=np.int64) * 7919 % t2).astype(np.int32))

        def mk2(t):
            def s(idx, u):
                return jnp.zeros((t, 7), jnp.float32).at[idx].add(u)
            return s

        timed(f"300k -> [{t2//1000}k,7] add", mk2(t2), idx2, u)


if __name__ == "__main__":
    main()
