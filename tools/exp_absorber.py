"""Does absorber-row collision pile-up tax the replay's survivor scatter?

The one-hot extraction scatters [R*bk, 10] rows into the [F+1, 10] face
accumulator; EMPTY run slots (~1/3 of rows: budget 16 vs ~11 mean runs, plus
dead blocks) all carry key F -- every one of them collides on the single
absorber row. exp_scatter_scale measured ~9-15 ns/row for random-colliding
scatters; the replay batch measures ~21.7 ns/row. Hypothesis: a constant
index concentrates adds on one target row and serializes.

A/B/C on the live backend at replay-batch shape (480k x 10 into 98401 rows):
  A. realistic keys: ~65% valid spread over F rows, 35% == F (one absorber)
  B. same valid keys, dead rows spread over PAD=8192 absorber rows
  C. all-valid spread keys (lower bound)

Run: python tools/exp_absorber.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    F = 98_400
    ROWS = 480_000
    PAD = 8_192
    rng = np.random.RandomState(0)
    valid = rng.rand(ROWS) < 0.65
    # runs are face-sorted-ish per block; random faces are the conservative
    # (slower) index pattern per exp_scatter_scale -- fine for A/B purposes
    keys_valid = rng.randint(0, F, ROWS).astype(np.int32)

    k_a = np.where(valid, keys_valid, F).astype(np.int32)
    k_b = np.where(valid, keys_valid,
                   F + rng.randint(0, PAD, ROWS)).astype(np.int32)
    k_c = keys_valid

    vals = jnp.asarray(rng.randn(ROWS, 10).astype(np.float32))

    def timed(name, kidx, nrows):
        kj = jnp.asarray(kidx)

        @jax.jit
        def run(v):
            def body(acc, _):
                acc = acc.at[kj].add(v)
                return acc * 0.5, jnp.float32(0)

            acc0 = jnp.zeros((nrows, 10), jnp.float32)
            acc, _ = jax.lax.scan(body, acc0, None, length=8)
            return jnp.sum(acc)

        float(run(vals))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(vals))
            ts.append(time.perf_counter() - t0)
        ms = min(ts) * 1000 / 8
        print(f"{name}: {ms:7.3f} ms/scatter  ({ms * 1e6 / ROWS:.2f} ns/row)")
        return ms

    timed("A one-absorber ", k_a, F + 1)
    timed("B spread-absorb", k_b, F + PAD)
    timed("C all-valid    ", k_c, F + 1)


if __name__ == "__main__":
    main()
