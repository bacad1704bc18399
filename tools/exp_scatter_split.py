"""Replay survivor scatter: one [Nr, 10] scatter-add vs 10 width-1 scatters.

tools/exp_replay_dot.py found the replay reduce is SCATTER-bound: the
survivor scatter of R*K1 = 480k width-10 rows into the [F+1, 10]
accumulator costs ~10.4 ms/batch (~21.7 ns/row) -- the one-hot dot at
HIGHEST is only ~2.4 ms. tools/exp_scatter_width.py measured width-1
scatter-adds as special-cased "~0 ms" at 300k rows. This measures, at the
exact replay shape, whether 10 column-wise width-1 scatters beat the one
fused width-10 scatter (same indices each time).

Run on TPU: python tools/exp_scatter_split.py
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

    F = 98_400
    NR = 30_000 * 16  # R * K1 survivor slots of one reduce batch
    rng = np.random.RandomState(0)
    # key pattern mimicking the extraction: ~66% valid (runs), rest absorber
    keys_np = rng.randint(0, F, NR).astype(np.int32)
    keys_np[rng.rand(NR) < 0.34] = F
    keys = jnp.asarray(keys_np)
    vals = jnp.asarray(rng.rand(NR, 10).astype(np.float32))

    REPS = 8

    def timeit(name, fn, *args):
        ref = np.zeros((F + 1, 10), np.float64)
        np.add.at(ref, keys_np, np.asarray(vals, np.float64))
        out = jax.jit(fn)(*args)
        got = np.asarray(out)[: F + 1]
        err = np.abs(got - ref).max() / ref.max()

        @jax.jit
        def chained(k, v):
            def body(salt, _):
                o = fn(k, v * (1.0 + salt * 1e-12))
                return salt + jnp.sum(o) * 1e-20, None
            s, _ = lax.scan(body, jnp.float32(0), None, length=REPS)
            return s

        float(chained(*args))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            float(chained(*args))
            ts.append(time.perf_counter() - t0)
        print(f"{name:>40}: {min(ts)*1000/REPS:8.2f} ms  (err {err:.1e})",
              flush=True)

    def fused(k, v):
        acc = jnp.zeros((F + 1, 10), jnp.float32)
        return acc.at[k].add(v)

    def split(k, v):
        outs = [jnp.zeros((F + 1,), jnp.float32).at[k].add(v[:, c])
                for c in range(10)]
        return jnp.stack(outs, axis=1)

    def split_scan(k, v):
        # same but as a scan over columns (one scatter in the trace)
        def body(_, col):
            return None, jnp.zeros((F + 1,), jnp.float32).at[k].add(col)
        _, acc = lax.scan(body, None, v.T)
        return acc.T

    timeit("fused [Nr,10] -> [F+1,10]", fused, keys, vals)
    timeit("10 x width-1", split, keys, vals)
    timeit("scan of 10 width-1", split_scan, keys, vals)


if __name__ == "__main__":
    main()
