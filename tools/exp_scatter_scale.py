"""How does XLA:TPU row scatter-add unit cost scale with operand size?

The tri backward's record reduce (scatter-add of [cap, 22] records into
[B*F, 22]) measures 13 / 19 / 96 ns per row at cap = 1M / 2M / 3.9M
(tools/exp_b4_split.py) -- the B=4 per-view anomaly. This isolates the
scaling law and tests workarounds: chunked scatters, window width, key
order.

Run: python tools/exp_scatter_scale.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 4


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    F = 100_000

    def timeit(name, fn, *args, n=1):
        f = jax.jit(fn)
        o = f(*args)
        jax.block_until_ready(o)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            o = f(*args)
            float(jnp.sum(o))
            ts.append(time.perf_counter() - t0)
        ms = min(ts) * 1000 / REPS
        print(f"{name:>44}: {ms:8.2f} ms  ({ms*1e6/n:6.1f} ns/row)",
              flush=True)

    for B in (1, 2, 4):
        cap = 983_040 * B
        nseg = B * F
        rng = np.random.RandomState(0)
        # tile-sorted-like keys: view-major, random faces within
        keys = jnp.asarray(
            (rng.randint(0, F, cap) +
             (np.arange(cap) // (cap // B)).clip(0, B - 1) * F
             ).astype(np.int32))
        rec = jnp.asarray(rng.rand(cap, 22).astype(np.float32))

        def base(keys, rec):
            def it(acc, _):
                return acc.at[keys].add(rec), 0.0
            acc0 = jnp.zeros((nseg, 22), jnp.float32)
            acc, _ = lax.scan(it, acc0, None, length=REPS)
            return acc

        timeit(f"B={B} scatter-add {cap} rows", base, keys, rec, n=cap)

        if B > 1:
            def chunked(keys, rec):
                c1 = cap // B

                def it(acc, _):
                    for i in range(B):
                        acc = acc.at[
                            lax.dynamic_slice(keys, (i * c1,), (c1,))
                        ].add(
                            lax.dynamic_slice(rec, (i * c1, 0), (c1, 22)))
                    return acc, 0.0
                acc0 = jnp.zeros((nseg, 22), jnp.float32)
                acc, _ = lax.scan(it, acc0, None, length=REPS)
                return acc

            timeit(f"B={B} chunked x{B} scatter-add", chunked, keys, rec,
                   n=cap)

            def into_small(keys, rec):
                # same row count, but target table stays F segments
                def it(acc, _):
                    return acc.at[keys % F].add(rec), 0.0
                acc0 = jnp.zeros((F, 22), jnp.float32)
                acc, _ = lax.scan(it, acc0, None, length=REPS)
                return acc

            timeit(f"B={B} same rows -> F-seg table", into_small, keys,
                   rec, n=cap)


if __name__ == "__main__":
    main()
