"""Is the ~12.5 ns/row row-gather cost a MATERIALIZATION cost?

bench_roofline's attr stage (gather [100k,128] -> [814k,128] consumed by a
full reduction) measured ~3.6 ns/row -- 3.5x under the 12.5 ns/row constant
every materialized gather has measured (tools/bench_primitives.py). If XLA
evaluates reduction-consumed gathers smarter (fused, no HBM materialize),
maybe a different formulation gets materialized gathers there too.

A/B/C/D on the live backend at attr-stage shape:
  A. sum(tab[idx])                      -- reduction-consumed (the 3.6 case?)
  B. barrier(tab[idx]) then sum         -- forced materialization
  C. tab[idx] + 0.0 elementwise, sum    -- consumer is elementwise
  D. tab[idx][:, :1] sum                -- narrow consumption (DCE probe:
                                           does XLA skip unread columns?)

Run: python tools/exp_gather_fusion.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    N, ROWS, W = 100_000, 814_080, 128
    rng = np.random.RandomState(0)
    tab = jnp.asarray(rng.randn(N, W).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, ROWS).astype(np.int32))

    def timed(name, body):
        @jax.jit
        def run(t):
            def step(c, i):
                ix = (idx + i) % N  # vary indices: no cross-step CSE
                return c + body(t, ix), jnp.float32(0)

            c, _ = jax.lax.scan(step, jnp.float32(0),
                                jnp.arange(8, dtype=jnp.int32))
            return c

        float(run(tab))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(tab))
            ts.append(time.perf_counter() - t0)
        ms = min(ts) * 1000 / 8
        print(f"{name}: {ms:7.3f} ms ({ms * 1e6 / ROWS:.2f} ns/row)")

    timed("A sum(tab[idx])        ", lambda t, ix: jnp.sum(t[ix]))
    timed("B barrier then sum     ",
          lambda t, ix: jnp.sum(
              jax.lax.optimization_barrier(t[ix])))
    timed("C elementwise then sum ", lambda t, ix: jnp.sum(t[ix] * 1.0000001))
    timed("D narrow col sum       ", lambda t, ix: jnp.sum(t[ix][:, 0]))


if __name__ == "__main__":
    main()
