"""HONEST reduction-component costs (every output fully consumed -- the
earlier battery's out.ravel()[:8] harness let XLA DCE unused sort payload
operands and most of the searchsorted/diff work).

Run: python tools/exp_honest.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 4
N = 3_840_000
F = 98_400


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.RandomState(0)
    keys = jnp.asarray(rng.randint(0, F, N).astype(np.int32))
    keys_sorted = jnp.sort(keys)
    vals = [jnp.asarray(rng.rand(N).astype(np.float32)) for _ in range(10)]
    colsum0 = jnp.asarray(rng.rand(10, N).astype(np.float32))

    def measure(fn, iters=3):
        @jax.jit
        def chained(salt0):
            def body(salt, _):
                outs = fn(salt)
                s = sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
                return salt + (s * 1e-20).astype(jnp.float32), None
            salt, _ = lax.scan(body, salt0, None, length=REPS)
            return salt

        t0 = time.time()
        float(chained(jnp.float32(0)))
        comp = time.time() - t0
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(chained(jnp.float32(0)))
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1000 / REPS, comp

    base, _ = measure(lambda s: (s.reshape(1),))
    print(f"baseline: {base:.2f} ms", flush=True)

    def timed(name, fn):
        ms, comp = measure(fn)
        print(f"{name:>44}: {ms - base:8.2f} ms  (compile {comp:.0f}s)",
              flush=True)

    si = lambda s: (s * 1e9).astype(jnp.int32) % 7  # small salt int

    timed("b1 scatter-add [N,10]->[F,10]",
          lambda s: (jnp.zeros((F, 10), jnp.float32)
                     .at[(keys + si(s)) % F]
                     .add(jnp.stack(vals, axis=1)),))

    def b2(s):
        return lax.sort(((keys + si(s)) % F,) + tuple(vals), num_keys=1,
                        is_stable=True)

    timed("b2 11-op sort (all consumed)", b2)

    timed("b3 cumsum [10,N] axis=1",
          lambda s: (jnp.cumsum(colsum0 + s, axis=1),))

    timed("b4 searchsorted scan (default)",
          lambda s: (jnp.searchsorted(
              keys_sorted, (jnp.arange(F + 1, dtype=jnp.int32) + si(s)) % F),))

    timed("b4b searchsorted method=sort",
          lambda s: (jnp.searchsorted(
              keys_sorted, (jnp.arange(F + 1, dtype=jnp.int32) + si(s)) % F,
              method="sort"),))

    def b5(s):
        ks = keys_sorted + si(s) * 0
        # boundary positions -> per-face first index via 1-D scatter + cummax
        pos = jnp.arange(N, dtype=jnp.int32)
        prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), ks[:-1]])
        isb = ks != prev
        tgt = jnp.where(isb, ks, F)  # drop non-boundaries
        bnd = jnp.full((F + 1,), jnp.int32(N)).at[tgt].min(
            pos, mode="drop")
        # faces with no records: fill with the NEXT boundary (reverse cummin)
        bnd = lax.cummin(bnd, reverse=True)
        return (bnd,)

    timed("b5 boundaries via 1-D scatter-min+cummin", b5)

    timed("b6 1-D scatter-add [N]->[F]",
          lambda s: (jnp.zeros((F,), jnp.float32)
                     .at[(keys + si(s)) % F].add(vals[0]),))

    timed("b7 2-op sort",
          lambda s: lax.sort(((keys + si(s)) % F, vals[0]), num_keys=1,
                             is_stable=True))

    # diff gather at F boundaries from [10, N]
    bnd0 = jnp.asarray(np.sort(rng.randint(0, N, F + 1)).astype(np.int32))
    timed("b8 diff z[:, bnd] x2 ([10,F] lane-gathers)",
          lambda s: (colsum0[:, (bnd0[1:] + si(s)) % N]
                     - colsum0[:, bnd0[:-1]],))


if __name__ == "__main__":
    main()


def extraction():
    """Survivor-position extraction primitives at N=3.84M (the record
    merge+compaction design needs positions of ~200k flagged lanes)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    import time

    rng = np.random.RandomState(0)
    flag = jnp.asarray((rng.rand(N) < 0.1).astype(np.int32))
    vals = jnp.asarray(rng.rand(N).astype(np.float32))
    S_cap = 524_288

    def measure(fn, iters=3):
        @jax.jit
        def chained(salt0):
            def body(salt, _):
                outs = fn(salt)
                s = sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
                return salt + (s * 1e-20).astype(jnp.float32), None
            salt, _ = lax.scan(body, salt0, None, length=REPS)
            return salt
        t0 = time.time()
        float(chained(jnp.float32(0)))
        comp = time.time() - t0
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(chained(jnp.float32(0)))
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1000 / REPS, comp

    base, _ = measure(lambda s: (s.reshape(1),))
    print(f"baseline: {base:.2f} ms", flush=True)

    def timed(name, fn):
        ms, comp = measure(fn)
        print(f"{name:>44}: {ms - base:8.2f} ms  (compile {comp:.0f}s)",
              flush=True)

    si = lambda s: (s * 1e9).astype(jnp.int32) % 7

    timed("b6 1-D scatter-add [N]->[F]",
          lambda s: (jnp.zeros((F,), jnp.float32)
                     .at[(jnp.arange(N, dtype=jnp.int32) * 37 + si(s)) % F]
                     .add(vals),))

    def b9(s):
        f = flag * (1 + si(s) * 0)
        rank = jnp.cumsum(f) - 1
        pos = jnp.arange(N, dtype=jnp.int32)
        surv = jnp.full((S_cap,), jnp.int32(N - 1)).at[
            jnp.where(f > 0, rank, S_cap)].set(pos, mode="drop")
        return (surv,)

    timed("b9 rank-scatter positions [N]->[S_cap]", b9)

    def b10(s):
        f = flag * (1 + si(s) * 0)
        idx = jnp.nonzero(f, size=S_cap, fill_value=N - 1)[0]
        return (idx,)

    timed("b10 jnp.nonzero(size=S_cap)", b10)

    def b11(s):
        key = flag * (1 + si(s) * 0) * N - jnp.arange(N, dtype=jnp.int32)
        _v, idx = lax.top_k(key, S_cap)
        return (idx,)

    timed("b11 top_k(S_cap)", b11)

    # row ops at survivor scale for the compact+reduce tail
    rows = jnp.asarray(rng.rand(N, 11).astype(np.float32))
    idx0 = jnp.asarray(np.sort(rng.randint(0, N, S_cap)).astype(np.int32))
    timed("b12 row-gather [S_cap, 11] from [N, 11]",
          lambda s: (rows[(idx0 + si(s)) % N],))
    keys_s = jnp.asarray(rng.randint(0, F, S_cap).astype(np.int32))
    upd = jnp.asarray(rng.rand(S_cap, 10).astype(np.float32))
    timed("b13 scatter-add [S_cap,10]->[F,10]",
          lambda s: (jnp.zeros((F, 10), jnp.float32)
                     .at[(keys_s + si(s)) % F].add(upd),))
