"""Micro-benchmarks of the XLA primitives that dominate the binned pipeline.

The remote TPU runtime has a fixed ~28 ms per-dispatch host round-trip, so
each candidate op is repeated REPS times inside ONE jit via lax.scan with a
data dependency between iterations (XLA cannot batch or elide them); the
per-op cost is (chained - baseline) / REPS.

Run: python tools/bench_primitives.py
"""

from __future__ import annotations

import time

import numpy as np

REPS = 8


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    N = 1_408_000
    CAP = N + 32 * 625
    F = 100_000
    rng = np.random.RandomState(0)

    A = {
        "perm": jnp.asarray(rng.permutation(CAP)[:N].astype(np.int32)),
        "seg": jnp.asarray(np.sort(rng.randint(0, F, N)).astype(np.int32)),
        "vals24": jnp.asarray(rng.rand(N, 24).astype(np.float32)),
        "vals32": jnp.asarray(rng.rand(N, 32).astype(np.float32)),
        "vals128": jnp.asarray(rng.rand(N, 128).astype(np.float32) * 0 + 1),
        "tile": jnp.asarray(rng.randint(0, 625, N).astype(np.int32)),
        "depth": jnp.asarray(rng.rand(N).astype(np.float32)),
        "pay": jnp.asarray(rng.randint(0, F, N).astype(np.int32)),
    }

    def measure(fn, iters=3):
        """fn(a, salt) -> array; chained REPS times inside one jit."""

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

    timed("scatter-set 1.4M int32 -> [CAP]",
          lambda a, s: jnp.zeros((CAP,), jnp.int32).at[a["perm"] + s].set(
              a["pay"], mode="drop", unique_indices=True))

    timed("scatter-add 1.4M x24 f32 -> [F,24]",
          lambda a, s: jnp.zeros((F, 24), jnp.float32).at[a["seg"] + s].add(
              a["vals24"], mode="drop"))

    timed("scatter-add 1.4M x1 f32 -> [F]",
          lambda a, s: jnp.zeros((F,), jnp.float32).at[a["seg"] + s].add(
              a["vals24"][:, 0], mode="drop"))

    timed("scatter-add 105k x24 f32 -> [F,24]",
          lambda a, s: jnp.zeros((F, 24), jnp.float32).at[
              a["seg"][:105_000] + s].add(a["vals24"][:105_000], mode="drop"))

    timed("gather 1.4M rows x24 f32",
          lambda a, s: a["vals24"][(a["pay"] + s) % N])

    timed("gather 1.4M rows x32 f32",
          lambda a, s: a["vals32"][(a["pay"] + s) % N])

    timed("gather 1.4M rows x128 f32",
          lambda a, s: a["vals128"][(a["pay"] + s) % N])

    timed("gather 1.4M x1 int32",
          lambda a, s: a["perm"][(a["pay"] + s) % N])

    timed("cumsum [1.4M, 24] f32 axis 0",
          lambda a, s: jnp.cumsum(a["vals24"] + s.astype(jnp.float32),
                                  axis=0))

    timed("cumsum [1.4M] int32",
          lambda a, s: jnp.cumsum(a["perm"] + s))

    timed("cummax [1.4M] int32",
          lambda a, s: lax.cummax(a["perm"] + s))

    timed("sort 2keys+2pay 1.4M (current emit sort)",
          lambda a, s: lax.sort((a["tile"] + s, a["depth"], a["pay"],
                                 a["perm"][:N]), num_keys=2,
                                is_stable=True)[2])

    timed("sort 2keys+1pay 1.4M",
          lambda a, s: lax.sort((a["tile"] + s, a["depth"], a["pay"]),
                                num_keys=2, is_stable=True)[2])

    timed("sort 1key+1pay 1.4M int32",
          lambda a, s: lax.sort((a["tile"] + s, a["pay"]), num_keys=1,
                                is_stable=True)[1])

    timed("sort 100k f32 + 1pay (face depth sort)",
          lambda a, s: lax.sort((a["depth"][:F] + s.astype(jnp.float32),
                                 a["pay"][:F]), num_keys=1,
                                is_stable=True)[1])

    # within-chunk rank via one-hot matmul: r_j = <O_j, (Mstrict @ O)_j>
    K, T = 128, 640

    def rank_matmul(a, s):
        tiles = (a["tile"] + s).reshape(-1, K) % T  # [n_chunks, K]
        oh = (tiles[..., None] ==
              jax.lax.broadcasted_iota(jnp.int32, (1, 1, T), 2)
              ).astype(jnp.bfloat16)  # [C, K, T]
        m = jnp.tril(jnp.ones((K, K), jnp.bfloat16), k=-1)
        pref = jnp.einsum("jk,ckt->cjt", m, oh,
                          preferred_element_type=jnp.float32)
        rank = jnp.sum(oh.astype(jnp.float32) * pref, axis=-1)
        hist = jnp.sum(oh.astype(jnp.float32), axis=1)  # [C, T]
        carry = jnp.cumsum(hist, axis=0) - hist
        return rank + jnp.take_along_axis(
            carry, tiles.astype(jnp.int32), axis=1)

    timed("counting-rank: onehot matmul K=128 T=640", rank_matmul)

    def rank_chunk_sort(a, s):
        tiles = (a["tile"] + s).reshape(-1, K)
        pay = a["pay"].reshape(-1, K)
        ts_, ps = lax.sort((tiles, pay), dimension=1, num_keys=1,
                           is_stable=True)
        return ts_ + ps

    timed("chunked sort [11k, 128] 1key+1pay", rank_chunk_sort)

    # segment-sum of an ascending-key [1.4M, 24] via cumsum + boundary diff
    def segsum_cumsum(a, s):
        cs = jnp.cumsum(a["vals24"] + s.astype(jnp.float32), axis=0)
        offs = jnp.searchsorted(a["seg"], jnp.arange(0, F, dtype=jnp.int32))
        ends = jnp.concatenate([offs[1:], jnp.array([N], jnp.int32)])
        return cs[ends - 1] - jnp.where(
            (offs > 0)[:, None], cs[jnp.maximum(offs - 1, 0)], 0.0)

    timed("segsum via cumsum+diff [1.4M,24] -> [F,24]", segsum_cumsum)


if __name__ == "__main__":
    main()
