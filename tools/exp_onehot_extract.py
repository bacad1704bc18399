"""Measure replay-reduction variants at batch scale on TPU.

Current compact path: in-block run merge (7 shift levels x 10 cols) +
Nb-scale rank scatter + survivor gather + scatter-add.
Candidate: per-128-block one-hot extraction -- run ids from an in-block
cumsum, then the run sums come out of a batched contraction over the lane
axis (MXU-friendly), giving a fixed K survivors per block; scatter-add at
R*K scale. No Nb-scale row-granular op at all.

Run: python tools/exp_onehot_extract.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth(nb, f, mean_run=10, seed=0):
    """Synthetic key stream with geometric runs + 25% invalid (key=f)."""
    rng = np.random.RandomState(seed)
    n_runs = int(nb / mean_run * 1.3)
    lens = rng.geometric(1.0 / mean_run, n_runs)
    keys = rng.randint(0, f, n_runs)
    keys[rng.rand(n_runs) < 0.25] = f
    stream = np.repeat(keys, lens)[:nb]
    if stream.size < nb:
        stream = np.pad(stream, (0, nb - stream.size), constant_values=f)
    return stream.astype(np.int32)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    NB = 6 * 5000 * 128  # one reduce batch at the bench scene
    F = 98_400
    R = NB // 128
    keys_np = synth(NB, F)
    cols_np = [np.random.RandomState(i).rand(NB).astype(np.float32)
               for i in range(10)]

    keys = jnp.asarray(keys_np)
    cols = [jnp.asarray(c) for c in cols_np]

    # ---- reference result (numpy) ----
    acc_ref = np.zeros((F + 1, 10), np.float64)
    valid = keys_np < F
    np.add.at(acc_ref, np.where(valid, keys_np, F),
              np.stack(cols_np, 1) * valid[:, None])
    acc_ref = acc_ref[:F]

    def timeit(name, fn, *args):
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        got = np.asarray(out)[:F]
        err = np.abs(got - acc_ref).max() / max(1e-9, np.abs(acc_ref).max())
        ts = []
        f = jax.jit(fn)
        for _ in range(5):
            t0 = time.perf_counter()
            o = f(*args)
            float(jnp.sum(o))
            ts.append(time.perf_counter() - t0)
        print(f"{name:>32}: {min(ts)*1000:8.2f} ms  (rel err {err:.2e})",
              flush=True)

    # ---- round-3-start path (merge + rank compaction; kept inline for
    # comparison after tet.py moved to the one-hot extraction) ----
    def _segmented_run_merge(key, cols):
        n = key.shape[0]
        notb = (jnp.arange(1, n + 1, dtype=jnp.int32) % 128) != 0
        ok = jnp.concatenate(
            [key[1:] == key[:-1], jnp.zeros((1,), bool)]) & notb
        shift = 1
        while shift < 128:
            okf = ok.astype(jnp.float32)
            cols = [c + okf * jnp.concatenate(
                [c[shift:], jnp.zeros((shift,), c.dtype)]) for c in cols]
            nxt = jnp.concatenate(
                [ok[shift:], jnp.zeros((shift,), bool)])
            ok = ok & nxt
            shift *= 2
        chg = jnp.concatenate(
            [jnp.ones((1,), bool), key[1:] != key[:-1]])
        start = chg | ((jnp.arange(n, dtype=jnp.int32) % 128) == 0)
        return start, cols

    def cur(keys, *cols):
        cols = list(cols)
        scap = NB // 8
        start, merged = _segmented_run_merge(keys, cols)
        valid_start = start & (keys < F)
        rank = jnp.cumsum(valid_start.astype(jnp.int32))
        rows = jnp.stack([keys.astype(jnp.float32)] + merged, axis=1)
        pos = jnp.arange(NB, dtype=jnp.int32)
        surv = jnp.full((scap,), NB - 1, jnp.int32).at[
            jnp.where(valid_start, rank - 1, scap)
        ].set(pos, mode="drop")
        g = rows[surv]
        s_real = rank[-1]
        k_g = jnp.where(jnp.arange(scap, dtype=jnp.int32) < s_real,
                        g[:, 0].astype(jnp.int32), F)
        acc = jnp.zeros((F + 1, 10), jnp.float32)
        return acc.at[k_g].add(g[:, 1:])

    timeit("current merge+rank-compact", cur, keys, *cols)

    # ---- one-hot extraction variants ----
    def onehot_common(keys):
        k2 = keys.reshape(R, 128)
        valid = k2 < F
        chg = jnp.concatenate(
            [jnp.ones((R, 1), bool), k2[:, 1:] != k2[:, :-1]], axis=1)
        vstart = chg & valid
        run_idx = jnp.cumsum(vstart.astype(jnp.int32), axis=1)  # 1-based
        return k2, valid, vstart, run_idx

    def make_onehot_dot(K, prec=None):
        def fn(keys, *cols):
            cols = list(cols)
            k2, valid, vstart, run_idx = onehot_common(keys)
            jj = jnp.arange(1, K + 1, dtype=jnp.int32)
            oh = ((run_idx[:, None, :] == jj[None, :, None])
                  & valid[:, None, :]).astype(jnp.float32)  # [R, K, 128]
            cstack = jnp.stack(
                [c.reshape(R, 128) for c in cols], axis=1)  # [R, 10, 128]
            ext = lax.dot_general(
                oh, cstack,
                (((2,), (2,)), ((0,), (0,))),
                precision=prec,
                preferred_element_type=jnp.float32)  # [R, K, 10]
            ohs = oh * vstart[:, None, :]
            k_ext = jnp.sum(
                ohs * k2[:, None, :].astype(jnp.float32), axis=2)
            has = jnp.sum(ohs, axis=2) > 0
            k_flat = jnp.where(has, k_ext.astype(jnp.int32),
                               F).reshape(R * K)
            acc = jnp.zeros((F + 1, 10), jnp.float32)
            return acc.at[k_flat].add(ext.reshape(R * K, 10))
        return fn

    def make_onehot_mulred(K):
        def fn(keys, *cols):
            cols = list(cols)
            k2, valid, vstart, run_idx = onehot_common(keys)
            jj = jnp.arange(1, K + 1, dtype=jnp.int32)
            oh = ((run_idx[:, None, :] == jj[None, :, None])
                  & valid[:, None, :]).astype(jnp.float32)
            ext = [jnp.sum(oh * c.reshape(R, 1, 128), axis=2)
                   for c in cols]  # K x [R, K]
            ohs = oh * vstart[:, None, :]
            k_ext = jnp.sum(ohs * k2[:, None, :].astype(jnp.float32),
                            axis=2)
            has = jnp.sum(ohs, axis=2) > 0
            k_flat = jnp.where(has, k_ext.astype(jnp.int32),
                               F).reshape(R * K)
            vals = jnp.stack([e.reshape(R * K) for e in ext], axis=1)
            acc = jnp.zeros((F + 1, 10), jnp.float32)
            return acc.at[k_flat].add(vals)
        return fn

    for K in (16, 24, 32):
        timeit(f"onehot-dot K={K}", make_onehot_dot(K), keys, *cols)
    for K in (16,):
        timeit(f"onehot-mulred K={K}", make_onehot_mulred(K), keys, *cols)
    from jax import lax as _lax
    for K in (32,):
        timeit(f"onehot-dot-HIGHEST K={K}",
               make_onehot_dot(K, _lax.Precision.HIGHEST), keys, *cols)

    # how many blocks exceed K at synthetic stats
    k2 = keys_np.reshape(R, 128)
    chg = np.ones((R, 128), bool)
    chg[:, 1:] = k2[:, 1:] != k2[:, :-1]
    per_block = (chg & (k2 < F)).sum(1)
    for K in (16, 24, 32):
        print(f"  synthetic blocks over K={K}: "
              f"{(per_block > K).mean()*100:.4f}%")


if __name__ == "__main__":
    main()
