"""Measure replay-extraction variants: dot precision and scatter width.

The replay backward's record reduction (tet._render_tet_backward_replay)
does, per reduce batch: a one-hot batched contraction [R, K1, 128] x
[R, 128, 12] at precision=HIGHEST (6 bf16 passes -- chosen because the
default 3-pass decomposition loses f32 mantissa bits), then one
scatter-add of R*K1 width-10 rows into the [F+1, 10] accumulator.

Two candidate savings, measured here in isolation at batch scale:

1. WIDTH: tools/exp_scatter_width.py found update rows narrower than 17
   lanes pay ~7x per row on LARGE targets (>~200k rows). F+1 = 98k rows
   is below that measured threshold -- does padding to 17 still help?
2. PRECISION: the one-hot operand is EXACT in bf16 (0/1), so a manual
   2-component split of the value operand (v = hi + lo, both bf16) gives
   two single-pass bf16 dots whose f32 accumulation reproduces ~16
   mantissa bits -- exact for the key column (ids < 2^17: |lo| <= 128 is
   integer-exact in bf16) and ~1e-5 rel on the gradient records, inside
   the 2e-4 contract -- at 2 MXU passes instead of HIGHEST's 6.

Run: python tools/exp_replay_dot.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth(nb, f, mean_run=10, seed=0):
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
    K1 = 16
    keys_np = synth(NB, F)
    cols_np = [np.random.RandomState(i).rand(NB).astype(np.float32)
               for i in range(10)]
    keys = jnp.asarray(keys_np)
    cols = [jnp.asarray(c) for c in cols_np]

    # numpy reference (f64 scatter of raw records)
    acc_ref = np.zeros((F + 1, 10), np.float64)
    valid_np = keys_np < F
    np.add.at(acc_ref, np.where(valid_np, keys_np, F),
              np.stack(cols_np, 1) * valid_np[:, None])
    acc_ref = acc_ref[:F]

    REPS = 8  # chained inside one jit: the axon remote dispatch is a
    # fixed ~28 ms per call and would otherwise swamp every delta

    def timeit(name, fn, *args, check=True):
        f = jax.jit(fn)
        out = f(*args)
        jax.block_until_ready(out)
        msg = ""
        if check:
            got = np.asarray(out)[:F, :10]
            err = (np.abs(got - acc_ref).max()
                   / max(1e-9, np.abs(acc_ref).max()))
            msg = f"  (rel err {err:.2e})"

        @jax.jit
        def chained(k, *cs):
            def body(salt, _):
                o = fn(k, *[c * (1.0 + salt * 1e-12) for c in cs])
                return salt + jnp.sum(o) * 1e-20, None
            s, _ = lax.scan(body, jnp.float32(0), None, length=REPS)
            return s

        float(chained(*args))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            float(chained(*args))
            ts.append(time.perf_counter() - t0)
        print(f"{name:>44}: {min(ts)*1000/REPS:8.2f} ms{msg}", flush=True)

    def prep(k):
        k2 = k.reshape(R, 128)
        valid = k2 < F
        chg = jnp.concatenate(
            [jnp.ones((R, 1), bool), k2[:, 1:] != k2[:, :-1]], axis=1)
        vstart = chg & valid
        rix = jnp.cumsum(vstart.astype(jnp.int32), axis=1)
        return k2, valid, vstart, rix

    def make(dot_mode, scat_w):
        def fn(k, *cs):
            k2, valid, vstart, rix = prep(k)
            cols_r = [c.reshape(R, 128) for c in cs]
            jj = jnp.arange(1, K1 + 1, dtype=jnp.int32)
            ohb = valid[:, None, :] & (rix[:, None, :]
                                       == jj[None, :, None])
            kcol = jnp.where(vstart, k2, 0).astype(jnp.float32)
            ccol = vstart.astype(jnp.float32)
            cs_t = jnp.stack(cols_r + [kcol, ccol], axis=1)  # [R,12,128]
            dn = (((2,), (2,)), ((0,), (0,)))
            if dot_mode == "highest":
                ext = lax.dot_general(
                    ohb.astype(jnp.float32), cs_t, dn,
                    precision=lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
            else:
                oh16 = ohb.astype(jnp.bfloat16)
                hi = cs_t.astype(jnp.bfloat16)
                # barrier: XLA:TPU canonicalizes x - f32(bf16(x)) through
                # cast-reordering and the residual collapses (measured:
                # rel err 72 without it; CPU was exact)
                lo = (cs_t - lax.optimization_barrier(hi).astype(
                    jnp.float32)).astype(jnp.bfloat16)
                ext = (lax.dot_general(oh16, hi, dn,
                                       preferred_element_type=jnp.float32)
                       + lax.dot_general(oh16, lo, dn,
                                         preferred_element_type=jnp.float32))
            k_flat = jnp.where(ext[:, :, 11] > 0.0,
                               ext[:, :, 10].astype(jnp.int32),
                               F).reshape(R * K1)
            vals = ext[:, :, :10].reshape(R * K1, 10)
            if scat_w > 10:
                vals = jnp.pad(vals, ((0, 0), (0, scat_w - 10)))
            acc = jnp.zeros((F + 1, scat_w), jnp.float32)
            return acc.at[k_flat].add(vals)
        return fn

    for dm in ("highest", "bf16x2"):
        for w in (10, 17):
            timeit(f"dot={dm:7s} scatter_w={w:2d}", make(dm, w),
                   keys, *cols)

    # scatter alone at R*K1 rows to isolate the width effect at THIS
    # target row count (keys follow the real extraction pattern)
    k2, valid, vstart, rix = jax.jit(prep)(keys)
    rix_np, vst_np, k2_np = map(np.asarray, (rix, vstart, k2))
    kf = np.full((R, K1), F, np.int32)
    m = vst_np & (rix_np <= K1)
    rr, ll = np.nonzero(m)
    kf[rr, rix_np[rr, ll] - 1] = k2_np[rr, ll]
    kflat = jnp.asarray(kf.reshape(R * K1))
    for w in (10, 17):
        vals = jnp.asarray(
            np.random.RandomState(9).rand(R * K1, w).astype(np.float32))

        def scat(kf_, vals_, w=w):
            acc = jnp.zeros((F + 1, w), jnp.float32)
            return acc.at[kf_].add(vals_)

        timeit(f"scatter only w={w}", scat, kflat, vals, check=False)


if __name__ == "__main__":
    main()
