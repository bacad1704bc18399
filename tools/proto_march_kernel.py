"""Prototype: one Pallas kernel for the whole tet march step.

Pipeline per step: XLA gathers pack [M,48] and shade [M,12], XLA relayouts
both to [M/128, K, 128] (rays in lanes), then ONE Pallas kernel computes
connectivity step + blend + state update in a single pass. Compares
per-step cost against the current XLA-fused body (~10.3 ms measured).

Run on TPU: python tools/proto_march_kernel.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 8
BQ = 16  # row-groups of 128 rays per block -> 2048 rays/block


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = 640_000
    T = 48_000
    F = 98_400
    G = M // 128  # row-groups

    rng = np.random.RandomState(0)
    A = {
        "tet_pack": jnp.asarray(rng.rand(T, 48).astype(np.float32)),
        "shade": jnp.asarray(rng.rand(F, 12).astype(np.float32)),
        "ct": jnp.asarray(rng.randint(0, T, M).astype(np.int32)),
        "cf": jnp.asarray(rng.randint(0, F, M).astype(np.int32)),
        # consts [10, M]: rox..rdz, phoz..phdw packed as rows
        "consts": jnp.asarray(rng.rand(16, M).astype(np.float32)),
        # state [16, M]
        "state": jnp.asarray(rng.rand(16, M).astype(np.float32)),
    }

    def relayout(rows, k):
        return lax.optimization_barrier(
            rows.reshape(G, 128, k).swapaxes(1, 2))

    def kernel(pack_ref, shade_ref, consts_ref, state_ref, out_ref):
        # pack_ref [BQ, 48, 128], shade [BQ, 12, 128],
        # consts [16, BQ*128_as (BQ,16,128)?]... consts/state fed as
        # [BQ, 16, 128] blocks
        dx = consts_ref[:, 3, :]
        dy = consts_ref[:, 4, :]
        dz = consts_ref[:, 5, :]
        ox = consts_ref[:, 0, :]
        oy = consts_ref[:, 1, :]
        oz = consts_ref[:, 2, :]
        cf = state_ref[:, 3, :]
        t0 = state_ref[:, 0, :]
        u0 = state_ref[:, 1, :]
        v0 = state_ref[:, 2, :]

        n_other = jnp.zeros_like(dx)
        n_exit = jnp.zeros_like(dx)
        d_entry = jnp.zeros_like(dx)
        nt_ = nu_ = nv_ = nface = ntet = None
        for j in range(4):
            p0x = pack_ref[:, 9 * j + 0, :]
            p0y = pack_ref[:, 9 * j + 1, :]
            p0z = pack_ref[:, 9 * j + 2, :]
            e1x = pack_ref[:, 9 * j + 3, :]
            e1y = pack_ref[:, 9 * j + 4, :]
            e1z = pack_ref[:, 9 * j + 5, :]
            e2x = pack_ref[:, 9 * j + 6, :]
            e2y = pack_ref[:, 9 * j + 7, :]
            e2z = pack_ref[:, 9 * j + 8, :]
            sgn = pack_ref[:, 36 + j, :]
            tfj = pack_ref[:, 40 + j, :]
            nbj = pack_ref[:, 44 + j, :]
            nx = e1y * e2z - e1z * e2y
            ny = e1z * e2x - e1x * e2z
            nz = e1x * e2y - e1y * e2x
            nn = jnp.maximum(jnp.sqrt(nx * nx + ny * ny + nz * nz), 1e-4)
            outd = sgn * ((nx / nn) * dx + (ny / nn) * dy + (nz / nn) * dz)
            tvx, tvy, tvz = ox - p0x, oy - p0y, oz - p0z
            pvx = dy * e2z - dz * e2y
            pvy = dz * e2x - dx * e2z
            pvz = dx * e2y - dy * e2x
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            den = pvx * e1x + pvy * e1y + pvz * e1z
            nd = den != 0.0
            inv = 1.0 / jnp.where(nd, den, 1.0)
            t = (qvx * e2x + qvy * e2y + qvz * e2z) * inv
            u = (pvx * tvx + pvy * tvy + pvz * tvz) * inv
            v = (qvx * dx + qvy * dy + qvz * dz) * inv
            hit = nd & (t >= 0) & (u >= 0) & (v >= 0) & (u + v <= 1.0)
            is_entry = tfj == cf
            other = ~is_entry
            n_other = n_other + other.astype(jnp.float32)
            d_entry = d_entry + jnp.where(is_entry, outd, 0.0)
            ex = other & hit & (outd > 0.0)
            n_exit = n_exit + ex.astype(jnp.float32)
            if j == 0:
                nt_, nu_, nv_, nface, ntet = t, u, v, tfj, nbj
            else:
                nt_ = jnp.where(ex, t, nt_)
                nu_ = jnp.where(ex, u, nu_)
                nv_ = jnp.where(ex, v, nv_)
                nface = jnp.where(ex, tfj, nface)
                ntet = jnp.where(ex, nbj, ntet)
        err = (n_other != 3.0) | (d_entry >= 0.0) | (n_exit != 1.0)

        # blend
        alpha = shade_ref[:, 9, :]
        l1a = shade_ref[:, 10, :]
        inten = shade_ref[:, 11, :]
        Tc = state_ref[:, 5, :]
        w = Tc * alpha
        colr = (shade_ref[:, 0, :]
                + (shade_ref[:, 3, :] - shade_ref[:, 0, :]) * u0
                + (shade_ref[:, 6, :] - shade_ref[:, 0, :]) * v0) * inten
        colg = (shade_ref[:, 1, :]
                + (shade_ref[:, 4, :] - shade_ref[:, 1, :]) * u0
                + (shade_ref[:, 7, :] - shade_ref[:, 1, :]) * v0) * inten
        colb = (shade_ref[:, 2, :]
                + (shade_ref[:, 5, :] - shade_ref[:, 2, :]) * u0
                + (shade_ref[:, 8, :] - shade_ref[:, 2, :]) * v0) * inten
        dep = (consts_ref[:, 6, :] + t0 * consts_ref[:, 8, :]) / (
            consts_ref[:, 7, :] + t0 * consts_ref[:, 9, :] + 1e-4)
        logT = state_ref[:, 4, :] + l1a
        Tc2 = jnp.exp(logT)
        adv = ~err & (Tc2 > 1e-4)

        out_ref[:, 0, :] = jnp.where(adv, nt_, t0)
        out_ref[:, 1, :] = jnp.where(adv, nu_, u0)
        out_ref[:, 2, :] = jnp.where(adv, nv_, v0)
        out_ref[:, 3, :] = jnp.where(adv, nface, cf)
        out_ref[:, 4, :] = logT
        out_ref[:, 5, :] = Tc2
        out_ref[:, 6, :] = state_ref[:, 6, :] + colr * w
        out_ref[:, 7, :] = state_ref[:, 7, :] + colg * w
        out_ref[:, 8, :] = state_ref[:, 8, :] + colb * w
        out_ref[:, 9, :] = state_ref[:, 9, :] + dep * w
        out_ref[:, 10, :] = jnp.where(adv, ntet, state_ref[:, 10, :])
        out_ref[:, 11, :] = err.astype(jnp.float32)
        out_ref[:, 12, :] = state_ref[:, 12, :] + 1.0
        out_ref[:, 13, :] = state_ref[:, 13, :]
        out_ref[:, 14, :] = state_ref[:, 14, :]
        out_ref[:, 15, :] = state_ref[:, 15, :]

    @jax.jit
    def chained(a):
        consts_t = lax.optimization_barrier(
            a["consts"].T.reshape(G, 128, 16).swapaxes(1, 2))

        def body(c, _):
            state_t, cf, ct = c
            pack = relayout(a["tet_pack"][ct], 48)
            shade = relayout(a["shade"][cf], 12)
            out = pl.pallas_call(
                kernel,
                grid=(G // BQ,),
                in_specs=[
                    pl.BlockSpec((BQ, 48, 128), lambda i: (i, 0, 0)),
                    pl.BlockSpec((BQ, 12, 128), lambda i: (i, 0, 0)),
                    pl.BlockSpec((BQ, 16, 128), lambda i: (i, 0, 0)),
                    pl.BlockSpec((BQ, 16, 128), lambda i: (i, 0, 0)),
                ],
                out_specs=pl.BlockSpec((BQ, 16, 128), lambda i: (i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((G, 16, 128), jnp.float32),
            )(pack, shade, consts_t, state_t)
            nf = out[:, 3, :].reshape(M).astype(jnp.int32) % F
            nt = out[:, 10, :].reshape(M).astype(jnp.int32) % T
            return (out, nf, nt), None

        state0 = a["state"].T.reshape(G, 128, 16).swapaxes(1, 2)
        (state_t, cf, ct), _ = lax.scan(
            body, (state0, a["cf"], a["ct"]), None, length=REPS)
        return state_t[:, 6, :].sum()

    v = float(chained(A))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        float(chained(A))
        ts.append(time.perf_counter() - t0)
    total = min(ts) * 1000
    print(f"total {total:.2f} ms for {REPS} steps -> "
          f"{(total - 28) / REPS:.2f} ms/step (minus ~28 dispatch)")


if __name__ == "__main__":
    main()
