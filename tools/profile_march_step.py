"""Split the tet forward march's per-step cost on the real TPU.

Components, each timed as N chained repetitions inside one jit:
  gather        mega[tbase+gt] at full ray width
  gather+relay  + physical relayout to [G, 96, 128]
  onehot-expand run-extraction + compact gather + one-hot MXU expansion
                (candidate replacement for gather+relay)
  kernel        _run_fwd_march on a fixed mega_t
  full body     gather + relayout + kernel + log write (the real step)

Run: python tools/profile_march_step.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 10


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from dmesh_renderer_tpu.ops import tet as tet_mod
    from dmesh_renderer_tpu.runtime.native import build_tet_connectivity
    from dmesh_renderer_tpu.utils.connectivity import freudenthal_grid
    from bench import _build

    H = W = 800
    verts, tets = freudenthal_grid(20, jitter=0.15, seed=2)
    faces, face_tets, tet_faces = build_tet_connectivity(tets)
    rng = np.random.RandomState(0)
    vcolor = rng.rand(verts.shape[0], 3).astype(np.float32)
    fop = rng.uniform(0.3, 0.9, faces.shape[0]).astype(np.float32)
    fint = rng.uniform(0.5, 1.0, (1, faces.shape[0])).astype(np.float32)
    mv, proj = _build(1, 1, H, W)[4:6]

    args = tuple(map(jnp.asarray, (
        verts, faces, vcolor, fop, mv, proj,
        np.linalg.inv(mv), np.linalg.inv(proj), fint,
        tets, face_tets, tet_faces,
    )))
    bg = jnp.asarray(np.array([0.1, 0.1, 0.1], np.float32))

    # Build real step-0 inputs by running the forward prologue pieces via
    # a tiny max_steps=1 forward (captures a representative gt/state).
    @jax.jit
    def prologue(fo):
        _c, _d, _a, saved = tet_mod._render_tet_forward(
            args[0], args[1], args[2], fo, args[4], args[5], args[6],
            args[7], args[8], args[9], args[10], args[11], bg, H, W, 0,
            tet_mod.LOG_CAP)
        return saved

    saved = prologue(args[3])
    del saved

    # Recreate the march inputs directly (mirrors _render_tet_forward).
    march = tet_mod._march_tables(
        args[0], args[1], args[9], args[11], args[10], args[2], args[3],
        args[8])
    mega = march["mega"]
    T_n = int(args[9].shape[0])
    M = ((H * W + 127) // 128) * 128
    G = M // 128
    rngi = np.random.RandomState(1)
    # spatially-coherent synthetic gather tets: runs of geometric length
    lens = rngi.geometric(1.0 / 10.0, M)
    ids = rngi.randint(0, T_n, M)
    gt_np = np.repeat(ids, lens)[:M].astype(np.int32)
    if gt_np.size < M:
        gt_np = np.pad(gt_np, (0, M - gt_np.size))
    gt0 = jnp.asarray(gt_np)

    consts_t = jnp.zeros((G, 10, 128), jnp.float32)
    state_t = jnp.zeros((G, tet_mod._NSF2, 128), jnp.float32)
    state_t = state_t.at[:, tet_mod._K_GT, :].set(
        gt0.reshape(G, 128).astype(jnp.float32))

    def timeit(name, fn, *a):
        f = jax.jit(fn)
        o = f(*a)
        jax.block_until_ready(o)
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            o = f(*a)
            float(jnp.sum(o[0] if isinstance(o, tuple) else o))
            ts.append(time.perf_counter() - t0)
        ms = min(ts) * 1000 / REPS
        print(f"{name:>24}: {ms:8.3f} ms/step", flush=True)
        return ms

    def chain(body):
        def fn(st):
            def it(c, _):
                return body(c), 0.0
            out, _ = lax.scan(it, st, None, length=REPS)
            return out
        return fn

    # --- gather only ---
    def g_body(st):
        gt = st[:, tet_mod._K_GT, :].reshape(-1).astype(jnp.int32)
        rows = mega[gt]  # [M, 96]
        # fold a value back into state so the chain can't be elided
        return st.at[:, tet_mod._K_T, :].add(
            rows[:, 0].reshape(G, 128) * 1e-30)

    timeit("gather", chain(g_body), state_t)

    # --- gather + relayout ---
    def gr_body(st):
        gt = st[:, tet_mod._K_GT, :].reshape(-1).astype(jnp.int32)
        mega_t = tet_mod._relayout(mega[gt], 96)
        return st.at[:, tet_mod._K_T, :].add(mega_t[:, 0, :] * 1e-30)

    timeit("gather+relayout", chain(gr_body), state_t)

    # --- one-hot expand (candidate) ---
    BKT = 24

    def oh_body(st):
        gt = st[:, tet_mod._K_GT, :].astype(jnp.int32)  # [G, 128]
        chg = jnp.concatenate(
            [jnp.ones((G, 1), bool), gt[:, 1:] != gt[:, :-1]], axis=1)
        ridx = jnp.cumsum(chg.astype(jnp.int32), axis=1)  # 1-based
        jj = jnp.arange(1, BKT + 1, dtype=jnp.int32)
        oh = (ridx[:, None, :] == jj[None, :, None])  # [G, BKT, 128]
        ohs = (oh & chg[:, None, :]).astype(jnp.float32)
        tid = jnp.sum(ohs * gt[:, None, :].astype(jnp.float32),
                      axis=2).astype(jnp.int32)  # [G, BKT]
        rows = mega[tid.reshape(-1)].reshape(G, BKT, 96)
        mega_t = lax.dot_general(
            rows, oh.astype(jnp.float32),
            (((1,), (1,)), ((0,), (0,))),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)  # [G, 96, 128]
        return st.at[:, tet_mod._K_T, :].add(mega_t[:, 0, :] * 1e-30)

    timeit("onehot-expand", chain(oh_body), state_t)

    # --- exactness of the one-hot expansion vs direct gather ---
    def both(st):
        gt = st[:, tet_mod._K_GT, :].astype(jnp.int32)
        direct = tet_mod._relayout(mega[gt.reshape(-1)], 96)
        chg = jnp.concatenate(
            [jnp.ones((G, 1), bool), gt[:, 1:] != gt[:, :-1]], axis=1)
        ridx = jnp.cumsum(chg.astype(jnp.int32), axis=1)
        jj = jnp.arange(1, BKT + 1, dtype=jnp.int32)
        oh = (ridx[:, None, :] == jj[None, :, None])
        ohs = (oh & chg[:, None, :]).astype(jnp.float32)
        tid = jnp.sum(ohs * gt[:, None, :].astype(jnp.float32),
                      axis=2).astype(jnp.int32)
        rows = mega[tid.reshape(-1)].reshape(G, BKT, 96)
        exp = lax.dot_general(
            rows, oh.astype(jnp.float32),
            (((1,), (1,)), ((0,), (0,))),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        return jnp.max(jnp.abs(direct - exp)), jnp.max(ridx[:, -1])

    err, mx = jax.jit(both)(state_t)
    print(f"  onehot vs gather max abs diff: {float(err):.3e} "
          f"(max runs/block {int(mx)})", flush=True)

    # --- kernel only (fixed mega_t) ---
    mega_t0 = jax.jit(
        lambda st: tet_mod._relayout(
            mega[st[:, tet_mod._K_GT, :].reshape(-1).astype(jnp.int32)],
            96))(state_t)

    def k_body(st):
        out = tet_mod._run_fwd_march(mega_t0, consts_t, st)
        return out[:, :tet_mod._NSF2, :]

    timeit("kernel(fixed mega)", chain(k_body), state_t)

    # --- full body (the real per-step cost) ---
    log_depth = tet_mod.LOG_CAP
    log0 = jnp.zeros((log_depth, G, tet_mod._NLOG, 128), jnp.float32)
    tbase = jnp.zeros((M,), jnp.int32)

    def full_body(c):
        st, log, step = c
        gt = st[:, tet_mod._K_GT, :].reshape(-1).astype(jnp.int32)
        mega_t = tet_mod._relayout(mega[tbase + gt], 96)
        out = tet_mod._run_fwd_march(mega_t, consts_t, st)
        log = lax.dynamic_update_slice(
            log, out[None, :, tet_mod._NSF2:, :],
            (step % log_depth, 0, 0, 0))
        return out[:, :tet_mod._NSF2, :], log, step + 1

    def full_chain(st, log):
        def it(c, _):
            return full_body(c), 0.0
        (st, log, _), _ = lax.scan(it, (st, log, jnp.int32(0)), None,
                                   length=REPS)
        return st, log

    timeit("full step body", full_chain, state_t, log0)


if __name__ == "__main__":
    main()
