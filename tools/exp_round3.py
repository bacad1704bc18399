"""Round-3 experiment battery #2.

e1  cf/ct adjacency run-length stats at full march width (how long are runs
    of adjacent rays crossing the SAME face at the same step? -> drives the
    in-kernel record-merge design)
e2  in-kernel dynamic gather feasibility: take_along_axis on sublanes
e3  roll-based segmented lane-merge kernel cost
e4  1-D glue costs at M scale: cumsum, 1-D gather, 1-D scatter
e5  merged mega-table real step (one gather) vs current two-gather step
e6  scatter-add with sorted keys / indices_are_sorted

Run: python tools/exp_round3.py [which...]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 8


def _timer(iters=3):
    import jax
    from jax import lax
    import jax.numpy as jnp

    def measure(fn, arg0):
        @jax.jit
        def chained(a):
            def body(salt, _):
                out = fn(a, salt)
                s = jnp.sum(out.ravel()[:8].astype(jnp.float32))
                return (salt + s.astype(jnp.int32) % 2).astype(jnp.int32), None
            salt, _ = lax.scan(body, jnp.int32(0), None, length=REPS)
            return salt

        float(chained(arg0))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(chained(arg0))
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1000 / REPS
    return measure


def scene():
    import jax.numpy as jnp
    from dmesh_renderer_tpu.ops import tet as tet_mod
    from dmesh_renderer_tpu.runtime.native import build_tet_connectivity
    from dmesh_renderer_tpu.utils.connectivity import freudenthal_grid

    verts, tets = freudenthal_grid(20, jitter=0.15, seed=2)
    faces, face_tets, tet_faces = build_tet_connectivity(tets)
    rng = np.random.RandomState(0)
    vcolor = jnp.asarray(rng.rand(verts.shape[0], 3).astype(np.float32))
    fop = jnp.asarray(rng.uniform(0.3, 0.9, faces.shape[0]).astype(np.float32))
    fint = jnp.asarray(
        rng.uniform(0.5, 1.0, (1, faces.shape[0])).astype(np.float32))
    return verts, tets, faces, face_tets, tet_faces, vcolor, fop, fint


def e1():
    """March the real scene at full width (no compaction) and dump cf/ct
    run statistics per step."""
    import jax
    import jax.numpy as jnp
    from dmesh_renderer_tpu.ops import tet as tet_mod
    from bench import _build

    verts, tets, faces, face_tets, tet_faces, vcolor, fop, fint = scene()
    H = W = 800
    mv, proj = _build(1, 1, H, W)[4:6]
    args = tuple(map(jnp.asarray, (
        verts, faces, vcolor, fop, mv, proj,
        np.linalg.inv(mv), np.linalg.inv(proj), fint,
        tets, face_tets, tet_faces,
    )))
    bg = jnp.asarray(np.array([0.1, 0.1, 0.1], np.float32))

    # replicate the forward setup, then run steps manually at full width
    from dmesh_renderer_tpu.ops.tet import (
        _render_tet_forward, _compacted_while)
    # monkeypatch compaction off: COMPACT_MIN_SIZE huge -> single phase;
    # capture cf/ct by running the forward with a wrapped step_fn
    logs = []
    orig = tet_mod._compacted_while

    def wrapped(state_t, consts_t, fbase, globals_, step_fn, max_steps,
                cf_row, ct_row, done_row):
        def logging_step(st, cf, ct, cst, fb, gl):
            out = step_fn(st, cf, ct, cst, fb, gl)
            return out
        return orig(state_t, consts_t, fbase, globals_, logging_step,
                    max_steps, cf_row, ct_row, done_row)

    # simpler: run the forward manually N steps with jit per step count
    tet_mod.COMPACT_MIN_SIZE = 10**9  # disable compaction phases

    @jax.jit
    def march_n(fo, n):
        # full forward but with max_steps = n; read cf/ct/done rows
        c, d, a, saved = _render_tet_forward(
            args[0], args[1], args[2], fo, args[4], args[5], args[6],
            args[7], args[8], args[9], args[10], args[11], bg, H, W, 0, n)
        return saved

    # capture at selected step counts: run with max_steps=k; last_face is
    # the face blended at the final alive step -> cf at step k
    for k in (1, 2, 4, 8, 12):
        saved = march_n(args[3], k)
        lf = np.asarray(jax.device_get(saved["last_face"])).ravel()
        lt = np.asarray(jax.device_get(saved["last_tet"])).ravel()
        nc = np.asarray(jax.device_get(saved["n_contrib"])).ravel()
        alive = nc >= k  # rays that blended at step k (1-indexed count)
        def runstats(key):
            # mean length of maximal runs of equal key among ALIVE lanes:
            # a run starts at alive lane i when i==0, lane i-1 is dead, or
            # the key changes
            start = alive.copy()
            start[1:] &= (~alive[:-1]) | (key[1:] != key[:-1])
            n_runs = int(start.sum())
            return alive.sum() / max(1, n_runs)

        print(f"step {k:3d}: alive={alive.sum():7d} "
              f"mean cf-run={runstats(lf):6.1f} "
              f"mean ct-run={runstats(lt):6.1f}")


def e2():
    """Does take_along_axis lower in a Pallas TPU kernel? At what operand
    sublane extent, and how fast?"""
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    measure = _timer()
    rng = np.random.RandomState(0)

    for S in (8, 32, 64, 512, 48000):
        tab = jnp.asarray(rng.rand(S, 128).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, S, (8, 128)).astype(np.int32))

        def kernel(tab_ref, idx_ref, out_ref):
            out_ref[:, :] = jnp.take_along_axis(
                tab_ref[:, :], idx_ref[:, :], axis=0)

        def run(a, salt):
            t, i = a
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )((t + salt.astype(jnp.float32) * 0), (i + salt * 0) % S)

        try:
            ms = measure(run, (tab, idx))
            print(f"e2 take_along_axis sublanes={S}: OK {ms:.3f} ms")
        except Exception as ex:
            print(f"e2 take_along_axis sublanes={S}: FAIL "
                  f"{type(ex).__name__}: {str(ex)[:160]}")


def e3():
    """Segmented adjacent-lane merge via pltpu.roll: cost of a 7-level
    shift-add-merge over 11 value rows on a [G, 12, 128] buffer (the
    record-dedup kernel core), at full march width."""
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = 640_000
    G = M // 128
    BQ = 16
    rng = np.random.RandomState(0)
    # keys with runs of ~16
    keys = np.repeat(rng.randint(0, 1 << 20, M // 16 + 1), 16)[:M]
    buf = np.concatenate([
        keys.astype(np.float32).reshape(1, -1),
        rng.rand(11, M).astype(np.float32)], axis=0)
    buf_t = jnp.asarray(
        np.ascontiguousarray(buf.reshape(12, G, 128).swapaxes(0, 1)))

    def kernel(in_ref, out_ref):
        key = in_ref[:, 0, :]
        vals = [in_ref[:, 1 + r, :] for r in range(11)]
        # segmented suffix-sum toward the run START (leftmost lane of each
        # run keeps the run's total; other lanes flagged dead)
        for shift in (1, 2, 4, 8, 16, 32, 64):
            kshift = pltpu.roll(key, -shift, 1)
            same = (kshift == key).astype(jnp.float32)
            # lanes >= 128-shift have no right neighbor at this distance
            lane = jax.lax.broadcasted_iota(jnp.int32, key.shape, 1)
            ok = jnp.where(lane < 128 - shift, same, 0.0)
            vals = [v + ok * pltpu.roll(v, -shift, 1) for v in vals]
        is_start = jnp.ones_like(key)  # placeholder survivor flag math
        out_ref[:, 0, :] = is_start
        for r in range(11):
            out_ref[:, 1 + r, :] = vals[r]

    measure = _timer()

    def run(a, salt):
        x = a + salt.astype(jnp.float32) * 0
        return pl.pallas_call(
            kernel,
            grid=(G // BQ,),
            in_specs=[pl.BlockSpec((BQ, 12, 128), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((BQ, 12, 128), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((G, 12, 128), jnp.float32),
        )(x)

    try:
        ms = measure(run, buf_t)
        print(f"e3 roll-merge kernel [{M}x12]: {ms:.3f} ms/step")
    except Exception as ex:
        print(f"e3 roll-merge: FAIL {type(ex).__name__}: {str(ex)[:200]}")


def e4():
    """1-D glue costs at M scale."""
    import jax.numpy as jnp

    M = 640_000
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(M).astype(np.float32))
    idx = jnp.asarray(np.sort(rng.randint(0, M, M // 16)).astype(np.int32))
    rows = jnp.asarray(rng.rand(M, 12).astype(np.float32))
    measure = _timer()

    print(f"e4 cumsum [M]: "
          f"{measure(lambda a, s: jnp.cumsum(a + s), x):.3f} ms")
    print(f"e4 1-D gather M/16 from [M]: "
          f"{measure(lambda a, s: x[(a + s) % M], idx):.3f} ms")
    print(f"e4 row gather M/16 x12 from [M,12]: "
          f"{measure(lambda a, s: rows[(a + s) % M], idx):.3f} ms")
    acc = jnp.zeros((100_000, 12), jnp.float32)
    print(f"e4 row scatter-add M/16 x12 -> [100k,12]: "
          f"{measure(lambda a, s: acc.at[(a + s) % 100_000].add(rows[:M//16]), idx):.3f} ms")


def e5():
    """Merged mega-table single-gather step vs the current two-gather step,
    in the real-step framework (kernel included)."""
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from dmesh_renderer_tpu.ops import tet as tet_mod
    from dmesh_renderer_tpu.ops.binning import _relayout

    verts, tets, faces, face_tets, tet_faces, vcolor, fop, fint = scene()
    march = tet_mod._march_tables(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(tets),
        jnp.asarray(tet_faces), jnp.asarray(face_tets), vcolor, fop, fint)
    pack, shade = march["tet_pack"], march["shade"]
    T, F = pack.shape[0], faces.shape[0]
    tf_np = np.maximum(np.asarray(tet_faces), 0)
    mega = jnp.concatenate(
        [pack, jnp.asarray(np.asarray(jax.device_get(shade))[tf_np]
                           .reshape(T, 48))], axis=1)  # [T, 96]

    M = 640_000
    rng = np.random.RandomState(0)
    ct = np.sort(rng.randint(0, T, M).astype(np.int32))
    cf_np = tf_np[ct, rng.randint(0, 4, M)]
    cf = cf_np.astype(np.int32)

    ro = [jnp.asarray(rng.rand(M).astype(np.float32)) for _ in range(3)]
    rd = [jnp.asarray(rng.rand(M).astype(np.float32)) for _ in range(3)]
    consts_t = tet_mod._pack_rows(ro + rd + [ro[0], ro[1], ro[2], rd[0]])
    zero = jnp.zeros((M,), jnp.float32)
    one = jnp.ones((M,), jnp.float32)
    state_t = tet_mod._pack_rows(
        [zero, zero, zero, jnp.asarray(cf.astype(np.float32)),
         jnp.asarray(ct.astype(np.float32)),
         zero, one, zero, zero, zero, zero, zero, -one, -one, zero, zero,
         zero])
    measure = _timer()

    def cur(a, salt):
        ctj, cfj = a
        ctj = (ctj + salt) % T
        cfj = (cfj + salt) % F
        pack_t = _relayout(pack[ctj], 48)
        shade_t = _relayout(shade[cfj], 12)
        return tet_mod._run_march_kernel(
            tet_mod._fwd_march_kernel, pack_t, shade_t, consts_t, state_t,
            tet_mod._NSF)

    print(f"e5 current 2-gather step: "
          f"{measure(cur, (jnp.asarray(ct), jnp.asarray(cf))):.3f} ms")

    # mega variant: one gather; kernel does slot select for shade
    def mega_kernel(mega_ref, consts_ref, state_ref, out_ref):
        s = lambda r: state_ref[:, r, :]
        cf_ = s(tet_mod._K_CF)
        # slot select: shade col c = sum_j (tf_j == cf) * mega[48 + 12j + c]
        is_j = [(mega_ref[:, 40 + j, :] == cf_).astype(jnp.float32)
                for j in range(4)]

        def shade_col(c):
            return sum(is_j[j] * mega_ref[:, 48 + 12 * j + c, :]
                       for j in range(4))
        alpha = shade_col(9)
        l1a = shade_col(10)
        inten = shade_col(11)
        u0, v0 = s(tet_mod._K_U), s(tet_mod._K_V)
        col = [(shade_col(ch) + (shade_col(3 + ch) - shade_col(ch)) * u0
                + (shade_col(6 + ch) - shade_col(ch)) * v0) * inten
               for ch in range(3)]
        w = s(tet_mod._K_TCUR) * alpha
        err, nf, nt, t2, u2, v2 = tet_mod._connectivity_step(
            lambda k: mega_ref[:, k, :], cf_,
            consts_ref[:, 0, :], consts_ref[:, 1, :], consts_ref[:, 2, :],
            consts_ref[:, 3, :], consts_ref[:, 4, :], consts_ref[:, 5, :],
            +1)
        out_ref[:, 0, :] = col[0] * w + alpha * l1a
        out_ref[:, 1, :] = col[1] * w + nf
        out_ref[:, 2, :] = col[2] * w + nt
        out_ref[:, 3, :] = t2 + u2 + v2 + err.astype(jnp.float32)
        for r in range(4, tet_mod._NSF):
            out_ref[:, r, :] = s(r)

    g = M // 128
    bq = tet_mod._pick_bq(g)

    def mega_step(a, salt):
        ctj, _ = a
        ctj = (ctj + salt) % T
        mega_t = _relayout(mega[ctj], 96)
        return pl.pallas_call(
            mega_kernel,
            grid=(g // bq,),
            in_specs=[
                pl.BlockSpec((bq, 96, 128), lambda i: (i, 0, 0)),
                pl.BlockSpec((bq, 10, 128), lambda i: (i, 0, 0)),
                pl.BlockSpec((bq, tet_mod._NSF, 128), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((bq, tet_mod._NSF, 128),
                                   lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((g, tet_mod._NSF, 128),
                                           jnp.float32),
        )(mega_t, consts_t, state_t)

    print(f"e5 mega 1-gather step:    "
          f"{measure(mega_step, (jnp.asarray(ct), jnp.asarray(cf))):.3f} ms")


def e6():
    """Scatter-add with sorted vs unsorted keys, indices_are_sorted."""
    import jax.numpy as jnp

    M, F = 640_000, 98_400
    rng = np.random.RandomState(0)
    vals = jnp.asarray(rng.rand(M, 10).astype(np.float32))
    k_rand = rng.randint(0, F, M).astype(np.int32)
    k_sort = np.sort(k_rand)
    acc = jnp.zeros((F, 10), jnp.float32)
    measure = _timer()

    print(f"e6 scatter rand keys: "
          f"{measure(lambda a, s: acc.at[(a + s) % F].add(vals), jnp.asarray(k_rand)):.3f} ms")
    print(f"e6 scatter sorted keys: "
          f"{measure(lambda a, s: acc.at[jnp.minimum(a + s, F - 1)].add(vals), jnp.asarray(k_sort)):.3f} ms")
    print(f"e6 scatter sorted+hint: "
          f"{measure(lambda a, s: acc.at[jnp.minimum(a + s, F - 1)].add(vals, indices_are_sorted=True), jnp.asarray(k_sort)):.3f} ms")




def e7():
    """Big-sort costs: the sort-based record reduction candidate.
    Records [N, 10] with i32 keys -> per-face sums, N ~ total blend steps."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    F = 98_400
    rng = np.random.RandomState(0)
    measure = _timer()
    base = measure(lambda a, s: (a[:1] + s).astype(jnp.float32),
                   jnp.zeros((128,), jnp.int32))
    print(f"e7 dispatch baseline: {base:.3f} ms")

    for N in (2_000_000, 6_000_000):
        keys = jnp.asarray(rng.randint(0, F, N).astype(np.int32))
        vals = [jnp.asarray(rng.rand(N).astype(np.float32))
                for _ in range(10)]

        def sort2(a, s):
            return lax.sort((a + s, vals[0]), num_keys=1, is_stable=True)[0]

        def sort11(a, s):
            return lax.sort(tuple([a + s] + vals), num_keys=1,
                            is_stable=True)[0]

        print(f"e7 N={N} sort 2-op: {measure(sort2, keys)-base:.3f} ms")
        print(f"e7 N={N} sort 11-op: {measure(sort11, keys)-base:.3f} ms")

        keys_sorted = jnp.sort(keys)

        def segreduce(a, s):
            # cumsum + boundary searchsorted + diff (keys pre-sorted)
            ks = a
            colsum = jnp.cumsum(jnp.stack(vals), axis=1)  # [10, N]
            b = jnp.searchsorted(ks, jnp.arange(F + 1, dtype=jnp.int32) + s * 0)
            z = jnp.concatenate(
                [jnp.zeros((10, 1), jnp.float32), colsum], axis=1)
            acc = z[:, b[1:]] - z[:, b[:-1]]  # [10, F] via 2 gathers-by-lane?
            return acc

        print(f"e7 N={N} cumsum+searchsorted+diff: "
              f"{measure(segreduce, keys_sorted)-base:.3f} ms")

        def bigscatter(a, s):
            acc = jnp.zeros((F, 10), jnp.float32)
            return acc.at[(a + s) % F].add(jnp.stack(vals, axis=1))

        print(f"e7 N={N} one scatter: {measure(bigscatter, keys)-base:.3f} ms")


def e8():
    """XLA-level shifted roll-merge on a dense [12, M] record log (adjacent
    equal keys merge; all elementwise/slice ops)."""
    import jax.numpy as jnp

    M = 640_000
    rng = np.random.RandomState(0)
    keys = jnp.asarray(
        np.repeat(rng.randint(0, 1 << 20, M // 16 + 1), 16)[:M]
        .astype(np.int32))
    vals = jnp.asarray(rng.rand(11, M).astype(np.float32))
    measure = _timer()
    base = measure(lambda a, s: (a[:1] + s).astype(jnp.float32),
                   jnp.zeros((128,), jnp.int32))

    def merge(a, s):
        k = a + s * 0
        v = vals
        for shift in (1, 2, 4, 8, 16, 32, 64):
            ks = jnp.concatenate([k[shift:], jnp.full((shift,), -1, k.dtype)])
            same = (ks == k).astype(jnp.float32)[None]
            vs = jnp.concatenate(
                [v[:, shift:], jnp.zeros((11, shift), jnp.float32)], axis=1)
            v = v + same * vs
        return v

    print(f"e8 7-level XLA roll-merge [11, M]: {measure(merge, keys)-base:.3f} ms")


def e10():
    """Dense backward-replay scan: 17 steps of elementwise suffix math on
    [M] slices of a packed log (no gathers, no scatters) -- the candidate
    bwd march compute."""
    import jax.numpy as jnp
    from jax import lax

    M = 640_000
    S = 17
    rng = np.random.RandomState(0)
    log = jnp.asarray(rng.rand(S, 12, M // 128, 128).astype(np.float32))
    measure = _timer()
    base = measure(lambda a, s: (a[:1, 0, 0] + s).astype(jnp.float32),
                   jnp.zeros((128,), jnp.int32))

    def replay(a, s):
        def body(carry, sl):
            acc_r, T = carry
            col = sl[0] + sl[1]
            alpha = sl[2]
            T = T * (1 - alpha * 0.001)
            acc_r = alpha * col + (1 - alpha) * acc_r
            rec = acc_r * T
            return (acc_r, T), rec
        init = (jnp.zeros((M // 128, 128)), jnp.ones((M // 128, 128)))
        _, recs = lax.scan(body, init, a + s.astype(jnp.float32) * 0,
                           reverse=True)
        return recs

    print(f"e10 dense 17-step replay scan: {measure(replay, log)-base:.3f} ms")




def e12():
    """Per-batch sort-reduce cost at candidate batch sizes: the backward
    record-reduction design (sort 11-op + cumsum + searchsorted + diff +
    dense add)."""
    import jax.numpy as jnp
    from jax import lax

    F = 98_400
    rng = np.random.RandomState(0)
    measure = _timer()
    base = measure(lambda a, s: (a[:1] + s).astype(jnp.float32),
                   jnp.zeros((128,), jnp.int32))
    print(f"e12 dispatch baseline: {base:.3f} ms")

    for N in (640_000, 1_280_000, 2_560_000, 5_120_000):
        keys = jnp.asarray(rng.randint(0, F, N).astype(np.int32))
        vals = [jnp.asarray(rng.rand(N).astype(np.float32))
                for _ in range(10)]

        def reduce_batch(a, s):
            ks, *vs = lax.sort(tuple([a + s] + vals), num_keys=1,
                               is_stable=True)
            colsum = jnp.cumsum(jnp.stack(vs), axis=1)  # [10, N]
            b = jnp.searchsorted(ks, jnp.arange(F + 1, dtype=jnp.int32))
            z = jnp.concatenate(
                [jnp.zeros((10, 1), jnp.float32), colsum], axis=1)
            return z[:, b[1:]] - z[:, b[:-1]]  # [10, F]

        print(f"e12 N={N} full sort-reduce: "
              f"{measure(reduce_batch, keys)-base:.3f} ms", flush=True)

        def sort_only(a, s):
            return lax.sort(tuple([a + s] + vals), num_keys=1,
                            is_stable=True)[0]

        print(f"e12 N={N} sort only: "
              f"{measure(sort_only, keys)-base:.3f} ms", flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["e2", "e3", "e4", "e5", "e6", "e1"]
    for name in which:
        print(f"==== {name} ====", flush=True)
        try:
            globals()[name]()
        except Exception as ex:
            import traceback
            traceback.print_exc()
