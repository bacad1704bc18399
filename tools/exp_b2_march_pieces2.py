"""B=2 half of exp_b2_march_pieces (arrays passed as jit ARGS -- the v1
script closure-captured them, which bakes them into the HLO as literals
and blows the remote-compile request limit at B=2 sizes).

B=1 reference numbers (v1 run): gather 4.26, relayout 4.76,
gather+relayout 4.56 (fused!), kernel_bq8 5.50, log_dus17 14.6 ms.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

import dmesh_renderer_tpu.ops.tet as tet_mod
from dmesh_renderer_tpu.ops.binning import _relayout

T4 = 192_000
out = {}
rng = np.random.RandomState(0)


def timed(name, f, *arrays, iters=3, reps=6):
    @jax.jit
    def chained(x, *arrs):
        acc = jnp.float32(0)
        for _ in range(reps):
            y = f(x + acc * 1e-30, *arrs)
            acc = acc + y.reshape(-1)[0].astype(jnp.float32)
        return acc

    float(chained(jnp.float32(0), *arrays))
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(chained(jnp.float32(i), *arrays))
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1000 / reps
    out[name] = round(ms, 3)
    print(f"{name:>28}: {ms:8.3f} ms", flush=True)
    return ms


for B in (2,):
    M = B * 640_000
    G = M // 128
    mega = jnp.asarray(rng.rand(B * T4, 64).astype(np.float32))
    base = np.sort(rng.randint(0, T4 - 64, size=G // B))
    idx = np.concatenate([
        b * T4 + np.clip(base[:, None] + rng.randint(0, 64, (G // B, 128)),
                         0, T4 - 1)
        for b in range(B)
    ]).astype(np.int32).reshape(-1)
    idxj = jnp.asarray(idx)

    rows = jnp.asarray(rng.rand(M, 64).astype(np.float32))
    timed(f"B{B}_gather", lambda x, mg, ix: mg[ix] + x, mega, idxj)
    timed(f"B{B}_relayout", lambda x, r: _relayout(r + x, 64), rows)
    timed(f"B{B}_gather_relayout",
          lambda x, mg, ix: _relayout(mg[ix] + x, 64), mega, idxj)

    consts = jnp.asarray(rng.rand(G, 10, 128).astype(np.float32))
    state = jnp.zeros((G, tet_mod._NSF2, 128), jnp.float32)
    mega_t = jnp.asarray(rng.rand(G, 64, 128).astype(np.float32))

    for bq in (8, 16):
        if G % bq:
            continue
        tet_mod.BQ_MAX = bq
        timed(f"B{B}_kernel_bq{bq}",
              lambda x, mt, c, s: tet_mod._run_fwd_march(mt + x, c, s),
              mega_t, consts, state)
    tet_mod.BQ_MAX = 16

    log_depth = 17
    nlog = tet_mod._NLOG
    slab = jnp.asarray(rng.rand(G, nlog, 128).astype(np.float32))

    def dus_loop(x, sl):
        log0 = jnp.zeros((log_depth, G, nlog, 128), jnp.float32)

        def body(c):
            log, step = c
            log = lax.dynamic_update_slice(
                log, (sl + x * step)[None], (step % log_depth, 0, 0, 0))
            return log, step + 1

        log, _ = lax.while_loop(lambda c: c[1] < 17, body,
                                (log0, jnp.int32(0)))
        return jnp.sum(log[0, :1, :1])

    timed(f"B{B}_log_dus17", dus_loop, slab, reps=2)

B1 = {"gather": 4.262, "relayout": 4.760, "gather_relayout": 4.563,
      "kernel_bq8": 5.499, "log_dus17": 14.615}
for piece, a in B1.items():
    b = out.get(f"B2_{piece}")
    if b:
        print(f"{piece}: B2/B1 = {b / a:.2f} (linear would be 2.0)")
        out[f"ratio_{piece}"] = round(b / a, 2)
print(json.dumps(out))
