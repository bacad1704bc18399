"""Isolate the tet B=2 march super-linearity piece by piece.

exp_b2_stages.py: the forward march is 1.86x per view at B=2 while other
stages scale linearly; exp_gather_srcsize.py: gathers have NO source-size
cliff. So one of the march step's glue pieces must scale super-linearly:

  a. the mega gather with the REAL B=2 index pattern
  b. the [M, 64] -> [M/128, 64, 128] relayout
  c. the march kernel itself (bq jumps 8 -> 16 when g % 16 == 0)
  d. the log dynamic_update_slice inside the while carry

Times each in isolation at M = 640k (B=1 shape) and 1.28M (B=2 shape),
plus the kernel at forced bq=8 vs 16.
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

T4 = 192_000  # bench-scene tet slots (48k tets * 4)
out = {}
rng = np.random.RandomState(0)


def timed(name, f, iters=3, reps=6):
    @jax.jit
    def chained(x):
        acc = jnp.float32(0)
        for _ in range(reps):
            y = f(x + acc * 1e-30)
            acc = acc + y.reshape(-1)[0].astype(jnp.float32)
        return acc

    float(chained(jnp.float32(0)))
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(chained(jnp.float32(i)))
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1000 / reps
    out[name] = round(ms, 3)
    print(f"{name:>28}: {ms:8.3f} ms", flush=True)
    return ms


for B in (1, 2):
    M = B * 640_000
    G = M // 128
    mega = jnp.asarray(rng.rand(B * T4, 64).astype(np.float32))
    # real-ish index pattern: view-contiguous rays, block-coherent tets
    base = np.sort(rng.randint(0, T4 - 64, size=G // B))
    idx = np.concatenate([
        b * T4 + np.clip(base[:, None] + rng.randint(0, 64, (G // B, 128)),
                         0, T4 - 1)
        for b in range(B)
    ]).astype(np.int32).reshape(-1)
    idxj = jnp.asarray(idx)

    rows = jnp.asarray(rng.rand(M, 64).astype(np.float32))
    timed(f"B{B}_gather", lambda x: mega[idxj] + x)
    timed(f"B{B}_relayout", lambda x: _relayout(rows + x, 64))
    timed(f"B{B}_gather_relayout",
          lambda x: _relayout(mega[idxj] + x, 64))

    consts = jnp.asarray(rng.rand(G, 10, 128).astype(np.float32))
    state = jnp.zeros((G, tet_mod._NSF2, 128), jnp.float32)
    mega_t = jnp.asarray(rng.rand(G, 64, 128).astype(np.float32))

    for bq in (8, 16):
        if G % bq:
            continue
        tet_mod.BQ_MAX = bq
        timed(f"B{B}_kernel_bq{bq}",
              lambda x: tet_mod._run_fwd_march(mega_t + x, consts, state))
    tet_mod.BQ_MAX = 16

    # log DUS inside a while carry, 17 steps
    log_depth = 17
    nlog = tet_mod._NLOG
    slab = jnp.asarray(rng.rand(G, nlog, 128).astype(np.float32))

    def dus_loop(x):
        log0 = jnp.zeros((log_depth, G, nlog, 128), jnp.float32)

        def body(c):
            log, step = c
            log = lax.dynamic_update_slice(
                log, (slab + x * step)[None], (step % log_depth, 0, 0, 0))
            return log, step + 1

        log, _ = lax.while_loop(lambda c: c[1] < 17, body,
                                (log0, jnp.int32(0)))
        return jnp.sum(log[0, :1, :1])

    timed(f"B{B}_log_dus17", dus_loop, reps=2)

for piece in ("gather", "relayout", "gather_relayout", "kernel_bq8",
              "kernel_bq16", "log_dus17"):
    a, b = out.get(f"B1_{piece}"), out.get(f"B2_{piece}")
    if a and b:
        print(f"{piece}: B2/B1 = {b / a:.2f}")
        out[f"ratio_{piece}"] = round(b / a, 2)
print(json.dumps(out))
