"""Does XLA:TPU row-gather unit cost depend on SOURCE table size?

The scatter-add TARGET-size cliff (~20-30 MB, tools/exp_scatter_scale.py)
is established; this probes the gather analog. The tet B=2 stage split
(tools/exp_b2_stages.py) shows the forward march -- whose per-step work is
dominated by a spatially-coherent [M, 64] mega gather -- going 1.86x
per-view super-linear exactly when the mega table doubles (49 -> 98 MB),
while the replay and first-hit stages stay linear.

Gathers 640k rows (the B=1 march's per-step row count) of width 64 with
the march's index pattern (spatially coherent: sorted-ish blocks) from
tables of 12/24/49/98/196 MB.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

M = 640_000
W = 64

out = {}
rng = np.random.RandomState(0)
for n_rows in (49_152, 98_304, 196_608, 393_216, 786_432, 1_572_864):
    mb = n_rows * W * 4 / 2**20
    tab = jnp.asarray(rng.rand(n_rows, W).astype(np.float32))
    # spatially-coherent indices: a smooth walk like the march's per-block
    # ray coherence (neighboring rays in neighboring tets)
    base = np.sort(rng.randint(0, n_rows, size=M // 128))
    idx = (base[:, None] + rng.randint(0, 64, size=(M // 128, 128)))
    idx = np.clip(idx, 0, n_rows - 1).astype(np.int32).reshape(-1)
    idxj = jnp.asarray(idx)

    @jax.jit
    def g(x):
        # 8 chained gathers amortize dispatch; data dependence via x
        acc = jnp.float32(0)
        t = tab
        for _ in range(8):
            r = t[idxj]
            acc = acc + r[0, 0] + x
            x = x + acc * 1e-30
        return acc

    float(g(jnp.float32(1)))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        float(g(jnp.float32(i)))
        ts.append(time.perf_counter() - t0)
    ns_per_row = min(ts) / 8 / M * 1e9
    out[f"{mb:.0f}MB"] = round(ns_per_row, 2)
    print(f"source {mb:7.0f} MB ({n_rows} rows): {ns_per_row:6.2f} ns/row",
          flush=True)

print(json.dumps(out))
