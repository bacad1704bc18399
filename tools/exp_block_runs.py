"""Per-128-lane-block run-count stats of the march log.

The replay backward's record reduction operates on 128-slot blocks (one
log row = one (step, ray-group) block). A fixed per-block survivor budget
K lets run extraction become a one-hot MXU matmul instead of an Nb-scale
rank scatter -- IF the per-block count of valid face-run starts is almost
always <= K. This tool prints that distribution.

Run: python tools/exp_block_runs.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

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

    @jax.jit
    def fwd(fo):
        _c, _d, _a, saved = tet_mod._render_tet_forward(
            args[0], args[1], args[2], fo, args[4], args[5], args[6],
            args[7], args[8], args[9], args[10], args[11], bg, H, W, 0,
            tet_mod.LOG_CAP)
        return saved["march_segs"][0]["log"], saved["n_contrib"], saved["is_active"]

    log, nc, act = jax.device_get(fwd(args[3]))
    D, G = log.shape[0], log.shape[1]
    F = faces.shape[0]
    M = G * 128
    nc_flat = np.zeros(M, np.float32)
    nc_flat[: nc.size] = nc.ravel()
    act_flat = np.zeros(M, bool)
    act_flat[: act.size] = act.ravel()
    print(f"log depth {D}, rays {M}, faces {F}")

    cf = log[:, :, tet_mod._L_CF, :]  # [D, G, 128]
    steps = np.arange(D)[:, None]
    valid = (
        act_flat.reshape(1, G, 128)
        & (steps.reshape(D, 1, 1) < nc_flat.reshape(1, G, 128))
        & (cf >= 0)
    )
    key = np.where(valid, cf, F).astype(np.int64)  # F = invalid

    # valid run starts per 128-block (block = one (step, g) row)
    k = key.reshape(D * G, 128)
    chg = np.ones((D * G, 128), bool)
    chg[:, 1:] = k[:, 1:] != k[:, :-1]
    starts = chg & (k < F)
    per_block = starts.sum(axis=1)  # [D*G]

    print(f"total valid events: {int((k < F).sum())}")
    print(f"total valid run starts: {int(per_block.sum())}")
    nz = per_block[per_block > 0]
    print(f"blocks: {per_block.size}, with any run: {nz.size}")
    for q in (50, 90, 99, 99.9, 99.99, 100):
        print(f"  per-block run starts p{q}: "
              f"{np.percentile(nz, q):.0f}")
    for K in (8, 16, 24, 32, 48, 64):
        frac = (per_block > K).mean()
        lost = int(np.maximum(per_block - K, 0).sum())
        print(f"  K={K:3d}: blocks over budget {frac*100:.4f}%  "
              f"(overflow starts {lost})")

    # per reduce batch (as the replay batches steps): max per-block count
    Kb = tet_mod.REPLAY_REDUCE_BATCH
    for b in range((D + Kb - 1) // Kb):
        sl = per_block.reshape(D, G)[b * Kb:(b + 1) * Kb]
        print(f"  batch {b} (steps {b*Kb}..{b*Kb+sl.shape[0]-1}): "
              f"max/block {sl.max()}, total starts {int(sl.sum())}")


if __name__ == "__main__":
    main()
