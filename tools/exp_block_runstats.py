"""Per-128-lane-block run-count distribution of the march log (the replay
backward's one-hot extraction budget): how many distinct face runs does
each block hold per step, using the replay's exact change rule (an invalid
gap forces a new run at the next valid lane)?

Decides REPLAY_BLOCK_K1 (pass-1 budget) and the overflow-block fraction
for the two-pass extraction. Run on the TPU: python tools/exp_block_runstats.py
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
        return saved["march_segs"][0]["log"]

    log = jax.device_get(fwd(args[3]))
    D, G = log.shape[0], log.shape[1]
    F = faces.shape[0]
    print(f"log depth {D}, blocks/step {G}")

    all_nrb = []
    for s in range(D):
        cf = log[s, :, tet_mod._L_CF, :]  # [G, 128]
        valid = cf >= 0
        if not valid.any():
            break
        ks = np.where(valid, cf, F)
        chg = np.concatenate(
            [np.ones((G, 1), bool), ks[:, 1:] != ks[:, :-1]], axis=1)
        nrb = np.cumsum((chg & valid).astype(np.int32), axis=1)[:, -1]
        all_nrb.append(nrb)
        if s in (0, 2, 4, 6, 8, 10):
            live = nrb[nrb > 0]
            print(f"step {s:2d}: live blocks {live.size:6d} "
                  f"runs/block mean {live.mean():5.1f} "
                  f"p90 {np.percentile(live, 90):4.0f} "
                  f"p99 {np.percentile(live, 99):4.0f} "
                  f"p100 {live.max():4d} "
                  f">16: {(live > 16).mean()*100:5.1f}% "
                  f">24: {(live > 24).mean()*100:5.1f}%")
    a = np.concatenate(all_nrb)
    live = a[a > 0]
    print(f"ALL steps: live {live.size} mean {live.mean():.1f} "
          f"p99 {np.percentile(live, 99):.0f} p100 {live.max()} "
          f">8 {(live > 8).mean()*100:.1f}%  >12 {(live > 12).mean()*100:.1f}%  "
          f">16 {(live > 16).mean()*100:.1f}%  >20 {(live > 20).mean()*100:.1f}%  "
          f">24 {(live > 24).mean()*100:.1f}%  >32 {(live > 32).mean()*100:.1f}%")


if __name__ == "__main__":
    main()
