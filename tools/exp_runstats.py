"""Adjacent-ray run-length stats of the march, straight from the forward's
march log (one compile): how long are runs of adjacent rays crossing the
SAME face / living in the same tet at each step? Decides the record
merge+compaction design for the replay backward.

Run: python tools/exp_runstats.py
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
        return saved["march_segs"][0]["log"], saved["n_contrib"]

    log, nc = jax.device_get(fwd(args[3]))
    # log [D, G, NLOG, 128]: ray r = g*128 + lane
    D, G = log.shape[0], log.shape[1]
    nc = nc.ravel()
    print(f"log depth {D}, rays {G*128}")

    tot_alive = 0
    tot_runs = 0
    for s in range(D):
        cf = log[s, :, tet_mod._L_CF, :].reshape(-1)
        alive = cf >= 0
        na = int(alive.sum())
        if na == 0:
            break
        start = alive.copy()
        start[1:] &= (~alive[:-1]) | (cf[1:] != cf[:-1])
        nr = int(start.sum())
        tot_alive += na
        tot_runs += nr
        if s in (0, 1, 2, 4, 6, 8, 10, 12, 14, 16):
            print(f"step {s:3d}: alive={na:7d} runs={nr:7d} "
                  f"mean-run={na/max(nr,1):6.1f}")
    print(f"TOTAL: events={tot_alive} runs={tot_runs} "
          f"overall mean-run={tot_alive/max(tot_runs,1):.1f}")


if __name__ == "__main__":
    main()
