"""Run counts at 128 / 256 / 512-lane extraction spans.

The replay's survivor scatter rows = spans x budget; doubling the span
merges runs that continue across block boundaries (adjacent ray groups are
spatially adjacent pixels), so rows shrink if runs/span grows sublinearly.
This measures the real-log distribution and estimates scatter rows for
candidate (span, pass-1 budget) pairs, priced at the measured ~20 ns/row
(tools/exp_absorber.py: no collision tax, width-10 row cost is flat).

Run on the TPU: python tools/exp_runstats256.py
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

    for span in (128, 256, 512):
        per_step = []
        for s in range(D):
            cf = log[s, :, tet_mod._L_CF, :]  # [G, 128]
            ks = np.where(cf >= 0, cf, F).reshape(-1, span)
            valid = ks < F
            chg = np.concatenate(
                [np.ones((ks.shape[0], 1), bool),
                 ks[:, 1:] != ks[:, :-1]], axis=1)
            nrb = np.cumsum((chg & valid).astype(np.int32), axis=1)[:, -1]
            per_step.append(nrb)
        a = np.concatenate(per_step)
        live = a[a > 0]
        spans_per_batch = 6 * (G * 128 // span)
        print(f"span {span}: live spans/step-stack {live.size} "
              f"mean {live.mean():5.1f} p90 {np.percentile(live, 90):4.0f} "
              f"p99 {np.percentile(live, 99):4.0f} p100 {live.max():4d}")
        for bk1 in (12, 16, 20, 24, 28, 32, 40):
            ovf = (live > bk1).mean() * 100
            rows = spans_per_batch * bk1
            print(f"    bk1={bk1:3d}: scatter rows/batch {rows:7d} "
                  f"(~{rows * 20e-6:5.2f} ms) overflow blocks {ovf:5.1f}%")


if __name__ == "__main__":
    main()
