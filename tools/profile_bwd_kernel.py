"""Split the tri backward Pallas kernel's cost: full vs heavy-path-stubbed.

Monkeypatches tri_binned._bwd_face_heavy before tracing to measure how
much of the ~31 ms kernel is the per-face gradient math vs the reverse
traversal + coverage + DMA skeleton.

Run on TPU: python tools/profile_bwd_kernel.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from bench import _build
    from dmesh_renderer_tpu.ops import tri_binned as tb

    n_tris, size, n_views = 100_000, 800, 1
    kcap = 1_408_000
    H = W = size
    (verts, faces, vcolor, fopacity, mv_t, proj_t, inv_mv_t, inv_proj_t,
     vdepth, fintense) = map(jnp.asarray, _build(n_tris, n_views, H, W))
    bg = jnp.asarray(np.array([0.1, 0.1, 0.1], np.float32))

    def run_full(tag):
        def f(vc, fo):
            c, d = tb.render_tri_binned(
                verts, faces, vc, fo, mv_t, proj_t, inv_mv_t, inv_proj_t,
                vdepth, fintense, bg, H, W, kcap)
            return jnp.sum(c) + jnp.sum(d)

        g = jax.jit(jax.grad(f, (0, 1)))
        r = g(vcolor, fopacity)
        jax.block_until_ready(r) if hasattr(jax, "block_until_ready") else None
        float(jnp.sum(r[0]))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            rr = g(vcolor, fopacity)
            float(jnp.sum(rr[0]))
            ts.append(time.perf_counter() - t0)
        print(f"{tag:>40}: {min(ts)*1000:8.1f} ms (fwd+bwd once)")
        return min(ts) * 1000

    t_full = run_full("full backward")

    # stub the heavy gradient path: state passthrough, no grec writes
    orig = tb._bwd_face_heavy

    def stub(st, fs, active, a, u, i0, i1, i2, code, mt, grec, j,
             dx, dy, dz, g_r, g_g, g_b, g_d, bg_dot, final_T, final_pT):
        return st

    tb._bwd_face_heavy = stub
    try:
        t_stub = run_full("heavy path stubbed")
    finally:
        tb._bwd_face_heavy = orig

    print(f"{'heavy-path delta':>40}: {t_full - t_stub:8.1f} ms")


def main_nored():
    """Ablation 2: keep all the heavy math but turn every full (8,128)
    block reduction (jnp.sum) inside the kernel into a [0,0] element pick,
    isolating the cost of the ~21 cross-lane reductions per face-visit."""
    import jax
    import jax.numpy as jnp

    from bench import _build
    from dmesh_renderer_tpu.ops import tri_binned as tb

    n_tris, size, n_views = 100_000, 800, 1
    kcap = 983_040
    H = W = size
    (verts, faces, vcolor, fopacity, mv_t, proj_t, inv_mv_t, inv_proj_t,
     vdepth, fintense) = map(jnp.asarray, _build(n_tris, n_views, H, W))
    bg = jnp.asarray(np.array([0.1, 0.1, 0.1], np.float32))

    import time as _t

    def run_full(tag):
        def f(vc, fo):
            c, d = tb.render_tri_binned(
                verts, faces, vc, fo, mv_t, proj_t, inv_mv_t, inv_proj_t,
                vdepth, fintense, bg, H, W, kcap)
            return jnp.sum(c) + jnp.sum(d)

        g = jax.jit(jax.grad(f, (0, 1)))
        r = g(vcolor, fopacity)
        float(jnp.sum(r[0]))
        ts = []
        for _ in range(3):
            t0 = _t.perf_counter()
            rr = g(vcolor, fopacity)
            float(jnp.sum(rr[0]))
            ts.append(_t.perf_counter() - t0)
        print(f"{tag:>40}: {min(ts)*1000:8.1f} ms (fwd+bwd once)",
              flush=True)
        return min(ts) * 1000

    t_full = run_full("full backward")

    real_jnp = tb.jnp

    class JnpNoRed:
        """Forwards everything to jnp except full 2-D sums -> [0,0] pick.

        Shape-preserving (scalar out either way), semantics-breaking --
        timing ablation only."""

        def __getattr__(self, k):
            return getattr(real_jnp, k)

        @staticmethod
        def sum(x, *a, **kw):
            if not a and not kw and getattr(x, "ndim", 0) == 2:
                return x[0, 0]
            return real_jnp.sum(x, *a, **kw)

    tb.jnp = JnpNoRed()
    try:
        t_nored = run_full("kernel reductions ablated")
    finally:
        tb.jnp = real_jnp
    print(f"{'reduction delta':>40}: {t_full - t_nored:8.1f} ms")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "nored":
        main_nored()
    else:
        main()
