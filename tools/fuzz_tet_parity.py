"""Randomized tet-renderer parity fuzz against the scalar NumPy spec (CPU).

Sweeps random tessellations (Freudenthal grids at varying jitter),
opacity profiles (incl. the alpha==1.0 termination special case and
near-zero opacities that force deep walks), camera radii (incl. cameras
inside the tessellation volume), and view counts; each config compares
the PRODUCTION march (render_tet_core: binned/dense first-hit + phased
lockstep march + log-replay backward) against tests/numpy_reference.py's
per-pixel transliteration of the CUDA semantics: color, depth, the
bit-exact active mask, and both gradients.

Usage:
    PYTHONPATH= JAX_PLATFORMS=cpu python tools/fuzz_tet_parity.py \
        [n_configs] [start_seed]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import scenes  # noqa: E402
from numpy_reference import render_tet_np, render_tet_np_backward  # noqa: E402
from dmesh_renderer_tpu.ops.tet import render_tet_core  # noqa: E402
from dmesh_renderer_tpu.utils.connectivity import (  # noqa: E402
    build_tet_connectivity, freudenthal_grid,
)

H, W = 24, 24
FWD_ATOL = 3e-5
GRAD_RTOL = 2e-4


def make_config(seed):
    rng = np.random.RandomState(seed)
    b = int(rng.choice([1, 2]))
    jitter = float(rng.uniform(0.0, 0.2))
    verts, tets = freudenthal_grid(2, jitter=jitter, seed=seed)
    faces, face_tets, tet_faces = build_tet_connectivity(tets)
    F = faces.shape[0]
    fam = []

    fopacity = rng.uniform(0.2, 0.95, F).astype(np.float32)
    if rng.rand() < 0.4:  # alpha==1 termination special case
        fam.append("alpha1")
        fopacity[rng.randint(0, F, size=max(1, F // 8))] = 1.0
    if rng.rand() < 0.35:  # translucent: deep walks to the step cap
        fam.append("deep")
        fopacity[:] = rng.uniform(0.01, 0.15, F).astype(np.float32)

    if rng.rand() < 0.3:
        fam.append("cam-inside")
        radius = float(rng.uniform(0.2, 0.7))
    else:
        radius = float(rng.uniform(2.0, 4.0))
    mv, proj = scenes.ring_cameras(b, radius=radius)

    vcolor = rng.rand(verts.shape[0], 3).astype(np.float32)
    fintense = rng.uniform(0.5, 1.0, (b, F)).astype(np.float32)
    mv_t = np.swapaxes(mv, 1, 2).copy()
    proj_t = np.swapaxes(proj, 1, 2).copy()
    bg = rng.rand(3).astype(np.float32)
    sc = (verts, faces, vcolor, fopacity, mv_t, proj_t, fintense,
          tets, face_tets, tet_faces, bg)
    label = (f"seed={seed} B={b} F={F} r={radius:.2f} j={jitter:.2f} "
             f"[{','.join(fam) or 'plain'}]")
    return sc, b, label


def check_config(seed):
    sc, b, label = make_config(seed)
    (verts, faces, vcolor, fopacity, mv_t, proj_t, fintense,
     tets, face_tets, tet_faces, bg) = sc
    errs = []

    rng = np.random.RandomState(seed + 7)
    wc = rng.randn(b, 3, H, W).astype(np.float32)
    wd = rng.randn(b, 1, H, W).astype(np.float32)

    a = tuple(map(jnp.asarray, (
        verts, faces, vcolor, fopacity, mv_t, proj_t,
        np.linalg.inv(mv_t), np.linalg.inv(proj_t), fintense,
        tets, face_tets, tet_faces, bg)))
    wcj, wdj = jnp.asarray(wc), jnp.asarray(wd)

    def loss(vc, fo):
        c, d, act = render_tet_core(
            a[0], a[1], vc, fo, a[4], a[5], a[6], a[7], a[8],
            a[9], a[10], a[11], a[12], H, W, 0,
        )
        return jnp.sum(c * wcj) + jnp.sum(d * wdj), (c, d, act)

    (_, (c_j, d_j, act_j)), (g_vc_j, g_fo_j) = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(a[2], a[3])

    c_n, d_n, act_n, aux = render_tet_np(
        verts, faces, vcolor, fopacity, mv_t, proj_t, fintense,
        tets, face_tets, tet_faces, bg, H, W,
    )
    if not np.array_equal(np.array(act_j), act_n):
        errs.append(f"active mask differs "
                    f"({int(np.sum(np.array(act_j) != act_n))} px)")
    e_c = float(np.abs(np.array(c_j) - c_n).max())
    # depth is the re-projected NDC z of the 3D hit point: UNBOUNDED for
    # camera-inside rays (observed -20s), so compare scale-aware -- the
    # f64 scalar spec vs the f32 kernels differ by f32 rounding ~1e-5 rel
    # (the CUDA reference computes in f32 too)
    d_jn = np.array(d_j)
    e_d = float((np.abs(d_jn - d_n)
                 / np.maximum(1.0, np.abs(np.asarray(d_n)))).max())
    if e_c > FWD_ATOL or e_d > 1e-4:
        errs.append(f"fwd color={e_c:.2e} depth_rel={e_d:.2e}")

    g = render_tet_np_backward(
        verts, faces, vcolor, fopacity, mv_t, proj_t, fintense,
        tets, face_tets, tet_faces, bg, H, W, wc, wd, aux,
    )
    g_vc_n, g_fo_n = g["verts_color"], g["faces_opacity"]
    for g_j, g_n, name in ((g_vc_j, g_vc_n, "vcolor"),
                           (g_fo_j, g_fo_n, "fopacity")):
        g_j, g_n = np.array(g_j, np.float64), np.asarray(g_n, np.float64)
        scale = max(1.0, np.abs(g_n).max())
        err = np.abs(g_j - g_n).max() / scale
        if err > GRAD_RTOL:
            errs.append(f"grad {name} rel={err:.2e}")

    return label, errs


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    failures = []
    for seed in range(start, start + n):
        label, errs = check_config(seed)
        status = "FAIL " + "; ".join(errs) if errs else "ok"
        print(f"{label}: {status}", flush=True)
        if errs:
            failures.append((label, errs))
    print(f"\n{n - len(failures)}/{n} configs clean")
    if failures:
        for label, errs in failures:
            print(f"FAIL {label}: {'; '.join(errs)}")
        sys.exit(1)


if __name__ == "__main__":
    main()
