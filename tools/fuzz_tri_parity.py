"""Randomized binned-vs-oracle parity fuzz for the tri renderer (CPU).

Sweeps random scene families -- plain soups, zero-area faces, offscreen
faces, near-plane (int32-wrap) vertices, mixed opacities incl. alpha==1,
odd image sizes, multi-view -- and compares the production binned path
against the dense oracle: forward images AND all five gradients. The
near-plane coverage-parity bug (fixed round 3, e649582) was found by
exactly this kind of sweep; run this after touching emission, attr
encoding, or either kernel.

Usage:
    PYTHONPATH= JAX_PLATFORMS=cpu python tools/fuzz_tri_parity.py \
        [n_configs] [start_seed]

Prints one line per config; exits nonzero listing any failures.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

os.environ.setdefault("DMRT_CHUNK", "8")  # fast CPU oracle compiles

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import scenes  # noqa: E402
from dmesh_renderer_tpu.ops.tri_binned import render_tri_binned  # noqa: E402
from dmesh_renderer_tpu.ops.tri_oracle import render_tri_oracle  # noqa: E402

FWD_ATOL = 3e-5
GRAD_RTOL = 2e-4
# Binned-vs-oracle disagreement beyond GRAD_RTOL is arbitrated against the
# f64 scalar spec (slow, so only on miss): extreme geometry (huge+offscreen
# stretched faces) gives BOTH f32 paths legitimate rounding of a few e-4,
# and seed=1022 showed the oracle itself further from truth (2.9e-4) than
# the binned path (1.1e-4). Fail only if the binned path is materially
# farther from the f64 truth than the oracle is.
SPEC_SLACK = 1.25


def make_config(seed):
    rng = np.random.RandomState(seed)
    # shapes come from a small bucket set so jit caches amortize across
    # configs (scene CONTENT varies freely; unique shapes would recompile
    # the Pallas interpret path per config)
    n_tris = int(rng.choice([16, 24]))
    b = int(rng.choice([1, 2]))
    h, w = [(48, 40), (47, 33), (64, 64)][int(rng.randint(3))]
    soup = scenes.random_triangle_soup(n_tris, seed=seed)
    mv, proj = scenes.ring_cameras(b, radius=float(rng.uniform(2.0, 4.0)))
    v = soup["verts"].copy()
    fo = soup["faces_opacity"].copy()
    fam = []

    if rng.rand() < 0.4:  # zero-area faces
        fam.append("zero-area")
        for i in range(min(4, n_tris)):
            f = soup["faces"][i]
            v[f[1]] = v[f[0]]
    if rng.rand() < 0.4:  # offscreen faces
        fam.append("offscreen")
        for i in range(min(3, n_tris)):
            v[soup["faces"][-1 - i][0]] += np.array([50.0, 50.0, 0.0])
    if rng.rand() < 0.35:  # near-plane / int32-wrap vertices
        fam.append("near-plane")
        inv = np.linalg.inv(mv[0])
        for i in range(min(4, n_tris)):
            zv = float(rng.uniform(-3e-4, 1e-3))
            pv = np.array([float(rng.uniform(-2, 2)),
                           float(rng.uniform(-2, 2)), zv, 1.0])
            v[soup["faces"][i][1]] = (inv @ pv)[:3]
    if rng.rand() < 0.4:  # saturating opacities (alpha==1 bg special case)
        fam.append("alpha1")
        fo[rng.randint(0, n_tris, size=max(1, n_tris // 4))] = 1.0
    if rng.rand() < 0.3:  # huge triangles spanning many tiles
        fam.append("huge")
        for i in range(min(2, n_tris)):
            f = soup["faces"][i]
            c = v[f].mean(axis=0)
            v[f] = c + (v[f] - c) * 8.0

    vdepth, fintense = scenes.soup_view_attrs(soup, b, seed=seed + 1)
    bg = rng.rand(3).astype(np.float32)
    mv_t = np.swapaxes(mv, 1, 2).copy()
    proj_t = np.swapaxes(proj, 1, 2).copy()
    args = tuple(map(jnp.asarray, (
        v, soup["faces"], soup["verts_color"], fo,
        mv_t, proj_t, np.linalg.inv(mv_t), np.linalg.inv(proj_t),
        vdepth, fintense, bg)))
    label = f"seed={seed} B={b} F={n_tris} {h}x{w} [{','.join(fam) or 'plain'}]"
    return args, h, w, label


def check_config(seed):
    args, h, w, label = make_config(seed)
    errs = []

    co, do_ = render_tri_oracle(*args, h, w)
    cb, db = render_tri_binned(*args, h, w)
    e_c = float(jnp.max(jnp.abs(cb - co)))
    e_d = float(jnp.max(jnp.abs(db - do_)))
    if e_c > FWD_ATOL or e_d > FWD_ATOL:
        # spec arbitration, same rule as grads: extreme near-plane
        # geometry gives BOTH f32 paths legitimate rounding of a few e-5;
        # fail only if the binned image is materially farther from the
        # f64 truth than the oracle is (r4: seeds 2003/2033 showed the
        # ORACLE 4-6x farther from the spec than the binned path)
        cs, ds = spec_forward(args, h, w)
        e_bo = max(np.abs(np.array(cb) - cs).max(),
                   np.abs(np.array(db) - ds).max())
        e_oo = max(np.abs(np.array(co) - cs).max(),
                   np.abs(np.array(do_) - ds).max())
        if e_bo > SPEC_SLACK * max(e_oo, FWD_ATOL / 2):
            errs.append(f"fwd color={e_c:.2e} depth={e_d:.2e} "
                        f"(spec: binned={e_bo:.2e} oracle={e_oo:.2e})")
        else:
            print(f"  [spec-arbitrated] fwd: binned-vs-oracle "
                  f"color={e_c:.2e} depth={e_d:.2e}; vs f64 spec "
                  f"binned={e_bo:.2e} oracle={e_oo:.2e}", flush=True)

    def loss(render):
        def f(verts, vcolor, fo, vdepth, fint):
            c, d = render(verts, args[1], vcolor, fo, *args[4:8],
                          vdepth, fint, args[10], h, w)
            t = jnp.cos(jnp.arange(c.size, dtype=jnp.float32)
                        ).reshape(c.shape)
            td = jnp.sin(jnp.arange(d.size, dtype=jnp.float32)
                         ).reshape(d.shape)
            return jnp.sum(c * t) + jnp.sum(d * td)
        return f

    diff = (args[0], args[2], args[3], args[8], args[9])
    g_o = jax.grad(loss(render_tri_oracle), argnums=tuple(range(5)))(*diff)
    g_b = jax.grad(loss(render_tri_binned), argnums=tuple(range(5)))(*diff)
    names = ["verts", "vcolor", "fopacity", "vdepth", "fintense"]
    spec_keys = {"verts": "verts", "vcolor": "verts_color",
                 "fopacity": "faces_opacity", "vdepth": "verts_depth",
                 "fintense": "faces_intense"}
    g_spec = None
    for a, bb, name in zip(g_o, g_b, names):
        a, bb = np.array(a, np.float64), np.array(bb, np.float64)
        scale = max(1.0, np.abs(a).max())
        err = np.abs(a - bb).max() / scale
        if err > GRAD_RTOL:
            if g_spec is None:
                g_spec = spec_grads(args, h, w)
            truth = np.asarray(g_spec[spec_keys[name]], np.float64)
            e_o = np.abs(a - truth).max() / scale
            e_b = np.abs(bb - truth).max() / scale
            if e_b > SPEC_SLACK * max(e_o, GRAD_RTOL / 2):
                errs.append(f"grad {name} rel={err:.2e} "
                            f"(spec: binned={e_b:.2e} oracle={e_o:.2e})")
            else:
                print(f"  [spec-arbitrated] grad {name}: "
                      f"binned-vs-oracle {err:.2e}; vs f64 spec "
                      f"binned={e_b:.2e} oracle={e_o:.2e}", flush=True)

    return label, errs


def spec_forward(args, h, w):
    """f64 ground-truth forward images from the scalar executable spec
    (same BIN_TILE grid note as spec_grads)."""
    import numpy_reference as spec

    from dmesh_renderer_tpu.utils.config import BIN_TILE

    v, faces, vcolor, fo = (np.asarray(a) for a in args[:4])
    mv_t, proj_t = np.asarray(args[4]), np.asarray(args[5])
    vdepth, fint, bg = (np.asarray(a) for a in args[8:11])
    c, d, _aux = spec.render_tri_np(
        v.astype(np.float64), faces, vcolor.astype(np.float64),
        fo.astype(np.float64), mv_t.astype(np.float64),
        proj_t.astype(np.float64), vdepth.astype(np.float64),
        fint.astype(np.float64), bg.astype(np.float64), h, w, tile=BIN_TILE)
    return np.asarray(c), np.asarray(d)


def spec_grads(args, h, w):
    """f64 ground-truth gradients from the scalar executable spec.

    tile=BIN_TILE: the rect restriction is the one tile-size-dependent
    semantic (wrapped near-plane coverage), and both production paths
    quantize rects at BIN_TILE -- the spec must arbitrate on the same grid.
    """
    import numpy_reference as spec

    from dmesh_renderer_tpu.utils.config import BIN_TILE

    v, faces, vcolor, fo = (np.asarray(a) for a in args[:4])
    mv_t, proj_t = np.asarray(args[4]), np.asarray(args[5])
    vdepth, fint, bg = (np.asarray(a) for a in args[8:11])
    b = mv_t.shape[0]
    tc = np.cos(np.arange(b * 3 * h * w, dtype=np.float32)
                ).reshape(b, 3, h, w)
    td = np.sin(np.arange(b * 1 * h * w, dtype=np.float32)
                ).reshape(b, 1, h, w)
    _, _, aux = spec.render_tri_np(v, faces, vcolor, fo, mv_t, proj_t,
                                   vdepth, fint, bg, h, w, tile=BIN_TILE)
    return spec.render_tri_np_backward(v, faces, vcolor, fo, mv_t, proj_t,
                                       vdepth, fint, bg, h, w, tc, td, aux)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
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
