"""Mid-size adversarial golden lock (VERDICT r3 weak #5).

The fuzz harnesses (tools/fuzz_tri_parity.py) sweep adversarial scene
families out-of-suite; this test distills ONE mid-size scene mixing every
family that has historically broken parity -- near-plane / int32-wrap
vertices (the round-3 coverage bug, e649582), alpha == 1 saturation (the
backward's division special case, backward.cu:293-308), offscreen + huge
multi-tile faces (emission interval cull), and zero-area faces -- and locks
it as a committed golden:

- the ORACLE forward + all five gradients must reproduce the golden arrays
  to float noise (drift detector for the shared geometry/blend semantics);
- the BINNED production path must match the oracle at the fuzz tolerances
  (drift detector for emission/sort/kernel parity).

Regenerate intentionally with:
    PYTHONPATH= JAX_PLATFORMS=cpu python tests/test_golden_adversarial.py --regen
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

from dmesh_renderer_tpu.ops.tri_oracle import render_tri_oracle
from dmesh_renderer_tpu.ops.tri_binned import render_tri_binned
import scenes

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "tri_adversarial.npz")
H, W, B, N_TRIS = 64, 64, 1, 4800

FWD_ATOL = 3e-5   # binned-vs-oracle forward (fuzz harness tolerance)
GRAD_RTOL = 2e-4  # binned-vs-oracle grads (fuzz harness tolerance)


def _scene_args():
    """Deterministic adversarial soup: all fuzz families in one scene."""
    rng = np.random.RandomState(20260819)
    soup = scenes.random_triangle_soup(N_TRIS, seed=20260819)
    mv, proj = scenes.ring_cameras(B, radius=2.6)
    v = soup["verts"].copy()
    fo = soup["faces_opacity"].copy()

    # zero-area faces (degenerate coverage)
    for i in range(0, 64):
        f = soup["faces"][i]
        v[f[1]] = v[f[0]]
    # offscreen faces (culling)
    for i in range(64, 128):
        v[soup["faces"][i][0]] += np.array([50.0, 50.0, 0.0])
    # near-plane / int32-wrap vertices (the round-3 coverage-parity bug)
    inv = np.linalg.inv(mv[0])
    for i in range(128, 192):
        zv = float(rng.uniform(-3e-4, 1e-3))
        pv = np.array([float(rng.uniform(-2, 2)),
                       float(rng.uniform(-2, 2)), zv, 1.0])
        v[soup["faces"][i][1]] = (inv @ pv)[:3]
    # alpha == 1 saturation (backward division special case)
    fo[rng.randint(0, N_TRIS, size=N_TRIS // 4)] = 1.0
    # huge faces spanning many tiles (slab streaming, emission intervals)
    for i in range(192, 208):
        f = soup["faces"][i]
        c = v[f].mean(axis=0)
        v[f] = c + (v[f] - c) * 8.0

    vdepth, fintense = scenes.soup_view_attrs(soup, B, seed=7)
    mv_t = np.swapaxes(mv, 1, 2).copy()
    proj_t = np.swapaxes(proj, 1, 2).copy()
    return tuple(map(jnp.asarray, (
        v, soup["faces"], soup["verts_color"], fo,
        mv_t, proj_t, np.linalg.inv(mv_t), np.linalg.inv(proj_t),
        vdepth, fintense, np.array([0.15, 0.3, 0.45], np.float32))))


def _fwd_and_grads(render, args):
    # One jit over forward + grads: the remote-TPU bench gate reuses this
    # helper, where unjitted op-by-op dispatch would take minutes.
    @jax.jit
    def run():
        color, depth = render(*args, H, W)

        def loss(verts, vcolor, fop, vdepth, fint):
            c, d = render(verts, args[1], vcolor, fop, *args[4:8],
                          vdepth, fint, args[10], H, W)
            t = jnp.cos(jnp.arange(c.size,
                                   dtype=jnp.float32)).reshape(c.shape)
            td = jnp.sin(jnp.arange(d.size,
                                    dtype=jnp.float32)).reshape(d.shape)
            return jnp.sum(c * t) + jnp.sum(d * td)

        grads = jax.grad(loss, argnums=tuple(range(5)))(
            args[0], args[2], args[3], args[8], args[9])
        return (color, depth) + grads

    out_arrs = run()
    names = ("color", "depth", "g_verts", "g_vcolor", "g_fopacity",
             "g_vdepth", "g_fintense")
    return {n: np.array(a) for n, a in zip(names, out_arrs)}


def test_adversarial_golden():
    args = _scene_args()
    golden = dict(np.load(GOLDEN))

    oracle = _fwd_and_grads(render_tri_oracle, args)
    for k, gold in golden.items():
        scale = max(1.0, float(np.abs(gold).max()))
        err = float(np.abs(oracle[k] - gold).max()) / scale
        assert err <= 1e-6, f"oracle drifted from golden on {k}: {err:.2e}"

    binned = _fwd_and_grads(render_tri_binned, args)
    for k in ("color", "depth"):
        err = float(np.abs(binned[k] - golden[k]).max())
        assert err <= FWD_ATOL, f"binned fwd {k} err {err:.2e}"
    for k in ("g_verts", "g_vcolor", "g_fopacity", "g_vdepth", "g_fintense"):
        scale = max(1.0, float(np.abs(golden[k]).max()))
        err = float(np.abs(binned[k] - golden[k]).max()) / scale
        assert err <= GRAD_RTOL, f"binned grad {k} rel err {err:.2e}"


if __name__ == "__main__":
    if "--regen" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        arrs = _fwd_and_grads(render_tri_oracle, _scene_args())
        np.savez_compressed(GOLDEN, **arrs)
        print(f"regenerated {GOLDEN}:",
              {k: v.shape for k, v in arrs.items()})
    else:
        print(__doc__)
