"""Mid-size adversarial tet golden lock (companion to the tri one).

The tiny committed tet golden (tests/golden/tet_scene.npz, 120 faces) locks
the shared semantics; this scene stresses the regimes the fuzz sweeps
exercise out-of-suite at a size where the phased machinery sees real
connectivity: a jittered Freudenthal grid (~5k faces), JITTERED RAYS
(threefry per-global-view fields, seed > 0), a camera ring crossing INTO
the tessellation interior (entry-normal selection sees faces from both
sides), mixed opacities including alpha == 1 saturation (the log-space
termination, forward.cu:636-642), and near-transparent faces driving deep
walks.

Locks forward color/depth/active AND both gradients from the CPU path.
Regenerate intentionally with:
    PYTHONPATH= JAX_PLATFORMS=cpu python tests/test_golden_tet_adversarial.py --regen
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

from dmesh_renderer_tpu.ops.tet import render_tet_core
from dmesh_renderer_tpu.utils.connectivity import (
    build_tet_connectivity, freudenthal_grid,
)
import scenes

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "tet_adversarial.npz")
H, W, B = 48, 48, 2
SEED = 17  # jittered rays ON


def _scene():
    verts, tets = freudenthal_grid(6, jitter=0.14, seed=21)
    faces, face_tets, tet_faces = build_tet_connectivity(tets)
    rng = np.random.RandomState(33)
    vcolor = rng.rand(verts.shape[0], 3).astype(np.float32)
    fopacity = rng.uniform(0.05, 0.95, faces.shape[0]).astype(np.float32)
    fopacity[rng.randint(0, faces.shape[0], faces.shape[0] // 10)] = 1.0
    fopacity[rng.randint(0, faces.shape[0], faces.shape[0] // 10)] = 0.02
    fintense = rng.uniform(0.5, 1.0, (B, faces.shape[0])).astype(np.float32)
    # radius 1.1: inside the grid's bounding sphere -> interior starts
    mv, proj = scenes.ring_cameras(B, radius=1.1)
    mv_t = np.swapaxes(mv, 1, 2).copy()
    proj_t = np.swapaxes(proj, 1, 2).copy()
    bg = np.array([0.1, 0.2, 0.3], np.float32)
    return (verts, faces, vcolor, fopacity, mv_t, proj_t, fintense,
            tets, face_tets, tet_faces, bg)


def _render_and_grads():
    sc = _scene()
    (verts, faces, vcolor, fopacity, mv_t, proj_t, fintense,
     tets, face_tets, tet_faces, bg) = map(jnp.asarray, sc)
    rng = np.random.RandomState(5)
    wc = jnp.asarray(rng.randn(B, 3, H, W).astype(np.float32))
    wd = jnp.asarray(rng.randn(B, 1, H, W).astype(np.float32))

    def loss(vc, fo):
        c, d, act = render_tet_core(
            verts, faces, vc, fo, mv_t, proj_t,
            jnp.linalg.inv(mv_t), jnp.linalg.inv(proj_t), fintense,
            tets, face_tets, tet_faces, bg, H, W, SEED,
        )
        return jnp.sum(c * wc) + jnp.sum(d * wd), (c, d, act)

    # One jit over forward + grads (the remote-TPU bench gate reuses this
    # helper, where unjitted op-by-op dispatch would take minutes).
    @jax.jit
    def run():
        (_, cda), grads = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(vcolor, fopacity)
        return cda, grads

    (c, d, act), (g_vc, g_fo) = run()
    return {
        "color": np.array(c), "depth": np.array(d),
        "active": np.array(act),
        "g_vcolor": np.array(g_vc), "g_fopacity": np.array(g_fo),
    }


def test_tet_adversarial_golden():
    golden = dict(np.load(GOLDEN))
    got = _render_and_grads()
    # scene sanity: interior cameras + deep walks actually exercised
    assert golden["active"].mean() > 0.5
    np.testing.assert_array_equal(got["active"], golden["active"])
    for k in ("color", "depth", "g_vcolor", "g_fopacity"):
        scale = max(1.0, float(np.abs(golden[k]).max()))
        err = float(np.abs(got[k] - golden[k]).max()) / scale
        assert err <= 1e-6, f"tet drifted from golden on {k}: {err:.2e}"


if __name__ == "__main__":
    if "--regen" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        arrs = _render_and_grads()
        np.savez_compressed(GOLDEN, **arrs)
        print(f"regenerated {GOLDEN}:",
              {k: (v.shape, float(np.abs(v).max())) for k, v in arrs.items()})
    else:
        print(__doc__)
