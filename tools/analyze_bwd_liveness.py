"""Quantify the 'fewer visits' lever for the tri backward kernel.

The backward walks each tile's slot list from the slab of the tile's max
n_contrib down to slab 0 and pays a coverage test per face-visit even when
no pixel blended that face (the per-face skip happens after the test). If
the FORWARD recorded per-slab liveness ("any pixel blended any slot of this
slab") the backward could skip whole dead slabs: one SMEM bit test instead
of 32 face-visits of VPU coverage math.

This tool decides whether that kernel surgery is worth doing BEFORE any
hardware time is spent: it rebuilds the bench scene's aligned slot table
(the real production binning), then replays the exact forward blend
semantics per tile in plain XLA (int32-exact in_tri from ops/geometry, the
same T < T_EPS early-out) and reports

  - the tail already skipped today (slabs past the last contributor),
  - the fraction of DEAD slabs within the walked range (the new win),
  - the dead-SLOT fraction (upper bound if skipping were per-face).

Run (CPU is fine; pure XLA, no Pallas):
    PYTHONPATH= JAX_PLATFORMS=cpu python tools/analyze_bwd_liveness.py \
        [n_tris] [img_px]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    if jax.default_backend() not in ("tpu",):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax

    from bench import _build
    from dmesh_renderer_tpu.ops import tri_binned as tb
    from dmesh_renderer_tpu.ops.binning import recommended_key_capacity
    from dmesh_renderer_tpu.ops.geometry import in_tri, project_verts
    from dmesh_renderer_tpu.utils.config import T_EPS

    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    hw = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    H = W = hw
    B = 1

    (verts, faces, vcolor, fopacity, mv_t, proj_t, inv_mv_t, inv_proj_t,
     vdepth, fintense) = _build(n_tris, B, H, W)
    kcap = recommended_key_capacity(verts, faces, mv_t, proj_t, H, W,
                                    margin=1.03125, bucket=8192)

    keys, _attr, _rayd, _pix, (Bc, gx, gy, cap) = jax.jit(
        tb._binned_prepare, static_argnums=(10, 11, 12)
    )(*map(jnp.asarray, (verts, faces, vcolor, fopacity, mv_t, proj_t,
                         inv_mv_t, inv_proj_t, vdepth, fintense)),
      H, W, kcap)

    F = faces.shape[0]
    n_tiles = Bc * gx * gy
    starts = np.asarray(keys.starts)
    ends = np.asarray(keys.ends)
    counts = ends - starts
    max_slots = int(counts.max())
    print(f"scene: {n_tris} tris @{H}x{W}, kcap={kcap}, cap={cap}, "
          f"tiles={n_tiles}, total pairs={int(keys.total)}, "
          f"slots/tile p50={int(np.median(counts))} max={max_slots}")

    # slot -> original (view*F + face): flat holds sorted-space ids
    orig = np.asarray(keys.sigma)[np.asarray(keys.flat)]  # [cap]

    ndc, img = project_verts(jnp.asarray(verts), jnp.asarray(mv_t),
                             jnp.asarray(proj_t), W, H)
    img = np.asarray(img)  # [B, P, 2]
    fop = np.asarray(fopacity)

    # per-slot face corner image coords + alpha, padded per tile
    # layout: [NT, max_slots, ...] gathered on the host once (analysis tool)
    slot_idx = starts[:, None] + np.arange(max_slots)[None, :]  # [NT, S]
    in_rng = np.arange(max_slots)[None, :] < counts[:, None]
    slot_idx = np.where(in_rng, slot_idx, 0)
    so = orig[slot_idx]                      # [NT, S]
    sb, sf = so // F, so % F
    tri_img = img[sb[..., None], np.asarray(faces)[sf], :]  # [NT,S,3,2]
    alpha = np.where(in_rng, fop[sf], 0.0).astype(np.float32)

    # tile pixel centers
    t = np.arange(n_tiles)
    ty = (t % (gx * gy)) // gx
    tx = t % gx
    px = (tx[:, None] * tb.TILE + np.arange(tb.TILE)[None, :])  # [NT, 32]
    py = (ty[:, None] * tb.TILE + np.arange(tb.TILE)[None, :])
    pcx = np.broadcast_to(px[:, None, :], (n_tiles, tb.TILE, tb.TILE))
    pcy = np.broadcast_to(py[:, :, None], (n_tiles, tb.TILE, tb.TILE))
    pix = np.stack([pcx + 0.5, pcy + 0.5], axis=-1).reshape(
        n_tiles, tb.TILE * tb.TILE, 2).astype(np.float32)  # [NT, 1024, 2]

    tri_img_j = jnp.asarray(tri_img)
    alpha_j = jnp.asarray(alpha)
    inrng_j = jnp.asarray(in_rng)
    pix_j = jnp.asarray(pix)

    @jax.jit
    def replay():
        def step(carry, xs):
            T = carry  # [NT, 1024]
            tri3, a, ir = xs  # [NT,3,2], [NT], [NT]
            cov = in_tri(pix_j, tri3[:, None, 0], tri3[:, None, 1],
                         tri3[:, None, 2])  # [NT, 1024]
            blend = cov & (T >= T_EPS) & ir[:, None]
            live = jnp.any(blend, axis=1)  # [NT]
            nblend = jnp.sum(blend, axis=1)
            T = jnp.where(blend, T * (1.0 - a[:, None]), T)
            return T, (live, nblend)

        T0 = jnp.ones((n_tiles, tb.TILE * tb.TILE), jnp.float32)
        _, (live, nblend) = lax.scan(
            step, T0,
            (jnp.swapaxes(tri_img_j, 0, 1), alpha_j.T, inrng_j.T))
        return live.T, nblend.T  # [NT, S]

    t0 = time.time()
    live, nblend = map(np.asarray, replay())
    print(f"replay done in {time.time() - t0:.1f}s")

    S = tb.SLAB
    nsl = (max_slots + S - 1) // S
    pad = nsl * S - max_slots
    livep = np.pad(live, ((0, 0), (0, pad)))
    slab_live = livep.reshape(n_tiles, nsl, S).any(axis=2)  # [NT, nsl]

    # last live slab per tile == where the backward starts today
    any_live = slab_live.any(axis=1)
    last = np.where(any_live, nsl - 1 - np.argmax(slab_live[:, ::-1], axis=1),
                    -1)
    total_slabs = (counts + S - 1) // S
    walked = np.minimum(last + 1, total_slabs)          # slabs bwd walks
    tail_skipped = total_slabs - walked                 # already skipped
    in_range = np.arange(nsl)[None, :] < walked[:, None]
    dead_in_range = (in_range & ~slab_live).sum()
    walked_total = int(in_range.sum())

    # slot-granular stats inside the walked range
    slot_in_range = (np.arange(max_slots)[None, :]
                     < (walked[:, None] * S)) & np.asarray(in_rng)
    dead_slots = int((slot_in_range & ~live).sum())
    slots_walked = int(slot_in_range.sum())

    print(f"slabs: total {int(total_slabs.sum())}, tail already skipped "
          f"{int(tail_skipped.sum())} ({tail_skipped.sum() / max(1, total_slabs.sum()):.1%})")
    print(f"walked slabs: {walked_total}; DEAD in range: {int(dead_in_range)} "
          f"({dead_in_range / max(1, walked_total):.1%})  <-- slab-skip win")
    print(f"walked slots: {slots_walked}; dead: {dead_slots} "
          f"({dead_slots / max(1, slots_walked):.1%})  <-- per-face upper bound")
    print(f"blend events: {int(nblend.sum())} "
          f"(mean {nblend.sum() / max(1, n_tiles * 1024):.1f}/pixel)")


if __name__ == "__main__":
    main()
