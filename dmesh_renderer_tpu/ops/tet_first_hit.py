"""Tile-binned first-hit search for the tet renderer (Pallas TPU kernel).

TPU re-design of firstIntersectCUDA (cuda_renderer/forward.cu:298-445): per
32x32-pixel tile, walk the tile's face list sorted by per-face *min* depth
(renderer_impl.cu:318-329) and keep the strictly-smallest ray parameter t
among strict Moller-Trumbore hits, with the reference's depth-window
early-out: once a hit exists and the next face's min depth exceeds the
current best hit's max depth, the scan stops (forward.cu:388-391).

Shares the binning pipeline and SMEM attribute-slab machinery with the tri
renderer (see tri_binned.py); the subsequent connectivity ray march stays in
XLA (ops/tet.py) -- it is bounded by walk length, not face count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import (
    align_to_slabs, aligned_capacity, emit_and_sort, overflow_warning,
)
from .tri_binned import (
    NA,
    PLANE,
    PSUB,
    SLAB,
    TILE,
    _build_face_table,
    _build_slot_attrs,
    _interpret,
    _tileify,
    _untile,
    _FID,
    _E1,
    _E2,
    _MAXD,
    _MIND,
    _QV,
    _TV,
)

Array = jax.Array

_BIG = 3.0e38


def _fh_kernel(starts_ref, ends_ref, attr_hbm, rayd_ref,
               out_ref, fslab, semf):
    t_idx = pl.program_id(0)
    start = starts_ref[t_idx]
    end = ends_ref[t_idx]
    n = end - start

    dx = rayd_ref[0, 0]
    dy = rayd_ref[0, 1]
    dz = rayd_ref[0, 2]
    shape = dx.shape

    # Derive the zero from loaded data: splat-constant loop-carry inits make
    # Mosaic's layout inference pick a replicated layout for the loop block
    # argument, which the (computed) loop-back value cannot relayout into.
    zero = dx * 0.0
    init = (
        jnp.int32(0),
        zero,                                 # done (f32 mask)
        zero + _BIG,                          # best t
        zero,                                 # best hit's max depth
        zero - 1.0,                           # first face (float; ids < 2^24)
        zero,                                 # u at hit
        zero,                                 # v at hit
    )
    n_slabs = pl.cdiv(n, SLAB)

    def cond(c):
        s, done = c[0], c[1]
        return (s < n_slabs) & jnp.logical_not(jnp.all(done > 0.5))

    def body(c):
        s, done, bt, bmax, bface, bu, bv = c
        s0 = pl.multiple_of(start + s * SLAB, SLAB)
        cf = pltpu.make_async_copy(
            attr_hbm.at[pl.ds(s0, SLAB), :], fslab, semf)
        cf.start()
        cf.wait()

        rem = jnp.minimum(n - s * SLAB, SLAB)

        def face_body(j, st):
            done, bt, bmax, bface, bu, bv = st
            tvx, tvy, tvz = (fslab[j, _TV + k] for k in range(3))
            e1x, e1y, e1z = (fslab[j, _E1 + k] for k in range(3))
            e2x, e2y, e2z = (fslab[j, _E2 + k] for k in range(3))
            qx, qy, qz = (fslab[j, _QV + k] for k in range(3))
            min_d = fslab[j, _MIND]
            max_d = fslab[j, _MAXD]
            fid = fslab[j, _FID]  # stored as an exact float (ids < 2^24)

            # depth-window early-out (forward.cu:388-391)
            done = jnp.where((bt < _BIG) & (min_d > bmax),
                             jnp.ones_like(done), done)

            # strict Moller-Trumbore (cuda_renderer/auxiliary.h:270-295);
            # no 2D coverage test here -- list membership (culling) plus the
            # strict hit decide, like the reference.
            Px = dy * e2z - dz * e2y
            Py = dz * e2x - dx * e2z
            Pz = dx * e2y - dy * e2x
            denom = Px * e1x + Py * e1y + Pz * e1z
            nd = denom != 0.0
            inv = 1.0 / jnp.where(nd, denom, 1.0)
            tt = (qx * e2x + qy * e2y + qz * e2z) * inv
            u = (Px * tvx + Py * tvy + Pz * tvz) * inv
            v = (qx * dx + qy * dy + qz * dz) * inv
            hit = (nd & (tt >= 0.0) & (u >= 0.0) & (v >= 0.0)
                   & (u + v <= 1.0))

            better = hit & (done < 0.5) & (tt < bt)
            bt = jnp.where(better, tt, bt)
            bmax = jnp.where(better, max_d, bmax)
            bface = jnp.where(better, fid, bface)
            bu = jnp.where(better, u, bu)
            bv = jnp.where(better, v, bv)
            return (done, bt, bmax, bface, bu, bv)

        st = (done, bt, bmax, bface, bu, bv)
        st = lax.fori_loop(0, rem, face_body, st)
        done, bt, bmax, bface, bu, bv = st
        return (s + 1, done, bt, bmax, bface, bu, bv)

    c = lax.while_loop(cond, body, init)
    s_f, _done, bt, _bmax, bface, bu, bv = c
    out_ref[0, 0] = bface
    out_ref[0, 1] = jnp.where(bt < _BIG, bt, 0.0)
    out_ref[0, 2] = bu
    out_ref[0, 3] = bv
    # slots actually walked by this tile (slab-granular): the depth-window
    # early-out typically stops the scan well short of the tile's list, so
    # capacity-scale counts overstate the kernel's work -- this plane feeds
    # per-tile diagnostics and the bench roofline's visit count
    out_ref[0, 4] = zero + (s_f * SLAB).astype(jnp.float32)


def _run_fh_kernel(starts, ends, attr_tab, rayd_t, n_tiles):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 3, PSUB, PLANE), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 5, PSUB, PLANE), lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((SLAB, NA), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _fh_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 5, PSUB, PLANE), jnp.float32),
        interpret=_interpret(),
    )(starts, ends, attr_tab, rayd_t)


def first_intersection_binned(verts, faces, pre, img, cam_o, ray_d,
                              height, width, B, kcap):
    """Tile-binned first hit. ray_d: [B, H, W, 3] (jitter included).

    Returns (first_face [B, N] int32 (-1 miss), t, u, v [B, N],
    (overflow bool[], num_rendered int32[], walked_slots int32[])). The
    aux triple surfaces the static key-capacity overflow AS DATA: a
    dropped (face, tile) pair makes that face unhittable in the dropped
    tile, silently corrupting the march start, and the axon backend cannot
    emit the debug warning (binning.overflow_warning), so callers must
    observe the flag. ``walked_slots`` is the total slot count the kernel
    actually scanned before the depth-window early-outs (slab-granular,
    summed over tiles) -- a per-scene work diagnostic and the bench
    roofline's honest kernel-visit count.
    """
    gx = (width + TILE - 1) // TILE
    gy = (height + TILE - 1) // TILE
    n_tiles = B * gx * gy
    cap = aligned_capacity(kcap, n_tiles, SLAB)

    # bbox emission: tet faces are near-isotropic tessellation cells --
    # exact-coverage culling removes <1% of pairs here (measured 322k ->
    # 321k at the 98k-face bench) and its run-table fills would be pure
    # overhead, unlike the tri path's elongated splats (1.6x cull)
    raw = emit_and_sort(pre, gx, gy, kcap, sort_by="min_depth")
    overflow_warning(raw.overflow, raw.total, kcap,
                     "tet first hit; a dropped face cannot be hit")
    keys = align_to_slabs(raw, n_tiles, SLAB, cap)

    F = faces.shape[0]
    P = verts.shape[0]
    face_tab = _build_face_table(
        verts, faces, jnp.zeros((P, 3), jnp.float32),
        jnp.zeros((F,), jnp.float32), jnp.zeros((B, P), jnp.float32),
        jnp.zeros((B, F), jnp.float32), img, cam_o,
        min_depth=pre["min_depth"], max_depth=pre["max_depth"],
    )
    attr_tab = _build_slot_attrs(face_tab, keys)

    rayd_t = _tileify(ray_d, B, height, width, gx, gy)
    out = _run_fh_kernel(keys.starts, keys.ends, attr_tab, rayd_t,
                         n_tiles)
    # walked plane: one scalar per tile, broadcast across the (8,128) block
    walked = jnp.sum(out[:, 4, 0, 0]).astype(jnp.int32)
    res = _untile(out[:, :4], B, height, width, gx, gy)  # [B, H, W, 4]
    N = height * width
    res = res.reshape(B, N, 4)
    first_face = res[..., 0].astype(jnp.int32)
    return (first_face, res[..., 1], res[..., 2], res[..., 3],
            (raw.overflow, raw.total, walked))
