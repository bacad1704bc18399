"""Tet renderer: ray-marching through a tetrahedral tessellation (pure JAX).

Renders the triangle faces of a tet tessellation with *exact* depth ordering
by walking the ray through tet connectivity, like the reference
cuda_renderer/ (forward.cu:485-815, backward.cu:86-487). Gradients are
produced only for vertex colors and face opacities
(dmesh_renderer/__init__.py:447, render.h:84-111).

TPU design notes (vs. the CUDA original):
  * The per-pixel ``while(!done)`` march (data-dependent trip count) becomes
    one *vectorized* ``lax.while_loop`` over all pixels in lockstep with a
    hard step cap; per-pixel completion is a ``done`` mask. The loop exits
    when every pixel is done, so wall-clock follows the longest walk in the
    batch -- same as a CUDA warp's divergence cost at tile granularity.
  * The tile-binned first-hit search (firstIntersectCUDA, forward.cu:298-445,
    with its min-depth early-out) becomes a chunked min-reduction over all
    candidate faces in min-depth sorted order: argmin over ray parameter t
    with first-in-sorted-order tie-breaking. Same result, no per-pixel
    data-dependent list walk.
  * Gradient scatter (atomicAdd, backward.cu:353-360) becomes deterministic
    ``.at[].add`` scatter-adds.
  * The walk's invariant-violation semantics are preserved exactly: pixels
    whose walk breaks (cnt != 3 / entry normal not opposing / next_face_cnt
    != 1) become *inactive* and render pure background with active=0
    (forward.cu:667-759, :798-814).

The ``active`` mask contract: True only for pixels whose march terminated
validly (transmittance exhausted or exited the tessellation). Rays that miss
the tessellation entirely are inactive (forward.cu:557-558 leaves
this_is_active false).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..utils.config import DEFAULT_MAX_MARCH_STEPS, T_EPS, TILE_X, TILE_Y
from .geometry import (
    clamp_w,
    preprocess_faces,
    project_verts,
    ray_tri_intersection,
    strict_hit,
    transform_point43,
    transform_point44,
)
from .rays import generate_rays

Array = jax.Array

# Chunk of faces processed per first-hit scan step (VPU-friendly width).
FIRST_HIT_CHUNK = 128

# Above this face count the tile-binned Pallas first-hit kernel is used
# instead of the dense chunked min-reduction.
BINNED_FIRST_HIT_THRESHOLD = 2048


# =============================================================================
# First-hit search
# =============================================================================

def _first_intersection(verts, faces, valid, order, ray_o, ray_d):
    """First (smallest ray parameter t) strict hit per pixel.

    verts [P,3]; faces [F,3]; valid [B,F]; order [B,F] (min-depth sorted);
    ray_o/ray_d [B,N,3]. Returns (first_face [B,N] int32 (-1 = miss),
    t/u/v of the hit [B,N]).

    Reference: firstIntersectCUDA (cuda_renderer/forward.cu:298-445). The
    reference walks the sorted tile list with a depth-window early-out and
    keeps the strictly-smallest t (ties: first in sorted order wins,
    forward.cu:410). A full min-reduction in sorted order reproduces that.
    """
    B, F = order.shape
    N = ray_o.shape[1]

    pad = (-F) % FIRST_HIT_CHUNK
    order_p = jnp.pad(order, ((0, 0), (0, pad)))
    pos_p = jnp.pad(
        jnp.broadcast_to(jnp.arange(F, dtype=jnp.int32)[None], (B, F)),
        ((0, 0), (0, pad)), constant_values=jnp.int32(2**30),
    )
    valid_s = jnp.take_along_axis(valid, order, axis=1)
    valid_p = jnp.pad(valid_s, ((0, 0), (0, pad)))

    n_chunks = order_p.shape[1] // FIRST_HIT_CHUNK
    order_c = order_p.reshape(B, n_chunks, FIRST_HIT_CHUNK).swapaxes(0, 1)
    pos_c = pos_p.reshape(B, n_chunks, FIRST_HIT_CHUNK).swapaxes(0, 1)
    valid_c = valid_p.reshape(B, n_chunks, FIRST_HIT_CHUNK).swapaxes(0, 1)

    big = jnp.float32(np.inf)

    def step(carry, xs):
        best_t, best_pos, best_face, best_u, best_v = carry
        fids, pos, vmask = xs  # [B, C]
        fv = faces[fids]  # [B, C, 3]
        p = verts[fv]  # [B, C, 3, 3]
        tuv, nd = ray_tri_intersection(
            ray_o[:, :, None, :], ray_d[:, :, None, :],
            p[:, None, :, 0], p[:, None, :, 1], p[:, None, :, 2],
        )  # [B, N, C, 3]
        hit = strict_hit(tuv, nd) & vmask[:, None, :]
        # lexicographic argmin over the chunk axis on (t, sorted position):
        # smallest t wins; exact ties go to the first face in min-depth
        # sorted order (forward.cu:410 uses strict <).
        key_t = jnp.where(hit, tuv[..., 0], big)
        key_pos = jnp.where(hit, pos[:, None, :], jnp.int32(2**30))
        min_t = jnp.min(key_t, axis=-1, keepdims=True)
        is_min = key_t <= min_t
        pos_masked = jnp.where(is_min, key_pos, jnp.int32(2**30))
        cand = jnp.argmin(pos_masked, axis=-1)  # [B, N]

        c_t = jnp.take_along_axis(key_t, cand[..., None], axis=-1)[..., 0]
        c_pos = jnp.take_along_axis(key_pos, cand[..., None], axis=-1)[..., 0]
        c_face = jnp.take_along_axis(
            jnp.broadcast_to(fids[:, None, :], key_t.shape).astype(jnp.int32),
            cand[..., None], axis=-1)[..., 0]
        c_u = jnp.take_along_axis(tuv[..., 1], cand[..., None], axis=-1)[..., 0]
        c_v = jnp.take_along_axis(tuv[..., 2], cand[..., None], axis=-1)[..., 0]

        better = (c_t < best_t) | ((c_t == best_t) & (c_pos < best_pos))
        best_t = jnp.where(better, c_t, best_t)
        best_pos = jnp.where(better, c_pos, best_pos)
        best_face = jnp.where(better, c_face, best_face)
        best_u = jnp.where(better, c_u, best_u)
        best_v = jnp.where(better, c_v, best_v)
        return (best_t, best_pos, best_face, best_u, best_v), None

    init = (
        jnp.full((B, N), big),
        jnp.full((B, N), jnp.int32(2**30)),
        jnp.full((B, N), jnp.int32(-1)),
        jnp.zeros((B, N), jnp.float32),
        jnp.zeros((B, N), jnp.float32),
    )
    (best_t, _pos, best_face, best_u, best_v), _ = lax.scan(
        step, init, (order_c, pos_c, valid_c)
    )
    miss = ~jnp.isfinite(best_t)
    best_face = jnp.where(miss, -1, best_face)
    best_t = jnp.where(miss, 0.0, best_t)
    return best_face, best_t, best_u, best_v


# =============================================================================
# Connectivity helpers
# =============================================================================

def _march_tables(verts, faces, tets, tet_faces, face_tets, verts_color,
                  faces_opacity, faces_intense):
    """Precomputed march-time tables.

    The per-step connectivity walk needs face geometry, orientation,
    neighbor connectivity and shading. Round 1 gathered these from five
    separate tables each step; TPU gathers are issue-overhead-bound (not
    bandwidth-bound), so everything a step needs is packed into ONE row per
    tet and one row per face:

      tet_pack [T, 48]  for each of the 4 face slots: p0, e1, e2 = 36
                        floats (the unit normal is recomputed per step
                        with the exact op order of the precompute --
                        cross, sum-square, sqrt, max 1e-4, divide -- so
                        it is bit-identical to auxiliary.h:366-369 while
                        saving 25% of the per-step gather bytes); then
                        sign[4] (outward = sign * n-hat: the centroid
                        flip test of tet_face_outward_normal,
                        auxiliary.h:371-394, evaluated once per (tet,
                        slot) instead of per pixel per step); face ids[4]
                        and neighbor tet ids[4] stored as exact float32
                        (ids < 2^24)
      shade [B*F, 12]   col9 (3 vertex colors), alpha,
                        log(max(1-alpha, 1e-37)) -- precomputed so the
                        march's log-transmittance update needs no
                        per-step transcendental -- and the per-view face
                        intensity, so each step does ONE shading gather
                        (gradients accumulate per FACE, so no vertex ids
                        ride in the table)
      geo      [F, 12]  kept for the one-time first-face orientation test
      sign     [T, 4]   kept for the one-time first-tet selection

    The neighbor precompute folds the reference's per-step face_tets lookup
    (forward.cu:761-768: first entry that is neither curr_tet nor -1) into
    the table: nbr[t, j] is exactly that selection for tet t's slot j.
    """
    F = faces.shape[0]
    T = tets.shape[0]
    p0 = verts[faces[:, 0]]
    p1 = verts[faces[:, 1]]
    p2 = verts[faces[:, 2]]
    e1 = p1 - p0
    e2 = p2 - p0
    n = jnp.cross(e1, e2)
    norm = jnp.maximum(jnp.sqrt(jnp.sum(n * n, axis=-1)), 1e-4)
    nhat = n / norm[..., None]
    geo = jnp.concatenate([p0, e1, e2, nhat], axis=1)  # [F, 12]

    tf = jnp.maximum(tet_faces, 0)  # [T, 4]
    centers = jnp.mean(verts[tets], axis=1)  # [T, 3]
    flip = jnp.sum(
        nhat[tf] * (centers[:, None, :] - p0[tf]), axis=-1
    ) > 0.0
    sign = jnp.where(flip, -1.0, 1.0).astype(jnp.float32)  # [T, 4]

    ft2 = face_tets[tf]  # [T, 4, 2]
    tidx = jnp.arange(T, dtype=jnp.int32)[:, None]
    c0, c1 = ft2[..., 0], ft2[..., 1]
    ok0 = (c0 != tidx) & (c0 != -1)
    ok1 = (c1 != tidx) & (c1 != -1)
    nbr = jnp.where(ok0, c0, jnp.where(ok1, c1, -1))  # [T, 4]

    tet_pack = jnp.concatenate(
        [
            geo[tf][..., 0:9].reshape(T, 36),  # p0, e1, e2 per slot
            sign,
            tet_faces.astype(jnp.float32),
            nbr.astype(jnp.float32),
        ],
        axis=1,
    )  # [T, 48]

    col9 = verts_color[faces].reshape(F, 9)
    log1ma = jnp.log(jnp.maximum(1.0 - faces_opacity, 1e-37))
    B = faces_intense.shape[0]
    base = jnp.concatenate(
        [col9, faces_opacity[:, None], log1ma[:, None]], axis=1
    )  # [F, 11]: col9, alpha, log(1-alpha)
    shade = jnp.concatenate(
        [
            jnp.broadcast_to(base[None], (B, F, 11)),
            faces_intense[..., None],
        ],
        axis=-1,
    ).reshape(B * F, 12)
    return {"tet_pack": tet_pack, "shade": shade, "geo": geo, "sign": sign}


def _split_cols(rows: Array, k: int) -> list:
    """Split a row-gathered [M, K] table into K clean 1-D [M] columns.

    On TPU a [M, K] buffer pads K up to 128 lanes, and every consumer
    fusion pays a full strided pass over the padded buffer (the original
    march step cost 24 ms at M=640k for ~1.5 ms of gather + math). One
    physical relayout to [M/128, K, 128] -- rays in lanes -- makes each
    column a contiguous [M] vector; the identical step math then costs
    ~2 ms (tools/profile_step_variants.py variant p). The
    optimization_barrier pins the relayout so XLA cannot fuse it away
    into per-consumer strided reads again."""
    m = rows.shape[0]
    if m % 128 == 0 and m >= 128:
        r = rows.reshape(m // 128, 128, k).swapaxes(1, 2)
        r = lax.optimization_barrier(r)
        return [r[:, c, :].reshape(m) for c in range(k)]
    return [rows[:, c] for c in range(k)]


def _step_through_tet(march, curr_face, curr_tet, rayo, rayd, direction):
    """One connectivity step of the march (shared by fwd and bwd).

    direction=+1: forward walk (exit face: outward normal . d > 0,
    entry-face normal must satisfy . d < 0) -- forward.cu:672-775.
    direction=-1: backward walk (signs flipped) -- backward.cu:372-484.

    One gather per step: the packed per-tet row (geometry, orientation,
    face ids, precomputed neighbors -- see _march_tables). rayo/rayd are
    (x, y, z) tuples of [M] arrays; all math runs on 1-D [M] vectors (see
    _split_cols for why).

    Returns (err, next_face, next_tet, next_t, next_u, next_v), where err
    marks the reference's invariant violations (cases 1-3). The reference
    keeps the LAST matching exit candidate in slot order and falls back to
    slot 0 when none match (the err lanes' values are never consumed).
    """
    ct = jnp.maximum(curr_tet, 0)
    cols = _split_cols(march["tet_pack"][ct], 48)
    ox, oy, oz = rayo
    dx, dy, dz = rayd
    cff = curr_face.astype(jnp.float32)

    n_other = jnp.zeros_like(curr_face)
    n_exit = jnp.zeros_like(curr_face)
    d_entry = jnp.zeros_like(dx)
    nt_ = nu_ = nv_ = nface = ntet = None

    for j in range(4):
        p0x, p0y, p0z = cols[9 * j + 0], cols[9 * j + 1], cols[9 * j + 2]
        e1x, e1y, e1z = cols[9 * j + 3], cols[9 * j + 4], cols[9 * j + 5]
        e2x, e2y, e2z = cols[9 * j + 6], cols[9 * j + 7], cols[9 * j + 8]
        sgn = cols[36 + j]
        tfj = cols[40 + j]
        nbj = cols[44 + j]

        # unit normal recomputed with the exact op order of _march_tables'
        # precompute (bit-identical; auxiliary.h:366-369)
        nx = e1y * e2z - e1z * e2y
        ny = e1z * e2x - e1x * e2z
        nz = e1x * e2y - e1y * e2x
        norm = jnp.maximum(jnp.sqrt(nx * nx + ny * ny + nz * nz), 1e-4)
        nhx, nhy, nhz = nx / norm, ny / norm, nz / norm
        outd = sgn * (nhx * dx + nhy * dy + nhz * dz)

        # Moller-Trumbore, identical arithmetic to _mt_from_edges
        tvx, tvy, tvz = ox - p0x, oy - p0y, oz - p0z
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        denom = pvx * e1x + pvy * e1y + pvz * e1z
        nd = denom != 0.0
        inv = 1.0 / jnp.where(nd, denom, 1.0)
        t = (qvx * e2x + qvy * e2y + qvz * e2z) * inv
        u = (pvx * tvx + pvy * tvy + pvz * tvz) * inv
        v = (qvx * dx + qvy * dy + qvz * dz) * inv
        # strict hit (cuda_renderer/auxiliary.h:292-295)
        hit = nd & (t >= 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)

        is_entry = tfj == cff
        other = ~is_entry
        n_other = n_other + other.astype(jnp.int32)
        # entry-face outward dot (error case 2, forward.cu:704-717)
        d_entry = d_entry + jnp.where(is_entry, outd, 0.0)

        dir_ok = outd > 0.0 if direction > 0 else outd < 0.0
        ex = other & hit & dir_ok
        n_exit = n_exit + ex.astype(jnp.int32)

        if j == 0:
            nt_, nu_, nv_, nface, ntet = t, u, v, tfj, nbj
        else:
            nt_ = jnp.where(ex, t, nt_)
            nu_ = jnp.where(ex, u, nu_)
            nv_ = jnp.where(ex, v, nv_)
            nface = jnp.where(ex, tfj, nface)
            ntet = jnp.where(ex, nbj, ntet)

    err1 = n_other != 3  # error case 1 (forward.cu:687-691)
    err2 = d_entry >= 0.0 if direction > 0 else d_entry <= 0.0
    err3 = n_exit != 1  # error case 3 (forward.cu:755-759)
    err = err1 | err2 | err3
    # face/neighbor ids are f32-exact ints (< 2^24); -1 converts exactly
    return (err, nface.astype(jnp.int32), ntet.astype(jnp.int32),
            nt_, nu_, nv_)


def _march_state_gather(march, fbase, curr_face):
    """Per-pixel attributes of the current face: ONE packed-row gather from
    the per-(view, face) shade table (fbase: per-pixel view offset b*F),
    split into 1-D [M] columns (see _split_cols). Returns (c9, alpha,
    inten, log1ma): c9 = 9 color columns in [vert, channel] row-major
    order; log(1-alpha) comes from the table so the transmittance update
    is transcendental-free."""
    f = jnp.maximum(curr_face, 0)
    cols = _split_cols(march["shade"][fbase + f], 12)
    return cols[0:9], cols[9], cols[11], cols[10]


def _projective_ray(ray_o, ray_d, mv_t, proj_t):
    """Per-pixel homogeneous ray through the full camera transform.

    The reference re-projects the 3D intersection point every march step to
    get its NDC depth (forward.cu:628-632). proj(mv(o + t d)) is affine in
    t in homogeneous space, so precompute ph_o = P(M(o)) and
    ph_d = P_lin(M_lin(d)) once per pixel; per step the depth is just
    (ph_o.z + t ph_d.z) / clamp_w(ph_o.w + t ph_d.w).
    """
    pv_o = transform_point43(ray_o, mv_t[:, None, :, :])
    dv = (ray_d[..., 0:1] * mv_t[:, None, 0, :3]
          + ray_d[..., 1:2] * mv_t[:, None, 1, :3]
          + ray_d[..., 2:3] * mv_t[:, None, 2, :3])
    ph_o = transform_point44(pv_o, proj_t[:, None, :, :])  # [B, N, 4]
    ph_d = (dv[..., 0:1] * proj_t[:, None, 0, :]
            + dv[..., 1:2] * proj_t[:, None, 1, :]
            + dv[..., 2:3] * proj_t[:, None, 2, :])  # [B, N, 4]
    return ph_o, ph_d


# =============================================================================
# Active-ray compaction
# =============================================================================

# The lockstep march pays every surviving iteration over the full pixel
# buffer, but transmittance kills most rays within a few face crossings --
# only silhouette-grazing rays walk far. Phase sizes shrink by this factor.
# Measured at 98k faces / 800px: 8 beats 2 (1155 vs 1239 ms fwd+bwd) -- the
# per-iteration alive-count check and extra compaction rounds of finer
# phases cost more than the width they save, because done lanes re-gather
# clamped (cached) rows and are cheap.
COMPACT_SHRINK = 8
# Below this buffer size compaction is pure overhead (also keeps the tiny
# CPU test scenes on the single-phase path).
COMPACT_MIN_SIZE = 65_536


def _march_phase_sizes(m: int) -> list[int]:
    # sizes stay multiples of 128 so _split_cols' lane-major relayout
    # applies at every compaction level
    sizes = [m]
    while sizes[-1] // COMPACT_SHRINK >= COMPACT_MIN_SIZE:
        nxt = sizes[-1] // COMPACT_SHRINK
        sizes.append(nxt + (-nxt) % 128)
    return sizes


def _compacted_while(per_pixel, globals_, consts, body_fn, max_steps):
    """Run the march with periodic active-ray compaction.

    per_pixel: dict of [M, ...] state arrays, must contain a monotone
    "done" mask. globals_: dict of non-pixel state (step counter, gradient
    accumulators). consts: dict of [M, ...] per-pixel constants (rays etc.).
    body_fn(per_pixel, globals_, consts) -> (per_pixel, globals_).

    Phase k loops until the alive count fits the next (8x smaller) buffer,
    then gathers the alive rays (stable: all alive pixels survive the cut
    by construction) and recurses; results scatter back on unwind. The
    CUDA analog is free: hardware schedules only non-retired threads
    (forward.cu:595 while-loop); on TPU the compaction gather buys the
    same "pay for live rays only" property.
    """
    sizes = _march_phase_sizes(per_pixel["done"].shape[0])

    def run(pp, gl, cs, level):
        is_last = level == len(sizes) - 1

        def cond(c):
            p, g = c
            alive = ~p["done"]
            base = (g["step"] < max_steps) & jnp.any(alive)
            if is_last:
                return base
            return base & (
                jnp.sum(alive.astype(jnp.int32)) > sizes[level + 1]
            )

        def body(c):
            p, g = c
            return body_fn(p, g, cs)

        pp, gl = lax.while_loop(cond, body, (pp, gl))
        if is_last:
            return pp, gl

        # alive rays first, grouped by their current tet: rays in one tet
        # step to neighboring tets together, so this ordering makes the
        # per-step packed-row gathers near-sequential in HBM for the rest
        # of the march. All alive rays fit because the loop above only
        # exits below the next size (or fully done / step-capped, in which
        # case deeper phases no-op).
        key = jnp.where(pp["done"], jnp.int32(2**30),
                        jnp.maximum(pp["curr_tet"], 0))
        idx = jnp.argsort(key, stable=True)[:sizes[level + 1]]
        sub_pp = jax.tree.map(lambda x: x[idx], pp)
        sub_cs = jax.tree.map(lambda x: x[idx], cs)
        sub_pp, gl = run(sub_pp, gl, sub_cs, level + 1)
        pp = jax.tree.map(
            lambda full, sub: full.at[idx].set(sub), pp, sub_pp
        )
        return pp, gl

    return run(per_pixel, globals_, consts, 0)


# =============================================================================
# Forward march
# =============================================================================

def _render_tet_forward(verts, faces, verts_color, faces_opacity, mv_t,
                        proj_t, inv_mv_t, inv_proj_t, faces_intense, tets,
                        face_tets, tet_faces, bg, height, width, seed,
                        max_steps):
    B = mv_t.shape[0]
    N = height * width

    use_binned = faces.shape[0] > BINNED_FIRST_HIT_THRESHOLD

    ndc, img = project_verts(verts, mv_t, proj_t, width, height)
    if use_binned:
        # rects must be in the Pallas kernel's tile grid
        from .tri_binned import TILE as KTILE

        pre = preprocess_faces(ndc, img, faces, width, height, KTILE, KTILE)
    else:
        pre = preprocess_faces(ndc, img, faces, width, height, TILE_X, TILE_Y)

    ray_o, ray_d_img = generate_rays(
        inv_mv_t, inv_proj_t, width, height, norm_eps_mode="tet",
        jitter_seed=seed if seed > 0 else None,
    )
    ray_o = ray_o.reshape(B, N, 3)
    ray_d = ray_d_img.reshape(B, N, 3)

    if use_binned:
        # Tile-binned Pallas first-hit (reference structure: min-depth
        # sorted tile lists with depth-window early-out).
        from .binning import default_key_capacity
        from .tet_first_hit import first_intersection_binned

        # Tet faces live at tessellation-cell scale: a few 32px tiles each
        # (vs 16 for the tri default, sized for large splats). The first-hit
        # sort/gather chain scales with this capacity; overflow is surfaced
        # by a debug warning inside first_intersection_binned.
        kcap = default_key_capacity(B, faces.shape[0], avg_tiles_per_face=8)
        first_face, rt, iu, iv = first_intersection_binned(
            verts, faces, pre, img, inv_mv_t[:, 3, :3], ray_d_img,
            height, width, B, kcap,
        )
    else:
        sort_key = jnp.where(pre["valid"], pre["min_depth"], jnp.inf)
        order = jnp.argsort(sort_key, axis=1, stable=True)
        first_face, rt, iu, iv = _first_intersection(
            verts, faces, pre["valid"], order, ray_o, ray_d
        )

    march = _march_tables(verts, faces, tets, tet_faces, face_tets,
                          verts_color, faces_opacity, faces_intense)
    ph_o, ph_d = _projective_ray(ray_o, ray_d, mv_t, proj_t)

    # starting tet: the side whose outward first-face normal opposes the ray
    # (forward.cu:420-444; when both qualify the second entry wins)
    ff_safe = jnp.maximum(first_face, 0)
    ndot_ff = jnp.sum(
        march["geo"][ff_safe][..., 9:12] * ray_d, axis=-1
    )  # n-hat . d for the first face
    ft = face_tets[ff_safe]  # [B, N, 2]
    first_tet = jnp.full_like(first_face, -1)
    for i in range(2):
        cand = ft[..., i]
        tf_c = tet_faces[jnp.maximum(cand, 0)]  # [B, N, 4]
        match = tf_c == first_face[..., None]
        sgn = jnp.sum(
            jnp.where(match, march["sign"][jnp.maximum(cand, 0)], 0.0),
            axis=-1,
        )
        opposes = sgn * ndot_ff < 0.0
        take = (cand >= 0) & opposes & (first_face >= 0)
        first_tet = jnp.where(take, cand, first_tet)

    done0 = (first_face == -1) | (first_tet == -1)

    # flatten to [M] and pad to a multiple of 128 (padding lanes are done
    # from step 0): the march compacts the alive-ray set across views and
    # the SoA column splits need lane-aligned buffers (_split_cols)
    M0 = B * N
    pad = (-M0) % 128
    M = M0 + pad
    F = faces.shape[0]

    def flat(x, fill=0):
        x = x.reshape((M0,) + x.shape[2:])
        if pad:
            x = jnp.concatenate(
                [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)])
        return x

    fbase = jnp.minimum(jnp.arange(M, dtype=jnp.int32) // N, B - 1) * F

    rof, rdf = flat(ray_o), flat(ray_d)
    phof, phdf = flat(ph_o), flat(ph_d)
    consts = dict(
        rox=rof[:, 0], roy=rof[:, 1], roz=rof[:, 2],
        rdx=rdf[:, 0], rdy=rdf[:, 1], rdz=rdf[:, 2],
        phoz=phof[:, 2], phow=phof[:, 3],
        phdz=phdf[:, 2], phdw=phdf[:, 3],
        fbase=fbase,
    )
    per_pixel = dict(
        curr_face=flat(first_face),
        curr_tet=flat(first_tet),
        curr_t=flat(rt),
        curr_u=flat(iu),
        curr_v=flat(iv),
        Cr=jnp.zeros((M,), jnp.float32),
        Cg=jnp.zeros((M,), jnp.float32),
        Cb=jnp.zeros((M,), jnp.float32),
        D=jnp.zeros((M,), jnp.float32),
        log_T=jnp.zeros((M,), jnp.float32),
        T_cur=jnp.ones((M,), jnp.float32),  # exp(log_T), carried so each
                                            # step costs ONE exp, not two
        prev_log_T=jnp.zeros((M,), jnp.float32),
        last_face=jnp.full((M,), jnp.int32(-1)),
        last_tet=jnp.full((M,), jnp.int32(-1)),
        n_contrib=jnp.zeros((M,), jnp.int32),
        active=jnp.zeros((M,), jnp.bool_),
        done=flat(done0, fill=True),
    )
    globals_ = dict(step=jnp.int32(0))

    def body(s, gl, cs):
        alive = ~s["done"]
        cf, ct = s["curr_face"], s["curr_tet"]
        u, v = s["curr_u"], s["curr_v"]

        # --- 1. blend current face (forward.cu:597-653) ---
        c9, alpha, inten, l1a = _march_state_gather(march, cs["fbase"], cf)
        w = jnp.where(alive, s["T_cur"] * alpha, 0.0)
        col = [
            (c9[ch] + (c9[3 + ch] - c9[ch]) * u
             + (c9[6 + ch] - c9[ch]) * v) * inten
            for ch in range(3)
        ]
        Cr = s["Cr"] + col[0] * w
        Cg = s["Cg"] + col[1] * w
        Cb = s["Cb"] + col[2] * w
        dep = (cs["phoz"] + s["curr_t"] * cs["phdz"]) / clamp_w(
            cs["phow"] + s["curr_t"] * cs["phdw"])
        D = s["D"] + dep * w

        prev_log_T = jnp.where(alive, s["log_T"], s["prev_log_T"])
        log_T_new = jnp.where(
            alpha < 1.0,
            s["log_T"] + l1a,  # log(1-alpha) precomputed in the shade table
            jnp.full_like(s["log_T"], np.log(T_EPS * 0.1)),
        )
        log_T = jnp.where(alive, log_T_new, s["log_T"])
        T_cur = jnp.exp(log_T)  # the step's single transcendental

        t_exhausted = T_cur < T_EPS

        n_contrib = s["n_contrib"] + alive.astype(jnp.int32)
        last_face = jnp.where(alive, cf, s["last_face"])
        last_tet = jnp.where(alive, ct, s["last_tet"])

        active = s["active"] | (alive & t_exhausted)
        newly_done = alive & t_exhausted

        # --- 2. exited the tessellation? (forward.cu:667-670) ---
        no_tet = alive & (ct == -1)
        active = active | no_tet
        newly_done = newly_done | no_tet

        # --- 3. walk to the next face (forward.cu:672-775) ---
        walk = alive & ~newly_done
        err, nf, nt, t2, u2, v2 = _step_through_tet(
            march, cf, ct,
            (cs["rox"], cs["roy"], cs["roz"]),
            (cs["rdx"], cs["rdy"], cs["rdz"]), +1,
        )
        newly_done = newly_done | (walk & err)
        advance = walk & ~err

        return dict(
            curr_face=jnp.where(advance, nf, cf),
            curr_tet=jnp.where(advance, nt, ct),
            curr_t=jnp.where(advance, t2, s["curr_t"]),
            curr_u=jnp.where(advance, u2, s["curr_u"]),
            curr_v=jnp.where(advance, v2, s["curr_v"]),
            Cr=Cr,
            Cg=Cg,
            Cb=Cb,
            D=D,
            log_T=log_T,
            T_cur=T_cur,
            prev_log_T=prev_log_T,
            last_face=last_face,
            last_tet=last_tet,
            n_contrib=n_contrib,
            active=active,
            done=s["done"] | newly_done,
        ), dict(step=gl["step"] + 1)

    s, _gl = _compacted_while(per_pixel, globals_, consts, body, max_steps)
    s = {k: v[:M0].reshape((B, N) + v.shape[1:]) for k, v in s.items()}
    s["C"] = jnp.stack([s.pop("Cr"), s.pop("Cg"), s.pop("Cb")], axis=-1)

    final_T = jnp.exp(s["log_T"])
    active = s["active"]
    color = jnp.where(
        active[..., None],
        s["C"] + final_T[..., None] * bg[None, None, :],
        jnp.broadcast_to(bg[None, None, :], (B, N, 3)),
    )
    depth = jnp.where(active, s["D"] + final_T * 1.0, 1.0)

    color = color.reshape(B, height, width, 3).transpose(0, 3, 1, 2)
    depth = depth.reshape(B, 1, height, width)
    active_img = active.reshape(B, height, width)

    saved = dict(
        first_face=first_face,
        last_face=s["last_face"],
        last_tet=s["last_tet"],
        final_log_T=s["log_T"],
        final_prev_log_T=s["prev_log_T"],
        n_contrib=s["n_contrib"],
        is_active=active,
    )
    return color, depth, active_img, saved


# =============================================================================
# Backward march
# =============================================================================

def _render_tet_backward(verts, faces, verts_color, faces_opacity, mv_t,
                         proj_t, inv_mv_t, inv_proj_t, faces_intense, tets,
                         face_tets, tet_faces, bg, height, width, seed,
                         max_steps, saved, dL_dcolor, dL_ddepth):
    """Reverse march (backward.cu:86-487): gradients for verts_color and
    faces_opacity only, accumulated deterministically."""
    B = mv_t.shape[0]
    P = verts.shape[0]
    F = faces.shape[0]
    N = height * width

    march = _march_tables(verts, faces, tets, tet_faces, face_tets,
                          verts_color, faces_opacity, faces_intense)

    ray_o, ray_d = generate_rays(
        inv_mv_t, inv_proj_t, width, height, norm_eps_mode="tet",
        jitter_seed=seed if seed > 0 else None,
    )
    ray_o = ray_o.reshape(B, N, 3)
    ray_d = ray_d.reshape(B, N, 3)
    ph_o, ph_d = _projective_ray(ray_o, ray_d, mv_t, proj_t)

    gcol = dL_dcolor.transpose(0, 2, 3, 1).reshape(B, N, 3)
    gdep = dL_ddepth.reshape(B, N)
    bg_dot = jnp.einsum("c,bpc->bp", bg, gcol) + gdep  # bg + depth-bg terms

    final_log_T = saved["final_log_T"]
    final_prev_log_T = saved["final_prev_log_T"]
    final_T = jnp.exp(final_log_T)
    final_prev_T = jnp.exp(final_prev_log_T)

    last_face = saved["last_face"]
    last_tet = saved["last_tet"]
    first_face = saved["first_face"]

    done0 = (~saved["is_active"]) | (last_face == -1)

    # recompute (t, u, v) on the last face
    lf_safe = jnp.maximum(last_face, 0)
    p = verts[faces[lf_safe]]
    tuv, _nd = ray_tri_intersection(
        ray_o, ray_d, p[..., 0, :], p[..., 1, :], p[..., 2, :]
    )

    # flip to the entry-side tet (backward.cu:224-232: first face_tets entry
    # that differs from last_tet)
    ft = face_tets[lf_safe]
    curr_tet0 = jnp.where(ft[..., 0] != last_tet, ft[..., 0], ft[..., 1])

    # flatten to [M] (padded to a multiple of 128; see the forward) for
    # active-ray compaction. Gradients accumulate per FACE in a [F, 10]
    # table in globals_ (untouched by compaction): one fused [M]-row
    # scatter per step instead of the [M, 3]-row vertex scatter + [M]-row
    # opacity scatter of the direct form (2.6x cheaper, row-count-bound);
    # the face table expands to vertex/opacity grads once at the end.
    M0 = B * N
    pad = (-M0) % 128
    M = M0 + pad

    def flat(x, fill=0):
        x = x.reshape((M0,) + x.shape[2:])
        if pad:
            x = jnp.concatenate(
                [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)])
        return x

    fbase = jnp.minimum(jnp.arange(M, dtype=jnp.int32) // N, B - 1) * F

    rof, rdf = flat(ray_o), flat(ray_d)
    phof, phdf = flat(ph_o), flat(ph_d)
    gcolf = flat(gcol)
    consts = dict(
        rox=rof[:, 0], roy=rof[:, 1], roz=rof[:, 2],
        rdx=rdf[:, 0], rdy=rdf[:, 1], rdz=rdf[:, 2],
        phoz=phof[:, 2], phow=phof[:, 3],
        phdz=phdf[:, 2], phdw=phdf[:, 3],
        fbase=fbase,
        gcr=gcolf[:, 0], gcg=gcolf[:, 1], gcb=gcolf[:, 2],
        gdep=flat(gdep), bg_dot=flat(bg_dot),
        final_T=flat(final_T), final_prev_T=flat(final_prev_T),
        first_face=flat(first_face),
    )
    per_pixel = dict(
        curr_face=flat(last_face),
        curr_tet=flat(curr_tet0),
        curr_t=flat(tuv[..., 0]),
        curr_u=flat(tuv[..., 1]),
        curr_v=flat(tuv[..., 2]),
        prev_log_T=flat(final_prev_log_T),
        first=jnp.ones((M,), jnp.bool_),
        last_alpha=jnp.zeros((M,), jnp.float32),
        last_cr=jnp.zeros((M,), jnp.float32),
        last_cg=jnp.zeros((M,), jnp.float32),
        last_cb=jnp.zeros((M,), jnp.float32),
        last_depth=jnp.zeros((M,), jnp.float32),
        acc_r=jnp.zeros((M,), jnp.float32),
        acc_g=jnp.zeros((M,), jnp.float32),
        acc_b=jnp.zeros((M,), jnp.float32),
        acc_d=jnp.zeros((M,), jnp.float32),
        done=flat(done0, fill=True),
    )
    globals_ = dict(
        step=jnp.int32(0),
        face_acc=jnp.zeros((F, 10), jnp.float32),
    )

    def body(s, gl, cs):
        alive = ~s["done"]
        cf, ct = s["curr_face"], s["curr_tet"]

        c9, alpha, inten, l1a = _march_state_gather(march, cs["fbase"], cf)
        i1 = s["curr_u"]
        i2 = s["curr_v"]
        i0 = 1.0 - i1 - i2
        col = [
            (i0 * c9[ch] + i1 * c9[3 + ch] + i2 * c9[6 + ch]) * inten
            for ch in range(3)
        ]
        dep = (cs["phoz"] + s["curr_t"] * cs["phdz"]) / clamp_w(
            cs["phow"] + s["curr_t"] * cs["phdw"])

        # reconstruct prev transmittance (backward.cu:273-277); log(1-alpha)
        # comes precomputed from the shade table
        plt = jnp.where(
            alive & ~s["first"],
            s["prev_log_T"] - l1a,
            s["prev_log_T"],
        )
        first = s["first"] & ~alive
        prev_T = jnp.exp(plt)

        la = s["last_alpha"]
        acc_r_new = la * s["last_cr"] + (1.0 - la) * s["acc_r"]
        acc_g_new = la * s["last_cg"] + (1.0 - la) * s["acc_g"]
        acc_b_new = la * s["last_cb"] + (1.0 - la) * s["acc_b"]
        acc_d_new = la * s["last_depth"] + (1.0 - la) * s["acc_d"]

        ap = alpha * prev_T
        dL_dop = (
            ((col[0] - acc_r_new) * cs["gcr"]
             + (col[1] - acc_g_new) * cs["gcg"]
             + (col[2] - acc_b_new) * cs["gcb"])
            + (dep - acc_d_new) * cs["gdep"]
        ) * prev_T

        # background term (backward.cu:317-339)
        bg_coef = jnp.where(
            alpha == 1.0,
            -cs["final_prev_T"],
            -cs["final_T"] / jnp.maximum(1.0 - alpha, 1e-37),
        )
        dL_dop = dL_dop + bg_coef * cs["bg_dot"]
        dL_dop = jnp.where(alive, dL_dop, 0.0)

        acc_r = jnp.where(alive, acc_r_new, s["acc_r"])
        acc_g = jnp.where(alive, acc_g_new, s["acc_g"])
        acc_b = jnp.where(alive, acc_b_new, s["acc_b"])
        acc_d = jnp.where(alive, acc_d_new, s["acc_d"])
        last_cr = jnp.where(alive, col[0], s["last_cr"])
        last_cg = jnp.where(alive, col[1], s["last_cg"])
        last_cb = jnp.where(alive, col[2], s["last_cb"])
        last_depth = jnp.where(alive, dep, s["last_depth"])
        last_alpha = jnp.where(alive, alpha, s["last_alpha"])

        # per-face gradient record: dL_dvcolor contribution of vertex v,
        # channel ch is gc_ch * alpha * prev_T * bary_v * inten
        # (masked lanes contribute zeros at face 0)
        wmask = jnp.where(alive, inten * prev_T * alpha, 0.0)
        bary = (i0, i1, i2)
        rec = jnp.stack(
            [wmask * bary[v] * (cs["gcr"], cs["gcg"], cs["gcb"])[ch]
             for v in range(3) for ch in range(3)]
            + [dL_dop],
            axis=-1,
        )  # [M, 10]
        face_acc = gl["face_acc"].at[jnp.maximum(cf, 0)].add(
            rec, mode="drop")

        # terminate at the first face (backward.cu:363-366)
        reached_first = alive & (cf == cs["first_face"])
        newly_done = reached_first

        # walk backward (backward.cu:372-484)
        no_tet = alive & ~newly_done & (ct == -1)
        newly_done = newly_done | no_tet
        walk = alive & ~newly_done
        err, nf, nt, t2, u2, v2 = _step_through_tet(
            march, cf, ct,
            (cs["rox"], cs["roy"], cs["roz"]),
            (cs["rdx"], cs["rdy"], cs["rdz"]), -1,
        )
        newly_done = newly_done | (walk & err)
        advance = walk & ~err

        return dict(
            curr_face=jnp.where(advance, nf, cf),
            curr_tet=jnp.where(advance, nt, ct),
            curr_t=jnp.where(advance, t2, s["curr_t"]),
            curr_u=jnp.where(advance, u2, s["curr_u"]),
            curr_v=jnp.where(advance, v2, s["curr_v"]),
            prev_log_T=jnp.where(alive, plt, s["prev_log_T"]),
            first=first,
            last_alpha=last_alpha,
            last_cr=last_cr,
            last_cg=last_cg,
            last_cb=last_cb,
            last_depth=last_depth,
            acc_r=acc_r,
            acc_g=acc_g,
            acc_b=acc_b,
            acc_d=acc_d,
            done=s["done"] | newly_done,
        ), dict(step=gl["step"] + 1, face_acc=face_acc)

    _s, gl = _compacted_while(per_pixel, globals_, consts, body, max_steps)

    # expand the per-face table: vertex color grads via one F-scale
    # scatter over the face->vertex map; opacity grads are column 9
    face_acc = gl["face_acc"]
    g_vcolor = jnp.zeros((P, 3), jnp.float32).at[faces].add(
        face_acc[:, 0:9].reshape(F, 3, 3), mode="drop")
    g_fopacity = face_acc[:, 9]
    return g_vcolor, g_fopacity


# =============================================================================
# custom_vjp wrapper
# =============================================================================

@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16))
def render_tet_core(verts, faces, verts_color, faces_opacity, mv_t, proj_t,
                    inv_mv_t, inv_proj_t, faces_intense, tets, face_tets,
                    tet_faces, bg, height, width, seed,
                    max_steps=DEFAULT_MAX_MARCH_STEPS):
    """Differentiable tet renderer.

    Shapes (reference: dmesh_renderer/__init__.py:451-463): verts [P,3],
    faces [F,3], verts_color [P,3], faces_opacity [F], mv_t/proj_t [B,4,4]
    (transposed convention), faces_intense [B,F], tets [T,4],
    face_tets [F,2], tet_faces [T,4], bg [3].

    Returns (color [B,3,H,W], depth [B,1,H,W], active [B,H,W] bool).
    Gradients flow only to verts_color and faces_opacity.
    """
    color, depth, active, _ = _render_tet_forward(
        verts, faces, verts_color, faces_opacity, mv_t, proj_t, inv_mv_t,
        inv_proj_t, faces_intense, tets, face_tets, tet_faces, bg,
        height, width, seed, max_steps,
    )
    return color, depth, active


def _tet_fwd(verts, faces, verts_color, faces_opacity, mv_t, proj_t,
             inv_mv_t, inv_proj_t, faces_intense, tets, face_tets, tet_faces,
             bg, height, width, seed, max_steps):
    color, depth, active, saved = _render_tet_forward(
        verts, faces, verts_color, faces_opacity, mv_t, proj_t, inv_mv_t,
        inv_proj_t, faces_intense, tets, face_tets, tet_faces, bg,
        height, width, seed, max_steps,
    )
    res = (verts, faces, verts_color, faces_opacity, mv_t, proj_t, inv_mv_t,
           inv_proj_t, faces_intense, tets, face_tets, tet_faces, bg, saved)
    return (color, depth, active), res


def _tet_bwd(height, width, seed, max_steps, res, cots):
    (verts, faces, verts_color, faces_opacity, mv_t, proj_t, inv_mv_t,
     inv_proj_t, faces_intense, tets, face_tets, tet_faces, bg, saved) = res
    dL_dcolor, dL_ddepth, _dL_dactive = cots

    g_vcolor, g_fopacity = _render_tet_backward(
        verts, faces, verts_color, faces_opacity, mv_t, proj_t, inv_mv_t,
        inv_proj_t, faces_intense, tets, face_tets, tet_faces, bg,
        height, width, seed, max_steps, saved, dL_dcolor, dL_ddepth,
    )

    def zi(x):
        return np.zeros(x.shape, jax.dtypes.float0)

    return (
        jnp.zeros_like(verts),
        zi(faces),
        g_vcolor,
        g_fopacity,
        jnp.zeros_like(mv_t),
        jnp.zeros_like(proj_t),
        jnp.zeros_like(inv_mv_t),
        jnp.zeros_like(inv_proj_t),
        jnp.zeros_like(faces_intense),
        zi(tets),
        zi(face_tets),
        zi(tet_faces),
        jnp.zeros_like(bg),
    )


render_tet_core.defvjp(_tet_fwd, _tet_bwd)
