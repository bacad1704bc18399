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
      shade [B*F, 16]   col9 (3 vertex colors), alpha, fv[3] vertex ids
                        (f32-exact; gradients are hand-written in the
                        custom_vjp backward, so packing traced values is
                        sound), log(max(1-alpha, 1e-37)) -- precomputed so
                        the march's log-transmittance update needs no
                        per-step transcendental -- and the per-view face
                        intensity, so each step does ONE shading gather
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
        [col9, faces_opacity[:, None], faces.astype(jnp.float32),
         log1ma[:, None]], axis=1
    )  # [F, 14]: col9, alpha, vertex ids (f32-exact), log(1-alpha)
    shade = jnp.concatenate(
        [
            jnp.broadcast_to(base[None], (B, F, 14)),
            faces_intense[..., None],
            jnp.zeros((B, F, 1), jnp.float32),
        ],
        axis=-1,
    ).reshape(B * F, 16)
    return {"tet_pack": tet_pack, "shade": shade, "geo": geo, "sign": sign}


def _mt_from_edges(ray_o, ray_d, p0, e1, e2):
    """Moller-Trumbore on precomputed edges (identical arithmetic to
    geometry.ray_tri_intersection, which derives e1/e2 the same way)."""
    tvec = ray_o - p0
    pv = jnp.cross(ray_d, e2)
    qv = jnp.cross(tvec, e1)
    denom = jnp.sum(pv * e1, axis=-1)
    nd = denom != 0.0
    inv = 1.0 / jnp.where(nd, denom, jnp.ones_like(denom))
    t = jnp.sum(qv * e2, axis=-1) * inv
    u = jnp.sum(pv * tvec, axis=-1) * inv
    v = jnp.sum(qv * ray_d, axis=-1) * inv
    return jnp.stack([t, u, v], axis=-1), nd


def _step_through_tet(march, curr_face, curr_tet, ray_o, ray_d, direction):
    """One connectivity step of the march (shared by fwd and bwd).

    direction=+1: forward walk (exit face: outward normal . d > 0,
    entry-face normal must satisfy . d < 0) -- forward.cu:672-775.
    direction=-1: backward walk (signs flipped) -- backward.cu:372-484.

    One gather per step: the packed per-tet row (geometry, orientation,
    face ids, precomputed neighbors -- see _march_tables).

    Returns (err, next_face, next_tet, next_t, next_u, next_v), where err
    marks the reference's invariant violations (cases 1-3).
    """
    ct = jnp.maximum(curr_tet, 0)
    pack = march["tet_pack"][ct]  # [B, N, 48] -- the step's only gather
    shape = ct.shape
    geo_j = pack[..., 0:36].reshape(shape + (4, 9))
    sign_j = pack[..., 36:40]
    tf = pack[..., 40:44].astype(jnp.int32)  # [B, N, 4] face ids
    nbr_j = pack[..., 44:48].astype(jnp.int32)

    is_entry = tf == curr_face[..., None]
    other = ~is_entry
    cnt = jnp.sum(other.astype(jnp.int32), axis=-1)
    err1 = cnt != 3  # error case 1 (forward.cu:687-691)

    p0j = geo_j[..., 0:3]
    e1j = geo_j[..., 3:6]
    e2j = geo_j[..., 6:9]
    # unit normal recomputed with the exact op order of _march_tables'
    # precompute (bit-identical; auxiliary.h:366-369)
    n_j = jnp.cross(e1j, e2j)
    norm_j = jnp.maximum(jnp.sqrt(jnp.sum(n_j * n_j, axis=-1)), 1e-4)
    nhat_j = n_j / norm_j[..., None]
    outdot_j = sign_j * jnp.sum(nhat_j * ray_d[..., None, :], axis=-1)

    # entry-face normal orientation check (error case 2, forward.cu:704-717):
    # the entry face's outward dot is extracted from its slot in this tet
    d_entry = jnp.sum(jnp.where(is_entry, outdot_j, 0.0), axis=-1)
    err2 = jnp.where(direction > 0, d_entry >= 0.0, d_entry <= 0.0)

    tuv, nd = _mt_from_edges(
        ray_o[..., None, :], ray_d[..., None, :], p0j, e1j, e2j
    )  # [B, N, 4, 3]
    hit = strict_hit(tuv, nd)
    dir_ok = jnp.where(direction > 0, outdot_j > 0.0, outdot_j < 0.0)
    exit_j = other & hit & dir_ok  # [B, N, 4]

    n_exit = jnp.sum(exit_j.astype(jnp.int32), axis=-1)
    err3 = n_exit != 1  # error case 3 (forward.cu:755-759)

    # reference keeps the LAST matching candidate in iteration order
    jidx = jnp.broadcast_to(
        jnp.arange(4, dtype=jnp.int32), exit_j.shape
    )
    sel = jnp.max(jnp.where(exit_j, jidx, -1), axis=-1)
    sel_safe = jnp.maximum(sel, 0)
    next_face = _select4(tf, sel_safe)
    next_t = _select4(tuv[..., 0], sel_safe)
    next_u = _select4(tuv[..., 1], sel_safe)
    next_v = _select4(tuv[..., 2], sel_safe)

    # the other tet across next_face (forward.cu:761-768), precomputed in
    # the table: nbr[ct, j] = first face_tets entry != ct and != -1
    next_tet = _select4(nbr_j, sel_safe)

    err = err1 | err2 | err3
    return err, next_face, next_tet, next_t, next_u, next_v


def _march_state_gather(march, fbase, curr_face):
    """Per-pixel attributes of the current face: ONE packed-row gather from
    the per-(view, face) shade table (fbase: per-pixel view offset b*F).
    Returns log(1-alpha) from the table so the transmittance update is
    transcendental-free."""
    f = jnp.maximum(curr_face, 0)
    row = march["shade"][fbase + f]  # [M, 16]
    c = row[..., 0:9].reshape(f.shape + (3, 3))  # [M, 3, 3]
    alpha = row[..., 9]  # [M]
    fv = row[..., 10:13].astype(jnp.int32)  # [M, 3]
    log1ma = row[..., 13]  # [M]
    inten = row[..., 14]  # [M]
    return fv, c, alpha, inten, log1ma


def _select4(x4, sel):
    """x4[..., sel] per row via arithmetic selects (take_along_axis lowers
    to a gather; four fused selects are far cheaper inside the march)."""
    acc = x4[..., 0]
    for j in range(1, 4):
        acc = jnp.where(sel == j, x4[..., j], acc)
    return acc


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


def _depth_at(ph_o, ph_d, t):
    return (ph_o[..., 2] + t * ph_d[..., 2]) / clamp_w(
        ph_o[..., 3] + t * ph_d[..., 3])


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
    sizes = [m]
    while sizes[-1] // COMPACT_SHRINK >= COMPACT_MIN_SIZE:
        sizes.append(sizes[-1] // COMPACT_SHRINK)
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

    # flatten to [M]: the march compacts the alive-ray set across views
    M = B * N
    F = faces.shape[0]
    flat = lambda x: x.reshape((M,) + x.shape[2:])
    fbase = (jnp.arange(M, dtype=jnp.int32) // N) * F

    consts = dict(
        ray_o=flat(ray_o), ray_d=flat(ray_d),
        ph_o=flat(ph_o), ph_d=flat(ph_d), fbase=fbase,
    )
    per_pixel = dict(
        curr_face=flat(first_face),
        curr_tet=flat(first_tet),
        curr_t=flat(rt),
        curr_u=flat(iu),
        curr_v=flat(iv),
        C=jnp.zeros((M, 3), jnp.float32),
        D=jnp.zeros((M,), jnp.float32),
        log_T=jnp.zeros((M,), jnp.float32),
        T_cur=jnp.ones((M,), jnp.float32),  # exp(log_T), carried so each
                                            # step costs ONE exp, not two
        prev_log_T=jnp.zeros((M,), jnp.float32),
        last_face=jnp.full((M,), jnp.int32(-1)),
        last_tet=jnp.full((M,), jnp.int32(-1)),
        n_contrib=jnp.zeros((M,), jnp.int32),
        active=jnp.zeros((M,), jnp.bool_),
        done=flat(done0),
    )
    globals_ = dict(step=jnp.int32(0))

    def body(s, gl, cs):
        alive = ~s["done"]
        cf, ct = s["curr_face"], s["curr_tet"]

        # --- 1. blend current face (forward.cu:597-653) ---
        _fv, c3, alpha, inten, l1a = _march_state_gather(
            march, cs["fbase"], cf
        )
        col = (
            c3[..., 0, :]
            + (c3[..., 1, :] - c3[..., 0, :]) * s["curr_u"][..., None]
            + (c3[..., 2, :] - c3[..., 0, :]) * s["curr_v"][..., None]
        ) * inten[..., None]
        w = jnp.where(alive, s["T_cur"] * alpha, 0.0)
        C = s["C"] + col * w[..., None]
        dep = _depth_at(cs["ph_o"], cs["ph_d"], s["curr_t"])
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
            march, cf, ct, cs["ray_o"], cs["ray_d"], +1,
        )
        newly_done = newly_done | (walk & err)
        advance = walk & ~err

        return dict(
            curr_face=jnp.where(advance, nf, cf),
            curr_tet=jnp.where(advance, nt, ct),
            curr_t=jnp.where(advance, t2, s["curr_t"]),
            curr_u=jnp.where(advance, u2, s["curr_u"]),
            curr_v=jnp.where(advance, v2, s["curr_v"]),
            C=C,
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
    s = {k: v.reshape((B, N) + v.shape[1:]) for k, v in s.items()}

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

    # flatten to [M] for active-ray compaction (gradient accumulators are
    # global arrays -- they travel in globals_, untouched by compaction)
    M = B * N
    flat = lambda x: x.reshape((M,) + x.shape[2:])
    fbase = (jnp.arange(M, dtype=jnp.int32) // N) * F

    consts = dict(
        ray_o=flat(ray_o), ray_d=flat(ray_d),
        ph_o=flat(ph_o), ph_d=flat(ph_d), fbase=fbase,
        gcol=flat(gcol), gdep=flat(gdep), bg_dot=flat(bg_dot),
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
        last_color=jnp.zeros((M, 3), jnp.float32),
        last_depth=jnp.zeros((M,), jnp.float32),
        accum_rec=jnp.zeros((M, 3), jnp.float32),
        accum_recd=jnp.zeros((M,), jnp.float32),
        done=flat(done0),
    )
    globals_ = dict(
        step=jnp.int32(0),
        g_vcolor=jnp.zeros((P, 3), jnp.float32),
        g_fopacity=jnp.zeros((F,), jnp.float32),
    )

    def body(s, gl, cs):
        alive = ~s["done"]
        cf, ct = s["curr_face"], s["curr_tet"]

        fv, c3, alpha, inten, l1a = _march_state_gather(
            march, cs["fbase"], cf
        )
        i1 = s["curr_u"]
        i2 = s["curr_v"]
        i0 = 1.0 - i1 - i2
        col = (
            i0[..., None] * c3[..., 0, :]
            + i1[..., None] * c3[..., 1, :]
            + i2[..., None] * c3[..., 2, :]
        ) * inten[..., None]
        dep = _depth_at(cs["ph_o"], cs["ph_d"], s["curr_t"])

        # reconstruct prev transmittance (backward.cu:273-277); log(1-alpha)
        # comes precomputed from the shade table
        plt = jnp.where(
            alive & ~s["first"],
            s["prev_log_T"] - l1a,
            s["prev_log_T"],
        )
        first = s["first"] & ~alive
        prev_T = jnp.exp(plt)

        accum_rec_new = (
            s["last_alpha"][..., None] * s["last_color"]
            + (1.0 - s["last_alpha"][..., None]) * s["accum_rec"]
        )
        accum_recd_new = (
            s["last_alpha"] * s["last_depth"]
            + (1.0 - s["last_alpha"]) * s["accum_recd"]
        )

        dL_dfcolor = cs["gcol"] * (alpha * prev_T)[..., None]
        dL_dop = (
            jnp.sum((col - accum_rec_new) * cs["gcol"], axis=-1)
            + (dep - accum_recd_new) * cs["gdep"]
        ) * prev_T

        # background term (backward.cu:317-339)
        bg_coef = jnp.where(
            alpha == 1.0,
            -cs["final_prev_T"],
            -cs["final_T"] / jnp.maximum(1.0 - alpha, 1e-37),
        )
        dL_dop = dL_dop + bg_coef * cs["bg_dot"]

        dL_dfcolor = jnp.where(alive[..., None], dL_dfcolor, 0.0)
        dL_dop = jnp.where(alive, dL_dop, 0.0)

        accum_rec = jnp.where(alive[..., None], accum_rec_new, s["accum_rec"])
        accum_recd = jnp.where(alive, accum_recd_new, s["accum_recd"])
        last_color = jnp.where(alive[..., None], col, s["last_color"])
        last_depth = jnp.where(alive, dep, s["last_depth"])
        last_alpha = jnp.where(alive, alpha, s["last_alpha"])

        # scatter (masked lanes contribute zeros at index 0)
        upd = dL_dfcolor[..., None, :] * (
            jnp.stack([i0, i1, i2], axis=-1)[..., None]
        ) * inten[..., None, None]  # [M, 3verts, 3ch]
        g_vcolor = gl["g_vcolor"].at[fv].add(upd, mode="drop")
        g_fopacity = gl["g_fopacity"].at[
            jnp.maximum(cf, 0)
        ].add(dL_dop, mode="drop")

        # terminate at the first face (backward.cu:363-366)
        reached_first = alive & (cf == cs["first_face"])
        newly_done = reached_first

        # walk backward (backward.cu:372-484)
        no_tet = alive & ~newly_done & (ct == -1)
        newly_done = newly_done | no_tet
        walk = alive & ~newly_done
        err, nf, nt, t2, u2, v2 = _step_through_tet(
            march, cf, ct, cs["ray_o"], cs["ray_d"], -1,
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
            last_color=last_color,
            last_depth=last_depth,
            accum_rec=accum_rec,
            accum_recd=accum_recd,
            done=s["done"] | newly_done,
        ), dict(step=gl["step"] + 1, g_vcolor=g_vcolor,
                g_fopacity=g_fopacity)

    _s, gl = _compacted_while(per_pixel, globals_, consts, body, max_steps)
    return gl["g_vcolor"], gl["g_fopacity"]


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
