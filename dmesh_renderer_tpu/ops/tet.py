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

Degenerate-input caveat (shared with the CUDA reference): a ray lying
EXACTLY in a face plane of the tessellation (possible on perfectly regular,
unjittered grids) produces exact u/v/t ties in the strict Moller-Trumbore
tests, where float32 op order decides hit vs miss -- any two correct
implementations (including the CUDA original on different hardware) can
disagree on such measure-zero rays (verified: a zero-jitter Freudenthal
grid diverges from the scalar spec on exactly the one image column whose
rays ride a grid plane; every other pixel matches to ~2e-7). This is why
the reference offers jittered rays (``ray_random_seed``,
cuda_renderer/forward.cu:82-88); use them (or jittered tessellations) for
regular grids.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..utils.config import DEFAULT_MAX_MARCH_STEPS, T_EPS, TILE_X, TILE_Y
from .binning import _gather_cols, _relayout
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

    Round 3 added ``mega [B*T, 96]``: tet_pack plus the shade rows of the
    tet's 4 slot faces, gathered as ONE row per step keyed by the gather
    tet (the per-step glue is gather-ROW-count-bound, ~10-15 ns/row
    regardless of width, tools/exp_march_variants.py). Round 4 replaces it
    with the ENTRY-SLOT-indexed ``mega [B*T*4, 64]``: row ``tet*4 + slot``
    carries the tet's pack (cols 0-47), the per-slot MIRROR indices (cols
    48-51: the slot of face ``tet_faces[t, j]`` inside its neighbor tet,
    so the kernel can emit the next gather index directly) and ONLY the
    entry face's shade (cols 52-63). Gather rows are unchanged; the row
    WIDTH drops 96 -> 64, which is pure relayout + kernel-DMA traffic
    saved (~0.3 ms/step at the bench scene), and the kernel drops the
    4-way entry-slot shade selection (12 masked 4-term sums -> 12 direct
    reads). ``tet_pack``/``shade`` remain for the marching backward
    fallback.
    """
    F = faces.shape[0]
    T = tets.shape[0]
    # ONE packed corner gather (position + color; row ops are per-ROW
    # priced, so the [P, 6] table costs half of separate verts/color
    # gathers -- same fusion as tri_binned._build_face_table)
    pvt = jnp.concatenate([verts, verts_color], axis=1)  # [P, 6]
    gv = pvt[faces.reshape(-1)].reshape(F, 3, 6)
    p0, p1, p2 = gv[:, 0, :3], gv[:, 1, :3], gv[:, 2, :3]
    e1 = p1 - p0
    e2 = p2 - p0
    n = jnp.cross(e1, e2)
    norm = jnp.maximum(jnp.sqrt(jnp.sum(n * n, axis=-1)), 1e-4)
    nhat = n / norm[..., None]
    geo = jnp.concatenate([p0, e1, e2, nhat], axis=1)  # [F, 12]

    tf = jnp.maximum(tet_faces, 0)  # [T, 4]
    centers = jnp.mean(verts[tets], axis=1)  # [T, 3]
    # gather geo ONCE per (tet, slot); p0/nhat are slices of it
    geo_tf = geo[tf]  # [T, 4, 12]
    flip = jnp.sum(
        geo_tf[..., 9:12] * (centers[:, None, :] - geo_tf[..., 0:3]),
        axis=-1,
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
            geo_tf[..., 0:9].reshape(T, 36),  # p0, e1, e2 per slot
            sign,
            tet_faces.astype(jnp.float32),
            nbr.astype(jnp.float32),
        ],
        axis=1,
    )  # [T, 48]

    col9 = gv[:, :, 3:6].reshape(F, 9)
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

    # mirror[t, j]: slot of face tf[t, j] within its neighbor tet
    # nbr[t, j] (0 when there is no neighbor; the kernel then uses the
    # exiting tet's own slot, so the value is never consumed)
    tfn = tf[jnp.maximum(nbr, 0)]  # [T, 4, 4]
    mirror = jnp.argmax(
        (tfn == tf[:, :, None]).astype(jnp.int32), axis=-1
    ).astype(jnp.float32)  # [T, 4]

    shade_bt = shade.reshape(B, F, 12)[:, tf]  # [B, T, 4, 12]
    pack52 = jnp.concatenate([tet_pack, mirror], axis=1)  # [T, 52]
    mega = jnp.concatenate(
        [
            jnp.broadcast_to(pack52[None, :, None, :], (B, T, 4, 52)),
            shade_bt,
        ],
        axis=-1,
    ).reshape(B * T * 4, 64)
    return {"tet_pack": tet_pack, "shade": shade, "geo": geo, "sign": sign,
            "mega": mega}


BQ_MAX = 16  # row-groups (of 128 rays) per kernel block




def _pack_rows(rows) -> Array:
    """Stack 1-D [M] arrays into the kernel state layout [M/128, NS, 128]."""
    m = rows[0].shape[0]
    ns = len(rows)
    return jnp.stack(rows).reshape(ns, m // 128, 128).swapaxes(0, 1)


def _unpack_rows(st: Array, n: int):
    """Inverse of _pack_rows: n 1-D [M] arrays from [M/128, NS, 128]."""
    g = st.shape[0]
    return [st[:, r, :].reshape(g * 128) for r in range(n)]


def _pick_bq(g: int) -> int:
    for b in (BQ_MAX, 8, 4, 2, 1):
        if g % b == 0:
            return b
    return 1


def _flat_cols(rows: Array, k: int) -> list:
    """[M, k] -> k clean 1-D [M] columns via one physical relayout (a
    [M, k] buffer pads k to 128 lanes; per-column strided slices would
    each pay a full padded pass)."""
    r = _relayout(rows, k)
    m = rows.shape[0]
    return [r[:, c, :].reshape(m) for c in range(k)]


def _per_view(coef_b: Array, n: int, m: int) -> Array:
    """Broadcast a per-view scalar [B] to the flattened padded ray buffer
    [m] (views are contiguous n-blocks; padding lanes get view B-1's
    value, harmless -- they are done from step 0)."""
    x = jnp.broadcast_to(coef_b[:, None], (coef_b.shape[0], n)).reshape(-1)
    if m > x.shape[0]:
        x = jnp.concatenate(
            [x, jnp.broadcast_to(x[-1:], (m - x.shape[0],))])
    return x


def _projective_zw(ro, rd, mv_t, proj_t, n, m):
    """z/w rows of the homogeneous ray through the full camera transform,
    on flat [M] component vectors.

    The reference re-projects the 3D intersection point every march step
    to get its NDC depth (forward.cu:628-632). proj(mv(o + t d)) is affine
    in t in homogeneous space, so precompute ph_o = P(M(o)) and
    ph_d = P_lin(M_lin(d)) once per pixel; per step the depth is just
    (ph_o.z + t ph_d.z) / clamp_w(ph_o.w + t ph_d.w). Arithmetic order
    matches transform_point43/44 exactly (auxiliary.h:71-90).
    """
    rox, roy, roz = ro
    rdx, rdy, rdz = rd
    mv = lambda j, i: _per_view(mv_t[:, j, i], n, m)
    pj = lambda j, i: _per_view(proj_t[:, j, i], n, m)
    pvo = [rox * mv(0, i) + roy * mv(1, i) + roz * mv(2, i) + mv(3, i)
           for i in range(3)]
    dv = [rdx * mv(0, i) + rdy * mv(1, i) + rdz * mv(2, i)
          for i in range(3)]
    phoz = pvo[0] * pj(0, 2) + pvo[1] * pj(1, 2) + pvo[2] * pj(2, 2) \
        + pj(3, 2)
    phow = pvo[0] * pj(0, 3) + pvo[1] * pj(1, 3) + pvo[2] * pj(2, 3) \
        + pj(3, 3)
    phdz = dv[0] * pj(0, 2) + dv[1] * pj(1, 2) + dv[2] * pj(2, 2)
    phdw = dv[0] * pj(0, 3) + dv[1] * pj(1, 3) + dv[2] * pj(2, 3)
    return phoz, phow, phdz, phdw


def _connectivity_step(pcol, cf, ox, oy, oz, dx, dy, dz, direction,
                       with_slots=False):
    """One connectivity step of the march on (rows, 128) vectors (runs
    INSIDE the Pallas march kernels; pcol(c) reads tet-pack column c).

    direction=+1: forward walk (exit face: outward normal . d > 0,
    entry-face normal must satisfy . d < 0) -- forward.cu:672-775.
    direction=-1: backward walk (signs flipped) -- backward.cu:372-484.

    cf is the current face id as exact f32. Returns (err, next_face,
    next_tet, next_t, next_u, next_v[, next_slot, own_slot]); err marks
    the reference's invariant violations (cases 1-3). The reference keeps
    the LAST matching exit candidate in slot order and falls back to
    slot 0 when none match (the err lanes' values are never consumed).

    ``with_slots`` (forward mega path): also select the exit face's
    MIRROR slot inside the neighbor tet (pack col 48+j, _march_tables)
    and the exit face's own slot j, so the caller can emit the next
    entry-slot gather index ``nt*4 + next_slot`` (or ``ct*4 + own_slot``
    at a boundary) without any id lookup."""
    n_other = jnp.zeros_like(dx)
    n_exit = jnp.zeros_like(dx)
    d_entry = jnp.zeros_like(dx)
    nt_ = nu_ = nv_ = nface = ntet = None
    nslot = jown = None

    for j in range(4):
        p0x, p0y, p0z = pcol(9 * j + 0), pcol(9 * j + 1), pcol(9 * j + 2)
        e1x, e1y, e1z = pcol(9 * j + 3), pcol(9 * j + 4), pcol(9 * j + 5)
        e2x, e2y, e2z = pcol(9 * j + 6), pcol(9 * j + 7), pcol(9 * j + 8)
        sgn = pcol(36 + j)
        tfj = pcol(40 + j)
        nbj = pcol(44 + j)

        # unit normal recomputed with the exact op order of _march_tables'
        # precompute (bit-identical; auxiliary.h:366-369)
        nx = e1y * e2z - e1z * e2y
        ny = e1z * e2x - e1x * e2z
        nz = e1x * e2y - e1y * e2x
        norm = jnp.maximum(jnp.sqrt(nx * nx + ny * ny + nz * nz), 1e-4)
        outd = sgn * ((nx / norm) * dx + (ny / norm) * dy + (nz / norm) * dz)

        # Moller-Trumbore (identical arithmetic to
        # geometry.ray_tri_intersection on precomputed edges)
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

        is_entry = tfj == cf
        other = ~is_entry
        n_other = n_other + other.astype(jnp.float32)
        # entry-face outward dot (error case 2, forward.cu:704-717)
        d_entry = d_entry + jnp.where(is_entry, outd, 0.0)

        dir_ok = outd > 0.0 if direction > 0 else outd < 0.0
        ex = other & hit & dir_ok
        n_exit = n_exit + ex.astype(jnp.float32)

        if j == 0:
            nt_, nu_, nv_, nface, ntet = t, u, v, tfj, nbj
            if with_slots:
                nslot = pcol(48)
                jown = jnp.zeros_like(tfj)
        else:
            nt_ = jnp.where(ex, t, nt_)
            nu_ = jnp.where(ex, u, nu_)
            nv_ = jnp.where(ex, v, nv_)
            nface = jnp.where(ex, tfj, nface)
            ntet = jnp.where(ex, nbj, ntet)
            if with_slots:
                nslot = jnp.where(ex, pcol(48 + j), nslot)
                jown = jnp.where(ex, jnp.float32(j), jown)

    err1 = n_other != 3.0  # error case 1 (forward.cu:687-691)
    err2 = d_entry >= 0.0 if direction > 0 else d_entry <= 0.0
    err3 = n_exit != 1.0  # error case 3 (forward.cu:755-759)
    err = err1 | err2 | err3
    if with_slots:
        return err, nface, ntet, nt_, nu_, nv_, nslot, jown
    return err, nface, ntet, nt_, nu_, nv_


# Forward kernel state rows ([M/128, NSF, 128]; ids/flags/counters as
# exact f32 -- ids < 2**24, flags 0/1). _K_GT is the "gather tet": the tet
# whose mega row is fetched next step. It equals the current tet while
# inside the tessellation, but when the walk exits (next tet -1) it keeps
# the tet being exited, whose slots still contain the boundary face -- the
# final blend of that face (forward.cu:628-653 happens before the
# no-next-tet check) needs its shade columns.
(_K_T, _K_U, _K_V, _K_CF, _K_CT, _K_LOGT, _K_TCUR, _K_PLT, _K_CR, _K_CG,
 _K_CB, _K_D, _K_LF, _K_LT, _K_NC, _K_ACT, _K_DONE, _K_GT) = range(18)
_NSF2 = 18  # forward state rows (incl. _K_GT)

# Forward march log rows, one slab per global step (the backward REPLAYS
# the blend from this log instead of re-walking the connectivity: zero
# gathers, zero per-step scatters -- see _render_tet_backward_replay).
(_L_CF, _L_ALPHA, _L_TBEF, _L_U, _L_V, _L_CR, _L_CG, _L_CB, _L_DEP,
 _L_INTEN) = range(10)
_NLOG = 10
# Static march-log depth: walks no deeper than this replay on the fast
# path; deeper walks (rare; bench-scene p100 = 17) fall back to the
# marching backward. Memory: LOG_CAP * M * _NLOG * 4 bytes.
LOG_CAP = 24
# Shared ray/projective-depth const rows
(_C_OX, _C_OY, _C_OZ, _C_DX, _C_DY, _C_DZ, _C_POZ, _C_POW, _C_PDZ,
 _C_PDW) = range(10)
# Backward-only const rows
(_C_GCR, _C_GCG, _C_GCB, _C_GD, _C_BGD, _C_FT, _C_FPT, _C_FF) = range(10, 18)
# Backward kernel state rows
(_B_T, _B_U, _B_V, _B_CF, _B_CT, _B_PLT, _B_FIRST, _B_LA, _B_LCR, _B_LCG,
 _B_LCB, _B_LD, _B_AR, _B_AG, _B_AB, _B_AD, _B_DONE) = range(17)
_NSB = 17
_NREC = 10  # backward per-ray gradient record rows appended after state


_LOG_TEPS01 = float(np.log(T_EPS * 0.1))


def _shade_col(shade_ref, c):
    return shade_ref[:, c, :]


def _fwd_march_kernel(mega_ref, consts_ref, state_ref, out_ref):
    """One forward march step for a (BQ, 128)-ray block: blend the current
    face, update transmittance/termination state, and walk to the next
    face -- the entire body of forward.cu:595-788 in ONE fused pass.

    All per-ray state rides in f32 rows (see _K_* indices); the XLA side
    does the single mega-table gather (keyed by _K_GT, an ENTRY-SLOT
    index ``tet*4 + slot`` into the [B*T*4, 64] mega table) and the
    int<->f32 id conversions. The entry face's shade columns sit directly
    at cols 52-63 of the gathered row (no 4-way slot selection), and the
    per-step blend quantities are appended as _NLOG log rows for the
    replay backward."""
    s = lambda r: state_ref[:, r, :]
    c = lambda r: consts_ref[:, r, :]
    m = lambda k: mega_ref[:, k, :]
    alive = s(_K_DONE) == 0.0
    cf, ct = s(_K_CF), s(_K_CT)
    u0, v0, t0 = s(_K_U), s(_K_V), s(_K_T)

    # --- 1. blend current face (forward.cu:597-653); the gathered row IS
    # the (tet, entry slot) row, so shade reads are direct ---
    def shade_col(col):
        return m(52 + col)

    alpha = shade_col(9)
    l1a = shade_col(10)
    inten = shade_col(11)
    w = jnp.where(alive, s(_K_TCUR) * alpha, 0.0)
    col = [
        (shade_col(ch)
         + (shade_col(3 + ch) - shade_col(ch)) * u0
         + (shade_col(6 + ch) - shade_col(ch)) * v0) * inten
        for ch in range(3)
    ]
    dep = (c(_C_POZ) + t0 * c(_C_PDZ)) / clamp_w(c(_C_POW) + t0 * c(_C_PDW))

    tbef = s(_K_TCUR)  # transmittance BEFORE this blend (replay's prev_T)
    prev_log_T = jnp.where(alive, s(_K_LOGT), s(_K_PLT))
    log_T_new = jnp.where(alpha < 1.0, s(_K_LOGT) + l1a, _LOG_TEPS01)
    log_T = jnp.where(alive, log_T_new, s(_K_LOGT))
    T_cur = jnp.exp(log_T)  # the step's single transcendental
    t_exhausted = T_cur < T_EPS

    aliv_f = alive.astype(jnp.float32)
    active = (s(_K_ACT) != 0.0) | (alive & t_exhausted)
    newly_done = alive & t_exhausted

    # --- 2. exited the tessellation? (forward.cu:667-670) ---
    no_tet = alive & (ct == -1.0)
    active = active | no_tet
    newly_done = newly_done | no_tet

    # --- 3. walk to the next face (forward.cu:672-775) ---
    walk = alive & ~newly_done
    err, nf, nt, t2, u2, v2, nslot, jown = _connectivity_step(
        m, cf,
        c(_C_OX), c(_C_OY), c(_C_OZ), c(_C_DX), c(_C_DY), c(_C_DZ), +1,
        with_slots=True)
    newly_done = newly_done | (walk & err)
    advance = walk & ~err

    out_ref[:, _K_T, :] = jnp.where(advance, t2, t0)
    out_ref[:, _K_U, :] = jnp.where(advance, u2, u0)
    out_ref[:, _K_V, :] = jnp.where(advance, v2, v0)
    out_ref[:, _K_CF, :] = jnp.where(advance, nf, cf)
    out_ref[:, _K_CT, :] = jnp.where(advance, nt, ct)
    out_ref[:, _K_LOGT, :] = log_T
    out_ref[:, _K_TCUR, :] = T_cur
    out_ref[:, _K_PLT, :] = prev_log_T
    out_ref[:, _K_CR, :] = s(_K_CR) + col[0] * w
    out_ref[:, _K_CG, :] = s(_K_CG) + col[1] * w
    out_ref[:, _K_CB, :] = s(_K_CB) + col[2] * w
    out_ref[:, _K_D, :] = s(_K_D) + dep * w
    out_ref[:, _K_LF, :] = jnp.where(alive, cf, s(_K_LF))
    out_ref[:, _K_LT, :] = jnp.where(alive, ct, s(_K_LT))
    out_ref[:, _K_NC, :] = s(_K_NC) + aliv_f
    out_ref[:, _K_ACT, :] = active.astype(jnp.float32)
    out_ref[:, _K_DONE, :] = ((s(_K_DONE) != 0.0)
                              | newly_done).astype(jnp.float32)
    # the next step must gather the (tet, entry slot) row of the NEW
    # current face: the neighbor's mirror slot when a neighbor exists,
    # else the exit face's own slot of the tet being exited (boundary --
    # its final blend still needs that face's shade). ids < 2^22 so the
    # f32 multiply-add is exact.
    out_ref[:, _K_GT, :] = jnp.where(
        advance,
        jnp.where(nt >= 0.0, nt * 4.0 + nslot, ct * 4.0 + jown),
        s(_K_GT))

    # --- 4. march log slab for the replay backward (masked to this step's
    # blends; dead lanes log cf -1 -> dropped key) ---
    out_ref[:, _NSF2 + _L_CF, :] = jnp.where(alive, cf, -1.0)
    out_ref[:, _NSF2 + _L_ALPHA, :] = alpha * aliv_f
    out_ref[:, _NSF2 + _L_TBEF, :] = tbef * aliv_f
    out_ref[:, _NSF2 + _L_U, :] = u0 * aliv_f
    out_ref[:, _NSF2 + _L_V, :] = v0 * aliv_f
    out_ref[:, _NSF2 + _L_CR, :] = col[0] * aliv_f
    out_ref[:, _NSF2 + _L_CG, :] = col[1] * aliv_f
    out_ref[:, _NSF2 + _L_CB, :] = col[2] * aliv_f
    out_ref[:, _NSF2 + _L_DEP, :] = dep * aliv_f
    out_ref[:, _NSF2 + _L_INTEN, :] = inten * aliv_f


def _bwd_march_kernel(pack_ref, shade_ref, consts_ref, state_ref, out_ref):
    """One backward march step (backward.cu:235-486) in one fused pass.

    Emits the per-ray gradient record rows (_NREC) after the state rows:
    9 vertex-color contributions (vert-major) and dL/d(face opacity); the
    XLA side scatter-adds them into the per-face [F, 10] accumulator."""
    s = lambda r: state_ref[:, r, :]
    c = lambda r: consts_ref[:, r, :]
    alive = s(_B_DONE) == 0.0
    cf, ct = s(_B_CF), s(_B_CT)
    i1, i2 = s(_B_U), s(_B_V)
    i0 = 1.0 - i1 - i2
    t0 = s(_B_T)

    alpha = _shade_col(shade_ref, 9)
    l1a = _shade_col(shade_ref, 10)
    inten = _shade_col(shade_ref, 11)
    col = [
        (i0 * _shade_col(shade_ref, ch)
         + i1 * _shade_col(shade_ref, 3 + ch)
         + i2 * _shade_col(shade_ref, 6 + ch)) * inten
        for ch in range(3)
    ]
    dep = (c(_C_POZ) + t0 * c(_C_PDZ)) / clamp_w(c(_C_POW) + t0 * c(_C_PDW))

    # reconstruct prev transmittance (backward.cu:273-277); log(1-alpha)
    # comes precomputed from the shade table
    first0 = s(_B_FIRST) != 0.0
    plt = jnp.where(alive & ~first0, s(_B_PLT) - l1a, s(_B_PLT))
    first = first0 & ~alive
    prev_T = jnp.exp(plt)

    la = s(_B_LA)
    acc_r_new = la * s(_B_LCR) + (1.0 - la) * s(_B_AR)
    acc_g_new = la * s(_B_LCG) + (1.0 - la) * s(_B_AG)
    acc_b_new = la * s(_B_LCB) + (1.0 - la) * s(_B_AB)
    acc_d_new = la * s(_B_LD) + (1.0 - la) * s(_B_AD)

    dL_dop = (
        ((col[0] - acc_r_new) * c(_C_GCR)
         + (col[1] - acc_g_new) * c(_C_GCG)
         + (col[2] - acc_b_new) * c(_C_GCB))
        + (dep - acc_d_new) * c(_C_GD)
    ) * prev_T

    # background term (backward.cu:317-339)
    bg_coef = jnp.where(
        alpha == 1.0,
        -c(_C_FPT),
        -c(_C_FT) / jnp.maximum(1.0 - alpha, 1e-37),
    )
    dL_dop = jnp.where(alive, dL_dop + bg_coef * c(_C_BGD), 0.0)

    # per-face gradient record: dL_dvcolor contribution of vertex v,
    # channel ch is gc_ch * alpha * prev_T * bary_v * inten (masked lanes
    # contribute zeros)
    wmask = jnp.where(alive, inten * prev_T * alpha, 0.0)
    bary = (i0, i1, i2)
    gc = (c(_C_GCR), c(_C_GCG), c(_C_GCB))
    for v in range(3):
        for ch in range(3):
            out_ref[:, _NSB + v * 3 + ch, :] = wmask * bary[v] * gc[ch]
    out_ref[:, _NSB + 9, :] = dL_dop

    # terminate at the first face (backward.cu:363-366)
    newly_done = alive & (cf == c(_C_FF))
    no_tet = alive & ~newly_done & (ct == -1.0)
    newly_done = newly_done | no_tet

    # walk backward (backward.cu:372-484)
    walk = alive & ~newly_done
    err, nf, nt, t2, u2, v2 = _connectivity_step(
        lambda k: pack_ref[:, k, :], cf,
        c(_C_OX), c(_C_OY), c(_C_OZ), c(_C_DX), c(_C_DY), c(_C_DZ), -1)
    newly_done = newly_done | (walk & err)
    advance = walk & ~err

    out_ref[:, _B_T, :] = jnp.where(advance, t2, t0)
    out_ref[:, _B_U, :] = jnp.where(advance, u2, i1)
    out_ref[:, _B_V, :] = jnp.where(advance, v2, i2)
    out_ref[:, _B_CF, :] = jnp.where(advance, nf, cf)
    out_ref[:, _B_CT, :] = jnp.where(advance, nt, ct)
    out_ref[:, _B_PLT, :] = jnp.where(alive, plt, s(_B_PLT))
    out_ref[:, _B_FIRST, :] = first.astype(jnp.float32)
    out_ref[:, _B_LA, :] = jnp.where(alive, alpha, la)
    out_ref[:, _B_LCR, :] = jnp.where(alive, col[0], s(_B_LCR))
    out_ref[:, _B_LCG, :] = jnp.where(alive, col[1], s(_B_LCG))
    out_ref[:, _B_LCB, :] = jnp.where(alive, col[2], s(_B_LCB))
    out_ref[:, _B_LD, :] = jnp.where(alive, dep, s(_B_LD))
    out_ref[:, _B_AR, :] = jnp.where(alive, acc_r_new, s(_B_AR))
    out_ref[:, _B_AG, :] = jnp.where(alive, acc_g_new, s(_B_AG))
    out_ref[:, _B_AB, :] = jnp.where(alive, acc_b_new, s(_B_AB))
    out_ref[:, _B_AD, :] = jnp.where(alive, acc_d_new, s(_B_AD))
    out_ref[:, _B_DONE, :] = ((s(_B_DONE) != 0.0)
                              | newly_done).astype(jnp.float32)


def _run_fwd_march(mega_t, consts_t, state_t):
    """Launch one forward march step (mega-table kernel) over the ray
    row-groups; returns [G, _NSF2 + _NLOG, 128] (state rows + log slab)."""
    from .tri_binned import _interpret
    import jax.experimental.pallas as pl

    g = state_t.shape[0]
    bq = _pick_bq(g)
    n_out = _NSF2 + _NLOG
    return pl.pallas_call(
        _fwd_march_kernel,
        grid=(g // bq,),
        in_specs=[
            pl.BlockSpec((bq, 64, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((bq, 10, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((bq, _NSF2, 128), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bq, n_out, 128), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((g, n_out, 128), jnp.float32),
        interpret=_interpret(),
    )(mega_t, consts_t, state_t)


def _to_rows(t):
    """Inverse of binning._relayout: packed [G, K, 128] -> row-major
    [G*128, K] (one physical relayout pass), so a ray subset moves through
    ONE row-gather/scatter instead of K 1-D ones (row ops are counted per
    row regardless of width, tools/exp_honest.py)."""
    g, k, _ = t.shape
    return t.swapaxes(1, 2).reshape(g * 128, k)


def _split_mega_views(mega, view_blocks):
    """Materialize each view's [T*4, 64] slice of the mega table as its
    OWN buffer (B > 1 only; None otherwise).

    The B=2 march super-linearity (14.5 ms/step vs the size-linear 6.6
    measured on ONE 800x1600 view with the identical M -- the composed
    loop differs only in the gather's source buffer) is a gather
    SOURCE-BUFFER effect: the multi-view table spans 2x the address range
    and the step gather loses its coherent-rate fast path. Slicing inside
    the gather expression does NOT help -- XLA folds ``mega[lo:hi][idx]``
    into an offset gather from the same physical buffer (measured neutral,
    tools/exp_b2_bq.py history) -- so the slices are pinned with
    optimization_barrier into real per-view buffers, hoisted out of the
    march loop as loop invariants. Each step then gathers from B=1-sized
    sources."""
    if view_blocks is None or view_blocks[0] == 1:
        return None
    B, _N = view_blocks
    t4 = mega.shape[0] // B
    return [lax.optimization_barrier(mega[b * t4:(b + 1) * t4])
            for b in range(B)]


def _mega_gather_packed(mega, megas, tb, gt, view_blocks):
    """The march's per-step mega-table row gather, returned PACKED
    ([G, 64, 128] via _relayout).

    ``view_blocks = (B, N)`` when the ray buffer is still view-contiguous
    (the full-width phase; view b owns rays [b*N, (b+1)*N), padding rides
    view B-1): gather each view's rays from its MATERIALIZED table (see
    _split_mega_views; ``gt`` is tet-scale and view-local, the table
    provides the view offset) and concatenate the per-view PACKED blocks
    -- when per-view row counts are multiples of 128 (every production
    view size; 800^2 = 5000 * 128) this equals one relayout of the flat
    gather bit-for-bit; otherwise the per-view row gathers concatenate
    first and relayout once. ``megas=None`` (B == 1, or compacted tail
    phases that mix views) takes the flat gather with the per-ray view
    offset ``tb``."""
    if megas is None:
        return _relayout(mega[tb + gt], 64)
    B, N = view_blocks
    m = gt.shape[0]
    spans = [(b * N, (b + 1) * N if b < B - 1 else m) for b in range(B)]
    if all((hi - lo) % 128 == 0 for lo, hi in spans):
        return jnp.concatenate(
            [_relayout(megas[b][gt[lo:hi]], 64)
             for b, (lo, hi) in enumerate(spans)], axis=0)
    rows = jnp.concatenate(
        [megas[b][gt[lo:hi]] for b, (lo, hi) in enumerate(spans)], axis=0)
    return _relayout(rows, 64)


def _phased_fwd_march(state_t, consts_t, tbase, mega, log_depth, max_steps,
                      view_blocks=None):
    """Lockstep forward march with compacted tail phases.

    The full-width phase pays every step over all rays, but transmittance
    kills most rays within a few face crossings (bench scene: >79% alive
    through step 8, ~10% past step 11, five rays at step 16 --
    tools/exp_alive_curve.py), so once the alive count fits an 8x smaller
    buffer the survivors are compacted (ordered by current tet, like
    _compacted_while does for the marching backward) and the march
    continues at tail width. The CUDA analog is free -- hardware retires
    finished threads (forward.cu:595) -- here the compaction gather buys
    the same pay-for-live-rays-only property. Each phase appends its own
    march-log segment; the replay backward walks the segments
    deepest-first (_render_tet_backward_replay).

    Returns ``(final full-width state, segs)``. ``segs[k]`` is a dict:
    ``log`` [log_depth, G_k, _NLOG, 128] (dead slabs carry face -1: the
    replay's s < n_contrib guard already excludes them per ray, but -1
    keeps every log consumer honest), ``start``/``end`` global-step
    scalars bounding the phase, and ``idx`` -- the row map into the
    PARENT segment's rows ([M_k] int32; None for the root segment).
    Because ``done`` is monotone and every phase boundary keeps all alive
    rays, the global step index is still each ray's blend index.
    """
    sizes = _march_phase_sizes(state_t.shape[0] * 128)
    megas = _split_mega_views(mega, view_blocks)

    def run(st, cst, tb, step0, level):
        g = st.shape[0]
        log0 = jnp.zeros((log_depth, g, _NLOG, 128), jnp.float32).at[
            :, :, _L_CF, :].set(-1.0)
        is_last = level == len(sizes) - 1
        vb = view_blocks if level == 0 else None  # tail phases mix views
        mgs = megas if level == 0 else None

        def cond(c):
            s, _log, step = c
            alive = s[:, _K_DONE, :] == 0.0
            base = (step < max_steps) & jnp.any(alive)
            if is_last:
                return base
            return base & (jnp.sum(alive.astype(jnp.int32))
                           > jnp.int32(sizes[level + 1]))

        def body(c):
            s, log, step = c
            gt = s[:, _K_GT, :].reshape(-1).astype(jnp.int32)
            mega_t = _mega_gather_packed(mega, mgs, tb, gt, vb)
            out = _run_fwd_march(mega_t, cst, s)
            log = lax.dynamic_update_slice(
                log, out[None, :, _NSF2:, :],
                ((step - step0) % log_depth, 0, 0, 0))
            return out[:, :_NSF2, :], log, step + 1

        st, log_l, step = lax.while_loop(cond, body, (st, log0, step0))
        segs = [dict(log=log_l, start=step0, end=step, idx=None)]
        if is_last:
            return st, step, segs

        # compact to the next size: alive rays first (stable; they all fit
        # by the cond), grouped by current tet so the per-step mega-row
        # gathers stay near-sequential in HBM. Row ops cost ~10 ns/ROW
        # regardless of width (tools/exp_honest.py), so the state/const
        # tables move through ONE packed row-gather each ([M2, K] rows),
        # never per-row-of-the-packed-layout 1-D gathers.
        done = st[:, _K_DONE, :].reshape(-1) != 0.0
        ct = st[:, _K_CT, :].reshape(-1).astype(jnp.int32)
        key = jnp.where(done, jnp.int32(2 ** 30), jnp.maximum(ct, 0))
        idx = jnp.argsort(key, stable=True)[:sizes[level + 1]]
        st_rows = _to_rows(st)      # [M, _NSF2]
        cst_rows = _to_rows(cst)    # [M, 10]
        sub_st = _relayout(st_rows[idx], _NSF2)
        sub_cst = _relayout(cst_rows[idx], 10)
        sub_st, step, sub_segs = run(sub_st, sub_cst, tb[idx], step,
                                     level + 1)
        sub_segs[0]["idx"] = idx
        res_rows = st_rows.at[idx].set(_to_rows(sub_st))
        return _relayout(res_rows, _NSF2), step, segs + sub_segs

    st, _step, segs = run(state_t, consts_t, tbase, jnp.int32(0), 0)
    return st, tuple(segs)


def _run_march_kernel(kernel, pack_t, shade_t, consts_t, state_t, n_out):
    """Launch one march-step kernel over the ray row-groups."""
    from .tri_binned import _interpret
    import jax.experimental.pallas as pl

    g = state_t.shape[0]
    bq = _pick_bq(g)
    nc = consts_t.shape[1]
    ns = state_t.shape[1]
    return pl.pallas_call(
        kernel,
        grid=(g // bq,),
        in_specs=[
            pl.BlockSpec((bq, 48, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((bq, 12, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((bq, nc, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((bq, ns, 128), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bq, n_out, 128), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((g, n_out, 128), jnp.float32),
        interpret=_interpret(),
    )(pack_t, shade_t, consts_t, state_t)


# =============================================================================
# Active-ray compaction
# =============================================================================

# The lockstep march pays every surviving iteration over the full pixel
# buffer, but transmittance kills most rays within a few face crossings --
# only silhouette-grazing rays walk far. Phase sizes shrink by this factor.
# Measured at 98k faces / 800px (phased FORWARD march + segmented replay,
# round 3): 8 -> 149 ms fwd+bwd vs 157 single-phase; 4 exits the full-width
# phase earlier but pays a wider tail in both the march and the replay
# (161 ms). The legacy marching backward's _compacted_while measured the
# same ranking (8 beats 2: 1155 vs 1239 ms, round 2).
COMPACT_SHRINK = 8
# Below this buffer size compaction is pure overhead (also keeps the tiny
# CPU test scenes on the single-phase path). A third ladder level (min
# 8192) ballooned compile time past 10 min at the bench scene -- two
# phases is the sweet spot.
COMPACT_MIN_SIZE = 65_536


# Hard cap on ladder depth: a third level ballooned compile time past
# 10 minutes at the bench scene (each level adds a lax.while_loop march
# phase AND a replay-segment unroll in the backward), so large multi-view
# buffers clamp to the measured two-phase sweet spot instead of growing
# the ladder with M.
MAX_MARCH_PHASES = 2


def _march_phase_sizes(m: int) -> list[int]:
    # sizes stay multiples of 128 so _relayout lane-major layout
    # applies at every compaction level
    sizes = [m]
    while (len(sizes) < MAX_MARCH_PHASES
           and sizes[-1] // COMPACT_SHRINK >= COMPACT_MIN_SIZE):
        nxt = sizes[-1] // COMPACT_SHRINK
        sizes.append(nxt + (-nxt) % 128)
    return sizes


def _compacted_while(state_t, consts_t, fbase, globals_, step_fn, max_steps,
                     cf_row, ct_row, done_row):
    """Run the march with periodic active-ray compaction, carrying the
    packed [G, NS, 128] state across iterations (unpacking per step would
    cost more than the kernel saves).

    step_fn(state_t, cf, ct, consts_t, fbase, globals_) -> (state_t,
    globals_), with cf/ct the int32 [M] views of the id rows. The done
    row must be monotone per ray (0 alive / nonzero done).

    Phase k loops until the alive count fits the next (8x smaller) buffer,
    then gathers the alive rays (stable: all alive pixels survive the cut
    by construction) and recurses; results scatter back on unwind. The
    CUDA analog is free: hardware schedules only non-retired threads
    (forward.cu:595 while-loop); on TPU the compaction gather buys the
    same "pay for live rays only" property.
    """
    ns = state_t.shape[1]
    nc = consts_t.shape[1]
    sizes = _march_phase_sizes(state_t.shape[0] * 128)

    def ids(st):
        cf = st[:, cf_row, :].reshape(-1).astype(jnp.int32)
        ct = st[:, ct_row, :].reshape(-1).astype(jnp.int32)
        return cf, ct

    def run(st, cst, fb, gl, level):
        is_last = level == len(sizes) - 1

        def cond(c):
            s, g = c
            alive = s[:, done_row, :] == 0.0
            base = (g["step"] < max_steps) & jnp.any(alive)
            if is_last:
                return base
            return base & (
                jnp.sum(alive.astype(jnp.int32)) > sizes[level + 1]
            )

        def body(c):
            s, g = c
            cf, ct = ids(s)
            return step_fn(s, cf, ct, cst, fb, g)

        st, gl = lax.while_loop(cond, body, (st, gl))
        if is_last:
            return st, gl

        # alive rays first, grouped by their current tet: rays in one tet
        # step to neighboring tets together, so this ordering makes the
        # per-step packed-row gathers near-sequential in HBM for the rest
        # of the march. All alive rays fit because the loop above only
        # exits below the next size (or fully done / step-capped, in which
        # case deeper phases no-op).
        done = st[:, done_row, :].reshape(-1) != 0.0
        _cf, ct = ids(st)
        key = jnp.where(done, jnp.int32(2**30), jnp.maximum(ct, 0))
        idx = jnp.argsort(key, stable=True)[:sizes[level + 1]]
        # packed row-gather/scatter: row ops are per-ROW priced, so the
        # whole [M_k, ns] state moves through ONE gather (and one scatter
        # on unwind) instead of ns separate 1-D ones -- the same fused
        # idiom as _phased_fwd_march
        st_rows = _to_rows(st)      # [M, ns]
        cst_rows = _to_rows(cst)    # [M, nc]
        sub_st = _relayout(st_rows[idx], ns)
        sub_cst = _relayout(cst_rows[idx], nc)
        sub_st, gl = run(sub_st, sub_cst, fb[idx], gl, level + 1)
        res_rows = st_rows.at[idx].set(_to_rows(sub_st))
        return _relayout(res_rows, ns), gl

    return run(state_t, consts_t, fbase, globals_, 0)


# =============================================================================
# Forward march
# =============================================================================

def _render_tet_forward(verts, faces, verts_color, faces_opacity, mv_t,
                        proj_t, inv_mv_t, inv_proj_t, faces_intense, tets,
                        face_tets, tet_faces, bg, height, width, seed,
                        max_steps, kcap=None, view_offset=None):
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
        jitter_seed=seed if seed > 0 else None, view_offset=view_offset,
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
        # sort/gather chain scales with this capacity. Overflow is surfaced
        # AS DATA in the aux output (the axon backend cannot print debug
        # warnings); callers can right-size via
        # render_tet(..., return_aux=True) or TetRenderSettings.key_capacity.
        # measured at the 98k-face bench scene: 3.3 tiles/face average
        # (tools/profile_tet_fixed.py context); 5 leaves 1.5x headroom
        if kcap is None:
            kcap = default_key_capacity(B, faces.shape[0],
                                        avg_tiles_per_face=5)
        first_face, rt, iu, iv, fh_aux = first_intersection_binned(
            verts, faces, pre, img, inv_mv_t[:, 3, :3], ray_d_img,
            height, width, B, kcap,
        )
    else:
        sort_key = jnp.where(pre["valid"], pre["min_depth"], jnp.inf)
        order = jnp.argsort(sort_key, axis=1, stable=True)
        first_face, rt, iu, iv = _first_intersection(
            verts, faces, pre["valid"], order, ray_o, ray_d
        )
        # dense path scans every (valid) face: no capacity, cannot drop
        fh_aux = (jnp.asarray(False), jnp.asarray(-1, jnp.int32),
                  jnp.asarray(-1, jnp.int32))

    march = _march_tables(verts, faces, tets, tet_faces, face_tets,
                          verts_color, faces_opacity, faces_intense)

    # flatten to [M] (padded to a multiple of 128; padding lanes are done
    # from step 0) and split every vector quantity into clean 1-D [M]
    # components immediately: [B, N, k] arrays pad k to 128 lanes on TPU
    # and every op on them pays a full padded pass (see _relayout)
    M0 = B * N
    pad = (-M0) % 128
    M = M0 + pad

    def flat(x, fill=0):
        x = x.reshape((M0,) + x.shape[2:])
        if pad:
            x = jnp.concatenate(
                [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)])
        return x

    T_n = tets.shape[0]
    # per-ray view offset into the entry-slot mega table [B*T*4, 64]
    tbase = jnp.minimum(jnp.arange(M, dtype=jnp.int32) // N, B - 1) \
        * (4 * T_n)

    ro = _flat_cols(flat(ray_o), 3)
    rd = _flat_cols(flat(ray_d), 3)
    phoz, phow, phdz, phdw = _projective_zw(ro, rd, mv_t, proj_t, N, M)

    ffF = flat(first_face)
    ff_safe = jnp.maximum(ffF, 0)

    # starting tet: the side whose outward first-face normal opposes the ray
    # (forward.cu:420-444; when both qualify the second entry wins)
    g12 = _gather_cols(march["geo"], ff_safe, 12)
    ndot_ff = g12[9] * rd[0] + g12[10] * rd[1] + g12[11] * rd[2]
    ftc = _gather_cols(face_tets.astype(jnp.float32), ff_safe, 2)
    # per-tet (face ids, outward signs) in one 8-col row
    tfs = jnp.concatenate(
        [tet_faces.astype(jnp.float32), march["sign"]], axis=1)  # [T, 8]
    first_tet = jnp.full((M,), -1, jnp.int32)
    first_slot = jnp.zeros((M,), jnp.int32)
    ff_f = ffF.astype(jnp.float32)
    for i in range(2):
        cand = ftc[i].astype(jnp.int32)
        c8 = _gather_cols(tfs, jnp.maximum(cand, 0), 8)
        # at most one slot of a tet carries first_face, so the masked sums
        # extract that slot's sign (and index) exactly
        sgn = sum(jnp.where(c8[j] == ff_f, c8[4 + j], 0.0)
                  for j in range(4))
        slt = sum(jnp.where(c8[j] == ff_f, j, 0)
                  for j in range(1, 4))
        opposes = sgn * ndot_ff < 0.0
        take = (cand >= 0) & opposes & (ffF >= 0)
        first_tet = jnp.where(take, cand, first_tet)
        first_slot = jnp.where(take, slt, first_slot)

    done0 = (ffF == -1) | (first_tet == -1)

    consts_t = _pack_rows([
        ro[0], ro[1], ro[2], rd[0], rd[1], rd[2],
        phoz, phow, phdz, phdw,
    ])
    f32 = lambda x: x.astype(jnp.float32)
    zero = jnp.zeros((M,), jnp.float32)
    state_t = _pack_rows([
        flat(rt), flat(iu), flat(iv),
        f32(ffF), f32(first_tet),
        zero,                        # log_T
        jnp.ones((M,), jnp.float32),  # T_cur = exp(log_T), carried so each
                                      # step costs ONE exp, not two
        zero,                        # prev_log_T
        zero, zero, zero, zero,      # Cr Cg Cb D
        jnp.full((M,), -1.0),        # last_face
        jnp.full((M,), -1.0),        # last_tet
        zero,                        # n_contrib
        zero,                        # active
        f32(done0 | (jnp.arange(M) >= M0)),
        # gather index (_K_GT): entry-slot row of the first face within
        # the first tet (done lanes gather row 0, masked in-kernel)
        f32(jnp.maximum(first_tet * 4 + first_slot, 0)),
    ])

    # Phased lockstep march: full width while most rays live, compacted
    # tail once the survivors fit an 8x smaller buffer (see
    # _phased_fwd_march). Each phase appends its own march-log segment.
    log_depth = max(1, min(LOG_CAP, int(max_steps)))
    st, march_segs = _phased_fwd_march(state_t, consts_t, tbase,
                                       march["mega"], log_depth, max_steps,
                                       view_blocks=(B, N))
    rows = _unpack_rows(st, _NSF2)
    i32 = lambda x: x.astype(jnp.int32)
    shape2 = lambda x: x[:M0].reshape(B, N)

    final_T = jnp.exp(rows[_K_LOGT])  # [M]
    act = rows[_K_ACT] != 0.0
    # channel-major assembly: every op on clean [M] vectors, then one
    # stack to the [B, 3, H, W] output layout
    col = [jnp.where(act, rows[[_K_CR, _K_CG, _K_CB][ch]]
                     + final_T * bg[ch], bg[ch])[:M0].reshape(B, height,
                                                              width)
           for ch in range(3)]
    color = jnp.stack(col, axis=1)  # [B, 3, H, W]
    depth = jnp.where(act, rows[_K_D] + final_T * 1.0,
                      1.0)[:M0].reshape(B, 1, height, width)
    active_img = act[:M0].reshape(B, height, width)

    saved = dict(
        first_face=first_face,
        last_face=i32(shape2(rows[_K_LF])),
        last_tet=i32(shape2(rows[_K_LT])),
        final_log_T=shape2(rows[_K_LOGT]),
        final_prev_log_T=shape2(rows[_K_PLT]),
        n_contrib=i32(shape2(rows[_K_NC])),
        is_active=shape2(rows[_K_ACT]) != 0.0,
        fh_overflow=fh_aux[0],
        fh_num_rendered=fh_aux[1],
        fh_walked=fh_aux[2],
        march_segs=march_segs,
    )
    return color, depth, active_img, saved


# =============================================================================
# Backward: log replay (fast path)
# =============================================================================

# March-log steps reduced per batch; batches whose steps all exceed the
# longest walk are skipped under lax.cond.
REPLAY_REDUCE_BATCH = 6

# Per-128-lane-block survivor budgets for the one-hot run extraction.
# Adjacent rays walk in phase (mean same-face run length ~10 at the bench
# scene: 536k runs for 5.37M blend events, tools/exp_runstats.py), so a
# 128-slot block holds ~10.6 valid runs on average; only 5.7% of live
# blocks exceed 16 and the worst holds 26 (tools/exp_block_runstats.py).
# Extraction is TWO-PASS: pass 1 extracts runs 1..K1 for every block
# (the one-hot tensor, its MXU contraction, and the survivor scatter are
# all K1-priced); the rare blocks with more runs are compacted into an
# R // REPLAY_OVF_FRAC budget and a second extraction covers runs
# K1+1..K. A batch whose worst block exceeds K -- or whose overflow-block
# count exceeds the budget -- falls back to the full-width scatter under
# lax.cond: records are never dropped.
REPLAY_BLOCK_K1 = 16
# Total per-block budget. The pass-2 scatter is (R/OVF_FRAC)*(K - K1)
# rows, so K prices the overflow pass directly: the bench scene's worst
# block holds 26 runs (p99 19 -- tools/exp_block_runstats.py, r4), so 32
# keeps a margin while halving pass-2 rows vs the former 48. A scene
# whose worst block exceeds K falls back to the full-width scatter under
# the existing lax.cond -- slower, never wrong.
REPLAY_BLOCK_K = 32
REPLAY_OVF_FRAC = 8

# Batches covering the walk's tail are mostly DEAD at block granularity
# (rays die spatially clustered, so whole 128-lane blocks go invalid
# together). When a batch's live-block count fits R // this fraction, the
# live blocks are compacted first -- 1-D ops at R scale (~30k) are near
# free -- so the extraction AND its survivor scatter shrink by the same
# factor. Batches with more live blocks skip the compaction (cond).
REPLAY_BLOCK_COMPACT_FRAC = 8


def _render_tet_backward_replay(verts, faces, bg, saved, dL_dcolor,
                                dL_ddepth, B, height, width):
    """Replay backward (backward.cu:86-487 semantics) from the forward's
    march log -- NO connectivity re-walk, NO per-step table gathers, NO
    per-step gradient scatters.

    The forward logs every blend's (face, alpha, prev_T, u, v, color,
    depth, inten) per global step; because a ray's alive steps are the
    consecutive prefix 0..n_contrib-1 of global steps, replaying global
    steps in descending order visits each ray's faces in exactly the
    reverse order the marching backward walks them. The suffix
    accumulators (backward.cu:262-284) are pure elementwise recurrences on
    the logged rows, and prev_T comes straight from the log instead of the
    division-chain reconstruction (backward.cu:273-277) -- numerically
    tighter, identical in exact arithmetic.

    Gradient records (9 vertex-color moments + dL/d(opacity), keyed by
    face) are reduced to per-face sums by the one-hot MXU run extraction:
    adjacent rays walk in phase, so each 128-lane block of a replay batch
    holds only ~11 distinct face RUNS; per-block run ids from an in-block
    cumsum feed a one-hot batched contraction (precision=HIGHEST,
    f32-exact) that emits run sums + keys in fixed [R, K1] layout,
    scatter-added at survivor scale, with a SECOND compacted pass over
    the ~6% of blocks holding more than K1 runs (see REPLAY_BLOCK_K1).
    Mostly-dead tail batches compact at block granularity first, and a
    batch whose worst block exceeds the total budget falls back to the
    full-width scatter under lax.cond (records are never dropped).
    Deterministic, and ~4x cheaper than rank compaction
    (tools/exp_onehot_extract.py).
    """
    P = verts.shape[0]
    F = faces.shape[0]
    N = height * width
    M0 = B * N
    segs = saved["march_segs"]
    G0 = segs[0]["log"].shape[1]
    M = G0 * 128

    def flat(x, fill=0):
        x = x.reshape(M0)
        if M > M0:
            x = jnp.concatenate(
                [x, jnp.full((M - M0,), fill, x.dtype)])
        return x

    gc_f = [flat(dL_dcolor[:, ch].reshape(B, N)) for ch in range(3)]
    gdep_f = flat(dL_ddepth.reshape(B, N))
    bg_dot_f = (bg[0] * gc_f[0] + bg[1] * gc_f[1] + bg[2] * gc_f[2]
                + gdep_f)
    fT_f = jnp.exp(flat(saved["final_log_T"]))
    fpT_f = jnp.exp(flat(saved["final_prev_log_T"]))
    nc_f = flat(saved["n_contrib"]).astype(jnp.float32)
    valid_f = flat(saved["is_active"].astype(jnp.float32)) != 0.0
    per_ray_f = gc_f + [gdep_f, bg_dot_f, fT_f, fpT_f, nc_f,
                        valid_f.astype(jnp.float32)]
    # packed [M, 9] row table: compacted segments pull their rays through
    # ONE row-gather (row ops are per-ROW-priced; 9 separate 1-D gathers
    # would cost 9x -- tools/exp_honest.py)
    per_tab_f = jnp.stack(per_ray_f, axis=1)

    def seg_step(log, per_ray):
        gc = per_ray[0:3]
        gdep, bg_dot, fT, fpT, nc = per_ray[3:8]
        valid_ray = per_ray[8] != 0.0

        def step(carry, s):
            la, lcr, lcg, lcb, ld, ar, ag, ab, ad = carry
            slab = log[s[0]]  # [G, _NLOG, 128]; s = (local, global) step
            L = lambda r: slab[:, r, :]
            cf = L(_L_CF)
            alpha = L(_L_ALPHA)
            prev_T = L(_L_TBEF)
            u, v = L(_L_U), L(_L_V)
            cr, cg_, cb = L(_L_CR), L(_L_CG), L(_L_CB)
            dep = L(_L_DEP)
            inten = L(_L_INTEN)
            m = valid_ray & (s[1].astype(jnp.float32) < nc) & (cf >= 0.0)
            mf = m.astype(jnp.float32)

            # suffix accumulators (backward.cu:262-284): acc_new folds in
            # the LAST-processed (one-closer-to-the-end) face's alpha/color
            ar_n = la * lcr + (1.0 - la) * ar
            ag_n = la * lcg + (1.0 - la) * ag
            ab_n = la * lcb + (1.0 - la) * ab
            ad_n = la * ld + (1.0 - la) * ad

            dL_dop = ((cr - ar_n) * gc[0] + (cg_ - ag_n) * gc[1]
                      + (cb - ab_n) * gc[2]
                      + (dep - ad_n) * gdep) * prev_T
            # background term (backward.cu:317-339)
            bg_coef = jnp.where(alpha == 1.0, -fpT,
                                -fT / jnp.maximum(1.0 - alpha, 1e-37))
            dL_dop = (dL_dop + bg_coef * bg_dot) * mf

            # The 9 vertex-color records are the outer product
            # (wm*i_i) x gc_j with gc_j constant per ray: only the 3
            # wm*i_i factors (plus dL_dop) flow through the scan; the
            # products rebuild elementwise at reduce time (build_recs,
            # the local helper in run_batch below),
            # fusing into the extraction -- 11 -> 5 materialized scan
            # columns, ~2.2x less log-batch HBM traffic. Product order
            # (wm * i_i) * gc_j is unchanged, so sums stay bitwise
            # identical.
            wm = inten * prev_T * alpha * mf
            recs = (wm * (1.0 - u - v), wm * u, wm * v, dL_dop)
            key = jnp.where(m, cf, jnp.float32(F)).astype(jnp.int32)

            la = jnp.where(m, alpha, la)
            lcr = jnp.where(m, cr, lcr)
            lcg = jnp.where(m, cg_, lcg)
            lcb = jnp.where(m, cb, lcb)
            ld = jnp.where(m, dep, ld)
            ar = jnp.where(m, ar_n, ar)
            ag = jnp.where(m, ag_n, ag)
            ab = jnp.where(m, ab_n, ab)
            ad = jnp.where(m, ad_n, ad)
            return (la, lcr, lcg, lcb, ld, ar, ag, ab, ad), (key,) + recs

        return step, nc

    # Replay each segment in descending-step batches. Each batch runs its
    # slice of the suffix-accumulator scan AND its record reduction under
    # one lax.cond, so steps beyond the longest walk -- or beyond the
    # steps the segment's phase actually took -- compute nothing at all
    # (the skipped steps cannot touch the carried accumulators: their
    # masks are false for every ray by definition of n_contrib).
    #
    # Reduce records to per-face sums. All row-granular ops (scatter,
    # gather, sort-with-payload) cost ~8-15 ns/ROW on this chip
    # (tools/exp_honest.py -- honest, all outputs consumed), so the
    # reduction must avoid Nb-scale row ops entirely: adjacent rays walk
    # in phase (mean same-face run ~10, tools/exp_runstats.py), so each
    # 128-lane block holds ~12 distinct face runs. Run ids come from an
    # in-block cumsum; a one-hot batched contraction over the lane axis
    # (MXU) then produces each block's run sums AND keys in fixed
    # [R, BK] layout -- elementwise + matmul only -- and the scatter-add
    # runs at R*BK survivor scale (~4x fewer rows than even the slot
    # count of one batch). Measured 4x cheaper than the previous
    # merge + rank-compaction (tools/exp_onehot_extract.py). HIGHEST
    # precision keeps the one-hot contraction f32-exact (the default
    # 3-pass bf16 decomposition loses mantissa bits).
    def replay_segment(log, start, end, per_ray, carry, acc):
        D, G = log.shape[0], log.shape[1]
        step, nc = seg_step(log, per_ray)
        gc = per_ray[0:3]  # per-ray [G, 128] color grads for build_recs
        nc_max_seg = jnp.max(nc).astype(jnp.int32)
        taken = end - start  # steps this segment's phase actually ran
        K = REPLAY_REDUCE_BATCH
        BK = REPLAY_BLOCK_K
        BK1 = REPLAY_BLOCK_K1
        for b in range((D + K - 1) // K):
            kb = min(K, D - b * K)
            s_lo = D - (b * K + kb)  # smallest LOCAL step in this batch
            R = kb * G  # 128-lane blocks in this batch

            def run_batch(carry_acc, _b=b, _kb=kb, _R=R):
                carry, acc = carry_acc
                ss_local = jnp.arange(D - 1 - _b * K,
                                      D - 1 - _b * K - _kb, -1,
                                      dtype=jnp.int32)
                carry, outs = lax.scan(step, carry,
                                       (ss_local, start + ss_local))
                keys = outs[0].reshape(_R, 128)
                # 4 materialized columns: wm*i0, wm*i1, wm*i2, dL_dop
                cols = [r.reshape(_R, 128) for r in outs[1:]]
                # per-ray gc_j broadcast over the batch's steps (fused by
                # XLA into the consumers; never materialized at _R scale)
                gcb = [jnp.broadcast_to(
                    g[None], (_kb, g.shape[0], 128)).reshape(_R, 128)
                    for g in gc]

                def build_recs(c4, g3):
                    # outer product (wm*i_i) * gc_j + dL_dop; same product
                    # order as the pre-factored form (bitwise identical)
                    return ([c4[i] * g3[j]
                             for i in range(3) for j in range(3)]
                            + [c4[3]])
                valid = keys < F
                chg = jnp.concatenate(
                    [jnp.ones((_R, 1), bool), keys[:, 1:] != keys[:, :-1]],
                    axis=1)
                # 1-based id of each valid lane's run within its block (an
                # invalid gap forces chg at the next valid lane, so a valid
                # lane's id is always its own run's)
                nrb = jnp.cumsum(
                    (chg & valid).astype(jnp.int32), axis=1)[:, -1]  # [R]
                n_runs = jnp.max(nrb)
                blockmask = nrb > 0  # [R] any-live per block
                nblocks = jnp.sum(blockmask.astype(jnp.int32))
                # static budget resolution (tests force degenerate budgets
                # to pin the fallback: keep every width non-negative)
                bk1 = max(0, min(BK1, BK))
                bk2 = BK - bk1
                ovf = nrb > jnp.int32(bk1)  # blocks needing pass 2
                novf = jnp.sum(ovf.astype(jnp.int32))
                R2 = max(128, _R // REPLAY_BLOCK_COMPACT_FRAC)
                R3 = max(128, _R // REPLAY_OVF_FRAC)

                def extract_scatter(acc, ks, cs, r, bk, j0):
                    # extract run ids j0+1 .. j0+bk of each block
                    vld = ks < F
                    ch = jnp.concatenate(
                        [jnp.ones((r, 1), bool), ks[:, 1:] != ks[:, :-1]],
                        axis=1)
                    vst = ch & vld
                    rix = jnp.cumsum(vst.astype(jnp.int32), axis=1)
                    jj = jnp.arange(j0 + 1, j0 + bk + 1, dtype=jnp.int32)
                    oh = vld[:, None, :] & (rix[:, None, :]
                                            == jj[None, :, None])
                    # ride the key and a start-count along as value columns:
                    # only the start lane contributes the key (exact in f32:
                    # ids < 2^24, summed once), the count marks empty slots
                    kcol = jnp.where(vst, ks, 0).astype(jnp.float32)
                    ccol = vst.astype(jnp.float32)
                    cstack = jnp.stack(cs + [kcol, ccol], axis=1)
                    ext = lax.dot_general(
                        oh.astype(jnp.float32), cstack,
                        (((2,), (2,)), ((0,), (0,))),
                        precision=lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)  # [r, bk, 12]
                    k_flat = jnp.where(
                        ext[:, :, 11] > 0.0,
                        ext[:, :, 10].astype(jnp.int32), F).reshape(r * bk)
                    return acc.at[k_flat].add(
                        ext[:, :, :10].reshape(r * bk, 10))

                def compact_extract(acc, mask, count, budget, bk, j0):
                    # compact the masked blocks (1-D ops at R scale, near
                    # free) so extraction + scatter run at ``budget`` blocks
                    rank = jnp.cumsum(mask.astype(jnp.int32))
                    surv = jnp.zeros((budget,), jnp.int32).at[
                        jnp.where(mask, rank - 1, budget)
                    ].set(jnp.arange(_R, dtype=jnp.int32), mode="drop")
                    live = (jnp.arange(budget, dtype=jnp.int32)
                            < count)[:, None]
                    k2 = jnp.where(live, keys[surv], F)
                    # gather the 4 factor cols + 3 gc cols (7 column
                    # gathers vs 10 for pre-built records), rebuild after
                    c2 = build_recs([c[surv] for c in cols],
                                    [g[surv] for g in gcb])
                    return extract_scatter(acc, k2, c2, budget, bk, j0)

                def fast(acc):
                    # pass 1 (runs 1..K1), on compacted live blocks when the
                    # batch is mostly dead at block granularity (tail)
                    acc = lax.cond(
                        nblocks <= jnp.int32(R2),
                        lambda a: compact_extract(
                            a, blockmask, nblocks, R2, bk1, 0),
                        lambda a: extract_scatter(
                            a, keys, build_recs(cols, gcb), _R, bk1, 0),
                        acc)
                    if bk2 == 0:
                        return acc
                    # pass 2 (runs K1+1..K) on the rare overflow blocks
                    return lax.cond(
                        novf > 0,
                        lambda a: compact_extract(
                            a, ovf, novf, R3, bk2, bk1),
                        lambda a: a, acc)

                def full(acc):
                    # a block exceeded the total run budget (or too many
                    # overflow blocks): plain full-width scatter of the raw
                    # records (already masked to zero on invalid slots);
                    # invalid keys hit the absorber
                    k_all = jnp.where(valid, keys, F).reshape(-1)
                    vals = jnp.stack(
                        [c.reshape(-1) for c in build_recs(cols, gcb)],
                        axis=1)
                    return acc.at[k_all].add(vals)

                if BK <= 0:
                    acc = full(acc)  # degenerate budget: fallback only
                else:
                    ok = ((n_runs <= jnp.int32(BK))
                          & ((novf <= jnp.int32(R3)) if bk2 > 0
                             else (n_runs <= jnp.int32(bk1))))
                    acc = lax.cond(ok, fast, full, acc)
                return carry, acc

            run = ((start + jnp.int32(s_lo) < nc_max_seg)
                   & (jnp.int32(s_lo) < taken))
            carry, acc = lax.cond(run, run_batch, lambda ca: ca,
                                  (carry, acc))
        return carry, acc

    acc = jnp.zeros((F + 1, 10), jnp.float32)  # row F absorbs pad/invalid

    # parent-local -> global row maps per segment (composed left to right)
    gmaps = [None]
    for sg in segs[1:]:
        prev = gmaps[-1]
        gmaps.append(sg["idx"] if prev is None else prev[sg["idx"]])

    # Deepest segment first = descending global step order overall. The
    # suffix accumulators start at zero at the deepest width (rays absent
    # from deeper segments have all their blends in shallower ones, so
    # their accumulators are untouched there) and expand to the parent
    # width at each boundary through the parent-local row map.
    carry = None
    for k in range(len(segs) - 1, -1, -1):
        sg = segs[k]
        gm = gmaps[k]
        if gm is None:
            per_ray = [r.reshape(-1, 128) for r in per_ray_f]
        else:
            pt = _relayout(per_tab_f[gm], 9)  # one packed row-gather
            per_ray = [pt[:, c, :] for c in range(9)]
        if carry is None:
            Gk = sg["log"].shape[1]
            carry = (jnp.zeros((Gk, 128), jnp.float32),) * 9
        carry, acc = replay_segment(sg["log"], sg["start"], sg["end"],
                                    per_ray, carry, acc)
        if k > 0:
            # expand the suffix accumulators to the parent width through
            # one packed row-scatter (rays absent from this segment keep
            # zeros: all their blends live in shallower segments)
            pidx = sg["idx"]
            mp = segs[k - 1]["log"].shape[1] * 128
            car_rows = _to_rows(jnp.stack(carry, axis=1))  # [Mk, 9]
            full = jnp.zeros((mp, 9), jnp.float32).at[pidx].set(car_rows)
            fullp = _relayout(full, 9)
            carry = tuple(fullp[:, c, :] for c in range(9))

    face_acc = acc[:F]  # [F, 10]
    g_vcolor = jnp.zeros((P, 3), jnp.float32).at[faces].add(
        face_acc[:, 0:9].reshape(F, 3, 3), mode="drop")
    g_fopacity = face_acc[:, 9]
    return g_vcolor, g_fopacity


# =============================================================================
# Backward march (fallback for walks deeper than the log)
# =============================================================================

def _render_tet_backward(verts, faces, verts_color, faces_opacity, mv_t,
                         proj_t, inv_mv_t, inv_proj_t, faces_intense, tets,
                         face_tets, tet_faces, bg, height, width, seed,
                         max_steps, saved, dL_dcolor, dL_ddepth,
                         view_offset=None):
    """Reverse march (backward.cu:86-487): gradients for verts_color and
    faces_opacity only, accumulated deterministically."""
    B = mv_t.shape[0]
    P = verts.shape[0]
    F = faces.shape[0]
    N = height * width

    march = _march_tables(verts, faces, tets, tet_faces, face_tets,
                          verts_color, faces_opacity, faces_intense)

    # the regenerated rays MUST be the forward's rays: same jitter keys,
    # incl. the global-view offset under sharding
    ray_o, ray_d = generate_rays(
        inv_mv_t, inv_proj_t, width, height, norm_eps_mode="tet",
        jitter_seed=seed if seed > 0 else None, view_offset=view_offset,
    )

    # flatten to [M] (padded; see the forward) and work on clean 1-D
    # component vectors throughout. Gradients accumulate per FACE in a
    # [F, 10] table in globals_ (untouched by compaction): one fused
    # [M]-row scatter per step instead of the [M, 3]-row vertex scatter +
    # [M]-row opacity scatter of the direct form (2.6x cheaper,
    # row-count-bound); the face table expands to vertex/opacity grads
    # once at the end.
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

    ro = _flat_cols(flat(ray_o.reshape(B, N, 3)), 3)
    rd = _flat_cols(flat(ray_d.reshape(B, N, 3)), 3)
    phoz, phow, phdz, phdw = _projective_zw(ro, rd, mv_t, proj_t, N, M)

    gc = [flat(dL_dcolor[:, ch].reshape(B, N)) for ch in range(3)]
    gdep = flat(dL_ddepth.reshape(B, N))
    bg_dot = bg[0] * gc[0] + bg[1] * gc[1] + bg[2] * gc[2] + gdep

    lfF = flat(saved["last_face"])
    ltF = flat(saved["last_tet"])
    ffF = flat(saved["first_face"])
    lf_safe = jnp.maximum(lfF, 0)

    final_log_T = flat(saved["final_log_T"])
    final_prev_log_T = flat(saved["final_prev_log_T"])
    final_T = jnp.exp(final_log_T)
    final_prev_T = jnp.exp(final_prev_log_T)

    done0 = (~flat(saved["is_active"], fill=True)) | (lfF == -1) \
        | (jnp.arange(M) >= M0)

    # recompute (t, u, v) on the last face: Moller-Trumbore on the
    # precomputed face geometry rows (identical arithmetic to
    # geometry.ray_tri_intersection -- geo carries p0, e1 = p1 - p0,
    # e2 = p2 - p0 built with the same subtractions)
    g12 = _gather_cols(march["geo"], lf_safe, 12)
    p0x, p0y, p0z = g12[0], g12[1], g12[2]
    e1x, e1y, e1z = g12[3], g12[4], g12[5]
    e2x, e2y, e2z = g12[6], g12[7], g12[8]
    tvx, tvy, tvz = ro[0] - p0x, ro[1] - p0y, ro[2] - p0z
    pvx = rd[1] * e2z - rd[2] * e2y
    pvy = rd[2] * e2x - rd[0] * e2z
    pvz = rd[0] * e2y - rd[1] * e2x
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    denom = pvx * e1x + pvy * e1y + pvz * e1z
    inv = 1.0 / jnp.where(denom != 0.0, denom, 1.0)
    t0 = (qvx * e2x + qvy * e2y + qvz * e2z) * inv
    u0 = (pvx * tvx + pvy * tvy + pvz * tvz) * inv
    v0 = (qvx * rd[0] + qvy * rd[1] + qvz * rd[2]) * inv

    # flip to the entry-side tet (backward.cu:224-232: first face_tets
    # entry that differs from last_tet)
    ftc = _gather_cols(face_tets.astype(jnp.float32), lf_safe, 2)
    lt_f = ltF.astype(jnp.float32)
    curr_tet0 = jnp.where(ftc[0] != lt_f, ftc[0], ftc[1])

    f32 = lambda x: x.astype(jnp.float32)
    consts_t = _pack_rows([
        ro[0], ro[1], ro[2], rd[0], rd[1], rd[2],
        phoz, phow, phdz, phdw,
        gc[0], gc[1], gc[2], gdep, bg_dot, final_T, final_prev_T,
        f32(ffF),
    ])
    zero = jnp.zeros((M,), jnp.float32)
    state_t = _pack_rows([
        t0, u0, v0,
        f32(lfF), curr_tet0,
        final_prev_log_T,
        jnp.ones((M,), jnp.float32),  # first
        zero,                         # last_alpha
        zero, zero, zero, zero,       # last_cr/cg/cb/depth
        zero, zero, zero, zero,       # acc_r/g/b/d
        f32(done0),
    ])
    globals_ = dict(
        step=jnp.int32(0),
        face_acc=jnp.zeros((F, 10), jnp.float32),
    )

    def step_fn(st, cf, ct, cst, fb, gl):
        # gathers + relayouts in XLA, then one fused Pallas pass for the
        # whole reverse step; the kernel appends per-ray gradient record
        # rows which are scatter-added into the per-face accumulator here.
        pack_t = _relayout(march["tet_pack"][jnp.maximum(ct, 0)], 48)
        shade_t = _relayout(march["shade"][fb + jnp.maximum(cf, 0)], 12)
        out = _run_march_kernel(
            _bwd_march_kernel, pack_t, shade_t, cst, st, _NSB + _NREC)
        rec = out[:, _NSB:_NSB + _NREC, :].swapaxes(1, 2).reshape(-1, _NREC)
        face_acc = gl["face_acc"].at[jnp.maximum(cf, 0)].add(
            rec, mode="drop")
        return out[:, :_NSB, :], dict(step=gl["step"] + 1,
                                      face_acc=face_acc)

    _st, gl = _compacted_while(state_t, consts_t, fbase, globals_, step_fn,
                               max_steps, _B_CF, _B_CT, _B_DONE)

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

@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16, 17, 18))
def render_tet_core(verts, faces, verts_color, faces_opacity, mv_t, proj_t,
                    inv_mv_t, inv_proj_t, faces_intense, tets, face_tets,
                    tet_faces, bg, height, width, seed,
                    max_steps=DEFAULT_MAX_MARCH_STEPS, kcap=None,
                    with_aux=False, view_offset=None):
    """Differentiable tet renderer.

    Shapes (reference: dmesh_renderer/__init__.py:451-463): verts [P,3],
    faces [F,3], verts_color [P,3], faces_opacity [F], mv_t/proj_t [B,4,4]
    (transposed convention), faces_intense [B,F], tets [T,4],
    face_tets [F,2], tet_faces [T,4], bg [3].

    Returns (color [B,3,H,W], depth [B,1,H,W], active [B,H,W] bool).
    Gradients flow only to verts_color and faces_opacity (the reference's
    exact gradient surface, render.h:84-111); every other input -- incl.
    ``bg`` -- gets a zero gradient, as the reference's autograd Function
    does.

    ``kcap``: static (face, tile) key capacity of the binned first-hit
    (None = heuristic). ``with_aux=True`` additionally returns
    ``(overflow bool[], num_rendered int32[])`` from the first-hit binning
    -- the only reliable overflow channel on backends without host
    callbacks (see binning.overflow_warning); the dense first-hit path has
    no capacity and reports ``(False, -1)``.

    ``view_offset``: global index of view 0 (int or traced int32, default
    0); jittered-ray fields are keyed per GLOBAL view, so a shard_map over
    views passing ``lax.axis_index * B_local`` reproduces the unsharded
    batch's jitter exactly (see rays.generate_rays).
    """
    color, depth, active, saved = _render_tet_forward(
        verts, faces, verts_color, faces_opacity, mv_t, proj_t, inv_mv_t,
        inv_proj_t, faces_intense, tets, face_tets, tet_faces, bg,
        height, width, seed, max_steps, kcap, view_offset=view_offset,
    )
    if with_aux:
        return color, depth, active, (saved["fh_overflow"],
                                      saved["fh_num_rendered"])
    return color, depth, active


def _tet_fwd(verts, faces, verts_color, faces_opacity, mv_t, proj_t,
             inv_mv_t, inv_proj_t, faces_intense, tets, face_tets, tet_faces,
             bg, height, width, seed, max_steps, kcap, with_aux,
             view_offset=None):
    color, depth, active, saved = _render_tet_forward(
        verts, faces, verts_color, faces_opacity, mv_t, proj_t, inv_mv_t,
        inv_proj_t, faces_intense, tets, face_tets, tet_faces, bg,
        height, width, seed, max_steps, kcap, view_offset=view_offset,
    )
    res = (verts, faces, verts_color, faces_opacity, mv_t, proj_t, inv_mv_t,
           inv_proj_t, faces_intense, tets, face_tets, tet_faces, bg, saved,
           view_offset)
    if with_aux:
        out = (color, depth, active, (saved["fh_overflow"],
                                      saved["fh_num_rendered"]))
    else:
        out = (color, depth, active)
    return out, res


def _tet_bwd(height, width, seed, max_steps, kcap, with_aux, res, cots):
    (verts, faces, verts_color, faces_opacity, mv_t, proj_t, inv_mv_t,
     inv_proj_t, faces_intense, tets, face_tets, tet_faces, bg, saved,
     view_offset) = res
    if with_aux:
        dL_dcolor, dL_ddepth, _dL_dactive, _aux_cot = cots
    else:
        dL_dcolor, dL_ddepth, _dL_dactive = cots

    B = mv_t.shape[0]

    def replay(_):
        return _render_tet_backward_replay(
            verts, faces, bg, saved, dL_dcolor, dL_ddepth, B, height, width)

    log_depth = saved["march_segs"][0]["log"].shape[0]
    if int(max_steps) <= log_depth:
        # the log always covers the whole walk: no fallback compiled
        g_vcolor, g_fopacity = replay(0)
    else:
        def marching(_):
            return _render_tet_backward(
                verts, faces, verts_color, faces_opacity, mv_t, proj_t,
                inv_mv_t, inv_proj_t, faces_intense, tets, face_tets,
                tet_faces, bg, height, width, seed, max_steps, saved,
                dL_dcolor, dL_ddepth, view_offset=view_offset,
            )

        nc_max = jnp.max(saved["n_contrib"])
        g_vcolor, g_fopacity = lax.cond(
            nc_max <= jnp.int32(log_depth), replay, marching, 0)

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
        None if view_offset is None else zi(jnp.asarray(view_offset)),
    )


render_tet_core.defvjp(_tet_fwd, _tet_bwd)
