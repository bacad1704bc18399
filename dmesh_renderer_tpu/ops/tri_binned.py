"""Tile-binned triangle renderer: Pallas TPU kernels for the scaled path.

The TPU re-design of the reference's tile pipeline (cuda_rasterizer/):

  CUDA structure                            TPU structure (here)
  ----------------------------------------  --------------------------------
  16x16-pixel tile per thread block         32x32-pixel tile per grid step,
                                            pixel state held as (8,128) VPU
                                            registers (f32 native tile)
  256-face shared-memory rounds             SLAB-face HBM->VMEM DMA slabs
  per-thread sequential blend loop          per-face sequential loop over
                                            vectorized (8,128) pixel blocks
  __syncthreads_count(done) early-out       lax.while_loop over slabs with
                                            jnp.all(done) early-exit
  atomicAdd gradient scatter                per-slot gradient records written
                                            race-free (tile slot ranges are
                                            slab-aligned and disjoint), then
                                            XLA segment-sum -- deterministic

Because compositing order is decided entirely by the global (depth key,
submission order) sort and per-pixel coverage (see tri_oracle docstring),
the tile size is a pure performance knob: 32x32 fills the 8x128 VPU shape.
Rendered images match the oracle path up to float summation order.

Memory layout: per-slot attributes live in ONE [cap, 128] f32 table (int
attributes ride in f32-exact encodings; see the column-layout comment
below). Slots are rows because Mosaic only supports dynamic indexing on the
sublane dimension; attr columns are static lane offsets. Per-tile slot
ranges are slab-aligned (binning.align_to_slabs) so DMA windows are
tile-exclusive -- which also makes the backward's slab write-back race-free.

Per-slot precomputation moves all per-face constants out of the kernel:
  * coverage edge functions s_e = A_e*px + B_e*py + C_e in 16x16-subpixel
    fixed point with the top-left-rule bias folded into C_e
    (exactly reproducing in_tri, cuda_rasterizer/auxiliary.h:179-243)
  * Moller-Trumbore constants T = o - p0, E1, E2, Q = T x E1 (the ray origin
    is the camera position, constant per view), so the kernel does only the
    per-pixel parts: P = d x E2, denom = P.E1, u = P.T/denom, v = Q.d/denom
    (auxiliary.h:255-286)

Reference pipeline being replaced: rasterizer_impl.cu:175-383 (forward) and
:387-467 + backward.cu:9-421 (backward).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.config import BIN_TILE, T_EPS
from .binning import (
    AlignedKeys,
    align_to_slabs,
    aligned_capacity,
    default_key_capacity,
    emit_and_sort,
)
from .geometry import (
    face_edge_coeffs,
    clamp_bary_uv,
    clamp_bary_uv_grad,
    preprocess_faces,
    project_verts,
)
from .rays import generate_rays

Array = jax.Array

TILE = BIN_TILE    # pixels per tile side; 32*32 = 1024 = 8*128 VPU block.
                   # Shared with the oracle's rect restriction (config.py):
                   # near-plane WRAPPED coverage is rect-granularity-
                   # dependent, so all tri paths must agree on it.
PSUB, PLANE = 8, 128
SLAB = 32          # faces per HBM->SMEM DMA slab (sized to scalar memory)
NA = 128           # attr columns per slot (lane-dim, must be 128)
NG = 128           # gradient-record HBM row width (Mosaic requires
                   # 128-lane-aligned DMA slices, so narrower rows do not
                   # lower). Four 32-column records pack into each row --
                   # SMEM scalar stores take arbitrary dynamic lane offsets
                   # -- which keeps the DMA aligned while cutting the
                   # record traffic (write + reduction read) 4x.
REC_PER_ROW = 4    # records per 128-lane HBM row
REC_COLS = NG // REC_PER_ROW  # = 32 columns per record (NG_USED=22 used)

# Attr column layout: ONE [*, 128] f32 table per slot. Mosaic only supports
# dynamic indexing on the sublane dim, so slots are rows and attrs are
# static lane columns; lane width is fixed at 128. Slot-scale gathers cost
# ~10 ns per ROW regardless of width (tools/bench_primitives.py), so packing
# everything into a single row halves both the gather and the slab-DMA
# count vs the round-1/2 split f32 + i32 tables.
#
# Integer attributes ride in f32 columns: every int32 edge coefficient is
# split into an arithmetic high part (x >> 12, always f32-exact) and a low
# part (x & 0xFFF) and reassembled with scalar int ops in-kernel (Mosaic
# supports scalar f32->i32 converts, but not scalar bitcasts) -- exact for
# ANY int32, so the kernel's edge functions wrap mod 2^32 exactly like
# in_tri even for near-plane faces whose projected coords blow the
# coefficients past 2^24 (a plain-f32 A/B encoding measurably broke
# coverage parity there); small ints (flag, face id) are stored directly
# as exact floats.
_TV, _E1, _E2, _QV = 0, 3, 6, 9
_C0 = 12           # c0 rgb, c1 rgb, c2 rgb
_D0 = 21           # d0 d1 d2
_ALPHA, _INTEN = 24, 25
_MIND, _MAXD = 26, 27  # per-face min/max depth keys (tet first-hit window)
# Edge coefficients, split-half encoded (exact for any int32 -- see the
# layout comment above; A/B exceed 2^24 for faces with near-plane
# vertices, where the plain-f32 encoding broke oracle parity):
_EABH = 28         # high parts (x >> 12): A1 A2 A3 B1 B2 B3
_EABL = 34         # low parts (x & 0xFFF), 6 cols
_ECH = 40          # C high parts (C >> 12), 3 cols
_ECL = 43          # C low parts (C & 0xFFF), 3 cols
_NONDEG = 46       # 0.0 / 1.0 flag
_FID = 47          # face id (tet first-hit output; ids < 2^24)

NG_USED = 22       # gradient-record columns actually written

# gradient record column layout. The face-intensity gradient needs no
# record of its own: dL/dinten = sum_p icol_raw . dL_dicolor
# = sum_{k,c} c_attr[k,c] * (sum_p i_k dL_dicolor_c) is a per-face
# contraction of the VC records with the vertex colors, computed at
# F-scale on the XLA side (_b_bwd) -- this removes ~24 vector ops and a
# cross-lane reduction per face-visit from the backward kernel.
_G_ALPHA = 0
_G_P = 1           # dL_dp0 xyz, dL_dp1 xyz, dL_dp2 xyz
_G_VC = 10         # sum i_k * dL_dicolor_ch (k-major, 9)
_G_VD = 19         # sum i_k * dL_didepth (3)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _bwd_nocond() -> bool:
    """Run the backward heavy path unconditionally (DMRT_BWD_NOCOND,
    default ON since round 4).

    The heavy path is fully masked (records multiply through mf, state
    updates through jnp.where), so for a dead visit it computes exactly
    the skip path's zeros -- the lax.cond was purely a perf choice, and
    the A/B settled it: the per-visit branch + 11-carry state plumbing
    cost MORE than the masked math it skipped on the ~39% dead visits
    (62.0 -> 54.7 ms/frame at the bench scene, v5e, 2026-08-19). The
    cond path stays for A/B (DMRT_BWD_NOCOND=0)."""
    return os.environ.get("DMRT_BWD_NOCOND", "1") == "1"


def _bwd_livebit() -> bool:
    """Skip dead face-visits in the backward via a FORWARD-produced
    per-visit liveness bit (DMRT_BWD_LIVEBIT, default ON since round 5).

    The round-4 per-visit ``lax.cond(jnp.any(active), ...)`` lost because
    it paid the full coverage pass BEFORE it could branch (plus the
    cross-lane any-reduce). Here the forward kernel -- which computes the
    exact per-pixel blend mask anyway -- records ``any pixel blended this
    visit`` as one bit per slot (f32 in a [cap/SLAB, 128] row table, one
    128-lane row per slab, written by the slab's one owning tile:
    race-free like the gradient records). The backward reads the bit as
    ONE SMEM scalar and branches before any vector work: a dead visit
    costs the branch + the record zeroing instead of the ~490 ns full
    visit. Forward blend-mask == backward active-mask exactly: for
    pos < n_contrib_p a covered pixel was blended (done only flips at
    nc_p), and pos >= nc_p pixels fail both masks.

    A/B off: DMRT_BWD_LIVEBIT=0."""
    return os.environ.get("DMRT_BWD_LIVEBIT", "1") == "1"


def _bwd_zdma() -> bool:
    """Zero the SMEM record slab by DMA instead of scalar stores
    (DMRT_BWD_ZDMA, default ON since round 5).

    Dead visits and alignment-tail slots must leave zero records. The
    per-row scalar zeroing (NG_USED=22 SMEM stores per dead visit, VERDICT
    r4 #2a) is replaced by ONE 4 KB DMA per slab that reads THIS slab's
    rows of the record output buffer back into the SMEM slab: the buffer
    is zero-initialized (donated grec_init) and every slab's row range is
    written exactly once by its one owning tile (slab-aligned exclusive
    slot ranges), so the readback always yields zeros. Live visits then
    overwrite their own record; dead visits cost only the liveness branch.

    A/B off: DMRT_BWD_ZDMA=0."""
    return os.environ.get("DMRT_BWD_ZDMA", "1") == "1"


def _bwd_slabskip() -> bool:
    """Skip fully-dead SLABS in the backward via per-slab liveness flags
    (DMRT_BWD_SLABSKIP, default ON since round 5; requires the liveness
    bits).

    The per-slab flag (any live visit bit in the slab, reduced on the XLA
    side from the forward's bit table) rides the scalar-prefetch channel,
    so a dead slab -- no pixel blended any of its 32 faces -- costs ONE
    SMEM scalar read and a branch instead of 3 DMAs + 32 liveness-bit
    branches. Correct by construction: a dead slab changes no blend state
    (T only divides at active visits) and its record rows stay zero in the
    donated HBM buffer untouched.

    A/B off: DMRT_BWD_SLABSKIP=0."""
    return os.environ.get("DMRT_BWD_SLABSKIP", "1") == "1"


# When True, the backward rebuilds the [cap, 128] slot attribute table from
# the (F-scale) face table + saved keys instead of keeping it as a
# custom_vjp residual: trades one slot-scale row gather (~9 ms at bench
# capacity) for ~0.5 GB/view-batch of residual memory. Residual memory is
# the prime suspect for the super-linear B=4 backward degradation
# (VERDICT r2 W2); tools/exp_b4_attrs.py measures both settings.
RECOMPUTE_BWD_ATTRS = False

# XLA:TPU scatter-add keeps its fast (~13-19 ns/row) strategy while the
# accumulation target stays under roughly this size, then degrades ~5x
# (measured cliff between 17.6 MB and 35 MB, tools/exp_scatter_scale.py).
# Above it, the backward record reduce switches to the F-segment wide
# layout (see _b_bwd).
REDUCE_TARGET_BYTES_MAX = 24 * 2**20

# The backward kernel walks only each tile's slot-list PREFIX up to its
# last contributor (slab-rounded min(count, max n_contrib)); every later
# record row is provably zero (never written into the zero-initialized
# donated buffer). At the 100k-tri bench scene the walked prefixes total
# 41k of 770k slots (tools/analyze_bwd_liveness.py) -- so the record
# reduce compacts them (gather-free offset fill + ONE walked-scale row
# gather) and scatter-adds at walked scale instead of key capacity.
# The static compacted capacity is cap // WALKED_COMPACT_DIV (floored at
# 2 slabs per tile); scenes whose walked total exceeds it -- deep
# transparent stacks where most pixels blend most of their list -- fall
# back to the full-capacity scatter via lax.cond at run time.
WALKED_COMPACT_DIV = 8


def _face_unroll() -> int:
    """Per-face loop unroll factor (DMRT_UNROLL, default 2).

    At 2, the kernels process face pairs per loop iteration with BOTH
    faces' SMEM scalar loads issued up front, so the scalar core can
    fetch face j+1's attributes while the VPU blends face j. Bit-identical
    to factor 1: the same operations execute in the same order, only the
    loop structure changes (pairs + a 0/1-iteration tail). Measured on
    v5e at the 100k-tri bench: ~0.3 ms/frame (76.67 -> 76.35, additive
    with DMRT_EDGE_I32) -- so the face loops are vector-op-bound, not
    scalar-load-bound. Read at trace time so tests can toggle it per
    call."""
    return int(os.environ.get("DMRT_UNROLL", "2"))


def _edge_i32() -> bool:
    """Raw-i32 edge-coefficient slab (DMRT_EDGE_I32, default on).

    With the split-half encoding (DMRT_EDGE_I32=0) the attr table carries
    every int32 edge coefficient as TWO f32 columns (Mosaic cannot
    scalar-bitcast an f32 SMEM read back to int) and each face-visit pays
    18 scalar loads + 36 scalar ALU ops to reassemble 9 coefficients. By
    default the table instead stores the raw int32 BIT PATTERNS in 9 f32
    columns and the kernels DMA the same rows a second time through an
    XLA-side ``bitcast_convert_type`` view of the table into an int32
    SMEM slab -- typed i32 scalar reads need no reassembly (9 loads,
    0 ALU). The slot gather is unchanged (one table, two dtype views).
    Bit-identical by construction: the kernel consumes the same int32
    values. Measured on v5e at the 100k-tri bench: ~1.4 ms/frame
    (76.67 -> 75.23). Read at trace time so tests can toggle it per
    call."""
    return os.environ.get("DMRT_EDGE_I32", "1") == "1"


def _face_loop(rem, load, step, st):
    """Run ``step(j, load(j), st)`` for j in [0, rem) -- one face per
    iteration by default, or as explicitly software-pipelined pairs under
    DMRT_UNROLL=2 (both faces' scalar loads hoisted ahead of the pair's
    vector work, plus a 0/1-iteration tail loop for odd ``rem``)."""
    def one(j, st):
        return step(j, load(j), st)

    if _face_unroll() < 2:
        return lax.fori_loop(0, rem, one, st)

    def pair_body(k, st):
        fs0 = load(2 * k)
        fs1 = load(2 * k + 1)
        st = step(2 * k, fs0, st)
        return step(2 * k + 1, fs1, st)

    st = lax.fori_loop(0, rem // 2, pair_body, st)
    return lax.fori_loop((rem // 2) * 2, rem, one, st)


def _walked_cap(cap: int, n_tiles: int) -> int:
    """Static compacted record capacity (multiple of SLAB, <= cap)."""
    w = max(2 * SLAB * n_tiles, cap // WALKED_COMPACT_DIV)
    w = ((w + SLAB - 1) // SLAB) * SLAB
    return min(w, cap)


def _reduce_records(rec4, keys, fwd_state_t, cap, n_tiles, n_rows,
                    make_update):
    """Deterministic segment scatter-add of per-slot gradient records into
    ``[n_rows, C]``, restricted to the walked slot prefixes.

    ``rec4 [cap // REC_PER_ROW, NG]`` is the backward kernel's packed
    record buffer. ``make_update(rec [*, REC_COLS], take)`` maps un-packed
    record rows to ``(update rows [*, C], target row ids [*] < n_rows)``,
    using ``take`` to bring any cap-scale per-slot array (``keys.flat``,
    the attr table, ...) to the same scale as ``rec``.

    Rows outside the walked prefixes are exactly zero (see
    WALKED_COMPACT_DIV), so the fast path compacts the PACKED rows first
    -- a gather-free monotonic-delta offset fill + ONE walked-scale
    128-lane row gather -- and the un-pack relayout, every make_update
    column pass, and the segment scatter-add all run at walked scale
    (41k of 770k slots at the bench scene) instead of key capacity.
    The compacted->source map needs NO slot-scale gathers: the per-tile
    source offset delta_t = starts_t - comp_starts_t is monotonic
    non-decreasing across tiles (each tile's aligned count >= its walked
    count), so a boundary scatter-max + cummax forward-fills it -- the
    same idiom as the binning fills (ops/binning.py). Compaction only
    removes provably-zero rows and preserves the add order of every
    nonzero one => bit-identical to the full scatter. Scenes whose walked
    total exceeds the static compacted capacity -- deep transparent
    stacks where most pixels blend most of their list -- fall back to the
    full-capacity path via lax.cond at run time."""

    def full(_):
        rec = rec4.reshape(cap, REC_COLS)
        upd, tgt = make_update(rec, lambda a: a)
        return (jnp.zeros((n_rows + 1, upd.shape[1]), jnp.float32)
                .at[tgt].add(upd)[:n_rows])

    w_cap = _walked_cap(cap, n_tiles)
    if w_cap >= cap:  # compaction cannot shrink anything: plain scatter
        return full(0)

    # per-tile walked slot counts from the forward's n_contrib plane --
    # the same bound the backward kernel uses (max over the tile's pixel
    # block, slab-rounded, clamped to the slot count)
    nc_max = jnp.max(fwd_state_t[:, 2], axis=(1, 2)).astype(jnp.int32)
    count = keys.ends - keys.starts  # [NT]
    walked = jnp.minimum(count, nc_max)
    walked = ((walked + SLAB - 1) // SLAB) * SLAB
    total = jnp.sum(walked)
    comp_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(walked)[:-1].astype(jnp.int32)])

    def compact(_):
        # compact at PACKED-row granularity: SLAB-aligned prefixes are
        # REC_PER_ROW-divisible, so the row gather moves 128-lane rows
        w4 = w_cap // REC_PER_ROW
        delta4 = (keys.starts - comp_starts) // REC_PER_ROW
        pos4 = jnp.where(walked > 0, comp_starts // REC_PER_ROW, w4)
        dmark = jnp.zeros((w4 + 1,), jnp.int32).at[pos4].max(delta4)
        dfill = lax.cummax(dmark[:w4])
        i4 = jnp.arange(w4, dtype=jnp.int32)
        src4 = jnp.where(i4 * REC_PER_ROW < total, i4 + dfill, 0)
        rec = rec4[src4].reshape(w_cap, REC_COLS)  # the one row gather
        # source SLOT ids (packed row r holds slots REC_PER_ROW*r ..)
        slot = (src4[:, None] * REC_PER_ROW
                + jnp.arange(REC_PER_ROW, dtype=jnp.int32)[None]
                ).reshape(w_cap)
        valid = jnp.arange(w_cap, dtype=jnp.int32) < total
        upd, tgt = make_update(rec, lambda a: a[slot])
        upd = jnp.where(valid[:, None], upd, 0.0)
        tgt = jnp.where(valid, tgt, n_rows)
        return (jnp.zeros((n_rows + 1, upd.shape[1]), jnp.float32)
                .at[tgt].add(upd)[:n_rows])

    return lax.cond(total <= w_cap, compact, full, 0)


# =============================================================================
# XLA-side slot attribute construction
# =============================================================================

def _build_face_table(verts, faces, verts_color, faces_opacity,
                      verts_depth, faces_intense, img, cam_o,
                      min_depth=None, max_depth=None):
    """Per-(view, face) attr table at [B*F, NA] -- built at face scale
    (cheap), then expanded to slots with a single row gather.

    min_depth/max_depth: optional [B, F] depth-window keys (tet first-hit)."""
    B = cam_o.shape[0]
    F = faces.shape[0]
    # ONE packed per-vertex gather (position + color): face-scale row
    # gathers are issue-bound (~12 ns/row), so the fused [P, 6] table
    # halves the corner-gather cost vs separate verts/color gathers
    pvt = jnp.concatenate([verts, verts_color], axis=1)  # [P, 6]
    gv = pvt[faces.reshape(-1)].reshape(F, 3, 6)
    p0, p1, p2 = gv[:, 0, :3], gv[:, 1, :3], gv[:, 2, :3]
    e1 = p1 - p0
    e2 = p2 - p0
    tv = cam_o[:, None, :] - p0[None]  # [B, F, 3]
    qv = jnp.cross(tv, jnp.broadcast_to(e1[None], tv.shape))

    c = gv[:, :, 3:6].reshape(F, 9)  # [F, 9] corner-major rgb
    d = verts_depth[:, faces]  # [B, F, 3]

    fcols = jnp.concatenate(
        [
            tv,
            jnp.broadcast_to(e1[None], (B, F, 3)),
            jnp.broadcast_to(e2[None], (B, F, 3)),
            qv,
            jnp.broadcast_to(c[None], (B, F, 9)),
            d,
            jnp.broadcast_to(faces_opacity[None, :, None], (B, F, 1)),
            faces_intense[..., None],
        ]
        + ([min_depth[..., None], max_depth[..., None]]
           if min_depth is not None else []),
        axis=-1,
    )  # [B, F, 26 or 28] in _TV.._MAXD column order

    # Fixed-point coverage edge coefficients (auxiliary.h:179-243),
    # shared with the exact tile-interval emission (geometry helper).
    (A1, A2, A3), (B1, B2, B3), (C1, C2, C3), nondeg = face_edge_coeffs(
        img, faces)

    fid = jnp.broadcast_to(jnp.arange(F, dtype=jnp.int32)[None], (B, F))
    ab = jnp.stack([A1, A2, A3, B1, B2, B3], axis=-1)
    cc = jnp.stack([C1, C2, C3], axis=-1)
    if _edge_i32():
        # raw int32 BIT PATTERNS in 9 f32 columns (read in-kernel through
        # an int32 bitcast view of the table; see _edge_i32). The 9
        # split-half columns they replace stay zero so _NONDEG/_FID keep
        # their absolute positions.
        raw = lax.bitcast_convert_type(
            jnp.concatenate([ab, cc], axis=-1), jnp.float32)
        icols = jnp.concatenate(
            [
                raw,
                jnp.zeros(ab.shape[:-1] + (9,), jnp.float32),
                nondeg.astype(jnp.float32)[..., None],
                fid.astype(jnp.float32)[..., None],
            ],
            axis=-1,
        )  # [B, F, 20] (_EABH.._FID)
    else:
        # split-halves encoding for ALL edge coefficients: x == (x >> 12) *
        # 4096 + (x & 0xFFF) for any int32 (arithmetic shift; high f32-exact
        # since |x >> 12| < 2^19, low in [0, 4096))
        icols = jnp.concatenate(
            [
                (ab >> 12).astype(jnp.float32),
                (ab & 0xFFF).astype(jnp.float32),
                (cc >> 12).astype(jnp.float32),
                (cc & 0xFFF).astype(jnp.float32),
                nondeg.astype(jnp.float32)[..., None],
                fid.astype(jnp.float32)[..., None],
            ],
            axis=-1,
        )  # [B, F, 20] (_EABH.._FID)

    nf = fcols.shape[-1]
    fcols = jnp.pad(fcols, ((0, 0), (0, 0), (0, _EABH - nf)))  # ints at _EABH
    cols = jnp.concatenate([fcols, icols], axis=-1)
    nc = cols.shape[-1]
    return jnp.pad(cols.reshape(B * F, nc), ((0, 0), (0, NA - nc)))


def _build_slot_attrs(face_tab, keys: AlignedKeys):
    """Expand the face table to the slot table.

    ``keys.flat`` indexes the depth-sorted face ordering, so the table rows
    are first permuted by sigma (an F-scale gather) and then expanded with
    the single slot-scale row gather this stage pays for."""
    return face_tab[keys.sigma][keys.flat]


# =============================================================================
# Tile pixel layout helpers
# =============================================================================

def _tileify(x, B, H, W, gx, gy):
    """[B, H, W, C] -> [B*gy*gx, C, PSUB, PLANE] (pad to tile multiples)."""
    C = x.shape[-1]
    Hp, Wp = gy * TILE, gx * TILE
    x = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
    x = x.reshape(B, gy, TILE, gx, TILE, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # [B, gy, gx, C, TILE, TILE]
    return x.reshape(B * gy * gx, C, PSUB, PLANE)


def _untile(y, B, H, W, gx, gy):
    """[B*gy*gx, C, PSUB, PLANE] -> [B, H, W, C]."""
    C = y.shape[1]
    y = y.reshape(B, gy, gx, C, TILE, TILE)
    y = y.transpose(0, 1, 4, 2, 5, 3)  # [B, gy, TILE, gx, TILE, C]
    y = y.reshape(B, gy * TILE, gx * TILE, C)
    return y[:, :H, :W, :]


def _pixel_coords(B, gx, gy):
    """Fixed-point pixel-center coords [NT, 2, PSUB, PLANE] (16x + 8)."""
    H, W = gy * TILE, gx * TILE
    ys = jnp.arange(H, dtype=jnp.int32)
    xs = jnp.arange(W, dtype=jnp.int32)
    py, px = jnp.meshgrid(ys, xs, indexing="ij")
    pix = jnp.stack([px * 16 + 8, py * 16 + 8], axis=-1)  # [H, W, 2]
    pix = jnp.broadcast_to(pix[None], (B, H, W, 2))
    return _tileify(pix, B, H, W, gx, gy)


# =============================================================================
# In-kernel shared math
# =============================================================================

def _face_scalars(fslab, j, islab=None):
    """Per-face attrs as true scalars from SMEM (SREG splats in vector ops).

    The attribute slab lives in *scalar memory*: dynamic scalar reads there
    are the canonical Mosaic pattern (VMEM scalar reads serialize on vector
    latency, and any (1,1)->vector path trips Mosaic's unimplemented
    dual-axis broadcast). Int32 edge coefficients are reassembled from
    their f32-exact split halves with scalar int ops (see the column-layout
    comment at the top of this module) -- or, when ``islab`` is given
    (DMRT_EDGE_I32), read directly from the int32 view of the same slab
    rows (see _edge_i32)."""
    if islab is not None:
        # raw int32 layout: A1 A2 A3 B1 B2 B3 C1 C2 C3 at _EABH..+8;
        # unpack order matches _coverage_and_uv: A1 B1 C1 A2 B2 C2 ...
        edge = [
            islab[j, _EABH + grp + e]
            for e in range(3)
            for grp in (0, 3, 6)
        ]
    else:
        # unpack order matches _coverage_and_uv: A1 B1 C1 A2 B2 C2 A3 B3 C3
        edge = [
            v
            for e in range(3)
            for v in (
                fslab[j, _EABH + e].astype(jnp.int32) * 4096
                + fslab[j, _EABL + e].astype(jnp.int32),
                fslab[j, _EABH + 3 + e].astype(jnp.int32) * 4096
                + fslab[j, _EABL + 3 + e].astype(jnp.int32),
                fslab[j, _ECH + e].astype(jnp.int32) * 4096
                + fslab[j, _ECL + e].astype(jnp.int32),
            )
        ]
    return {
        "tv": [fslab[j, _TV + k] for k in range(3)],
        "e1": [fslab[j, _E1 + k] for k in range(3)],
        "e2": [fslab[j, _E2 + k] for k in range(3)],
        "qv": [fslab[j, _QV + k] for k in range(3)],
        "c": [fslab[j, _C0 + k] for k in range(9)],
        "d": [fslab[j, _D0 + k] for k in range(3)],
        "alpha": fslab[j, _ALPHA],
        "inten": fslab[j, _INTEN],
        "edge": edge,
        "nondeg": fslab[j, _NONDEG],
    }


def _coverage_and_uv(fs, px, py, dx, dy, dz):
    """Per-pixel coverage + clamped barycentrics for one face.

    Also returns the Moller-Trumbore intermediates (P = d x e2 and the
    denominator) so the backward kernel's gradient factoring can reuse
    them instead of recomputing the cross products."""
    A1, B1, C1, A2, B2, C2, A3, B3, C3 = fs["edge"]
    s1 = A1 * px + B1 * py + C1
    s2 = A2 * px + B2 * py + C2
    s3 = A3 * px + B3 * py + C3
    cover = (s1 < 0) & (s2 < 0) & (s3 < 0) & (fs["nondeg"] > 0)

    e1x, e1y, e1z = fs["e1"]
    e2x, e2y, e2z = fs["e2"]
    tvx, tvy, tvz = fs["tv"]
    qx, qy, qz = fs["qv"]

    Px = dy * e2z - dz * e2y
    Py = dz * e2x - dx * e2z
    Pz = dx * e2y - dy * e2x
    denom = Px * e1x + Py * e1y + Pz * e1z
    valid = denom != 0.0
    inv = 1.0 / jnp.where(valid, denom, 1.0)
    u = (Px * tvx + Py * tvy + Pz * tvz) * inv
    v = (qx * dx + qy * dy + qz * dz) * inv

    u_c, v_c, code = clamp_bary_uv(u, v)
    i0 = 1.0 - u_c - v_c
    return cover & valid, u, code, i0, u_c, v_c, (Px, Py, Pz, denom)


def _interp_scalars(fs, i0, i1, i2):
    c = fs["c"]
    cr = (i0 * c[0] + i1 * c[3] + i2 * c[6]) * fs["inten"]
    cg = (i0 * c[1] + i1 * c[4] + i2 * c[7]) * fs["inten"]
    cb = (i0 * c[2] + i1 * c[5] + i2 * c[8]) * fs["inten"]
    d = fs["d"]
    dep = i0 * d[0] + i1 * d[1] + i2 * d[2]
    return cr, cg, cb, dep


# =============================================================================
# Forward kernel
# =============================================================================

def _fwd_kernel(edge_i32, livebit, pxmax, pymax, starts_ref, ends_ref,
                *rest):
    rest = list(rest)
    attr_hbm = rest.pop(0)
    attr_i32_hbm = rest.pop(0) if edge_i32 else None
    rayd_ref = rest.pop(0)
    pix_ref = rest.pop(0)
    if livebit:
        rest.pop(0)  # zero-init bits (donated to bits_hbm)
    out_ref = rest.pop(0)
    bits_hbm = rest.pop(0) if livebit else None
    fslab = rest.pop(0)
    islab = rest.pop(0) if edge_i32 else None
    bslab = rest.pop(0) if livebit else None
    semf = rest.pop(0)
    semi = rest.pop(0) if edge_i32 else None
    semb = rest.pop(0) if livebit else None
    t = pl.program_id(0)
    start = starts_ref[t]  # slab-aligned (binning.align_to_slabs)
    end = ends_ref[t]
    n = end - start

    dx = rayd_ref[0, 0]
    dy = rayd_ref[0, 1]
    dz = rayd_ref[0, 2]
    px = pix_ref[0, 0]
    py = pix_ref[0, 1]

    shape = dx.shape
    T0 = jnp.ones(shape, jnp.float32)
    # tile-padding pixels (beyond the image, zeroed rays) can never blend,
    # so they would pin the all-done early exit off in boundary tiles:
    # seed them done (their outputs are cropped by _untile anyway)
    done0 = ((px > pxmax) | (py > pymax)).astype(jnp.int32)
    init = (
        jnp.int32(0),
        done0,                          # done (i32: Mosaic cannot carry i1
                                        # vectors through scf loops)
        T0,                             # T
        T0,                             # pT
        jnp.zeros(shape, jnp.float32),  # Cr
        jnp.zeros(shape, jnp.float32),  # Cg
        jnp.zeros(shape, jnp.float32),  # Cb
        jnp.zeros(shape, jnp.float32),  # D
        jnp.zeros(shape, jnp.int32),    # n_contrib
    )
    n_slabs = pl.cdiv(n, SLAB)

    def cond(c):
        s, done = c[0], c[1]
        return (s < n_slabs) & jnp.logical_not(jnp.all(done > 0))

    def body(c):
        s, done, T, pT, Cr, Cg, Cb, D, nc = c
        s0 = pl.multiple_of(start + s * SLAB, SLAB)
        cf = pltpu.make_async_copy(
            attr_hbm.at[pl.ds(s0, SLAB), :], fslab, semf)
        cf.start()
        if edge_i32:
            ci = pltpu.make_async_copy(
                attr_i32_hbm.at[pl.ds(s0, SLAB), :], islab, semi)
            ci.start()
        cf.wait()
        if edge_i32:
            ci.wait()

        rem = jnp.minimum(n - s * SLAB, SLAB)
        base = s * SLAB

        def face_step(j, fs, st):
            done, T, pT, Cr, Cg, Cb, D, nc = st
            hitg, _u, _code, i0, i1, i2, _mt = _coverage_and_uv(
                fs, px, py, dx, dy, dz)
            cr, cg, cb, dep = _interp_scalars(fs, i0, i1, i2)
            a = fs["alpha"]
            hit = hitg & (done == 0)
            if livebit:
                # any pixel blended this visit == the backward's
                # any-active (see _bwd_livebit); one bit per slot
                bslab[0, j] = jnp.max(hit.astype(jnp.float32))
            w = jnp.where(hit, a * T, 0.0)
            Cr = Cr + cr * w
            Cg = Cg + cg * w
            Cb = Cb + cb * w
            D = D + dep * w
            pT = jnp.where(hit, T, pT)
            T = jnp.where(hit, T * (1.0 - a), T)
            nc = jnp.where(hit, base + j + 1, nc)
            done = jnp.where(hit & (T < T_EPS), 1, done)
            return (done, T, pT, Cr, Cg, Cb, D, nc)

        st = (done, T, pT, Cr, Cg, Cb, D, nc)
        st = _face_loop(rem, lambda j: _face_scalars(fslab, j, islab),
                        face_step, st)
        if livebit:
            # tail slots (alignment padding) stay dead
            def bit_tail(j, carry):
                bslab[0, j] = 0.0
                return carry

            lax.fori_loop(rem, SLAB, bit_tail, 0)
            cb_dma = pltpu.make_async_copy(
                bslab, bits_hbm.at[pl.ds(s0 // SLAB, 1), :], semb)
            cb_dma.start()
            cb_dma.wait()
        done, T, pT, Cr, Cg, Cb, D, nc = st
        return (s + 1, done, T, pT, Cr, Cg, Cb, D, nc)

    c = lax.while_loop(cond, body, init)
    _s, _done, T, pT, Cr, Cg, Cb, D, nc = c
    out_ref[0, 0] = Cr
    out_ref[0, 1] = Cg
    out_ref[0, 2] = Cb
    out_ref[0, 3] = D
    out_ref[0, 4] = T
    out_ref[0, 5] = pT
    out_ref[0, 6] = nc.astype(jnp.float32)


def _run_fwd_kernel(starts, ends, attr_tab, rayd_t, pix_t, n_tiles,
                    height, width, cap=None):
    """Returns the per-tile output planes, plus the per-visit liveness bit
    table [cap // SLAB, 128] when _bwd_livebit() (``cap`` required then)."""
    edge_i32 = _edge_i32()
    livebit = _bwd_livebit() and cap is not None
    # largest in-image fixed-point pixel-center coords (16x + 8)
    kernel = functools.partial(
        _fwd_kernel, edge_i32, livebit,
        int((width - 1) * 16 + 8), int((height - 1) * 16 + 8))
    i32_in = [pl.BlockSpec(memory_space=pl.ANY)] if edge_i32 else []
    i32_scratch = ([pltpu.SMEM((SLAB, NA), jnp.int32),
                    pltpu.SemaphoreType.DMA] if edge_i32 else [])
    bit_in = [pl.BlockSpec(memory_space=pl.ANY)] if livebit else []
    out_specs = pl.BlockSpec((1, 7, PSUB, PLANE), lambda i, *_: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n_tiles, 7, PSUB, PLANE), jnp.float32)
    if livebit:
        out_specs = (out_specs, pl.BlockSpec(memory_space=pl.ANY))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((cap // SLAB, PLANE), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            *i32_in,
            pl.BlockSpec((1, 3, PSUB, PLANE), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, PSUB, PLANE), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            *bit_in,
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.SMEM((SLAB, NA), jnp.float32),
            *i32_scratch[:1],
            *([pltpu.SMEM((1, PLANE), jnp.float32)] if livebit else []),
            pltpu.SemaphoreType.DMA,
            *i32_scratch[1:],
            *([pltpu.SemaphoreType.DMA] if livebit else []),
        ],
    )
    extra = ((lax.bitcast_convert_type(attr_tab, jnp.int32),)
             if edge_i32 else ())
    if livebit:
        # zero-init bit rows donated to the bit output: slabs the forward
        # never reaches (all-done early exit) stay dead
        bits_init = (jnp.zeros((cap // SLAB, PLANE), jnp.float32),)
        n_in = 5 + (1 if edge_i32 else 0)  # incl. 2 scalar-prefetch args
        alias = {n_in: 1}
        kw = dict(input_output_aliases=alias,
                  compiler_params=pltpu.CompilerParams(
                      has_side_effects=True))
    else:
        bits_init = ()
        kw = {}
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interpret(),
        **kw,
    )(starts, ends, attr_tab, *extra, rayd_t, pix_t, *bits_init)
    if livebit:
        return out
    return out, None


# =============================================================================
# Backward kernel
# =============================================================================

def _bwd_kernel(edge_i32, livebit, zdma, slabskip, starts_ref, ends_ref,
                *rest):
    rest = list(rest)
    slabs_ref = rest.pop(0) if slabskip else None
    attr_hbm = rest.pop(0)
    attr_i32_hbm = rest.pop(0) if edge_i32 else None
    rayd_ref = rest.pop(0)
    pix_ref = rest.pop(0)
    fwd_ref = rest.pop(0)
    gin_ref = rest.pop(0)
    bits_hbm = rest.pop(0) if livebit else None
    grec_in_hbm = rest.pop(0)
    grec_hbm = rest.pop(0)
    fslab = rest.pop(0)
    islab = rest.pop(0) if edge_i32 else None
    bslab = rest.pop(0) if livebit else None
    grec = rest.pop(0)
    semf = rest.pop(0)
    semi = rest.pop(0) if edge_i32 else None
    semb = rest.pop(0) if livebit else None
    semg = rest.pop(0)
    semz = rest.pop(0) if zdma else None
    # grec_in_hbm is the zero-initialized record buffer, donated to
    # grec_hbm (input_output_aliases): slabs this kernel never visits stay
    # exactly zero, so the XLA-side reduction needs no validity masking.
    del grec_in_hbm
    t = pl.program_id(0)
    start = starts_ref[t]
    end = ends_ref[t]
    n = end - start

    dx = rayd_ref[0, 0]
    dy = rayd_ref[0, 1]
    dz = rayd_ref[0, 2]
    px = pix_ref[0, 0]
    py = pix_ref[0, 1]

    final_T = fwd_ref[0, 0]
    final_pT = fwd_ref[0, 1]
    nc = fwd_ref[0, 2].astype(jnp.int32)

    g_r = gin_ref[0, 0]
    g_g = gin_ref[0, 1]
    g_b = gin_ref[0, 2]
    g_d = gin_ref[0, 3]
    bg_dot = gin_ref[0, 4]

    # Faces at list positions >= max(n_contrib) were never blended by any
    # pixel of this tile (the early-exit analog of the forward): start the
    # reverse walk at the last *contributing* slab. Skipped slabs are zeroed
    # on the XLA side via the same position bound.
    max_nc = jnp.max(nc)
    n_eff = jnp.minimum(n, max_nc)
    n_slabs = pl.cdiv(n_eff, SLAB)

    shape = dx.shape
    init = (
        n_slabs - 1,
        final_pT,
        jnp.ones(shape, jnp.int32),  # "first processed" flag (i32 mask)
        jnp.zeros(shape, jnp.float32),  # last_alpha
        jnp.zeros(shape, jnp.float32),  # last_r
        jnp.zeros(shape, jnp.float32),  # last_g
        jnp.zeros(shape, jnp.float32),  # last_b
        jnp.zeros(shape, jnp.float32),  # last_dep
        jnp.zeros(shape, jnp.float32),  # acc_r
        jnp.zeros(shape, jnp.float32),  # acc_g
        jnp.zeros(shape, jnp.float32),  # acc_b
        jnp.zeros(shape, jnp.float32),  # acc_d
    )

    def cond(c):
        return c[0] >= 0

    def body(c):
        s = c[0]
        s0 = pl.multiple_of(start + s * SLAB, SLAB)
        r0 = pl.multiple_of(s0 // REC_PER_ROW, SLAB // REC_PER_ROW)

        def process(st_in):
            if zdma:
                # pre-zero the record slab by DMA: this slab's output rows
                # are still zero (see _bwd_zdma) -- the readback IS the
                # zeroing
                cz = pltpu.make_async_copy(
                    grec_hbm.at[pl.ds(r0, SLAB // REC_PER_ROW), :], grec,
                    semz)
                cz.start()
            cf = pltpu.make_async_copy(
                attr_hbm.at[pl.ds(s0, SLAB), :], fslab, semf)
            cf.start()
            if edge_i32:
                ci = pltpu.make_async_copy(
                    attr_i32_hbm.at[pl.ds(s0, SLAB), :], islab, semi)
                ci.start()
            if livebit:
                cb = pltpu.make_async_copy(
                    bits_hbm.at[pl.ds(s0 // SLAB, 1), :], bslab, semb)
                cb.start()
            cf.wait()
            if edge_i32:
                ci.wait()
            if livebit:
                cb.wait()
            if zdma:
                cz.wait()

            rem = jnp.minimum(n_eff - s * SLAB, SLAB)
            base = s * SLAB

            def zero_row(j):
                if zdma:  # slab pre-zeroed by the DMA readback
                    return
                for col in range(NG_USED):
                    grec[j // REC_PER_ROW,
                         (j % REC_PER_ROW) * REC_COLS + col] = 0.0

            if not zdma:
                # tail rows (alignment padding / beyond-max_nc faces) ->
                # zero records
                def tail_body(j, carry):
                    zero_row(j)
                    return carry

                lax.fori_loop(rem, SLAB, tail_body, 0)

            def face_step(jj, fs, st):
                j = rem - 1 - jj  # reverse within slab

                def skip(op):
                    # Faces nobody blended: state unchanged, zero record.
                    zero_row(j)
                    return op

                if livebit:
                    # branch on the forward's per-visit liveness bit (ONE
                    # SMEM scalar) BEFORE any vector work -- _bwd_livebit
                    def cov_and_heavy(op):
                        hitg, u, code, i0, i1, i2, mt = _coverage_and_uv(
                            fs, px, py, dx, dy, dz)
                        active = hitg & (base + j < nc)
                        return _bwd_face_heavy(
                            op, fs, active, fs["alpha"], u, i0, i1, i2,
                            code, mt, grec, j, dx, dy, dz, g_r, g_g, g_b,
                            g_d, bg_dot, final_T, final_pT)

                    return lax.cond(bslab[0, j] > 0.0, cov_and_heavy,
                                    skip, st)

                hitg, u, code, i0, i1, i2, mt = _coverage_and_uv(
                    fs, px, py, dx, dy, dz)
                a = fs["alpha"]
                active = hitg & (base + j < nc)

                def heavy(op):
                    return _bwd_face_heavy(
                        op, fs, active, a, u, i0, i1, i2, code, mt, grec,
                        j, dx, dy, dz, g_r, g_g, g_b, g_d, bg_dot,
                        final_T, final_pT)

                if _bwd_nocond():
                    # heavy is fully masked: dead visits compute the skip
                    # path's exact zeros (see _bwd_nocond)
                    return heavy(st)
                return lax.cond(jnp.any(active), heavy, skip, st)

            st = st_in
            st = _face_loop(
                rem, lambda jj: _face_scalars(fslab, rem - 1 - jj, islab),
                face_step, st)

            cg_dma = pltpu.make_async_copy(
                grec, grec_hbm.at[pl.ds(r0, SLAB // REC_PER_ROW), :], semg)
            cg_dma.start()
            cg_dma.wait()
            return st

        st_in = c[1:]
        if slabskip:
            # whole-slab skip on the prefetched per-slab liveness flag
            # (see _bwd_slabskip): a dead slab leaves the blend state and
            # its (still-zero) record rows untouched by construction
            st_out = lax.cond(slabs_ref[s0 // SLAB] > 0, process,
                              lambda st: st, st_in)
        else:
            st_out = process(st_in)
        return (s - 1,) + tuple(st_out)

    lax.while_loop(cond, body, init)


def _bwd_face_heavy(st, fs, active, a, u, i0, i1, i2, code, mt, grec, j,
                    dx, dy, dz, g_r, g_g, g_b, g_d, bg_dot,
                    final_T, final_pT):
    (T, first, la, lr, lg, lb, ld, ar, ag, ab, ad) = st

    one_m_a = jnp.maximum(1.0 - a, 1e-30)
    T = jnp.where(active & (first == 0), T / one_m_a, T)
    first = jnp.where(active, 0, first)

    cr, cg, cb, dep = _interp_scalars(fs, i0, i1, i2)
    c_attr = fs["c"]

    ar_n = la * lr + (1.0 - la) * ar
    ag_n = la * lg + (1.0 - la) * ag
    ab_n = la * lb + (1.0 - la) * ab
    ad_n = la * ld + (1.0 - la) * ad

    # fold the active mask into the a*T factor once instead of masking
    # each downstream product (saves 3 vector ops per face-visit)
    m = active
    mf = m.astype(jnp.float32)
    aT = a * (T * mf)
    dic_r = g_r * aT
    dic_g = g_g * aT
    dic_b = g_b * aT
    did = g_d * aT

    dalpha = (
        (cr - ar_n) * g_r + (cg - ag_n) * g_g + (cb - ab_n) * g_b
        + (dep - ad_n) * g_d
    ) * T
    bg_coef = jnp.where(a == 1.0, -final_pT, -final_T / one_m_a)
    dalpha = (dalpha + bg_coef * bg_dot) * mf

    ar = jnp.where(m, ar_n, ar)
    ag = jnp.where(m, ag_n, ag)
    ab = jnp.where(m, ab_n, ab)
    ad = jnp.where(m, ad_n, ad)
    lr = jnp.where(m, cr, lr)
    lg = jnp.where(m, cg, lg)
    lb = jnp.where(m, cb, lb)
    ld = jnp.where(m, dep, ld)
    la = jnp.where(m, a, la)

    # interpolation-weight gradients (backward.cu:313-349). Only the
    # differences dL_di1 - dL_di0 and dL_di2 - dL_di0 are consumed, and
    # the color/depth corner values are per-face SCALARS: factoring the
    # differences through scalar corner diffs turns 3 full dL_di_k
    # evaluations (~26 vector ops) into 2 direct contractions (~14).
    inten = fs["inten"]
    d_s = fs["d"]
    cu = [(c_attr[3 + c] - c_attr[c]) * inten for c in range(3)]
    cv = [(c_attr[6 + c] - c_attr[c]) * inten for c in range(3)]
    dL_duc = (cu[0] * dic_r + cu[1] * dic_g + cu[2] * dic_b
              + (d_s[1] - d_s[0]) * did)
    dL_dvc = (cv[0] * dic_r + cv[1] * dic_g + cv[2] * dic_b
              + (d_s[2] - d_s[0]) * did)
    duc_du, duc_dv, dvc_du, dvc_dv = clamp_bary_uv_grad(code)
    dL_du = dL_duc * duc_du + dL_dvc * dvc_du
    dL_dv = dL_duc * duc_dv + dL_dvc * dvc_dv

    # Per-pixel Moller-Trumbore vertex gradients (reference formulas incl.
    # the dv==dt quirk, geometry.ray_tri_uv_grads_reference), factored into
    # per-pixel MOMENTS x per-face constants. With R = d x e2, E = e1 x d,
    # X = tv x d all linear in the per-pixel ray direction d, the per-pixel
    # gradient fields collapse to
    #   gp1 = a R + b (e2 x tv);  gp2 = c X + a E + b qv;  gt = c R + b e12
    # where a = -(dL_du u_num + dL_dv t_num) / denom^2, b = dL_dv / denom,
    # c = dL_du / denom. The nine per-pixel field reductions of the direct
    # form become SEVEN moments -- S(a d), S(c d), S(b) -- and the cross
    # products move to per-face scalar math on the reduced values. R and
    # denom are reused from the coverage pass (mt).
    e1x, e1y, e1z = fs["e1"]
    e2x, e2y, e2z = fs["e2"]
    tvx, tvy, tvz = fs["tv"]
    qx, qy, qz = fs["qv"]
    rxe2x, rxe2y, rxe2z, denom_sqrt = mt
    den2 = denom_sqrt * denom_sqrt
    inv2 = 1.0 / jnp.where(den2 == 0.0, 1.0, den2)
    v0 = u * denom_sqrt  # u numerator (u from the coverage pass)
    v2n = qx * e2x + qy * e2y + qz * e2z  # t numerator (qv . e2), scalar
    a_m = -(dL_du * v0 + dL_dv * v2n) * inv2
    b_m = dL_dv * denom_sqrt * inv2
    c_m = dL_du * denom_sqrt * inv2

    S_b = jnp.sum(b_m)
    S_ax = jnp.sum(a_m * dx)
    S_ay = jnp.sum(a_m * dy)
    S_az = jnp.sum(a_m * dz)
    S_cx = jnp.sum(c_m * dx)
    S_cy = jnp.sum(c_m * dy)
    S_cz = jnp.sum(c_m * dz)

    # scalar reconstruction: S(w * (d x e2)) = S(w d) x e2 etc.
    aRx = S_ay * e2z - S_az * e2y
    aRy = S_az * e2x - S_ax * e2z
    aRz = S_ax * e2y - S_ay * e2x
    cRx = S_cy * e2z - S_cz * e2y
    cRy = S_cz * e2x - S_cx * e2z
    cRz = S_cx * e2y - S_cy * e2x
    aEx = e1y * S_az - e1z * S_ay
    aEy = e1z * S_ax - e1x * S_az
    aEz = e1x * S_ay - e1y * S_ax
    cXx = tvy * S_cz - tvz * S_cy
    cXy = tvz * S_cx - tvx * S_cz
    cXz = tvx * S_cy - tvy * S_cx
    e2xtx = e2y * tvz - e2z * tvy
    e2xty = e2z * tvx - e2x * tvz
    e2xtz = e2x * tvy - e2y * tvx
    e12x = e1y * e2z - e1z * e2y
    e12y = e1z * e2x - e1x * e2z
    e12z = e1x * e2y - e1y * e2x

    gp1x = aRx + S_b * e2xtx
    gp1y = aRy + S_b * e2xty
    gp1z = aRz + S_b * e2xtz
    gp2x = cXx + aEx + S_b * qx
    gp2y = cXy + aEy + S_b * qy
    gp2z = cXz + aEz + S_b * qz
    gtx = cRx + S_b * e12x
    gty = cRy + S_b * e12y
    gtz = cRz + S_b * e12z
    gp0x = -gp1x - gp2x - gtx
    gp0y = -gp1y - gp2y - gty
    gp0z = -gp1z - gp2z - gtz

    def put(col, val):
        grec[j // REC_PER_ROW, (j % REC_PER_ROW) * REC_COLS + col] \
            = jnp.sum(val)

    def put_scalar(col, val):
        grec[j // REC_PER_ROW, (j % REC_PER_ROW) * REC_COLS + col] = val

    put(_G_ALPHA, dalpha)
    vals_p = (gp0x, gp0y, gp0z, gp1x, gp1y, gp1z, gp2x, gp2y, gp2z)
    for k, val in enumerate(vals_p):
        put_scalar(_G_P + k, val)
    vc_vals = (
        i0 * dic_r, i0 * dic_g, i0 * dic_b,
        i1 * dic_r, i1 * dic_g, i1 * dic_b,
        i2 * dic_r, i2 * dic_g, i2 * dic_b,
    )
    for k, val in enumerate(vc_vals):
        put(_G_VC + k, val)
    put(_G_VD + 0, i0 * did)
    put(_G_VD + 1, i1 * did)
    put(_G_VD + 2, i2 * did)

    return (T, first, la, lr, lg, lb, ld, ar, ag, ab, ad)


def _run_bwd_kernel(starts, ends, attr_tab, rayd_t, pix_t, fwd_t,
                    gin_t, n_tiles, cap, bits=None):
    edge_i32 = _edge_i32()
    livebit = _bwd_livebit() and bits is not None
    zdma = _bwd_zdma()
    slabskip = livebit and _bwd_slabskip()
    i32_in = [pl.BlockSpec(memory_space=pl.ANY)] if edge_i32 else []
    bit_in = [pl.BlockSpec(memory_space=pl.ANY)] if livebit else []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3 if slabskip else 2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            *i32_in,
            pl.BlockSpec((1, 3, PSUB, PLANE), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, PSUB, PLANE), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, PSUB, PLANE), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 5, PSUB, PLANE), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            *bit_in,
            pl.BlockSpec(memory_space=pl.ANY),  # zero-init records (donated)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=(
            [pltpu.SMEM((SLAB, NA), jnp.float32)]
            + ([pltpu.SMEM((SLAB, NA), jnp.int32)] if edge_i32 else [])
            + ([pltpu.SMEM((1, PLANE), jnp.float32)] if livebit else [])
            + [pltpu.SMEM((SLAB // REC_PER_ROW, NG), jnp.float32),
               pltpu.SemaphoreType.DMA]
            + ([pltpu.SemaphoreType.DMA] if edge_i32 else [])
            + ([pltpu.SemaphoreType.DMA] if livebit else [])
            + [pltpu.SemaphoreType.DMA]
            + ([pltpu.SemaphoreType.DMA] if zdma else [])
        ),
    )
    grec_init = jnp.zeros((cap // REC_PER_ROW, NG), jnp.float32)
    extra = ((lax.bitcast_convert_type(attr_tab, jnp.int32),)
             if edge_i32 else ())
    bits_in = (bits,) if livebit else ()
    slab_in = ()
    if slabskip:
        # per-slab any-live flags for the whole-slab skip (scalar
        # prefetch; see _bwd_slabskip). Only lanes [0, SLAB) of a bit row
        # are ever written by the forward -- the rest of the SMEM scratch
        # row is uninitialized garbage -- so the reduction must not read
        # them
        slab_in = ((jnp.max(bits[:, :SLAB], axis=1) > 0.0)
                   .astype(jnp.int32),)
    # grec_init is donated to the output (indices count the
    # scalar-prefetch args too; the i32 view / bit table / slab flags
    # shift it)
    grec_idx = (7 + (1 if edge_i32 else 0) + (1 if livebit else 0)
                + (1 if slabskip else 0))
    return pl.pallas_call(
        functools.partial(_bwd_kernel, edge_i32, livebit, zdma, slabskip),
        grid_spec=grid_spec,
        input_output_aliases={grec_idx: 0},
        out_shape=jax.ShapeDtypeStruct((cap // REC_PER_ROW, NG), jnp.float32),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, ends, *slab_in, attr_tab, *extra, rayd_t, pix_t, fwd_t,
      gin_t, *bits_in, grec_init)


# =============================================================================
# Pipeline assembly
# =============================================================================

def _binned_prepare(verts, faces, verts_color, faces_opacity, mv_t, proj_t,
                    inv_mv_t, inv_proj_t, verts_depth, faces_intense,
                    height, width, kcap, run_cap=None):
    B = mv_t.shape[0]
    gx = (width + TILE - 1) // TILE
    gy = (height + TILE - 1) // TILE
    n_tiles = B * gx * gy
    cap = aligned_capacity(kcap, n_tiles, SLAB)

    ndc, img = project_verts(verts, mv_t, proj_t, width, height)
    pre = preprocess_faces(ndc, img, faces, width, height, TILE, TILE)
    raw = emit_and_sort(pre, gx, gy, kcap, tile_px=TILE, run_cap=run_cap)
    keys = align_to_slabs(raw, n_tiles, SLAB, cap)

    cam_o = inv_mv_t[:, 3, :3]  # [B, 3]
    face_tab = _build_face_table(
        verts, faces, verts_color, faces_opacity, verts_depth, faces_intense,
        img, cam_o,
    )
    attr_tab = _build_slot_attrs(face_tab, keys)

    ray_o, ray_d = generate_rays(inv_mv_t, inv_proj_t, width, height,
                                 norm_eps_mode="tri")
    rayd_t = _tileify(ray_d, B, height, width, gx, gy)  # [NT, 3, 8, 128]
    pix_t = _pixel_coords(B, gx, gy)

    return keys, attr_tab, rayd_t, pix_t, (B, gx, gy, cap)


def _render_binned_impl(verts, faces, verts_color, faces_opacity, mv_t,
                        proj_t, inv_mv_t, inv_proj_t, verts_depth,
                        faces_intense, bg, height, width, kcap,
                        run_cap=None, need_bits=False):
    keys, attr_tab, rayd_t, pix_t, (B, gx, gy, cap) = _binned_prepare(
        verts, faces, verts_color, faces_opacity, mv_t, proj_t, inv_mv_t,
        inv_proj_t, verts_depth, faces_intense, height, width, kcap,
        run_cap,
    )
    n_tiles = B * gx * gy
    out, bits = _run_fwd_kernel(keys.starts, keys.ends, attr_tab, rayd_t,
                                pix_t, n_tiles, height, width,
                                cap=cap if need_bits else None)
    img = _untile(out[:, 0:4], B, height, width, gx, gy)  # [B,H,W,4]
    state = _untile(out[:, 4:7], B, height, width, gx, gy)  # T, pT, nc

    T = state[..., 0]
    color = img[..., 0:3] + T[..., None] * bg[None, None, None, :]
    depth = img[..., 3] + T * 1.0
    color = color.transpose(0, 3, 1, 2)
    depth = depth[:, None, :, :]
    return color, depth, out[:, 4:7], keys, (attr_tab, rayd_t, pix_t, bits)


# =============================================================================
# custom_vjp wrapper
# =============================================================================

def _overflow_warning(keys: AlignedKeys, kcap: int) -> None:
    from .binning import overflow_warning

    overflow_warning(keys.overflow, keys.total, kcap,
                     "render_tri_binned; raise TriRenderSettings.key_capacity")


def _resolve_kcap(faces, mv_t, kcap):
    """Shared empty-scene guard + kcap defaulting: the primal, the VJP
    forward, and the VJP backward must resolve the SAME capacity (a
    divergence would mis-size the backward's record buffers)."""
    if faces.shape[0] == 0:
        raise ValueError(
            "render_tri_binned requires at least one face; the strategy "
            "dispatch (ops.tri.render_tri_auto, used by api.render_tri) "
            "routes empty/small scenes to the dense oracle path")
    if kcap is None:
        kcap = default_key_capacity(mv_t.shape[0], faces.shape[0])
    return kcap


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14, 15))
def render_tri_binned(verts, faces, verts_color, faces_opacity, mv_t, proj_t,
                      inv_mv_t, inv_proj_t, verts_depth, faces_intense, bg,
                      height, width, kcap=None, with_aux=False,
                      run_cap=None):
    """Tile-binned differentiable tri renderer (scaled path).

    Semantics identical to render_tri_oracle; see module docstring. ``kcap``
    is the static (face, tile) key capacity; None picks a heuristic from
    shapes. ``run_cap`` is the static (face, tile-row) run-table capacity
    of the exact emission (None = heuristic; size it with
    binning.recommended_run_capacity to trim run-scale row-op cost).

    Overflow policy: if more (face, tile) pairs are emitted than ``kcap``,
    keys are dropped in emission order; emission is view-major and, within
    each view, sorted by the face depth key -- so the FARTHEST faces of the
    highest-numbered view lose their tiles first (the least visible
    geometry degrades first). A face straddling the cut keeps the row-major
    head of its tile rect. Overflow is surfaced (a) via ``with_aux=True``
    -> extra output ``(overflow bool[], num_rendered int32[])``, (b) by a
    jax.debug.print warning on callback-capable backends, and (c) via
    utils.diagnostics.tri_render_stats.

    Gradients are defined for verts, verts_color, faces_opacity,
    verts_depth and faces_intense only -- the reference's exact gradient
    surface (render.cu:166-171). ``bg`` receives a zero gradient (the
    reference's autograd Function does not differentiate settings).
    """
    kcap = _resolve_kcap(faces, mv_t, kcap)
    color, depth, _, keys, _ = _render_binned_impl(
        verts, faces, verts_color, faces_opacity, mv_t, proj_t, inv_mv_t,
        inv_proj_t, verts_depth, faces_intense, bg, height, width, kcap,
        run_cap,
    )
    _overflow_warning(keys, kcap)
    if with_aux:
        return color, depth, (keys.overflow, keys.total)
    return color, depth


def _b_fwd(verts, faces, verts_color, faces_opacity, mv_t, proj_t,
           inv_mv_t, inv_proj_t, verts_depth, faces_intense, bg,
           height, width, kcap, with_aux, run_cap=None):
    kcap = _resolve_kcap(faces, mv_t, kcap)
    color, depth, fwd_state_t, keys, saved = _render_binned_impl(
        verts, faces, verts_color, faces_opacity, mv_t, proj_t, inv_mv_t,
        inv_proj_t, verts_depth, faces_intense, bg, height, width, kcap,
        run_cap, need_bits=True,
    )
    _overflow_warning(keys, kcap)
    # Residuals keep the slot attr tables and tiled ray/pixel data -- the
    # analog of the reference's opaque saved buffers (__init__.py:97-110) --
    # so the backward pass skips the projection/sort/gather rebuild. With
    # RECOMPUTE_BWD_ATTRS the cap-scale attr table is dropped from the
    # residuals and rebuilt in the backward (memory/time trade, see flag).
    if RECOMPUTE_BWD_ATTRS:
        saved = (None,) + saved[1:]
    res = (verts, faces, verts_color, faces_opacity, mv_t, proj_t,
           inv_mv_t, inv_proj_t, verts_depth, faces_intense, bg,
           fwd_state_t, keys, saved)
    if with_aux:
        return (color, depth, (keys.overflow, keys.total)), res
    return (color, depth), res


def _b_bwd(height, width, kcap, with_aux, run_cap, res, cots):
    (verts, faces, verts_color, faces_opacity, mv_t, proj_t, inv_mv_t,
     inv_proj_t, verts_depth, faces_intense, bg, fwd_state_t, keys,
     saved) = res
    if with_aux:
        dL_dcolor, dL_ddepth, _aux_cot = cots
    else:
        dL_dcolor, dL_ddepth = cots
    kcap = _resolve_kcap(faces, mv_t, kcap)

    B = mv_t.shape[0]
    P = verts.shape[0]
    F = faces.shape[0]
    gx = (width + TILE - 1) // TILE
    gy = (height + TILE - 1) // TILE
    n_tiles = B * gx * gy
    cap = aligned_capacity(kcap, n_tiles, SLAB)

    attr_tab, rayd_t, pix_t, bits = saved
    if attr_tab is None:  # RECOMPUTE_BWD_ATTRS at fwd time
        ndc, img = project_verts(verts, mv_t, proj_t, width, height)
        face_tab = _build_face_table(
            verts, faces, verts_color, faces_opacity, verts_depth,
            faces_intense, img, inv_mv_t[:, 3, :3],
        )
        attr_tab = _build_slot_attrs(face_tab, keys)

    gcol = dL_dcolor.transpose(0, 2, 3, 1)  # [B, H, W, 3]
    gdep = dL_ddepth[:, 0, :, :]  # [B, H, W]
    bg_dot = jnp.einsum("c,bhwc->bhw", bg, gcol) + gdep
    gin = jnp.concatenate(
        [gcol, gdep[..., None], bg_dot[..., None]], axis=-1
    )  # [B, H, W, 5]
    gin_t = _tileify(gin, B, height, width, gx, gy)

    rec4 = _run_bwd_kernel(keys.starts, keys.ends, attr_tab, rayd_t,
                           pix_t, fwd_state_t, gin_t, n_tiles, cap,
                           bits=bits)

    # Reduce per-slot records to per-(view, face) gradients with ONE
    # deterministic segment scatter-add -- the structural analog of the
    # reference's atomicAdd scatter (backward.cu:389-418), but with a
    # fixed summation order. Round-3 finding (tools/exp_scatter_scale.py):
    # XLA:TPU scatter-add unit cost is ~13-19 ns/row while the TARGET
    # table is small, but falls off a cliff (~97 ns/row) once the target
    # exceeds roughly 20-30 MB -- the root cause of the former
    # super-linear B=4 backward (VERDICT r2 W2). Two paths:
    #
    # * small B*F target: scatter into [B*F, NG_USED] keyed by the slot's
    #   depth-sorted (view, face) id, then un-permute through sigma.
    # * large B*F (B >= ~3 at 100k faces): keep the target at F rows.
    #   View-summed quantities (opacity, vertex-position moments, and
    #   vcolor with the per-view intensity folded in at SLOT scale from
    #   the attr table) merge across views by linearity; the per-view
    #   quantities are narrow (intensity grad contracted at slot scale
    #   from the VC records + 3 depth cols) and ride in a masked
    #   per-view column block, so the table is [F, 19 + 4B] -- under the
    #   cliff for any practical single-chip view count. Keys are
    #   ORIGINAL face ids (sigma gathered per slot), so no un-permute.
    #
    # Round-2/3 negative results kept for the record: sort-based segment
    # reduction (payload riding the sort) measured WORSE than the scatter
    # at this capacity (tools/exp_honest.py), as did collision-spreading
    # and chunked scatters (tools/exp_scatter_scale.py). No validity
    # masking is needed: slabs the kernel never visits stay zero
    # (zero-initialized donated output), in-slab tail rows are zeroed by
    # the kernel, and padding slots carry flat=0 / zero records. Both
    # reduce layouts run through _reduce_records, which exploits that
    # zero structure: the packed record rows are compacted to the walked
    # slot prefixes (41k of 770k slots at the bench scene) BEFORE the
    # un-pack relayout and every column pass below, so the whole reduce
    # runs at walked scale.
    inten_bf = faces_intense  # [B, F]

    # Route to the wide layout only when it actually shrinks the target:
    # at small B the [F, 19+4B] table is no smaller than [B*F, 23] (equal
    # at B=1), so the small path -- which skips the cap-scale sigma gather
    # and per-view masking -- wins even when both cross the cliff.
    small_bytes = B * F * (NG_USED + 1) * 4
    wide_bytes = F * (19 + 4 * B) * 4
    if small_bytes <= max(REDUCE_TARGET_BYTES_MAX, wide_bytes):
        # dL/dinten rides as a 23rd scatter column, contracted at SLOT
        # scale from the VC records and the attr table's raw colors
        # (elementwise, at walked scale -- no row ops). The former F-scale
        # verts_color[faces] gather + einsum cost ~3 ms for the same
        # quantity: vc_rec[k,c] = sum_p i_k dL_dicolor_c and
        # icol_raw_c = sum_k i_k c_attr[k,c].
        # (measured round 4: scattering by ORIGINAL ids through a
        # walked-scale sigma gather to skip the B*F un-permute below is a
        # WASH at the bench scene -- the unique-index permutation scatter
        # is as cheap as the gather it would replace; kept this form for
        # the cheaper full-capacity fallback)
        def mk_small(r, take):
            gin = jnp.einsum("cj,cj->c", take(attr_tab)[:, _C0:_C0 + 9],
                             r[:, _G_VC:_G_VC + 9])
            upd = jnp.concatenate([r[:, :NG_USED], gin[:, None]], axis=1)
            return upd, take(keys.flat)

        face_g_sorted = _reduce_records(
            rec4, keys, fwd_state_t, cap, n_tiles, B * F, mk_small)
        face_g = (
            jnp.zeros((B * F, NG_USED + 1), jnp.float32)
            .at[keys.sigma].set(face_g_sorted, unique_indices=True)
            .reshape(B, F, NG_USED + 1)
        )
        g_fopacity = jnp.sum(face_g[..., _G_ALPHA], axis=0)  # [F]
        g_fintense = face_g[..., NG_USED]  # [B, F]
        gp = jnp.sum(face_g[..., _G_P:_G_P + 9], axis=0).reshape(F, 3, 3)
        gvc = jnp.sum(
            face_g[..., _G_VC:_G_VC + 9] * inten_bf[..., None], axis=0
        ).reshape(F, 3, 3)
        gvd = face_g[..., _G_VD:_G_VD + 3]  # [B, F, 3]
    else:
        def mk_wide(r, take):
            at = take(attr_tab)
            vc_rec = r[:, _G_VC:_G_VC + 9]
            gin = jnp.einsum("cj,cj->c", at[:, _C0:_C0 + 9], vc_rec)
            common = jnp.concatenate(
                [r[:, _G_ALPHA:_G_ALPHA + 1],
                 r[:, _G_P:_G_P + 9],
                 vc_rec * at[:, _INTEN][:, None]], axis=1)  # [*, 19]
            pv = jnp.concatenate(
                [gin[:, None], r[:, _G_VD:_G_VD + 3]], axis=1)  # [*, 4]
            flat_slot = take(keys.flat)
            vb = flat_slot // F
            upd = jnp.concatenate(
                [common]
                + [jnp.where((vb == b)[:, None], pv, 0.0)
                   for b in range(B)],
                axis=1)  # [*, 19 + 4B]
            return upd, keys.sigma[flat_slot] % F  # original face ids

        wide = _reduce_records(rec4, keys, fwd_state_t, cap, n_tiles, F,
                               mk_wide)
        g_fopacity = wide[:, 0]
        gp = wide[:, 1:10].reshape(F, 3, 3)
        gvc = wide[:, 10:19].reshape(F, 3, 3)
        pvw = wide[:, 19:].reshape(F, B, 4).transpose(1, 0, 2)
        g_fintense = pvw[..., 0]  # [B, F]
        gvd = pvw[..., 1:4]  # [B, F, 3]

    # verts + vcolor + per-view vert depths all share the faces index:
    # ONE fused scatter-add into [P, max(17, 6+B)] (scatter cost is per
    # ROW, so merging the [B, P]-target depth scatter in rides free).
    # The update width is padded to >= 17 lanes: XLA:TPU scatter-add
    # lowers narrower updates into a ~7x slower per-element path once the
    # TARGET has a few hundred thousand rows (measured on v5e: 300k-row
    # [P, 7] target costs ~85 ns/row vs ~9 ns/row at width 17+, any index
    # pattern -- tools/exp_scatter_width.py); the padding columns are
    # dead weight the fast path carries for free.
    nw = max(17, 6 + B)
    upd = jnp.concatenate([gp, gvc, gvd.transpose(1, 2, 0)], axis=-1)
    upd = jnp.pad(upd, ((0, 0), (0, 0), (0, nw - (6 + B))))
    acc = jnp.zeros((P, nw), jnp.float32).at[faces].add(upd)
    g_verts = acc[:, :3]
    g_vcolor = acc[:, 3:6]
    g_vdepth = acc[:, 6:6 + B].T

    def zi(x):
        return np.zeros(x.shape, jax.dtypes.float0)

    return (
        g_verts,
        zi(faces),
        g_vcolor,
        g_fopacity,
        jnp.zeros_like(mv_t),
        jnp.zeros_like(proj_t),
        jnp.zeros_like(inv_mv_t),
        jnp.zeros_like(inv_proj_t),
        g_vdepth,
        g_fintense,
        jnp.zeros_like(bg),
    )


render_tri_binned.defvjp(_b_fwd, _b_bwd)
