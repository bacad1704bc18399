"""Tile binning: static-capacity key emission, sort, and range identification.

XLA-native replacement for the reference's host-orchestrated pipeline
(rasterizer_impl.cu:175-338):

  CUB InclusiveSum over tiles_touched      -> jnp.cumsum
  D2H readback of num_rendered + realloc   -> static key capacity KCAP with an
                                              overflow indicator (no host sync
                                              under jit)
  duplicateWithKeys kernel                 -> EXACT-coverage emission: one
                                              slot per (face, tile) whose
                                              conservative corner test passes
                                              (the reference emits the full
                                              bbox rect, ~1.6x more pairs at
                                              100k tris; images identical --
                                              culled pairs cover no pixel).
                                              Per-slot keys reconstruct from
                                              telescoped per-run delta
                                              scatter-adds + cumsum
                                              (_emit_exact docstring)
  CUB radix sort on packed (tile|depth)    -> per-view *face* pre-sort by
                                              depth (F-scale, cheap), then a
                                              single-key stable lax.sort of
                                              the slots by tile -- within-tile
                                              depth order comes free from the
                                              emission order
  identifyTileRanges kernel                -> searchsorted of tile ids over
                                              the sorted keys

Sort-order parity with the reference: the reference emits keys per face in
row-major order over the face's tile rect (rasterizer_impl.cu:69-96) and
stably radix-sorts by (tile, depth), so equal (tile, depth) keys keep
submission (view-major, face-major) order. Here faces are pre-sorted
per-view by (depth, face index) -- stable, so equal depths keep face order --
and slots are stably sorted by tile only; the resulting per-tile sequences
are identical: (depth, view, face, row-major rect position).

TPU design notes (measured on v5e; see tools/bench_primitives.py): XLA
gathers and scatters cost ~10 ns per ROW regardless of row width up to
128 lanes, so per-slot (1.4M-row) gathers are the enemy. This pipeline
does exactly ONE slot-scale scatter (the slab-aligned placement) and ZERO
slot-scale gathers: every per-slot quantity (owning face, tile rect, run
start, alignment shift) is forward-filled by boundary scatters at face or
tile scale followed by lax.cummax, which is ~20x cheaper than a gather at
the same size. The global sort itself is cheap (~2.6 ms at 1.4M keys);
narrow gathers were the real cost of the round-1/2 pipeline.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.config import SUBPIXEL

Array = jax.Array

# The slot->rect forward fill packs (face-emission-rank << 10 | rect chunk)
# into int32 cummax lanes: the emission rank must fit in 21 bits.
_MAX_BF = 1 << 21

# Exact-coverage emission uses telescoped int32 delta cumsums (see
# _emit_exact); their partial sums stay exact while B*n_tiles + kcap is
# far from 2^31. Beyond this capacity, fall back to bbox emission.
_EXACT_KCAP_MAX = 1 << 28


class BinnedKeys(NamedTuple):
    """Sorted key table at static capacity KCAP.

    ``sorted_id`` indexes the per-view depth-sorted face ordering; ``sigma``
    maps that ordering back to original (view * F + face) ids. Product code
    keeps everything in sorted-face space (attr tables are built in sorted
    order) and un-permutes only F-scale results, so no slot-scale gather is
    ever needed. ``face``/``batch`` are the original ids per sorted slot --
    derived via a slot-scale gather, so consume them only in tests and
    diagnostics (XLA dead-code-eliminates them in the product pipeline).
    """
    sorted_id: Array  # [KCAP] int32 depth-sorted (view, face) index per slot
    sigma: Array      # [B*F] int32 original view*F+face id per sorted index
    face: Array       # [KCAP] int32 original face id per slot (tests only)
    batch: Array      # [KCAP] int32 view id per slot (tests only)
    tile_key: Array   # [KCAP] int32 batch*n_tiles + tile_id (BIG for padding)
    starts: Array     # [B * n_tiles] int32 slot range start per tile
    ends: Array       # [B * n_tiles] int32 slot range end per tile
    total: Array      # [] int32 number of real (face, tile) pairs emitted
    overflow: Array   # [] bool, True if total > KCAP (keys were dropped)


def _fill_from_boundaries(positions: Array, values: Array, kcap: int,
                          dtype=jnp.int32) -> Array:
    """Forward-fill: scatter ``values`` at ``positions`` (monotone
    non-decreasing values required) and cummax-fill the gaps."""
    marks = jnp.zeros((kcap,), dtype).at[positions].max(
        values.astype(dtype), mode="drop")
    return lax.cummax(marks)


def _relayout(rows: Array, k: int) -> Array:
    """Physically relayout a row-gathered [N, K] table to [N/128, K, 128]
    (rows in lanes). On TPU a [N, K] buffer pads K up to 128 lanes and
    every consumer fusion pays a full strided pass over the padded buffer;
    after this one relayout each column k is a clean contiguous vector.
    The optimization_barrier pins the relayout so XLA cannot fuse it away
    into per-consumer strided reads (tools/profile_step_variants.py).
    N must be a multiple of 128. Canonical helper -- the tet march and the
    exact emission both import it."""
    m = rows.shape[0]
    return lax.optimization_barrier(
        rows.reshape(m // 128, 128, k).swapaxes(1, 2))


def _gather_cols(tab: Array, idx: Array, k: int):
    """Row-gather [len(idx), k] and split into clean 1-D columns via
    _relayout (with a plain-slice fallback for tiny/unaligned row
    counts)."""
    rows = tab[idx]
    n = rows.shape[0]
    if n % 128 == 0 and n >= 128:
        r = _relayout(rows, k)
        return [r[:, c, :].reshape(n) for c in range(k)]
    return [rows[:, c] for c in range(k)]


def _row_tile_interval(ea, eb, ec, rx, nx, tyf, tile_px, grid_x):
    """Conservative tile interval [lo, lo+cnt) of one tile row.

    For each coverage edge, s(p) = A px + B py + C must be < 0 at some
    pixel sample for the tile to be covered (in_tri semantics; the bias
    already rides in C). s is affine, so min over the tile's pixel-sample
    box is attained at a corner; the triangle is convex, so per tile row
    the passing tx form an interval cut by three half-line bounds. All in
    f32 with margins sized so rounding can only WIDEN the interval: a
    covered tile is never culled (magnitudes reach ~2^32 for off-screen
    vertices, so the margin is 512 absolute plus a relative term).

    ea/eb/ec: length-3 tuples of f32 arrays (one per edge); rx/nx: f32
    bbox-rect origin/width; tyf: f32 tile row. Returns (lo f32, cnt f32).
    """
    ts = 16.0 * tile_px
    lof = rx
    hif = rx + nx - 1.0
    empty = jnp.zeros(tyf.shape, bool)
    for e in range(3):
        a, b, c = ea[e], eb[e], ec[e]
        ox = jnp.where(a > 0, 8.0, ts - 16.0 + 8.0)
        oy = jnp.where(b > 0, 8.0, ts - 16.0 + 8.0)
        h = a * ox + b * (ts * tyf + oy) + c
        eps = 512.0 + 1e-6 * (jnp.abs(a) * ts + jnp.abs(b * (ts * tyf + oy))
                              + jnp.abs(c))
        g = a * ts
        bound = jnp.clip((eps - h) / jnp.where(g == 0.0, 1.0, g),
                         -2.0, grid_x + 2.0)
        # division error on tile-scale bounds is < 1e-4; the 1e-3 bias
        # rounds strictly outward (over-keep), never inward
        hif = jnp.where(g > 0, jnp.minimum(hif, jnp.floor(bound + 1e-3)),
                        hif)
        lof = jnp.where(g < 0, jnp.maximum(lof, jnp.ceil(bound - 1e-3)),
                        lof)
        empty = empty | ((g == 0.0) & (h >= eps))
    lof = jnp.maximum(lof, rx)
    hif = jnp.minimum(hif, rx + nx - 1.0)
    cnt = jnp.where(empty, 0.0, jnp.maximum(hif - lof + 1.0, 0.0))
    return lof, cnt


def _edge_wrap_risk(pre: dict, grid_x: int, grid_y: int,
                    tile_px: int) -> Array:
    """[B, F] bool: True when a face's coverage edge function s = A px +
    B py + C can exceed int32 range somewhere on the tile grid. in_tri
    (and the CUDA reference, auxiliary.h:179-243) evaluate s in WRAPPING
    int32 arithmetic; the interval culling below reasons about TRUE signs,
    so for these faces (vertices projected near the w=0 plane blow up the
    coefficients) the cull could drop tiles the wrapped test covers --
    they must emit their full bbox rect instead. Conservative f32 bound
    with margin (2^30 vs the true 2^31)."""
    s_max = jnp.float32(SUBPIXEL * tile_px * max(grid_x, grid_y))
    m = jnp.zeros(pre["tiles"].shape, jnp.float32)
    for e in range(3):
        m = jnp.maximum(
            m,
            (jnp.abs(pre["edge_a"][e].astype(jnp.float32))
             + jnp.abs(pre["edge_b"][e].astype(jnp.float32))) * s_max
            + jnp.abs(pre["edge_c"][e].astype(jnp.float32)))
    return m >= jnp.float32(2.0 ** 30)


def exact_tile_counts(pre: dict, grid_x: int, grid_y: int,
                      tile_px: int) -> Array:
    """Exact-coverage emission counts per (view, face): the number of
    bbox-rect tiles whose conservative corner test passes (the counts the
    exact emission path uses; wrap-risk faces count their full bbox rect,
    see _edge_wrap_risk). [B, F] int32."""
    eA = [a.astype(jnp.float32)[None] for a in pre["edge_a"]]
    eB = [b.astype(jnp.float32)[None] for b in pre["edge_b"]]
    eC = [c.astype(jnp.float32)[None] for c in pre["edge_c"]]
    rx = pre["rect_min"][..., 0].astype(jnp.float32)[None]
    nx = (pre["rect_max"][..., 0] - pre["rect_min"][..., 0]).astype(
        jnp.float32)[None]
    ry = pre["rect_min"][..., 1][None]
    ny = (pre["rect_max"][..., 1] - pre["rect_min"][..., 1])[None]
    r = jnp.arange(grid_y, dtype=jnp.int32)[:, None, None]
    tyf = (ry + r).astype(jnp.float32)
    _lo, cnt = _row_tile_interval(eA, eB, eC, rx, nx, tyf, tile_px, grid_x)
    risk = _edge_wrap_risk(pre, grid_x, grid_y, tile_px)
    cnt = jnp.where(risk[None], nx, cnt)
    cnt = jnp.where(r < ny, cnt, 0.0)
    total = jnp.sum(cnt, axis=0).astype(jnp.int32)
    return jnp.where(
        (pre["tiles"] > 0) & pre["nondeg"], total, 0)


def emit_and_sort(pre: dict, grid_x: int, grid_y: int, kcap: int,
                  sort_by: str = "depth",
                  tile_px: int | None = None,
                  run_cap: int | None = None) -> BinnedKeys:
    """Build the sorted (tile, depth) key table.

    pre: output of geometry.preprocess_faces (tiles, rect_min/max, depth,
    min_depth, valid -- all [B, F]).
    sort_by: "depth" (tri renderer) or "min_depth" (tet renderer,
    renderer_impl.cu:318-329).

    Overflow policy (total emitted pairs > kcap): emission is view-major
    and depth-sorted within each view, so the capacity cut drops the
    FARTHEST faces of the highest-numbered views first -- the least visible
    geometry loses. (The CUDA reference sizes its buffer exactly after a
    device-to-host readback, rasterizer_impl.cu:287-299, and never drops;
    a static capacity must pick a policy, and farthest-first is the one
    that degrades most gracefully.) A face straddling the cut keeps the
    row-major head of its tile rect.
    """
    tiles = pre["tiles"]  # [B, F]
    B, F = tiles.shape
    n_tiles = grid_x * grid_y
    if B * F >= (1 << 23):
        # the exact path's telescoped deltas carry raw face ids (no rank
        # packing), but the run row-start column rides f32-exact and the
        # bbox fallback still packs (rank << 10): cap generously
        raise ValueError(
            f"B*F = {B * F} exceeds the 2^23 emission budget; shard views "
            "or faces first (shard_map over views keeps per-device B*F "
            "small -- parallel/sharding.py)")
    if grid_x > 1023 or grid_y > 1023:
        # BOTH paths pack tile-rect coords into 10-bit fields; beyond that
        # tile ids would silently corrupt (images ~32k px per side at
        # 32-px tiles) -- raise like the emission-rank guard does
        raise ValueError(
            f"tile grid {grid_x}x{grid_y} exceeds the 10-bit packed-rect "
            "budget (1023 per axis); render in crops or shard the image")

    # the exact path's telescoped key cumsum stays int32-exact while
    # B*n_tiles + kcap fits comfortably in 31 bits; gate generously
    # (beyond it -- absurd single-chip capacities -- fall back to bbox
    # emission; the sharded path keeps per-device capacities small)
    if (tile_px is not None and "edge_a" in pre and kcap < _EXACT_KCAP_MAX
            and tiles.size > 0):
        return _emit_exact(pre, grid_x, grid_y, kcap, sort_by, tile_px,
                           run_cap)

    if B * F >= _MAX_BF:
        raise ValueError(
            f"B*F = {B * F} exceeds the 2^21 emission-rank budget of the "
            "bbox path's packed forward fill (the exact path -- pass "
            "tile_px -- allows 2^23); shard views or faces first")

    # --- per-view face pre-sort by depth (F-scale: ~100x cheaper than the
    # slot-scale sort it replaces as a depth key) ---
    sigma_v, sigma = _depth_presort(pre, tiles, sort_by)

    tiles_s = jnp.take_along_axis(tiles, sigma_v, axis=1).reshape(-1)
    incl = jnp.cumsum(tiles_s)
    excl = (incl - tiles_s).astype(jnp.int32)
    total = incl[-1].astype(jnp.int32) if tiles_s.size else jnp.int32(0)

    # rect origin (x, y) and width, bit-packed 10+10+10 (grid dims < 1024)
    packed = (
        pre["rect_min"][..., 0].astype(jnp.int32)
        | (pre["rect_min"][..., 1].astype(jnp.int32) << 10)
        | (jnp.maximum(
            pre["rect_max"][..., 0] - pre["rect_min"][..., 0], 1) << 20)
    )
    packed_s = jnp.take_along_axis(packed, sigma_v, axis=1).reshape(-1)

    # --- slot -> face inversion + rect forward fill, gather-free: each
    # emitting face marks its first slot; cummax fills ownership. The rect
    # rides along as three 10-bit chunks packed under the emission rank
    # (rank << 10 | chunk), each monotone in slot order. ---
    q = jnp.arange(B * F, dtype=jnp.int32)
    emitting = tiles_s > 0
    mark_pos = jnp.where(emitting, excl, kcap)

    fill0 = _fill_from_boundaries(
        mark_pos, (q << 10) | (packed_s & 0x3FF), kcap)
    fill1 = _fill_from_boundaries(
        mark_pos, (q << 10) | ((packed_s >> 10) & 0x3FF), kcap)
    fill2 = _fill_from_boundaries(
        mark_pos, (q << 10) | ((packed_s >> 20) & 0x3FF), kcap)
    bf = fill0 >> 10  # [kcap] sorted-space owning face per slot
    rx = fill0 & 0x3FF
    ry = fill1 & 0x3FF
    nx = jnp.maximum(fill2 & 0x3FF, 1)

    # run start per slot (the owning face's first slot), also monotone
    run_start = _fill_from_boundaries(mark_pos, excl, kcap)

    slots = jnp.arange(kcap, dtype=jnp.int32)
    in_range = slots < total
    k = slots - run_start
    tx = rx + k % nx
    ty = ry + k // nx
    tile_id = ty * grid_x + tx

    big = jnp.int32(B * n_tiles)
    b = bf // F
    tile_key = jnp.where(in_range, b * n_tiles + tile_id, big)

    return _sort_and_ranges(tile_key, bf, sigma, B, F, n_tiles, total,
                            total > kcap)


def _depth_presort(pre: dict, emit_counts: Array, sort_by: str):
    """Per-view face pre-sort by depth (stable; equal depths keep face
    order -- the reference's stable (tile, depth) radix-sort parity
    argument in the module docstring relies on this). Shared by both
    emission paths so the tie-break can never drift between them."""
    B, F = emit_counts.shape
    depth = pre["min_depth" if sort_by == "min_depth" else "depth"]
    sort_key = jnp.where(emit_counts > 0, depth, jnp.float32(jnp.inf))
    iota_f = jnp.broadcast_to(jnp.arange(F, dtype=jnp.int32)[None], (B, F))
    _, sigma_v = lax.sort((sort_key, iota_f), dimension=1, num_keys=1,
                          is_stable=True)  # [B, F] per-view face order
    sigma = (sigma_v
             + jnp.arange(B, dtype=jnp.int32)[:, None] * F).reshape(-1)
    return sigma_v, sigma


def _sort_and_ranges(tile_key: Array, bf: Array, sigma: Array, B: int,
                     F: int, n_tiles: int, total: Array,
                     overflow: Array) -> BinnedKeys:
    """Single-key stable tile sort + range identification + key-table
    assembly (shared tail of both emission paths). Within-tile depth order
    is inherited from the emission order (faces pre-sorted by depth)."""
    tile_key_s, bf_s = lax.sort((tile_key, bf), num_keys=1, is_stable=True)

    tids = jnp.arange(B * n_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(tile_key_s, tids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(tile_key_s, tids, side="right").astype(jnp.int32)

    # original ids per slot: slot-scale gather -- tests/diagnostics only,
    # dead-code-eliminated when unused (see class docstring)
    orig = sigma[bf_s]
    return BinnedKeys(
        sorted_id=bf_s.astype(jnp.int32),
        sigma=sigma.astype(jnp.int32),
        face=(orig % F).astype(jnp.int32),
        batch=(orig // F).astype(jnp.int32),
        tile_key=tile_key_s,
        starts=starts,
        ends=ends,
        total=total,
        overflow=overflow,
    )


def _run_capacity(bf: int, kcap: int, run_cap: int | None = None) -> int:
    """Static capacity of the (face, tile-row) run table.

    ``run_cap``: measured row count + margin (recommended_run_capacity);
    None picks the shape heuristic. The run gather and both per-run delta
    scatters are row-priced at this capacity, so a measured size saves
    real milliseconds (the heuristic is 400k vs 346k true rows at the
    100k-tri bench scene)."""
    if run_cap is None:
        cap = max(1024, min(max(4 * bf, kcap // 4), _MAX_BF - 128))
    else:
        cap = max(1024, min(int(run_cap), _MAX_BF - 128))
    return ((cap + 127) // 128) * 128


def _emit_exact(pre: dict, grid_x: int, grid_y: int, kcap: int,
                sort_by: str, tile_px: int,
                run_cap: int | None = None) -> BinnedKeys:
    """Exact-coverage emission: one slot per (face, tile) pair whose
    conservative corner test passes (vs the bbox rect, which over-emits
    ~1.6x at the 100k-tri bench -- thin/diagonal triangles touch far fewer
    tiles than their bbox). Images are identical by construction: the test
    only culls tiles where no pixel sample can pass in_tri (see
    _row_tile_interval); every culled pair would have contributed zero
    coverage in the kernels.

    Emission decomposes into per-(face, tile-row) RUNS: a triangle is
    convex, so the passing tiles of one row form a contiguous interval and
    a run's tile ids are consecutive. The run table (capacity
    _run_capacity) is built by the same boundary-scatter + cummax fills as
    the slots.

    Per-slot keys come from TELESCOPED RUN DELTAS instead of packed
    forward fills: within a run, slot tile keys are consecutive, so
    tile_key(slot) = KRUN(run) + slot with the per-run constant
    KRUN = b*n_tiles + rty*grid_x + rlo - excl_run. Scatter-ADDING the
    per-run differences of KRUN (and of the owning depth-sorted face id
    q) at each run's first slot, then cumsumming over slots, reconstructs
    both per-slot values with TWO run-scale scatters total: a dead run
    (zero covered tiles) has the same excl as the next real run, so
    colliding deltas telescope to exactly the real difference (integer
    adds -- order-independent and exact). This replaces the two packed
    uint32 fills + the face-scale fill of the previous design (3
    scatters -> 2, and no 10-bit rect packing on this path). Order stays
    (depth-sorted face, row, tx), so per-tile sequences keep the
    reference's stable-sort parity and the overflow drop policy stays
    farthest-first.
    """
    tiles = pre["tiles"]  # [B, F] bbox counts (mask only)
    B, F = tiles.shape
    n_tiles = grid_x * grid_y

    cnt_face = exact_tile_counts(pre, grid_x, grid_y, tile_px)  # [B, F]

    # --- per-view face pre-sort by depth (F-scale; shared helper) ---
    sigma_v, sigma = _depth_presort(pre, cnt_face, sort_by)

    # pack the 14 per-face columns BEFORE permuting (stacking is
    # elementwise; row ops are per-ROW-priced regardless of width, so 14
    # separate F-scale take_along_axis gathers would cost 14x this ONE
    # row-gather -- the round-3 fused-gather lesson, ~12 ms at the bench
    # scene)
    f32 = lambda x: x.astype(jnp.float32)
    base = jnp.stack(
        [f32(a) for a in pre["edge_a"]]
        + [f32(b) for b in pre["edge_b"]]
        + [f32(c) for c in pre["edge_c"]]
        + [f32(pre["rect_min"][..., 0]),
           f32(pre["rect_max"][..., 0] - pre["rect_min"][..., 0]),
           f32(pre["rect_min"][..., 1]),
           f32(pre["rect_max"][..., 1] - pre["rect_min"][..., 1]),
           f32(_edge_wrap_risk(pre, grid_x, grid_y, tile_px)),
           f32(cnt_face)],
        axis=-1,
    ).reshape(B * F, 15)  # A(3) B(3) C(3) rx nx ry ny risk cnt
    rows_s = base[sigma]  # ONE row-gather into depth-sorted order
    ftab = rows_s[:, :14]
    if (B * F) % 128 == 0 and B * F >= 128:
        rs = _relayout(rows_s, 15)
        col = lambda c: rs[:, c, :].reshape(B * F)
    else:
        col = lambda c: rows_s[:, c]
    cnt_s = col(14).astype(jnp.int32)

    # --- run (face, rect-row) table ---
    ny_eff = jnp.where(cnt_s > 0, col(12).astype(jnp.int32), 0)
    row_incl = jnp.cumsum(ny_eff)
    row_excl = (row_incl - ny_eff).astype(jnp.int32)
    rtotal = row_incl[-1].astype(jnp.int32)
    nr_cap = _run_capacity(B * F, kcap, run_cap)
    row_overflow = rtotal > nr_cap

    q = jnp.arange(B * F, dtype=jnp.int32)
    qmark = jnp.where(ny_eff > 0, row_excl, nr_cap)
    runq = _fill_from_boundaries(qmark, q, nr_cap)

    # each face's first-run row index rides as a 15th gathered column
    # (row ops are per-ROW-priced: one more column is free, and it
    # replaces a second run-scale forward fill); < 2^21 rows, f32-exact
    ftab15 = jnp.concatenate(
        [ftab, row_excl.astype(jnp.float32)[:, None]], axis=1)
    fc = _gather_cols(ftab15, runq, 15)
    ridx = jnp.arange(nr_cap, dtype=jnp.int32) - fc[14].astype(jnp.int32)
    tyf = fc[11] + ridx.astype(jnp.float32)
    lo_f, cnt_f = _row_tile_interval(
        fc[0:3], fc[3:6], fc[6:9], fc[9], fc[10], tyf, tile_px, grid_x)
    # wrap-risk faces (col 13) skip the interval cull: full bbox row
    # (their int32 edge functions wrap; see _edge_wrap_risk)
    lo_f = jnp.where(fc[13] > 0.0, fc[9], lo_f)
    cnt_f = jnp.where(fc[13] > 0.0, fc[10], cnt_f)
    run_ok = ((jnp.arange(nr_cap, dtype=jnp.int32)
               < jnp.minimum(rtotal, nr_cap))
              & (ridx.astype(jnp.float32) < fc[12]))
    rcnt = jnp.where(run_ok, cnt_f, 0.0).astype(jnp.int32)
    rlo = jnp.clip(lo_f, 0.0, grid_x - 1.0).astype(jnp.int32)
    rty = jnp.clip(tyf, 0.0, grid_y - 1.0).astype(jnp.int32)

    incl = jnp.cumsum(rcnt)
    excl = (incl - rcnt).astype(jnp.int32)
    total = incl[-1].astype(jnp.int32) if rcnt.size else jnp.int32(0)

    # --- per-slot keys from telescoped run deltas (see docstring) ---
    krun = (runq // F) * n_tiles + rty * grid_x + rlo - excl
    d_k = jnp.diff(krun, prepend=jnp.int32(0))
    d_q = jnp.diff(runq, prepend=jnp.int32(0))
    dk = jnp.zeros((kcap,), jnp.int32).at[excl].add(d_k, mode="drop")
    dq = jnp.zeros((kcap,), jnp.int32).at[excl].add(d_q, mode="drop")

    slots = jnp.arange(kcap, dtype=jnp.int32)
    in_range = slots < total
    bf = jnp.cumsum(dq)  # depth-sorted owning face per slot
    big = jnp.int32(B * n_tiles)
    tile_key = jnp.where(in_range, jnp.cumsum(dk) + slots, big)

    return _sort_and_ranges(tile_key, bf, sigma, B, F, n_tiles, total,
                            (total > kcap) | row_overflow)


def default_key_capacity(B: int, F: int, avg_tiles_per_face: int = 16) -> int:
    """Static key capacity heuristic, rounded to a 128 multiple."""
    kcap = max(1024, B * F * avg_tiles_per_face)
    return ((kcap + 127) // 128) * 128


def recommended_key_capacity(verts, faces, mv_t, proj_t, height, width,
                             *, tile_px: int | None = None,
                             margin: float = 1.25,
                             exact: bool = True,
                             bucket: int = 65_536) -> int:
    """Measure the true (face, tile) pair count of a scene and return a
    right-sized static key capacity.

    Runs the F-scale emission count pass (cheap [B, F] math; no slot-scale
    work) on the given geometry/cameras, applies ``margin`` headroom, and
    rounds UP to a multiple of ``bucket`` so nearby camera configurations
    share one jit compilation. Call this OUTSIDE jit with concrete arrays
    and pass the result as ``TriRenderSettings.key_capacity`` /
    ``TetRenderSettings.key_capacity`` (the tet first-hit bins by bbox
    rects: pass ``exact=False`` for it).

    This replaces hand-tuned capacities: the CUDA reference sizes its
    buffer exactly after a device-to-host readback
    (rasterizer_impl.cu:287-299); under jit the capacity must be static,
    so the honest equivalent is measure-once + margin, with overflow
    surfaced as data (``return_aux``) if the scene later outgrows it.
    """
    import math

    import jax.numpy as jnp

    from ..utils.config import BIN_TILE
    from .geometry import preprocess_faces, project_verts

    if tile_px is None:
        # must match the render paths' rect granularity or the "exact"
        # count diverges from the emission total
        tile_px = BIN_TILE
    verts = jnp.asarray(verts, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)
    mv_t = jnp.asarray(mv_t, jnp.float32)
    proj_t = jnp.asarray(proj_t, jnp.float32)
    gx = (width + tile_px - 1) // tile_px
    gy = (height + tile_px - 1) // tile_px
    ndc, img = project_verts(verts, mv_t, proj_t, width, height)
    pre = preprocess_faces(ndc, img, faces, width, height, tile_px, tile_px)
    if exact and "edge_a" in pre:
        total = int(jnp.sum(exact_tile_counts(pre, gx, gy, tile_px)))
    else:
        total = int(jnp.sum(jnp.where(pre["valid"], pre["tiles"], 0)))
    need = max(1024, int(math.ceil(total * margin)))
    return ((need + bucket - 1) // bucket) * bucket


def recommended_run_capacity(verts, faces, mv_t, proj_t, height, width,
                             *, tile_px: int | None = None,
                             margin: float = 1.25,
                             bucket: int = 8192) -> int:
    """Measure the exact emission's (face, tile-row) RUN count for a scene
    and return a right-sized static run-table capacity (the ``run_cap`` of
    ``emit_and_sort`` / ``TriRenderSettings.run_capacity``).

    The run gather and both per-run delta scatters are row-priced at this
    capacity; the shape heuristic (max(4*B*F, kcap/4)) leaves ~15% slack
    at the 100k-tri bench scene and far more on multi-view runs. Same
    contract as recommended_key_capacity: measure OUTSIDE jit with
    concrete arrays; a scene outgrowing the capacity raises the overflow
    flag (row_overflow folds into ``BinnedKeys.overflow``)."""
    import math

    import jax.numpy as jnp

    from ..utils.config import BIN_TILE
    from .geometry import preprocess_faces, project_verts

    if tile_px is None:
        tile_px = BIN_TILE
    verts = jnp.asarray(verts, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)
    mv_t = jnp.asarray(mv_t, jnp.float32)
    proj_t = jnp.asarray(proj_t, jnp.float32)
    gx = (width + tile_px - 1) // tile_px
    gy = (height + tile_px - 1) // tile_px
    ndc, img = project_verts(verts, mv_t, proj_t, width, height)
    pre = preprocess_faces(ndc, img, faces, width, height, tile_px, tile_px)
    cnt = exact_tile_counts(pre, gx, gy, tile_px)
    ny = jnp.where(
        cnt > 0, pre["rect_max"][..., 1] - pre["rect_min"][..., 1], 0)
    rows = int(jnp.sum(ny))
    need = max(1024, int(math.ceil(rows * margin)))
    return ((need + bucket - 1) // bucket) * bucket


def overflow_warning(overflow: Array, total: Array, kcap: int,
                     context: str) -> None:
    """Runtime key-capacity overflow warning (non-silent geometry drops;
    the CUDA reference sizes its buffer exactly, rasterizer_impl.cu:287-299,
    and can never drop).

    Emitted through jax.debug.print on backends that support host callbacks.
    The axon remote runtime does not (probed: UNIMPLEMENTED host send/recv;
    it reports platform "tpu" and is only identifiable by its
    platform_version string) -- there the warning is skipped and callers
    must observe the flag as data (render_tri(..., return_aux=True) or
    utils.diagnostics.tri_render_stats)."""
    try:
        version = getattr(jax.devices()[0].client, "platform_version", "")
    except Exception:
        version = ""
    if "axon" in version.lower():
        return

    def warn(t):
        jax.debug.print(
            "dmesh_renderer_tpu WARNING (" + context + "): tile-binning key "
            "capacity overflow ({t} (face, tile) pairs emitted > capacity "
            + str(kcap) + "). The FARTHEST faces of the highest view drop "
            "their tiles first. Raise the key capacity.",
            t=t)

    lax.cond(overflow, warn, lambda t: None, total)


class AlignedKeys(NamedTuple):
    """Key table re-laid-out so every tile's slot range starts on a slab
    boundary (needed by the Pallas kernels: DMA windows are slab-aligned and
    never shared between tiles, which makes the backward kernel's slab
    write-back race-free by construction).

    ``flat`` holds SORTED-space (depth-ordered) face indices; pair it with
    attr tables built in sorted order and un-permute F-scale results through
    ``sigma``. It is the pipeline's only slot-sized scatter."""
    flat: Array       # [cap] int32 sorted-space view*F+face per slot (0 pad)
    sigma: Array      # [B*F] int32 original id per sorted index
    starts: Array     # [B * n_tiles] int32 (each a multiple of slab)
    ends: Array       # [B * n_tiles] int32
    total: Array      # [] int32 real pairs emitted (pre-padding)
    overflow: Array   # [] bool


def aligned_capacity(kcap: int, n_tiles_total: int, slab: int) -> int:
    """Static capacity of the slab-aligned table."""
    cap = kcap + slab * n_tiles_total
    return ((cap + slab - 1) // slab) * slab


def align_to_slabs(keys: BinnedKeys, n_tiles_total: int, slab: int,
                   cap: int) -> AlignedKeys:
    """Scatter the sorted key table into slab-aligned per-tile ranges."""
    counts = keys.ends - keys.starts  # [NT]
    padded = ((counts + slab - 1) // slab) * slab
    new_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)[:-1].astype(jnp.int32)]
    )
    new_ends = new_starts + counts

    kcap = keys.sorted_id.shape[0]
    slot = jnp.arange(kcap, dtype=jnp.int32)
    in_range = slot < keys.total

    # per-slot alignment shift, gather-free: shift[t] = new_starts[t] -
    # starts[t] is a cumsum of non-negative per-tile paddings, hence
    # non-decreasing in t; slots are tile-sorted, so a boundary scatter at
    # each tile's first slot + cummax forward-fills it
    shift = new_starts - keys.starts  # [NT], non-decreasing
    shift_slot = _fill_from_boundaries(
        jnp.where(counts > 0, keys.starts, kcap), shift, kcap)

    pos = jnp.where(in_range, slot + shift_slot, cap)

    flat = jnp.zeros((cap,), jnp.int32).at[pos].set(
        keys.sorted_id, mode="drop", unique_indices=True)

    return AlignedKeys(
        flat=flat,
        sigma=keys.sigma,
        starts=new_starts, ends=new_ends,
        total=keys.total, overflow=keys.overflow,
    )
