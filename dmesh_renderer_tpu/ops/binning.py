"""Tile binning: static-capacity key emission, sort, and range identification.

XLA-native replacement for the reference's host-orchestrated pipeline
(rasterizer_impl.cu:175-338):

  CUB InclusiveSum over tiles_touched      -> jnp.cumsum
  D2H readback of num_rendered + realloc   -> static key capacity KCAP with an
                                              overflow indicator (no host sync
                                              under jit)
  duplicateWithKeys kernel                 -> vectorized slot->face inversion
                                              via boundary-scatter + cummax
                                              forward fills (each slot derives
                                              its owning face, instead of each
                                              face writing its slots)
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

Array = jax.Array

# The slot->rect forward fill packs (face-emission-rank << 10 | rect chunk)
# into int32 cummax lanes: the emission rank must fit in 21 bits.
_MAX_BF = 1 << 21


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


def _fill_from_boundaries(positions: Array, values: Array, kcap: int) -> Array:
    """Forward-fill: scatter ``values`` at ``positions`` (monotone
    non-decreasing values required) and cummax-fill the gaps."""
    marks = jnp.zeros((kcap,), jnp.int32).at[positions].max(
        values, mode="drop")
    return lax.cummax(marks)


def emit_and_sort(pre: dict, grid_x: int, grid_y: int, kcap: int,
                  sort_by: str = "depth") -> BinnedKeys:
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
    if B * F >= _MAX_BF:
        raise ValueError(
            f"B*F = {B * F} exceeds the 2^21 emission-rank budget of the "
            "packed forward fill; shard views or faces first")

    # --- per-view face pre-sort by depth (F-scale: ~100x cheaper than the
    # slot-scale sort it replaces as a depth key) ---
    depth = pre["min_depth" if sort_by == "min_depth" else "depth"]
    sort_key = jnp.where(tiles > 0, depth, jnp.float32(jnp.inf))
    iota_f = jnp.broadcast_to(jnp.arange(F, dtype=jnp.int32)[None], (B, F))
    _, sigma_v = lax.sort((sort_key, iota_f), dimension=1, num_keys=1,
                          is_stable=True)  # [B, F] per-view face order
    sigma = (sigma_v
             + jnp.arange(B, dtype=jnp.int32)[:, None] * F).reshape(-1)

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

    # single-key stable sort: within-tile depth order is inherited from the
    # emission order (faces pre-sorted by depth)
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
        overflow=total > kcap,
    )


def default_key_capacity(B: int, F: int, avg_tiles_per_face: int = 16) -> int:
    """Static key capacity heuristic, rounded to a 128 multiple."""
    kcap = max(1024, B * F * avg_tiles_per_face)
    return ((kcap + 127) // 128) * 128


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
                   cap: int, n_faces: int) -> AlignedKeys:
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
