"""Tile binning: static-capacity key emission, sort, and range identification.

XLA-native replacement for the reference's host-orchestrated pipeline
(rasterizer_impl.cu:175-338):

  CUB InclusiveSum over tiles_touched      -> jnp.cumsum
  D2H readback of num_rendered + realloc   -> static key capacity KCAP with an
                                              overflow indicator (no host sync
                                              under jit)
  duplicateWithKeys kernel                 -> vectorized slot->face inversion
                                              via searchsorted (each slot
                                              finds its owning face, instead
                                              of each face writing its slots)
  CUB radix sort on packed (tile|depth)    -> lax.sort on (tile_key, depth)
                                              with num_keys=2, stable
  identifyTileRanges kernel                -> searchsorted of tile ids over
                                              the sorted keys

Emission order parity: the reference emits keys per face in row-major order
over the face's tile rect (rasterizer_impl.cu:69-96) and radix sort is
stable, so equal (tile, depth) keys keep submission order; slots here are
numbered identically and lax.sort is stable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


class BinnedKeys(NamedTuple):
    """Sorted key table at static capacity KCAP."""
    face: Array       # [KCAP] int32 face id per sorted slot (0 for padding)
    batch: Array      # [KCAP] int32 view id per sorted slot
    tile_key: Array   # [KCAP] int32 batch*n_tiles + tile_id (BIG for padding)
    emit: Array       # [KCAP] int32 pre-sort (emission) slot index: slots of
                      # one (view, face) are contiguous in emission order,
                      # which lets gradients reduce per face without
                      # duplicate-index scatters (see tri_binned._b_bwd)
    offsets: Array    # [B*F + 1] int32 emission offsets per (view, face)
    starts: Array     # [B * n_tiles] int32 slot range start per tile
    ends: Array       # [B * n_tiles] int32 slot range end per tile
    total: Array      # [] int32 number of real (face, tile) pairs emitted
    overflow: Array   # [] bool, True if total > KCAP (keys were dropped)


def emit_and_sort(pre: dict, grid_x: int, grid_y: int, kcap: int,
                  sort_by: str = "depth") -> BinnedKeys:
    """Build the sorted (tile, depth) key table.

    pre: output of geometry.preprocess_faces (tiles, rect_min/max, depth,
    min_depth, valid -- all [B, F]).
    sort_by: "depth" (tri renderer) or "min_depth" (tet renderer,
    renderer_impl.cu:318-329).

    TPU notes: the slot -> owning-face inversion is a boundary scatter +
    cummax (searchsorted at key capacity costs ~20 bisection gathers); the
    per-slot face metadata (rect origin/width) travels as one bit-packed
    int gather.
    """
    tiles = pre["tiles"]  # [B, F]
    B, F = tiles.shape
    n_tiles = grid_x * grid_y

    flat = tiles.reshape(-1).astype(jnp.int32)  # [B*F]
    incl = jnp.cumsum(flat)
    excl = incl - flat
    total = incl[-1] if flat.size else jnp.int32(0)

    # slot -> face inversion: each emitting face marks its first slot with
    # its own index; cummax forward-fills ownership (ranges are contiguous
    # and the first emitting face starts at slot 0).
    q = jnp.arange(B * F, dtype=jnp.int32)
    emitting = flat > 0
    marks = jnp.zeros((kcap,), jnp.int32).at[
        jnp.where(emitting, excl, kcap)
    ].max(q, mode="drop")
    bf = lax.cummax(marks)

    slots = jnp.arange(kcap, dtype=jnp.int32)
    in_range = slots < total

    # rect origin (x, y) and width, bit-packed 10+10+10 (grid dims < 1024)
    packed = (
        pre["rect_min"][..., 0].astype(jnp.int32)
        | (pre["rect_min"][..., 1].astype(jnp.int32) << 10)
        | (jnp.maximum(
            pre["rect_max"][..., 0] - pre["rect_min"][..., 0], 1) << 20)
    ).reshape(-1)
    depth = pre["min_depth" if sort_by == "min_depth" else "depth"]

    # one [kcap, 2] row gather instead of two 1-D gathers (TPU gathers are
    # issue-overhead-bound); the depth travels as its i32 bit pattern and
    # is bitcast back (non-negative floats round-trip exactly)
    meta = jnp.stack(
        [packed, lax.bitcast_convert_type(depth.reshape(-1), jnp.int32)],
        axis=-1,
    )  # [B*F, 2]
    rows = meta[bf]
    pk = rows[..., 0]
    k = slots - excl[bf]
    dkey = jnp.where(
        in_range,
        lax.bitcast_convert_type(rows[..., 1], jnp.float32),
        jnp.float32(2.0),
    )

    rx = pk & 0x3FF
    ry = (pk >> 10) & 0x3FF
    nx = (pk >> 20) & 0x3FF
    tx = rx + k % nx
    ty = ry + k // nx
    tile_id = ty * grid_x + tx

    big = jnp.int32(B * n_tiles)
    b = bf // F
    tile_key = jnp.where(in_range, b * n_tiles + tile_id, big)

    tile_key_s, _d, bf_s, emit_s = lax.sort(
        (tile_key, dkey, bf, slots), num_keys=2, is_stable=True
    )

    tids = jnp.arange(B * n_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(tile_key_s, tids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(tile_key_s, tids, side="right").astype(jnp.int32)

    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.minimum(incl, kcap).astype(jnp.int32)]
    )
    return BinnedKeys(
        face=(bf_s % F).astype(jnp.int32),
        batch=(bf_s // F).astype(jnp.int32),
        tile_key=tile_key_s,
        emit=emit_s.astype(jnp.int32),
        offsets=offsets,
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
            + str(kcap) + "). Keys are dropped in emission order: the "
            "highest (view, face) indices lose their tiles. Raise the key "
            "capacity.",
            t=t)

    lax.cond(overflow, warn, lambda t: None, total)


class AlignedKeys(NamedTuple):
    """Key table re-laid-out so every tile's slot range starts on a slab
    boundary (needed by the Pallas kernels: DMA windows are slab-aligned and
    never shared between tiles, which makes the backward kernel's slab
    write-back race-free by construction).

    Deliberately minimal: ``flat`` is the only slot-sized array, built by the
    single large scatter this stage pays for. (The round-1 layout scattered
    five slot-sized arrays -- face, batch, live, tile, emit -- costing ~30 ms
    at 100k tris; everything the pipeline needs is derivable from ``flat`` +
    the per-tile ranges, and the gradient reduction no longer uses emission
    slots at all, see tri_binned._b_bwd.)"""
    flat: Array       # [cap] int32 view*F + face per slot (0 at padding)
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

    kcap = keys.face.shape[0]
    slot = jnp.arange(kcap, dtype=jnp.int32)
    tk = keys.tile_key
    real = tk < n_tiles_total
    tk_safe = jnp.minimum(tk, n_tiles_total - 1)
    # one [kcap] gather of the combined per-tile shift (not two)
    shift = new_starts - keys.starts  # [NT]
    pos = slot + shift[tk_safe]
    pos = jnp.where(real, pos, cap)  # drop padding slots

    flat = jnp.zeros((cap,), jnp.int32).at[pos].set(
        keys.batch * n_faces + keys.face, mode="drop", unique_indices=True)

    return AlignedKeys(
        flat=flat,
        starts=new_starts, ends=new_ends,
        total=keys.total, overflow=keys.overflow,
    )
