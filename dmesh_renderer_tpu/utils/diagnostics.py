"""Observability: render statistics, health counters, stage timing, tracing.

The reference has no metrics/tracing subsystem (SURVEY.md section 5) -- its
only signals are error banners and the tet renderer's ``active`` mask. Here
we expose the TPU-native equivalents:

  * ``tri_render_stats``: num_rendered (emitted keys), key-capacity overflow,
    per-tile list sizes -- the data the CUDA side only knew via its D2H
    ``num_rendered`` readback (rasterizer_impl.cu:287-292).
  * ``tet_health``: active-pixel fraction per view; walk failures degrade
    pixels to inactive (cuda_renderer/forward.cu:798-814), so a drop in this
    fraction is the tessellation-health signal DMesh relies on.
  * ``StageTimer``: host-side wall-clock stage timing (blocks on results).
  * ``trace``: context manager around jax.profiler for TPU traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any

import jax
import jax.numpy as jnp

from ..ops.binning import default_key_capacity, emit_and_sort
from ..ops.geometry import preprocess_faces, project_verts


def tri_render_stats(verts, faces, mv_t, proj_t, height, width,
                     tile: int | None = None,
                     kcap: int | None = None) -> dict:
    """Binning statistics for a tri scene (host-side, not jitted).

    Returns dict with num_rendered, overflow, per-tile count mean/max, and
    the culled-face fraction per view.
    """
    if tile is None:
        # default to the production kernel's tile so the stats match what
        # the render actually builds
        from ..ops.tri_binned import TILE as tile
    B = mv_t.shape[0]
    gx = (width + tile - 1) // tile
    gy = (height + tile - 1) // tile
    if kcap is None:
        kcap = default_key_capacity(B, faces.shape[0])

    ndc, img = project_verts(verts, mv_t, proj_t, width, height)
    pre = preprocess_faces(ndc, img, faces, width, height, tile, tile)
    # tile_px selects the same exact-coverage emission the production
    # binned renderer uses, so num_rendered/overflow here match what the
    # render actually builds (emit_and_sort falls back to bbox emission
    # under the same conditions the renderer does)
    keys = emit_and_sort(pre, gx, gy, kcap, tile_px=tile)
    counts = keys.ends - keys.starts
    return {
        "num_rendered": int(keys.total),
        "key_capacity": int(kcap),
        "overflow": bool(keys.overflow),
        "tiles": int(counts.shape[0]),
        "tile_count_mean": float(jnp.mean(counts.astype(jnp.float32))),
        "tile_count_max": int(jnp.max(counts)),
        "culled_fraction": float(1.0 - jnp.mean(
            pre["valid"].astype(jnp.float32))),
    }


def tet_health(active) -> dict:
    """Health counters from the tet renderer's active mask ([B, H, W] bool).

    active=False pixels are either background misses or walk-invariant
    failures (forward.cu:687-759); a falling active fraction on a scene that
    should be covered indicates a degenerate tessellation.
    """
    active = jnp.asarray(active)
    frac = jnp.mean(active.astype(jnp.float32), axis=(1, 2))
    return {
        "active_fraction_per_view": [float(x) for x in frac],
        "active_fraction": float(jnp.mean(frac)),
        "inactive_pixels": int(jnp.sum(~active)),
    }


class StageTimer:
    """Wall-clock stage timing: ``with timer.stage("binning"): ...``.

    Blocks on the stage's outputs, so only use for coarse profiling.
    """

    def __init__(self):
        self.times: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, result: Any = None):
        t0 = time.perf_counter()
        box = {}
        yield box
        out = box.get("out", result)
        if out is not None:
            jax.block_until_ready(out)
        self.times[name] = self.times.get(name, 0.0) + (
            time.perf_counter() - t0)

    def summary(self) -> str:
        total = sum(self.times.values())
        lines = [f"{k}: {v * 1000:.2f} ms" for k, v in self.times.items()]
        lines.append(f"total: {total * 1000:.2f} ms")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
