"""Tri renderer dispatch: oracle (small scenes) vs. binned/Pallas (scaled).

``render_tri_auto`` picks an execution strategy by face count. Both paths
share identical semantics (see tri_oracle docstring); the binned path is the
TPU acceleration structure (static-capacity key sort + tiled Pallas
compositing) mirroring rasterizer_impl.cu:175-383.
"""

from __future__ import annotations


from .tri_oracle import render_tri_oracle

# Face count above which the tile-binned path is used. The oracle is O(F)
# per pixel; the binned path only pays for faces whose bbox touches a tile.
BINNED_THRESHOLD = 4096


def render_tri_auto(verts, faces, verts_color, faces_opacity, mv_t, proj_t,
                    inv_mv_t, inv_proj_t, verts_depth, faces_intense, bg,
                    height, width, *, force: str | None = None,
                    kcap: int | None = None):
    """Render triangles; strategy is chosen statically from shapes.

    force: "oracle" or "binned" to override the heuristic (for tests).
    kcap: static key capacity for the binned path (None = heuristic).
    """
    n_faces = faces.shape[0]
    strategy = force or ("binned" if n_faces > BINNED_THRESHOLD else "oracle")

    if strategy == "binned":
        from .tri_binned import render_tri_binned

        return render_tri_binned(
            verts, faces, verts_color, faces_opacity, mv_t, proj_t,
            inv_mv_t, inv_proj_t, verts_depth, faces_intense, bg,
            height, width, kcap,
        )

    return render_tri_oracle(
        verts, faces, verts_color, faces_opacity, mv_t, proj_t,
        inv_mv_t, inv_proj_t, verts_depth, faces_intense, bg, height, width,
    )
