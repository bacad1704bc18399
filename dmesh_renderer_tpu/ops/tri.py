"""Tri renderer dispatch: oracle (small scenes) vs. binned/Pallas (scaled).

``render_tri_auto`` picks an execution strategy by face count. Both paths
share identical semantics (see tri_oracle docstring); the binned path is the
TPU acceleration structure (static-capacity key sort + tiled Pallas
compositing) mirroring rasterizer_impl.cu:175-383.
"""

from __future__ import annotations


import jax

from .tri_oracle import render_tri_oracle

# Face counts above which the tile-binned path is used. On TPU the binned
# path wins early (config 1, 1k faces @ 256px: 32 ms vs 60 ms fwd+bwd); on
# CPU the Pallas kernels run interpreted, so the dense path stays preferable
# far longer.
BINNED_THRESHOLD_TPU = 256
BINNED_THRESHOLD_CPU = 4096


def render_tri_auto(verts, faces, verts_color, faces_opacity, mv_t, proj_t,
                    inv_mv_t, inv_proj_t, verts_depth, faces_intense, bg,
                    height, width, *, force: str | None = None,
                    kcap: int | None = None, with_aux: bool = False,
                    run_cap: int | None = None):
    """Render triangles; strategy is chosen statically from shapes.

    force: "oracle" or "binned" to override the heuristic (for tests).
    kcap: static key capacity for the binned path (None = heuristic).
    run_cap: static run-table capacity of the binned path's exact
        emission (None = heuristic; see binning.recommended_run_capacity).
    with_aux: also return ``(overflow bool[], num_rendered int32[])`` --
        the key-capacity overflow flag and emitted (face, tile) pair count
        of the binned path (the oracle path has no capacity: aux is
        ``(False, -1)``).
    """
    if force not in (None, "oracle", "binned"):
        raise ValueError(
            f"force must be None, 'oracle' or 'binned', got {force!r}")
    import jax.numpy as jnp

    n_faces = faces.shape[0]
    if verts.shape[0] == 0:
        # Reference parity: with P == 0 the forward pipeline is never
        # launched and the preallocated zero outputs are returned as-is
        # (render.cu:87-88, :104-105) -- NOT background-filled.
        B = mv_t.shape[0]
        color = jnp.zeros((B, 3, height, width), jnp.float32)
        depth = jnp.zeros((B, 1, height, width), jnp.float32)
        if with_aux:
            return color, depth, (jnp.asarray(False),
                                  jnp.asarray(0, jnp.int32))
        return color, depth
    if n_faces == 0:
        # P > 0, F == 0: the reference pipeline runs end-to-end with empty
        # tile ranges, so every pixel blends nothing -> bg + depth = 1*T
        # (render.cu:105-130; forward.cu:478-488). The binned path needs
        # F >= 1 for its static capacities, so F = 0 always routes to the
        # oracle (which reduces over zero faces), even under force="binned".
        force = "oracle"
    threshold = (BINNED_THRESHOLD_CPU if jax.default_backend() == "cpu"
                 else BINNED_THRESHOLD_TPU)
    strategy = force or ("binned" if n_faces > threshold else "oracle")

    if strategy == "binned":
        from .tri_binned import render_tri_binned

        return render_tri_binned(
            verts, faces, verts_color, faces_opacity, mv_t, proj_t,
            inv_mv_t, inv_proj_t, verts_depth, faces_intense, bg,
            height, width, kcap, with_aux, run_cap,
        )

    out = render_tri_oracle(
        verts, faces, verts_color, faces_opacity, mv_t, proj_t,
        inv_mv_t, inv_proj_t, verts_depth, faces_intense, bg, height, width,
    )
    if with_aux:
        import jax.numpy as jnp

        color, depth = out
        return color, depth, (jnp.asarray(False), jnp.asarray(-1, jnp.int32))
    return out
