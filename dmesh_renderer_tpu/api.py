"""Public API: drop-in parity with the reference ``dmesh_renderer`` package.

Mirrors dmesh_renderer/__init__.py of the reference: the same six public
symbols (`TriRenderSettings`, `render_tri`, `TriRenderer`,
`TetRenderSettings`, `render_tet`, `TetRenderer`), the same call signatures,
dtype coercions and matrix transposition at the module boundary
(__init__.py:219-220, :471-483), and the same output shapes
([B,3,H,W] color, [B,1,H,W] depth, [B,H,W] bool active).

Inputs may be JAX arrays, NumPy arrays, or torch tensors (converted via
NumPy); outputs are JAX arrays. The autograd-Function plumbing of the
reference (_RenderTri/_RenderTet, __init__.py:45-170, :277-424) is replaced
by ``jax.custom_vjp`` inside the ops modules -- `render_tri`/`render_tet` are
ordinary traceable, differentiable JAX functions, so they compose with `jit`,
`grad`, `vmap` and `shard_map`.
"""

from __future__ import annotations

from typing import NamedTuple, Any

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _as_jax(x: Any, dtype=None) -> Array:
    """Convert torch / numpy / python inputs to a JAX array."""
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().cpu().numpy()
    arr = jnp.asarray(x)
    if dtype is not None and arr.dtype != dtype:
        arr = arr.astype(dtype)
    return arr


# =============================================================================
# Tri renderer
# =============================================================================

class TriRenderSettings(NamedTuple):
    """Reference: dmesh_renderer/__init__.py:13-16.

    ``key_capacity`` and ``run_capacity`` are TPU-specific extensions
    (defaulted, so reference call sites work unchanged): the static
    (face, tile) key budget and the exact emission's (face, tile-row)
    run-table budget of the binned path; None picks shape-derived
    heuristics. Size them with ops/binning.recommended_key_capacity /
    recommended_run_capacity for measured scenes.
    """
    image_height: int
    image_width: int
    bg: Any  # [3] background color
    key_capacity: Any = None
    run_capacity: Any = None


def render_tri(
    verts: Array,
    faces: Array,
    verts_color: Array,
    faces_opacity: Array,
    mv_mats: Array,
    proj_mats: Array,
    verts_depth: Array,
    faces_intense: Array,
    render_settings: TriRenderSettings,
    return_aux: bool = False,
):
    """Functional tri renderer (reference: dmesh_renderer/__init__.py:18-43).

    Expects matrices already transposed (as `_RenderTri` receives them from
    `TriRenderer`). Returns (color [B,3,H,W], depth [B,1,H,W]); depth range
    [-1, 1] semantics follow the reference (vert depths are user-provided).

    ``return_aux=True`` (TPU extension; defaulted, so reference call sites
    work unchanged) additionally returns ``(overflow, num_rendered)``: the
    binned path's static-key-capacity overflow flag and emitted pair count.
    The CUDA reference sizes its binning buffer exactly
    (rasterizer_impl.cu:287-299) and can never drop geometry; the static
    capacity here can, so the flag must be observable under jit.
    """
    from .ops.tri import render_tri_auto
    from .validation import check_tri_inputs
    from .torch_interop import is_torch_tensor

    if any(is_torch_tensor(x) for x in (
            verts, verts_color, faces_opacity, verts_depth, faces_intense)):
        # Torch tensors among the differentiable inputs: route through the
        # torch.autograd.Function bridge so `loss.backward()` works exactly
        # as with the reference package (__init__.py:45-170) -- torch in,
        # torch out, gradients via the stored JAX VJP.
        from .torch_interop import render_tri_torch

        return render_tri_torch(
            verts, faces, verts_color, faces_opacity, mv_mats, proj_mats,
            verts_depth, faces_intense, render_settings, return_aux)

    mv_t = _as_jax(mv_mats, jnp.float32)
    proj_t = _as_jax(proj_mats, jnp.float32)
    inv_mv_t = jnp.linalg.inv(mv_t)
    inv_proj_t = jnp.linalg.inv(proj_t)

    args = (
        _as_jax(verts, jnp.float32),
        _as_jax(faces, jnp.int32),
        _as_jax(verts_color, jnp.float32),
        _as_jax(faces_opacity, jnp.float32),
        mv_t,
        proj_t,
        _as_jax(verts_depth, jnp.float32),
        _as_jax(faces_intense, jnp.float32),
        _as_jax(render_settings.bg, jnp.float32),
    )
    check_tri_inputs(*args)
    kcap = getattr(render_settings, "key_capacity", None)
    rcap = getattr(render_settings, "run_capacity", None)
    return render_tri_auto(
        args[0], args[1], args[2], args[3], mv_t, proj_t,
        inv_mv_t, inv_proj_t, args[6], args[7], args[8],
        int(render_settings.image_height),
        int(render_settings.image_width),
        kcap=None if kcap is None else int(kcap),
        with_aux=return_aux,
        run_cap=None if rcap is None else int(rcap),
    )


class TriRenderer:
    """Module-style wrapper (reference: dmesh_renderer/__init__.py:172-225).

    Casts ``faces`` to int32 and transposes the modelview/projection matrices
    exactly like the reference (__init__.py:216-220), so user code written
    against the reference drops in unchanged.
    """

    def __init__(self, render_settings: TriRenderSettings):
        self.render_settings = render_settings

    def __call__(self, verts, faces, verts_color, faces_opacity,
                 mv_mats, proj_mats, verts_depth, faces_intense):
        mv = _as_jax(mv_mats, jnp.float32)
        proj = _as_jax(proj_mats, jnp.float32)
        return render_tri(
            verts,
            _as_jax(faces, jnp.int32),
            verts_color,
            faces_opacity,
            jnp.swapaxes(mv, 1, 2),
            jnp.swapaxes(proj, 1, 2),
            verts_depth,
            faces_intense,
            self.render_settings,
        )

    # torch.nn.Module-style alias
    forward = __call__


# =============================================================================
# Tet renderer
# =============================================================================

class TetRenderSettings(NamedTuple):
    """Reference: dmesh_renderer/__init__.py:237-241.

    ``key_capacity`` is a TPU-specific extension (defaulted, so reference
    call sites work unchanged): the static (face, tile) key budget of the
    binned first-hit search; None picks a shape-derived heuristic.
    """
    image_height: int
    image_width: int
    bg: Any
    ray_random_seed: int = 0
    key_capacity: Any = None


def render_tet(
    verts: Array,
    faces: Array,
    verts_color: Array,
    faces_opacity: Array,
    mv_mats: Array,
    proj_mats: Array,
    verts_depth: Array,
    faces_intense: Array,
    tets: Array,
    face_tets: Array,
    tet_faces: Array,
    render_settings: TetRenderSettings,
    return_aux: bool = False,
):
    """Functional tet renderer (reference: dmesh_renderer/__init__.py:243-275).

    Returns (color [B,3,H,W], depth [B,1,H,W], active [B,H,W] bool).
    ``verts_depth`` is accepted for API parity but unused
    (__init__.py:448-450).

    ``return_aux=True`` (TPU extension; defaulted, so reference call sites
    work unchanged) additionally returns ``(overflow, num_rendered)``: the
    binned first-hit search's static-key-capacity overflow flag and emitted
    pair count. The CUDA reference sizes its binning buffer exactly
    (rasterizer_impl.cu:287-299) and can never drop geometry; the static
    capacity here can -- and a dropped first hit silently yields a wrong
    image AND a wrong active mask -- so the flag must be observable under
    jit (mirrors ``render_tri``'s contract).
    """
    from .ops.tet import render_tet_core
    from .validation import check_tet_inputs
    from .torch_interop import is_torch_tensor

    if (any(is_torch_tensor(x) for x in (verts_color, faces_opacity))
            and faces.shape[0] > 0 and tets.shape[0] > 0
            and verts.shape[0] > 0):
        # Torch tensors among the differentiable inputs (reference gradient
        # surface: verts_color + faces_opacity, __init__.py:402-424): route
        # through the torch.autograd.Function bridge. Empty geometry stays
        # on the JAX fill path below (constant output, nothing to
        # differentiate).
        from .torch_interop import render_tet_torch

        return render_tet_torch(
            verts, faces, verts_color, faces_opacity, mv_mats, proj_mats,
            verts_depth, faces_intense, tets, face_tets, tet_faces,
            render_settings, return_aux)

    mv_t = _as_jax(mv_mats, jnp.float32)
    proj_t = _as_jax(proj_mats, jnp.float32)
    inv_mv_t = jnp.linalg.inv(mv_t)
    inv_proj_t = jnp.linalg.inv(proj_t)

    a = dict(
        verts=_as_jax(verts, jnp.float32),
        faces=_as_jax(faces, jnp.int32),
        verts_color=_as_jax(verts_color, jnp.float32),
        faces_opacity=_as_jax(faces_opacity, jnp.float32),
        faces_intense=_as_jax(faces_intense, jnp.float32),
        tets=_as_jax(tets, jnp.int32),
        face_tets=_as_jax(face_tets, jnp.int32),
        tet_faces=_as_jax(tet_faces, jnp.int32),
        bg=_as_jax(render_settings.bg, jnp.float32),
    )
    check_tet_inputs(
        a["verts"], a["faces"], a["verts_color"], a["faces_opacity"],
        mv_t, proj_t, a["faces_intense"], a["tets"], a["face_tets"],
        a["tet_faces"], a["bg"],
    )
    if (a["verts"].shape[0] == 0 or a["faces"].shape[0] == 0
            or a["tets"].shape[0] == 0):
        # Empty-geometry parity: the reference calls Renderer::forward
        # unconditionally (render.cu:303-334); with no geometry every pixel
        # finds no first hit (first_face == -1), the march never runs, and
        # the inactive fill applies: color = bg, depth = 1, active = false
        # (cuda_renderer/forward.cu:533-558, :806-814). The JAX pipeline's
        # static tables cannot be zero-sized, so the fill happens here.
        B = mv_t.shape[0]
        H = int(render_settings.image_height)
        W = int(render_settings.image_width)
        color = jnp.broadcast_to(
            a["bg"].reshape(1, 3, 1, 1), (B, 3, H, W)).astype(jnp.float32)
        depth = jnp.ones((B, 1, H, W), jnp.float32)
        active = jnp.zeros((B, H, W), bool)
        if return_aux:
            return color, depth, active, (jnp.asarray(False),
                                          jnp.asarray(0, jnp.int32))
        return color, depth, active

    kcap = getattr(render_settings, "key_capacity", None)
    return render_tet_core(
        a["verts"], a["faces"], a["verts_color"], a["faces_opacity"],
        mv_t, proj_t, inv_mv_t, inv_proj_t, a["faces_intense"],
        a["tets"], a["face_tets"], a["tet_faces"], a["bg"],
        int(render_settings.image_height),
        int(render_settings.image_width),
        int(render_settings.ray_random_seed),
        kcap=None if kcap is None else int(kcap),
        with_aux=return_aux,
    )


class TetRenderer:
    """Module-style wrapper (reference: dmesh_renderer/__init__.py:426-487)."""

    def __init__(self, render_settings: TetRenderSettings):
        self.render_settings = render_settings

    def __call__(self, verts, faces, verts_color, faces_opacity,
                 mv_mats, proj_mats, verts_depth, faces_intense,
                 tets, face_tets, tet_faces):
        mv = _as_jax(mv_mats, jnp.float32)
        proj = _as_jax(proj_mats, jnp.float32)
        # verts_color / faces_opacity pass through unconverted: they are the
        # reference's gradient surface (__init__.py:402-424), and torch
        # tensors must reach the autograd bridge intact.
        return render_tet(
            _as_jax(verts, jnp.float32),
            _as_jax(faces, jnp.int32),
            verts_color,
            faces_opacity,
            jnp.swapaxes(mv, 1, 2),
            jnp.swapaxes(proj, 1, 2),
            _as_jax(verts_depth, jnp.float32),
            _as_jax(faces_intense, jnp.float32),
            _as_jax(tets, jnp.int32),
            _as_jax(face_tets, jnp.int32),
            _as_jax(tet_faces, jnp.int32),
            self.render_settings,
        )

    forward = __call__
