"""Oracle triangle renderer: pure JAX, O(F) per pixel, no tile binning.

This is the semantic ground truth for the scaled (binned / Pallas) tri
renderer and the minimum end-to-end slice of the framework. It reproduces the
reference pipeline exactly, minus the tile machinery, which does not change
the image: compositing order is the global (depth key, submission order)
sort, and per-pixel coverage decides membership -- the per-tile lists of the
reference are only an acceleration structure.

Forward semantics (reference: cuda_rasterizer/forward.cu:257-489):
  * faces culled when max NDC z < -1, min z > 1, or empty tile bbox
    (forward.cu:124-139)
  * per-face depth key = mean vertex NDC z remapped to [0,1], clamped
    (forward.cu:121, :146-148)
  * faces sorted by (depth key, submission index) -- the stable radix sort of
    rasterizer_impl.cu:319-324
  * per pixel, front-to-back: fixed-point coverage test, permissive
    Moller-Trumbore, barycentric clamp, interpolate color x intensity and
    vertex depth, blend C += c*a*T; T *= (1-a), early exit at T < 1e-4
  * out_color = C + T*bg, out_depth = D + T*1 (forward.cu:478-488)

Backward (reference: cuda_rasterizer/backward.cu:9-421): reverse traversal,
transmittance reconstructed by division from final_prev_T, suffix
accumulators for dL/dalpha, background term with the alpha==1 special case,
gradients routed to verts (via Moller-Trumbore u,v and the clamp region
codes), vertex colors, face opacities, per-view vertex depths and per-view
face intensities. Unlike the CUDA atomicAdd scatter (backward.cu:389-418),
accumulation here is deterministic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..utils.config import T_EPS, TILE_X, TILE_Y
from .geometry import (
    clamp_bary_uv,
    clamp_bary_uv_grad,
    in_tri,
    preprocess_faces,
    project_verts,
    ray_tri_intersection,
    ray_tri_uv_grads_reference,
)
from .rays import generate_rays

Array = jax.Array


def _prepare(verts, faces, verts_color, faces_opacity, mv_t, proj_t,
             inv_mv_t, inv_proj_t, verts_depth, faces_intense, height, width):
    """Project, cull, sort, and gather per-step arrays for the face scan.

    Returns (xs, rays, pixc) where xs is a dict of arrays with leading axis F
    in per-view depth-sorted order.
    """
    B = mv_t.shape[0]

    ndc, img = project_verts(verts, mv_t, proj_t, width, height)
    ndc = lax.stop_gradient(ndc)
    img = lax.stop_gradient(img)
    pre = preprocess_faces(ndc, img, faces, width, height, TILE_X, TILE_Y)

    sort_key = jnp.where(pre["valid"], pre["depth"], jnp.inf)
    order = jnp.argsort(sort_key, axis=1, stable=True)  # [B, F]

    fv = faces[order]  # [B, F, 3] vertex ids, per-view sorted
    p = verts[fv]  # [B, F, 3, 3] (differentiable in verts)
    img_f = img[:, faces, :]  # [B, F, 3, 2]
    img_s = jnp.take_along_axis(img_f, order[..., None, None], axis=1)
    col = verts_color[fv]  # [B, F, 3, 3]
    dep_f = verts_depth[:, faces]  # [B, F, 3]
    dep = jnp.take_along_axis(dep_f, order[..., None], axis=1)
    alpha = faces_opacity[order]  # [B, F]
    inten = jnp.take_along_axis(faces_intense, order, axis=1)  # [B, F]
    valid = jnp.take_along_axis(pre["valid"], order, axis=1)  # [B, F]

    def to_steps(x):
        return jnp.swapaxes(x, 0, 1)  # [F, B, ...]

    xs = {
        "p": to_steps(p),
        "img": to_steps(img_s),
        "col": to_steps(col),
        "dep": to_steps(dep),
        "alpha": to_steps(alpha),
        "inten": to_steps(inten),
        "valid": to_steps(valid),
        "fid": to_steps(order),
        "fv": to_steps(fv),
    }

    ray_o, ray_d = generate_rays(inv_mv_t, inv_proj_t, width, height,
                                 norm_eps_mode="tri")
    ray_o = lax.stop_gradient(ray_o.reshape(B, height * width, 3))
    ray_d = lax.stop_gradient(ray_d.reshape(B, height * width, 3))

    ys = jnp.arange(height, dtype=jnp.float32)
    xsx = jnp.arange(width, dtype=jnp.float32)
    py, px = jnp.meshgrid(ys, xsx, indexing="ij")
    pixc = jnp.stack([px + 0.5, py + 0.5], axis=-1).reshape(height * width, 2)

    return xs, (ray_o, ray_d), pixc


def _face_pixel_terms(xs_step, rays, pixc):
    """Shared per-(face, pixel) quantities for one scan step."""
    ray_o, ray_d = rays
    p, im = xs_step["p"], xs_step["img"]
    cov = in_tri(pixc[None], im[:, None, 0], im[:, None, 1], im[:, None, 2])
    tuv, nondeg = ray_tri_intersection(
        ray_o, ray_d, p[:, None, 0], p[:, None, 1], p[:, None, 2]
    )
    u_c, v_c, code = clamp_bary_uv(tuv[..., 1], tuv[..., 2])
    i0 = 1.0 - u_c - v_c
    hit = cov & nondeg & xs_step["valid"][:, None]
    return hit, (i0, u_c, v_c), code


def _forward_scan(xs, rays, pixc, B, n_pix):
    """Front-to-back blending scan. Returns per-pixel blend results + state."""

    def step(carry, xs_step):
        T, pT, C, D, done, last_contrib, idx = carry
        hit, (i0, i1, i2), _code = _face_pixel_terms(xs_step, rays, pixc)
        active = hit & (~done)

        col3, dep3 = xs_step["col"], xs_step["dep"]
        icol = (
            i0[..., None] * col3[:, None, 0]
            + i1[..., None] * col3[:, None, 1]
            + i2[..., None] * col3[:, None, 2]
        ) * xs_step["inten"][:, None, None]
        idep = (
            i0 * dep3[:, None, 0] + i1 * dep3[:, None, 1] + i2 * dep3[:, None, 2]
        )

        a = xs_step["alpha"][:, None]
        w = jnp.where(active, a * T, 0.0)
        C = C + icol * w[..., None]
        D = D + idep * w
        pT = jnp.where(active, T, pT)
        T = jnp.where(active, T * (1.0 - a), T)
        last_contrib = jnp.where(active, idx + 1, last_contrib)
        done = done | (active & (T < T_EPS))
        return (T, pT, C, D, done, last_contrib, idx + 1), None

    init = (
        jnp.ones((B, n_pix), jnp.float32),
        jnp.ones((B, n_pix), jnp.float32),
        jnp.zeros((B, n_pix, 3), jnp.float32),
        jnp.zeros((B, n_pix), jnp.float32),
        jnp.zeros((B, n_pix), jnp.bool_),
        jnp.zeros((B, n_pix), jnp.int32),
        jnp.int32(0),
    )
    (T, pT, C, D, _done, last_contrib, _idx), _ = lax.scan(step, init, xs)
    return T, pT, C, D, last_contrib


def _render_impl(verts, faces, verts_color, faces_opacity, mv_t, proj_t,
                 inv_mv_t, inv_proj_t, verts_depth, faces_intense, bg,
                 height, width):
    B = mv_t.shape[0]
    n_pix = height * width
    xs, rays, pixc = _prepare(
        verts, faces, verts_color, faces_opacity, mv_t, proj_t,
        inv_mv_t, inv_proj_t, verts_depth, faces_intense, height, width,
    )
    T, pT, C, D, last_contrib = _forward_scan(xs, rays, pixc, B, n_pix)

    color = C + T[..., None] * bg[None, None, :]
    depth = D + T * 1.0
    color = color.reshape(B, height, width, 3).transpose(0, 3, 1, 2)
    depth = depth.reshape(B, 1, height, width)
    return color, depth, (T, pT, last_contrib)


# =============================================================================
# custom_vjp wrapper
# =============================================================================

@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def render_tri_oracle(verts, faces, verts_color, faces_opacity, mv_t, proj_t,
                      inv_mv_t, inv_proj_t, verts_depth, faces_intense, bg,
                      height, width):
    """Differentiable oracle tri renderer.

    Shapes (reference: dmesh_renderer/__init__.py:199-207):
      verts [P,3], faces [F,3] int32, verts_color [P,3], faces_opacity [F],
      mv_t/proj_t/inv_mv_t/inv_proj_t [B,4,4] (transposed convention),
      verts_depth [B,P], faces_intense [B,F], bg [3].
    Returns (color [B,3,H,W], depth [B,1,H,W]).
    """
    color, depth, _ = _render_impl(
        verts, faces, verts_color, faces_opacity, mv_t, proj_t,
        inv_mv_t, inv_proj_t, verts_depth, faces_intense, bg, height, width,
    )
    return color, depth


def _fwd(verts, faces, verts_color, faces_opacity, mv_t, proj_t,
         inv_mv_t, inv_proj_t, verts_depth, faces_intense, bg, height, width):
    color, depth, state = _render_impl(
        verts, faces, verts_color, faces_opacity, mv_t, proj_t,
        inv_mv_t, inv_proj_t, verts_depth, faces_intense, bg, height, width,
    )
    res = (verts, faces, verts_color, faces_opacity, mv_t, proj_t,
           inv_mv_t, inv_proj_t, verts_depth, faces_intense, bg, state)
    return (color, depth), res


def _bwd(height, width, res, cots):
    (verts, faces, verts_color, faces_opacity, mv_t, proj_t,
     inv_mv_t, inv_proj_t, verts_depth, faces_intense, bg, state) = res
    dL_dcolor, dL_ddepth = cots
    final_T, final_prev_T, last_contrib = state

    B = mv_t.shape[0]
    P = verts.shape[0]
    F = faces.shape[0]
    n_pix = height * width

    # Recompute the sorted per-step arrays (cheap; avoids O(F * pixels)
    # residual memory -- the analog of re-deriving CUDA state structs from the
    # saved opaque buffers, rasterizer_impl.cu:419-428).
    xs, rays, pixc = _prepare(
        verts, faces, verts_color, faces_opacity, mv_t, proj_t,
        inv_mv_t, inv_proj_t, verts_depth, faces_intense, height, width,
    )
    ray_o, ray_d = rays

    gcol = dL_dcolor.transpose(0, 2, 3, 1).reshape(B, n_pix, 3)
    gdep = dL_ddepth.reshape(B, n_pix)

    bg_dot = jnp.einsum("c,bpc->bp", bg, gcol)  # [B, n_pix]
    bd_dot = gdep

    n_steps = xs["alpha"].shape[0]

    def step(carry, step_in):
        (T, first, last_alpha, last_color, last_depth, accum_rec, accum_recd,
         g_verts, g_vcolor, g_fopacity, g_vdepth, g_fintense, s) = carry
        xs_step = step_in

        hit, (i0, i1, i2), code = _face_pixel_terms(xs_step, rays, pixc)
        # Forward position of this reverse step is s; it contributed iff
        # s < last_contrib (reference backward.cu:192-194).
        active = hit & (s < last_contrib)
        a = xs_step["alpha"][:, None]  # [B, 1] broadcast over pixels

        # Reconstruct transmittance before this face's blend
        # (backward.cu:244-252). Safe-divide: the (1-a)==0 case can only be
        # the first processed face, where no division happens.
        one_minus_a = jnp.maximum(1.0 - a, 1e-30)
        T = jnp.where(active & (~first), T / one_minus_a, T)
        first = first & (~active)

        col3, dep3 = xs_step["col"], xs_step["dep"]
        inten = xs_step["inten"][:, None]
        icol_raw = (
            i0[..., None] * col3[:, None, 0]
            + i1[..., None] * col3[:, None, 1]
            + i2[..., None] * col3[:, None, 2]
        )  # before intensity
        icol = icol_raw * inten[..., None]
        idep = i0 * dep3[:, None, 0] + i1 * dep3[:, None, 1] + i2 * dep3[:, None, 2]

        # Suffix accumulators (backward.cu:262-284).
        accum_rec_new = (
            last_alpha[..., None] * last_color
            + (1.0 - last_alpha[..., None]) * accum_rec
        )
        accum_recd_new = last_alpha * last_depth + (1.0 - last_alpha) * accum_recd

        dL_dicolor = gcol * (a * T)[..., None]  # [B, n_pix, 3]
        dL_didepth = gdep * a * T

        dL_dalpha = (
            jnp.sum((icol - accum_rec_new) * gcol, axis=-1)
            + (idep - accum_recd_new) * gdep
        ) * T

        # Background term (backward.cu:293-308).
        alpha_is_one = a == 1.0
        bg_coef = jnp.where(
            alpha_is_one, -final_prev_T, -final_T / one_minus_a
        )
        dL_dalpha = dL_dalpha + bg_coef * (bg_dot + bd_dot)

        # Mask and update running state.
        dL_dicolor = jnp.where(active[..., None], dL_dicolor, 0.0)
        dL_didepth = jnp.where(active, dL_didepth, 0.0)
        dL_dalpha = jnp.where(active, dL_dalpha, 0.0)

        accum_rec = jnp.where(active[..., None], accum_rec_new, accum_rec)
        accum_recd = jnp.where(active, accum_recd_new, accum_recd)
        last_color = jnp.where(active[..., None], icol, last_color)
        last_depth = jnp.where(active, idep, last_depth)
        last_alpha = jnp.where(active, a * jnp.ones_like(T), last_alpha)

        # Gradients w.r.t. interpolation weights (backward.cu:313-349).
        dL_di0 = (
            jnp.einsum("bpc,bc->bp", dL_dicolor, col3[:, 0]) * inten
            + dep3[:, None, 0] * dL_didepth
        )
        dL_di1 = (
            jnp.einsum("bpc,bc->bp", dL_dicolor, col3[:, 1]) * inten
            + dep3[:, None, 1] * dL_didepth
        )
        dL_di2 = (
            jnp.einsum("bpc,bc->bp", dL_dicolor, col3[:, 2]) * inten
            + dep3[:, None, 2] * dL_didepth
        )

        # d i / d (u_c, v_c): i0 = 1-u_c-v_c, i1 = u_c, i2 = v_c
        dL_duc = -dL_di0 + dL_di1
        dL_dvc = -dL_di0 + dL_di2

        # Chain through the clamp region codes (clamp_bary_uv_grad,
        # auxiliary.h:374-400) and the reference's explicit Moller-Trumbore
        # gradient formulas (auxiliary.h:288-333; see
        # ray_tri_uv_grads_reference for the dv==dt parity quirk).
        duc_du, duc_dv, dvc_du, dvc_dv = clamp_bary_uv_grad(code)
        dL_du = dL_duc * duc_du + dL_dvc * dvc_du
        dL_dv = dL_duc * duc_dv + dL_dvc * dvc_dv

        p = xs_step["p"]  # [B, 3, 3]
        du_dp0, du_dp1, du_dp2, dv_dp0, dv_dp1, dv_dp2 = (
            ray_tri_uv_grads_reference(
                ray_o, ray_d, p[:, None, 0], p[:, None, 1], p[:, None, 2]
            )
        )
        g_p0 = jnp.sum(
            dL_du[..., None] * du_dp0 + dL_dv[..., None] * dv_dp0, axis=1
        )
        g_p1 = jnp.sum(
            dL_du[..., None] * du_dp1 + dL_dv[..., None] * dv_dp1, axis=1
        )
        g_p2 = jnp.sum(
            dL_du[..., None] * du_dp2 + dL_dv[..., None] * dv_dp2, axis=1
        )
        g_p = jnp.stack([g_p0, g_p1, g_p2], axis=1)  # [B, 3, 3]

        # Per-vertex color gradients, reduced over pixels.
        g_c0 = jnp.sum(i0[..., None] * dL_dicolor, axis=1) * xs_step["inten"][:, None]
        g_c1 = jnp.sum(i1[..., None] * dL_dicolor, axis=1) * xs_step["inten"][:, None]
        g_c2 = jnp.sum(i2[..., None] * dL_dicolor, axis=1) * xs_step["inten"][:, None]

        g_d0 = jnp.sum(i0 * dL_didepth, axis=1)
        g_d1 = jnp.sum(i1 * dL_didepth, axis=1)
        g_d2 = jnp.sum(i2 * dL_didepth, axis=1)

        g_op = jnp.sum(dL_dalpha, axis=1)  # [B]
        g_in = jnp.sum(
            jnp.sum(icol_raw * dL_dicolor, axis=-1), axis=1
        )  # [B]

        fv = xs_step["fv"]  # [B, 3]
        fid = xs_step["fid"]  # [B]
        b_idx = jnp.arange(B)

        g_verts = g_verts.at[fv].add(g_p)
        g_vcolor = g_vcolor.at[fv].add(jnp.stack([g_c0, g_c1, g_c2], axis=1))
        g_fopacity = g_fopacity.at[fid].add(g_op)
        g_vdepth = g_vdepth.at[b_idx[:, None], fv].add(
            jnp.stack([g_d0, g_d1, g_d2], axis=1)
        )
        g_fintense = g_fintense.at[b_idx, fid].add(g_in)

        carry = (T, first, last_alpha, last_color, last_depth, accum_rec,
                 accum_recd, g_verts, g_vcolor, g_fopacity, g_vdepth,
                 g_fintense, s - 1)
        return carry, None

    init = (
        final_prev_T,
        jnp.ones((B, n_pix), jnp.bool_),
        jnp.zeros((B, n_pix), jnp.float32),
        jnp.zeros((B, n_pix, 3), jnp.float32),
        jnp.zeros((B, n_pix), jnp.float32),
        jnp.zeros((B, n_pix, 3), jnp.float32),
        jnp.zeros((B, n_pix), jnp.float32),
        jnp.zeros((P, 3), jnp.float32),
        jnp.zeros((P, 3), jnp.float32),
        jnp.zeros((F,), jnp.float32),
        jnp.zeros((B, P), jnp.float32),
        jnp.zeros((B, F), jnp.float32),
        jnp.int32(n_steps - 1),
    )

    carry, _ = lax.scan(step, init, xs, reverse=True)
    (_T, _first, _la, _lc, _ld, _ar, _ard,
     g_verts, g_vcolor, g_fopacity, g_vdepth, g_fintense, _s) = carry

    def zeros_like_int(x):
        return np.zeros(x.shape, jax.dtypes.float0)

    return (
        g_verts,
        zeros_like_int(faces),
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


render_tri_oracle.defvjp(_fwd, _bwd)
