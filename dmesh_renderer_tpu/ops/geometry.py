"""Geometry primitives (pure JAX, fully vectorized).

TPU-native re-implementation of the device math layer of the reference CUDA
implementation. Each function cites the reference semantics it reproduces
(paths relative to /root/reference):

  - transforms / NDC / pixel mapping .... cuda_rasterizer/auxiliary.h:33-110
  - clamp_w ............................. cuda_rasterizer/auxiliary.h:245-253
  - fixed-point coverage test ........... cuda_rasterizer/auxiliary.h:179-243
  - Moller-Trumbore intersection ........ cuda_rasterizer/auxiliary.h:255-286
                                          cuda_renderer/auxiliary.h:270-295 (strict)
  - barycentric clamping ................ cuda_rasterizer/auxiliary.h:335-400
  - tet outward face normal ............. cuda_renderer/auxiliary.h:345-395

Matrix convention: the public API (like the reference Python layer,
dmesh_renderer/__init__.py:219-220) passes modelview/projection matrices
*transposed*, i.e. ``m_t = M.T`` where ``M`` is the usual row-major matrix
with ``p_clip = M @ [p, 1]``. All functions below take the transposed form and
compute ``[p, 1] @ m_t`` which equals ``M @ [p, 1]``.

Gradients: functions here are written so that plain JAX autodiff reproduces
the reference's hand-written analytic gradients (e.g. the quotient-rule
expansion in cuda_rasterizer/auxiliary.h:288-333 and the piecewise clamp
gradients in auxiliary.h:374-400). Non-differentiable decisions (coverage,
culling, sort keys) are integer/boolean valued and therefore naturally carry
no gradient.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.config import SUBPIXEL, W_EPS

Array = jax.Array


# =============================================================================
# Transforms / projection
# =============================================================================

def transform_point44(p: Array, m_t: Array) -> Array:
    """Homogeneous transform of 3D points by a (transposed) 4x4 matrix.

    p: [..., 3], m_t: [..., 4, 4] (transposed convention). Returns [..., 4].
    Reference: transformPoint4x4, cuda_rasterizer/auxiliary.h:81-90.
    """
    return (
        p[..., 0:1] * m_t[..., 0, :]
        + p[..., 1:2] * m_t[..., 1, :]
        + p[..., 2:3] * m_t[..., 2, :]
        + m_t[..., 3, :]
    )


def transform_point43(p: Array, m_t: Array) -> Array:
    """Affine transform (drops the homogeneous w row of the result).

    Reference: transformPoint4x3, cuda_rasterizer/auxiliary.h:71-79.
    """
    return transform_point44(p, m_t)[..., :3]


def ndc2pix(v: Array, size) -> Array:
    """NDC coordinate -> continuous pixel coordinate.

    Reference: cuda_rasterizer/auxiliary.h:33-36. The reference's double
    literals promote the expression to f64 with ONE final rounding; JAX
    without x64 computes it in f32 (three roundings), so results can
    differ by 1 ulp when a coordinate lands exactly on a 1/SUBPIXEL
    boundary -- the same measure-zero degeneracy class as the regular-grid
    caveat in ops/tet.py (f64 emulation on TPU would cost far more than
    the parity is worth).
    """
    return ((v + 1.0) * size - 1.0) * 0.5


def pix2ndc(v: Array, size) -> Array:
    """Continuous pixel coordinate -> NDC.

    Reference: cuda_rasterizer/auxiliary.h:38-41.
    """
    return ((v * 2.0 + 1.0) / size) - 1.0


def clamp_w(w: Array, eps: float = W_EPS) -> Array:
    """Guard the perspective-divide denominator away from zero.

    Reference: cuda_rasterizer/auxiliary.h:245-253.
    """
    return jnp.where(
        (w >= 0) & (w < eps),
        jnp.asarray(eps, w.dtype),
        jnp.where((w < 0) & (w > -eps), jnp.asarray(-eps, w.dtype), w),
    )


def project_verts(verts: Array, mv_t: Array, proj_t: Array, width: int, height: int):
    """Project vertices through all views at once.

    verts: [P, 3]; mv_t, proj_t: [B, 4, 4] (transposed convention).
    Returns (verts_ndc [B, P, 3], verts_image [B, P, 2]).

    Reference: preprocessPointCUDA, cuda_rasterizer/forward.cu:17-47.
    """
    v = verts[None, :, :]  # [1, P, 3]
    p_view = transform_point43(v, mv_t[:, None, :, :])  # [B, P, 3]
    p_proj = transform_point44(p_view, proj_t[:, None, :, :])  # [B, P, 4]
    inv_w = 1.0 / clamp_w(p_proj[..., 3])
    ndc = p_proj[..., :3] * inv_w[..., None]
    image = jnp.stack(
        [ndc2pix(ndc[..., 0], width), ndc2pix(ndc[..., 1], height)], axis=-1
    )
    return ndc, image


# =============================================================================
# Fixed-point coverage test (must be integer-exact for edge-pixel parity)
# =============================================================================

def in_tri(p: Array, p1: Array, p2: Array, p3: Array) -> Array:
    """Point-in-triangle test in 16x16-subpixel fixed point, top-left fill rule.

    All inputs are float 2D points with matching leading shape [..., 2];
    returns a bool array [...]. Winding is normalized to CCW by swapping
    p2/p3 when the signed area is negative; degenerate (zero-area) triangles
    cover nothing.

    Reference: in_tri, cuda_rasterizer/auxiliary.h:179-243 (including the C
    truncation-toward-zero float->int conversion).
    """
    def fx(a):
        # C-style (int) cast truncates toward zero; XLA f32->s32 convert does too.
        return (a * SUBPIXEL).astype(jnp.int32)

    px, py = fx(p[..., 0]), fx(p[..., 1])
    x1, y1 = fx(p1[..., 0]), fx(p1[..., 1])
    x2, y2 = fx(p2[..., 0]), fx(p2[..., 1])
    x3, y3 = fx(p3[..., 0]), fx(p3[..., 1])

    area = (x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1)
    nondegenerate = area != 0

    # Swap vertices 2 and 3 when winding is clockwise.
    neg = area < 0
    x2s = jnp.where(neg, x3, x2)
    y2s = jnp.where(neg, y3, y2)
    x3s = jnp.where(neg, x2, x3)
    y3s = jnp.where(neg, y2, y3)

    cx1, cy1 = x1 - x2s, y1 - y2s
    cx2, cy2 = x2s - x3s, y2s - y3s
    cx3, cy3 = x3s - x1, y3s - y1

    s1 = cx1 * (py - y1) - cy1 * (px - x1)
    s2 = cx2 * (py - y2s) - cy2 * (px - x2s)
    s3 = cx3 * (py - y3s) - cy3 * (px - x3s)

    # Top-left fill rule: edges that are "left or up" exclude exact hits.
    s1 = s1 - ((cy1 > 0) | ((cy1 == 0) & (cx1 > 0))).astype(jnp.int32)
    s2 = s2 - ((cy2 > 0) | ((cy2 == 0) & (cx2 > 0))).astype(jnp.int32)
    s3 = s3 - ((cy3 > 0) | ((cy3 == 0) & (cx3 > 0))).astype(jnp.int32)

    return (s1 < 0) & (s2 < 0) & (s3 < 0) & nondegenerate


# =============================================================================
# Ray-triangle intersection (Moller-Trumbore)
# =============================================================================

def ray_tri_intersection(ray_o: Array, ray_d: Array, p0: Array, p1: Array, p2: Array):
    """Moller-Trumbore ray/triangle intersection, batched.

    Inputs broadcast over leading dims, each [..., 3]. Returns
    ``(tuv [..., 3], nondegenerate [...])`` where ``nondegenerate`` is False
    only for rays parallel to the triangle plane (denominator == 0). This is
    the *permissive* variant used by the tri renderer: any non-parallel ray
    "hits" and out-of-triangle (u, v) are handled downstream by
    ``clamp_bary_uv``.

    Reference: cuda_rasterizer/auxiliary.h:255-286. Autodiff through this
    function reproduces ray_tri_intersection_grad (auxiliary.h:288-333): the
    reference's ``max(denom, 1e-7)`` clamp there is applied *after* the
    reciprocal is taken, so it has no effect and the true quotient rule is
    what the reference computes.
    """
    t_vec = ray_o - p0
    e1 = p1 - p0
    e2 = p2 - p0
    pv = jnp.cross(ray_d, e2)
    qv = jnp.cross(t_vec, e1)
    denom = jnp.sum(pv * e1, axis=-1)
    nondegenerate = denom != 0.0
    safe = jnp.where(nondegenerate, denom, jnp.ones_like(denom))
    inv = 1.0 / safe
    t = jnp.sum(qv * e2, axis=-1) * inv
    u = jnp.sum(pv * t_vec, axis=-1) * inv
    v = jnp.sum(qv * ray_d, axis=-1) * inv
    return jnp.stack([t, u, v], axis=-1), nondegenerate


def ray_tri_uv_grads_reference(ray_o, ray_d, p0, p1, p2):
    """The reference's analytic (u, v) gradients w.r.t. vertex positions.

    Returns (du_dp0, du_dp1, du_dp2, dv_dp0, dv_dp1, dv_dp2), each [..., 3].

    IMPORTANT PARITY QUIRK: the reference's "dv" formulas
    (ray_tri_intersection_grad, cuda_rasterizer/auxiliary.h:288-333) are
    actually the quotient-rule gradient of the *ray parameter t*, not of the
    barycentric v: its ``v2 = dot(cross(T, E1), E2)`` is the numerator of t
    (t = det[T,E1,E2]/denom), while the forward's v uses
    ``dot(cross(T, E1), ray_d)``. The CUDA backward chains dL/dv through
    these dt/dp formulas (backward.cu:371-382). We reproduce that behavior
    exactly so that gradients match the reference within tolerance; see
    tests/test_geometry.py::test_ray_tri_grad_matches_reference_formula.

    Also note the reference's ``max(denom, 1e-7)`` is applied *after* the
    reciprocal is computed, so it has no effect; we guard only against
    exactly-zero denominators (those lanes are masked out by callers).
    """
    t_vec = ray_o - p0
    e1 = p1 - p0
    e2 = p2 - p0

    rd_x_e2 = jnp.cross(ray_d, e2)
    denom_sqrt = jnp.sum(rd_x_e2 * e1, axis=-1)  # == MT denominator
    denom = denom_sqrt * denom_sqrt
    denom = jnp.where(denom == 0.0, jnp.ones_like(denom), denom)
    inv = (1.0 / denom)[..., None]

    v0 = jnp.sum(rd_x_e2 * t_vec, axis=-1)[..., None]  # u numerator
    v1 = denom_sqrt[..., None]
    v2 = jnp.sum(jnp.cross(t_vec, e1) * e2, axis=-1)[..., None]  # t numerator

    t_x_rd = jnp.cross(t_vec, ray_d)
    e1_x_rd = jnp.cross(e1, ray_d)

    du_de1 = -rd_x_e2 * v0 * inv
    du_de2 = (t_x_rd * v1 - v0 * e1_x_rd) * inv
    du_dt = rd_x_e2 * v1 * inv

    dv_de1 = (jnp.cross(e2, t_vec) * v1 - v2 * rd_x_e2) * inv
    dv_de2 = (jnp.cross(t_vec, e1) * v1 - v2 * e1_x_rd) * inv
    dv_dt = jnp.cross(e1, e2) * v1 * inv

    du_dp0 = -du_de1 - du_de2 - du_dt
    dv_dp0 = -dv_de1 - dv_de2 - dv_dt
    return du_dp0, du_de1, du_de2, dv_dp0, dv_de1, dv_de2


def strict_hit(tuv: Array, nondegenerate: Array) -> Array:
    """Strict in-triangle, in-front validity used by the tet renderer.

    Reference: cuda_renderer/auxiliary.h:292-295.
    """
    t, u, v = tuv[..., 0], tuv[..., 1], tuv[..., 2]
    return nondegenerate & (t >= 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)


# =============================================================================
# Barycentric clamping (7 region codes)
# =============================================================================

def clamp_bary_uv(u: Array, v: Array):
    """Project (u, v) into the barycentric triangle {u>=0, v>=0, u+v<=1}.

    Returns (u_c, v_c, code) with the same 7 region codes as the reference.
    The branches are evaluated in the reference's order; autodiff through the
    selected branch reproduces clamp_bary_uv_grad exactly
    (code 0: identity; 1-3: zero; 4/5: one axis; 6: the +/-0.5 mixing).

    Reference: cuda_rasterizer/auxiliary.h:335-400.
    """
    c0 = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    c1 = (u <= 0.0) & (v <= 0.0)
    c2 = ((u >= 1.0) & (v <= 0.0)) | ((v >= 0.0) & (v <= u - 1.0))
    c3 = ((u <= 0.0) & (v >= 1.0)) | ((u >= 0.0) & (v >= u + 1.0))
    c4 = (u <= 0.0) & (v <= 1.0) & (v >= 0.0)
    c5 = (u <= 1.0) & (u >= 0.0) & (v <= 0.0)

    zero = jnp.zeros_like(u)
    one = jnp.ones_like(u)
    u6 = (1.0 + u - v) * 0.5
    v6 = (1.0 - u + v) * 0.5

    # Nested selection in reference branch order (first matching wins).
    u_c = jnp.where(
        c0, u,
        jnp.where(c1, zero,
                  jnp.where(c2, one,
                            jnp.where(c3, zero,
                                      jnp.where(c4, zero,
                                                jnp.where(c5, u, u6))))),
    )
    v_c = jnp.where(
        c0, v,
        jnp.where(c1, zero,
                  jnp.where(c2, zero,
                            jnp.where(c3, one,
                                      jnp.where(c4, v,
                                                jnp.where(c5, zero, v6))))),
    )
    code = jnp.where(
        c0, 0,
        jnp.where(c1, 1,
                  jnp.where(c2, 2,
                            jnp.where(c3, 3,
                                      jnp.where(c4, 4,
                                                jnp.where(c5, 5, 6))))),
    ).astype(jnp.int32)
    return u_c, v_c, code


def clamp_bary_uv_grad(code: Array):
    """Jacobian of (u_c, v_c) w.r.t. (u, v) by clamp region code.

    Returns (duc_du, duc_dv, dvc_du, dvc_dv), same shape as code.
    Reference: clamp_bary_uv_grad, cuda_rasterizer/auxiliary.h:374-400.
    """
    code = code.astype(jnp.int32)
    is0 = code == 0
    is4 = code == 4
    is5 = code == 5
    is6 = code == 6
    f = lambda b: b.astype(jnp.float32)
    duc_du = f(is0) + f(is5) + 0.5 * f(is6)
    dvc_dv = f(is0) + f(is4) + 0.5 * f(is6)
    duc_dv = -0.5 * f(is6)
    dvc_du = -0.5 * f(is6)
    return duc_du, duc_dv, dvc_du, dvc_dv


# =============================================================================
# Tet outward face normal
# =============================================================================

def face_outward_normal(p0: Array, p1: Array, p2: Array, tet_center: Array) -> Array:
    """Unit normal of triangle (p0, p1, p2) oriented away from ``tet_center``.

    Reference: tet_face_outward_normal, cuda_renderer/auxiliary.h:345-395
    (norm clamped at 1e-4; flipped when it points toward the tet centroid).
    """
    n = jnp.cross(p1 - p0, p2 - p0)
    norm = jnp.maximum(jnp.sqrt(jnp.sum(n * n, axis=-1)), 1e-4)
    n = n / norm[..., None]
    flip = jnp.sum(n * (tet_center - p0), axis=-1) > 0.0
    return jnp.where(flip[..., None], -n, n)


# =============================================================================
# Face preprocessing (cull + depth keys + tile bbox)
# =============================================================================

def face_edge_coeffs(verts_image: Array, faces: Array, fimg=None):
    """Fixed-point coverage edge coefficients per (view, face).

    Returns (A, B, C, nondeg): A/B/C are length-3 tuples of [B, F] int32
    arrays such that a pixel sample p (in 16x-subpixel coords, see
    in_tri/auxiliary.h:179-243) is covered iff A_e*px + B_e*py + C_e < 0
    for all three edges (the top-left-rule bias is folded into C, and the
    winding is normalized CCW exactly as in_tri does). Shared by the
    binned renderer's attribute tables and the exact tile-coverage
    emission test so both use identical arithmetic.

    ``fimg``: optional pre-gathered [B, F, 3, 2] per-face image coords --
    face-scale row gathers cost ~12 ns/row, so callers that already hold
    them (preprocess_faces) pass them in instead of re-gathering."""
    im = verts_image[:, faces, :] if fimg is None else fimg  # [B, F, 3, 2]
    xi = (im[..., 0] * SUBPIXEL).astype(jnp.int32)  # C-truncation to zero
    yi = (im[..., 1] * SUBPIXEL).astype(jnp.int32)
    x1, x2, x3 = xi[..., 0], xi[..., 1], xi[..., 2]
    y1, y2, y3 = yi[..., 0], yi[..., 1], yi[..., 2]

    area = (x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1)
    neg = area < 0
    x2s = jnp.where(neg, x3, x2)
    y2s = jnp.where(neg, y3, y2)
    x3s = jnp.where(neg, x2, x3)
    y3s = jnp.where(neg, y2, y3)

    def edge(xa, ya, xb, yb):
        cx = xa - xb
        cy = ya - yb
        bias = ((cy > 0) | ((cy == 0) & (cx > 0))).astype(jnp.int32)
        return -cy, cx, cy * xa - cx * ya - bias

    A1, B1, C1 = edge(x1, y1, x2s, y2s)
    A2, B2, C2 = edge(x2s, y2s, x3s, y3s)
    A3, B3, C3 = edge(x3s, y3s, x1, y1)
    return (A1, A2, A3), (B1, B2, B3), (C1, C2, C3), area != 0


def preprocess_faces(
    verts_ndc: Array,
    verts_image: Array,
    faces: Array,
    width: int,
    height: int,
    tile_x: int,
    tile_y: int,
):
    """Per-(view, face) culling, depth keys, and tile-space bounding boxes.

    verts_ndc: [B, P, 3]; verts_image: [B, P, 2]; faces: [F, 3] int32.
    Returns a dict with:
      depth      [B, F]  mean NDC z remapped [-1,1] -> [0,1], clamped
      min_depth  [B, F]  per-face min vertex depth (same remap) -- tet sort key
      max_depth  [B, F]  per-face max vertex depth (same remap)
      rect_min   [B, F, 2] / rect_max [B, F, 2]  int32 tile ranges [min, max)
      tiles      [B, F]  number of touched tiles (0 if culled)
      valid      [B, F]  bool, face survives culling

    Reference: preprocessFaceCUDA, cuda_rasterizer/forward.cu:76-149 and
    cuda_renderer/forward.cu:178-260; getRectFromTri,
    cuda_rasterizer/auxiliary.h:55-69.
    """
    grid_x = (width + tile_x - 1) // tile_x
    grid_y = (height + tile_y - 1) // tile_y

    # ONE packed per-vertex gather (z, img x, img y): face-scale row
    # gathers are issue-bound (~12 ns/row regardless of width), so fusing
    # the two separate fz/fimg gathers halves this stage's dominant cost
    F = faces.shape[0]
    B = verts_ndc.shape[0]
    pv = jnp.concatenate([verts_ndc[..., 2:3], verts_image], axis=-1)
    g = pv[:, faces.reshape(-1), :].reshape(B, F, 3, 3)
    fz = g[..., 0]  # [B, F, 3]
    fimg = g[..., 1:3]  # [B, F, 3, 2]

    max_z = jnp.max(fz, axis=-1)
    min_z = jnp.min(fz, axis=-1)
    mean_z = jnp.mean(fz, axis=-1)

    def remap01(z):
        return jnp.clip((z + 1.0) * 0.5, 0.0, 1.0)

    depth = remap01(mean_z)
    min_depth = remap01(min_z)
    max_depth = remap01(max_z)

    # Tile bbox (C float->int truncation toward zero, then clamp to grid).
    xs = fimg[..., 0]
    ys = fimg[..., 1]
    rect_min_x = jnp.clip((jnp.min(xs, axis=-1) / tile_x).astype(jnp.int32), 0, grid_x)
    rect_min_y = jnp.clip((jnp.min(ys, axis=-1) / tile_y).astype(jnp.int32), 0, grid_y)
    rect_max_x = jnp.clip(
        (jnp.max(xs, axis=-1) / tile_x).astype(jnp.int32) + 1, 0, grid_x
    )
    rect_max_y = jnp.clip(
        (jnp.max(ys, axis=-1) / tile_y).astype(jnp.int32) + 1, 0, grid_y
    )

    nx = rect_max_x - rect_min_x
    ny = rect_max_y - rect_min_y
    tiles = nx * ny
    z_ok = ~((max_z < -1.0) | (min_z > 1.0))
    valid = z_ok & (tiles > 0)
    tiles = jnp.where(valid, tiles, 0)

    eA, eB, eC, nondeg = face_edge_coeffs(verts_image, faces, fimg=fimg)

    return {
        "depth": depth,
        "min_depth": min_depth,
        "max_depth": max_depth,
        "rect_min": jnp.stack([rect_min_x, rect_min_y], axis=-1),
        "rect_max": jnp.stack([rect_max_x, rect_max_y], axis=-1),
        "tiles": tiles,
        "valid": valid,
        # coverage edge coefficients (+ degeneracy flag) for the exact
        # tile-interval emission (binning._emit_exact)
        "edge_a": eA,
        "edge_b": eB,
        "edge_c": eC,
        "nondeg": nondeg,
    }
