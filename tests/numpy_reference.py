"""Independent NumPy executable spec of the reference tri renderer.

Plain per-pixel / per-face loops transcribing the *semantics* of the CUDA
reference (cuda_rasterizer/forward.cu, backward.cu) for tiny scenes. This is
the ground truth that the vectorized JAX implementation is tested against,
standing in for recorded CUDA outputs (no GPU in this environment).

Everything here is float32 to track the reference numerics.
"""

from __future__ import annotations

import numpy as np

T_EPS = np.float32(1e-4)
W_EPS = np.float32(1e-4)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def xform44(p, m_t):
    ph = np.array([p[0], p[1], p[2], np.float32(1.0)], np.float32)
    return ph @ m_t


def clamp_w(w):
    if 0 <= w < W_EPS:
        return W_EPS
    if -W_EPS < w < 0:
        return -W_EPS
    return w


def ndc2pix(v, s):
    return ((v + 1.0) * s - 1.0) * 0.5


def pix2ndc(v, s):
    return ((v * 2.0 + 1.0) / s) - 1.0


def _fx_i32(v):
    """f32 pixel coord -> 16x fixed point, exactly as the production path:
    an f32 multiply by SUBPIXEL then XLA's f32->s32 ConvertElementType
    (truncate toward zero, SATURATE on overflow, NaN -> 0). Python's int()
    would not wrap but also not saturate; NumPy's astype differs again --
    mirror XLA explicitly so wrap-risk (near-plane) faces get bit-identical
    coverage."""
    x = float(np.float32(np.float32(v) * np.float32(16.0)))
    if x != x:  # NaN
        return 0
    return max(-(2 ** 31), min(2 ** 31 - 1, int(x)))


def _w32(v):
    """Wrap an exact integer to int32 two's complement (XLA int ops wrap)."""
    return ((v + 2 ** 31) & 0xFFFFFFFF) - 2 ** 31


def np_in_tri(p, p1, p2, p3):
    # int32 arithmetic with two's-complement wrap on every sub/mul, like
    # the int math in cuda_rasterizer/auxiliary.h:179-243 and the XLA i32
    # ops of ops/geometry.in_tri. Near-plane faces overflow these edge
    # functions; their (wrapped) coverage is part of the parity contract.
    px, py = _fx_i32(p[0]), _fx_i32(p[1])
    x1, y1 = _fx_i32(p1[0]), _fx_i32(p1[1])
    x2, y2 = _fx_i32(p2[0]), _fx_i32(p2[1])
    x3, y3 = _fx_i32(p3[0]), _fx_i32(p3[1])
    area = _w32(_w32(_w32(x2 - x1) * _w32(y3 - y1))
                - _w32(_w32(x3 - x1) * _w32(y2 - y1)))
    if area == 0:
        return False
    if area < 0:
        x2, y2, x3, y3 = x3, y3, x2, y2
    cx1, cy1 = _w32(x1 - x2), _w32(y1 - y2)
    cx2, cy2 = _w32(x2 - x3), _w32(y2 - y3)
    cx3, cy3 = _w32(x3 - x1), _w32(y3 - y1)
    s1 = _w32(_w32(cx1 * _w32(py - y1)) - _w32(cy1 * _w32(px - x1)))
    s2 = _w32(_w32(cx2 * _w32(py - y2)) - _w32(cy2 * _w32(px - x2)))
    s3 = _w32(_w32(cx3 * _w32(py - y3)) - _w32(cy3 * _w32(px - x3)))
    if cy1 > 0 or (cy1 == 0 and cx1 > 0):
        s1 = _w32(s1 - 1)
    if cy2 > 0 or (cy2 == 0 and cx2 > 0):
        s2 = _w32(s2 - 1)
    if cy3 > 0 or (cy3 == 0 and cx3 > 0):
        s3 = _w32(s3 - 1)
    return s1 < 0 and s2 < 0 and s3 < 0


def np_mt(ro, rd, p0, p1, p2):
    T = ro - p0
    e1 = p1 - p0
    e2 = p2 - p0
    pv = np.cross(rd, e2)
    qv = np.cross(T, e1)
    denom = np.dot(pv, e1)
    if denom == 0.0:
        return None
    inv = 1.0 / denom
    return np.dot(qv, e2) * inv, np.dot(pv, T) * inv, np.dot(qv, rd) * inv


def np_clamp(u, v):
    if u >= 0 and v >= 0 and u + v <= 1:
        return u, v, 0
    if u <= 0 and v <= 0:
        return 0.0, 0.0, 1
    if (u >= 1 and v <= 0) or (0 <= v <= u - 1):
        return 1.0, 0.0, 2
    if (u <= 0 and v >= 1) or (u >= 0 and v >= u + 1):
        return 0.0, 1.0, 3
    if u <= 0 and 0 <= v <= 1:
        return 0.0, v, 4
    if 0 <= u <= 1 and v <= 0:
        return u, 0.0, 5
    return (1 + u - v) * 0.5, (1 - u + v) * 0.5, 6


def np_clamp_grad(code):
    duc_du = duc_dv = dvc_du = dvc_dv = 0.0
    if code == 0:
        duc_du = dvc_dv = 1.0
    elif code == 4:
        dvc_dv = 1.0
    elif code == 5:
        duc_du = 1.0
    elif code == 6:
        duc_du = dvc_dv = 0.5
        duc_dv = dvc_du = -0.5
    return duc_du, duc_dv, dvc_du, dvc_dv


def np_mt_grads(ro, rd, p0, p1, p2):
    """The reference's analytic formulas, dv == dt quirk included."""
    T = ro - p0
    e1 = p1 - p0
    e2 = p2 - p0
    denom_sqrt = np.dot(np.cross(rd, e2), e1)
    inv = 1.0 / denom_sqrt**2
    v0 = np.dot(np.cross(rd, e2), T)
    v1 = denom_sqrt
    v2 = np.dot(np.cross(T, e1), e2)
    du_de1 = -np.cross(rd, e2) * v0 * inv
    du_de2 = (np.cross(T, rd) * v1 - v0 * np.cross(e1, rd)) * inv
    du_dt = np.cross(rd, e2) * v1 * inv
    dv_de1 = (np.cross(e2, T) * v1 - v2 * np.cross(rd, e2)) * inv
    dv_de2 = (np.cross(T, e1) * v1 - v2 * np.cross(e1, rd)) * inv
    dv_dt = np.cross(e1, e2) * v1 * inv
    return (
        -du_de1 - du_de2 - du_dt, du_de1, du_de2,
        -dv_de1 - dv_de2 - dv_dt, dv_de1, dv_de2,
    )


# ---------------------------------------------------------------------------
# shared preprocessing
# ---------------------------------------------------------------------------

def _project(verts, mv_t, proj_t, W, H):
    P = verts.shape[0]
    ndc = np.zeros((P, 3), np.float32)
    img = np.zeros((P, 2), np.float32)
    for i in range(P):
        pv = xform44(verts[i], mv_t)[:3]
        pp = xform44(pv, proj_t)
        w = 1.0 / clamp_w(pp[3])
        ndc[i] = pp[:3] * w
        img[i] = [ndc2pix(ndc[i][0], W), ndc2pix(ndc[i][1], H)]
    return ndc, img


def _sorted_faces(ndc, img, faces, W, H, tile=16):
    """Returns (order, valid, rect) replicating cull + stable depth sort.

    ``rect[f] = (min_x, min_y, max_x, max_y)`` is the face's tile bbox rect
    (getRectFromTri, cuda_rasterizer/auxiliary.h:55-69). It is SEMANTIC, not
    just an acceleration structure: duplicateWithKeys emits the face only
    into rect tiles (rasterizer_impl.cu:44-97), so a face is never tested
    against pixels outside its rect. For ordinary faces the rect is a
    superset of true coverage; for near-plane faces whose int32 edge
    functions wrap, the wrapped in_tri test can pass at far-away pixels the
    rect never reaches -- the renderer must not cover them. The rect is
    tile-quantized, so wrapped coverage at its edge is tile-size-dependent
    in the reference itself; pass tile=32 (config.BIN_TILE) to match this
    repo's paths, tile=16 for the CUDA grid.
    """
    F = faces.shape[0]
    gx = (W + tile - 1) // tile
    gy = (H + tile - 1) // tile
    keys = []
    valid = np.zeros(F, bool)
    depth = np.zeros(F, np.float32)
    rect = np.zeros((F, 4), np.int64)
    for f in range(F):
        zs = ndc[faces[f], 2]
        if zs.max() < -1.0 or zs.min() > 1.0:
            keys.append(np.inf)
            continue
        pts = img[faces[f]]
        rminx = min(gx, max(0, int(pts[:, 0].min() / tile)))
        rminy = min(gy, max(0, int(pts[:, 1].min() / tile)))
        rmaxx = min(gx, max(0, int(pts[:, 0].max() / tile) + 1))
        rmaxy = min(gy, max(0, int(pts[:, 1].max() / tile) + 1))
        rect[f] = (rminx, rminy, rmaxx, rmaxy)
        if (rmaxx - rminx) * (rmaxy - rminy) == 0:
            keys.append(np.inf)
            continue
        valid[f] = True
        d = np.float32(zs.mean())
        depth[f] = min(max((d + 1.0) * 0.5, 0.0), 1.0)
        keys.append(depth[f])
    order = np.argsort(np.asarray(keys), kind="stable")
    return order, valid, rect


def _rays(inv_mv_t, inv_proj_t, W, H):
    ro = inv_mv_t[3, :3].astype(np.float32)
    ray_o = np.broadcast_to(ro, (H, W, 3))
    ray_d = np.zeros((H, W, 3), np.float32)
    for y in range(H):
        for x in range(W):
            nx = pix2ndc(x + 0.5, W)
            ny = pix2ndc(y + 0.5, H)
            pv = xform44(np.array([nx, ny, -1.0], np.float32), inv_proj_t)[:3]
            pw = xform44(pv, inv_mv_t)[:3]
            d = pw - ro
            d = d / (np.sqrt(np.dot(d, d)) + 1e-7)
            ray_d[y, x] = d
    return ray_o, ray_d


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def render_tri_np(verts, faces, vcolor, fopacity, mv_t, proj_t, vdepth,
                  fintense, bg, H, W, tile=16):
    B = mv_t.shape[0]
    color = np.zeros((B, 3, H, W), np.float32)
    depth_out = np.zeros((B, 1, H, W), np.float32)
    aux = {
        "final_T": np.ones((B, H, W), np.float32),
        "prev_T": np.ones((B, H, W), np.float32),
        "n_contrib": np.zeros((B, H, W), np.int64),
        "order": [],
        "valid": [],
        "rect": [],
        "tile": tile,
    }

    for b in range(B):
        ndc, img = _project(verts, mv_t[b], proj_t[b], W, H)
        order, valid, rect = _sorted_faces(ndc, img, faces, W, H, tile=tile)
        aux["order"].append(order)
        aux["valid"].append(valid)
        aux["rect"].append(rect)
        inv_mv = np.linalg.inv(mv_t[b])
        inv_proj = np.linalg.inv(proj_t[b])
        ray_o, ray_d = _rays(inv_mv, inv_proj, W, H)

        for y in range(H):
            for x in range(W):
                T = np.float32(1.0)
                pT = np.float32(1.0)
                C = np.zeros(3, np.float32)
                D = np.float32(0.0)
                n_contrib = 0
                pix = np.array([x + 0.5, y + 0.5], np.float32)
                tx, ty = x // tile, y // tile
                for pos, f in enumerate(order):
                    if not valid[f]:
                        continue
                    # tile-rect membership: duplicateWithKeys only emits
                    # the face into rect tiles, so pixels of other tiles
                    # are never tested (semantic for int32-wrapping
                    # near-plane faces; a no-op for ordinary ones)
                    r = rect[f]
                    if not (r[0] <= tx < r[2] and r[1] <= ty < r[3]):
                        continue
                    vids = faces[f]
                    if not np_in_tri(pix, img[vids[0]], img[vids[1]],
                                     img[vids[2]]):
                        continue
                    mt = np_mt(ray_o[y, x], ray_d[y, x], verts[vids[0]],
                               verts[vids[1]], verts[vids[2]])
                    if mt is None:
                        continue
                    _, u, v = mt
                    uc, vc, _ = np_clamp(u, v)
                    i0, i1, i2 = 1 - uc - vc, uc, vc
                    col = (
                        i0 * vcolor[vids[0]] + i1 * vcolor[vids[1]]
                        + i2 * vcolor[vids[2]]
                    ) * fintense[b, f]
                    dep = (
                        i0 * vdepth[b, vids[0]] + i1 * vdepth[b, vids[1]]
                        + i2 * vdepth[b, vids[2]]
                    )
                    a = fopacity[f]
                    C += col * a * T
                    D += dep * a * T
                    pT = T
                    T = T * (1 - a)
                    n_contrib = pos + 1
                    if T < T_EPS:
                        break
                color[b, :, y, x] = C + T * bg
                depth_out[b, 0, y, x] = D + T
                aux["final_T"][b, y, x] = T
                aux["prev_T"][b, y, x] = pT
                aux["n_contrib"][b, y, x] = n_contrib
    return color, depth_out, aux


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def render_tri_np_backward(verts, faces, vcolor, fopacity, mv_t, proj_t,
                           vdepth, fintense, bg, H, W, dL_dcolor, dL_ddepth,
                           aux):
    B = mv_t.shape[0]
    P = verts.shape[0]
    F = faces.shape[0]
    g_verts = np.zeros((P, 3), np.float64)
    g_vcolor = np.zeros((P, 3), np.float64)
    g_fopacity = np.zeros(F, np.float64)
    g_vdepth = np.zeros((B, P), np.float64)
    g_fintense = np.zeros((B, F), np.float64)

    tile = aux.get("tile", 16)
    for b in range(B):
        ndc, img = _project(verts, mv_t[b], proj_t[b], W, H)
        order, valid = aux["order"][b], aux["valid"][b]
        rect = aux["rect"][b]
        inv_mv = np.linalg.inv(mv_t[b])
        inv_proj = np.linalg.inv(proj_t[b])
        ray_o, ray_d = _rays(inv_mv, inv_proj, W, H)

        for y in range(H):
            for x in range(W):
                last_contrib = aux["n_contrib"][b, y, x]
                if last_contrib == 0:
                    continue
                T_final = aux["final_T"][b, y, x]
                prev_T_final = aux["prev_T"][b, y, x]
                T = prev_T_final
                first = True
                gcol = dL_dcolor[b, :, y, x]
                gdep = dL_ddepth[b, 0, y, x]
                last_alpha = 0.0
                last_color = np.zeros(3)
                last_depth = 0.0
                accum_rec = np.zeros(3)
                accum_recd = 0.0
                pix = np.array([x + 0.5, y + 0.5], np.float32)
                bg_dot = float(np.dot(bg, gcol))
                bd_dot = float(gdep)

                tx, ty = x // tile, y // tile
                for pos in range(len(order) - 1, -1, -1):
                    if pos >= last_contrib:
                        continue
                    f = order[pos]
                    if not valid[f]:
                        continue
                    r = rect[f]  # tile-rect membership (see forward)
                    if not (r[0] <= tx < r[2] and r[1] <= ty < r[3]):
                        continue
                    vids = faces[f]
                    if not np_in_tri(pix, img[vids[0]], img[vids[1]],
                                     img[vids[2]]):
                        continue
                    mt = np_mt(ray_o[y, x], ray_d[y, x], verts[vids[0]],
                               verts[vids[1]], verts[vids[2]])
                    if mt is None:
                        continue
                    _, u, v = mt
                    uc, vc, code = np_clamp(u, v)
                    i0, i1, i2 = 1 - uc - vc, uc, vc
                    inten = fintense[b, f]
                    col = (
                        i0 * vcolor[vids[0]] + i1 * vcolor[vids[1]]
                        + i2 * vcolor[vids[2]]
                    ) * inten
                    dep = (
                        i0 * vdepth[b, vids[0]] + i1 * vdepth[b, vids[1]]
                        + i2 * vdepth[b, vids[2]]
                    )
                    a = fopacity[f]

                    if not first:
                        T = T / (1 - a)
                    first = False

                    dL_dicolor = gcol * a * T
                    dL_didepth = gdep * a * T
                    dL_dalpha = 0.0
                    for ch in range(3):
                        accum_rec[ch] = (
                            last_alpha * last_color[ch]
                            + (1 - last_alpha) * accum_rec[ch]
                        )
                        last_color[ch] = col[ch]
                        dL_dalpha += (col[ch] - accum_rec[ch]) * gcol[ch]
                    accum_recd = (
                        last_alpha * last_depth + (1 - last_alpha) * accum_recd
                    )
                    last_depth = dep
                    dL_dalpha += (dep - accum_recd) * gdep
                    dL_dalpha *= T
                    last_alpha = a

                    if a == 1.0:
                        dL_dalpha += (-prev_T_final) * (bg_dot + bd_dot)
                    else:
                        dL_dalpha += (-T_final / (1 - a)) * (bg_dot + bd_dot)

                    g_fopacity[f] += dL_dalpha

                    dL_di0 = float(np.dot(vcolor[vids[0]], dL_dicolor)) * inten
                    dL_di1 = float(np.dot(vcolor[vids[1]], dL_dicolor)) * inten
                    dL_di2 = float(np.dot(vcolor[vids[2]], dL_dicolor)) * inten
                    dL_di0 += vdepth[b, vids[0]] * dL_didepth
                    dL_di1 += vdepth[b, vids[1]] * dL_didepth
                    dL_di2 += vdepth[b, vids[2]] * dL_didepth

                    g_vcolor[vids[0]] += i0 * dL_dicolor * inten
                    g_vcolor[vids[1]] += i1 * dL_dicolor * inten
                    g_vcolor[vids[2]] += i2 * dL_dicolor * inten

                    g_vdepth[b, vids[0]] += i0 * dL_didepth
                    g_vdepth[b, vids[1]] += i1 * dL_didepth
                    g_vdepth[b, vids[2]] += i2 * dL_didepth

                    g_fintense[b, f] += float(
                        np.dot(
                            i0 * vcolor[vids[0]] + i1 * vcolor[vids[1]]
                            + i2 * vcolor[vids[2]],
                            dL_dicolor,
                        )
                    )

                    duc_du, duc_dv, dvc_du, dvc_dv = np_clamp_grad(code)
                    dL_duc = -dL_di0 + dL_di1
                    dL_dvc = -dL_di0 + dL_di2
                    dL_du = dL_duc * duc_du + dL_dvc * dvc_du
                    dL_dv = dL_duc * duc_dv + dL_dvc * dvc_dv

                    du0, du1, du2, dv0, dv1, dv2 = np_mt_grads(
                        ray_o[y, x], ray_d[y, x], verts[vids[0]],
                        verts[vids[1]], verts[vids[2]]
                    )
                    g_verts[vids[0]] += dL_du * du0 + dL_dv * dv0
                    g_verts[vids[1]] += dL_du * du1 + dL_dv * dv1
                    g_verts[vids[2]] += dL_du * du2 + dL_dv * dv2

    return {
        "verts": g_verts,
        "verts_color": g_vcolor,
        "faces_opacity": g_fopacity,
        "verts_depth": g_vdepth,
        "faces_intense": g_fintense,
    }


# ---------------------------------------------------------------------------
# tet renderer: scalar executable spec (cuda_renderer/forward.cu:485-815,
# backward.cu:86-487). No jitter (ray_random_seed == 0 only).
# ---------------------------------------------------------------------------

def _rays_tet(inv_mv_t, inv_proj_t, W, H):
    """Tet-renderer rays: direction norm clamped at 1e-4
    (cuda_renderer/forward.cu:142-143)."""
    ro = inv_mv_t[3, :3].astype(np.float32)
    ray_o = np.broadcast_to(ro, (H, W, 3))
    ray_d = np.zeros((H, W, 3), np.float32)
    for y in range(H):
        for x in range(W):
            nx = pix2ndc(x + 0.5, W)
            ny = pix2ndc(y + 0.5, H)
            pv = xform44(np.array([nx, ny, -1.0], np.float32), inv_proj_t)[:3]
            pw = xform44(pv, inv_mv_t)[:3]
            d = pw - ro
            d = d / max(np.sqrt(np.dot(d, d)), 1e-4)
            ray_d[y, x] = d
    return ray_o, ray_d


def np_mt_strict(ro, rd, p0, p1, p2):
    """Strict Moller-Trumbore validity (cuda_renderer/auxiliary.h:292-295):
    returns (t, u, v) iff t,u,v >= 0 and u+v <= 1, else None."""
    mt = np_mt(ro, rd, p0, p1, p2)
    if mt is None:
        return None
    t, u, v = mt
    if t >= 0 and u >= 0 and v >= 0 and u + v <= 1:
        return t, u, v
    return None


def _tet_tables(verts, faces, tets):
    """Face unit normal (norm clamped 1e-4, cuda_renderer/auxiliary.h:366-369)
    and per-(tet, slot) outward sign (centroid flip, auxiliary.h:371-394)."""
    F = faces.shape[0]
    nhat = np.zeros((F, 3), np.float32)
    for f in range(F):
        p0, p1, p2 = verts[faces[f]]
        n = np.cross(p1 - p0, p2 - p0)
        nhat[f] = n / max(np.sqrt(np.dot(n, n)), 1e-4)
    return nhat


def _outward_sign(verts, faces, tets, nhat, t, f):
    center = verts[tets[t]].mean(axis=0)
    p0 = verts[faces[f][0]]
    return -1.0 if np.dot(nhat[f], center - p0) > 0 else 1.0


def _sorted_faces_min_depth(ndc, img, faces, W, H, tile=16):
    """Cull + stable sort by clamped min vertex NDC depth
    (renderer_impl.cu:318-329 sorts binning keys by min_depths)."""
    F = faces.shape[0]
    gx = (W + tile - 1) // tile
    gy = (H + tile - 1) // tile
    keys = []
    valid = np.zeros(F, bool)
    for f in range(F):
        zs = ndc[faces[f], 2]
        if zs.max() < -1.0 or zs.min() > 1.0:
            keys.append(np.inf)
            continue
        pts = img[faces[f]]
        rminx = min(gx, max(0, int(pts[:, 0].min() / tile)))
        rminy = min(gy, max(0, int(pts[:, 1].min() / tile)))
        rmaxx = min(gx, max(0, int(pts[:, 0].max() / tile) + 1))
        rmaxy = min(gy, max(0, int(pts[:, 1].max() / tile) + 1))
        if (rmaxx - rminx) * (rmaxy - rminy) == 0:
            keys.append(np.inf)
            continue
        valid[f] = True
        keys.append(min(max((zs.min() + 1.0) * 0.5, 0.0), 1.0))
    order = np.argsort(np.asarray(keys), kind="stable")
    return order, valid


def render_tet_np(verts, faces, vcolor, fopacity, mv_t, proj_t, fintense,
                  tets, face_tets, tet_faces, bg, H, W, max_steps=512):
    """Scalar tet forward: first hit + connectivity march
    (cuda_renderer/forward.cu:298-445, :485-815)."""
    B = mv_t.shape[0]
    color = np.zeros((B, 3, H, W), np.float32)
    depth_out = np.ones((B, 1, H, W), np.float32)
    active_out = np.zeros((B, H, W), bool)
    nhat = _tet_tables(verts, faces, tets)
    LOG_TERM = np.log(np.float32(T_EPS) * 0.1)
    aux = {
        "first_face": np.full((B, H, W), -1, np.int64),
        "last_face": np.full((B, H, W), -1, np.int64),
        "last_tet": np.full((B, H, W), -1, np.int64),
        "final_log_T": np.zeros((B, H, W), np.float32),
        "final_prev_log_T": np.zeros((B, H, W), np.float32),
    }

    for b in range(B):
        ndc, img = _project(verts, mv_t[b], proj_t[b], W, H)
        order, valid = _sorted_faces_min_depth(ndc, img, faces, W, H)
        inv_mv = np.linalg.inv(mv_t[b])
        inv_proj = np.linalg.inv(proj_t[b])
        ray_o, ray_d = _rays_tet(inv_mv, inv_proj, W, H)

        for y in range(H):
            for x in range(W):
                ro, rd = ray_o[y, x], ray_d[y, x]

                # --- first hit: smallest strict-MT t; ties -> first in
                # min-depth sorted order (forward.cu:386-416) ---
                best = None
                for f in order:
                    if not valid[f]:
                        continue
                    mt = np_mt_strict(ro, rd, *verts[faces[f]])
                    if mt is None:
                        continue
                    if best is None or mt[0] < best[1][0]:
                        best = (f, mt)
                if best is None:
                    color[b, :, y, x] = bg
                    continue
                ff, (ct_, cu, cv) = best
                aux["first_face"][b, y, x] = ff

                # --- starting tet: the side whose outward normal opposes
                # the ray; second qualifying entry wins (forward.cu:420-444)
                nd = np.dot(nhat[ff], rd)
                first_tet = -1
                for cand in face_tets[ff]:
                    if cand < 0:
                        continue
                    sgn = _outward_sign(verts, faces, tets, nhat, cand, ff)
                    if sgn * nd < 0:
                        first_tet = cand
                if first_tet < 0:
                    color[b, :, y, x] = bg
                    continue

                # --- march (forward.cu:595-788) ---
                cf, ct = ff, first_tet
                t_, u_, v_ = ct_, cu, cv
                C = np.zeros(3, np.float32)
                D = np.float32(0.0)
                log_T = np.float32(0.0)
                prev_log_T = np.float32(0.0)
                is_active = False
                done = False
                last_face = last_tet = -1
                for _step in range(max_steps):
                    if done:
                        break
                    # blend entry face at raw (u, v) -- tet hits are always
                    # inside faces, no clamping (auxiliary.h has no
                    # clamp_bary_uv in the tet variant)
                    vids = faces[cf]
                    col = (
                        vcolor[vids[0]]
                        + (vcolor[vids[1]] - vcolor[vids[0]]) * u_
                        + (vcolor[vids[2]] - vcolor[vids[0]]) * v_
                    ) * fintense[b, cf]
                    a = fopacity[cf]
                    w = np.exp(log_T) * a
                    C = C + col * w
                    # precise depth: reproject the 3D hit (forward.cu:628-632)
                    p = ro + rd * t_
                    pp = xform44(xform44(p, mv_t[b])[:3], proj_t[b])
                    D = D + (pp[2] / clamp_w(pp[3])) * w
                    prev_log_T = log_T
                    if a < 1.0:
                        log_T = log_T + np.log(np.float32(1.0) - a)
                    else:
                        log_T = LOG_TERM  # alpha >= 1 (forward.cu:636-642)
                    last_face, last_tet = cf, ct

                    if np.exp(log_T) < T_EPS:
                        is_active = True
                        done = True
                        break
                    if ct == -1:  # exited tessellation (forward.cu:667-670)
                        is_active = True
                        done = True
                        break

                    # step through tet (forward.cu:672-775)
                    tf = tet_faces[ct]
                    others = [j for j in range(4) if tf[j] != cf]
                    if len(others) != 3:  # error case 1
                        done = True
                        break
                    sgn_entry = _outward_sign(verts, faces, tets, nhat, ct, cf)
                    if sgn_entry * np.dot(nhat[cf], rd) >= 0:  # error case 2
                        done = True
                        break
                    exits = []
                    for j in others:
                        fj = tf[j]
                        mt = np_mt_strict(ro, rd, *verts[faces[fj]])
                        if mt is None:
                            continue
                        sgn = _outward_sign(verts, faces, tets, nhat, ct, fj)
                        if sgn * np.dot(nhat[fj], rd) > 0:
                            exits.append((j, fj, mt))
                    if len(exits) != 1:  # error case 3
                        done = True
                        break
                    _, nf, (t_, u_, v_) = exits[-1]  # last match wins
                    nt = -1
                    for cand in face_tets[nf]:
                        if cand != ct and cand != -1:
                            nt = cand
                            break
                    cf, ct = nf, nt

                aux["last_face"][b, y, x] = last_face
                aux["last_tet"][b, y, x] = last_tet
                aux["final_log_T"][b, y, x] = log_T
                aux["final_prev_log_T"][b, y, x] = prev_log_T
                active_out[b, y, x] = is_active
                if is_active:
                    T = np.exp(log_T)
                    color[b, :, y, x] = C + T * bg
                    depth_out[b, 0, y, x] = D + T
                else:
                    color[b, :, y, x] = bg  # inactive -> pure background
                    depth_out[b, 0, y, x] = 1.0
    return color, depth_out, active_out, aux


def render_tet_np_backward(verts, faces, vcolor, fopacity, mv_t, proj_t,
                           fintense, tets, face_tets, tet_faces, bg, H, W,
                           dL_dcolor, dL_ddepth, aux, max_steps=512):
    """Scalar tet backward: reverse march, vcolor + fopacity grads only
    (backward.cu:86-487)."""
    B = mv_t.shape[0]
    P = verts.shape[0]
    F = faces.shape[0]
    g_vcolor = np.zeros((P, 3), np.float64)
    g_fopacity = np.zeros(F, np.float64)
    nhat = _tet_tables(verts, faces, tets)

    for b in range(B):
        inv_mv = np.linalg.inv(mv_t[b])
        inv_proj = np.linalg.inv(proj_t[b])
        ray_o, ray_d = _rays_tet(inv_mv, inv_proj, W, H)

        for y in range(H):
            for x in range(W):
                last_face = aux["last_face"][b, y, x]
                if not bool(aux["first_face"][b, y, x] >= 0):
                    continue
                if last_face < 0:
                    continue
                # inactive pixels render pure bg -> no gradient flows
                final_log_T = aux["final_log_T"][b, y, x]
                final_prev_log_T = aux["final_prev_log_T"][b, y, x]
                final_T = np.exp(final_log_T)
                final_prev_T = np.exp(final_prev_log_T)
                ro, rd = ray_o[y, x], ray_d[y, x]
                gcol = dL_dcolor[b, :, y, x]
                gdep = dL_ddepth[b, 0, y, x]
                bg_dot = float(np.dot(bg, gcol)) + float(gdep)

                # entry-side tet of the last face (backward.cu:224-232)
                last_tet = aux["last_tet"][b, y, x]
                ft = face_tets[last_face]
                ct = ft[0] if ft[0] != last_tet else ft[1]
                cf = last_face
                mt = np_mt(ro, rd, *verts[faces[cf]])
                if mt is None:
                    continue
                t_, u_, v_ = mt

                prev_log_T = final_prev_log_T
                first = True
                last_alpha = 0.0
                last_color = np.zeros(3)
                last_depth = 0.0
                accum_rec = np.zeros(3)
                accum_recd = 0.0

                first_face = aux["first_face"][b, y, x]
                for _step in range(max_steps):
                    vids = faces[cf]
                    inten = fintense[b, cf]
                    i1, i2 = u_, v_
                    i0 = 1.0 - i1 - i2
                    col = (
                        i0 * vcolor[vids[0]] + i1 * vcolor[vids[1]]
                        + i2 * vcolor[vids[2]]
                    ) * inten
                    p = ro + rd * t_
                    pp = xform44(xform44(p, mv_t[b])[:3], proj_t[b])
                    dep = pp[2] / clamp_w(pp[3])
                    a = fopacity[cf]

                    # reconstruct prev transmittance (backward.cu:273-277)
                    if not first:
                        prev_log_T = prev_log_T - np.log(
                            max(np.float32(1.0) - a, np.float32(1e-37)))
                    first = False
                    prev_T = np.exp(prev_log_T)

                    accum_rec = (
                        last_alpha * last_color + (1 - last_alpha) * accum_rec
                    )
                    accum_recd = (
                        last_alpha * last_depth + (1 - last_alpha) * accum_recd
                    )

                    dL_dfcolor = gcol * a * prev_T
                    dL_dop = (
                        float(np.dot(col - accum_rec, gcol))
                        + (dep - accum_recd) * gdep
                    ) * prev_T
                    if a == 1.0:  # backward.cu:317-339
                        dL_dop += (-final_prev_T) * bg_dot
                    else:
                        dL_dop += (-final_T / (1 - a)) * bg_dot

                    g_vcolor[vids[0]] += i0 * dL_dfcolor * inten
                    g_vcolor[vids[1]] += i1 * dL_dfcolor * inten
                    g_vcolor[vids[2]] += i2 * dL_dfcolor * inten
                    g_fopacity[cf] += dL_dop

                    last_color = col
                    last_depth = dep
                    last_alpha = a

                    # terminate at the first face (backward.cu:363-366)
                    if cf == first_face:
                        break
                    if ct == -1:
                        break
                    # walk backward: exit test flipped (backward.cu:372-484)
                    tf = tet_faces[ct]
                    others = [j for j in range(4) if tf[j] != cf]
                    if len(others) != 3:
                        break
                    sgn_entry = _outward_sign(verts, faces, tets, nhat, ct, cf)
                    if sgn_entry * np.dot(nhat[cf], rd) <= 0:
                        break
                    exits = []
                    for j in others:
                        fj = tf[j]
                        mt = np_mt_strict(ro, rd, *verts[faces[fj]])
                        if mt is None:
                            continue
                        sgn = _outward_sign(verts, faces, tets, nhat, ct, fj)
                        if sgn * np.dot(nhat[fj], rd) < 0:
                            exits.append((j, fj, mt))
                    if len(exits) != 1:
                        break
                    _, nf, (t_, u_, v_) = exits[-1]
                    nt = -1
                    for cand in face_tets[nf]:
                        if cand != ct and cand != -1:
                            nt = cand
                            break
                    cf, ct = nf, nt

    return {"verts_color": g_vcolor, "faces_opacity": g_fopacity}
