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


def np_in_tri(p, p1, p2, p3):
    sub = 16.0
    px, py = int(p[0] * sub), int(p[1] * sub)
    x1, y1 = int(p1[0] * sub), int(p1[1] * sub)
    x2, y2 = int(p2[0] * sub), int(p2[1] * sub)
    x3, y3 = int(p3[0] * sub), int(p3[1] * sub)
    area = (x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1)
    if area == 0:
        return False
    if area < 0:
        x2, y2, x3, y3 = x3, y3, x2, y2
    cx1, cy1 = x1 - x2, y1 - y2
    cx2, cy2 = x2 - x3, y2 - y3
    cx3, cy3 = x3 - x1, y3 - y1
    s1 = cx1 * (py - y1) - cy1 * (px - x1)
    s2 = cx2 * (py - y2) - cy2 * (px - x2)
    s3 = cx3 * (py - y3) - cy3 * (px - x3)
    if cy1 > 0 or (cy1 == 0 and cx1 > 0):
        s1 -= 1
    if cy2 > 0 or (cy2 == 0 and cx2 > 0):
        s2 -= 1
    if cy3 > 0 or (cy3 == 0 and cx3 > 0):
        s3 -= 1
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
    """Returns (order, valid) replicating cull + stable depth sort."""
    F = faces.shape[0]
    gx = (W + tile - 1) // tile
    gy = (H + tile - 1) // tile
    keys = []
    valid = np.zeros(F, bool)
    depth = np.zeros(F, np.float32)
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
        d = np.float32(zs.mean())
        depth[f] = min(max((d + 1.0) * 0.5, 0.0), 1.0)
        keys.append(depth[f])
    order = np.argsort(np.asarray(keys), kind="stable")
    return order, valid


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
                  fintense, bg, H, W):
    B = mv_t.shape[0]
    color = np.zeros((B, 3, H, W), np.float32)
    depth_out = np.zeros((B, 1, H, W), np.float32)
    aux = {
        "final_T": np.ones((B, H, W), np.float32),
        "prev_T": np.ones((B, H, W), np.float32),
        "n_contrib": np.zeros((B, H, W), np.int64),
        "order": [],
        "valid": [],
    }

    for b in range(B):
        ndc, img = _project(verts, mv_t[b], proj_t[b], W, H)
        order, valid = _sorted_faces(ndc, img, faces, W, H)
        aux["order"].append(order)
        aux["valid"].append(valid)
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
                for pos, f in enumerate(order):
                    if not valid[f]:
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

    for b in range(B):
        ndc, img = _project(verts, mv_t[b], proj_t[b], W, H)
        order, valid = aux["order"][b], aux["valid"][b]
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

                for pos in range(len(order) - 1, -1, -1):
                    if pos >= last_contrib:
                        continue
                    f = order[pos]
                    if not valid[f]:
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
