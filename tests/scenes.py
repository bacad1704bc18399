"""Shared test scenes and cameras (NumPy; no torch dependency)."""

from __future__ import annotations

import numpy as np


def look_at(eye, target, up):
    """Row-major modelview matrix M with p_view = M @ [p, 1]."""
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    up = np.asarray(up, np.float64)

    f = target - eye
    f = f / np.linalg.norm(f)
    s = np.cross(f, up)
    s = s / np.linalg.norm(s)
    u = np.cross(s, f)

    m = np.eye(4)
    m[0, :3] = s
    m[1, :3] = -u  # image y grows downward
    m[2, :3] = f   # camera looks along +z in view space
    m[:3, 3] = -m[:3, :3] @ eye
    return m.astype(np.float32)


def perspective(fovy_deg, aspect, near, far):
    """Row-major projection: NDC z in [-1, 1], -1 near (matches reference
    convention where depth -1 is near, dmesh_renderer/__init__.py:87)."""
    f = 1.0 / np.tan(np.deg2rad(fovy_deg) / 2.0)
    m = np.zeros((4, 4), np.float64)
    m[0, 0] = f / aspect
    m[1, 1] = f
    m[2, 2] = (far + near) / (far - near)
    m[2, 3] = -2.0 * far * near / (far - near)
    m[3, 2] = 1.0
    return m.astype(np.float32)


def ring_cameras(n_views, radius=3.0, fovy=45.0, aspect=1.0,
                 near=0.1, far=10.0, height=0.8):
    """n_views cameras on a ring looking at the origin.

    Returns (mv [B,4,4], proj [B,4,4]) in row-major (UN-transposed)
    convention, i.e. what a user passes to TriRenderer/TetRenderer.
    """
    mvs, projs = [], []
    for i in range(n_views):
        ang = 2 * np.pi * i / max(n_views, 1) + 0.3
        eye = [radius * np.cos(ang), height, radius * np.sin(ang)]
        mvs.append(look_at(eye, [0, 0, 0], [0, 1, 0]))
        projs.append(perspective(fovy, aspect, near, far))
    return np.stack(mvs), np.stack(projs)


def random_triangle_soup(n_tris, seed=0, spread=1.0):
    """Random small triangles near the origin. Returns dict of arrays."""
    rng = np.random.RandomState(seed)
    centers = rng.uniform(-spread, spread, size=(n_tris, 1, 3))
    offsets = rng.uniform(-0.25, 0.25, size=(n_tris, 3, 3))
    verts = (centers + offsets).reshape(-1, 3).astype(np.float32)
    faces = np.arange(3 * n_tris, dtype=np.int32).reshape(n_tris, 3)
    verts_color = rng.uniform(0, 1, size=(verts.shape[0], 3)).astype(np.float32)
    faces_opacity = rng.uniform(0.2, 0.95, size=(n_tris,)).astype(np.float32)
    return {
        "verts": verts,
        "faces": faces,
        "verts_color": verts_color,
        "faces_opacity": faces_opacity,
    }


def soup_view_attrs(soup, n_views, seed=1):
    """Per-view vertex depths and face intensities."""
    rng = np.random.RandomState(seed)
    P = soup["verts"].shape[0]
    F = soup["faces"].shape[0]
    verts_depth = rng.uniform(-1, 1, size=(n_views, P)).astype(np.float32)
    faces_intense = rng.uniform(0.5, 1.0, size=(n_views, F)).astype(np.float32)
    return verts_depth, faces_intense


def single_tet():
    """One regular-ish tetrahedron with full connectivity arrays."""
    verts = np.array(
        [
            [1.0, 1.0, 1.0],
            [1.0, -1.0, -1.0],
            [-1.0, 1.0, -1.0],
            [-1.0, -1.0, 1.0],
        ],
        np.float32,
    ) * 0.6
    # 4 faces of the tet
    faces = np.array(
        [[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]], np.int32
    )
    tets = np.array([[0, 1, 2, 3]], np.int32)
    face_tets = np.array([[0, -1]] * 4, np.int32)
    tet_faces = np.array([[0, 1, 2, 3]], np.int32)
    return verts, faces, tets, face_tets, tet_faces
