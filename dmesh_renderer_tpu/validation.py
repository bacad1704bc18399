"""Input validation at the API boundary.

The reference validates tensor shapes/dtypes in its binding layer before
launching kernels (render.cu:49-79 for the tri renderer, :237-277 for the
tet renderer) and raises descriptive errors. Under jit, shapes are static,
so these checks run at trace time for free.
"""

from __future__ import annotations


def _chk(cond: bool, msg: str):
    if not cond:
        raise ValueError(f"dmesh_renderer_tpu: {msg}")


def check_tri_inputs(verts, faces, verts_color, faces_opacity, mv_t, proj_t,
                     verts_depth, faces_intense, bg):
    """Shape contract of render_tris (render.cu:49-79).

    verts_depth may be None (tet renderer accepts but ignores it,
    dmesh_renderer/__init__.py:448-450).
    """
    _chk(verts.ndim == 2 and verts.shape[1] == 3,
         f"verts must be [P,3], got {verts.shape}")
    _chk(faces.ndim == 2 and faces.shape[1] == 3,
         f"faces must be [F,3], got {faces.shape}")
    P = verts.shape[0]
    F = faces.shape[0]
    _chk(verts_color.shape == (P, 3),
         f"verts_color must be [P,3]=({P},3), got {verts_color.shape}")
    _chk(faces_opacity.shape == (F,),
         f"faces_opacity must be [F]=({F},), got {faces_opacity.shape}")
    _chk(mv_t.ndim == 3 and mv_t.shape[1:] == (4, 4),
         f"mv_mats must be [B,4,4], got {mv_t.shape}")
    B = mv_t.shape[0]
    _chk(proj_t.shape == (B, 4, 4),
         f"proj_mats must be [B,4,4]=({B},4,4), got {proj_t.shape}")
    if verts_depth is not None:
        _chk(verts_depth.shape == (B, P),
             f"verts_depth must be [B,P]=({B},{P}), got {verts_depth.shape}")
    _chk(faces_intense.shape == (B, F),
         f"faces_intense must be [B,F]=({B},{F}), got {faces_intense.shape}")
    _chk(bg.shape == (3,), f"bg must be [3], got {bg.shape}")
    # the binned paths carry face ids in exact-f32 attr columns
    # (tri_binned._FID; tet mega table): ids must stay under 2^24
    _chk(F < (1 << 24),
         f"at most 2^24-1 faces supported (ids ride in f32-exact columns "
         f"of the binned pipelines), got F={F}")


def check_tet_inputs(verts, faces, verts_color, faces_opacity, mv_t, proj_t,
                     faces_intense, tets, face_tets, tet_faces, bg):
    """Shape contract of render_tets (render.cu:237-277)."""
    check_tri_inputs(verts, faces, verts_color, faces_opacity, mv_t, proj_t,
                     None, faces_intense, bg)
    F = faces.shape[0]
    _chk(tets.ndim == 2 and tets.shape[1] == 4,
         f"tets must be [T,4], got {tets.shape}")
    T = tets.shape[0]
    _chk(face_tets.shape == (F, 2),
         f"face_tets must be [F,2]=({F},2), got {face_tets.shape}")
    _chk(tet_faces.shape == (T, 4),
         f"tet_faces must be [T,4]=({T},4), got {tet_faces.shape}")
    # tet ids ride in f32-exact march-table columns, and the forward
    # march's gather index is tet*4 + entry_slot (tet._march_tables)
    _chk(T < (1 << 22),
         f"at most 2^22-1 tets supported (entry-slot gather indices "
         f"tet*4+slot ride in f32-exact march tables), got T={T}")
