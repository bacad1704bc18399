"""Drop-in import alias for the reference package name.

The reference renderer is imported as ``dmesh_renderer``
(reference: dmesh_renderer/__init__.py:13-43, 237-275); DMesh training
code does ``from dmesh_renderer import TriRenderSettings, TriRenderer,
render_tri, TetRenderSettings, TetRenderer, render_tet``. This alias
re-exports the TPU framework's public API under that name so such code
runs unmodified (the module wrappers already accept torch tensors and
reproduce the reference's dtype coercions and matrix transposes).

Do not install this alongside the CUDA ``dmesh_renderer`` package -- the
names collide by design.
"""

from dmesh_renderer_tpu import (  # noqa: F401
    TetRenderer,
    TetRenderSettings,
    TriRenderer,
    TriRenderSettings,
    render_tet,
    render_tri,
)

__all__ = [
    "TriRenderSettings",
    "TriRenderer",
    "render_tri",
    "TetRenderSettings",
    "TetRenderer",
    "render_tet",
]
