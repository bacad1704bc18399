"""dmesh_renderer_tpu: a TPU-native differentiable mesh renderer framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the CUDA
reference `dmesh_renderer` (SonSang/dmesh_renderer): a differentiable
semi-transparent triangle rasterizer (tile-binned, approximate depth order)
and a tetrahedral-tessellation ray-marching renderer (exact depth order,
gradients for vertex colors and face opacities).

Public API mirrors the reference (dmesh_renderer/__init__.py): see
``TriRenderSettings``, ``TriRenderer``, ``render_tri``, ``TetRenderSettings``,
``TetRenderer``, ``render_tet`` in :mod:`dmesh_renderer_tpu.api`.
"""

from .api import (  # noqa: F401
    TriRenderSettings,
    TriRenderer,
    render_tri,
    TetRenderSettings,
    TetRenderer,
    render_tet,
)
from .ops.binning import recommended_key_capacity  # noqa: F401
from .runtime.native import build_tet_connectivity  # noqa: F401

__version__ = "0.1.0"
