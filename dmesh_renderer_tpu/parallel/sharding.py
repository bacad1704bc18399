"""Multi-view sharding over a TPU device mesh.

The reference's only large-scale parallel axis is the multi-view batch B:
every CUDA kernel carries a batch index and the gradients of view-shared
parameters (verts, verts_color, faces_opacity) are atomicAdd-summed across
views (SURVEY.md section 2.9; cuda_rasterizer/backward.cu:389-418).

The TPU-native mapping: shard B over a 1-D ``views`` mesh axis on ICI.
Forward is embarrassingly parallel per view; the cross-view gradient
reduction of view-shared parameters becomes an XLA all-reduce inserted
automatically by pjit when replicated-parameter gradients are computed from
view-sharded inputs (the collective analog of the atomicAdd-across-views).

Per-view parameters (verts_depth [B,P], faces_intense [B,F]) keep their
sharded layout end to end -- no communication at all.

Note: the dense (oracle) tri path partitions cleanly under pjit because every
op carries the B axis. The tile-binned path flattens (view, tile) into one
key table, which pjit cannot partition; multi-chip runs at binned scale wrap
the render in `shard_map` over the views axis so each device bins its own
local views with per-device key capacities -- this IS the production path:
see models/dmesh.make_train_step(..., mesh=...) -- pass force="binned" to
pin the binned path (the auto heuristic may pick the dense oracle for
small scenes) -- and
tests/test_sharding.py::test_sharded_binned_step_matches_single_device.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

VIEW_AXIS = "views"


def make_view_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """A 1-D mesh over the ``views`` axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            # a silently truncated mesh would halve (or worse) the view
            # parallelism the caller sized capacities/memory for
            raise ValueError(
                f"make_view_mesh: requested {n_devices} devices but only "
                f"{len(devices)} are available")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (VIEW_AXIS,))


def view_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for arrays with a leading view/batch axis."""
    return NamedSharding(mesh, P(VIEW_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Sharding for view-shared parameters (replicated on every device)."""
    return NamedSharding(mesh, P())


def shard_view_batch(mesh: Mesh, batch):
    """Place every array in ``batch`` (pytree, leading axis = views) onto the
    mesh, sharded along the view axis."""
    n = int(mesh.devices.size)
    for leaf in jax.tree.leaves(batch):
        if leaf.shape[0] % n != 0:
            # shard_map requires even division; surface it here with the fix
            # instead of a mid-compile sharding error
            raise ValueError(
                f"shard_view_batch: {leaf.shape[0]} views do not divide "
                f"evenly over the {n}-device mesh; pad the view batch or "
                f"build the mesh with make_view_mesh(n_devices=<divisor>)")
    s = view_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate_params(mesh: Mesh, params):
    """Replicate view-shared parameters onto every device."""
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), params)
