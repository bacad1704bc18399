"""Checkpoint / resume for optimization loops (orbax).

The reference renderer is stateless -- its only "state" is the fwd->bwd
opaque-buffer handoff (SURVEY.md section 5) which here lives inside
jax.custom_vjp residuals. What *does* need checkpointing is the DMesh
optimization loop built on top (models/dmesh.py: scene params + optimizer
state); this module wraps orbax for that.
"""

from __future__ import annotations

import os
from typing import Any

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, state: Any, *, force: bool = True) -> str:
    """Save a pytree (e.g. models.dmesh.TrainState) to ``path``.

    Stored as an index-keyed flat dict so arbitrary pytree structures
    (NamedTuples, optax states) round-trip without custom type registration.
    """
    path = os.path.abspath(path)
    leaves = jax.tree.leaves(state)
    flat = {f"{i:06d}": leaf for i, leaf in enumerate(leaves)}
    _checkpointer().save(path, flat, force=force)
    return path


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restore a pytree saved by save_checkpoint.

    ``template`` provides the structure (e.g. a freshly-initialized
    TrainState); returns the restored values in the template's structure.

    The restored leaves are validated against the template before
    unflattening: leaf count, and per-leaf shape/dtype where the template
    leaf has them. A checkpoint saved from a different model/optimizer
    configuration fails with a message naming the mismatch instead of
    unflattening into garbage.
    """
    path = os.path.abspath(path)
    flat = _checkpointer().restore(path)
    leaves = [flat[k] for k in sorted(flat)]
    tmpl_leaves, treedef = jax.tree.flatten(template)
    if len(leaves) != len(tmpl_leaves):
        raise ValueError(
            f"checkpoint at {path} has {len(leaves)} leaves but the template "
            f"has {len(tmpl_leaves)} -- it was saved from a different "
            "state structure (model/optimizer config mismatch)")
    for i, (got, want) in enumerate(zip(leaves, tmpl_leaves)):
        g_shape = getattr(got, "shape", None)
        w_shape = getattr(want, "shape", None)
        if g_shape is not None and w_shape is not None and \
                tuple(g_shape) != tuple(w_shape):
            raise ValueError(
                f"checkpoint leaf {i} has shape {tuple(g_shape)} but the "
                f"template expects {tuple(w_shape)} (checkpoint at {path} "
                "was saved from a different state configuration)")
        g_dtype = getattr(got, "dtype", None)
        w_dtype = getattr(want, "dtype", None)
        if g_dtype is not None and w_dtype is not None and g_dtype != w_dtype:
            raise ValueError(
                f"checkpoint leaf {i} has dtype {g_dtype} but the template "
                f"expects {w_dtype} (checkpoint at {path} was saved from a "
                "different state configuration)")
    return jax.tree.unflatten(treedef, leaves)
