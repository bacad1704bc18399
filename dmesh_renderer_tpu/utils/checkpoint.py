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
    """
    path = os.path.abspath(path)
    flat = _checkpointer().restore(path)
    leaves = [flat[k] for k in sorted(flat)]
    treedef = jax.tree.structure(template)
    return jax.tree.unflatten(treedef, leaves)
