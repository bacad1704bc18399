"""Checkpoint/resume round-trip for the optimization loop state."""

import os
import tempfile

import numpy as np
import jax.numpy as jnp
import optax

from dmesh_renderer_tpu.models.dmesh import TriScene, init_train_state
from dmesh_renderer_tpu.utils.checkpoint import (
    restore_checkpoint, save_checkpoint,
)


def test_train_state_roundtrip():
    rng = np.random.RandomState(0)
    scene = TriScene(
        jnp.asarray(rng.rand(9, 3).astype(np.float32)),
        jnp.asarray(rng.rand(9, 3).astype(np.float32)),
        jnp.asarray(rng.rand(3).astype(np.float32)),
    )
    opt = optax.adam(1e-2)
    state = init_train_state(scene, opt)

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt")
        save_checkpoint(path, state)
        restored = restore_checkpoint(path, state)

    for a, b in zip(
        __import__("jax").tree.leaves(state),
        __import__("jax").tree.leaves(restored),
    ):
        np.testing.assert_array_equal(np.array(a), np.array(b))
    assert type(restored) is type(state)
    assert type(restored.scene) is TriScene
