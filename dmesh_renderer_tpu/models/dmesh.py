"""DMesh-style multi-view optimization loop (the flagship "model").

The reference renderer exists to serve DMesh: differentiable-mesh
optimization where a batch of camera views is rendered, compared against
target images, and the scene parameters (vertex positions/colors, face
opacities, per-view attributes) are updated by gradient descent
(SURVEY.md section "One-paragraph summary"; BASELINE.json config 5).

This module packages that loop TPU-natively: a functional train step
(render -> L2 loss -> grads -> optax update), jit-compiled with the view
batch sharded over a device mesh (see parallel/sharding.py) so that the
cross-view reduction of shared-parameter gradients rides ICI collectives.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..ops.tri import render_tri_auto
from ..parallel.sharding import (
    VIEW_AXIS,
    replicated,
    view_sharding,
)

Array = jax.Array


class TriScene(NamedTuple):
    """Learnable scene parameters, shared across views."""
    verts: Array          # [P, 3]
    verts_color: Array    # [P, 3]
    faces_opacity: Array  # [F]


class ViewBatch(NamedTuple):
    """Per-view inputs (leading axis = views; shardable)."""
    mv_t: Array           # [B, 4, 4] transposed modelview
    proj_t: Array         # [B, 4, 4] transposed projection
    inv_mv_t: Array       # [B, 4, 4]
    inv_proj_t: Array     # [B, 4, 4]
    verts_depth: Array    # [B, P]
    faces_intense: Array  # [B, F]
    target: Array         # [B, 3, H, W] target images


class TrainState(NamedTuple):
    scene: TriScene
    view_params: Any      # (verts_depth, faces_intense) if learned, or None
    opt_state: optax.OptState


def _apply_grads(optimizer, state: TrainState, grads):
    """Shared optimizer-update step (single source for every train
    step/loop variant, so a future change -- clipping, loss scaling --
    cannot drift between them)."""
    updates, opt_state = optimizer.update(grads, state.opt_state,
                                          state.scene)
    scene = optax.apply_updates(state.scene, updates)
    return TrainState(scene, state.view_params, opt_state)


def render_views(scene: TriScene, faces: Array, batch: ViewBatch, bg: Array,
                 height: int, width: int, force: str | None = None,
                 kcap: int | None = None):
    return render_tri_auto(
        scene.verts, faces, scene.verts_color, scene.faces_opacity,
        batch.mv_t, batch.proj_t, batch.inv_mv_t, batch.inv_proj_t,
        batch.verts_depth, batch.faces_intense, bg, height, width,
        force=force, kcap=kcap,
    )


def make_loss_fn(faces: Array, bg: Array, height: int, width: int,
                 force: str | None = None, kcap: int | None = None):
    def loss_fn(scene: TriScene, batch: ViewBatch):
        color, _depth = render_views(scene, faces, batch, bg, height, width,
                                     force=force, kcap=kcap)
        return jnp.mean((color - batch.target) ** 2)
    return loss_fn


def _make_sharded_value_and_grad(loss_fn, mesh):
    """Per-device loss+grads over view shards, combined with collectives.

    The render (including the tile-binned sort/Pallas pipeline, which pjit
    cannot partition across its flattened (view, tile) key table) runs
    independently per device on that device's views under ``shard_map``;
    the cross-view reduction of view-shared parameter gradients is an
    explicit ``pmean`` over the views axis -- the ICI collective analog of
    the reference's atomicAdd-across-views (backward.cu:389-418).
    """
    from jax import lax

    def local_vg(scene: TriScene, batch: ViewBatch):
        loss, grads = jax.value_and_grad(loss_fn)(scene, batch)
        # global loss = mean over all views = pmean of per-shard means
        # (equal shard sizes), so global grads = pmean of per-shard grads.
        loss = lax.pmean(loss, VIEW_AXIS)
        grads = jax.tree.map(lambda g: lax.pmean(g, VIEW_AXIS), grads)
        return loss, grads

    from jax.sharding import PartitionSpec as P

    return jax.shard_map(
        local_vg,
        mesh=mesh,
        in_specs=(P(), P(VIEW_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,  # custom_vjp residuals are unannotated
    )


def make_train_step(optimizer: optax.GradientTransformation, faces: Array,
                    bg: Array, height: int, width: int, mesh=None,
                    force: str | None = None, kcap: int | None = None):
    """Build a jitted train step.

    With ``mesh``: scene params are replicated, the view batch is sharded on
    the ``views`` axis, and each device renders its own views under
    ``shard_map`` (works for BOTH the dense and tile-binned paths); the
    shared-parameter gradient reduction is a ``pmean`` collective (the TPU
    equivalent of the reference's atomicAdd-across-views,
    backward.cu:389-418).
    """
    loss_fn = make_loss_fn(faces, bg, height, width, force=force, kcap=kcap)

    if mesh is None:
        def step(state: TrainState, batch: ViewBatch):
            loss, grads = jax.value_and_grad(loss_fn)(state.scene, batch)
            return _apply_grads(optimizer, state, grads), loss

        return jax.jit(step)

    sharded_vg = _make_sharded_value_and_grad(loss_fn, mesh)

    def step(state: TrainState, batch: ViewBatch):
        loss, grads = sharded_vg(state.scene, batch)
        return _apply_grads(optimizer, state, grads), loss

    rep = replicated(mesh)
    vs = view_sharding(mesh)
    # Prefix pytrees: `rep` covers the whole opt_state subtree; `vs`
    # covers view_params whether it is None (empty subtree) or a tuple of
    # per-view [B, ...] arrays (sharded on the views axis).
    state_sh = TrainState(TriScene(rep, rep, rep), vs, rep)
    batch_sh = ViewBatch(*([vs] * 7))
    return jax.jit(
        step,
        in_shardings=(state_sh, batch_sh),
        out_shardings=(state_sh, rep),
    )


def init_train_state(scene: TriScene,
                     optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(scene, None, optimizer.init(scene))


# =============================================================================
# Tet-renderer optimization (the DMesh method's second phase: exact-depth
# rendering through the tessellation; gradients flow to vertex colors and
# face opacities only, render.h:84-111)
# =============================================================================

class TetScene(NamedTuple):
    """Learnable tet-scene parameters (the only differentiable inputs of the
    tet renderer)."""
    verts_color: Array    # [P, 3]
    faces_opacity: Array  # [F]


class TetGeometry(NamedTuple):
    """Static tessellation structure (verts are NOT differentiated by the
    tet renderer; reference dmesh_renderer/__init__.py:447)."""
    verts: Array       # [P, 3]
    faces: Array       # [F, 3]
    tets: Array        # [T, 4]
    face_tets: Array   # [F, 2]
    tet_faces: Array   # [T, 4]


class TetViewBatch(NamedTuple):
    """Per-view inputs (leading axis = views; shardable)."""
    mv_t: Array           # [B, 4, 4]
    proj_t: Array         # [B, 4, 4]
    inv_mv_t: Array       # [B, 4, 4]
    inv_proj_t: Array     # [B, 4, 4]
    faces_intense: Array  # [B, F]
    target: Array         # [B, 3, H, W]


def make_tet_se_fn(geom: TetGeometry, bg: Array, height: int, width: int,
                   seed: int = 0):
    """Masked squared error + active count: inactive pixels (walk failures /
    misses) render pure background and are excluded from the loss, mirroring
    how DMesh consumes the reference's active mask (thresholded at
    __init__.py:333). Returns the UNNORMALIZED (sum, count) so the sharded
    path can psum numerator and denominator separately -- per-view active
    counts differ, so a pmean of per-shard masked means would not equal the
    global masked mean."""
    from ..ops.tet import render_tet_core

    def se_fn(scene: TetScene, batch: TetViewBatch, view_offset=None):
        color, _depth, active = render_tet_core(
            geom.verts, geom.faces, scene.verts_color, scene.faces_opacity,
            batch.mv_t, batch.proj_t, batch.inv_mv_t, batch.inv_proj_t,
            batch.faces_intense, geom.tets, geom.face_tets, geom.tet_faces,
            bg, height, width, seed, view_offset=view_offset,
        )
        m = active[:, None, :, :].astype(jnp.float32)
        se = jnp.sum(m * (color - batch.target) ** 2)
        return se, jnp.sum(m) * 3.0

    return se_fn


def _tet_normalize(se, cnt, grads):
    """Masked-mean normalization of the (sum, count) loss pieces."""
    denom = jnp.maximum(cnt, 1.0)
    return se / denom, jax.tree.map(lambda g: g / denom, grads)


def _make_tet_vg(se_fn, mesh):
    """(scene, batch) -> (loss, grads) for the tet renderer, unsharded or
    shard_map'd over the views axis (shared by step and scan-loop builders
    so the two cannot drift)."""
    if mesh is None:
        def vg(scene: TetScene, batch: TetViewBatch):
            (se, cnt), grads = jax.value_and_grad(se_fn, has_aux=True)(
                scene, batch)
            return _tet_normalize(se, cnt, grads)

        return vg

    from jax import lax
    from jax.sharding import PartitionSpec as P

    def local_vg(scene: TetScene, batch: TetViewBatch):
        # Jittered-ray fields (seed > 0) are keyed per GLOBAL view: this
        # device's view 0 is global view axis_index * B_local, so the
        # sharded step draws exactly the unsharded batch's jitter.
        off = lax.axis_index(VIEW_AXIS) * batch.mv_t.shape[0]
        (se, cnt), grads = jax.value_and_grad(se_fn, has_aux=True)(
            scene, batch, off)
        se = lax.psum(se, VIEW_AXIS)
        cnt = lax.psum(cnt, VIEW_AXIS)
        grads = jax.tree.map(lambda g: lax.psum(g, VIEW_AXIS), grads)
        return se, cnt, grads

    sharded = jax.shard_map(
        local_vg, mesh=mesh,
        in_specs=(P(), P(VIEW_AXIS)), out_specs=(P(), P(), P()),
        check_vma=False,
    )

    def vg(scene: TetScene, batch: TetViewBatch):
        return _tet_normalize(*sharded(scene, batch))

    return vg


def _tet_shardings(mesh):
    rep = replicated(mesh)
    vs = view_sharding(mesh)
    state_sh = TrainState(TetScene(rep, rep), vs, rep)
    batch_sh = TetViewBatch(*([vs] * 6))
    return state_sh, batch_sh, rep


def make_tet_train_step(optimizer: optax.GradientTransformation,
                        geom: TetGeometry, bg: Array, height: int,
                        width: int, mesh=None, seed: int = 0):
    """Jitted tet-scene train step; with ``mesh``, views are sharded under
    shard_map exactly like the tri path."""
    se_fn = make_tet_se_fn(geom, bg, height, width, seed)
    vg = _make_tet_vg(se_fn, mesh)

    def step(state: TrainState, batch: TetViewBatch):
        loss, grads = vg(state.scene, batch)
        return _apply_grads(optimizer, state, grads), loss

    if mesh is None:
        return jax.jit(step)
    state_sh, batch_sh, rep = _tet_shardings(mesh)
    return jax.jit(
        step,
        in_shardings=(state_sh, batch_sh),
        out_shardings=(state_sh, rep),
    )


def make_tet_train_loop(optimizer: optax.GradientTransformation,
                        geom: TetGeometry, bg: Array, height: int,
                        width: int, n_steps: int, mesh=None, seed: int = 0):
    """Jitted multi-step tet optimization: ``lax.scan`` over train steps,
    mirroring :func:`make_train_loop` (the tri side). DMesh's phase-2
    optimization drives the tet renderer in a tight loop; scanning keeps it
    on device instead of paying the remote runtime's fixed per-dispatch
    host round-trip (~28 ms) every step. Returns
    ``loop(state, batch) -> (state, losses[n_steps])``."""
    se_fn = make_tet_se_fn(geom, bg, height, width, seed)
    vg = _make_tet_vg(se_fn, mesh)

    def loop(state: TrainState, batch: TetViewBatch):
        def step(state, _):
            loss, grads = vg(state.scene, batch)
            return _apply_grads(optimizer, state, grads), loss

        return jax.lax.scan(step, state, None, length=n_steps)

    if mesh is None:
        return jax.jit(loop)
    state_sh, batch_sh, rep = _tet_shardings(mesh)
    return jax.jit(
        loop,
        in_shardings=(state_sh, batch_sh),
        out_shardings=(state_sh, rep),
    )


def init_tet_train_state(scene: TetScene,
                         optimizer: optax.GradientTransformation
                         ) -> TrainState:
    return TrainState(scene, None, optimizer.init(scene))


def make_train_loop(optimizer: optax.GradientTransformation, faces: Array,
                    bg: Array, height: int, width: int, n_steps: int,
                    mesh=None, force: str | None = None,
                    kcap: int | None = None):
    """A jitted multi-step loop: ``lax.scan`` over train steps.

    Keeps the whole optimization on device -- no per-step host dispatch
    (which costs ~30 ms/step on remote-attached TPUs). Returns
    ``loop(state, batch) -> (state, losses[n_steps])``.
    """
    loss_fn = make_loss_fn(faces, bg, height, width, force=force, kcap=kcap)

    if mesh is None:
        vg = jax.value_and_grad(loss_fn)
    else:
        vg = _make_sharded_value_and_grad(loss_fn, mesh)

    def loop(state: TrainState, batch: ViewBatch):
        def step(state, _):
            loss, grads = vg(state.scene, batch)
            return _apply_grads(optimizer, state, grads), loss

        return jax.lax.scan(step, state, None, length=n_steps)

    if mesh is None:
        return jax.jit(loop)

    rep = replicated(mesh)
    vs = view_sharding(mesh)
    state_sh = TrainState(TriScene(rep, rep, rep), vs, rep)
    batch_sh = ViewBatch(*([vs] * 7))
    return jax.jit(
        loop,
        in_shardings=(state_sh, batch_sh),
        out_shardings=(state_sh, rep),
    )
