"""Multi-view sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from dmesh_renderer_tpu.models.dmesh import (
    TriScene, ViewBatch, init_train_state, make_train_step,
)
from dmesh_renderer_tpu.parallel.sharding import (
    make_view_mesh, shard_view_batch,
)
import scenes

H = W = 16
N_TRIS = 16
B = 8


@pytest.fixture(scope="module")
def setup():
    soup = scenes.random_triangle_soup(N_TRIS, seed=2)
    mv, proj = scenes.ring_cameras(B)
    vdepth, fintense = scenes.soup_view_attrs(soup, B)
    mv_t = np.swapaxes(mv, 1, 2).copy()
    proj_t = np.swapaxes(proj, 1, 2).copy()
    scene = TriScene(
        jnp.asarray(soup["verts"]),
        jnp.asarray(soup["verts_color"]),
        jnp.asarray(soup["faces_opacity"]),
    )
    batch = ViewBatch(
        jnp.asarray(mv_t), jnp.asarray(proj_t),
        jnp.asarray(np.linalg.inv(mv_t)), jnp.asarray(np.linalg.inv(proj_t)),
        jnp.asarray(vdepth), jnp.asarray(fintense),
        jnp.full((B, 3, H, W), 0.5, jnp.float32),
    )
    return soup, scene, batch


def test_sharded_step_matches_single_device(setup):
    soup, scene, batch = setup
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"

    optimizer = optax.sgd(1e-2)
    faces = jnp.asarray(soup["faces"])
    bg = jnp.zeros(3, jnp.float32)

    # single-device reference
    step1 = make_train_step(optimizer, faces, bg, H, W, mesh=None)
    st1 = init_train_state(scene, optimizer)
    st1b, loss1 = step1(st1, batch)

    # 8-way view-sharded
    mesh = make_view_mesh(8)
    step8 = make_train_step(optimizer, faces, bg, H, W, mesh=mesh)
    st8 = init_train_state(scene, optimizer)
    batch8 = shard_view_batch(mesh, batch)
    st8b, loss8 = step8(st8, batch8)

    assert np.isclose(float(loss1), float(loss8), rtol=1e-6)
    for a, b in zip(st1b.scene, st8b.scene):
        np.testing.assert_allclose(np.array(a), np.array(b), rtol=2e-5,
                                   atol=1e-7)


def test_sharded_binned_step_matches_single_device(setup):
    """The PRODUCTION tile-binned path, forced, 8-way view-sharded under
    shard_map: must match the unsharded binned step (VERDICT round-1 item 2:
    the binned pipeline flattens (view, tile) so pjit alone cannot partition
    it; shard_map renders each device's views independently and pmeans the
    shared-parameter grads -- the collective analog of
    backward.cu:389-418's cross-view atomicAdd)."""
    soup, scene, batch = setup

    optimizer = optax.sgd(1e-2)
    faces = jnp.asarray(soup["faces"])
    bg = jnp.zeros(3, jnp.float32)

    step1 = make_train_step(optimizer, faces, bg, H, W, mesh=None,
                            force="binned")
    st1 = init_train_state(scene, optimizer)
    st1b, loss1 = step1(st1, batch)

    mesh = make_view_mesh(8)
    step8 = make_train_step(optimizer, faces, bg, H, W, mesh=mesh,
                            force="binned")
    st8 = init_train_state(scene, optimizer)
    st8b, loss8 = step8(st8, shard_view_batch(mesh, batch))

    assert np.isclose(float(loss1), float(loss8), rtol=1e-6)
    for a, b in zip(st1b.scene, st8b.scene):
        np.testing.assert_allclose(np.array(a), np.array(b), rtol=2e-5,
                                   atol=1e-7)


def test_training_reduces_loss(setup):
    soup, scene, batch = setup
    optimizer = optax.adam(5e-2)
    faces = jnp.asarray(soup["faces"])
    bg = jnp.zeros(3, jnp.float32)
    mesh = make_view_mesh(8)
    step = make_train_step(optimizer, faces, bg, H, W, mesh=mesh)
    st = init_train_state(scene, optimizer)
    batch = shard_view_batch(mesh, batch)

    _, loss0 = step(st, batch)
    for _ in range(10):
        st, loss = step(st, batch)
    assert float(loss) < float(loss0)


def test_train_loop_scan(setup):
    from dmesh_renderer_tpu.models.dmesh import make_train_loop

    soup, scene, batch = setup
    optimizer = optax.adam(5e-2)
    faces = jnp.asarray(soup["faces"])
    bg = jnp.zeros(3, jnp.float32)
    mesh = make_view_mesh(8)
    loop = make_train_loop(optimizer, faces, bg, H, W, n_steps=5, mesh=mesh)
    st = init_train_state(scene, optimizer)
    st, losses = loop(st, shard_view_batch(mesh, batch))
    losses = np.array(losses)
    assert losses.shape == (5,)
    assert losses[-1] < losses[0]


@pytest.mark.parametrize("seed", [0, 3])
def test_tet_sharded_step_matches_single_device(seed):
    """Tet-scene training (vcolor + fopacity) sharded 8-way under shard_map
    must match the single-device step: the masked loss psums numerator and
    denominator separately, so differing per-view active counts stay
    correct. seed=3 additionally pins jittered-ray parity: each device keys
    its views' jitter by GLOBAL view index (fold_in), so the sharded step
    draws exactly the unsharded batch's fields."""
    from dmesh_renderer_tpu.models.dmesh import (
        TetGeometry, TetScene, TetViewBatch, init_tet_train_state,
        make_tet_train_step,
    )
    from dmesh_renderer_tpu.utils.connectivity import (
        build_tet_connectivity, freudenthal_grid,
    )

    Ht = Wt = 16
    Bt = 8
    verts, tets = freudenthal_grid(2, jitter=0.05, seed=9)
    faces, face_tets, tet_faces = build_tet_connectivity(tets)
    rng = np.random.RandomState(1)
    geom = TetGeometry(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(tets),
        jnp.asarray(face_tets), jnp.asarray(tet_faces),
    )
    scene = TetScene(
        jnp.asarray(rng.rand(verts.shape[0], 3).astype(np.float32)),
        jnp.asarray(rng.uniform(0.3, 0.9, faces.shape[0]).astype(np.float32)),
    )
    mv, proj = scenes.ring_cameras(Bt, radius=3.0)
    mv_t = np.swapaxes(mv, 1, 2).copy()
    proj_t = np.swapaxes(proj, 1, 2).copy()
    batch = TetViewBatch(
        jnp.asarray(mv_t), jnp.asarray(proj_t),
        jnp.asarray(np.linalg.inv(mv_t)), jnp.asarray(np.linalg.inv(proj_t)),
        jnp.asarray(rng.uniform(0.5, 1.0,
                                (Bt, faces.shape[0])).astype(np.float32)),
        jnp.full((Bt, 3, Ht, Wt), 0.4, jnp.float32),
    )
    bg = jnp.zeros(3, jnp.float32)
    optimizer = optax.sgd(1e-2)

    step1 = make_tet_train_step(optimizer, geom, bg, Ht, Wt, mesh=None,
                                seed=seed)
    st1, loss1 = step1(init_tet_train_state(scene, optimizer), batch)

    mesh = make_view_mesh(8)
    step8 = make_tet_train_step(optimizer, geom, bg, Ht, Wt, mesh=mesh,
                                seed=seed)
    st8, loss8 = step8(init_tet_train_state(scene, optimizer),
                       shard_view_batch(mesh, batch))

    assert np.isfinite(float(loss1)) and float(loss1) > 0
    # per-shard partial sums reassociate the f32 reduction: 2e-5 budget
    assert np.isclose(float(loss1), float(loss8), rtol=2e-5)
    for a, b in zip(st1.scene, st8.scene):
        np.testing.assert_allclose(np.array(a), np.array(b), rtol=2e-5,
                                   atol=1e-7)

    # and training makes progress
    st = st8
    for _ in range(5):
        st, loss = step8(st, shard_view_batch(mesh, batch))
    assert float(loss) < float(loss8)


def test_tet_sharded_fallback_with_jitter_matches(monkeypatch):
    """The marching-backward FALLBACK (walks deeper than the replay log)
    regenerates rays; under sharding with jittered rays it must draw the
    same global-view jitter fields the forward used. Force the fallback by
    shrinking LOG_CAP and check sharded == single-device."""
    import dmesh_renderer_tpu.ops.tet as tet_mod
    from dmesh_renderer_tpu.models.dmesh import (
        TetGeometry, TetScene, TetViewBatch, init_tet_train_state,
        make_tet_train_step,
    )
    from dmesh_renderer_tpu.utils.connectivity import (
        build_tet_connectivity, freudenthal_grid,
    )

    monkeypatch.setattr(tet_mod, "LOG_CAP", 2)
    Ht = Wt = 16
    Bt = 8
    verts, tets = freudenthal_grid(2, jitter=0.05, seed=9)
    faces, face_tets, tet_faces = build_tet_connectivity(tets)
    rng = np.random.RandomState(1)
    geom = TetGeometry(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(tets),
        jnp.asarray(face_tets), jnp.asarray(tet_faces),
    )
    scene = TetScene(
        jnp.asarray(rng.rand(verts.shape[0], 3).astype(np.float32)),
        jnp.asarray(rng.uniform(0.3, 0.9,
                                faces.shape[0]).astype(np.float32)),
    )
    mv, proj = scenes.ring_cameras(Bt, radius=3.0)
    mv_t = np.swapaxes(mv, 1, 2).copy()
    proj_t = np.swapaxes(proj, 1, 2).copy()
    batch = TetViewBatch(
        jnp.asarray(mv_t), jnp.asarray(proj_t),
        jnp.asarray(np.linalg.inv(mv_t)), jnp.asarray(np.linalg.inv(proj_t)),
        jnp.asarray(rng.uniform(0.5, 1.0,
                                (Bt, faces.shape[0])).astype(np.float32)),
        jnp.full((Bt, 3, Ht, Wt), 0.4, jnp.float32),
    )
    bg = jnp.zeros(3, jnp.float32)
    opt = optax.sgd(1e-2)

    step1 = make_tet_train_step(opt, geom, bg, Ht, Wt, mesh=None, seed=3)
    st1, loss1 = step1(init_tet_train_state(scene, opt), batch)
    mesh = make_view_mesh(8)
    step8 = make_tet_train_step(opt, geom, bg, Ht, Wt, mesh=mesh, seed=3)
    st8, loss8 = step8(init_tet_train_state(scene, opt),
                       shard_view_batch(mesh, batch))
    assert np.isclose(float(loss1), float(loss8), rtol=2e-5)
    for a, b in zip(st1.scene, st8.scene):
        np.testing.assert_allclose(np.array(a), np.array(b), rtol=2e-5,
                                   atol=1e-7)


def test_tet_train_loop_scan():
    """Tet mirror of test_train_loop_scan (VERDICT r4 #9): the scan-based
    multi-step tet loop under the 8-way view mesh runs on device, reduces
    the loss, and its first scanned step matches one make_tet_train_step
    step exactly (same vg builder, so they cannot drift)."""
    from dmesh_renderer_tpu.models.dmesh import (
        TetGeometry, TetScene, TetViewBatch, init_tet_train_state,
        make_tet_train_loop, make_tet_train_step,
    )
    from dmesh_renderer_tpu.utils.connectivity import (
        build_tet_connectivity, freudenthal_grid,
    )

    Ht = Wt = 16
    Bt = 8
    verts, tets = freudenthal_grid(2, jitter=0.05, seed=9)
    faces, face_tets, tet_faces = build_tet_connectivity(tets)
    rng = np.random.RandomState(1)
    geom = TetGeometry(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(tets),
        jnp.asarray(face_tets), jnp.asarray(tet_faces),
    )
    scene = TetScene(
        jnp.asarray(rng.rand(verts.shape[0], 3).astype(np.float32)),
        jnp.asarray(rng.uniform(0.3, 0.9,
                                faces.shape[0]).astype(np.float32)),
    )
    mv, proj = scenes.ring_cameras(Bt, radius=3.0)
    mv_t = np.swapaxes(mv, 1, 2).copy()
    proj_t = np.swapaxes(proj, 1, 2).copy()
    batch = TetViewBatch(
        jnp.asarray(mv_t), jnp.asarray(proj_t),
        jnp.asarray(np.linalg.inv(mv_t)), jnp.asarray(np.linalg.inv(proj_t)),
        jnp.asarray(rng.uniform(0.5, 1.0,
                                (Bt, faces.shape[0])).astype(np.float32)),
        jnp.full((Bt, 3, Ht, Wt), 0.4, jnp.float32),
    )
    bg = jnp.zeros(3, jnp.float32)
    opt = optax.adam(5e-2)
    mesh = make_view_mesh(8)
    sh_batch = shard_view_batch(mesh, batch)

    loop = make_tet_train_loop(opt, geom, bg, Ht, Wt, n_steps=5, mesh=mesh)
    st, losses = loop(init_tet_train_state(scene, opt), sh_batch)
    losses = np.array(losses)
    assert losses.shape == (5,)
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]

    # step parity: scanned step 0 == one make_tet_train_step step
    step = make_tet_train_step(opt, geom, bg, Ht, Wt, mesh=mesh)
    _, loss_step = step(init_tet_train_state(scene, opt), sh_batch)
    np.testing.assert_allclose(losses[0], float(loss_step), rtol=1e-6)

    # unsharded loop agrees with the sharded one
    loop1 = make_tet_train_loop(opt, geom, bg, Ht, Wt, n_steps=5, mesh=None)
    _, losses1 = loop1(init_tet_train_state(scene, opt), batch)
    np.testing.assert_allclose(losses, np.array(losses1), rtol=2e-5)


def test_view_params_state_accepted_under_mesh(setup):
    """TrainState.view_params advertises '(verts_depth, faces_intense) if
    learned, or None'; the mesh path's in_shardings must accept BOTH (the
    `vs` prefix covers the empty None subtree and per-view arrays alike)
    and pass the params through the step unchanged."""
    from dmesh_renderer_tpu.models.dmesh import TrainState

    soup, scene, batch = setup
    optimizer = optax.sgd(1e-2)
    faces = jnp.asarray(soup["faces"])
    bg = jnp.zeros(3, jnp.float32)
    mesh = make_view_mesh(8)
    step8 = make_train_step(optimizer, faces, bg, H, W, mesh=mesh)

    vp = (batch.verts_depth, batch.faces_intense)
    st = TrainState(scene, vp, optimizer.init(scene))
    st2, loss = step8(st, shard_view_batch(mesh, batch))
    assert np.isfinite(float(loss))
    for a, b in zip(st2.view_params, vp):
        np.testing.assert_array_equal(np.array(a), np.array(b))


def test_overflow_flag_propagates_under_shard_map(setup):
    """A per-device key-capacity overflow must be observable OUTSIDE
    shard_map (VERDICT r2 W6): each device bins its own views with its own
    static capacity, so the aux flag is per-shard data; an any-reduce over
    the views axis surfaces it globally."""
    from jax import lax
    from jax.sharding import PartitionSpec as P

    from dmesh_renderer_tpu.ops.tri import render_tri_auto
    from dmesh_renderer_tpu.parallel.sharding import VIEW_AXIS

    soup, scene, batch = setup
    faces = jnp.asarray(soup["faces"])
    bg = jnp.zeros(3, jnp.float32)
    mesh = make_view_mesh(8)

    def make_render(kcap):
        def local(batch):
            _c, _d, (ovf, total) = render_tri_auto(
                scene.verts, faces, scene.verts_color, scene.faces_opacity,
                batch.mv_t, batch.proj_t, batch.inv_mv_t, batch.inv_proj_t,
                batch.verts_depth, batch.faces_intense, bg, H, W,
                force="binned", kcap=kcap, with_aux=True,
            )
            # any device overflowing = global overflow; keep the max
            # emitted count for capacity sizing
            ovf = lax.pmax(ovf.astype(jnp.int32), VIEW_AXIS)
            total = lax.pmax(total, VIEW_AXIS)
            return ovf, total

        return jax.jit(jax.shard_map(
            local, mesh=mesh, in_specs=(P(VIEW_AXIS),),
            out_specs=(P(), P()), check_vma=False,
        ))

    batch8 = shard_view_batch(mesh, batch)
    ovf, total = make_render(4096)(batch8)
    assert int(ovf) == 0
    total_true = int(total)
    assert total_true > 2

    ovf2, total2 = make_render(max(1, total_true // 2))(batch8)
    assert int(ovf2) == 1, "per-device overflow lost under shard_map"
    assert int(total2) == total_true


def test_shard_view_batch_rejects_uneven_views(setup):
    """B that does not divide the mesh must fail fast with the fix in the
    message (shard_map would otherwise error mid-compile, cryptically)."""
    _soup, _scene, batch = setup
    mesh = make_view_mesh(8)
    odd = jax.tree.map(lambda x: x[:6], batch)  # 6 views on 8 devices
    with pytest.raises(ValueError, match="divide"):
        shard_view_batch(mesh, odd)
