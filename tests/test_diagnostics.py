"""Diagnostics / observability subsystem tests."""

import numpy as np
import jax.numpy as jnp

from dmesh_renderer_tpu.utils.diagnostics import (
    StageTimer, tet_health, tri_render_stats,
)
import scenes


def test_tri_render_stats():
    soup = scenes.random_triangle_soup(30, seed=9)
    mv, proj = scenes.ring_cameras(2)
    mv_t = jnp.asarray(np.swapaxes(mv, 1, 2))
    proj_t = jnp.asarray(np.swapaxes(proj, 1, 2))
    stats = tri_render_stats(
        jnp.asarray(soup["verts"]), jnp.asarray(soup["faces"]),
        mv_t, proj_t, 64, 64,
    )
    assert stats["num_rendered"] > 0
    assert not stats["overflow"]
    assert 0.0 <= stats["culled_fraction"] <= 1.0
    assert stats["tile_count_max"] >= stats["tile_count_mean"] > 0


def test_tet_health():
    active = np.zeros((2, 8, 8), bool)
    active[0, :4] = True
    h = tet_health(active)
    assert np.isclose(h["active_fraction_per_view"][0], 0.5)
    assert np.isclose(h["active_fraction_per_view"][1], 0.0)
    assert h["inactive_pixels"] == 96


def test_stage_timer():
    t = StageTimer()
    with t.stage("a") as box:
        box["out"] = jnp.sum(jnp.ones((64, 64)))
    with t.stage("b"):
        pass
    assert set(t.times) == {"a", "b"}
    assert "total" in t.summary()
