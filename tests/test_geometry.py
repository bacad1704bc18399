"""Unit tests for the geometry core against hand-computed cases and a NumPy
re-derivation of the reference semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dmesh_renderer_tpu.ops import geometry as G


def test_ndc_pix_roundtrip():
    v = jnp.linspace(-1, 1, 11)
    assert np.allclose(G.pix2ndc(G.ndc2pix(v, 640), 640), v, atol=1e-6)
    # reference formula spot checks (auxiliary.h:33-41)
    assert np.isclose(float(G.ndc2pix(jnp.float32(-1.0), 100)), -0.5)
    assert np.isclose(float(G.ndc2pix(jnp.float32(1.0), 100)), 99.5)


def test_clamp_w():
    w = jnp.array([-1.0, -5e-5, -0.0, 0.0, 5e-5, 1.0])
    out = np.array(G.clamp_w(w))
    assert np.allclose(out, [-1.0, -1e-4, 1e-4, 1e-4, 1e-4, 1.0])


def test_transform_matches_matmul():
    rng = np.random.RandomState(0)
    M = rng.randn(4, 4).astype(np.float32)
    p = rng.randn(5, 3).astype(np.float32)
    # transposed storage convention
    got = G.transform_point44(jnp.asarray(p), jnp.asarray(M.T))
    want = (M @ np.concatenate([p, np.ones((5, 1), np.float32)], -1).T).T
    assert np.allclose(got, want, atol=1e-5)


def test_in_tri_basic():
    # CCW triangle in pixel space
    p1 = jnp.array([0.0, 0.0])
    p2 = jnp.array([10.0, 0.0])
    p3 = jnp.array([0.0, 10.0])
    inside = jnp.array([2.0, 2.0])
    outside = jnp.array([8.0, 8.0])
    assert bool(G.in_tri(inside, p1, p2, p3))
    assert not bool(G.in_tri(outside, p1, p2, p3))
    # winding invariance (the reference swaps to CCW internally)
    assert bool(G.in_tri(inside, p1, p3, p2))
    # degenerate triangle covers nothing
    assert not bool(G.in_tri(inside, p1, p1, p2))


def test_in_tri_top_left_rule():
    # Two triangles sharing a vertical edge x=10: a point exactly on the
    # shared edge must be covered by exactly one of them.
    a = (jnp.array([0.0, 0.0]), jnp.array([10.0, 0.0]), jnp.array([10.0, 10.0]))
    b = (jnp.array([10.0, 0.0]), jnp.array([20.0, 0.0]), jnp.array([10.0, 10.0]))
    pt = jnp.array([10.0, 5.0])
    in_a = bool(G.in_tri(pt, *a))
    in_b = bool(G.in_tri(pt, *b))
    assert in_a != in_b


def test_ray_tri_intersection_values():
    ray_o = jnp.array([0.0, 0.0, -5.0])
    ray_d = jnp.array([0.0, 0.0, 1.0])
    p0 = jnp.array([-1.0, -1.0, 0.0])
    p1 = jnp.array([3.0, -1.0, 0.0])
    p2 = jnp.array([-1.0, 3.0, 0.0])
    tuv, ok = G.ray_tri_intersection(ray_o, ray_d, p0, p1, p2)
    assert bool(ok)
    t, u, v = np.array(tuv)
    assert np.isclose(t, 5.0, atol=1e-5)
    # intersection at (0,0,0): p = p0 + u*(p1-p0) + v*(p2-p0) => u = v = 0.25
    assert np.isclose(u, 0.25, atol=1e-5)
    assert np.isclose(v, 0.25, atol=1e-5)
    assert bool(G.strict_hit(tuv, ok))

    # parallel ray is degenerate
    ray_d2 = jnp.array([1.0, 0.0, 0.0])
    _, ok2 = G.ray_tri_intersection(ray_o, ray_d2, p0, p1, p2)
    assert not bool(ok2)


def test_ray_tri_grad_matches_reference_formula():
    """ray_tri_uv_grads_reference must match a NumPy re-derivation of the
    reference's analytic formulas (ray_tri_intersection_grad,
    auxiliary.h:288-333) -- including the quirk that the reference's "dv" is
    really dt (its v2 is the t numerator)."""
    rng = np.random.RandomState(3)
    ray_o = jnp.asarray(rng.randn(3).astype(np.float32))
    d = rng.randn(3).astype(np.float32)
    ray_d = jnp.asarray(d / np.linalg.norm(d))
    ps = [jnp.asarray(rng.randn(3).astype(np.float32)) for _ in range(3)]

    ju0, ju1, ju2, jv0, jv1, jv2 = G.ray_tri_uv_grads_reference(
        ray_o, ray_d, *ps
    )
    ju = [ju0, ju1, ju2]
    jv = [jv0, jv1, jv2]

    # The du formulas agree with true autodiff of u (they are the honest
    # quotient rule); check that as well.
    def u_of(p0, p1, p2):
        tuv, _ = G.ray_tri_intersection(ray_o, ray_d, p0, p1, p2)
        return tuv[1]

    ju_ad = jax.grad(u_of, argnums=(0, 1, 2))(*ps)
    for a, b in zip(ju, ju_ad):
        assert np.allclose(a, b, rtol=1e-3, atol=1e-5)

    # NumPy re-derivation of the reference formulas
    p0, p1, p2 = [np.array(p, np.float64) for p in ps]
    ro, rd = np.array(ray_o, np.float64), np.array(ray_d, np.float64)
    T = ro - p0
    E1 = p1 - p0
    E2 = p2 - p0
    denom_sqrt = np.dot(np.cross(rd, E2), E1)
    denom_inv = 1.0 / denom_sqrt**2
    v0 = np.dot(np.cross(rd, E2), T)
    v1 = denom_sqrt
    v2 = np.dot(np.cross(T, E1), E2)
    du_dE1 = -np.cross(rd, E2) * v0 * denom_inv
    du_dE2 = (np.cross(T, rd) * v1 - v0 * np.cross(E1, rd)) * denom_inv
    du_dT = np.cross(rd, E2) * v1 * denom_inv
    dv_dE1 = (np.cross(E2, T) * v1 - v2 * np.cross(rd, E2)) * denom_inv
    dv_dE2 = (np.cross(T, E1) * v1 - v2 * np.cross(E1, rd)) * denom_inv
    dv_dT = np.cross(E1, E2) * v1 * denom_inv
    du_dp0 = -du_dE1 - du_dE2 - du_dT
    dv_dp0 = -dv_dE1 - dv_dE2 - dv_dT

    assert np.allclose(ju[0], du_dp0, rtol=1e-3, atol=1e-5)
    assert np.allclose(ju[1], du_dE1, rtol=1e-3, atol=1e-5)
    assert np.allclose(ju[2], du_dE2, rtol=1e-3, atol=1e-5)
    assert np.allclose(jv[0], dv_dp0, rtol=1e-3, atol=1e-5)
    assert np.allclose(jv[1], dv_dE1, rtol=1e-3, atol=1e-5)
    assert np.allclose(jv[2], dv_dE2, rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize(
    "u,v,expect_uc,expect_vc,expect_code",
    [
        (0.2, 0.3, 0.2, 0.3, 0),
        (-0.5, -0.5, 0.0, 0.0, 1),
        (1.5, -0.2, 1.0, 0.0, 2),
        (2.0, 0.5, 1.0, 0.0, 2),     # v <= u - 1 branch
        (-0.2, 1.5, 0.0, 1.0, 3),
        (0.5, 2.0, 0.0, 1.0, 3),     # v >= u + 1 branch
        (-0.3, 0.5, 0.0, 0.5, 4),
        (0.5, -0.3, 0.5, 0.0, 5),
        (0.7, 0.8, 0.45, 0.55, 6),   # diagonal projection
    ],
)
def test_clamp_bary_uv(u, v, expect_uc, expect_vc, expect_code):
    uc, vc, code = G.clamp_bary_uv(jnp.float32(u), jnp.float32(v))
    assert np.isclose(float(uc), expect_uc, atol=1e-6)
    assert np.isclose(float(vc), expect_vc, atol=1e-6)
    assert int(code) == expect_code


def test_clamp_bary_uv_grad_codes():
    """Autodiff through clamp matches clamp_bary_uv_grad (auxiliary.h:374-400)."""
    cases = {
        (0.2, 0.3): np.array([[1.0, 0.0], [0.0, 1.0]]),
        (-0.5, -0.5): np.zeros((2, 2)),
        (1.5, -0.2): np.zeros((2, 2)),
        (-0.3, 0.5): np.array([[0.0, 0.0], [0.0, 1.0]]),
        (0.5, -0.3): np.array([[1.0, 0.0], [0.0, 0.0]]),
        (0.7, 0.8): np.array([[0.5, -0.5], [-0.5, 0.5]]),
    }
    for (u, v), want in cases.items():
        jac = jax.jacobian(
            lambda uv: jnp.stack(G.clamp_bary_uv(uv[0], uv[1])[:2]),
        )(jnp.array([u, v], jnp.float32))
        assert np.allclose(jac, want), (u, v, np.array(jac), want)


def test_face_outward_normal():
    p0 = jnp.array([0.0, 0.0, 0.0])
    p1 = jnp.array([1.0, 0.0, 0.0])
    p2 = jnp.array([0.0, 1.0, 0.0])
    center_above = jnp.array([0.25, 0.25, 0.5])
    n = np.array(G.face_outward_normal(p0, p1, p2, center_above))
    assert np.allclose(n, [0, 0, -1], atol=1e-6)  # away from center
    center_below = jnp.array([0.25, 0.25, -0.5])
    n2 = np.array(G.face_outward_normal(p0, p1, p2, center_below))
    assert np.allclose(n2, [0, 0, 1], atol=1e-6)
