"""Per-pixel camera ray generation (pure JAX).

Reference: generateRaysCUDA, cuda_rasterizer/forward.cu:184-246 (tri renderer)
and cuda_renderer/forward.cu:90-169 (tet renderer, optional sub-pixel jitter
for stochastic anti-aliased gradients).

The ray origin is the camera position in world space -- the translation column
of inv(modelview) (forward.cu:204-206). The ray direction points at the pixel
center unprojected to the NDC z = -1 plane; note the reference drops the
homogeneous w after applying inv(proj) *without* dividing (forward.cu:223-224),
and we reproduce that.

The CUDA jitter (curand_uniform per pixel, forward.cu:120-123) becomes
counter-based threefry keys derived from the seed: parity with the reference
is statistical, not bitwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .geometry import pix2ndc, transform_point44

Array = jax.Array


def generate_rays(
    inv_mv_t: Array,
    inv_proj_t: Array,
    width: int,
    height: int,
    *,
    norm_eps_mode: str = "tri",
    jitter_seed: int | None = None,
    view_offset=None,
):
    """Build per-pixel rays for every view.

    inv_mv_t, inv_proj_t: [B, 4, 4] inverse matrices in the transposed
    convention (see geometry module docstring).

    norm_eps_mode: "tri" adds 1e-7 to the direction norm
    (cuda_rasterizer/forward.cu:229); "tet" clamps it at 1e-4
    (cuda_renderer/forward.cu:142-143).

    jitter_seed: if a positive int, sample points are jittered inside the
    pixel as ``pix - 0.5 + 0.5 * U[0,1)`` (cuda_renderer/forward.cu:120-123).
    Each view's jitter field is keyed by fold_in(seed, global view index),
    so view k's field is the same whether rendered alone or in any batch.

    view_offset: global index of view 0 of this call (int or traced int32,
    default 0). Under shard_map over views, pass
    ``lax.axis_index("views") * B_local`` so every device draws its own
    views' jitter fields -- identical to the unsharded batch draw.

    Returns (ray_o [B, H, W, 3], ray_d [B, H, W, 3]).
    """
    B = inv_mv_t.shape[0]

    # Camera position: translation column of the original inverse modelview,
    # which is row 3 of the transposed storage (forward.cu:204-206).
    ray_o = inv_mv_t[:, 3, :3]  # [B, 3]

    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    pix_y, pix_x = jnp.meshgrid(ys, xs, indexing="ij")  # [H, W]

    if jitter_seed is not None and jitter_seed > 0:
        key = jax.random.PRNGKey(jitter_seed)
        vidx = jnp.arange(B, dtype=jnp.int32)
        if view_offset is not None:
            vidx = vidx + jnp.asarray(view_offset, jnp.int32)
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(vidx)

        def draw(k):
            kx, ky = jax.random.split(k)
            return (
                jax.random.uniform(kx, (height, width), dtype=jnp.float32),
                jax.random.uniform(ky, (height, width), dtype=jnp.float32),
            )

        ux, uy = jax.vmap(draw)(keys)
        pixf_x = pix_x[None] - 0.5 + 0.5 * ux
        pixf_y = pix_y[None] - 0.5 + 0.5 * uy
    else:
        pixf_x = jnp.broadcast_to(pix_x + 0.5, (B, height, width))
        pixf_y = jnp.broadcast_to(pix_y + 0.5, (B, height, width))

    ndc_x = pix2ndc(pixf_x, width)
    ndc_y = pix2ndc(pixf_y, height)
    ndc = jnp.stack([ndc_x, ndc_y, jnp.full_like(ndc_x, -1.0)], axis=-1)

    # Unproject: drop w without dividing, exactly like the reference.
    pix_view = transform_point44(ndc, inv_proj_t[:, None, None, :, :])[..., :3]
    pix_world = transform_point44(pix_view, inv_mv_t[:, None, None, :, :])[..., :3]

    d = pix_world - ray_o[:, None, None, :]
    norm = jnp.sqrt(jnp.sum(d * d, axis=-1))
    if norm_eps_mode == "tri":
        norm = norm + 1e-7
    elif norm_eps_mode == "tet":
        norm = jnp.maximum(norm, 1e-4)
    else:
        raise ValueError(f"unknown norm_eps_mode: {norm_eps_mode}")
    ray_d = d / norm[..., None]

    ray_o_full = jnp.broadcast_to(ray_o[:, None, None, :], ray_d.shape)
    return ray_o_full, ray_d
