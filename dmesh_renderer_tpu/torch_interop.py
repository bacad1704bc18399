"""Torch autograd bridge: the reference's drop-in training contract.

The reference exposes the renderers as ``torch.autograd.Function``s
(/root/reference/dmesh_renderer/__init__.py:45-170, :277-424): DMesh's
PyTorch optimization loop calls ``loss.backward()`` and gradients land in
torch tensors. The JAX core here is a ``jax.custom_vjp``; this module wraps
it in ``torch.autograd.Function``s so the same torch loop trains through the
alias package unchanged: torch tensors in, torch tensors out, ``.backward()``
routes cotangents through the stored JAX VJP.

Design: the forward runs ``jax.vjp`` over a ``jax.jit``-wrapped render
closure (vjp-of-jit keeps both directions compiled and cached by shape) and
stashes the vjp function on the autograd ctx -- the JAX residuals play the
role of the reference's four opaque saved buffers (__init__.py:97-110).

Boundary crossing: when torch (CPU in this deployment) and JAX's default
backend share an address space (``jax.default_backend() == "cpu"``), tensors
cross via **dlpack zero-copy** in both directions -- the reference's torch
loop likewise never copies (everything stays on one CUDA device,
/root/reference/dmesh_renderer/__init__.py:45-170). Otherwise (JAX on a
remote/accelerator backend) the NumPy host round-trip is kept as the
fallback; device round-trips honor the input tensor's device on the grad
path. Zero-copy caveat (same contract in-place torch code always has):
inputs share storage with the saved VJP residuals until ``backward`` runs,
so mutating an input tensor in place between ``forward`` and a (retained)
``backward`` reads the mutated values -- the standard torch training order
(forward, backward, optimizer.step) is unaffected.

Gradient surface parity:
- tri: verts, verts_color, faces_opacity (summed over views) and
  verts_depth, faces_intense (per-view), exactly the reference's
  ``_RenderTri.backward`` routing (__init__.py:156-170).
- tet: verts_color and faces_opacity ONLY (__init__.py:402-424).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


def is_torch_tensor(x) -> bool:
    return type(x).__module__.split(".")[0] == "torch"


@functools.lru_cache(maxsize=1)
def _zero_copy_ok() -> bool:
    """dlpack zero-copy is valid only when torch (CPU) and JAX's default
    backend share one address space."""
    return jax.default_backend() == "cpu"


def _to_jax(x, dtype=None):
    if is_torch_tensor(x):
        x = x.detach()
        if x.device.type == "cpu" and _zero_copy_ok():
            try:
                arr = jnp.from_dlpack(x.contiguous())
            except Exception:  # exotic dtype/layout: host copy fallback
                arr = jnp.asarray(x.numpy())
        else:
            arr = jnp.asarray(x.cpu().numpy())
    else:
        arr = jnp.asarray(x)
    if dtype is not None and arr.dtype != dtype:
        arr = arr.astype(dtype)
    return arr


def _to_torch(a, like):
    import torch

    if _zero_copy_ok() and isinstance(a, jax.Array):
        # Zero-copy handoff: the capsule keeps the XLA buffer alive and we
        # drop our reference, so torch owns it exclusively from here on
        # (jit outputs are freshly allocated -- never aliased with inputs
        # or cached constants).
        try:
            t = torch.utils.dlpack.from_dlpack(a)
        except Exception:
            t = torch.from_numpy(np.array(a))
    else:
        # np.array copies: jax buffers surface as read-only numpy views,
        # and torch.from_numpy on those is UB if the tensor is ever
        # written.
        t = torch.from_numpy(np.array(a))
    if like is not None and like.device.type != "cpu":
        t = t.to(like.device)
    return t


@functools.lru_cache(maxsize=None)
def _tri_jit(height: int, width: int, kcap, run_cap, with_aux: bool):
    from .ops.tri import render_tri_auto
    from .validation import check_tri_inputs

    @jax.jit
    def f(verts, faces, vcolor, fopacity, mv_t, proj_t, vdepth, fintense, bg):
        check_tri_inputs(verts, faces, vcolor, fopacity, mv_t, proj_t,
                         vdepth, fintense, bg)
        inv_mv_t = jnp.linalg.inv(mv_t)
        inv_proj_t = jnp.linalg.inv(proj_t)
        out = render_tri_auto(
            verts, faces, vcolor, fopacity, mv_t, proj_t, inv_mv_t,
            inv_proj_t, vdepth, fintense, bg, height, width,
            kcap=kcap, run_cap=run_cap, with_aux=with_aux)
        if with_aux:
            color, depth, (overflow, num_rendered) = out
            return color, depth, overflow, num_rendered
        return out

    return f


@functools.lru_cache(maxsize=None)
def _tet_jit(height: int, width: int, seed: int, kcap, with_aux: bool):
    from .ops.tet import render_tet_core
    from .validation import check_tet_inputs

    @jax.jit
    def f(verts, faces, vcolor, fopacity, mv_t, proj_t, fintense,
          tets, face_tets, tet_faces, bg):
        check_tet_inputs(verts, faces, vcolor, fopacity, mv_t, proj_t,
                         fintense, tets, face_tets, tet_faces, bg)
        inv_mv_t = jnp.linalg.inv(mv_t)
        inv_proj_t = jnp.linalg.inv(proj_t)
        out = render_tet_core(
            verts, faces, vcolor, fopacity, mv_t, proj_t, inv_mv_t,
            inv_proj_t, fintense, tets, face_tets, tet_faces, bg,
            height, width, seed, kcap=kcap, with_aux=with_aux)
        if with_aux:
            color, depth, active, (overflow, num_rendered) = out
            return color, depth, active, overflow, num_rendered
        return out

    return f


@functools.lru_cache(maxsize=1)
def _functions():
    """Build the autograd.Function classes lazily (torch import deferred)."""
    import torch

    class _RenderTriTorch(torch.autograd.Function):
        """Reference: _RenderTri (dmesh_renderer/__init__.py:45-170)."""

        @staticmethod
        def forward(ctx, verts, verts_color, faces_opacity, verts_depth,
                    faces_intense, faces, mv_t, proj_t, bg,
                    height, width, kcap, run_cap, with_aux):
            f = _tri_jit(height, width, kcap, run_cap, with_aux)
            faces_j = _to_jax(faces, jnp.int32)
            mv_j = _to_jax(mv_t, jnp.float32)
            proj_j = _to_jax(proj_t, jnp.float32)
            bg_j = _to_jax(bg, jnp.float32)

            def g(v, vc, fo, vd, fi):
                return f(v, faces_j, vc, fo, mv_j, proj_j, vd, fi, bg_j)

            outs, vjp_fn = jax.vjp(
                g,
                _to_jax(verts, jnp.float32),
                _to_jax(verts_color, jnp.float32),
                _to_jax(faces_opacity, jnp.float32),
                _to_jax(verts_depth, jnp.float32),
                _to_jax(faces_intense, jnp.float32),
            )
            ctx.vjp_fn = vjp_fn
            ctx.with_aux = with_aux
            ctx.like = verts if is_torch_tensor(verts) else None
            color, depth = outs[0], outs[1]
            torch_outs = [_to_torch(color, ctx.like),
                          _to_torch(depth, ctx.like)]
            if with_aux:
                overflow, num_rendered = outs[2], outs[3]
                ctx.aux_shapes = (tuple(overflow.shape),
                                  tuple(num_rendered.shape))
                t_of = _to_torch(np.asarray(overflow), ctx.like)
                t_nr = _to_torch(np.asarray(num_rendered), ctx.like)
                ctx.mark_non_differentiable(t_of, t_nr)
                torch_outs += [t_of, t_nr]
            return tuple(torch_outs)

        @staticmethod
        def backward(ctx, g_color, g_depth, *g_aux):
            cots = [_to_jax(g_color, jnp.float32),
                    _to_jax(g_depth, jnp.float32)]
            if ctx.with_aux:
                # Bool / int primal outputs take float0 cotangents in JAX.
                cots += [np.zeros(s, dtype=jax.dtypes.float0)
                         for s in ctx.aux_shapes]
            gv, gvc, gfo, gvd, gfi = ctx.vjp_fn(tuple(cots))
            like = ctx.like
            return (_to_torch(gv, like), _to_torch(gvc, like),
                    _to_torch(gfo, like), _to_torch(gvd, like),
                    _to_torch(gfi, like),
                    None, None, None, None, None, None, None, None, None)

    class _RenderTetTorch(torch.autograd.Function):
        """Reference: _RenderTet (dmesh_renderer/__init__.py:277-424)."""

        @staticmethod
        def forward(ctx, verts_color, faces_opacity, verts, faces, mv_t,
                    proj_t, faces_intense, tets, face_tets, tet_faces, bg,
                    height, width, seed, kcap, with_aux):
            f = _tet_jit(height, width, seed, kcap, with_aux)
            statics = (
                _to_jax(verts, jnp.float32), _to_jax(faces, jnp.int32),
                _to_jax(mv_t, jnp.float32), _to_jax(proj_t, jnp.float32),
                _to_jax(faces_intense, jnp.float32),
                _to_jax(tets, jnp.int32), _to_jax(face_tets, jnp.int32),
                _to_jax(tet_faces, jnp.int32), _to_jax(bg, jnp.float32),
            )

            def g(vc, fo):
                (v, fc, mv, pj, fi, tt, ft, tf, b) = statics
                return f(v, fc, vc, fo, mv, pj, fi, tt, ft, tf, b)

            outs, vjp_fn = jax.vjp(
                g,
                _to_jax(verts_color, jnp.float32),
                _to_jax(faces_opacity, jnp.float32),
            )
            ctx.vjp_fn = vjp_fn
            ctx.with_aux = with_aux
            ctx.like = (verts_color if is_torch_tensor(verts_color)
                        else None)
            ctx.nondiff_shapes = tuple(tuple(o.shape) for o in outs[2:])
            color, depth = outs[0], outs[1]
            torch_nondiff = [_to_torch(np.asarray(o), ctx.like)
                             for o in outs[2:]]
            ctx.mark_non_differentiable(*torch_nondiff)
            return tuple([_to_torch(color, ctx.like),
                          _to_torch(depth, ctx.like)] + torch_nondiff)

        @staticmethod
        def backward(ctx, g_color, g_depth, *_g_nondiff):
            # Bool / int primal outputs take float0 cotangents in JAX.
            cots = [_to_jax(g_color, jnp.float32),
                    _to_jax(g_depth, jnp.float32)]
            cots += [np.zeros(s, dtype=jax.dtypes.float0)
                     for s in ctx.nondiff_shapes]
            gvc, gfo = ctx.vjp_fn(tuple(cots))
            like = ctx.like
            return (_to_torch(gvc, like), _to_torch(gfo, like),
                    None, None, None, None, None, None, None, None, None,
                    None, None, None, None, None)

    return _RenderTriTorch, _RenderTetTorch


def render_tri_torch(verts, faces, verts_color, faces_opacity, mv_t, proj_t,
                     verts_depth, faces_intense, render_settings,
                     return_aux=False):
    """Torch-autograd tri renderer; signature mirrors ``api.render_tri``
    (matrices already transposed). Returns torch (color, depth)."""
    tri_fn, _ = _functions()
    kcap = getattr(render_settings, "key_capacity", None)
    run_cap = getattr(render_settings, "run_capacity", None)
    out = tri_fn.apply(
        verts, verts_color, faces_opacity, verts_depth, faces_intense,
        faces, mv_t, proj_t, render_settings.bg,
        int(render_settings.image_height), int(render_settings.image_width),
        None if kcap is None else int(kcap),
        None if run_cap is None else int(run_cap),
        bool(return_aux))
    if return_aux:
        color, depth, overflow, num_rendered = out
        return color, depth, (overflow, num_rendered)
    return out


def render_tet_torch(verts, faces, verts_color, faces_opacity, mv_t, proj_t,
                     verts_depth, faces_intense, tets, face_tets, tet_faces,
                     render_settings, return_aux=False):
    """Torch-autograd tet renderer; ``verts_depth`` accepted-unused
    (reference __init__.py:448-450). Returns torch (color, depth, active)."""
    del verts_depth  # API parity: accepted but never read (reference quirk)
    _, tet_fn = _functions()
    kcap = getattr(render_settings, "key_capacity", None)
    out = tet_fn.apply(
        verts_color, faces_opacity, verts, faces, mv_t, proj_t,
        faces_intense, tets, face_tets, tet_faces, render_settings.bg,
        int(render_settings.image_height), int(render_settings.image_width),
        int(render_settings.ray_random_seed),
        None if kcap is None else int(kcap), bool(return_aux))
    if return_aux:
        color, depth, active, overflow, num_rendered = out
        return color, depth, active, (overflow, num_rendered)
    return out
