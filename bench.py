"""Benchmark harness. Prints ONE JSON line for the driver.

Headline metric (BASELINE.json): fwd+bwd ms/frame for the tri renderer at
100k triangles, 800x800 -- the tile-binned Pallas path. Runs on the default
JAX backend (the real TPU under the driver).

Timing note: on the remote (axon) backend, block_until_ready returns before
remote execution completes, so each measured step reduces its outputs to a
scalar inside jit and pulls it to the host -- that round trip is included,
making these numbers conservative.

No published reference numbers exist (BASELINE.md: "published": {}), so
vs_baseline is reported against this project's round-1 recorded value
(BENCH_HISTORY below); 1.0 on the round that sets the record.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# ms/frame fwd+bwd recorded at the end of round 1 (for vs_baseline tracking)
# Metric definition: full backward (all 5 gradients, as the reference
# always computes). NOTE (ADVICE r4): the driver artifacts differ slightly
# from the in-session numbers because artifact runs share the chip --
# BENCH_r01 parsed 399.0 / r02 99.5 / r03 62.0 vs in-session 402.6 / 98.7 /
# 61.0. vs_baseline uses the round-1 in-session record; cross-round ratios
# should quote the BENCH_r0N artifacts.
BENCH_HISTORY_MS = 402.6  # round 1, TPU v5e single chip


def _build(n_tris, n_views, height, width, seed=0):
    from __graft_entry__ import _scene

    verts, faces, vcolor, fopacity, mv, proj, vdepth, fintense = _scene(
        n_tris, n_views, height, width, seed
    )
    mv_t = np.swapaxes(mv, 1, 2).copy()
    proj_t = np.swapaxes(proj, 1, 2).copy()
    return (verts, faces, vcolor, fopacity, mv_t, proj_t,
            np.linalg.inv(mv_t), np.linalg.inv(proj_t), vdepth, fintense)


def bench_tri_scaled(n_tris=100_000, height=800, width=800, n_views=1,
                     iters=3, kcap=None, chain=16):
    # kcap=None: measured from the scene by recommended_key_capacity
    # (F-scale count pass, bucket-rounded) -- no hand tuning; the scene
    # emits 770,003 exact-coverage pairs. Every slot-scale stage (emit
    # fills, sort, attr gather, record scatter) is row-count-bound at the
    # aligned capacity, so the bench uses a tight margin: the count pass
    # is exact for a static scene, so this cannot overflow -- the same
    # exact sizing the CUDA reference gets from its device-to-host
    # readback (rasterizer_impl.cu:287-299). Users with evolving scenes
    # size theirs with the default 25% headroom (or watch return_aux).
    """Fwd+bwd (all five gradients, like the reference backward always
    computes, render.cu:166-171) ms per frame.

    ``chain`` fwd+bwd steps run inside ONE jit via lax.scan, each feeding
    the previous step's gradient into the next step's inputs (so XLA cannot
    batch or elide them) -- this amortizes the fixed per-dispatch host
    round-trip of the remote TPU runtime (~28 ms) the way a real training
    loop does (models/dmesh.make_train_loop). The reported number is
    ms per fwd+bwd frame; the residual dispatch share is ~28/chain ms of
    it (chain=16 leaves < 2 ms -- rounds 1-3 ran chain=4, which left ~7 ms
    of dispatch in every headline, so cross-round ratios slightly
    UNDERSTATE the true compute gains).
    """
    import jax
    import jax.numpy as jnp

    from dmesh_renderer_tpu.ops.binning import (
        recommended_key_capacity, recommended_run_capacity,
    )
    from dmesh_renderer_tpu.ops.tri_binned import render_tri_binned

    (verts, faces, vcolor, fopacity, mv_t, proj_t, inv_mv_t, inv_proj_t,
     vdepth, fintense) = _build(n_tris, n_views, height, width)
    if kcap is None:
        kcap = recommended_key_capacity(verts, faces, mv_t, proj_t,
                                        height, width,
                                        margin=1.03125, bucket=8192)
    # run-table capacity measured the same way (346k true rows vs the
    # 400k heuristic at this scene; run-scale row ops are capacity-priced)
    rcap = recommended_run_capacity(verts, faces, mv_t, proj_t,
                                    height, width,
                                    margin=1.03125, bucket=8192)

    base = tuple(map(jnp.asarray, (
        verts, faces, vcolor, fopacity, mv_t, proj_t, inv_mv_t, inv_proj_t,
        vdepth, fintense,
    )))
    bg = jnp.asarray(np.array([0.1, 0.1, 0.1], np.float32))

    def loss(verts, vcolor, fo, vdepth, fint):
        c, d = render_tri_binned(
            verts, base[1], vcolor, fo, base[4], base[5], base[6],
            base[7], vdepth, fint, bg, height, width, kcap, False, rcap,
        )
        return jnp.sum(c) + jnp.sum(d)

    grad_fn = jax.grad(loss, argnums=(0, 1, 2, 3, 4))

    @jax.jit
    def gsteps(fo):
        def body(fo, _):
            gs = grad_fn(base[0], base[2], fo, base[8], base[9])
            # feed the opacity gradient back in: a true sequential chain
            fo = fo - 1e-6 * gs[2]
            return fo, sum(jnp.sum(g) for g in gs)
        fo, acc = jax.lax.scan(body, fo, None, length=chain)
        return jnp.sum(acc)

    float(gsteps(base[3]))  # warmup / compile

    times = []
    for it in range(iters):
        fo = base[3] * (1.0 - 1e-3 * (it + 1))  # vary inputs: no result reuse
        t0 = time.perf_counter()
        float(gsteps(fo))
        times.append(time.perf_counter() - t0)
    return min(times) * 1000.0 / (n_views * chain)


def bench_tet_scaled(n_grid=20, height=800, width=800, n_views=1, iters=3,
                     chain=8):
    """Tet renderer fwd+bwd ms/frame at north-star scale: a Freudenthal
    tessellation with ~98k faces (48k tets) rendered at 800x800.

    Gradients for verts_color + faces_opacity (the only gradients the tet
    renderer produces, render.h:84-111). ``chain`` as in bench_tri_scaled:
    rounds 1-3 ran chain=2, leaving ~14 ms of pure per-dispatch host
    round-trip inside every historical tet headline; chain=8 leaves
    ~3.5 ms."""
    import jax
    import jax.numpy as jnp

    from dmesh_renderer_tpu.ops.binning import recommended_key_capacity
    from dmesh_renderer_tpu.ops.tet import render_tet_core
    from dmesh_renderer_tpu.runtime.native import build_tet_connectivity
    from dmesh_renderer_tpu.utils.connectivity import freudenthal_grid

    verts, tets = freudenthal_grid(n_grid, jitter=0.15, seed=2)
    faces, face_tets, tet_faces = build_tet_connectivity(tets)
    rng = np.random.RandomState(0)
    vcolor = rng.rand(verts.shape[0], 3).astype(np.float32)
    fopacity = rng.uniform(0.3, 0.9, faces.shape[0]).astype(np.float32)
    fintense = rng.uniform(0.5, 1.0,
                           (n_views, faces.shape[0])).astype(np.float32)

    # ring cameras (reuse the scene helper's camera stack; transposed)
    mv, proj = _build(1, n_views, height, width)[4:6]

    # first-hit bins by bbox rects (exact=False); measured exactly for the
    # static scene, tight margin (cannot overflow; see bench_tri_scaled)
    kcap = recommended_key_capacity(verts, faces, mv, proj, height, width,
                                    exact=False, margin=1.03125,
                                    bucket=8192)

    args = tuple(map(jnp.asarray, (
        verts, faces, vcolor, fopacity, mv, proj,
        np.linalg.inv(mv), np.linalg.inv(proj), fintense,
        tets, face_tets, tet_faces,
    )))
    bg = jnp.asarray(np.array([0.1, 0.1, 0.1], np.float32))

    # max_steps == the march-log depth: the replay backward covers every
    # walk statically (scene p100 = 17 steps), so the marching-backward
    # fallback branch is not even compiled -- halves the tet compile time
    from dmesh_renderer_tpu.ops.tet import LOG_CAP

    def loss(vcolor, fo):
        c, d, _active = render_tet_core(
            args[0], args[1], vcolor, fo, args[4], args[5], args[6],
            args[7], args[8], args[9], args[10], args[11], bg,
            height, width, 0, max_steps=LOG_CAP, kcap=kcap,
        )
        return jnp.sum(c) + jnp.sum(d)

    grad_fn = jax.grad(loss, argnums=(0, 1))

    @jax.jit
    def gsteps(fo):
        def body(fo, _):
            gs = grad_fn(args[2], fo)
            fo = fo - 1e-6 * gs[1]
            return fo, sum(jnp.sum(g) for g in gs)
        fo, acc = jax.lax.scan(body, fo, None, length=chain)
        return jnp.sum(acc)

    float(gsteps(args[3]))  # warmup / compile

    times = []
    for it in range(iters):
        fo = args[3] * (1.0 - 1e-3 * (it + 1))
        t0 = time.perf_counter()
        float(gsteps(fo))
        times.append(time.perf_counter() - t0)
    return min(times) * 1000.0 / (n_views * chain), faces.shape[0]


def bench_sharded_smoke(n_tris=512, height=128, width=128):
    """Run the sharded (shard_map) binned train step on a 1-device mesh of
    THIS backend (the real TPU under the driver) and check it matches the
    unsharded step. The shard_map path otherwise only ever compiles on
    virtual CPU devices (tests, driver dryrun); this catches
    Mosaic/collective-lowering surprises on the TPU backend before
    multi-chip hardware exists. Returns max |sharded - unsharded| over the
    updated scene params."""
    import jax
    import jax.numpy as jnp
    import optax

    from dmesh_renderer_tpu.models.dmesh import (
        TriScene, ViewBatch, init_train_state, make_train_step,
    )
    from dmesh_renderer_tpu.parallel.sharding import (
        make_view_mesh, shard_view_batch,
    )

    (verts, faces, vcolor, fopacity, mv_t, proj_t, inv_mv_t, inv_proj_t,
     vdepth, fintense) = _build(n_tris, 1, height, width, seed=3)
    scene = TriScene(jnp.asarray(verts), jnp.asarray(vcolor),
                     jnp.asarray(fopacity))
    batch = ViewBatch(
        jnp.asarray(mv_t), jnp.asarray(proj_t), jnp.asarray(inv_mv_t),
        jnp.asarray(inv_proj_t), jnp.asarray(vdepth), jnp.asarray(fintense),
        jnp.full((1, 3, height, width), 0.5, jnp.float32),
    )
    optimizer = optax.sgd(1e-2)
    facesj = jnp.asarray(faces)
    bg = jnp.zeros(3, jnp.float32)

    step1 = make_train_step(optimizer, facesj, bg, height, width, mesh=None,
                            force="binned")
    st1, loss1 = step1(init_train_state(scene, optimizer), batch)

    mesh = make_view_mesh(1)
    step_sh = make_train_step(optimizer, facesj, bg, height, width,
                              mesh=mesh, force="binned")
    st_sh, loss_sh = step_sh(init_train_state(scene, optimizer),
                             shard_view_batch(mesh, batch))
    err = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(st1.scene, st_sh.scene)
    )
    err = max(err, abs(float(loss1) - float(loss_sh)))
    return err


def bench_roofline(tri_total_ms, tet_total_ms):
    """Roofline / MFU accounting (VERDICT r3 weak #1): how close is each
    stage to the hardware limit, judged against the MEASURED primitive
    speeds of this chip (tools/bench_primitives.py, docs/ARCHITECTURE.md
    cost model) and v5e HBM peak -- not only against this project's past.

    Method: incremental one-shot jits (stage deltas cancel the remote
    runtime's fixed ~26 ms dispatch, which is measured by a no-op jit and
    subtracted from the first stage). Model floors per stage:

    - row-granular ops (gather / scatter / sort-payload), RANDOM index
      order: 12.5 ns/row
    - row gathers with COHERENT (sorted / piecewise-ascending) indices:
      3.6 ns/row -- measured on the slot-attr gather itself and matching
      the tet march's in-context ~3 ns/row (docs/ARCHITECTURE.md
      "INDEX COHERENCE is the discount"; VERDICT r4 #4 calibration)
    - width-1 scatter-add (special-cased fast path): 7 ns/row
    - lax.sort: 1.5 ns/element/operand
    - VPU vector op on an (8,128) f32 block: ~1.06 ns (one issue/cycle at
      940 MHz); kernel op counts from the kernel source (fwd ~60 vector
      ops/visit; bwd ~55 coverage + ~220 heavy, paid only on the ~61%
      live visits since the r5 liveness-bit skip)
    - HBM peak 819 GB/s (v5e)

    pct_of_roofline = model floor / measured -- 100% means the stage runs
    at the speed the measured primitives allow; low numbers mark headroom.
    """
    import time as _t

    import jax
    import jax.numpy as jnp

    from dmesh_renderer_tpu.ops import tri_binned as tb
    from dmesh_renderer_tpu.ops.binning import (
        aligned_capacity, align_to_slabs, emit_and_sort,
        recommended_key_capacity, recommended_run_capacity,
    )
    from dmesh_renderer_tpu.ops.geometry import (
        preprocess_faces, project_verts,
    )

    ROW_NS, W1_NS, SORT_NS, VEC_NS = 12.5, 7.0, 1.5, 1.06
    COH_NS = 3.6  # coherent-index row gather (see docstring)
    HBM_GBS = 819.0

    def timed(f, iters=3):
        jf = jax.jit(f)
        float(jf())
        ts = []
        for _ in range(iters):
            t0 = _t.perf_counter()
            float(jf())
            ts.append(_t.perf_counter() - t0)
        return min(ts) * 1000.0

    base_ms = timed(lambda: jnp.float32(1.0))  # dispatch floor

    # ---- tri stages at the headline scene ----
    H = W = 800
    n_tris = 100_000
    (verts, faces, vcolor, fopacity, mv_t, proj_t, inv_mv_t, inv_proj_t,
     vdepth, fintense) = _build(n_tris, 1, H, W)
    kcap = recommended_key_capacity(verts, faces, mv_t, proj_t, H, W,
                                    margin=1.03125, bucket=8192)
    rcap = recommended_run_capacity(verts, faces, mv_t, proj_t, H, W,
                                    margin=1.03125, bucket=8192)
    a = tuple(map(jnp.asarray, (
        verts, faces, vcolor, fopacity, mv_t, proj_t, inv_mv_t, inv_proj_t,
        vdepth, fintense)))
    gx = gy = (W + tb.TILE - 1) // tb.TILE
    n_tiles = gx * gy
    cap = aligned_capacity(kcap, n_tiles, tb.SLAB)

    def csum(t):
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree.leaves(t))

    def s_emit():
        ndc, img = project_verts(a[0], a[4], a[5], W, H)
        pre = preprocess_faces(ndc, img, a[1], W, H, tb.TILE, tb.TILE)
        raw = emit_and_sort(pre, gx, gy, kcap, tile_px=tb.TILE, run_cap=rcap)
        keys = align_to_slabs(raw, n_tiles, tb.SLAB, cap)
        return img, keys

    def s_attr():
        img, keys = s_emit()
        cam_o = a[6][:, 3, :3]
        face_tab = tb._build_face_table(a[0], a[1], a[2], a[3], a[8], a[9],
                                        img, cam_o)
        return keys, tb._build_slot_attrs(face_tab, keys)

    def s_fwd():
        from dmesh_renderer_tpu.ops.rays import generate_rays

        keys, attr_tab = s_attr()
        ray_o, ray_d = generate_rays(a[6], a[7], W, H, norm_eps_mode="tri")
        rayd_t = tb._tileify(ray_d, 1, H, W, gx, gy)
        pix_t = tb._pixel_coords(1, gx, gy)
        out, _bits = tb._run_fwd_kernel(keys.starts, keys.ends, attr_tab,
                                        rayd_t, pix_t, n_tiles, H, W,
                                        cap=cap)
        return keys, out

    t_emit = max(timed(lambda: csum(s_emit())) - base_ms, 0.0)
    t_attr = max(timed(lambda: csum(s_attr())) - base_ms, 0.0)
    t_fwdk = max(timed(lambda: csum(s_fwd())) - base_ms, 0.0)

    # event counts (one extra pull; same compiled s_fwd shapes)
    @jax.jit
    def counts():
        keys, out = s_fwd()
        nc = out[:, 6]  # per-tile n_contrib plane
        events = jnp.sum(nc)
        lens = (keys.ends - keys.starts).astype(jnp.float32)
        ncm = jnp.max(nc.reshape(n_tiles, -1), axis=1)
        walked = jnp.sum(jnp.minimum(
            lens, jnp.ceil(ncm / tb.SLAB) * tb.SLAB))
        return (events, walked, keys.total.astype(jnp.float32))

    events, walked, emitted = (float(x) for x in counts())

    stages = {}

    def stage(name, ms, floor_ns, n_events, hbm_bytes=None):
        d = {"ms": round(ms, 2),
             "model_floor_ms": round(floor_ns / 1e6, 2),
             "pct_of_roofline": round(100.0 * (floor_ns / 1e6)
                                      / max(ms, 1e-9), 1)}
        if n_events:
            d["events"] = int(n_events)
            d["ns_per_event"] = round(ms * 1e6 / n_events, 1)
        if hbm_bytes is not None:
            d["achieved_GBps"] = round(hbm_bytes / (ms / 1e3) / 1e9, 1)
            d["hbm_peak_GBps"] = HBM_GBS
        stages[name] = d

    # floors from the measured primitive model: run-table gather (rcap
    # rows) + two run-delta width-1 scatters + the slot sort + ~2 ns/slot
    # of remaining cumsum/compare elementwise passes
    stage("tri_emit_sort", t_emit,
          rcap * ROW_NS + 2 * rcap * W1_NS + cap * 2 * SORT_NS + cap * 2.0,
          emitted)
    # the slot-attr gather's indices are piecewise-ascending after the tile
    # sort -> the coherent rate applies (the r4 floor priced it at the
    # random-index 12.5 and reported 212% "of floor"); the two F-scale
    # vertex gathers in the face-table build stay random-index
    stage("tri_attr_gather", max(t_attr - t_emit, 0.0),
          cap * COH_NS + 2 * n_tris * ROW_NS, cap,
          hbm_bytes=cap * tb.NA * 4 * 2)
    # fwd kernel visits are bounded by the per-tile early exit, not the
    # emitted count -- the walked prefix is the honest lower-bound event
    # count (the kernel may walk somewhat past it before all pixels done)
    stage("tri_fwd_kernel", max(t_fwdk - t_attr, 0.0),
          walked * 60 * VEC_NS, walked)
    t_bwd = max(tri_total_ms - t_fwdk, 0.0)
    # bwd kernel + record reduce together (kernel/reduce split lives in
    # tools/profile_bwd_split.py); floor: coverage AND heavy math on the
    # ~61% live visits only (the liveness-bit skip branches dead visits
    # away before any vector work), plus the walked-scale reduce rows
    stage("tri_bwd_total", t_bwd,
          walked * 0.61 * (55 + 220) * VEC_NS + 2 * walked * ROW_NS,
          walked)
    # summary floor clamps each stage's model floor to its measurement:
    # a stage where the model exceeds the measurement means the model
    # overestimates that stage's necessary work (stage deltas on the
    # shared remote chip carry a few ms of run-to-run variance), and an
    # overestimate must not launder into "we beat the roofline"
    tri_floor = sum(min(stages[k]["model_floor_ms"], stages[k]["ms"])
                    for k in stages)
    stages["tri_summary"] = {
        "total_ms": round(tri_total_ms, 2),
        "model_floor_ms": round(tri_floor, 2),
        "pct_of_roofline": round(100.0 * tri_floor / tri_total_ms, 1),
        "blend_events": int(events),
        "ns_per_blend_event": round(tri_total_ms * 1e6 / events, 1),
    }

    # ---- tet stages at the headline scene ----
    from dmesh_renderer_tpu.ops.binning import (
        recommended_key_capacity as rkc,
    )
    from dmesh_renderer_tpu.ops.tet import (
        LOG_CAP, _render_tet_forward,
    )
    from dmesh_renderer_tpu.ops.tet_first_hit import (
        first_intersection_binned,
    )
    from dmesh_renderer_tpu.runtime.native import build_tet_connectivity
    from dmesh_renderer_tpu.utils.connectivity import freudenthal_grid

    tverts, ttets = freudenthal_grid(20, jitter=0.15, seed=2)
    tfaces, tface_tets, ttet_faces = build_tet_connectivity(ttets)
    rng = np.random.RandomState(0)
    tvcolor = rng.rand(tverts.shape[0], 3).astype(np.float32)
    tfop = rng.uniform(0.3, 0.9, tfaces.shape[0]).astype(np.float32)
    tfint = rng.uniform(0.5, 1.0, (1, tfaces.shape[0])).astype(np.float32)
    tkcap = rkc(tverts, tfaces, mv_t, proj_t, H, W, exact=False,
                margin=1.03125, bucket=8192)
    ta = tuple(map(jnp.asarray, (
        tverts, tfaces, tvcolor, tfop, mv_t, proj_t,
        np.linalg.inv(mv_t), np.linalg.inv(proj_t), tfint,
        ttets, tface_tets, ttet_faces)))
    bg = jnp.asarray(np.array([0.1, 0.1, 0.1], np.float32))

    def _fh_run():
        from dmesh_renderer_tpu.ops.rays import generate_rays
        from dmesh_renderer_tpu.ops.tri_binned import TILE as KTILE

        ndc, img = project_verts(ta[0], ta[4], ta[5], W, H)
        pre = preprocess_faces(ndc, img, ta[1], W, H, KTILE, KTILE)
        ray_o, ray_d = generate_rays(ta[6], ta[7], W, H,
                                     norm_eps_mode="tet")
        return first_intersection_binned(
            ta[0], ta[1], pre, img, ta[6][:, 3, :3], ray_d, H, W, 1, tkcap)

    def t_fh():
        ff, rt, iu, iv, _aux = _fh_run()
        return csum((ff.astype(jnp.float32), rt, iu, iv))

    # slots the kernel actually scanned (depth-window early-outs): the
    # honest visit count for the first-hit floor (r4 priced every
    # capacity slot and reported 134% "of floor")
    fh_walked = float(jax.jit(lambda: _fh_run()[4][2])())

    def t_fwd():
        c, d, act, saved = _render_tet_forward(
            ta[0], ta[1], ta[2], ta[3], ta[4], ta[5], ta[6], ta[7], ta[8],
            ta[9], ta[10], ta[11], bg, H, W, 0, LOG_CAP, tkcap)
        return csum((c, d)) + jnp.sum(saved["n_contrib"])

    ms_fh = max(timed(t_fh) - base_ms, 0.0)
    ms_fwd = max(timed(t_fwd) - base_ms, 0.0)

    @jax.jit
    def tet_counts():
        _c, _d, _act, saved = _render_tet_forward(
            ta[0], ta[1], ta[2], ta[3], ta[4], ta[5], ta[6], ta[7], ta[8],
            ta[9], ta[10], ta[11], bg, H, W, 0, LOG_CAP, tkcap)
        nc = saved["n_contrib"].astype(jnp.float32)
        return jnp.sum(nc), jnp.max(nc)

    tet_events, tet_steps = (float(x) for x in tet_counts())
    M = 800 * 800

    # first-hit floor: this stage contains the whole tet binning chain
    # (round-3 split, tools/profile_first_hit.py: preprocess ~5, emit+sort
    # ~10.6, attr ~2, kernel ~2.6), so the floor prices bbox emission
    # fills (two width-1 scatters + ~2 ns/slot elementwise), the slot
    # sort, the coherent attr gather (all at capacity scale), the F-scale
    # preprocess vertex gathers, and the kernel's per-slot-visit vector
    # work (~40 (8,128)-block ops) only on the slots the depth-window
    # scan actually walked
    stage("tet_first_hit", ms_fh,
          tkcap * (COH_NS + 2 * SORT_NS + 2 * W1_NS + 2.0)
          + 2 * tfaces.shape[0] * ROW_NS + fh_walked * 40 * VEC_NS,
          fh_walked)
    # march floor: per full-width step one M-row mega gather (measured
    # spatially-coherent ~3 ns/row here, credited at that rate) + the
    # relayout+log HBM traffic + ~120 kernel vector ops per ray-step
    steps_full = min(tet_steps, 11.0)
    march_rows = steps_full * M + max(tet_steps - steps_full, 0) * M / 8
    # traffic: mega gather out + relayout in/out + the kernel's
    # consts/state/log streams (~60 f32 cols in + ~40 out per ray-step)
    march_bytes = march_rows * (96 * 4 * 3 + 100 * 4)
    # 819 GB/s == 819 B/ns, so t_ns = bytes / 819; spatially-coherent
    # mega gathers measured ~3 ns/row (tools/profile_march_step.py)
    stage("tet_march", max(ms_fwd - ms_fh, 0.0),
          march_rows * 3.0 + march_bytes / HBM_GBS,
          tet_events)
    ms_replay = max(tet_total_ms - ms_fwd, 0.0)
    # replay floor: per reduce batch an R*bk1-row survivor scatter (at
    # the SHAPE-measured ~20 ns/row -- tools/exp_absorber.py; the generic
    # 12.5 is optimistic for [480k, 10] into [F+1, 10]) + the HIGHEST
    # one-hot dot (measured 2.4 ms/batch) + log re-read traffic
    n_batches = float(np.ceil(tet_steps / 6.0))
    stage("tet_replay", ms_replay,
          n_batches * (480_000 * 20.0 + 2.4e6)
          + tet_steps * M * 10 * 4 / HBM_GBS,
          tet_events)
    tet_floor = sum(
        min(stages[k]["model_floor_ms"], stages[k]["ms"])
        for k in ("tet_first_hit", "tet_march", "tet_replay"))
    stages["tet_summary"] = {
        "total_ms": round(tet_total_ms, 2),
        "model_floor_ms": round(tet_floor, 2),
        "pct_of_roofline": round(100.0 * tet_floor / tet_total_ms, 1),
        "blend_events": int(tet_events),
        "ns_per_blend_event": round(tet_total_ms * 1e6
                                    / max(tet_events, 1.0), 1),
    }
    return stages


def bench_parity_gate():
    """TPU-side correctness gate (VERDICT r3 weak #3): the CPU test suite
    runs the Pallas kernels INTERPRETED (tri_binned._interpret), so a
    regression that only manifests under Mosaic compilation would ship a
    wrong image with a green suite. This renders small scenes on the live
    backend every round and reports max errors in the JSON:

    - tri: binned vs oracle, forward + all five gradients (one jit, scalar
      error pulls);
    - tet: the committed golden scene (tests/golden/tet_scene.npz,
      generated by the f64-checked CPU path) re-rendered on the TPU;
      color/depth/grad max-abs-err + exact active-mask equality.
    """
    import os
    import sys

    import jax
    import jax.numpy as jnp

    from dmesh_renderer_tpu.ops.tri_binned import render_tri_binned
    from dmesh_renderer_tpu.ops.tri_oracle import render_tri_oracle

    out = {}

    # ---- tri: binned vs oracle on the TPU ----
    (verts, faces, vcolor, fopacity, mv_t, proj_t, inv_mv_t, inv_proj_t,
     vdepth, fintense) = _build(2048, 1, 256, 256, seed=5)
    args = tuple(map(jnp.asarray, (
        verts, faces, vcolor, fopacity, mv_t, proj_t, inv_mv_t, inv_proj_t,
        vdepth, fintense)))
    bg = jnp.asarray(np.array([0.2, 0.1, 0.3], np.float32))
    H = W = 256

    @jax.jit
    def tri_diffs():
        def run(render):
            color, depth = render(*args, bg, H, W)

            def loss(verts, vc, fo, vd, fi):
                c, d = render(verts, args[1], vc, fo, args[4], args[5],
                              args[6], args[7], vd, fi, bg, H, W)
                t = jnp.cos(jnp.arange(c.size, dtype=jnp.float32)
                            ).reshape(c.shape)
                td = jnp.sin(jnp.arange(d.size, dtype=jnp.float32)
                             ).reshape(d.shape)
                return jnp.sum(c * t) + jnp.sum(d * td)

            grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
                args[0], args[2], args[3], args[8], args[9])
            return (color, depth) + grads

        o = run(lambda *a: render_tri_oracle(*a))
        b = run(lambda *a: render_tri_binned(*a))
        errs = []
        for x, y in zip(o, b):
            scale = jnp.maximum(1.0, jnp.max(jnp.abs(x)))
            errs.append(jnp.max(jnp.abs(x - y)) / scale)
        return jnp.stack(errs)

    errs = np.array(tri_diffs())
    names = ("color", "depth", "g_verts", "g_vcolor", "g_fopacity",
             "g_vdepth", "g_fintense")
    out["tri_parity_max_rel_err"] = float(f"{errs.max():.3g}")
    out["tri_parity_worst"] = names[int(errs.argmax())]
    out["tri_parity_ok"] = bool(errs.max() < 2e-4)

    # ---- tet: golden scene re-rendered on the TPU ----
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tests"))
    import test_tet_spec as tts

    golden = dict(np.load(tts.GOLDEN))
    sc = tts._scene()
    c, d, act, g_vc, g_fo, _wc, _wd = tts._jax_render_and_grads(sc)
    errs_t = {
        "color": np.abs(c - golden["color"]).max(),
        "depth": np.abs(d - golden["depth"]).max(),
        "g_vcolor": np.abs(g_vc - golden["g_vcolor"]).max(),
        "g_fopacity": np.abs(g_fo - golden["g_fopacity"]).max(),
    }
    worst = max(errs_t, key=errs_t.get)
    out["tet_golden_max_abs_err"] = float(f"{errs_t[worst]:.3g}")
    out["tet_golden_worst"] = worst
    out["tet_golden_active_exact"] = bool(
        np.array_equal(act, golden["active"]))
    out["tet_golden_ok"] = bool(errs_t[worst] < 2e-4
                                and out["tet_golden_active_exact"])
    return out


def bench_adversarial_gate():
    """TPU-side ADVERSARIAL parity gate (VERDICT r4 #5): the committed
    adversarial golden scenes (near-plane int32-wrap vertices, alpha == 1
    saturation, offscreen/zero-area/huge faces; jittered interior tet
    walks) exercised the exact machinery that broke in past rounds
    (binning._edge_wrap_risk, split-half i32 slab encodings) -- but only in
    the CPU suite, where Pallas runs interpreted. This re-runs both scenes
    compiled on the live backend every round:

    - tri: binned vs oracle, BOTH Mosaic/XLA-compiled here (certifies the
      compiled kernels against the integer-exact oracle semantics), plus
      drift of the binned result vs the committed CPU golden;
    - tet: the adversarial golden re-rendered and compared to the
      committed arrays (cross-backend f32 drift budget), active mask
      reported as a mismatch count.
    """
    import os
    import sys

    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tests"))
    import test_golden_adversarial as tga
    import test_golden_tet_adversarial as tta

    from dmesh_renderer_tpu.ops.tri_binned import render_tri_binned
    from dmesh_renderer_tpu.ops.tri_oracle import render_tri_oracle

    out = {}

    args = tga._scene_args()
    oracle = tga._fwd_and_grads(render_tri_oracle, args)
    binned = tga._fwd_and_grads(render_tri_binned, args)
    golden = dict(np.load(tga.GOLDEN))
    rel = {}
    bad = total = 0
    for k, gold in golden.items():
        scale = max(1.0, float(np.abs(oracle[k]).max()))
        rel[k] = float(np.abs(binned[k] - oracle[k]).max()) / scale
        # golden drift is CROSS-BACKEND (goldens are CPU-jit): a borderline
        # coverage decision may legitimately flip on isolated pixels under
        # a different compilation (fusion/FMA upstream of the int coeffs),
        # so count outliers instead of taking a max
        bad += int(np.sum(np.abs(binned[k] - gold) > 1e-3 * scale))
        total += gold.size
    worst = max(rel, key=rel.get)
    out["tri_adv_max_rel_err"] = float(f"{rel[worst]:.3g}")
    out["tri_adv_worst"] = worst
    out["tri_adv_vs_golden_bad_frac"] = float(f"{bad / total:.3g}")
    # binned-vs-oracle BOTH compiled here is the Mosaic certification: the
    # fuzz-harness tolerance applies (test_golden_adversarial.GRAD_RTOL).
    # The golden drift term is informational cross-backend (CPU-jit
    # goldens vs TPU compilation): borderline near-plane coverage flips
    # land whole pixels, and the observed fraction sits at ~5e-4 (r5:
    # 0.000505 with the oracle check at 9.4e-7) -- budget 1.5e-3 flags a
    # real regression (an order-of-magnitude jump), not compiler jitter
    out["tri_adv_ok"] = bool(rel[worst] < 2e-4 and bad / total < 1.5e-3)

    tgold = dict(np.load(tta.GOLDEN))
    got = tta._render_and_grads()
    errs = {}
    tbad = ttotal = 0
    for k in ("color", "depth", "g_vcolor", "g_fopacity"):
        scale = max(1.0, float(np.abs(tgold[k]).max()))
        errs[k] = float(np.abs(got[k] - tgold[k]).max()) / scale
        tbad += int(np.sum(np.abs(got[k] - tgold[k]) > 1e-3 * scale))
        ttotal += tgold[k].size
    tworst = max(errs, key=errs.get)
    mism = int(np.sum(got["active"] != tgold["active"]))
    out["tet_adv_max_rel_err"] = float(f"{errs[tworst]:.3g}")
    out["tet_adv_worst"] = tworst
    out["tet_adv_bad_frac"] = float(f"{tbad / ttotal:.3g}")
    out["tet_adv_active_mismatch_px"] = mism
    # cross-backend budget: isolated walk/coverage flips allowed, bulk
    # agreement required
    out["tet_adv_ok"] = bool(tbad / ttotal < 5e-4
                             and mism <= got["active"].size // 1000)
    return out


def bench_fallback_gate():
    """Deep-walk MARCHING-BACKWARD gate (VERDICT r4 #6): bench.py pins
    max_steps = LOG_CAP precisely so the marching fallback is not even
    compiled, and the CPU suite runs it interpreted -- a Mosaic-only
    breakage in _bwd_march_kernel (ops/tet.py:1504) would ship silently.
    Reference semantics at stake: cuda_renderer/backward.cu:235-486.

    Here: a scene whose deepest walk exceeds a shrunken LOG_CAP but not
    max_steps, so the lax.cond dispatch AND _bwd_march_kernel compile and
    EXECUTE on the live backend; gradients must match the replay path
    (same forward: max_steps equal in both runs).
    """
    import numpy as np

    import jax
    import jax.numpy as jnp

    import dmesh_renderer_tpu.ops.tet as tet_mod
    from dmesh_renderer_tpu.runtime.native import build_tet_connectivity
    from dmesh_renderer_tpu.utils.connectivity import freudenthal_grid

    H = W = 64
    verts, tets = freudenthal_grid(6, jitter=0.12, seed=4)
    faces, face_tets, tet_faces = build_tet_connectivity(tets)
    rng = np.random.RandomState(2)
    vcolor = rng.rand(verts.shape[0], 3).astype(np.float32)
    # low opacities: T never hits the early-exit, walks run to the
    # geometric exit (deeper than the shrunken log, shallower than 24)
    fop = rng.uniform(0.05, 0.25, faces.shape[0]).astype(np.float32)
    fint = rng.uniform(0.5, 1.0, (1, faces.shape[0])).astype(np.float32)
    mv_t, proj_t = _build(1, 1, H, W)[4:6]
    a = tuple(map(jnp.asarray, (
        verts, faces, vcolor, fop, mv_t, proj_t,
        np.linalg.inv(mv_t), np.linalg.inv(proj_t), fint,
        tets, face_tets, tet_faces)))
    bg = jnp.asarray(np.array([0.1, 0.1, 0.1], np.float32))
    MAX_STEPS = tet_mod.LOG_CAP  # same forward in both runs

    def grads():
        def loss(vc, fo):
            c, d, _act = tet_mod.render_tet_core(
                a[0], a[1], vc, fo, a[4], a[5], a[6], a[7], a[8],
                a[9], a[10], a[11], bg, H, W, 0, max_steps=MAX_STEPS)
            return jnp.sum(c) + jnp.sum(d)

        @jax.jit
        def run():
            return jax.grad(loss, argnums=(0, 1))(a[2], a[3])

        return tuple(np.array(g) for g in run())

    @jax.jit
    def walk_depth():
        _c, _d, _act, saved = tet_mod._render_tet_forward(
            a[0], a[1], a[2], a[3], a[4], a[5], a[6], a[7], a[8],
            a[9], a[10], a[11], bg, H, W, 0, MAX_STEPS, None)
        return jnp.max(saved["n_contrib"])

    depth = int(walk_depth())

    g_replay = grads()  # LOG_CAP covers the walk: pure replay
    old_cap = tet_mod.LOG_CAP
    try:
        # shrink the log below the deepest walk: the cond compiles BOTH
        # branches and picks marching at runtime (nc_max > log_depth)
        tet_mod.LOG_CAP = 6
        g_march = grads()
    finally:
        tet_mod.LOG_CAP = old_cap

    errs = [
        float(np.abs(gm - gr).max()) / max(1.0, float(np.abs(gr).max()))
        for gm, gr in zip(g_march, g_replay)
    ]
    out = {
        "tet_fallback_walk_depth": depth,
        "tet_fallback_max_rel_err": float(f"{max(errs):.3g}"),
        "tet_fallback_ok": bool(depth > 6 and max(errs) < 1e-4),
    }
    return out


def _backend_watchdog(timeout_s=600):
    """The axon remote backend can HANG (not fail) in make_c_api_client
    when its tunnel is down (observed 2026-08-17, >4 h outage). Probe
    device init on a daemon thread; on timeout emit an error JSON line --
    the driver must receive ONE line, never an infinite hang."""
    import os
    import threading

    ok = []

    def probe():
        import jax

        ok.append(str(jax.devices()[0]))

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if not ok:
        print(json.dumps({
            "metric": "tri_fwd_bwd_ms_per_frame_100k_tris_800px",
            "value": -1.0,
            "unit": "ms/frame",
            "vs_baseline": 0.0,
            "error": (f"backend init hang (> {timeout_s}s): the axon TPU "
                      "tunnel is down; no measurement possible"),
        }))
        os._exit(3)


def main():
    """Runs every stage, writes the FULL result to BENCH_DETAIL.json, and
    prints ONE COMPACT json line for the driver.

    The driver captures only the last ~2000 chars of stdout (ADVICE r4:
    the round-4 roofline fields grew the single output line past that
    limit, truncating the artifact mid-JSON and losing the round's
    numbers) -- so the stdout line carries the headline plus short-key
    summaries and the full detail (roofline stages, notes) goes to the
    file, which the driver's end-of-round commit picks up.
    """
    _backend_watchdog()
    t_start = time.time()
    # optional stages are skipped past this point so the driver ALWAYS
    # gets its one JSON line (compiles on the remote backend are minutes
    # each; an external kill mid-bench would lose the whole round's
    # artifact)
    budget_s = float(os.environ.get("DMRT_BENCH_BUDGET_S", "3300"))
    ms = bench_tri_scaled()
    vs = 1.0 if BENCH_HISTORY_MS is None else BENCH_HISTORY_MS / ms
    result = {
        "metric": "tri_fwd_bwd_ms_per_frame_100k_tris_800px",
        "value": round(ms, 3),
        "unit": "ms/frame",
        "vs_baseline": round(vs, 3),
    }
    detail = {
        # vs_baseline tracks ROUND-OVER-ROUND progress against this
        # project's own round-1 number. It is NOT the north star:
        "north_star_note": (
            "north star (BASELINE.json) is A100-class fwd+bwd wall-clock "
            "on v5e-8; no A100 exists in this environment, so the CUDA "
            "side is unmeasured -- a 3DGS-lineage rasterizer at this "
            "scale is plausibly 10-20 ms/frame on A100 (VERDICT r2), and "
            "the v5e-8 figure remains a projection from single-chip "
            "numbers until multi-chip hardware exists"),
        # in-jit training-chain lengths (lax.scan): the per-dispatch host
        # round-trip of the remote runtime (~28 ms) is amortized over the
        # chain, leaving ~28/chain ms inside each reported frame.
        "tri_chain": 16,
        "tet_chain": 8,
        "b2_protocol": "chain=8 iters=3 (VERDICT r4 #1: matched protocol)",
        "b4_protocol": "chain=4 iters=2",
    }
    extra = {}

    def stage(key, fn, cost_s=300.0):
        if time.time() - t_start + cost_s > budget_s:
            extra[f"{key}_skipped_for_time"] = True
            return
        try:
            extra.update(fn())
        except Exception as e:
            extra[f"{key}_error"] = f"{type(e).__name__}: {e}"[:160]

    def _tet_headline():
        tet_ms, tet_faces_n = bench_tet_scaled()
        return {"tet_ms_per_frame": round(tet_ms, 3),
                "tet_faces": int(tet_faces_n)}

    # multi-view scaling points (BASELINE.md config 5; VERDICT r4 #1/#10):
    # B=2 at the SAME protocol as the single-view measurements, B=4
    # confirming both renderers stay linear past the historical cliff
    # points. One stage each so a failure/timeout keeps the others.
    def _tri_b2():
        return {"tri_ms_per_view_B2": round(
            bench_tri_scaled(n_views=2, chain=8, iters=3), 3)}

    def _tet_b2():
        return {"tet_ms_per_view_B2": round(
            bench_tet_scaled(n_views=2, chain=8, iters=3)[0], 3)}

    def _tri_b4():
        return {"tri_ms_per_view_B4": round(
            bench_tri_scaled(n_views=4, chain=4, iters=2), 3)}

    def _tet_b4():
        return {"tet_ms_per_view_B4": round(
            bench_tet_scaled(n_views=4, chain=4, iters=2)[0], 3)}

    def _smoke():
        err = bench_sharded_smoke()
        return {"sharded_smoke_max_abs_err": float(f"{err:.3g}"),
                "sharded_smoke_ok": bool(err < 1e-4)}

    stage("tet", _tet_headline, cost_s=500)
    # gates first: correctness evidence outranks extra scaling points if
    # the time budget runs short
    stage("sharded_smoke", _smoke, cost_s=200)
    stage("parity_gate", bench_parity_gate, cost_s=250)
    stage("adv_gate", bench_adversarial_gate, cost_s=400)
    stage("fallback_gate", bench_fallback_gate, cost_s=500)
    stage("tri_b2", _tri_b2, cost_s=300)
    stage("tet_b2", _tet_b2, cost_s=450)
    stage("tri_b4", _tri_b4, cost_s=300)
    stage("tet_b4", _tet_b4, cost_s=450)
    try:
        if ("tet_ms_per_frame" in extra
                and time.time() - t_start + 600 <= budget_s):
            roof = bench_roofline(ms, extra["tet_ms_per_frame"])
            detail["roofline"] = roof
            extra["roofline_tri_pct"] = roof["tri_summary"][
                "pct_of_roofline"]
            extra["roofline_tet_pct"] = roof["tet_summary"][
                "pct_of_roofline"]
    except Exception as e:
        extra["roofline_error"] = f"{type(e).__name__}: {e}"[:160]

    result["extra"] = extra
    detail.update(result)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1)
    result["detail_file"] = "BENCH_DETAIL.json"
    line = json.dumps(result)
    if len(line) > 1900:  # never overflow the driver's tail capture again
        slim = {k: result[k] for k in
                ("metric", "value", "unit", "vs_baseline", "detail_file")}
        slim["extra_truncated_see_detail_file"] = True
        line = json.dumps(slim)
    print(line)


if __name__ == "__main__":
    main()
