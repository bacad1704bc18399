"""Round-3 experiments: tet march step redesign candidates.

Times the primitive costs of the per-step glue (gathers, relayouts) and
candidate replacements at full march width, on the real scene's tables:

  p1  pack[ct] row gather [M,48]
  p2  p1 + _relayout (the current fwd step's connectivity feed)
  p3  shade[cf] row gather [M,12] + _relayout (current shading feed)
  p4  mega[ct] row gather [M,96] + _relayout (merged-table candidate:
      connectivity + all 4 slots' shade in ONE row keyed by tet)
  p5  megaT[:, ct] transposed gather -> [96, M] (gather lands directly in
      rays-in-lanes layout; no relayout pass)
  p6  current full fwd step (two gathers + relayouts + kernel)
  p7  fwd kernel alone on pre-staged inputs

Each is reported for sorted (high-locality, like the compacted march) and
random ct/cf keys.

Run on the TPU: python tools/exp_march_variants.py [M]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 8


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 640_000

    import jax
    import jax.numpy as jnp
    from jax import lax

    from dmesh_renderer_tpu.ops import tet as tet_mod
    from dmesh_renderer_tpu.ops.binning import _relayout
    from dmesh_renderer_tpu.runtime.native import build_tet_connectivity
    from dmesh_renderer_tpu.utils.connectivity import freudenthal_grid

    verts, tets = freudenthal_grid(20, jitter=0.15, seed=2)
    faces, face_tets, tet_faces = build_tet_connectivity(tets)
    F = faces.shape[0]
    T = tets.shape[0]
    rng = np.random.RandomState(0)
    vcolor = jnp.asarray(rng.rand(verts.shape[0], 3).astype(np.float32))
    fop = jnp.asarray(rng.uniform(0.3, 0.9, F).astype(np.float32))
    fint = jnp.asarray(rng.uniform(0.5, 1.0, (1, F)).astype(np.float32))

    march = tet_mod._march_tables(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(tets),
        jnp.asarray(tet_faces), jnp.asarray(face_tets), vcolor, fop, fint)
    pack = march["tet_pack"]          # [T, 48]
    shade = march["shade"]            # [F, 12] (B=1)

    # merged mega table: per tet, connectivity pack + the 4 slots' shade
    shade_slots = shade[np.asarray(
        jax.device_get(jnp.maximum(jnp.asarray(tet_faces), 0)))].reshape(
            T, 48)
    mega = jnp.concatenate([pack, jnp.asarray(shade_slots)], axis=1)  # [T,96]
    megaT = jnp.asarray(np.ascontiguousarray(
        jax.device_get(mega).T))      # [96, T]

    ct_rand = rng.randint(0, T, M).astype(np.int32)
    cf_rand = rng.randint(0, F, M).astype(np.int32)
    ct_sort = np.sort(ct_rand)
    cf_sort = np.sort(cf_rand)

    print(f"scene: F={F} T={T} M={M}")

    def measure(fn, keys, iters=3):
        keys = tuple(map(jnp.asarray, keys))

        @jax.jit
        def chained(keys):
            def body(salt, _):
                out = fn(*(k + salt * 0 for k in keys)) if False else fn(
                    *[(k + salt) % (T if i == 0 else F)
                      for i, k in enumerate(keys)])
                s = jnp.sum(out.ravel()[:8].astype(jnp.float32))
                return (salt + s.astype(jnp.int32) % 2).astype(jnp.int32), None
            salt, _ = lax.scan(body, jnp.int32(0), None, length=REPS)
            return salt

        float(chained(keys))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(chained(keys))
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1000

    base = measure(lambda ct: ct[:1].astype(jnp.float32), (ct_rand[:128],))

    def timed(name, fn, keys):
        ms = (measure(fn, keys) - base) / REPS
        print(f"{name:>44}: {ms:8.2f} ms/op")
        return ms

    for tag, ct, cf in (("sorted", ct_sort, cf_sort),
                        ("random", ct_rand, cf_rand)):
        print(f"--- {tag} keys ---")
        timed("p1 pack[ct] [M,48]", lambda ct: pack[ct], (ct,))
        timed("p2 p1 + relayout", lambda ct: _relayout(pack[ct], 48), (ct,))
        timed("p3 shade[cf] + relayout",
              lambda cf: _relayout(shade[cf], 12), (cf,))
        timed("p4 mega[ct] [M,96] + relayout",
              lambda ct: _relayout(mega[ct], 96), (ct,))
        timed("p5 megaT[:, ct] -> [96, M]",
              lambda ct: megaT[:, ct], (ct,))
        timed("p5b p5 + reshape to [M/128,96,128]",
              lambda ct: megaT[:, ct].reshape(96, M // 128, 128)
              .swapaxes(0, 1), (ct,))

    # p6/p7: the real current fwd step at full width, sorted keys
    N = M
    ro = [jnp.asarray(rng.rand(M).astype(np.float32)) for _ in range(3)]
    rd = [jnp.asarray(rng.rand(M).astype(np.float32)) for _ in range(3)]
    consts_t = tet_mod._pack_rows(ro + rd + [ro[0], ro[1], ro[2], rd[0]])
    zero = jnp.zeros((M,), jnp.float32)
    one = jnp.ones((M,), jnp.float32)
    state_rows = [zero, zero, zero,
                  jnp.asarray(cf_sort.astype(np.float32)),
                  jnp.asarray(ct_sort.astype(np.float32)),
                  zero, one, zero, zero, zero, zero, zero,
                  -one, -one, zero, zero, zero]
    state_t = tet_mod._pack_rows(state_rows)
    fbase = jnp.zeros((M,), jnp.int32)

    def full_step(ct, cf):
        pack_t = _relayout(pack[ct], 48)
        shade_t = _relayout(shade[cf], 12)
        return tet_mod._run_march_kernel(
            tet_mod._fwd_march_kernel, pack_t, shade_t, consts_t, state_t,
            tet_mod._NSF)

    timed("p6 full current fwd step", full_step, (ct_sort, cf_sort))

    pack_t0 = _relayout(pack[jnp.asarray(ct_sort)], 48)
    shade_t0 = _relayout(shade[jnp.asarray(cf_sort)], 12)

    def kernel_only(ct):
        st = state_t.at[0, 0, 0].add(ct[0].astype(jnp.float32) * 0)
        return tet_mod._run_march_kernel(
            tet_mod._fwd_march_kernel, pack_t0, shade_t0, consts_t, st,
            tet_mod._NSF)

    timed("p7 fwd kernel only", kernel_only, (ct_sort,))

    # scatter experiments (bwd face_acc)
    vals = jnp.asarray(rng.rand(M, 10).astype(np.float32))
    acc0 = jnp.zeros((F, 10), jnp.float32)
    alive = jnp.asarray((rng.rand(M) < 0.5))

    timed("s1 [M]->[F,10] scatter-add",
          lambda cf: acc0.at[cf].add(vals, mode="drop"), (cf_sort,))
    timed("s2 scatter-add, half rows key=F (drop)",
          lambda cf: acc0.at[jnp.where(alive, cf, F)].add(
              vals, mode="drop"), (cf_sort,))


if __name__ == "__main__":
    main()
