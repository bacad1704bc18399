"""Native C++ connectivity builder vs the NumPy implementation."""

import numpy as np
import pytest

from dmesh_renderer_tpu.runtime import native
from dmesh_renderer_tpu.utils.connectivity import build_tet_connectivity


def _random_tet_grid(n=4):
    """Tessellate an n^3 grid of cubes, 5 tets per cube (Freudenthal-ish)."""
    tets = []
    def vid(i, j, k):
        return (i * (n + 1) + j) * (n + 1) + k
    for i in range(n):
        for j in range(n):
            for k in range(n):
                c = [vid(i + a, j + b, k + d)
                     for a in range(2) for b in range(2) for d in range(2)]
                # split cube into 5 tets
                tets += [
                    [c[0], c[1], c[2], c[4]],
                    [c[1], c[2], c[3], c[7]],
                    [c[1], c[4], c[5], c[7]],
                    [c[2], c[4], c[6], c[7]],
                    [c[1], c[2], c[4], c[7]],
                ]
    return np.asarray(tets, np.int64)


def test_native_available():
    assert native.available(), "native build failed (g++ missing?)"


def test_native_matches_numpy():
    tets = _random_tet_grid(3)
    f_np, ft_np, tf_np = build_tet_connectivity(tets)
    f_c, ft_c, tf_c = native.build_tet_connectivity(tets)
    np.testing.assert_array_equal(f_np, f_c)
    np.testing.assert_array_equal(ft_np, ft_c)
    np.testing.assert_array_equal(tf_np, tf_c)


def test_native_nonmanifold_raises():
    # three tets sharing the same face {0,1,2}
    tets = np.array(
        [[0, 1, 2, 3], [0, 1, 2, 4], [0, 1, 2, 5]], np.int64
    )
    with pytest.raises(ValueError):
        native.build_tet_connectivity(tets)


def test_native_scales():
    tets = _random_tet_grid(8)  # 2560 tets
    f, ft, tf = native.build_tet_connectivity(tets)
    assert tf.shape == (tets.shape[0], 4)
    # every interior face has two owners referencing it
    for fid in range(0, f.shape[0], 97):
        for t in ft[fid]:
            if t >= 0:
                assert fid in tf[t]
