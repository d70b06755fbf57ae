"""Native meshkit runtime: parity with the NumPy fallbacks."""

import numpy as np
import pytest

from rdcfes_tpu import native
from rdcfes_tpu.mesh import box_tet_mesh, gmsh

CUBE = "/root/reference/run/Solid/uniaxial_compression/cube.msh"

needs_native = pytest.mark.skipif(
    not native.available(), reason="libmeshkit.so not built (make -C rdcfes_tpu/native)"
)


@needs_native
def test_native_gmsh_parity():
    m_nat = native.read_gmsh_native(CUBE)
    # force the pure-Python path via a stream
    with open(CUBE) as f:
        m_py = gmsh.read(f)
    np.testing.assert_allclose(m_nat.coords, m_py.coords)
    np.testing.assert_array_equal(m_nat.connectivity, m_py.connectivity)
    np.testing.assert_array_equal(m_nat.subdomain_id, m_py.subdomain_id)
    np.testing.assert_array_equal(
        np.sort(m_nat.boundary_id), np.sort(m_py.boundary_id)
    )


@needs_native
def test_native_sparsity_parity():
    m = box_tet_mesh(4, 3, 2)
    rows, cols, slots, nnz = native.build_sparsity_native(m.connectivity, m.n_nodes)
    # NumPy reference path
    conn = m.connectivity.astype(np.int64)
    E, K = conn.shape
    r = np.repeat(conn, K, axis=1).reshape(-1)
    c = np.tile(conn, (1, K)).reshape(-1)
    uniq, inv = np.unique(r * m.n_nodes + c, return_inverse=True)
    assert nnz == len(uniq)
    np.testing.assert_array_equal(rows, (uniq // m.n_nodes).astype(np.int32))
    np.testing.assert_array_equal(cols, (uniq % m.n_nodes).astype(np.int32))
    np.testing.assert_array_equal(slots.reshape(-1), inv.astype(np.int32))


def test_rcb_partition_balanced():
    m = box_tet_mesh(5, 5, 5)
    centers = m.coords[m.connectivity].mean(axis=1)
    for n_parts in (2, 3, 8):
        part = native.partition_rcb(centers, n_parts)
        counts = np.bincount(part, minlength=n_parts)
        assert counts.max() - counts.min() <= 1
        assert counts.sum() == m.n_elems


def test_benes_color_batch_native_matches_contract(monkeypatch):
    """The native edge-coloring walker produces proper matchings (each
    color class hits every left and right vertex exactly once per
    segment), and the Python fallback path builds equally valid plans —
    build_grid_permutation output is checked against the permutation
    itself under both backends."""
    from rdcfes_tpu.fem import benes

    rng = np.random.default_rng(0)
    # direct contract check on a random 8-regular bipartite multigraph
    nl = nr = 6
    deg = 8
    src = np.repeat(np.arange(nl), deg)
    dst = np.concatenate([rng.permutation(np.repeat(np.arange(nr),
                                                    deg // 2))[:nl * deg // 2],
                          rng.permutation(np.repeat(np.arange(nr),
                                                    deg // 2))[:nl * deg // 2]])
    # make it exactly deg-regular on the right too
    dst = np.concatenate([rng.permutation(np.repeat(np.arange(nr), deg))])
    seg = np.array([0, len(src)], dtype=np.int64)
    colors = benes.edge_color_batch(src, dst, seg, nl, nr, deg)
    for c in range(deg):
        sel = colors == c
        assert np.array_equal(np.sort(src[sel]), np.arange(nl))
        assert np.array_equal(np.sort(dst[sel]), np.arange(nr))

    # plan validity under the native backend and the Python fallback
    T = 5 * 16 * 16
    perm = rng.permutation(T)
    x = rng.standard_normal(T)
    plan_native = benes.build_grid_permutation(perm, 5, 16, 16)
    assert np.array_equal(benes.apply_plan(plan_native, x), x[perm])
    import rdcfes_tpu.native as native_mod
    monkeypatch.setattr(native_mod, "benes_color_batch",
                        lambda *a, **k: None)
    plan_py = benes.build_grid_permutation(perm, 5, 16, 16)
    assert np.array_equal(benes.apply_plan(plan_py, x), x[perm])
