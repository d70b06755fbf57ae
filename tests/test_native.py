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
