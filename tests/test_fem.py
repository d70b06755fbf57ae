import jax.numpy as jnp
import numpy as np
import pytest

from rdcfes_tpu.fem import elements, geometry_factors, face_geometry_factors
from rdcfes_tpu.mesh import box_hex_mesh, box_tet_mesh


@pytest.mark.parametrize("etype", ["TET4", "HEX8", "TRI3", "QUAD4"])
def test_partition_of_unity(etype):
    pts, wts = elements.quadrature(etype)
    phi = elements.shape_functions(etype, pts)
    np.testing.assert_allclose(phi.sum(axis=1), 1.0, atol=1e-14)
    dN = elements.shape_gradients(etype, pts)
    np.testing.assert_allclose(dN.sum(axis=1), 0.0, atol=1e-14)


@pytest.mark.parametrize(
    "etype,ref_measure", [("TET4", 1 / 6), ("HEX8", 8.0), ("TRI3", 0.5), ("QUAD4", 4.0)]
)
def test_quadrature_weights_sum(etype, ref_measure):
    _, wts = elements.quadrature(etype)
    np.testing.assert_allclose(wts.sum(), ref_measure, rtol=1e-14)


@pytest.mark.parametrize("etype", ["TET4", "HEX8"])
def test_quadrature_degree3_exact(etype):
    """The THIRD-order rules must integrate all monomials of degree <= 3."""
    pts, wts = elements.quadrature(etype)
    rng = np.random.default_rng(1)
    for _ in range(5):
        # random cubic p(x,y,z) = sum c_abc x^a y^b z^c, a+b+c <= 3
        powers = [(a, b, c) for a in range(4) for b in range(4) for c in range(4)
                  if a + b + c <= 3]
        coeffs = rng.standard_normal(len(powers))
        val = sum(
            co * (pts[:, 0] ** a * pts[:, 1] ** b * pts[:, 2] ** c * wts).sum()
            for co, (a, b, c) in zip(coeffs, powers)
        )
        if etype == "HEX8":
            exact = sum(
                co * _int_pow_sym(a) * _int_pow_sym(b) * _int_pow_sym(c)
                for co, (a, b, c) in zip(coeffs, powers)
            )
        else:
            exact = sum(
                co * _int_monomial_tet(a, b, c)
                for co, (a, b, c) in zip(coeffs, powers)
            )
        np.testing.assert_allclose(val, exact, rtol=1e-12, atol=1e-14)


def _int_pow_sym(a):
    # integral of x^a over [-1, 1]
    return 0.0 if a % 2 else 2.0 / (a + 1)


def _int_monomial_tet(a, b, c):
    # integral of x^a y^b z^c over the unit tet = a! b! c! / (a+b+c+3)!
    from math import factorial

    return factorial(a) * factorial(b) * factorial(c) / factorial(a + b + c + 3)


@pytest.mark.parametrize("mesh_fn", [box_tet_mesh, box_hex_mesh])
def test_geometry_volume_and_gradients(mesh_fn):
    m = mesh_fn(3, 2, 2, bounds=((0, 2), (0, 1), (0, 3)))
    phi, JxW, dphi = geometry_factors(
        jnp.asarray(m.coords), jnp.asarray(m.connectivity), m.elem_type
    )
    # channel-first shapes: JxW (Q, E), dphi (Q, K, 3, E)
    assert JxW.shape[1] == m.n_elems and dphi.shape[-1] == m.n_elems
    np.testing.assert_allclose(float(JxW.sum()), 6.0, rtol=1e-12)
    # patch test: gradient of a linear field u = 1 + 2x - y + 3z is exact
    u = 1 + 2 * m.coords[:, 0] - m.coords[:, 1] + 3 * m.coords[:, 2]
    ue = jnp.asarray(u)[jnp.asarray(m.connectivity.T)]  # (K, E)
    grad = jnp.einsum("qkde,ke->qde", dphi, ue)
    np.testing.assert_allclose(
        np.asarray(grad),
        np.broadcast_to(np.array([2.0, -1.0, 3.0])[None, :, None], grad.shape),
        atol=1e-10,
    )
    # interpolation of the same field is exact at qps
    X = m.coords.T[:, m.connectivity.T]  # (3, K, E)
    xq = jnp.einsum("qk,dke->qde", phi, jnp.asarray(X))
    uq = jnp.einsum("qk,ke->qe", phi, ue)
    expect = 1 + 2 * xq[:, 0] - xq[:, 1] + 3 * xq[:, 2]
    np.testing.assert_allclose(np.asarray(uq), np.asarray(expect), atol=1e-10)


def test_face_geometry_surface_area_and_normals():
    m = box_hex_mesh(2, 2, 2, bounds=((0, 2), (0, 1), (0, 1)))
    faces = jnp.asarray(m.boundary_faces)
    psi, JxW, xyz, normals = face_geometry_factors(
        jnp.asarray(m.coords), faces, "QUAD4"
    )
    # total surface area of the 2x1x1 box = 2*(2*1 + 2*1 + 1*1) = 10
    np.testing.assert_allclose(float(JxW.sum()), 10.0, rtol=1e-12)
    # normals are outward: n . (centroid - box_center) > 0
    centr = np.asarray(xyz).mean(axis=1)
    center = np.array([1.0, 0.5, 0.5])
    n0 = np.asarray(normals)[:, 0, :]
    assert np.all(np.einsum("fd,fd->f", n0, centr - center) > 0)
