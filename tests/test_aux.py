"""Aux subsystems: checkpoint/resume, IDA, Kelly indicator + flagging."""

import numpy as np
import jax.numpy as jnp
import pytest

from rdcfes_tpu.fem.amr import flag_by_mean_stddev, kelly_error_indicator
from rdcfes_tpu.mesh import box_tet_mesh
from rdcfes_tpu.utils import (
    inverse_distance_interpolate,
    load_checkpoint,
    save_checkpoint,
)


def test_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "ckpt.npz")
    rng = np.random.default_rng(0)
    state = {
        "u": rng.random((10, 3)),
        "u_old": rng.random((10, 3)),
        "u_older": rng.random((10, 3)),
        "u_raw": rng.random((10, 3)),
    }
    params = {"dt": 0.1, "alpha": 2.0}
    save_checkpoint(path, state, step=42, time_value=4.2, params=params,
                    rt_total=np.ones(10))
    state2, step, t, extra = load_checkpoint(path, params)
    assert step == 42 and t == 4.2
    for k in state:
        np.testing.assert_array_equal(state2[k], state[k])
    np.testing.assert_array_equal(extra["rt_total"], np.ones(10))
    # wrong params -> refuse
    with pytest.raises(ValueError, match="different parameters"):
        load_checkpoint(path, {"dt": 0.2, "alpha": 2.0})


def test_inverse_distance():
    nodes = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0]])
    data = jnp.asarray([1.0, 3.0])
    # midpoint with coeff 2: equal weights
    v = inverse_distance_interpolate(jnp.asarray([0.5, 0.0, 0.0]), nodes, data)
    np.testing.assert_allclose(float(v), 2.0)
    # exact hit returns nodal value
    v = inverse_distance_interpolate(jnp.asarray([1.0, 0.0, 0.0]), nodes, data)
    np.testing.assert_allclose(float(v), 3.0)


def test_kelly_indicator_flags_gradient_jumps():
    """A field with a kink concentrates the indicator near the kink plane."""
    mesh = box_tet_mesh(6, 2, 2)
    x = mesh.coords[:, 0]
    u = np.where(x < 0.5, x, 0.5 + 3.0 * (x - 0.5))[:, None]  # slope 1 -> 3
    eta = kelly_error_indicator(mesh, jnp.asarray(u), [0])
    centers = mesh.coords[mesh.connectivity].mean(axis=1)
    near = np.abs(centers[:, 0] - 0.5) < 1.0 / 6.0
    assert eta[near].max() > 0
    assert eta[~near].max() < 1e-12, "smooth regions must have zero indicator"
    refine, coarsen = flag_by_mean_stddev(eta, 0.5, 0.1)
    assert refine.any() and refine.sum() < mesh.n_elems
    # refined elements are exactly the kink neighborhood
    assert set(np.nonzero(refine)[0]).issubset(set(np.nonzero(near)[0]))


def test_kelly_hex8_face_gradient():
    """HEX8 Kelly uses face-center gradients, not the qp-0 volume gradient:
    on a 2x1x1 hex pair with u = x on [0,1] and u = 1 + 3(x-1) on [1,2],
    the normal-flux jump at the shared face is exactly 2, so
    eta^2 = (h/24) * area * jump^2 = (1/24) * 1 * 4 per element."""
    from rdcfes_tpu.mesh import box_hex_mesh

    mesh = box_hex_mesh(2, 1, 1, bounds=((0.0, 2.0), (0.0, 1.0), (0.0, 1.0)))
    x = mesh.coords[:, 0]
    u = np.where(x < 1.0, x, 1.0 + 3.0 * (x - 1.0))[:, None]
    eta = kelly_error_indicator(mesh, jnp.asarray(u), [0])
    np.testing.assert_allclose(eta, np.sqrt(4.0 / 24.0), rtol=1e-12)

    # a y-dependent field bends the trilinear gradient within each element;
    # the face-center sample must still see the exact midline jump 2*(1+y)
    # at y = 0.5 -> jump 3, eta^2 = 9/24
    u2 = (np.where(x < 1.0, x, 1.0 + 3.0 * (x - 1.0))
          * (1.0 + mesh.coords[:, 1]))[:, None]
    eta2 = kelly_error_indicator(mesh, jnp.asarray(u2), [0])
    np.testing.assert_allclose(eta2, np.sqrt(9.0 / 24.0), rtol=1e-12)


def test_exodus_writer_roundtrip(tmp_path):
    """ExodusII export (reference surface: ExodusII_IO write,
    src/process_mesh.C:169): dims/coords/connectivity re-read via NetCDF."""
    from scipy.io import netcdf_file

    from rdcfes_tpu.io.exodus import write_exodus

    m = box_tet_mesh(2, 2, 2)
    path = str(tmp_path / "m.ex2")
    write_exodus(path, m, nodal_fields=[("u", np.arange(m.n_nodes) * 1.0)])
    f = netcdf_file(path, "r")
    assert f.variables["coord"].shape == (3, m.n_nodes)
    assert f.variables["connect1"].shape == (m.n_elems, 4)
    assert f.variables["connect1"].elem_type == b"TETRA4"
    np.testing.assert_allclose(f.variables["coord"][:].T, m.coords)
    np.testing.assert_allclose(
        f.variables["vals_nod_var1"][0], np.arange(m.n_nodes) * 1.0
    )
    f.close()
