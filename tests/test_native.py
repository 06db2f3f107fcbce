"""Native C++ snapshot codec: build, write, and parse-back checks."""

import numpy as np
import pytest

from navierstokessolver_tpu import native


@pytest.fixture(scope="module")
def lib():
    l = native.get_lib()
    if l is None:
        pytest.skip("native toolchain unavailable")
    return l


def _read_vtk_binary(path, nx, ny):
    """Minimal parser for the file we write: returns (vectors, scalars)."""
    data = open(path, "rb").read()
    n = nx * ny

    def grab(after: bytes, count: int):
        i = data.index(after) + len(after)
        raw = data[i:i + 4 * count]
        return np.frombuffer(raw, dtype=">f4").astype(np.float32)

    vec = grab(b"VECTORS velocity float\n", n * 3).reshape(n, 3)
    press = grab(b"LOOKUP_TABLE default\n", n)
    return vec, press


def test_vtk_binary_roundtrip(tmp_path, lib):
    nx, ny = 6, 4
    r = np.random.default_rng(0)
    ux = r.normal(size=(nx, ny)).astype(np.float32)
    uy = r.normal(size=(nx, ny)).astype(np.float32)
    p = r.normal(size=(nx, ny)).astype(np.float32)
    path = str(tmp_path / "t.vtk")
    ok = native.write_vtk_binary(
        path, (nx, ny), (0.1, 0.2), [ux, uy], {"pressure": p}, "test"
    )
    assert ok
    vec, press = _read_vtk_binary(path, nx, ny)
    # VTK is Fortran-ordered (x fastest)
    np.testing.assert_allclose(
        vec[:, 0], ux.reshape(-1, order="F"), rtol=1e-6
    )
    np.testing.assert_allclose(
        vec[:, 1], uy.reshape(-1, order="F"), rtol=1e-6
    )
    np.testing.assert_allclose(vec[:, 2], 0.0)
    np.testing.assert_allclose(press, p.reshape(-1, order="F"), rtol=1e-6)
    header = open(path, "rb").read(200)
    assert b"BINARY" in header
    assert b"DIMENSIONS 6 4 1" in header


def test_io_write_vtk_uses_native(tmp_path, lib):
    from navierstokessolver_tpu import io as io_mod
    from navierstokessolver_tpu.cases import make_case

    case = make_case("cavity", shape=(16, 16))
    st = case.initial_state()
    st, _ = case.sim.run_scan(st, 10)
    path = str(tmp_path / "s.npz")
    io_mod.write_snapshot(path, case.sim.grid, st, step=10, time=0.1, vtk=True)
    raw = open(str(tmp_path / "s.vtk"), "rb").read(200)
    assert b"BINARY" in raw  # native path, not the ASCII fallback
