"""I/O tier: snapshots (npz/VTK), async writer, checkpoint/resume
(SURVEY.md SS5 checkpoint/resume + async snapshot streaming)."""

import os

import numpy as np
import pytest

from navierstokessolver_tpu import io as io_mod
from navierstokessolver_tpu.cases import make_case


@pytest.fixture(scope="module")
def sim_state():
    case = make_case("cavity", shape=(16, 16))
    st = case.initial_state()
    st, _ = case.sim.run_scan(st, 20)
    return case, st


def test_snapshot_npz_roundtrip(tmp_path, sim_state):
    case, st = sim_state
    path = str(tmp_path / "snap.npz")
    io_mod.write_snapshot(path, case.sim.grid, st, step=20, time=0.2)
    with np.load(path) as z:
        assert z["p"].shape == (16, 16)
        assert z["ux"].shape == (16, 16)
        assert z["vorticity"].shape == (15, 15)
        assert "__meta__" in z


def test_snapshot_vtk(tmp_path, sim_state):
    case, st = sim_state
    path = str(tmp_path / "snap.npz")
    io_mod.write_snapshot(path, case.sim.grid, st, step=20, time=0.2, vtk=True)
    vtk = str(tmp_path / "snap.vtk")
    # Header is ASCII in both the native BINARY codec and the text fallback.
    data = open(vtk, "rb").read()
    assert b"DATASET STRUCTURED_POINTS" in data
    assert b"VECTORS velocity float" in data
    assert b"SCALARS pressure float 1" in data


def test_async_writer(tmp_path, sim_state):
    case, st = sim_state
    w = io_mod.AsyncSnapshotWriter(str(tmp_path), case.sim.grid)
    for k in range(3):
        w.enqueue(st, step=k, time=k * 0.01)
    w.close()
    files = sorted(os.listdir(tmp_path))
    assert files == ["snap_00000000.npz", "snap_00000001.npz", "snap_00000002.npz"]


def test_checkpoint_roundtrip(tmp_path, sim_state):
    case, st = sim_state
    sim = case.sim
    h = io_mod.config_hash(sim.grid, sim.params)
    path = str(tmp_path / "ckpt.npz")
    io_mod.save_checkpoint(path, st, step=20, cfg_hash=h)
    st2, step = io_mod.load_checkpoint(path, sim.grid, h)
    assert step == 20
    np.testing.assert_array_equal(np.asarray(st2.p), np.asarray(st.p))
    # resuming continues identically to an unbroken run
    a, _ = sim.run_scan(st, 10)
    b, _ = sim.run_scan(st2, 10)
    np.testing.assert_allclose(np.asarray(a.u[0]), np.asarray(b.u[0]), atol=1e-7)


def test_checkpoint_config_mismatch(tmp_path, sim_state):
    case, st = sim_state
    sim = case.sim
    path = str(tmp_path / "ckpt.npz")
    io_mod.save_checkpoint(path, st, step=5, cfg_hash="deadbeef")
    with pytest.raises(ValueError, match="config hash"):
        io_mod.load_checkpoint(path, sim.grid, "cafebabe")


def test_cli_end_to_end(tmp_path):
    from navierstokessolver_tpu.cli import main

    out = str(tmp_path / "run")
    rc = main([
        "--case", "cavity", "--shape", "16,16", "--steps", "40",
        "--chunk", "20", "--out", out, "--snapshot-every", "20",
        "--checkpoint-every", "20",
    ])
    assert rc == 0
    files = os.listdir(out)
    assert "ckpt.npz" in files
    assert any(f.startswith("snap_") for f in files)
    # resume from the checkpoint
    rc = main([
        "--case", "cavity", "--shape", "16,16", "--steps", "20",
        "--chunk", "20", "--out", out, "--resume", os.path.join(out, "ckpt.npz"),
    ])
    assert rc == 0


def test_cli_sharded_devices(tmp_path):
    """--devices N drives the GSPMD domain-decomposed path end-to-end
    (virtual 8-device CPU mesh), including checkpointing a sharded state."""
    import jax

    if len(jax.devices()) < 4:
        import pytest

        pytest.skip("needs 4 virtual devices")
    from navierstokessolver_tpu.cli import main

    out = str(tmp_path / "run_sh")
    rc = main([
        "--case", "cavity", "--shape", "16,16", "--steps", "20",
        "--chunk", "10", "--out", out, "--devices", "4",
        "--checkpoint-every", "10",
    ])
    assert rc == 0
    assert "ckpt.npz" in os.listdir(out)


def test_snapshot_cadence_decoupled_from_chunk(tmp_path):
    """VERDICT r1 item 7: --snapshot-every 7 --chunk 200 emits exactly every
    7 steps, and enabling snapshots is bit-neutral on the trajectory."""
    from navierstokessolver_tpu.cli import main

    out_a = str(tmp_path / "with_snaps")
    rc = main([
        "--case", "cavity", "--shape", "16,16", "--steps", "21",
        "--chunk", "200", "--out", out_a, "--snapshot-every", "7",
        "--checkpoint-every", "1000",
    ])
    assert rc == 0
    snaps = sorted(f for f in os.listdir(out_a) if f.startswith("snap_"))
    assert snaps == ["snap_00000007.npz", "snap_00000014.npz",
                     "snap_00000021.npz"]

    out_b = str(tmp_path / "no_snaps")
    rc = main([
        "--case", "cavity", "--shape", "16,16", "--steps", "21",
        "--chunk", "200", "--out", out_b, "--checkpoint-every", "1000",
    ])
    assert rc == 0
    with np.load(os.path.join(out_a, "ckpt.npz")) as za, \
            np.load(os.path.join(out_b, "ckpt.npz")) as zb:
        for k in ("u0", "u1", "p"):
            np.testing.assert_array_equal(za[k], zb[k])


def test_cli_config_file(tmp_path):
    """--config JSON supplies case-builder overrides + reserved keys;
    explicit CLI flags win over the file."""
    import json

    from navierstokessolver_tpu.cli import main

    cfg = tmp_path / "run.json"
    cfg.write_text(json.dumps({
        "case": "cavity", "shape": [16, 16], "re": 250.0, "steps": 4,
    }))
    out = tmp_path / "o"
    rc = main(["--config", str(cfg), "--out", str(out),
               "--checkpoint-every", "4", "--chunk", "4"])
    assert rc == 0
    import numpy as np

    z = np.load(out / "ckpt.npz")
    assert int(z["step"]) == 4
    assert z["u0"].shape == (17, 16)

    # CLI flag beats the file value
    rc = main(["--config", str(cfg), "--shape", "12,12", "--steps", "2",
               "--out", str(out), "--checkpoint-every", "2", "--chunk", "2"])
    assert rc == 0
    z = np.load(out / "ckpt.npz")
    assert z["u0"].shape == (13, 12)
    assert int(z["step"]) == 2


def test_cli_config_file_with_case_flag(tmp_path):
    """--case combined with a config file that ALSO names a case: the flag
    wins and the file's reserved 'case' key must not leak into the case
    builder kwargs (regression: it crashed with an unexpected-kwarg
    TypeError)."""
    import json

    from navierstokessolver_tpu.cli import main

    cfg = tmp_path / "run.json"
    cfg.write_text(json.dumps({"case": "channel", "shape": [16, 16],
                               "steps": 2}))
    out = tmp_path / "o"
    rc = main(["--config", str(cfg), "--case", "cavity", "--out", str(out),
               "--checkpoint-every", "2", "--chunk", "2"])
    assert rc == 0
    import numpy as np

    z = np.load(out / "ckpt.npz")
    assert int(z["step"]) == 2
