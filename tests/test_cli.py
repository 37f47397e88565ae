"""CLI: run a job spec end-to-end, verify it, plot it."""

import json
import os

import numpy as np
import pytest

from qoc_tpu.cli import load_config, main


def write_pi_pulse_config(tmp_path):
    cfg = {
        "H0": [[0.0, 0.0], [0.0, 0.0]],
        "Hops": [
            {"real": [[0, 1], [1, 0]]},
            {"real": [[0, 0], [0, 0]], "imag": [[0, -1], [1, 0]]},
        ],
        "Hnames": ["x", "y"],
        "U": [{"real": [0, 1]}],
        "total_time": 10.0,
        "steps": 60,
        "states_concerned_list": [{"real": [1, 0]}],
        "state_transfer": True,
        "maxA": [0.7, 0.7],
        "method": "Adam",
        "convergence": {"rate": 0.02, "update_step": 50,
                        "max_iterations": 300, "conv_target": 1e-4},
        "file_name": "cli_run",
        "save": True,
    }
    p = tmp_path / "job.json"
    p.write_text(json.dumps(cfg))
    return str(p)


def test_cli_run_verify_plot(tmp_path, capsys):
    cfg_path = write_pi_pulse_config(tmp_path)
    rc = main(["run", cfg_path, "--data-path", str(tmp_path), "--seed", "0"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    result = json.loads(out[-1])
    assert result["loss"] < 1e-3
    run_file = result["file_path"]
    assert os.path.exists(run_file)

    rc = main(["verify", run_file, "--atol", "1e-3"])
    assert rc == 0

    png = str(tmp_path / "dash.png")
    rc = main(["plot", run_file, "--out", png])
    assert rc == 0
    assert os.path.getsize(png) > 5000


def test_load_config_npz(tmp_path):
    np.savez(tmp_path / "mats.npz", H0=np.diag([0.0, 1.0]).astype(complex))
    cfg = {"H0": {"npz": "mats.npz", "key": "H0"}, "Hops": [],
           "state_transfer": False}
    p = tmp_path / "c.json"
    p.write_text(json.dumps(cfg))
    loaded = load_config(str(p))
    assert np.allclose(loaded["H0"], np.diag([0.0, 1.0]))
