"""End-to-end ``Grape()`` public API on REAL TPU hardware.

tests/ runs the full API surface on CPU (interpret-mode kernels);
tests_tpu/test_{kernels,mega}_on_tpu.py validates the kernels on hardware.
This file closes the remaining gap: the PUBLIC API path on the chip —
auto-routing onto the fused mega kernel, h5 persistence, checkpoint
save/resume round-trip, independent-oracle verification (the discipline of
the reference's qutip_verification.py:75-86), and the leakage flagship
(reg_coeffs through ``Grape()``) agreeing with the CPU-validated XLA path.

Run:  python -m pytest tests_tpu/test_grape_on_tpu.py -q   (needs the TPU)
"""

import numpy as np
import pytest

import jax

import qoc_tpu as q
from qoc_tpu.ops.pallas_mega import mega_supported
from qoc_tpu.utils.verification import verify_run

H0_QUBIT = np.zeros((2, 2), dtype=complex)


def _pi_pulse(tmp_path, name, max_iterations, resume_from=None, seed=0):
    return q.Grape(
        H0_QUBIT, [q.SIGMA_X, q.SIGMA_Y], ["x", "y"],
        [np.array([0, 1], dtype=complex)], 10.0, 100,
        [np.array([1, 0], dtype=complex)],
        state_transfer=True, save=True, show_plots=False,
        file_name=name, data_path=str(tmp_path),
        convergence={"rate": 0.01, "update_step": 20,
                     "max_iterations": max_iterations,
                     "conv_target": 1e-12},
        maxA=[0.7, 0.7], seed=seed, method="Adam",
        resume_from=resume_from,
    )


def test_grape_pi_pulse_api_on_tpu(tmp_path):
    """Full public-API run on the chip: converges, auto-routes to the mega
    kernel, and the saved trajectory passes BOTH independent float64
    oracles (scipy Pade expm + adaptive ODE)."""
    res = _pi_pulse(tmp_path, "tpu_pi", 200)
    # grape.py:280-288 routing: engine='auto' + mega_supported + non-CPU
    # backend => the fused kernel ran this optimization
    assert jax.default_backend() != "cpu"
    assert mega_supported(res.problem)
    assert res.loss < 1e-3, res.loss
    assert res.iterations >= 200

    for oracle in ("scipy", "ode"):
        rep = verify_run(res.file_path, atol=1e-4, oracle=oracle)
        assert all(rep["all_close"]), (oracle, rep)
        assert max(rep["max_abs_diff"]) < 1e-4, (oracle, rep)


def test_grape_save_resume_roundtrip_on_tpu(tmp_path):
    """Checkpoint written by a TPU mega-kernel run resumes into a second
    TPU run and keeps optimizing (utils/checkpoint.py through the public
    API, on hardware)."""
    res1 = _pi_pulse(tmp_path, "tpu_resume_a", 60)
    it1, loss1 = res1.iterations, res1.loss
    res2 = _pi_pulse(tmp_path, "tpu_resume_b", 160,
                     resume_from=res1.file_path)
    assert res2.iterations > it1
    assert res2.loss <= loss1 + 1e-6, (res2.loss, loss1)


def test_grape_leakage_flagship_on_tpu(tmp_path):
    """The leakage flagship (forbidden-state costs + dwdt through
    reg_coeffs) on hardware: the mega kernel's in-kernel penalty path must
    reproduce the CPU-validated XLA scan path run on the SAME chip."""
    levels = 5
    a = q.annihilate(levels)
    ad = a.conj().T
    H0 = (-0.2 * 2 * np.pi / 2) * (ad @ ad @ a @ a)
    Hops = [a + ad, 1j * (a - ad)]
    X_gate = q.transmon_gate(q.SIGMA_X, levels)
    reg = {"forbidden_coeff_list": [10.0, 10.0, 10.0],
           "states_forbidden_list": [2, 3, 4], "dwdt": 0.001}
    kw = dict(
        reg_coeffs=reg,
        convergence={"rate": 0.02, "update_step": 50,
                     "max_iterations": 100, "conv_target": 1e-12},
        maxA=[2.0, 2.0], seed=0, method="Adam",
        show_plots=False, save=False,
    )
    res_mega = q.Grape(H0, Hops, ["x", "y"], X_gate, 6.0, 100, [0, 1],
                       engine="auto", **kw)
    assert mega_supported(res_mega.problem, reg)  # the fast path ran
    res_xla = q.Grape(H0, Hops, ["x", "y"], X_gate, 6.0, 100, [0, 1],
                      engine="scan", **kw)
    # same 100-iteration trajectory from both implementations on device
    np.testing.assert_allclose(res_mega.loss, res_xla.loss,
                               rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(res_mega.u_base), np.asarray(res_xla.u_base), atol=5e-3)
    np.testing.assert_allclose(res_mega.uks, res_xla.uks, atol=5e-3)
