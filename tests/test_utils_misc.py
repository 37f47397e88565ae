"""Profiling utilities and misc coverage."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def test_time_fn_reports_compile_and_steady():
    from qoc_tpu.utils.profiling import time_fn

    f = jax.jit(lambda x: jnp.sum(x * x))
    out = time_fn(f, jnp.ones(1000), iters=5)
    assert out["compile_s"] >= out["mean_s"] * 0  # sane fields
    assert out["iters_per_sec"] > 0


@pytest.mark.slow
def test_trace_writes_profile(tmp_path):
    from qoc_tpu.utils.profiling import trace

    f = jax.jit(lambda x: x + 1)
    with trace(str(tmp_path)):
        jax.block_until_ready(f(jnp.ones(8)))
    import os

    found = []
    for root, _, files in os.walk(tmp_path):
        found.extend(files)
    assert found  # a trace file was produced


def test_memory_stats_shape():
    from qoc_tpu.utils.profiling import memory_stats

    stats = memory_stats()
    assert stats is None or isinstance(stats, dict)


def test_fidelity_f64_matches_scipy_oracle_state_transfer():
    """analysis.fidelity_f64 (our Taylor in float64) vs the independent
    scipy Pade propagator: algorithm-level agreement must be ~1e-12."""
    import qoc_tpu as q
    from qoc_tpu.models.system import ControlProblem
    from qoc_tpu.utils.analysis import fidelity_f64
    from qoc_tpu.utils.verification import scipy_oracle_states

    H0 = np.zeros((2, 2), dtype=complex)
    Hops = [np.array(q.SIGMA_X, dtype=complex),
            np.array(q.SIGMA_Y, dtype=complex)]
    problem = ControlProblem.build(
        H0, Hops, ["x", "y"], [np.array([0, 1], dtype=complex)], 6.0, 50,
        [np.array([1, 0], dtype=complex)],
        state_transfer=True, maxA=[0.8, 0.8], seed=7)
    rng = np.random.default_rng(0)
    uks = 0.5 * rng.standard_normal((2, 50))
    f64 = fidelity_f64(problem, uks)
    fin = scipy_oracle_states(H0, Hops, uks, 6.0, 50,
                              np.array([1, 0], complex))[:, -1]
    F = abs(np.vdot(np.array([0, 1]), fin)) ** 2
    assert abs(f64 - F) < 1e-12, (f64, F)


def test_fidelity_f64_matches_scipy_oracle_unitary():
    import qoc_tpu as q
    from qoc_tpu.models.system import ControlProblem
    from qoc_tpu.utils.analysis import fidelity_f64
    from qoc_tpu.utils.verification import scipy_oracle_states

    H0 = 2 * np.pi * 0.05 * np.kron(np.array(q.SIGMA_Z), np.array(q.SIGMA_Z))
    XI = np.kron(np.array(q.SIGMA_X), np.eye(2)).astype(complex)
    IX = np.kron(np.eye(2), np.array(q.SIGMA_X)).astype(complex)
    CNOT = np.eye(4, dtype=complex)
    CNOT[2:, 2:] = [[0, 1], [1, 0]]
    problem = ControlProblem.build(
        H0, [XI, IX], ["xi", "ix"], CNOT, 8.0, 40, [0, 1, 2, 3],
        maxA=[1.0, 1.0], seed=2)
    rng = np.random.default_rng(1)
    uks = 0.4 * rng.standard_normal((2, 40))
    f64 = fidelity_f64(problem, uks)
    ov = 0.0 + 0.0j
    for v in range(4):
        e = np.zeros(4, complex)
        e[v] = 1
        fin = scipy_oracle_states(H0.astype(complex), [XI, IX], uks, 8.0, 40,
                                  e)[:, -1]
        ov += np.vdot(CNOT @ e, fin)
    F = abs(ov) ** 2 / 16
    assert abs(f64 - F) < 1e-12, (f64, F)


def test_fidelity_f64_applies_u0():
    """Non-identity U0 in unitary mode: fidelity_f64 must propagate from
    U0 like the device forward (round-5 advisor fix — it previously
    started from the raw initial vectors and was silently wrong), and it
    must also agree with the device loss readout."""
    import jax.numpy as jnp
    import qoc_tpu as q
    from qoc_tpu.models.forward import make_forward
    from qoc_tpu.models.system import ControlProblem
    from qoc_tpu.utils.analysis import fidelity_f64
    from qoc_tpu.utils.verification import scipy_oracle_states

    H0 = 2 * np.pi * 0.05 * np.array(q.SIGMA_Z, dtype=complex)
    SX = np.array(q.SIGMA_X, dtype=complex)
    SY = np.array(q.SIGMA_Y, dtype=complex)
    th = 0.4
    U0 = np.array([[np.cos(th), -1j * np.sin(th)],
                   [-1j * np.sin(th), np.cos(th)]])
    problem = ControlProblem.build(
        H0, [SX, SY], ["x", "y"], SX, 5.0, 30, [0, 1], U0=U0,
        maxA=[1.0, 1.0], seed=3)
    rng = np.random.default_rng(4)
    # bounded pulses so arcsin(uks/maxA) is exact for the device check
    uks = 0.8 * rng.uniform(-1.0, 1.0, (2, 30))

    f64 = fidelity_f64(problem, uks)
    # independent oracle: propagate U0 @ e_v, target SX @ e_v
    ov = 0.0 + 0.0j
    for v in range(2):
        e = np.zeros(2, complex)
        e[v] = 1
        fin = scipy_oracle_states(H0, [SX, SY], uks, 5.0, 30,
                                  U0 @ e)[:, -1]
        ov += np.vdot(SX @ e, fin)
    F = abs(ov) ** 2 / 4
    assert abs(f64 - F) < 1e-12, (f64, F)

    # and the on-device f32 loss agrees to the f32 floor
    forward, _ = make_forward(problem, engine="scan")
    u_base = np.arcsin(np.clip(uks, -1, 1))
    out = forward(jnp.asarray(u_base, dtype=jnp.float32))
    assert abs((1.0 - float(out.loss)) - f64) < 1e-5
