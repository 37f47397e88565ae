"""Pod batch layer: multi-seed optimization, Hamiltonian sweeps, and
sharded execution on the 8-device virtual CPU mesh (SURVEY.md section 4d)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import qoc_tpu as q
from qoc_tpu.models.system import ControlProblem
from qoc_tpu.ops.isomorphism import c_to_r_mat
from qoc_tpu.parallel.batch import batched_grape_adam, init_seeds
from qoc_tpu.parallel.mesh import batch_sharding, make_mesh


def pi_problem(steps=60):
    return ControlProblem.build(
        np.zeros((2, 2), dtype=complex), [q.SIGMA_X, q.SIGMA_Y], ["x", "y"],
        [np.array([0, 1], dtype=complex)], 8.0, steps,
        [np.array([1, 0], dtype=complex)],
        state_transfer=True, maxA=[0.8, 0.8], seed=0,
    )


CONV = {"rate": 0.02, "update_step": 50, "max_iterations": 400,
        "conv_target": 1e-4}


def test_multi_seed_converges():
    out = batched_grape_adam(pi_problem(), n_seeds=4, convergence=CONV, seed=0)
    assert out["losses"].shape == (4,)
    assert out["best_loss"] < 1e-4
    # most seeds should converge on this easy problem
    assert np.sum(out["losses"] < 1e-3) >= 3
    assert out["best_uks"].shape == (2, 60)


def test_per_seed_early_stop_freezes():
    """Converged seeds keep their pulse while others continue."""
    out = batched_grape_adam(pi_problem(), n_seeds=3, convergence=CONV, seed=1)
    assert out["converged"].dtype == bool


def test_seed_init_stats():
    p = pi_problem()
    u = init_seeds(p, 16, jax.random.PRNGKey(0))
    assert u.shape == (16, 2, 60)
    assert np.isclose(float(jnp.std(u)), 1 / np.sqrt(60), rtol=0.2)


def test_sharded_multi_seed(eight_devices):
    mesh = make_mesh()
    out = batched_grape_adam(
        pi_problem(steps=40), n_seeds=8, convergence=CONV, seed=0, mesh=mesh
    )
    assert out["best_loss"] < 1e-3


def test_hamiltonian_sweep():
    """Per-seed generator stacks: sweep the drift detuning."""
    p = pi_problem(steps=40)
    S = 4
    detunings = np.linspace(0.0, 0.15, S)
    mats_batch = []
    for delta in detunings:
        H0 = np.diag([0.0, delta]).astype(complex)
        mats = np.stack(
            [c_to_r_mat(-1j * p.dt * H0)]
            + [c_to_r_mat(-1j * p.dt * op) for op in [q.SIGMA_X, q.SIGMA_Y]]
        ).astype(np.float32)
        mats_batch.append(mats)
    out = batched_grape_adam(
        p, n_seeds=S, convergence=CONV, seed=0,
        mats_batch=np.stack(mats_batch),
    )
    # every detuning should still admit a near-perfect pi pulse
    assert np.all(out["losses"] < 1e-2)
