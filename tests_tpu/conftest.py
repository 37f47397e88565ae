"""On-hardware test suite — runs the Pallas kernels on a REAL TPU chip.

The main suite (tests/) pins ``jax_platforms=cpu`` so every Pallas kernel
executes in interpret mode; this suite deliberately does not, so the real
Mosaic lowerings (pltpu.roll lane semantics, input/output aliasing,
vmem_limit_bytes, MXU precision=HIGHEST) are exercised with numeric
assertions, not just by the benchmark.  Run separately:

    python -m pytest tests_tpu/ -q

Every test is skipped when no accelerator is attached (CI without a chip).
Oracles are float64 *host-side numpy/scipy* (the discipline of the
reference's qutip_verification.py:75-80 — an independent integrator at
higher precision), plus the CPU-validated XLA paths run on the same chip.
"""

import numpy as np
import pytest

import jax


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() == "cpu":
        skip = pytest.mark.skip(reason="needs TPU hardware (backend is cpu)")
        for item in items:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(20260819)


def random_hermitian(n: int, rng, scale: float = 1.0) -> np.ndarray:
    a = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
    return scale * (a + a.conj().T) / 2.0


def state_problem(steps: int = 64, maxA=(0.7, 0.7), seed: int = 0):
    """2-level sigma_x/sigma_y state-transfer problem (the pi-pulse shape)."""
    import qoc_tpu as q
    from qoc_tpu.models.system import ControlProblem

    return ControlProblem.build(
        np.zeros((2, 2), dtype=complex), [q.SIGMA_X, q.SIGMA_Y], ["x", "y"],
        [np.array([0, 1], dtype=complex)], 2.0, steps,
        [np.array([1, 0], dtype=complex)],
        state_transfer=True, maxA=list(maxA), seed=seed,
    )


def unitary_problem(steps: int = 24, seed: int = 1):
    """2-level unitary problem with a real squaring branch (scaling=2)."""
    import qoc_tpu as q
    from qoc_tpu.models.system import ControlProblem

    return ControlProblem.build(
        np.zeros((2, 2), dtype=complex), [q.SIGMA_X, q.SIGMA_Y], ["x", "y"],
        q.SIGMA_X, 2.0, steps, [0, 1],
        maxA=[1.0, 1.0], seed=seed, Taylor_terms=[6, 2],
    )
