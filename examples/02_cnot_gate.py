"""Two-qubit CNOT gate (BASELINE config 2).

Unitary-mode GRAPE: 4x4 target, four control Hamiltonians, smoothness +
envelope regularizers.

Run:  python examples/02_cnot_gate.py
"""

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import qoc_tpu as q


def main():
    I2 = np.eye(2)
    H0 = np.zeros((4, 4), dtype=complex)
    Hops = [
        np.kron(q.SIGMA_X, I2),      # X on qubit 1
        np.kron(I2, q.SIGMA_X),      # X on qubit 2
        np.kron(q.SIGMA_Y, I2),      # Y on qubit 1
        np.kron(q.SIGMA_X, q.SIGMA_X),  # XX coupling
    ]
    Hnames = ["xi", "ix", "yi", "xx"]
    CNOT = np.eye(4)[:, [0, 1, 3, 2]].astype(complex)

    uks, Uf = q.Grape(
        H0, Hops, Hnames, CNOT, 12.0, 600, [0, 1, 2, 3],
        reg_coeffs={"dwdt": 0.001, "envelope": 0.0001},
        convergence={"rate": 0.02, "update_step": 100,
                     "max_iterations": 5000, "conv_target": 1e-6},
        maxA=[1.0] * 4,
        seed=0,
        method="Adam",
        show_plots=False,
        save=False,
    )
    fid = np.abs(np.trace(CNOT.conj().T @ Uf)) / 4
    print(f"CNOT trace fidelity: {fid:.6f}")


if __name__ == "__main__":
    main()
