"""Spin-1/2 qubit pi pulse (BASELINE config 1).

State transfer |0> -> |1> with sigma_x / sigma_y drives — the minimal
end-to-end GRAPE problem.  Mirrors the reference examples repo's "spin Pi"
notebook (README.md:46 of the reference).

Run:  python examples/01_qubit_pi_pulse.py
"""

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import qoc_tpu as q


def main():
    H0 = np.zeros((2, 2), dtype=complex)
    Hops = [q.SIGMA_X, q.SIGMA_Y]
    Hnames = ["x", "y"]

    psi0 = [np.array([1, 0], dtype=complex)]   # start in |0>
    target = [np.array([0, 1], dtype=complex)]  # end in |1>

    total_time = 10.0   # ns (freq_unit GHz)
    steps = 1000

    uks, Uf = q.Grape(
        H0, Hops, Hnames, target, total_time, steps, psi0,
        state_transfer=True,
        convergence={"rate": 0.01, "update_step": 100,
                     "max_iterations": 5000, "conv_target": 1e-8},
        maxA=[2 * np.pi * 0.1] * 2,
        seed=0,
        method="Adam",
        show_plots=False,
        save=False,
    )
    print("optimized pulse shape:", np.shape(uks))


if __name__ == "__main__":
    main()
