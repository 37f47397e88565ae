"""Transmon with leakage (BASELINE config 3).

5-level qudit X gate: anharmonic drift, x/y drives, forbidden-state cost on
levels 2-4 to suppress leakage out of the computational subspace.

Run:  python examples/03_transmon_leakage.py
"""

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import qoc_tpu as q


def main():
    levels = 5
    anharmonicity = -0.2 * 2 * np.pi  # GHz, transmon-like

    a = q.annihilate(levels)
    ad = a.conj().T
    H0 = (anharmonicity / 2) * (ad @ ad @ a @ a)
    Hops = [a + ad, 1j * (a - ad)]
    Hnames = ["x", "y"]
    X_gate = q.transmon_gate(q.SIGMA_X, levels)

    uks, Uf = q.Grape(
        H0, Hops, Hnames, X_gate, 6.0, 300, [0, 1],
        reg_coeffs={
            "forbidden_coeff_list": [10.0, 10.0, 10.0],
            "states_forbidden_list": [2, 3, 4],
            "dwdt": 0.001,
        },
        convergence={"rate": 0.02, "update_step": 100,
                     "max_iterations": 5000, "conv_target": 1e-6},
        maxA=[2.0, 2.0],
        seed=0,
        method="Adam",
        show_plots=False,
        save=False,
    )
    comp = [0, 1]
    fid = np.abs(np.trace(
        X_gate[np.ix_(comp, comp)].conj().T @ Uf[np.ix_(comp, comp)])) / 2
    print(f"computational-subspace fidelity: {fid:.6f}")


if __name__ == "__main__":
    main()
