"""Transmon-cavity state transfer (BASELINE config 4).

Coupled qubit-oscillator system in the dressed (eigen)basis: prepare a
cavity Fock state from vacuum through the dispersive interaction, with
bandpass + speed-up costs and dressed-state bookkeeping
(system_parameters.py:75-80 semantics).

Run:  python examples/04_transmon_cavity.py
"""

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import qoc_tpu as q


def build_system(qubit_levels=3, cavity_levels=8):
    """Jaynes-Cummings-style transmon + cavity."""
    wq = 2 * np.pi * 3.9     # qubit frequency (GHz)
    wc = 2 * np.pi * 4.5     # cavity frequency
    alpha = -2 * np.pi * 0.2  # transmon anharmonicity
    g = 2 * np.pi * 0.1      # coupling

    aq = q.annihilate(qubit_levels)
    ac = q.annihilate(cavity_levels)
    Iq = np.eye(qubit_levels)
    Ic = np.eye(cavity_levels)

    nq = np.kron(aq.conj().T @ aq, Ic)
    nc = np.kron(Iq, ac.conj().T @ ac)
    kerr = np.kron(aq.conj().T @ aq.conj().T @ aq @ aq, Ic)
    coupling = np.kron(aq, Ic) @ np.kron(Iq, ac).conj().T
    coupling = coupling + coupling.conj().T

    H0 = wq * nq + wc * nc + (alpha / 2) * kerr + g * coupling
    drive_x = np.kron(aq + aq.conj().T, Ic)
    drive_y = np.kron(1j * (aq - aq.conj().T), Ic)
    return H0, [drive_x, drive_y], ["qx", "qy"]


def main():
    H0, Hops, Hnames = build_system()
    dim = len(H0)

    # dressed-state bookkeeping (grape_functions.py:9-24 semantics)
    w_c, v_c, dressed_id = q.get_dressed_info(H0)
    dressed_info = {
        "eigenvectors": v_c,
        "eigenvalues": np.real(w_c),
        "dressed_id": dressed_id,
        "is_dressed": True,
    }

    # |g,0> -> |g,1>: one cavity photon
    psi0 = np.zeros(dim, dtype=complex)
    psi0[q.get_state_index(0, dressed_id)] = 1
    psi0 = v_c[:, q.get_state_index(0, dressed_id)]
    target = v_c[:, q.get_state_index(1, dressed_id)]

    uks, Uf = q.Grape(
        H0, Hops, Hnames, [target], 20.0, 800, [psi0],
        state_transfer=True,
        dressed_info=dressed_info,
        reg_coeffs={
            "dwdt": 0.0001,
            "bandpass": 0.1, "band": [0.1, 10.0],
            "speed_up": 0.001,
        },
        convergence={"rate": 0.01, "update_step": 100,
                     "max_iterations": 5000, "conv_target": 1e-6},
        maxA=[2 * np.pi * 0.3] * 2,
        seed=0,
        method="Adam",
        show_plots=False,
        save=False,
    )
    print("pulse shape:", np.shape(uks))


if __name__ == "__main__":
    main()
