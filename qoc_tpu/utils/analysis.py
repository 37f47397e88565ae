"""Readout: device arrays -> complex numpy + h5 appends.

Replaces core/analysis.py.  The reference's Analysis `.eval()`s live-session
tensors; here the forward model returns concrete arrays, so this module only
converts representations and persists the same h5 schema (error, reg_error,
uks, iteration, run_time, unitary_scale, final_state, inter_vecs_raw_*,
inter_vecs_mag_squared, inter_vecs_real/imag; run_session.py:129-137,
analysis.py:26-101).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..models.dressed import sort_ev
from ..models.system import ControlProblem
from ..ops.isomorphism import r_to_c_mat
from .h5 import H5File


def uks_from_base(problem: ControlProblem, u_base: np.ndarray) -> np.ndarray:
    """Physical pulse amplitudes maxA * sin(base) [K, T] (run_session.py:112-117)."""
    return np.asarray(problem.ops_max_amp)[:, None] * np.sin(np.asarray(u_base))


def final_state_to_complex(problem: ControlProblem, final_state: np.ndarray):
    """Final unitary (or stacked final vectors) back to complex (analysis.py:18-35)."""
    M = np.asarray(final_state)
    n = problem.state_num
    if problem.state_transfer:
        return M[:n, :] + 1j * M[n : 2 * n, :]
    return r_to_c_mat(M)


def inter_vecs_to_complex(problem: ControlProblem, inter_vecs: np.ndarray):
    """[T+1, 2N, V] real iso -> [V, N, T+1] complex, the reference's
    per-initial-vector layout (analysis.py:60-70)."""
    n = problem.state_num
    v = np.asarray(inter_vecs)
    vc = v[:, :n, :] + 1j * v[:, n : 2 * n, :]  # [T+1, N, V]
    return np.transpose(vc, (2, 1, 0))  # [V, N, T+1]


def populations(problem: ControlProblem, inter_vecs: np.ndarray):
    """|psi|^2 per level over time, dressed-rotated when applicable
    (analysis.py:55-88).  Returns [V, N, T+1]."""
    vc = inter_vecs_to_complex(problem, inter_vecs)
    if problem.is_dressed:
        v_sorted = sort_ev(
            np.asarray(problem.dressed_info["eigenvectors"]),
            list(problem.dressed_info["dressed_id"]),
        )
        vc = np.einsum("ij,vjt->vit", np.transpose(v_sorted), vc)
    return np.square(np.abs(vc))


def append_metrics(
    file_path: str,
    *,
    error: float,
    reg_error: float,
    uks: np.ndarray,
    iteration: int,
    run_time: float,
    unitary_scale: float,
):
    """Per-update_step appends (run_session.py:129-137)."""
    with H5File(file_path, "a") as hf:
        hf.append("error", np.array(error))
        hf.append("reg_error", np.array(reg_error))
        hf.append("uks", np.array(uks))
        hf.append("iteration", np.array(iteration))
        hf.append("run_time", np.array(run_time))
        hf.append("unitary_scale", np.array(unitary_scale))


def append_evolution(
    file_path: str,
    problem: ControlProblem,
    final_state: Optional[np.ndarray],
    inter_vecs: Optional[np.ndarray],
):
    """Evolution snapshots (analysis.py:31-33, :62-99)."""
    with H5File(file_path, "a") as hf:
        if final_state is not None and not problem.state_transfer:
            hf.append("final_state", np.asarray(final_state))
        if inter_vecs is not None:
            vc = inter_vecs_to_complex(problem, inter_vecs)  # [V, N, T+1]
            hf.append("inter_vecs_raw_real", np.real(vc))
            hf.append("inter_vecs_raw_imag", np.imag(vc))
            pops = populations(problem, inter_vecs)
            hf.append("inter_vecs_mag_squared", pops)
            # dressed-rotated components (analysis.py:78-79, :98-99)
            vc_rot = vc
            if problem.is_dressed:
                v_sorted = sort_ev(
                    np.asarray(problem.dressed_info["eigenvectors"]),
                    list(problem.dressed_info["dressed_id"]),
                )
                vc_rot = np.einsum("ij,vjt->vit", np.transpose(v_sorted), vc)
            hf.append("inter_vecs_real", np.real(vc_rot))
            hf.append("inter_vecs_imag", np.imag(vc_rot))
