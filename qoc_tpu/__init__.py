"""qoc_tpu — TPU-native quantum optimal control (GRAPE) framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
SchusterLab/quantum-optimal-control (GRAPE-Tensorflow): batched Taylor
matrix-exponential propagation on the MXU, parallel-in-time associative
scans, exact or reference-parity gradients, the full regularization stack,
Adam / (L-)BFGS / EVOLVE drivers, h5-compatible persistence, differential
verification, and a pod-scale multi-seed batch layer over jax.sharding
meshes.

Public surface mirrors the reference's star-import convenience
(quantum_optimal_control/__init__.py:1-4): ``from qoc_tpu import Grape``
plus the model-building kit.
"""

import os as _os

# Persistent XLA compilation cache: first-compile latency through the
# remote TPU runtime is 20-150s per program; with the cache, every repeat
# invocation (reruns, benchmarks, resumed jobs) loads compiled executables
# from disk instead.  Opt out with QOC_TPU_NO_COMPILE_CACHE=1; relocate
# with QOC_TPU_COMPILE_CACHE=<dir>.
if _os.environ.get("QOC_TPU_NO_COMPILE_CACHE", "") != "1":
    try:
        import jax as _jax

        import platform as _platform

        # per-hostname subdir: XLA:CPU AOT artifacts bake in machine
        # features and can SIGILL if loaded on a different host
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get(
                "QOC_TPU_COMPILE_CACHE",
                _os.path.expanduser(
                    "~/.cache/qoc_tpu_jax/" + _platform.node()),
            ),
        )
        # Cache even sub-second programs: through the tunneled runtime every
        # tiny eager-op compile (convert_element_type, add, ...) costs
        # ~0.4s, and a Grape run dispatches dozens of them.
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from .grape import Grape, GrapeResult
from .models.system import ControlProblem
from .models.gates import (
    qft, hadamard, Hadamard, rz, rx, transmon_gate, concerned, is_binary,
    hamming_distance, base_n, baseN, basis_string, Basis, bin_string, Bin,
)
from .models.operators import (
    kron_all, kron_all_reference, multi_kron, append_separate_krons,
    nn_chain_kron, annihilate, create, number,
    SIGMA_X, SIGMA_Y, SIGMA_Z, SIGMA_P, SIGMA_M,
)
from .models.dressed import (
    get_dressed_info, sort_ev, get_state_index, dressed_unitary,
)
from .ops.isomorphism import c_to_r_mat, c_to_r_vec, r_to_c_mat, r_to_c_vec

__version__ = "0.1.0"
