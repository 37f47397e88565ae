"""True checkpoint/resume of optimization state.

The reference writes run files but can never resume them — its
tf.train.Saver is dead code (SURVEY.md section 5: tensorflow_state.py:358
"created but never saves or restores"; users could only re-feed saved uks
as an initial_guess, losing optimizer momenta).  Here the FULL optimizer
state (pulse weights + Adam moments + decayed learning rate + iteration
counter) round-trips through the same h5 run file, so a killed run
continues exactly where it stopped.

Layout: leaves of the flattened (u_base, opt_state) pytree stored as
``ckpt_leaf_%d`` datasets plus ``ckpt_iteration`` — restored against a
freshly initialized state's treedef (structural schema, robust to optax
internals as long as the optimizer chain matches).
"""

from __future__ import annotations

from typing import Any, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .h5 import H5File


def save_checkpoint(file_path: str, u_base, opt_state, iteration: int):
    """Overwrite the checkpoint datasets in a run file."""
    leaves = jax.tree_util.tree_leaves((u_base, opt_state))
    with H5File(file_path, "a") as hf:
        hf.add("ckpt_iteration", int(iteration))
        hf.add("ckpt_num_leaves", len(leaves))
        for i, leaf in enumerate(leaves):
            hf.add("ckpt_leaf_%d" % i, np.asarray(leaf))


def load_checkpoint(file_path: str, template_u_base, template_opt_state
                    ) -> Tuple[Any, Any, int]:
    """Restore (u_base, opt_state, iteration) against template pytrees."""
    import h5py

    template = (template_u_base, template_opt_state)
    leaves, treedef = jax.tree_util.tree_flatten(template)
    with h5py.File(file_path, "r") as hf:
        if "ckpt_iteration" not in hf:
            raise ValueError(f"{file_path} contains no checkpoint")
        n = int(np.array(hf["ckpt_num_leaves"]))
        if n != len(leaves):
            raise ValueError(
                f"checkpoint has {n} leaves but optimizer state has "
                f"{len(leaves)} — optimizer/problem mismatch"
            )
        new_leaves = []
        for i, tmpl in enumerate(leaves):
            arr = np.array(hf["ckpt_leaf_%d" % i])
            tmpl_arr = jnp.asarray(tmpl)
            if tuple(arr.shape) != tuple(tmpl_arr.shape):
                raise ValueError(
                    f"checkpoint leaf {i} shape {arr.shape} != "
                    f"expected {tmpl_arr.shape}"
                )
            new_leaves.append(jnp.asarray(arr, dtype=tmpl_arr.dtype))
        iteration = int(np.array(hf["ckpt_iteration"]))
    u_base, opt_state = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return u_base, opt_state, iteration


def has_checkpoint(file_path: str) -> bool:
    import h5py

    try:
        with h5py.File(file_path, "r") as hf:
            return "ckpt_iteration" in hf
    except (OSError, IOError):
        return False
