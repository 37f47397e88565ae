"""The forward model: pulse weights -> propagation -> loss + metrics.

Pure-functional replacement for the reference's graph assembly
(tensorflow_state.py:323-340 `init_training_loss` + the propagation wiring
in `build_graph`, :366-394).  ``make_forward`` closes over a
``ControlProblem`` and returns pure functions suitable for jit / grad /
vmap / shard_map.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.expm import HIGHEST
from ..ops.inner_products import inner_product_2d
from ..ops.propagation import evolve_unitary, pick_engine, state_transfer_chain
from .costs import CostContext, total_reg_cost
from .system import ControlProblem


class ForwardOutput(NamedTuple):
    loss: jnp.ndarray          # fidelity loss 1 - F
    reg_loss: jnp.ndarray      # loss + penalties (the optimization target)
    unitary_scale: jnp.ndarray # unitarity diagnostic (tensorflow_state.py:225,:335)
    final_state: jnp.ndarray   # [2N, 2N] final unitary, or [2N, V] final vecs
    inter_vecs: Optional[jnp.ndarray]  # [T+1, 2N, V] or None
    ops_weight: jnp.ndarray    # [K, T] normalized weights sin(base)


INTER_VEC_COSTS = ("forbidden_coeff_list", "forbidden", "speed_up")


def make_forward(
    problem: ControlProblem,
    reg_coeffs: Optional[dict] = None,
    gradient_mode: str = "exact",
    engine: str = "auto",
    remat: bool = False,
    lean: bool = False,
):
    """Build the pure forward function ``u_base [K,T] -> ForwardOutput``.

    ``lean=True`` builds the *optimization* forward: intermediate states are
    only materialized (and differentiated through) when a selected cost
    actually reads them — otherwise the chain reduces straight to the final
    state via the product tree.  The default (lean=False) is the *analysis*
    forward and always emits inter_vecs when use_inter_vecs (the
    reference's plotting/h5 contract, tensorflow_state.py:381-384).
    """
    p = problem
    mats = jnp.asarray(p.mats)
    U0 = jnp.asarray(p.U0_iso)
    psi0 = jnp.asarray(p.initial_vectors)
    target_vecs = jnp.asarray(p.target_vectors)
    max_amp = jnp.asarray(p.ops_max_amp)
    one_minus_gauss = jnp.asarray(p.one_minus_gauss)
    v_sorted_iso = (
        jnp.asarray(p.v_sorted_iso) if p.v_sorted_iso is not None else None
    )
    # Keep the raw engine string: state_transfer_chain has its own
    # backend-aware ladder (tree/associative/scan); only the XLA unitary
    # chain needs a concrete associative-vs-scan choice.
    unitary_engine = (
        pick_engine(2 * p.state_num, p.steps) if engine == "auto" else engine
    )

    # does any selected cost need the intermediate states?
    if lean:
        needs_inter = p.use_inter_vecs and any(
            k in (reg_coeffs or {}) for k in INTER_VEC_COSTS
        )
    else:
        needs_inter = p.use_inter_vecs
    N = p.state_num

    def forward(u_base: jnp.ndarray, mats_in: jnp.ndarray | None = None) -> ForwardOutput:
        """mats_in overrides the closed-over generators — the hook the
        pod-scale Hamiltonian-sweep layer (parallel/batch.py) vmaps over."""
        mats_ = mats if mats_in is None else mats_in
        ops_weight = jnp.sin(u_base)  # hard |u| <= maxA bound (tensorflow_state.py:176)
        amps = max_amp[:, None] * ops_weight
        ones = jnp.ones((1, p.steps), dtype=amps.dtype)
        weights = jnp.concatenate([ones, amps], axis=0)  # [K+1, T], row 0 = drift

        if p.state_transfer:
            inter_vecs = state_transfer_chain(
                mats_, weights, psi0, p.taylor_terms,
                gradient_mode=gradient_mode, remat=remat, engine=engine,
                final_only=not needs_inter,
            )
            final_vecs = inter_vecs[-1]
            loss = 1.0 - inner_product_2d(final_vecs, target_vecs, N)
            unitary_scale = inner_product_2d(final_vecs, final_vecs, N)
            final_state = final_vecs
            if not needs_inter:
                inter_vecs = None
        else:
            from ..ops.propagation import evolve_unitary_tree
            from ..ops.pallas_tree import tree_chain_supported

            use_tree = (
                not needs_inter
                and gradient_mode == "exact"
                and (
                    engine == "tree"
                    or (
                        engine == "auto"
                        and jax.default_backend() != "cpu"
                        and tree_chain_supported(2 * N, p.steps)
                    )
                )
            )
            if use_tree:
                final_U = evolve_unitary_tree(
                    mats_, weights, U0, p.taylor_terms, p.taylor_scaling
                )
                inter_vecs = None
            else:
                final_U, inter_vecs = evolve_unitary(
                    mats_, weights, U0, psi0, p.taylor_terms, p.taylor_scaling,
                    gradient_mode=gradient_mode, engine=unitary_engine,
                    use_inter_vecs=needs_inter, remat=remat,
                )
            final_vecs = jnp.matmul(final_U, psi0, precision=HIGHEST)
            loss = 1.0 - inner_product_2d(final_vecs, target_vecs, N)
            unitary_scale = (0.5 / N) * jnp.sum(
                jnp.matmul(final_U.T, final_U, precision=HIGHEST)
            )
            final_state = final_U

        ctx = CostContext(
            ops_weight=ops_weight,
            inter_vecs=inter_vecs,
            target_vecs=target_vecs,
            state_num=N,
            steps=p.steps,
            dt=p.dt,
            total_time=p.total_time,
            one_minus_gauss=one_minus_gauss,
            v_sorted_iso=v_sorted_iso,
        )
        reg_loss = loss + total_reg_cost(ctx, reg_coeffs)
        return ForwardOutput(loss, reg_loss, unitary_scale, final_state,
                             inter_vecs, ops_weight)

    def loss_fn(u_base: jnp.ndarray, mats_in: jnp.ndarray | None = None):
        out = forward(u_base, mats_in)
        return out.reg_loss, out

    return forward, loss_fn
