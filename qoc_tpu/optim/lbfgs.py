"""Native on-device L-BFGS driver (optax.lbfgs with zoom linesearch).

The scipy bridge (optim/scipy_bridge.py) gives exact reference parity but
pays one host<->device round-trip per line-search probe
(run_session.py:119-127).  This driver keeps the entire quasi-Newton
optimization on device: optax.lbfgs carries the history/linesearch state,
``optax.value_and_grad_from_state`` reuses linesearch evaluations, and the
loop runs in segments like the Adam driver — the fast path promised by
SURVEY.md section 7's design translation table.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from .convergence import ConvergenceSettings


class LbfgsState(NamedTuple):
    u_base: jnp.ndarray
    opt_state: optax.OptState
    iteration: jnp.ndarray
    loss: jnp.ndarray
    reg_loss: jnp.ndarray
    grad_squared: jnp.ndarray
    unitary_scale: jnp.ndarray
    done: jnp.ndarray


def make_lbfgs_runner(loss_fn: Callable, conv: ConvergenceSettings,
                      memory_size: int = 15):
    """Build (init_state, run_segment) mirroring the Adam driver's API.

    ``loss_fn(u_base) -> (reg_loss, ForwardOutput)``.

    One fwd+bwd per iteration: the accepted linesearch evaluation is
    reused via ``optax.value_and_grad_from_state`` for both the update and
    the convergence predicates — no second full evaluation per step (the
    double-execution inefficiency SURVEY section 2.6 flags in the
    reference's Adam loop).  Aux metrics (fidelity loss, unitary_scale)
    are fetched once per *segment* with a single extra forward.  In-loop
    stopping therefore tests the objective (reg_loss) against
    ``conv_target``; the fidelity-loss test runs at every segment
    boundary, so with penalties active a run can overshoot the fidelity
    crossing by at most update_step-1 iterations (it keeps optimizing).
    """
    optimizer = optax.lbfgs(memory_size=memory_size)

    # scalar objective for the linesearch; aux metrics fetched per segment
    def scalar_loss(u):
        return loss_fn(u)[0]

    value_and_grad = optax.value_and_grad_from_state(scalar_loss)

    def cond(carry):
        s, stop_at = carry
        return jnp.logical_and(~s.done, s.iteration < stop_at)

    def body(carry):
        s, stop_at = carry
        # cached from the previous iteration's accepted linesearch point
        # (computed fresh only on the very first call)
        value, grad = value_and_grad(s.u_base, state=s.opt_state)
        g2 = 0.5 * jnp.sum(jnp.square(grad))
        converged = jnp.logical_or(
            value < conv.conv_target,
            jnp.logical_or(g2 < conv.min_grad,
                           s.iteration >= conv.max_iterations),
        )
        updates, opt_state = optimizer.update(
            grad, s.opt_state, s.u_base,
            value=value, grad=grad, value_fn=scalar_loss,
        )
        u_new = optax.apply_updates(s.u_base, updates)
        u_base = jnp.where(converged, s.u_base, u_new)
        opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(converged, old, new),
            opt_state, s.opt_state,
        )
        iteration = jnp.where(converged, s.iteration, s.iteration + 1)
        return (
            LbfgsState(u_base, opt_state, iteration, value, value, g2,
                       s.unitary_scale, converged),
            stop_at,
        )

    @jax.jit
    def run_segment(state: LbfgsState, stop_at) -> LbfgsState:
        s, _ = jax.lax.while_loop(cond, body, (state, stop_at))
        # aux metrics once per segment: ONE forward at the current iterate
        reg_loss, out = loss_fn(s.u_base)
        done = jnp.logical_or(
            s.done,
            jnp.logical_or(
                out.loss < conv.conv_target,
                jnp.logical_or(s.grad_squared < conv.min_grad,
                               s.iteration >= conv.max_iterations),
            ),
        )
        return s._replace(loss=out.loss, reg_loss=reg_loss,
                          unitary_scale=out.unitary_scale, done=done)

    def init_state(u_base) -> LbfgsState:
        u_base = jnp.asarray(u_base)
        zero = jnp.asarray(0.0, dtype=jnp.float32)
        return LbfgsState(
            u_base=u_base,
            opt_state=optimizer.init(u_base),
            iteration=jnp.asarray(0, dtype=jnp.int32),
            loss=zero + jnp.inf,
            reg_loss=zero + jnp.inf,
            grad_squared=zero + jnp.inf,
            unitary_scale=zero,
            done=jnp.asarray(False),
        )

    return init_state, run_segment
