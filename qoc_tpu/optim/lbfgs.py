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
    """
    optimizer = optax.lbfgs(memory_size=memory_size)

    # scalar objective for the linesearch; metrics recomputed separately
    def scalar_loss(u):
        return loss_fn(u)[0]

    value_and_grad = optax.value_and_grad_from_state(scalar_loss)

    vg_full = jax.value_and_grad(loss_fn, has_aux=True)

    def cond(carry):
        s, stop_at = carry
        return jnp.logical_and(~s.done, s.iteration < stop_at)

    def body(carry):
        s, stop_at = carry
        value, grad = value_and_grad(s.u_base, state=s.opt_state)
        updates, opt_state = optimizer.update(
            grad, s.opt_state, s.u_base,
            value=value, grad=grad, value_fn=scalar_loss,
        )
        u_new = optax.apply_updates(s.u_base, updates)
        # metrics at the current iterate (pre-update, reference cadence)
        (reg_loss, out), g_raw = vg_full(s.u_base)
        g2 = 0.5 * jnp.sum(jnp.square(g_raw))
        converged = jnp.logical_or(
            out.loss < conv.conv_target,
            jnp.logical_or(g2 < conv.min_grad,
                           s.iteration >= conv.max_iterations),
        )
        u_base = jnp.where(converged, s.u_base, u_new)
        opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(converged, old, new),
            opt_state, s.opt_state,
        )
        iteration = jnp.where(converged, s.iteration, s.iteration + 1)
        return (
            LbfgsState(u_base, opt_state, iteration, out.loss, reg_loss, g2,
                       out.unitary_scale, converged),
            stop_at,
        )

    @jax.jit
    def run_segment(state: LbfgsState, stop_at) -> LbfgsState:
        out, _ = jax.lax.while_loop(cond, body, (state, stop_at))
        return out

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
