"""scipy.optimize bridge for BFGS / L-BFGS-B (parity with run_session.py:119-196).

Each line-search probe is one jitted device evaluation returning
(reg_loss, grad) — weights are uploaded once per probe and only the
flattened grad/loss come back, the minimum possible host<->device traffic
for an out-of-graph optimizer (SURVEY.md section 7, hard part 6).

Reference semantics kept:
  * options {maxfun: max_iterations, gtol: min_grad, maxls: 40}
    (run_session.py:181);
  * on reaching conv_target the gradient is zeroed to force scipy
    termination (run_session.py:155-160);
  * L-BFGS-B gets float64-cast returns (run_session.py:164-165).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
from scipy.optimize import minimize

from .convergence import ConvergenceSettings


def run_scipy_optimizer(
    loss_fn: Callable,
    u0_base: np.ndarray,
    conv: ConvergenceSettings,
    method: str = "L-BFGS-B",
    callback: Optional[Callable] = None,
):
    """Minimize reg_loss over the base weights with a scipy optimizer.

    ``loss_fn(u_base) -> (reg_loss, ForwardOutput)``.
    ``callback(iteration, loss, reg_loss, grad_squared, unitary_scale,
    u_base)`` is invoked once per function evaluation (the reference's
    update_and_save cadence, run_session.py:162).

    Returns (u_base_opt [K, T], scipy_result).
    """
    shape = u0_base.shape

    vg = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

    state = {"iterations": 0, "ended": False}

    def fun(x):
        u = jnp.asarray(x.reshape(shape), dtype=jnp.float32)
        (reg_loss, out), grads = vg(u)
        g = np.asarray(grads, dtype=np.float64).ravel()
        loss = float(out.loss)
        rl = float(reg_loss)
        g2 = 0.5 * float(np.sum(g * g))
        if loss < conv.conv_target:
            state["ended"] = True
            g = 0.0 * g  # zero grads to terminate scipy (run_session.py:160)
        if callback is not None:
            callback(state["iterations"], loss, rl, g2,
                     float(out.unitary_scale), np.asarray(u))
        state["iterations"] += 1
        if method.upper() == "L-BFGS-B":
            return np.float64(rl), g
        return rl, g

    if method.upper() == "L-BFGS-B":
        options = {
            "maxfun": conv.max_iterations,
            "gtol": conv.min_grad,
            "maxls": 40,
        }
    else:
        options = {
            "maxiter": conv.max_iterations,
            "gtol": conv.min_grad,
            "disp": False,
        }
    res = minimize(
        fun,
        np.asarray(u0_base, dtype=np.float64).ravel(),
        method=method,
        jac=True,
        options=options,
    )
    u_opt = np.asarray(res["x"], dtype=np.float32).reshape(shape)
    return u_opt, res
