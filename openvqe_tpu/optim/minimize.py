"""Jit-resident minimization (device-side optimization loops).

The reference drives every optimization through scipy on the host, paying a
host<->simulator round trip per objective evaluation (SURVEY.md §3.1).  On a
TPU behind a dispatch tunnel that latency dominates small-system VQE, so the
whole optimize loop runs inside ONE jitted program here: optax L-BFGS (with
zoom linesearch) stepped by `lax.while_loop` until the gradient norm or
iteration budget is met.  One device call per optimization instead of
hundreds.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
import optax.tree_utils as otu


def lbfgs_minimize(fun: Callable, x0, tol: float = 1e-8, maxiter: int = 500,
                   memory_size: int = 10):
    """Minimize a scalar jittable ``fun(x)`` starting at x0.  Returns
    (x_opt, value, n_iters).  Fully traceable — usable inside jit.
    """
    opt = optax.lbfgs(memory_size=memory_size)
    value_and_grad = optax.value_and_grad_from_state(fun)

    def step(carry):
        params, state = carry
        value, grad = value_and_grad(params, state=state)
        updates, state = opt.update(grad, state, params, value=value,
                                    grad=grad, value_fn=fun)
        params = optax.apply_updates(params, updates)
        return params, state

    def cond(carry):
        _, state = carry
        count = otu.tree_get(state, "count")
        grad = otu.tree_get(state, "grad")
        err = otu.tree_l2_norm(grad)
        return (count == 0) | ((count < maxiter) & (err >= tol))

    x0 = jnp.asarray(x0, dtype=float)
    init_state = opt.init(x0)
    x_final, state = jax.lax.while_loop(cond, step, (x0, init_state))
    return x_final, fun(x_final), otu.tree_get(state, "count")


def make_jitted_minimizer(fun: Callable, tol: float = 1e-8,
                          maxiter: int = 500, memory_size: int = 10):
    """jit-compiled x0 -> (x_opt, value, iters) for a fixed objective."""
    @jax.jit
    def run(x0):
        return lbfgs_minimize(fun, x0, tol=tol, maxiter=maxiter,
                              memory_size=memory_size)
    return run
