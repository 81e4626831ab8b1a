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
                   memory_size: int = 10,
                   patience: Optional[int] = None, ftol: float = 1e-6):
    """Minimize a scalar jittable ``fun(x)`` starting at x0.  Returns
    (x_opt, value, n_iters).  Fully traceable — usable inside jit.

    ``patience`` adds a PLATEAU stop: quit after that many consecutive
    iterations without the value improving by more than ``ftol``.  On f32
    objectives the gradient norm can sit at a rounding floor ABOVE ``tol``
    after the energy has fully converged — measured on the battery HEA
    benchmark, tol-only stopping burns the whole ``maxiter`` budget on
    such restarts (6.5 s/experiment) while the plateau stop exits in
    ~0.05 s at bitwise-identical converged energies.

    Returns the BEST-SEEN iterate, not the last: when the plateau stop
    fires, the final iterate can sit up to ~patience*ftol above the best
    encountered minimum, so the best (params, value) pair is carried
    through the loop and returned if the final iterate doesn't beat it.
    """
    opt = optax.lbfgs(memory_size=memory_size)
    value_and_grad = optax.value_and_grad_from_state(fun)

    def step(carry):
        params, state, best_params, best, since = carry
        value, grad = value_and_grad(params, state=state)
        best_params = jax.tree.map(
            lambda b, p: jnp.where(value < best, p, b), best_params, params)
        improved = value < best - ftol
        best = jnp.minimum(best, value)
        since = jnp.where(improved, 0, since + 1)
        updates, state = opt.update(grad, state, params, value=value,
                                    grad=grad, value_fn=fun)
        params = optax.apply_updates(params, updates)
        return params, state, best_params, best, since

    def cond(carry):
        _, state, _, _, since = carry
        count = otu.tree_get(state, "count")
        grad = otu.tree_get(state, "grad")
        err = otu.tree_l2_norm(grad)
        live = (count == 0) | ((count < maxiter) & (err >= tol))
        if patience is not None:
            live = live & (since < patience)
        return live

    x0 = jnp.asarray(x0, dtype=float)
    init_state = opt.init(x0)
    big = jnp.asarray(jnp.inf, x0.dtype)
    x_final, state, best_x, best_v, _ = jax.lax.while_loop(
        cond, step, (x0, init_state, x0, big, jnp.asarray(0, jnp.int32)))
    v_final = fun(x_final)
    x_out = jax.tree.map(lambda f, b: jnp.where(v_final <= best_v, f, b),
                         x_final, best_x)
    return x_out, jnp.minimum(v_final, best_v), otu.tree_get(state, "count")


def make_jitted_minimizer(fun: Callable, tol: float = 1e-8,
                          maxiter: int = 500, memory_size: int = 10):
    """jit-compiled x0 -> (x_opt, value, iters) for a fixed objective."""
    @jax.jit
    def run(x0):
        return lbfgs_minimize(fun, x0, tol=tol, maxiter=maxiter,
                              memory_size=memory_size)
    return run
