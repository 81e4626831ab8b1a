"""Device-resident Lanczos ground states (matrix-free, split-real planes).

Replaces the round-1 fidelity reference path that ran scipy ``eigsh`` with a
host-crossing matvec (VERDICT.md Weak #5: one full-state D2H per Lanczos
iteration — 16 MB per matvec through the axon tunnel at 20 qubits).  Here
the Krylov recurrence runs ENTIRELY on device; only the (alpha, beta)
tridiagonal scalars cross to the host.

Math: a Hermitian H acting on split-real planes (2, 2^n) is a REAL symmetric
operator on R^(2*2^n) (Re<u|H|v> is a real inner product; every eigenvalue
appears twice, spanned by |v> and i|v>), so plain real-arithmetic Lanczos
applies.  Memory is O(1) states via the classic TWO-PASS scheme: pass one
builds the tridiagonal keeping two basis vectors, the host solves the tiny
tridiagonal problem, pass two regenerates the basis and accumulates the
Ritz vector.  Restarting (v0 <- Ritz vector) recovers the orthogonality a
memoryless Lanczos loses.

Reference analog: dense ``numpy.linalg.eigh`` over the full 2^n matrix at
fermionic_adapt_vqe.py:474 — the reference's scaling wall.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

from . import statevector as sv


@jax.jit
def _dot(u, v):
    return jnp.sum(u * v)


@jax.jit
def _normalize(v):
    nrm = jnp.sqrt(jnp.sum(v * v))
    return v / nrm, nrm


@jax.jit
def _axpy(a, x, y):
    return a * x + y


def _lanczos_pass(matvec, v0, m: int, record: Optional[np.ndarray] = None,
                  acc=None):
    """One m-step Lanczos sweep from unit vector v0.

    record=None: returns (alphas, betas) host arrays (pass one).
    record=c:    accumulates acc += c_i q_i over the regenerated basis
                 (pass two) and returns acc.
    """
    alphas, betas = [], []
    q_prev = jnp.zeros_like(v0)
    q = v0
    beta_prev = 0.0
    for i in range(m):
        if record is not None:
            acc = _axpy(jnp.asarray(record[i], q.dtype), q, acc)
            if i == m - 1:
                break
        w = matvec(q)
        a = float(_dot(q, w))
        w = w - a * q - beta_prev * q_prev
        b = float(jnp.sqrt(_dot(w, w)))
        alphas.append(a)
        betas.append(b)
        if b < 1e-13:
            break
        q_prev = q
        q = w / b
        beta_prev = b
    if record is not None:
        return acc
    return np.asarray(alphas), np.asarray(betas)


def ground_state(matvec: Callable, n: int, m: int = 48, restarts: int = 30,
                 tol: float = 1e-9, dtype=None, seed: int = 7,
                 v0=None) -> Tuple[float, jax.Array]:
    """(E0, ground planes) of the Hermitian operator behind ``matvec``
    (planes -> planes), via restarted two-pass Lanczos on device."""
    rd = sv.default_rdtype() if dtype is None else dtype
    if v0 is None:
        rng = np.random.default_rng(seed)
        v0 = jnp.asarray(rng.normal(size=(2, 1 << n)).astype(rd))
    v0, _ = _normalize(jnp.asarray(v0))

    e_prev = np.inf
    for _ in range(restarts):
        alphas, betas = _lanczos_pass(matvec, v0, m)
        k = len(alphas)
        if k == 0:
            break
        w, vecs = scipy.linalg.eigh_tridiagonal(alphas, betas[: k - 1])
        e0, c = float(w[0]), vecs[:, 0]
        acc = jnp.zeros_like(v0)
        acc = _lanczos_pass(matvec, v0, k, record=c, acc=acc)
        v0, _ = _normalize(acc)
        if abs(e0 - e_prev) < tol:
            break
        e_prev = e0

    # Rayleigh quotient of the final Ritz vector (more reliable than the
    # last tridiagonal eigenvalue once converged)
    e_final = float(_dot(v0, matvec(v0)))
    return e_final, v0


@jax.jit
def fidelity(ground, psi):
    """|<ground|psi>|^2 for plane states, computed on device."""
    re, im = sv.overlap_re_im(ground, psi)
    n2g = jnp.sum(ground * ground)
    n2p = jnp.sum(psi * psi)
    return (re * re + im * im) / (n2g * n2p)
