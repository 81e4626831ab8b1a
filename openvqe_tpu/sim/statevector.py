"""Single-device JAX statevector engine.

The differentiable statevector core that unifies the reference's two state
representations (myQLM circuit jobs + scipy sparse `expm_multiply` chains —
SURVEY.md §0) into one jittable engine:

* Pauli-string application by index XOR + popcount sign (no matrices)
* exact single-term rotations exp(i a sigma) = cos a + i sin a * sigma
* Trotter-1 ansatz application as a `lax.scan` over compiled term arrays
* <psi|H|psi> and H|psi> over compiled Pauli sums
* reversible adjoint-mode gradient (O(1) state memory — re-walks the
  circuit backwards instead of storing per-step residuals), exposed through
  `jax.custom_vjp` so `jax.grad(energy)` works and replaces the reference's
  finite-difference BFGS oracle (get_energy_ucc.py:158-175)

Dtype policy: complex128 under x64 (CPU tests / parity checks), complex64 on
TPU for speed (set via ``default_cdtype``).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .compile import CompiledOpSequence, CompiledPauliSum


def default_cdtype():
    return jnp.complex128 if jax.config.read("jax_enable_x64") else jnp.complex64


# ------------------------------------------------------------- state setup

def hf_state(n: int, hf_init: int, dtype=None) -> np.ndarray:
    """|hf_init> one-hot statevector; hf_init bits use qubit0 = MSB
    (reference from_ket_to_vector, molecule_factory.py:494-499).

    Returned as a HOST numpy array: jitted closures capture it as a constant,
    and host constants avoid the complex-D2H path the axon TPU backend lacks.
    """
    dtype = dtype or default_cdtype()
    np_c = np.complex128 if dtype == jnp.complex128 else np.complex64
    psi = np.zeros(1 << n, dtype=np_c)
    psi[hf_init] = 1.0
    return psi


def _indices(dim: int) -> jnp.ndarray:
    return jax.lax.iota(jnp.int32, dim)


# --------------------------------------------------------- pauli primitives

def pauli_apply_single(psi: jnp.ndarray, x: jnp.ndarray, z: jnp.ndarray,
                       kappa: jnp.ndarray) -> jnp.ndarray:
    """sigma|psi> for one compiled Pauli string (masks are traced scalars)."""
    idx = _indices(psi.shape[0])
    sgn = 1.0 - 2.0 * (jax.lax.population_count(idx & z) & 1).astype(jnp.float32)
    return (kappa * sgn.astype(psi.dtype)) * psi[idx ^ x]


def pauli_rotation(psi: jnp.ndarray, angle: jnp.ndarray, x: jnp.ndarray,
                   z: jnp.ndarray, kappa: jnp.ndarray) -> jnp.ndarray:
    """exp(i * angle * sigma) |psi> (exact: sigma^2 = I)."""
    return (jnp.cos(angle) * psi
            + (1j * jnp.sin(angle)) * pauli_apply_single(psi, x, z, kappa))


# ----------------------------------------------------------- ansatz apply

def apply_ops(psi: jnp.ndarray, theta: jnp.ndarray, x: jnp.ndarray,
              z: jnp.ndarray, kappa: jnp.ndarray, w: jnp.ndarray,
              op_index: jnp.ndarray, reverse: bool = False,
              sign: float = 1.0) -> jnp.ndarray:
    """Apply prod_t exp(i sign * theta[op(t)] w_t sigma_t) via scan.
    ``reverse=True`` walks the sequence backwards (used by the adjoint pass
    and exact un-computation)."""
    def step(p, term):
        xt, zt, kt, wt, ot = term
        angle = sign * theta[ot] * wt
        return pauli_rotation(p, angle, xt, zt, kt), None

    terms = (x, z, kappa, jnp.real(w), op_index)
    out, _ = jax.lax.scan(step, psi, terms, reverse=reverse)
    return out


# ------------------------------------------------------------- expectation

def ham_apply(psi: jnp.ndarray, x: jnp.ndarray, z: jnp.ndarray,
              a: jnp.ndarray, const: jnp.ndarray) -> jnp.ndarray:
    """H|psi> = const*psi + sum_k a_k sigma0_k|psi> where sigma0 is the bare
    (kappa-free) index-space action; a = w * kappa folds everything in."""
    idx = _indices(psi.shape[0])

    def step(acc, term):
        xt, zt, at = term
        sgn = 1.0 - 2.0 * (jax.lax.population_count(idx & zt) & 1).astype(jnp.float32)
        return acc + (at * sgn.astype(psi.dtype)) * psi[idx ^ xt], None

    acc0 = const * psi
    out, _ = jax.lax.scan(step, acc0, (x, z, a))
    return out


def expectation(psi: jnp.ndarray, x: jnp.ndarray, z: jnp.ndarray,
                a: jnp.ndarray, const: jnp.ndarray) -> jnp.ndarray:
    """<psi|H|psi> (real part)."""
    idx = _indices(psi.shape[0])

    def step(acc, term):
        xt, zt, at = term
        sgn = 1.0 - 2.0 * (jax.lax.population_count(idx & zt) & 1).astype(jnp.float32)
        val = jnp.vdot(psi, sgn.astype(psi.dtype) * psi[idx ^ xt])
        return acc + at * val, None

    tot, _ = jax.lax.scan(step, jnp.asarray(0.0, psi.dtype) + const, (x, z, a))
    return jnp.real(tot)


# ------------------------------------------------- energy with adjoint grad

def build_energy_fn(psi0, seq: CompiledOpSequence, ham: CompiledPauliSum,
                    cdtype=None):
    """Return jitted ``energy(theta)`` with a reversible adjoint-mode custom
    VJP (O(1) state memory: the backward pass un-applies rotations instead of
    storing per-step residuals — the key TPU memory design choice vs. naive
    autodiff through the scan)."""
    cdtype = cdtype or default_cdtype()
    sx, sz, sk, sw, sop = seq_as_device(seq, cdtype)
    hx, hz, ha, hconst = as_device(ham, cdtype)

    def _forward(theta):
        return apply_ops(psi0, theta, sx, sz, sk, sw, sop)

    @jax.custom_vjp
    def energy(theta):
        return expectation(_forward(theta), hx, hz, ha, hconst)

    def fwd(theta):
        psi = _forward(theta)
        e = expectation(psi, hx, hz, ha, hconst)
        return e, (theta, psi)

    def bwd(res, g):
        theta, psi = res
        lam = ham_apply(psi, hx, hz, ha, hconst)

        # Reverse walk.  At step t the carry holds (psi_t, lam_t) — the state
        # and adjoint *after* rotation t.  The gradient of a_t = theta*w_t is
        #   dE/da_t = -2 Im <lam_t | sigma_t | psi_t>
        # then both vectors are un-rotated to level t-1.
        def step(carry, term):
            p, l, grad = carry
            xt, zt, kt, wt, ot = term
            wr = jnp.real(wt)
            angle = theta[ot] * wr
            sig_p = pauli_apply_single(p, xt, zt, kt)
            gt = -2.0 * jnp.imag(jnp.vdot(l, sig_p)) * wr
            # un-rotate using the already-computed sigma|psi>:
            # R^dagger psi = cos(a) psi - i sin(a) sigma psi
            c, s = jnp.cos(angle), jnp.sin(angle)
            p_prev = c * p - (1j * s) * sig_p
            l_prev = pauli_rotation(l, -angle, xt, zt, kt)
            grad = grad.at[ot].add(gt)
            return (p_prev, l_prev, grad), None

        grad0 = jnp.zeros_like(theta)
        (_, _, grad), _ = jax.lax.scan(step, (psi, lam, grad0),
                                       (sx, sz, sk, sw, sop), reverse=True)
        return (grad * g,)

    energy.defvjp(fwd, bwd)
    return jax.jit(energy), jax.jit(_forward)


# -------------------------------------------------- batched ADAPT screening

def pool_overlaps(psi: jnp.ndarray, sigma: jnp.ndarray, x: jnp.ndarray,
                  z: jnp.ndarray, a: jnp.ndarray, op_index: jnp.ndarray,
                  n_ops: int) -> jnp.ndarray:
    """v_i = <sigma| A_i |psi> for every pool operator in ONE fused pass.

    Replaces the reference's per-operator sparse-matvec screening loops
    (adapt/fermionic_adapt_vqe.py:110-122, adapt/qubit_adapt_vqe.py:462-470
    — the latter even rebuilds each operator's 2^n CSR matrix every outer
    iteration).  Fermionic ADAPT uses g_i = 2*Re(v_i); qubit ADAPT uses
    g_i = 2*|Re part of <bra H A psi>| (reference qubit_adapt_vqe.py:126-150).
    """
    idx = _indices(psi.shape[0])

    def step(acc, term):
        xt, zt, at, ot = term
        sgn = 1.0 - 2.0 * (jax.lax.population_count(idx & zt) & 1).astype(jnp.float32)
        val = at * jnp.vdot(sigma, sgn.astype(psi.dtype) * psi[idx ^ xt])
        return acc.at[ot].add(val), None

    acc0 = jnp.zeros(n_ops, dtype=psi.dtype)
    out, _ = jax.lax.scan(step, acc0, (x, z, a, op_index))
    return out


def build_pool_gradient_fn(seq: CompiledOpSequence, ham: CompiledPauliSum,
                           cdtype=None):
    """jitted (psi -> complex overlaps v_i) for a fixed pool + Hamiltonian."""
    cdtype = cdtype or default_cdtype()
    px, pz, pk, pw, pop = seq_as_device(seq, cdtype)
    pa = pw * pk
    hx, hz, ha, hconst = as_device(ham, cdtype)
    n_ops = seq.n_ops

    @jax.jit
    def grads(psi):
        sigma = ham_apply(psi, hx, hz, ha, hconst)
        v = pool_overlaps(psi, sigma, px, pz, pa, pop, n_ops)
        # stacked (re, im) so the result can cross to host on backends
        # without complex D2H support
        return jnp.stack([jnp.real(v), jnp.imag(v)])

    def grads_host(psi) -> np.ndarray:
        out = np.asarray(grads(psi))
        return out[0] + 1j * out[1]

    return grads_host


# -------------------------------------------------------------- gate layer

def apply_x(psi: jnp.ndarray, q: int, n: int) -> jnp.ndarray:
    idx = _indices(psi.shape[0])
    return psi[idx ^ (1 << (n - 1 - q))]


def apply_rx(psi, theta, q: int, n: int):
    mask = 1 << (n - 1 - q)
    return pauli_rotation(psi, -theta / 2.0, jnp.int32(mask), jnp.int32(0),
                          jnp.asarray(1.0, psi.dtype))


def apply_ry(psi, theta, q: int, n: int):
    mask = 1 << (n - 1 - q)
    # Y: x-mask and z-mask both set; kappa = -i
    return pauli_rotation(psi, -theta / 2.0, jnp.int32(mask), jnp.int32(mask),
                          jnp.asarray(-1j, psi.dtype))


def apply_rz(psi, theta, q: int, n: int):
    mask = 1 << (n - 1 - q)
    return pauli_rotation(psi, -theta / 2.0, jnp.int32(0), jnp.int32(mask),
                          jnp.asarray(1.0, psi.dtype))


def apply_h(psi, q: int, n: int):
    mask = 1 << (n - 1 - q)
    idx = _indices(psi.shape[0])
    bit = (idx & mask) != 0
    flipped = psi[idx ^ mask]
    s = jnp.asarray(1.0 / np.sqrt(2.0), psi.dtype)
    return s * jnp.where(bit, flipped - psi, psi + flipped)


def apply_cnot(psi, control: int, target: int, n: int):
    idx = _indices(psi.shape[0])
    cmask = 1 << (n - 1 - control)
    tmask = 1 << (n - 1 - target)
    src = jnp.where((idx & cmask) != 0, idx ^ tmask, idx)
    return psi[src]


# ------------------------------------------------------------ host wrappers
#
# Operator arrays are kept as HOST numpy arrays and closed over by jitted
# functions (embedded as constants at trace time).  This matters on the axon
# TPU backend: device->host transfer of complex arrays is UNIMPLEMENTED
# there, and capturing a *device* complex array as a jit constant triggers
# exactly such a transfer during lowering.  Host->device works fine.

def as_device(csum: CompiledPauliSum, cdtype=None):
    cdtype = cdtype or default_cdtype()
    np_c = np.complex128 if cdtype == jnp.complex128 else np.complex64
    return (csum.x, csum.z, csum.coeffs().astype(np_c),
            np.asarray(csum.const, dtype=np_c))


def seq_as_device(seq: CompiledOpSequence, cdtype=None):
    cdtype = cdtype or default_cdtype()
    np_c = np.complex128 if cdtype == jnp.complex128 else np.complex64
    return (seq.x, seq.z, seq.kappa.astype(np_c), seq.w.astype(np_c),
            seq.op_index)


def to_host(psi: jnp.ndarray) -> np.ndarray:
    """Complex statevector -> host numpy via separate real/imag transfers
    (complex D2H is unimplemented on the axon TPU backend)."""
    re = np.asarray(jnp.real(psi), dtype=np.float64)
    im = np.asarray(jnp.imag(psi), dtype=np.float64)
    return re + 1j * im
