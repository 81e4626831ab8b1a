"""Lowering of PauliSum operators to flat device arrays.

The statevector engine never materializes operator matrices (the reference
builds 2^n x 2^n CSR matrices per pool operator,
molecule_factory_with_sparse.py:615-619 — the main scaling wall).  Instead a
PauliSum lowers to structure-of-arrays form:

    sigma_k = kappa_k * (X Z)-form:   sigma_k |i> acts as
    (sigma_k psi)_j = kappa_k * (-1)^popcount(j & z_k) * psi_{j XOR x_k}

with kappa_k = (-i)^{n_Y(k)}, so a Hermitian term is ``w_k * sigma_k`` with
real weight ``w_k``.  Masks are over the *amplitude index* (qubit 0 = MSB,
the reference's kron convention, molecule_factory.py:494-499).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np

from ..ops.pauli import PauliSum, _popcount, _reverse_mask


@dataclass
class CompiledPauliSum:
    """H = const + sum_k w_k * sigma_k (w complex in general, real if Hermitian)."""
    n: int
    x: np.ndarray        # int32 index XOR masks, shape (K,)
    z: np.ndarray        # int32 index sign masks
    kappa: np.ndarray    # complex64/128 per-term (-i)^nY
    w: np.ndarray        # complex weights (real part used for rotations)
    const: complex

    @property
    def n_terms(self) -> int:
        return len(self.x)

    def coeffs(self) -> np.ndarray:
        """a_k = w_k * kappa_k — the full complex coefficient of the
        (index-space) term used for expectation values."""
        return self.w * self.kappa


@dataclass
class CompiledOpSequence:
    """A parametrized product of Pauli rotations
    prod_t exp(-i theta_{op(t)} w_t sigma_t) — the Trotter-1 ansatz
    (reference builds this as a circuit per term via build_ucc_ansatz,
    get_energy_ucc.py:42-45).  The REALIZED rotation sign in the engine
    is exp(-i...): verified amplitude-level in tests/test_oracle.py
    (sim/oracle.py docstring explains why energy checks alone cannot
    tell the signs apart).

    Terms are stored in application order; ``op_index[t]`` maps each term to
    its variational parameter.
    """
    n: int
    x: np.ndarray
    z: np.ndarray
    kappa: np.ndarray
    w: np.ndarray        # complex weights; real part = rotation weight for
                         # Hermitian generators, full value used for pools
    op_index: np.ndarray  # int32, shape (K,)
    n_ops: int

    @property
    def n_terms(self) -> int:
        return len(self.x)


def compile_pauli_sum(ps: PauliSum, n: int | None = None,
                      tol: float = 1e-12) -> CompiledPauliSum:
    n = n if n is not None else ps.nbqbits
    xs: List[int] = []
    zs: List[int] = []
    kappas: List[complex] = []
    ws: List[complex] = []
    for (x, z), c in ps:
        if abs(c) <= tol:
            continue
        ny = _popcount(x & z)
        kappa = (-1j) ** (ny % 4)
        # stored form: c * X^x Z^z = c * (-i)^nY * sigma  => w = c * (-i)^nY
        w = c * ((-1j) ** (ny % 4))
        xs.append(_reverse_mask(x, n))
        zs.append(_reverse_mask(z, n))
        kappas.append(kappa)
        ws.append(w)
    return CompiledPauliSum(
        n=n,
        x=np.asarray(xs, dtype=np.int32),
        z=np.asarray(zs, dtype=np.int32),
        kappa=np.asarray(kappas, dtype=np.complex128),
        w=np.asarray(ws, dtype=np.complex128),
        const=complex(ps.constant_coeff),
    )


def compile_op_sequence(ops: Sequence[PauliSum], n: int,
                        hermitian_check: bool = True,
                        tol: float = 1e-9) -> CompiledOpSequence:
    """Lower a list of Hermitian generators G_i (each a PauliSum) to one flat
    rotation sequence realizing prod_i exp(-i theta_i G_i) under Trotter-1
    (the engine's realized sign — see CompiledOpSequence)."""
    xs: List[int] = []
    zs: List[int] = []
    kappas: List[complex] = []
    ws: List[complex] = []
    opidx: List[int] = []
    for i, ps in enumerate(ops):
        c = compile_pauli_sum(ps, n)
        if hermitian_check and np.max(np.abs(c.w.imag), initial=0.0) > tol:
            raise ValueError(f"generator {i} is not Hermitian "
                             f"(max imag weight {np.max(np.abs(c.w.imag)):.2e})")
        xs.extend(c.x.tolist())
        zs.extend(c.z.tolist())
        kappas.extend(c.kappa.tolist())
        ws.extend(c.w.tolist())
        opidx.extend([i] * c.n_terms)
    return CompiledOpSequence(
        n=n,
        x=np.asarray(xs, dtype=np.int32),
        z=np.asarray(zs, dtype=np.int32),
        kappa=np.asarray(kappas, dtype=np.complex128),
        w=np.asarray(ws, dtype=np.complex128),
        op_index=np.asarray(opidx, dtype=np.int32),
        n_ops=len(ops),
    )


def compile_pool(ops: Sequence[PauliSum], n: int) -> CompiledOpSequence:
    """Same lowering, used as a *batched pool* for ADAPT gradient screening —
    op_index doubles as the segment id for per-operator reductions
    (replaces the per-operator sparse matvec loop at
    adapt/fermionic_adapt_vqe.py:110-122)."""
    return compile_op_sequence(ops, n, hermitian_check=False)
