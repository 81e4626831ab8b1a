"""Electronic-structure Hamiltonian IR and spin-orbital integral conversion.

Replaces ``qat.fermion.ElectronicStructureHamiltonian`` and the helpers
``convert_to_h_integrals`` / ``transform_integrals_to_new_basis`` /
``get_active_space_hamiltonian`` consumed by the reference
(molecule_factory.py:333,336-338,373-375,386-394).

Conventions:
    H = constant + sum_pq hpq a†_p a_q + 1/2 sum_pqrs hpqrs a†_p a†_q a_r a_s
with interleaved spin-orbitals (alpha = even, beta = odd), matching the
reference's qubit layout (noons/orbital energies are duplicated pairwise at
molecule_factory.py:343-346).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from .fermion import FermionOperator, FermionTerm
from .pauli import PauliSum
from .transforms import transform_operator


@dataclass
class ElectronicStructureHamiltonian:
    hpq: np.ndarray
    hpqrs: np.ndarray
    constant_coeff: float = 0.0

    @property
    def nbqbits(self) -> int:
        return self.hpq.shape[0]

    def to_fermion_operator(self, tol: float = 1e-12) -> FermionOperator:
        n = self.nbqbits
        terms: List[FermionTerm] = []
        for p in range(n):
            for q in range(n):
                c = self.hpq[p, q]
                if abs(c) > tol:
                    terms.append(FermionTerm(c, "Cc", [p, q]))
        for p in range(n):
            for q in range(n):
                for r in range(n):
                    for s in range(n):
                        c = 0.5 * self.hpqrs[p, q, r, s]
                        if abs(c) > tol:
                            terms.append(FermionTerm(c, "CCcc", [p, q, r, s]))
        return FermionOperator(n, terms, constant_coeff=self.constant_coeff)

    def to_spin(self, transform: str = "JW") -> PauliSum:
        return transform_operator(self.to_fermion_operator(), transform)

    def get_matrix(self, sparse: bool = False):
        """Dense/CSR matrix for small systems (reference
        molecule_factory_with_sparse.py:339-340). Test-scale only."""
        m = self.to_spin("JW").to_matrix()
        if sparse:
            import scipy.sparse as sp
            return sp.csr_matrix(m)
        return m


def convert_to_h_integrals(one_body: np.ndarray, two_body_phys: np.ndarray
                           ) -> Tuple[np.ndarray, np.ndarray]:
    """Spatial MO integrals -> interleaved spin-orbital (hpq, hpqrs).

    ``two_body_phys[p,q,r,s] = <pq|rs>`` (physicist).  The two-electron part
    becomes hpqrs[pσ, qτ, sτ, rσ] = <pq|rs> so that
    1/2 Σ hpqrs a†a†aa reproduces 1/2 Σ <pq|rs> a†_pσ a†_qτ a_sτ a_rσ.
    """
    n = one_body.shape[0]
    N = 2 * n
    hpq = np.zeros((N, N))
    hpqrs = np.zeros((N, N, N, N))
    for s_ in (0, 1):
        hpq[s_::2, s_::2] = one_body
    for sig in (0, 1):
        for tau in (0, 1):
            # indices: P=2p+sig, Q=2q+tau, R=2s+tau, S=2r+sig
            hpqrs[sig::2, tau::2, tau::2, sig::2] += two_body_phys.transpose(0, 1, 3, 2)
    return hpq, hpqrs


def transform_integrals_to_new_basis(one_body: np.ndarray, two_body_phys: np.ndarray,
                                     U: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Rotate spatial integrals into a new orbital basis |i'> = Σ_i U[i,i'] |i>."""
    h1 = U.T @ one_body @ U
    g = np.einsum("pqrs,pi,qj,rk,sl->ijkl", two_body_phys, U, U, U, U, optimize=True)
    return h1, g


def get_active_space_hamiltonian(
    one_body: np.ndarray,
    two_body_phys: np.ndarray,
    noons: List[float],
    n_elec: int,
    nuclear_repulsion: float,
    threshold_1: float = 2e-2,
    threshold_2: float = 2e-3,
) -> Tuple[ElectronicStructureHamiltonian, List[int], List[int]]:
    """NOON-threshold active-space selection with frozen-core folding
    (reference molecule_factory.py:386-394 / qat semantics).

    occupied: noon >= 2 - threshold_1 (frozen at occupation 2), but only
              while at least two electrons remain active — validated against
              the reference's own notebook outputs: H4 with
              threshold_1 = 2 - noons[0] freezes natural orbital 0 (6 active
              qubits, 2 active electrons, active VQE minimum -2.14996,
              reference demo_quccsd_active_space.ipynb) while H2/6-31G keeps
              all 8 qubits because freezing its orbital 0 would exhaust the
              2 electrons (demo_puccgsd_active_space.ipynb).
    active:   noon >= threshold_2 among the unfrozen orbitals (inclusive:
              both notebooks keep the boundary orbital whose noon EQUALS
              threshold_2 = noons[3]... H4 drops nothing further, H2 keeps
              all four).
    """
    noons = list(noons)
    occ_inds: List[int] = []
    for i, w in enumerate(noons):      # noons descending: prefix freeze
        if w >= 2.0 - threshold_1 and 2 * (len(occ_inds) + 1) <= n_elec - 2:
            occ_inds.append(i)
        else:
            break
    active_inds = [i for i, w in enumerate(noons)
                   if i not in occ_inds and w >= threshold_2]
    if not active_inds:
        raise ValueError("active space selection produced no active orbitals")
    ham = freeze_orbitals(one_body, two_body_phys, occ_inds, active_inds,
                          nuclear_repulsion)
    return ham, active_inds, occ_inds


def freeze_orbitals(one_body: np.ndarray, two_body_phys: np.ndarray,
                    occ_inds: List[int], active_inds: List[int],
                    nuclear_repulsion: float) -> ElectronicStructureHamiltonian:
    """Explicit-index active-space reduction: orbitals in ``occ_inds`` are
    frozen doubly occupied (their Coulomb/exchange field folds into the
    one-body part and core energy), orbitals outside
    ``occ_inds + active_inds`` are discarded.  The index-based analog of
    the NOON-threshold selection above — used by the Li2FeSiO4 derivation
    (reference contextual_subspace.ipynb cells 11-14: tangelo
    ``frozen_core`` + ``get_orbitals_excluding_homo_lumo``)."""
    # frozen-core folding (physicist notation)
    e_core = nuclear_repulsion
    for i in occ_inds:
        e_core += 2.0 * one_body[i, i]
        for j in occ_inds:
            e_core += 2.0 * two_body_phys[i, j, i, j] - two_body_phys[i, j, j, i]

    act = np.asarray(active_inds)
    h_eff = one_body[np.ix_(act, act)].copy()
    for i in occ_inds:
        h_eff += (2.0 * two_body_phys[np.ix_(act, [i], act, [i])][:, 0, :, 0]
                  - two_body_phys[np.ix_(act, [i], [i], act)][:, 0, 0, :])
    g_act = two_body_phys[np.ix_(act, act, act, act)]

    hpq, hpqrs = convert_to_h_integrals(h_eff, g_act)
    return ElectronicStructureHamiltonian(hpq, hpqrs, constant_coeff=e_core)
