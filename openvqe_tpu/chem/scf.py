"""Restricted Hartree-Fock with DIIS.

Host-side replacement for the pyscf SCF run inside
``perform_pyscf_computation`` (reference molecule_factory.py:318-320).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np
from scipy.linalg import eigh


@dataclass
class RHFResult:
    energy: float                # total HF energy (electronic + nuclear)
    mo_coeff: np.ndarray         # C[ao, mo]
    mo_energy: np.ndarray
    dm_ao: np.ndarray            # AO density matrix (spin-summed)
    n_occ: int
    converged: bool
    n_iter: int


def rhf(S: np.ndarray, hcore: np.ndarray, eri: np.ndarray, n_elec: int,
        e_nuc: float, max_iter: int = 200, conv: float = 1e-11,
        diis_size: int = 8) -> RHFResult:
    if n_elec % 2 != 0:
        raise ValueError("RHF requires an even electron count "
                         "(all reference molecules are closed-shell)")
    n_occ = n_elec // 2

    # symmetric orthogonalization
    s_eval, s_evec = eigh(S)
    if np.min(s_eval) < 1e-10:
        keep = s_eval > 1e-10
        s_eval, s_evec = s_eval[keep], s_evec[:, keep]
    X = s_evec @ np.diag(s_eval ** -0.5) @ s_evec.T

    def fock(dm):
        J = np.einsum("pqrs,rs->pq", eri, dm, optimize=True)
        K = np.einsum("prqs,rs->pq", eri, dm, optimize=True)
        return hcore + J - 0.5 * K

    # core guess
    e_mo, C_ortho = eigh(X.T @ hcore @ X)
    C = X @ C_ortho
    dm = 2.0 * C[:, :n_occ] @ C[:, :n_occ].T

    errs: List[np.ndarray] = []
    focks: List[np.ndarray] = []
    e_old = 0.0
    converged = False
    it = 0
    for it in range(1, max_iter + 1):
        F = fock(dm)
        # DIIS error = FDS - SDF in orthonormal basis
        err = X.T @ (F @ dm @ S - S @ dm @ F) @ X
        errs.append(err)
        focks.append(F)
        if len(errs) > diis_size:
            errs.pop(0)
            focks.pop(0)
        if len(errs) > 1:
            m = len(errs)
            B = -np.ones((m + 1, m + 1))
            B[m, m] = 0.0
            for i in range(m):
                for j in range(m):
                    B[i, j] = np.vdot(errs[i], errs[j])
            rhs = np.zeros(m + 1)
            rhs[m] = -1.0
            try:
                w = np.linalg.solve(B, rhs)[:m]
                F = sum(wi * Fi for wi, Fi in zip(w, focks))
            except np.linalg.LinAlgError:
                pass
        e_mo, C_ortho = eigh(X.T @ F @ X)
        C = X @ C_ortho
        dm = 2.0 * C[:, :n_occ] @ C[:, :n_occ].T
        e_elec = 0.5 * np.einsum("pq,pq->", dm, hcore + fock(dm))
        if abs(e_elec - e_old) < conv and np.max(np.abs(errs[-1])) < 1e-7:
            converged = True
            e_old = e_elec
            break
        e_old = e_elec

    return RHFResult(
        energy=float(e_old + e_nuc),
        mo_coeff=C,
        mo_energy=e_mo,
        dm_ao=dm,
        n_occ=n_occ,
        converged=converged,
        n_iter=it,
    )


def mo_integrals(hcore: np.ndarray, eri: np.ndarray, C: np.ndarray):
    """AO -> MO transform.  Returns (h1_mo, eri_mo_physicist) where
    eri_phys[p,q,r,s] = <pq|rs> = (pr|qs)_chemist in the MO basis."""
    h1 = C.T @ hcore @ C
    eri_mo = np.einsum("pqrs,pi,qj,rk,sl->ijkl", eri, C, C, C, C, optimize=True)
    # chemist (ij|kl) -> physicist <ik|jl>: <pq|rs> = (pr|qs)
    eri_phys = eri_mo.transpose(0, 2, 1, 3)
    return h1, eri_phys
