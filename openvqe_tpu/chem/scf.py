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


def _orthogonalizer(S: np.ndarray) -> np.ndarray:
    """Symmetric orthogonalization with linear-dependence truncation."""
    s_eval, s_evec = eigh(S)
    if np.min(s_eval) < 1e-10:
        keep = s_eval > 1e-10
        s_eval, s_evec = s_eval[keep], s_evec[:, keep]
    return s_evec @ np.diag(s_eval ** -0.5) @ s_evec.T


def _diis_extrapolate(errs: List[np.ndarray], focks: List[np.ndarray],
                      fallback: np.ndarray) -> np.ndarray:
    """Pulay DIIS: solve the B-matrix system over the stored error/Fock
    history; returns ``fallback`` when the history is too short or the
    system is singular."""
    if len(errs) < 2:
        return fallback
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
        return sum(wi * Fi for wi, Fi in zip(w, focks))
    except np.linalg.LinAlgError:
        return fallback


def rhf(S: np.ndarray, hcore: np.ndarray, eri: np.ndarray, n_elec: int,
        e_nuc: float, max_iter: int = 200, conv: float = 1e-11,
        diis_size: int = 8, level_shift: float = 0.0,
        damp: float = 0.0, oda_init: int = 0) -> RHFResult:
    """``level_shift`` (Ha) raises the virtual block of the orthonormal
    Fock before each diagonalization (Saunders-Hillier); ``damp`` mixes
    that fraction of the previous density into each update; ``oda_init``
    runs up to that many Optimal-Damping (Cances-Le Bris ODA) steps FIRST
    — the RHF energy is exactly quadratic along the density segment
    D0 + lambda*(D1-D0), so each step minimizes it analytically and the
    energy decreases monotonically — before handing the relaxed density
    to the DIIS loop.  These are the standard aids for oscillating
    open-d-shell SCF (the Li2FeSiO4 spherical-d chain needs them); at a
    converged stationary density they leave the SCF solution unchanged,
    and the returned mo_energy / mo_coeff come from one final UNSHIFTED
    Fock diagonalization."""
    if n_elec % 2 != 0:
        raise ValueError("RHF requires an even electron count "
                         "(all reference molecules are closed-shell)")
    n_occ = n_elec // 2
    X = _orthogonalizer(S)

    def fock(dm):
        J = np.einsum("pqrs,rs->pq", eri, dm, optimize=True)
        K = np.einsum("prqs,rs->pq", eri, dm, optimize=True)
        return hcore + J - 0.5 * K

    # core guess
    e_mo, C_ortho = eigh(X.T @ hcore @ X)
    C = X @ C_ortho
    dm = 2.0 * C[:, :n_occ] @ C[:, :n_occ].T

    if oda_init:
        # ODA: E(D0 + l*dD) = E0 + l*Tr(dD F(D0)) + l^2/2 * Tr(dD G(dD))
        # with G(D) = J(D) - K(D)/2; minimize over l in (0, 1].
        F = fock(dm)
        for _ in range(oda_init):
            e_mo, C_ortho = eigh(X.T @ F @ X)
            C = X @ C_ortho
            dm1 = 2.0 * C[:, :n_occ] @ C[:, :n_occ].T
            dD = dm1 - dm
            a = float(np.einsum("pq,pq->", dD, F))        # <= 0 (aufbau)
            G_dD = fock(dD) - hcore
            b = 0.5 * float(np.einsum("pq,pq->", dD, G_dD))
            if abs(a) < max(conv, 1e-9):
                break
            lam = 1.0 if b <= 0 else min(1.0, -a / (2.0 * b))
            if lam < 1e-3:
                # analytic minimizer is negligibly small: forcing a floor
                # step could RAISE the energy (breaking monotonicity); the
                # segment is exhausted — hand over to DIIS
                break
            dm = dm + lam * dD
            F = F + lam * G_dD  # F is linear in D: F(D + l*dD) = F + l*G(dD)

    errs: List[np.ndarray] = []
    focks: List[np.ndarray] = []
    e_old = 0.0
    converged = False
    it = 0
    for it in range(1, max_iter + 1):
        F = fock(dm)
        # DIIS error = FDS - SDF in orthonormal basis (unshifted F)
        err = X.T @ (F @ dm @ S - S @ dm @ F) @ X
        errs.append(err)
        focks.append(F)
        if len(errs) > diis_size:
            errs.pop(0)
            focks.pop(0)
        F = _diis_extrapolate(errs, focks, F)
        Fo = X.T @ F @ X
        if level_shift:
            # occupied projector from the previous orbitals
            P = C_ortho[:, :n_occ] @ C_ortho[:, :n_occ].T
            Fo = Fo + level_shift * (np.eye(Fo.shape[0]) - P)
        e_mo, C_ortho = eigh(Fo)
        C = X @ C_ortho
        dm_new = 2.0 * C[:, :n_occ] @ C[:, :n_occ].T
        dm = (1.0 - damp) * dm_new + damp * dm if damp else dm_new
        e_elec = 0.5 * np.einsum("pq,pq->", dm, hcore + fock(dm))
        if abs(e_elec - e_old) < conv and np.max(np.abs(errs[-1])) < 1e-7:
            converged = True
            e_old = e_elec
            break
        e_old = e_elec
    if level_shift or damp:
        # report canonical (unshifted) orbitals + the density THEY
        # generate, so the returned (mo_coeff, mo_energy, dm_ao, energy)
        # are mutually consistent even when the loop exits unconverged
        # (the damped density is non-idempotent).  Occupation is by
        # MAXIMUM OVERLAP with the loop's density, not aufbau: level
        # shifting exists precisely to hold non-aufbau roots, and a
        # lowest-eigenvalue refill could silently swap the converged
        # state for a different one while still reporting converged=True.
        # For aufbau solutions the two rules coincide.
        e_mo, C_ortho = eigh(X.T @ fock(dm) @ X)
        C = X @ C_ortho
        # per-orbital occupation weight in the loop's density:
        # w_i = <phi_i| S dm S |phi_i> / 2  (in the orthonormal basis)
        w_occ = np.einsum("pi,pq,qi->i", C, S @ (0.5 * dm) @ S, C)
        occ_idx = np.sort(np.argsort(-w_occ)[:n_occ])
        if not np.array_equal(occ_idx, np.arange(n_occ)):
            # reorder so occupied-by-overlap fill the first n_occ columns
            # (downstream consumers take mo_coeff[:, :n_occ] as occupied);
            # each block stays energy-sorted
            vir_idx = np.sort(np.setdiff1d(np.arange(C.shape[1]), occ_idx))
            perm = np.concatenate([occ_idx, vir_idx])
            C = C[:, perm]
            e_mo = e_mo[perm]
        dm = 2.0 * C[:, :n_occ] @ C[:, :n_occ].T
        e_old = 0.5 * np.einsum("pq,pq->", dm, hcore + fock(dm))

    return RHFResult(
        energy=float(e_old + e_nuc),
        mo_coeff=C,
        mo_energy=e_mo,
        dm_ao=dm,
        n_occ=n_occ,
        converged=converged,
        n_iter=it,
    )


@dataclass
class ROHFResult:
    energy: float                # total HF energy (electronic + nuclear)
    mo_coeff: np.ndarray         # C[ao, mo] (restricted: shared a/b orbitals)
    mo_energy: np.ndarray        # Roothaan effective-Fock eigenvalues
    n_alpha: int
    n_beta: int
    converged: bool
    n_iter: int


def rohf(S: np.ndarray, hcore: np.ndarray, eri: np.ndarray, n_elec: int,
         spin: int, e_nuc: float, max_iter: int = 300, conv: float = 1e-10,
         diis_size: int = 8) -> ROHFResult:
    """Restricted open-shell Hartree-Fock (Roothaan single effective Fock,
    DIIS).  ``spin`` = n_alpha - n_beta (2S).  Extends the reference's
    ``perform_pyscf_computation(geometry, basis, spin, charge)`` surface
    (molecule_factory.py:306-320) beyond the closed-shell molecule table."""
    if (n_elec + spin) % 2 != 0 or spin < 0 or spin > n_elec:
        raise ValueError(f"invalid (n_elec={n_elec}, spin={spin})")
    na = (n_elec + spin) // 2
    nb = (n_elec - spin) // 2
    if spin == 0:
        r = rhf(S, hcore, eri, n_elec, e_nuc, max_iter, conv, diis_size)
        return ROHFResult(r.energy, r.mo_coeff, r.mo_energy, r.n_occ,
                          r.n_occ, r.converged, r.n_iter)

    X = _orthogonalizer(S)

    def coulomb(dm):
        return np.einsum("pqrs,rs->pq", eri, dm, optimize=True)

    def exchange(dm):
        return np.einsum("prqs,rs->pq", eri, dm, optimize=True)

    e_mo, C_ortho = eigh(X.T @ hcore @ X)
    C = X @ C_ortho

    errs: List[np.ndarray] = []
    focks: List[np.ndarray] = []
    e_old = 0.0
    converged = False
    it = 0
    for it in range(1, max_iter + 1):
        Da = C[:, :na] @ C[:, :na].T
        Db = C[:, :nb] @ C[:, :nb].T
        D = Da + Db
        J = coulomb(D)                 # three O(n^4) contractions total
        Ka = exchange(Da)
        Kb = exchange(Db)
        Fa = hcore + J - Ka
        Fb = hcore + J - Kb
        e_elec = 0.5 * (np.einsum("pq,pq->", Da, hcore + Fa)
                        + np.einsum("pq,pq->", Db, hcore + Fb))

        # Roothaan effective Fock in the current MO basis:
        #   closed-closed/open-open/virtual-virtual: (Fa+Fb)/2
        #   closed-open: Fb   closed-virtual: (Fa+Fb)/2   open-virtual: Fa
        FaM = C.T @ Fa @ C
        FbM = C.T @ Fb @ C
        FcM = 0.5 * (FaM + FbM)
        R = FcM.copy()
        c, o, v = slice(0, nb), slice(nb, na), slice(na, C.shape[1])
        R[c, o] = FbM[c, o]
        R[o, c] = FbM[o, c]
        R[o, v] = FaM[o, v]
        R[v, o] = FaM[v, o]

        # DIIS on the AO-projected effective Fock.  The orbital-gradient
        # error (occupied-virtual coupling blocks) must live in a FIXED
        # frame — the MO basis rotates every iteration, so MO-frame errors
        # from different iterations are not commensurate; project the
        # antisymmetrized gradient to the orthonormal AO frame.
        Sc = S @ C
        R_ao = Sc @ R @ Sc.T
        grad = np.zeros_like(R)
        grad[c, o], grad[c, v], grad[o, v] = R[c, o], R[c, v], R[o, v]
        err = X.T @ (Sc @ (grad - grad.T) @ Sc.T) @ X
        errs.append(err)
        focks.append(R_ao)
        if len(errs) > diis_size:
            errs.pop(0)
            focks.pop(0)
        R_use = _diis_extrapolate(errs, focks, R_ao)
        e_mo, C_ortho = eigh(X.T @ R_use @ X)
        C = X @ C_ortho
        if (abs(e_elec - e_old) < conv
                and np.max(np.abs(errs[-1])) < 1e-7):
            converged = True
            e_old = e_elec
            break
        e_old = e_elec

    return ROHFResult(
        energy=float(e_old + e_nuc),
        mo_coeff=C,
        mo_energy=e_mo,
        n_alpha=na,
        n_beta=nb,
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
