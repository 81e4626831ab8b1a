"""Determinant-basis full CI (Slater-Condon rules) + spin-summed 1-RDM.

Replacement for pyscf's FCI solver consumed by the reference
(``perform_pyscf_computation(..., run_fci=True)``, molecule_factory.py:319):
supplies ``info['FCI']`` (the correctness oracle of every algorithm loop) and
the correlated natural-orbital occupation numbers used for active-space
selection (molecule_factory.py:339-346).

Works in the fixed (n_alpha, n_beta) sector — exponentially smaller than the
2^n qubit space the reference diagonalizes densely at
adapt/fermionic_adapt_vqe.py:474.
"""

from __future__ import annotations

from itertools import combinations
from typing import Dict, List, Optional, Tuple

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla


def _strings(n_orb: int, n_elec: int) -> List[int]:
    out = []
    for occ in combinations(range(n_orb), n_elec):
        s = 0
        for o in occ:
            s |= 1 << o
        out.append(s)
    return out


def _occ_list(s: int, n_orb: int) -> List[int]:
    return [k for k in range(n_orb) if s & (1 << k)]


def _excite_sign(s: int, p: int, q: int) -> Tuple[int, float]:
    """Apply a†_q a_p to string s (p occupied, q unoccupied). Returns
    (new_string, sign) with the fermionic parity of orbitals between p and q."""
    lo, hi = (p, q) if p < q else (q, p)
    mask = ((1 << hi) - 1) & ~((1 << (lo + 1)) - 1)
    sign = -1.0 if bin(s & mask).count("1") % 2 else 1.0
    return (s ^ (1 << p)) | (1 << q), sign


def _singles(s: int, n_orb: int):
    """All (new_string, p, q, sign) for a†_q a_p |s>."""
    occ = _occ_list(s, n_orb)
    virt = [k for k in range(n_orb) if not s & (1 << k)]
    out = []
    for p in occ:
        for q in virt:
            ns, sgn = _excite_sign(s, p, q)
            out.append((ns, p, q, sgn))
    return out


class FCISolver:
    """FCI on spatial-orbital integrals.

    h1[p,q]; eri_phys[p,q,r,s] = <pq|rs> (physicist notation, spatial MOs).
    """

    def __init__(self, h1: np.ndarray, eri_phys: np.ndarray,
                 n_alpha: int, n_beta: int, e_const: float = 0.0):
        self.h1 = h1
        self.g = eri_phys
        self.n_orb = h1.shape[0]
        self.n_alpha, self.n_beta = n_alpha, n_beta
        self.e_const = e_const
        self.astr = _strings(self.n_orb, n_alpha)
        self.bstr = _strings(self.n_orb, n_beta)
        self.aidx = {s: i for i, s in enumerate(self.astr)}
        self.bidx = {s: i for i, s in enumerate(self.bstr)}
        self.n_det = len(self.astr) * len(self.bstr)

    # -------------------------------------------------------------- build H
    def hamiltonian(self) -> sp.csr_matrix:
        h1, g, n_orb = self.h1, self.g, self.n_orb
        na, nb = len(self.astr), len(self.bstr)
        rows: List[int] = []
        cols: List[int] = []
        vals: List[float] = []

        # effective one-body for same-spin singles: h + sum over same-spin
        # occupied handled explicitly below (depends on determinant)
        asingles = [_singles(s, n_orb) for s in self.astr]
        bsingles = [_singles(s, n_orb) for s in self.bstr]
        aocc = [_occ_list(s, n_orb) for s in self.astr]
        bocc = [_occ_list(s, n_orb) for s in self.bstr]

        def add(r, c, v):
            if v != 0.0:
                rows.append(r)
                cols.append(c)
                vals.append(v)

        for ia in range(na):
            oa = aocc[ia]
            for ib in range(nb):
                ob = bocc[ib]
                I = ia * nb + ib
                # diagonal
                d = sum(h1[p, p] for p in oa) + sum(h1[p, p] for p in ob)
                for x, p in enumerate(oa):
                    for q in oa[x + 1:]:
                        d += g[p, q, p, q] - g[p, q, q, p]
                for x, p in enumerate(ob):
                    for q in ob[x + 1:]:
                        d += g[p, q, p, q] - g[p, q, q, p]
                for p in oa:
                    for q in ob:
                        d += g[p, q, p, q]
                add(I, I, d + self.e_const)

                # alpha singles (beta fixed)
                for (ns, p, q, sgn) in asingles[ia]:
                    ja = self.aidx[ns]
                    J = ja * nb + ib
                    if J < I:
                        continue  # fill upper triangle once; symmetrize later
                    v = h1[q, p]
                    for i in oa:
                        if i != p:
                            v += g[q, i, p, i] - g[q, i, i, p]
                    for i in ob:
                        v += g[q, i, p, i]
                    add(J, I, sgn * v)

                # beta singles (alpha fixed)
                for (ns, p, q, sgn) in bsingles[ib]:
                    jb = self.bidx[ns]
                    J = ia * nb + jb
                    if J < I:
                        continue
                    v = h1[q, p]
                    for i in ob:
                        if i != p:
                            v += g[q, i, p, i] - g[q, i, i, p]
                    for i in oa:
                        v += g[q, i, p, i]
                    add(J, I, sgn * v)

                # alpha-alpha doubles
                va = [k for k in range(n_orb) if not self.astr[ia] & (1 << k)]
                for (p, r) in combinations(oa, 2):
                    for (q, s) in combinations(va, 2):
                        s1, sg1 = _excite_sign(self.astr[ia], p, q)
                        s2, sg2 = _excite_sign(s1, r, s)
                        ja = self.aidx[s2]
                        J = ja * nb + ib
                        if J < I:
                            continue
                        v = g[q, s, p, r] - g[q, s, r, p]
                        add(J, I, sg1 * sg2 * v)

                # beta-beta doubles
                vb = [k for k in range(n_orb) if not self.bstr[ib] & (1 << k)]
                for (p, r) in combinations(ob, 2):
                    for (q, s) in combinations(vb, 2):
                        s1, sg1 = _excite_sign(self.bstr[ib], p, q)
                        s2, sg2 = _excite_sign(s1, r, s)
                        jb = self.bidx[s2]
                        J = ia * nb + jb
                        if J < I:
                            continue
                        v = g[q, s, p, r] - g[q, s, r, p]
                        add(J, I, sg1 * sg2 * v)

                # alpha-beta doubles
                for (nsa, p, q, sga) in asingles[ia]:
                    ja = self.aidx[nsa]
                    for (nsb, r, s, sgb) in bsingles[ib]:
                        jb = self.bidx[nsb]
                        J = ja * nb + jb
                        if J < I:
                            continue
                        add(J, I, sga * sgb * g[q, s, p, r])

        H = sp.coo_matrix((vals, (rows, cols)), shape=(self.n_det, self.n_det)).tocsr()
        D = sp.diags(H.diagonal())
        return H + H.T - D

    # --------------------------------------------------------------- solve
    def solve(self, k: int = 1) -> Tuple[np.ndarray, np.ndarray]:
        H = self.hamiltonian()
        if self.n_det <= 64:
            w, v = np.linalg.eigh(H.toarray())
            return w[:k], v[:, :k]
        w, v = spla.eigsh(H, k=max(k, 2), which="SA")
        order = np.argsort(w)
        return w[order][:k], v[:, order][:, :k]

    # ---------------------------------------------------------------- rdm1
    def make_rdm1(self, civec: np.ndarray) -> np.ndarray:
        """Spin-summed 1-RDM in the MO basis: D[p,q] = <a†_p a_q> (both spins)."""
        n_orb = self.n_orb
        nb = len(self.bstr)
        D = np.zeros((n_orb, n_orb))
        c = civec.reshape(len(self.astr), nb)
        # diagonal (occupations)
        for ia, s in enumerate(self.astr):
            w = np.sum(c[ia] ** 2)
            for p in _occ_list(s, n_orb):
                D[p, p] += w
        for ib, s in enumerate(self.bstr):
            w = np.sum(c[:, ib] ** 2)
            for p in _occ_list(s, n_orb):
                D[p, p] += w
        # off-diagonal via singles; D[q,p] += sign * c_J * c_I for a†_q a_p
        for ia, s in enumerate(self.astr):
            for (ns, p, q, sgn) in _singles(s, n_orb):
                ja = self.aidx[ns]
                D[q, p] += sgn * float(c[ja] @ c[ia])
        for ib, s in enumerate(self.bstr):
            for (ns, p, q, sgn) in _singles(s, n_orb):
                jb = self.bidx[ns]
                D[q, p] += sgn * float(c[:, jb] @ c[:, ib])
        return D


def run_fci(h1: np.ndarray, eri_phys: np.ndarray, n_alpha: int, n_beta: int,
            e_const: float, k: int = 1, max_dets: int = 400_000
            ) -> Optional[Tuple[np.ndarray, np.ndarray, "FCISolver"]]:
    solver = FCISolver(h1, eri_phys, n_alpha, n_beta, e_const)
    if solver.n_det > max_dets:
        return None
    w, v = solver.solve(k=k)
    return w, v, solver
