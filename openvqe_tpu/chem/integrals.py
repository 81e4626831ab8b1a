"""Molecular integrals over contracted cartesian Gaussians (McMurchie-Davidson).

Host-side replacement for the pyscf C integral engine the reference consumes
through ``perform_pyscf_computation`` (reference molecule_factory.py:318-320).
Setup-time only, so a clear numpy implementation is used; the optional C++
engine in ``openvqe_tpu/native`` accelerates the O(N^4) ERI tensor with the
same algorithm and is cross-checked against this module.

Conventions: coordinates in bohr; ERI returned in chemist notation
(pq|rs) = ∫∫ p(1)q(1) r12^{-1} r(2)s(2).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
from scipy.special import hyp1f1

from .basis import Shell, cartesian_components, nbasis


# ------------------------------------------------------------------ helpers

def primitive_overlap_same_center(a: float, b: float, lmn) -> float:
    """<g_a|g_b> for primitives with identical center and angular momentum."""
    from scipy.special import factorial2
    l, m, n = lmn
    df = lambda k: float(factorial2(k)) if k > 0 else 1.0
    p = a + b
    pref = (np.pi / p) ** 1.5 / (2 * p) ** (l + m + n)
    return pref * df(2 * l - 1) * df(2 * m - 1) * df(2 * n - 1)


def boys_array(m_max: int, T: float) -> np.ndarray:
    """F_0..F_{m_max}(T) via hyp1f1 at the top order + downward recursion."""
    out = np.empty(m_max + 1)
    out[m_max] = hyp1f1(m_max + 0.5, m_max + 1.5, -T) / (2 * m_max + 1)
    if m_max > 0:
        eT = np.exp(-T)
        for m in range(m_max - 1, -1, -1):
            out[m] = (2 * T * out[m + 1] + eT) / (2 * m + 1)
    return out


def hermite_expansion(i_max: int, j_max: int, Q: float, a: float, b: float) -> np.ndarray:
    """E[i, j, t] Hermite expansion coefficients for one cartesian axis.

    Q = A_x - B_x.  Recurrences in Helgaker-Jorgensen-Olsen form.
    """
    p = a + b
    q = a * b / p
    E = np.zeros((i_max + 1, j_max + 1, i_max + j_max + 2))
    E[0, 0, 0] = np.exp(-q * Q * Q)
    inv2p = 1.0 / (2.0 * p)
    XPA = -b * Q / p
    XPB = a * Q / p
    for i in range(1, i_max + 1):
        for t in range(i + 1):
            val = XPA * E[i - 1, 0, t] + (t + 1) * E[i - 1, 0, t + 1]
            if t > 0:
                val += inv2p * E[i - 1, 0, t - 1]
            E[i, 0, t] = val
    for j in range(1, j_max + 1):
        for i in range(i_max + 1):
            for t in range(i + j + 1):
                val = XPB * E[i, j - 1, t] + (t + 1) * E[i, j - 1, t + 1]
                if t > 0:
                    val += inv2p * E[i, j - 1, t - 1]
                E[i, j, t] = val
    return E


def hermite_coulomb(L: int, p: float, PC: np.ndarray) -> np.ndarray:
    """R[t, u, v] = R^0_{tuv}(p, PC) Hermite-Coulomb integrals up to total order L."""
    T = p * float(PC @ PC)
    F = boys_array(L, T)
    # Rn[n, t, u, v]; fill by increasing t+u+v
    R = np.zeros((L + 1, L + 1, L + 1, L + 1))
    for n in range(L + 1):
        R[n, 0, 0, 0] = (-2.0 * p) ** n * F[n]
    for total in range(1, L + 1):
        for t in range(total + 1):
            for u in range(total - t + 1):
                v = total - t - u
                for n in range(L - total + 1):
                    if t > 0:
                        val = PC[0] * R[n + 1, t - 1, u, v]
                        if t > 1:
                            val += (t - 1) * R[n + 1, t - 2, u, v]
                    elif u > 0:
                        val = PC[1] * R[n + 1, t, u - 1, v]
                        if u > 1:
                            val += (u - 1) * R[n + 1, t, u - 2, v]
                    else:
                        val = PC[2] * R[n + 1, t, u, v - 1]
                        if v > 1:
                            val += (v - 1) * R[n + 1, t, u, v - 2]
                    R[n, t, u, v] = val
    return R[0]


# ------------------------------------------------------- one-electron ints

class _ShellPair:
    """Cached per-primitive-pair quantities for a shell pair."""

    __slots__ = ("A", "B", "la", "lb", "p", "P", "coef", "Ex", "Ey", "Ez")

    def __init__(self, sa: Shell, sb: Shell):
        self.A, self.B = sa.center, sb.center
        self.la, self.lb = sa.l, sb.l
        na, nb = len(sa.exps), len(sb.exps)
        self.p = np.empty((na, nb))
        self.P = np.empty((na, nb, 3))
        self.coef = np.empty((na, nb))
        self.Ex: List[List[np.ndarray]] = [[None] * nb for _ in range(na)]
        self.Ey: List[List[np.ndarray]] = [[None] * nb for _ in range(na)]
        self.Ez: List[List[np.ndarray]] = [[None] * nb for _ in range(na)]
        AB = sa.center - sb.center
        # +2 on the bra angular momentum so kinetic-energy terms reuse the table
        for i, a in enumerate(sa.exps):
            for j, b in enumerate(sb.exps):
                p = a + b
                self.p[i, j] = p
                self.P[i, j] = (a * sa.center + b * sb.center) / p
                self.coef[i, j] = sa.coefs[i] * sb.coefs[j]
                self.Ex[i][j] = hermite_expansion(sa.l, sb.l + 2, AB[0], a, b)
                self.Ey[i][j] = hermite_expansion(sa.l, sb.l + 2, AB[1], a, b)
                self.Ez[i][j] = hermite_expansion(sa.l, sb.l + 2, AB[2], a, b)


def overlap_kinetic(shells: List[Shell]) -> Tuple[np.ndarray, np.ndarray]:
    n = nbasis(shells)
    S = np.zeros((n, n))
    T = np.zeros((n, n))
    offs = _offsets(shells)
    for isa, sa in enumerate(shells):
        for isb in range(isa + 1):
            sb = shells[isb]
            sp = _ShellPair(sa, sb)
            ca = cartesian_components(sa.l)
            cb = cartesian_components(sb.l)
            for ia, (l1, m1, n1) in enumerate(ca):
                for ib, (l2, m2, n2) in enumerate(cb):
                    s_val = 0.0
                    t_val = 0.0
                    for i, a in enumerate(sa.exps):
                        for j, b in enumerate(sb.exps):
                            pref = sp.coef[i, j] * (np.pi / sp.p[i, j]) ** 1.5
                            Ex, Ey, Ez = sp.Ex[i][j], sp.Ey[i][j], sp.Ez[i][j]
                            sx, sy, sz = Ex[l1, l2, 0], Ey[m1, m2, 0], Ez[n1, n2, 0]
                            s_val += pref * sx * sy * sz
                            kx = _kin1d(Ex, l1, l2, b)
                            ky = _kin1d(Ey, m1, m2, b)
                            kz = _kin1d(Ez, n1, n2, b)
                            t_val += pref * (kx * sy * sz + sx * ky * sz + sx * sy * kz)
                    r, c = offs[isa] + ia, offs[isb] + ib
                    S[r, c] = S[c, r] = s_val
                    T[r, c] = T[c, r] = t_val
    return S, T


def _kin1d(E: np.ndarray, i: int, j: int, b: float) -> float:
    """<i| -1/2 d^2/dx^2 |j> in units of the 1D overlap table."""
    val = b * (2 * j + 1) * E[i, j, 0] - 2.0 * b * b * E[i, j + 2, 0]
    if j >= 2:
        val -= 0.5 * j * (j - 1) * E[i, j - 2, 0]
    return val


def nuclear_attraction(shells: List[Shell], charges: List[int],
                       coords: np.ndarray) -> np.ndarray:
    n = nbasis(shells)
    V = np.zeros((n, n))
    offs = _offsets(shells)
    for isa, sa in enumerate(shells):
        for isb in range(isa + 1):
            sb = shells[isb]
            sp = _ShellPair(sa, sb)
            ca = cartesian_components(sa.l)
            cb = cartesian_components(sb.l)
            L = sa.l + sb.l
            block = np.zeros((len(ca), len(cb)))
            for i in range(len(sa.exps)):
                for j in range(len(sb.exps)):
                    p = sp.p[i, j]
                    P = sp.P[i, j]
                    pref = sp.coef[i, j] * 2.0 * np.pi / p
                    for Zc, C in zip(charges, coords):
                        R = hermite_coulomb(L, p, P - C)
                        for ia, (l1, m1, n1) in enumerate(ca):
                            for ib, (l2, m2, n2) in enumerate(cb):
                                acc = 0.0
                                Ex, Ey, Ez = sp.Ex[i][j], sp.Ey[i][j], sp.Ez[i][j]
                                for t in range(l1 + l2 + 1):
                                    ext = Ex[l1, l2, t]
                                    if ext == 0.0:
                                        continue
                                    for u in range(m1 + m2 + 1):
                                        eyu = Ey[m1, m2, u]
                                        if eyu == 0.0:
                                            continue
                                        for v in range(n1 + n2 + 1):
                                            ezv = Ez[n1, n2, v]
                                            if ezv != 0.0:
                                                acc += ext * eyu * ezv * R[t, u, v]
                                block[ia, ib] -= Zc * pref * acc
            for ia in range(len(ca)):
                for ib in range(len(cb)):
                    r, c = offs[isa] + ia, offs[isb] + ib
                    V[r, c] = block[ia, ib]
                    V[c, r] = block[ia, ib]
    return V


# ------------------------------------------------------------ two-electron

def electron_repulsion(shells: List[Shell]) -> np.ndarray:
    """Full (pq|rs) chemist-notation ERI tensor with 8-fold symmetry."""
    n = nbasis(shells)
    eri = np.zeros((n, n, n, n))
    offs = _offsets(shells)
    nsh = len(shells)
    pairs = [(a, b) for a in range(nsh) for b in range(a + 1)]
    sp_cache: Dict[Tuple[int, int], _ShellPair] = {}

    def get_sp(a, b):
        if (a, b) not in sp_cache:
            sp_cache[(a, b)] = _ShellPair(shells[a], shells[b])
        return sp_cache[(a, b)]

    for ip, (isa, isb) in enumerate(pairs):
        sp1 = get_sp(isa, isb)
        ca = cartesian_components(shells[isa].l)
        cb = cartesian_components(shells[isb].l)
        for isc, isd in pairs[: ip + 1]:
            sp2 = get_sp(isc, isd)
            cc = cartesian_components(shells[isc].l)
            cd = cartesian_components(shells[isd].l)
            L = shells[isa].l + shells[isb].l + shells[isc].l + shells[isd].l
            block = np.zeros((len(ca), len(cb), len(cc), len(cd)))
            for i in range(len(shells[isa].exps)):
                for j in range(len(shells[isb].exps)):
                    p = sp1.p[i, j]
                    P = sp1.P[i, j]
                    c1 = sp1.coef[i, j]
                    for k in range(len(shells[isc].exps)):
                        for l_ in range(len(shells[isd].exps)):
                            q = sp2.p[k, l_]
                            Q = sp2.P[k, l_]
                            alpha = p * q / (p + q)
                            pref = (c1 * sp2.coef[k, l_] * 2.0 * np.pi ** 2.5
                                    / (p * q * np.sqrt(p + q)))
                            R = hermite_coulomb(L, alpha, P - Q)
                            _contract_eri(block, sp1, sp2, i, j, k, l_,
                                          ca, cb, cc, cd, R, pref)
            _scatter_eri(eri, block, offs, isa, isb, isc, isd,
                         len(ca), len(cb), len(cc), len(cd))
    return eri


def _contract_eri(block, sp1, sp2, i, j, k, l_, ca, cb, cc, cd, R, pref):
    Ex1, Ey1, Ez1 = sp1.Ex[i][j], sp1.Ey[i][j], sp1.Ez[i][j]
    Ex2, Ey2, Ez2 = sp2.Ex[k][l_], sp2.Ey[k][l_], sp2.Ez[k][l_]
    for ia, (l1, m1, n1) in enumerate(ca):
        for ib, (l2, m2, n2) in enumerate(cb):
            e1x = Ex1[l1, l2, : l1 + l2 + 1]
            e1y = Ey1[m1, m2, : m1 + m2 + 1]
            e1z = Ez1[n1, n2, : n1 + n2 + 1]
            for ic, (l3, m3, n3) in enumerate(cc):
                for id_, (l4, m4, n4) in enumerate(cd):
                    e2x = Ex2[l3, l4, : l3 + l4 + 1]
                    e2y = Ey2[m3, m4, : m3 + m4 + 1]
                    e2z = Ez2[n3, n4, : n3 + n4 + 1]
                    acc = 0.0
                    for t in range(l1 + l2 + 1):
                        if e1x[t] == 0.0:
                            continue
                        for u in range(m1 + m2 + 1):
                            if e1y[u] == 0.0:
                                continue
                            for v in range(n1 + n2 + 1):
                                if e1z[v] == 0.0:
                                    continue
                                c1 = e1x[t] * e1y[u] * e1z[v]
                                for tau in range(l3 + l4 + 1):
                                    if e2x[tau] == 0.0:
                                        continue
                                    for nu in range(m3 + m4 + 1):
                                        if e2y[nu] == 0.0:
                                            continue
                                        for phi in range(n3 + n4 + 1):
                                            if e2z[phi] == 0.0:
                                                continue
                                            sign = -1.0 if (tau + nu + phi) % 2 else 1.0
                                            acc += (c1 * e2x[tau] * e2y[nu] * e2z[phi]
                                                    * sign * R[t + tau, u + nu, v + phi])
                    block[ia, ib, ic, id_] += pref * acc


def _scatter_eri(eri, block, offs, isa, isb, isc, isd, na, nb, nc, nd):
    oa, ob, oc, od = offs[isa], offs[isb], offs[isc], offs[isd]
    for ia in range(na):
        for ib in range(nb):
            for ic in range(nc):
                for id_ in range(nd):
                    v = block[ia, ib, ic, id_]
                    p, q, r, s = oa + ia, ob + ib, oc + ic, od + id_
                    eri[p, q, r, s] = v
                    eri[q, p, r, s] = v
                    eri[p, q, s, r] = v
                    eri[q, p, s, r] = v
                    eri[r, s, p, q] = v
                    eri[s, r, p, q] = v
                    eri[r, s, q, p] = v
                    eri[s, r, q, p] = v


def _offsets(shells: List[Shell]) -> List[int]:
    offs = []
    o = 0
    for sh in shells:
        offs.append(o)
        o += len(cartesian_components(sh.l))
    return offs


def nuclear_repulsion(charges: List[int], coords: np.ndarray) -> float:
    e = 0.0
    for i in range(len(charges)):
        for j in range(i):
            e += charges[i] * charges[j] / np.linalg.norm(coords[i] - coords[j])
    return float(e)
