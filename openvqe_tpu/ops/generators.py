"""Cluster-operator pool generators (UCC ansatz families).

Behavioral parity with reference ``openvqe/common_files/generator_excitations.py``
(loop structure, coefficients, ordering and empty-op dropping reproduce the
golden pool sizes in the reference tests), built on this framework's
FermionOperator IR and encoder-based transforms.

Families: uccsd (via ops.uccsd), singlet_sd, singlet_gsd,
spin_complement_gsd, spin_complement_gsd_twin, singlet_upccgsd (k-UpCCGSD),
uccgsd, qubit-ADAPT singlet/triplet pools, triples, and the no-MP2 SD pool.
"""

from __future__ import annotations

import itertools
from itertools import combinations
from typing import List, Sequence, Tuple

import numpy as np

from .fermion import FermionOperator, FermionTerm, order_fermionic_term
from .pauli import PauliSum
from .transforms import transform_operator
from .uccsd import get_cluster_ops_and_init_guess


def _ordered(nq: int, raw_terms: Sequence[FermionTerm]) -> FermionOperator:
    terms: List[FermionTerm] = []
    for t in raw_terms:
        terms.extend(order_fermionic_term(t))
    return FermionOperator(nq, terms)


def apply_transforms(cluster_ops_fr: Sequence[FermionOperator], transform: str,
                     perm: int = 0
                     ) -> Tuple[int, List[FermionOperator], List[PauliSum]]:
    """Transform each fermionic op; drop ops whose image is empty; replicate
    the list ``perm`` extra times (k-UpCCGSD products) — reference
    generator_excitations.py:16-36.

    Drop criterion: none here.  Empirically (golden pool sizes 175/69 for
    spin_complement_gsd and 70 for singlet_gsd) the reference's
    ``hamilt_sp.terms != []`` check never fires: qat retains
    exactly-cancelled zero-coefficient terms, so identically-zero operators
    (e.g. the p==q spin-complement singles) still occupy pool slots.  All
    real dropping happens inside the generators' own ``norm > 0`` checks.
    Zero operators compile to empty rotation sequences downstream (no-ops
    with zero ADAPT gradient), matching reference behavior."""
    cluster_ops: List[FermionOperator] = []
    cluster_ops_sp: List[PauliSum] = []
    for y in cluster_ops_fr:
        sp = transform_operator(y, transform)
        cluster_ops.append(y)
        cluster_ops_sp.append(sp)
    cluster_ops = cluster_ops + cluster_ops * perm
    cluster_ops_sp = cluster_ops_sp + cluster_ops_sp * perm
    return len(cluster_ops_sp), cluster_ops, cluster_ops_sp


def uccsd(hamiltonian, n_elec, noons_full, orb_energies_full, transform,
          n_alpha=None):
    """UCCSD ops + MP2 guess + HF init (reference generator_excitations.py:40-80).
    Pass ``n_alpha`` for an open-shell (ROHF) reference determinant."""
    cluster_ops, theta_mp2, hf_init = get_cluster_ops_and_init_guess(
        n_elec, noons_full, orb_energies_full, hamiltonian.hpqrs,
        n_alpha=n_alpha)
    pool_size, cluster_ops, cluster_ops_sp = apply_transforms(cluster_ops, transform)
    return pool_size, cluster_ops, cluster_ops_sp, theta_mp2, hf_init


def spin_complement_gsd(n_elec: int, orbital_number: int, transform: str):
    """Spin-complemented generalized singles+doubles
    (reference generator_excitations.py:83-156)."""
    nq = 2 * orbital_number
    singles: List[FermionOperator] = []
    doubles: List[FermionOperator] = []
    for p in range(0, nq, 2):
        for q in range(p, nq, 2):
            singles.append(FermionOperator(nq, [
                FermionTerm(1.0, "Cc", [p, q]),
                FermionTerm(-1.0, "Cc", [q, p]),
                FermionTerm(1.0, "Cc", [p + 1, q + 1]),
                FermionTerm(-1.0, "Cc", [q + 1, p + 1]),
            ]))
            for r in range(p, nq, 2):
                for s in range(q if r == p else r, nq, 2):
                    term_a = [
                        FermionTerm(1.0, "CcCc", [r, p, s, q]),
                        FermionTerm(-1.0, "CcCc", [q, s, p, r]),
                        FermionTerm(1.0, "CcCc", [r + 1, p + 1, s + 1, q + 1]),
                        FermionTerm(-1.0, "CcCc", [q + 1, s + 1, p + 1, r + 1]),
                    ]
                    term_b = [
                        FermionTerm(1.0, "CcCc", [r, p, s + 1, q + 1]),
                        FermionTerm(-1.0, "CcCc", [q + 1, s + 1, p, r]),
                        FermionTerm(1.0, "CcCc", [r + 1, p + 1, s, q]),
                        FermionTerm(-1.0, "CcCc", [q, s, p + 1, r + 1]),
                    ]
                    term_c = [
                        FermionTerm(1.0, "CcCc", [r, p + 1, s + 1, q]),
                        FermionTerm(-1.0, "CcCc", [q, s + 1, p + 1, r]),
                        FermionTerm(1.0, "CcCc", [r + 1, p, s, q + 1]),
                        FermionTerm(-1.0, "CcCc", [q + 1, s, p, r + 1]),
                    ]
                    for tx in (term_a, term_b, term_c):
                        doubles.append(_ordered(nq, tx))
    return apply_transforms(singles + doubles, transform)


def spin_complement_gsd_twin(n_elec: int, orbital_number: int, transform: str):
    """Twin variant (reference generator_excitations.py:159-271)."""
    nq = 2 * orbital_number
    alpha_orbs = [2 * i for i in range(orbital_number)]
    beta_orbs = [2 * i + 1 for i in range(orbital_number)]
    ops: List[FermionOperator] = []

    for p in alpha_orbs:
        for q in alpha_orbs:
            if p >= q:
                continue
            ops.append(FermionOperator(nq, [
                FermionTerm(1.0, "Cc", [q, p]),
                FermionTerm(-1.0, "Cc", [p, q]),
                FermionTerm(1.0, "Cc", [q + 1, p + 1]),
                FermionTerm(-1.0, "Cc", [p + 1, q + 1]),
            ]))

    pq = 0
    for p in alpha_orbs:
        for q in alpha_orbs:
            if p > q:
                continue
            rs = 0
            for r in alpha_orbs:
                for s in alpha_orbs:
                    if r > s:
                        continue
                    if pq < rs:
                        continue
                    term_b = [
                        FermionTerm(1.0, "CcCc", [r, p, s, q]),
                        FermionTerm(-1.0, "CcCc", [q, s, p, r]),
                        FermionTerm(1.0, "CcCc", [r + 1, p + 1, s + 1, q + 1]),
                        FermionTerm(-1.0, "CcCc", [q + 1, s + 1, p + 1, r + 1]),
                    ]
                    ops.append(_ordered(nq, term_b))
                    rs += 1
            pq += 1

    pq = 0
    for p in alpha_orbs:
        for q in beta_orbs:
            rs = 0
            for r in alpha_orbs:
                for s in beta_orbs:
                    if pq < rs:
                        continue
                    term_c = [FermionTerm(1.0, "CcCc", [r, p, s, q])]
                    if p > q:
                        continue
                    term_c += [
                        FermionTerm(1.0, "CcCc", [s - 1, q - 1, r + 1, p + 1]),
                        FermionTerm(-1.0, "CcCc", [q, s, p, r]),
                        FermionTerm(-1.0, "CcCc", [p + 1, r + 1, q - 1, s - 1]),
                    ]
                    ops.append(_ordered(nq, term_c))
                    rs += 1
            pq += 1

    return apply_transforms(ops, transform)


def singlet_sd(n_elec: int, orbital_number: int, transform: str):
    """Singlet-adapted occupied->virtual SD (reference
    generator_excitations.py:274-359)."""
    nq = 2 * orbital_number
    singles: List[FermionOperator] = []
    doubles: List[FermionOperator] = []
    n_occ = int(np.ceil(n_elec / 2))
    c12 = 1.0 / np.sqrt(12.0)

    for i in range(0, 2 * n_occ, 2):
        for j in range(i, 2 * n_occ, 2):
            for a in range(2 * n_occ, nq, 2):
                if j == i:
                    singles.append(FermionOperator(nq, [
                        FermionTerm(0.5, "Cc", [a, i]),
                        FermionTerm(0.5, "Cc", [a + 1, i + 1]),
                        FermionTerm(-0.5, "Cc", [i, a]),
                        FermionTerm(-0.5, "Cc", [i + 1, a + 1]),
                    ]))
                for b in range(a, nq, 2):
                    term_a = [
                        FermionTerm(2 * c12, "CCcc", [a, b, i, j]),
                        FermionTerm(-2 * c12, "CCcc", [j, i, b, a]),
                        FermionTerm(2 * c12, "CCcc", [a + 1, b + 1, i + 1, j + 1]),
                        FermionTerm(-2 * c12, "CCcc", [j + 1, i + 1, b + 1, a + 1]),
                        FermionTerm(c12, "CCcc", [a, b + 1, i, j + 1]),
                        FermionTerm(-c12, "CCcc", [j + 1, i, b + 1, a]),
                        FermionTerm(c12, "CCcc", [a + 1, b, i + 1, j]),
                        FermionTerm(-c12, "CCcc", [j, i + 1, b, a + 1]),
                        FermionTerm(c12, "CCcc", [a, b + 1, i + 1, j]),
                        FermionTerm(-c12, "CCcc", [j, i + 1, b + 1, a]),
                        FermionTerm(c12, "CCcc", [a + 1, b, i, j + 1]),
                        FermionTerm(-c12, "CCcc", [j + 1, i, b, a + 1]),
                    ]
                    term_b = [
                        FermionTerm(0.5, "CCcc", [a, b + 1, i, j + 1]),
                        FermionTerm(-0.5, "CCcc", [j + 1, i, b + 1, a]),
                        FermionTerm(0.5, "CCcc", [a + 1, b, i + 1, j]),
                        FermionTerm(-0.5, "CCcc", [j, i + 1, b, a + 1]),
                        FermionTerm(-0.5, "CCcc", [a, b + 1, i + 1, j]),
                        FermionTerm(0.5, "CCcc", [j, i + 1, b + 1, a]),
                        FermionTerm(-0.5, "CCcc", [a + 1, b, i, j + 1]),
                        FermionTerm(0.5, "CCcc", [j + 1, i, b, a + 1]),
                    ]
                    for tx in (term_a, term_b):
                        h = _ordered(nq, tx).merged()
                        norm = h.norm2()
                        if norm > 0:
                            doubles.append(h / norm)
    return apply_transforms(singles + doubles, transform)


def singlet_gsd(n_elec: int, orbital_number: int, transform: str):
    """Singlet-adapted *generalized* SD (reference
    generator_excitations.py:468-552)."""
    nq = 2 * orbital_number
    singles: List[FermionOperator] = []
    doubles: List[FermionOperator] = []
    c12 = 1.0 / np.sqrt(12.0)
    for p in range(0, nq, 2):
        for q in range(p, nq, 2):
            singles.append(FermionOperator(nq, [
                FermionTerm(0.5, "Cc", [p, q]),
                FermionTerm(-0.5, "Cc", [q, p]),
                FermionTerm(0.5, "Cc", [p + 1, q + 1]),
                FermionTerm(-0.5, "Cc", [q + 1, p + 1]),
            ]))
            for r in range(p, nq, 2):
                for s in range(q if r == p else r, nq, 2):
                    term_a = [
                        FermionTerm(2 * c12, "CcCc", [r, p, s, q]),
                        FermionTerm(-2 * c12, "CcCc", [q, s, p, r]),
                        FermionTerm(2 * c12, "CcCc", [r + 1, p + 1, s + 1, q + 1]),
                        FermionTerm(-2 * c12, "CcCc", [q + 1, s + 1, p + 1, r + 1]),
                        FermionTerm(c12, "CcCc", [r, p, s + 1, q + 1]),
                        FermionTerm(-c12, "CcCc", [q + 1, s + 1, p, r]),
                        FermionTerm(c12, "CcCc", [r + 1, p + 1, s, q]),
                        FermionTerm(-c12, "CcCc", [q, s, p + 1, r + 1]),
                        FermionTerm(c12, "CcCc", [r, p + 1, s + 1, q]),
                        FermionTerm(-c12, "CcCc", [q, s + 1, p + 1, r]),
                        FermionTerm(c12, "CcCc", [r + 1, p, s, q + 1]),
                        FermionTerm(-c12, "CcCc", [q + 1, s, p, r + 1]),
                    ]
                    term_b = [
                        FermionTerm(0.5, "CcCc", [r, p, s + 1, q + 1]),
                        FermionTerm(-0.5, "CcCc", [q + 1, s + 1, p, r]),
                        FermionTerm(0.5, "CcCc", [r + 1, p + 1, s, q]),
                        FermionTerm(-0.5, "CcCc", [q, s, p + 1, r + 1]),
                        FermionTerm(-0.5, "CcCc", [r, p + 1, s + 1, q]),
                        FermionTerm(0.5, "CcCc", [q, s + 1, p + 1, r]),
                        FermionTerm(-0.5, "CcCc", [r + 1, p, s, q + 1]),
                        FermionTerm(0.5, "CcCc", [q + 1, s, p, r + 1]),
                    ]
                    for tx in (term_a, term_b):
                        h = _ordered(nq, tx).merged()
                        norm = h.norm2()
                        if norm > 0:
                            doubles.append(h / norm)
    return apply_transforms(singles + doubles, transform)


def singlet_upccgsd(n_orb: int, transform: str, perm: int):
    """k-UpCCGSD: generalized singles + paired generalized doubles,
    replicated k times (reference generator_excitations.py:403-466)."""
    nq = 2 * n_orb
    singles: List[FermionOperator] = []
    doubles: List[FermionOperator] = []
    for p in range(0, nq, 2):
        for q in range(0, p, 2):
            h = FermionOperator(nq, [
                FermionTerm(1.0, "Cc", [q, p]),
                FermionTerm(-1.0, "Cc", [p, q]),
                FermionTerm(1.0, "Cc", [q + 1, p + 1]),
                FermionTerm(-1.0, "Cc", [p + 1, q + 1]),
            ]).merged()
            singles.append(h)
    even = list(range(0, nq, 2))
    for p, q in itertools.combinations(even, 2):
        term_b = [
            FermionTerm(1.0, "CcCc", [q, p, q + 1, p + 1]),
            FermionTerm(-1.0, "CcCc", [p + 1, q + 1, p, q]),
        ]
        doubles.append(_ordered(nq, term_b).merged())
    return apply_transforms(singles + doubles, transform, perm=perm)


def uccgsd(n_elec: int, orbital_number: int, transform: str):
    """Unrestricted generalized SD (reference generator_excitations.py:555-609)."""
    nq = 2 * orbital_number
    singles: List[FermionOperator] = []
    doubles: List[FermionOperator] = []
    for p in range(nq):
        for q in range(p, nq):
            singles.append(FermionOperator(nq, [
                FermionTerm(1.0, "Cc", [p, q]),
                FermionTerm(-1.0, "Cc", [q, p]),
            ]))
            for r in range(p, nq):
                for s in range(q if r == p else r, nq):
                    term_a = [
                        FermionTerm(1.0, "CCcc", [p, q, r, s]),
                        FermionTerm(-1.0, "CCcc", [s, r, q, p]),
                    ]
                    doubles.append(_ordered(nq, term_a))
    return apply_transforms(singles + doubles, transform)


def generalized_singlet_and_triplet_excitations(n_orb: int, transform: str):
    """Qubit-ADAPT paper pool groups 1-5 (reference
    generator_excitations.py:613-855)."""
    nq = 2 * n_orb
    g1_singlet: List[FermionOperator] = []
    g1_triplet: List[FermionOperator] = []
    g2_singlet: List[FermionOperator] = []
    g2_triplet: List[FermionOperator] = []
    g3: List[FermionOperator] = []
    g4: List[FermionOperator] = []
    g5: List[FermionOperator] = []

    def _trip(ev):
        return FermionOperator(nq, [
            FermionTerm(1.0, "CCcc", ev(0, 0, 0, 0)),
            FermionTerm(0.5, "CCcc", ev(0, 1, 0, 1)),
            FermionTerm(0.5, "CCcc", ev(0, 1, 1, 0)),
            FermionTerm(0.5, "CCcc", ev(1, 0, 0, 1)),
            FermionTerm(0.5, "CCcc", ev(1, 0, 1, 0)),
            FermionTerm(1.0, "CCcc", ev(1, 1, 1, 1)),
            FermionTerm(-1.0, "CCcc", ev(0, 0, 0, 0)[::-1]),
            FermionTerm(-0.5, "CCcc", ev(0, 1, 0, 1)[::-1]),
            FermionTerm(-0.5, "CCcc", ev(0, 1, 1, 0)[::-1]),
            FermionTerm(-0.5, "CCcc", ev(1, 0, 0, 1)[::-1]),
            FermionTerm(-0.5, "CCcc", ev(1, 0, 1, 0)[::-1]),
            FermionTerm(-1.0, "CCcc", ev(1, 1, 1, 1)[::-1]),
        ])

    def _sing(ev):
        return FermionOperator(nq, [
            FermionTerm(0.5, "CCcc", ev(0, 1, 0, 1)),
            FermionTerm(-0.5, "CCcc", ev(0, 1, 1, 0)),
            FermionTerm(-0.5, "CCcc", ev(1, 0, 0, 1)),
            FermionTerm(0.5, "CCcc", ev(1, 0, 1, 0)),
            FermionTerm(-0.5, "CCcc", ev(0, 1, 0, 1)[::-1]),
            FermionTerm(0.5, "CCcc", ev(0, 1, 1, 0)[::-1]),
            FermionTerm(0.5, "CCcc", ev(1, 0, 0, 1)[::-1]),
            FermionTerm(-0.5, "CCcc", ev(1, 0, 1, 0)[::-1]),
        ])

    for p in range(n_orb):
        for q in range(p + 1, n_orb):
            for r in range(q + 1, n_orb):
                for s in range(r + 1, n_orb):
                    ev = lambda s1, s2, s3, s4, p=p, q=q, r=r, s=s: [
                        2 * p + s1, 2 * q + s2, 2 * r + s3, 2 * s + s4]
                    g1_triplet.append(_trip(ev))
                    g1_singlet.append(_sing(ev))

    for a1 in range(n_orb):
        for a2 in range(a1 + 1, n_orb):
            for a3 in range(a2 + 1, n_orb):
                cases = {
                    "p=r": lambda s1, s2, s3, s4, a1=a1, a2=a2, a3=a3: [
                        2 * a1 + s1, 2 * a2 + s2, 2 * a1 + s3, 2 * a3 + s4],
                    "q=r": lambda s1, s2, s3, s4, a1=a1, a2=a2, a3=a3: [
                        2 * a1 + s1, 2 * a2 + s2, 2 * a2 + s3, 2 * a3 + s4],
                    "p=s": lambda s1, s2, s3, s4, a1=a1, a2=a2, a3=a3: [
                        2 * a1 + s1, 2 * a2 + s2, 2 * a3 + s3, 2 * a1 + s4],
                    "q=s": lambda s1, s2, s3, s4, a1=a1, a2=a2, a3=a3: [
                        2 * a1 + s1, 2 * a2 + s2, 2 * a3 + s3, 2 * a2 + s4],
                }
                for ev in cases.values():
                    g2_triplet.append(_trip(ev))
                    g2_singlet.append(_sing(ev))

    for pq in range(n_orb):
        for r in range(pq + 1, n_orb):
            for s in range(r + 1, n_orb):
                ev = lambda s1, s2, s3, s4, pq=pq, r=r, s=s: [
                    2 * pq + s1, 2 * pq + s2, 2 * r + s3, 2 * s + s4]
                g3.append(FermionOperator(nq, [
                    FermionTerm(1.0, "CCcc", ev(0, 1, 0, 1)),
                    FermionTerm(1.0, "CCcc", ev(0, 1, 1, 0)),
                    FermionTerm(-1.0, "CCcc", ev(0, 1, 0, 1)[::-1]),
                    FermionTerm(-1.0, "CCcc", ev(0, 1, 1, 0)[::-1]),
                ]))

    for pqr in range(n_orb):
        for s in range(pqr + 1, n_orb):
            ev = lambda s1, s2, s3, s4, pqr=pqr, s=s: [
                2 * pqr + s1, 2 * pqr + s2, 2 * pqr + s3, 2 * s + s4]
            g4.append(FermionOperator(nq, [
                FermionTerm(1.0, "CCcc", ev(1, 0, 0, 1)),
                FermionTerm(1.0, "CCcc", ev(0, 1, 1, 0)),
                FermionTerm(-1.0, "CCcc", ev(1, 0, 0, 1)[::-1]),
                FermionTerm(-1.0, "CCcc", ev(0, 1, 1, 0)[::-1]),
            ]))

    for pq in range(n_orb):
        for rs in range(pq + 1, n_orb):
            ev = lambda s1, s2, s3, s4, pq=pq, rs=rs: [
                2 * pq + s1, 2 * pq + s2, 2 * rs + s3, 2 * rs + s4]
            g5.append(FermionOperator(nq, [
                FermionTerm(2.0, "CCcc", ev(0, 1, 0, 1)),
                FermionTerm(-2.0, "CCcc", ev(0, 1, 0, 1)[::-1]),
            ]))

    ops = g1_singlet + g1_triplet + g2_singlet + g2_triplet + g3 + g4 + g5
    return apply_transforms(ops, transform)


# ------------------------------------------------------ triple excitations

def _possibilities(num: int, parity: str, lo: int, hi: int):
    shift = int(parity == "odd")
    lst = list(range(lo, hi))[(shift + lo) % 2:: 2]
    return combinations(lst, num)


def _triple_op(i, j, k, a, b, c, nq) -> FermionOperator:
    return FermionOperator(nq, [
        FermionTerm(1.0, "CCCccc", [a, b, c, k, j, i]),
        FermionTerm(-1.0, "CCCccc", [i, j, k, c, b, a]),
    ])


def triple_excitation(n_spatial_orb: int, n_occ: int) -> List[FermionOperator]:
    """Spin-conserving triples pool (reference generator_excitations.py:876-907)."""
    nq = 2 * n_spatial_orb
    out: List[FermionOperator] = []
    for (i, j, k) in _possibilities(3, "even", 0, n_occ):
        for (a, b, c) in _possibilities(3, "even", n_occ, nq):
            out.append(_triple_op(i, j, k, a, b, c, nq))
    for (i, j, k) in _possibilities(3, "odd", 0, n_occ):
        for (a, b, c) in _possibilities(3, "odd", n_occ, nq):
            out.append(_triple_op(i, j, k, a, b, c, nq))
    for (i, j) in _possibilities(2, "odd", 0, n_occ):
        for (k,) in _possibilities(1, "even", 0, n_occ):
            for (a, b) in _possibilities(2, "odd", n_occ, nq):
                for (c,) in _possibilities(1, "even", n_occ, nq):
                    out.append(_triple_op(i, j, k, a, b, c, nq))
    for (i, j) in _possibilities(2, "even", 0, n_occ):
        for (k,) in _possibilities(1, "odd", 0, n_occ):
            for (a, b) in _possibilities(2, "even", n_occ, nq):
                for (c,) in _possibilities(1, "odd", n_occ, nq):
                    out.append(_triple_op(i, j, k, a, b, c, nq))
    return out


def generate_cluster_ops_without_mp2(n_orb: int, n_occ: int) -> List[FermionOperator]:
    """Plain SD pool without MP2 screening (reference
    generator_excitations.py:910-954)."""
    nq = 2 * n_orb
    out: List[FermionOperator] = []
    for a in range(0, n_occ):
        for i in range(n_occ, nq):
            if i % 2 + a % 2 == 1:
                continue
            out.append(FermionOperator(nq, [
                FermionTerm(1.0, "Cc", [a, i]),
                FermionTerm(-1.0, "Cc", [i, a]),
            ]))
    for i in range(n_occ, nq):
        for j in range(i + 2, nq):
            for a in range(0, n_occ):
                for b in range(a + 2, n_occ):
                    if (i % 2 + a % 2 + j % 2 + b % 2) in (1, 2, 3):
                        continue
                    out.append(FermionOperator(nq, [
                        FermionTerm(1.0, "CCcc", [a, b, j, i]),
                        FermionTerm(-1.0, "CCcc", [i, j, b, a]),
                    ]))
    for i in range(n_occ, nq):
        if i % 2 == 1:
            continue
        for j in range(n_occ, nq):
            if j % 2 == 0:
                continue
            for a in range(0, n_occ):
                if a % 2 == 1:
                    continue
                for b in range(0, n_occ):
                    if b % 2 == 0:
                        continue
                    out.append(FermionOperator(nq, [
                        FermionTerm(1.0, "CCcc", [a, b, j, i]),
                        FermionTerm(-1.0, "CCcc", [i, j, b, a]),
                    ]))
    return out
