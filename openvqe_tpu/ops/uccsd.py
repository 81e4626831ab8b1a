"""UCCSD cluster operators, MP2 initial guess, and HF occupation integer.

Replacement for ``qat.fermion.chemistry.ucc_deprecated.
get_cluster_ops_and_init_guess`` (consumed at reference
generator_excitations.py:76-78 and molecule_factory.py:473-475).

Spin-orbital convention: interleaved (alpha = even, beta = odd), occupied =
the lowest ``n_elec`` spin-orbitals of the RHF determinant.  hpqrs is the
spin-orbital tensor of ``ops.hamiltonian.convert_to_h_integrals`` so
<ab|ij> = hpqrs[a, b, j, i].
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from .fermion import FermionOperator, FermionTerm


def occupied_spin_orbitals(n_elec: int, n_alpha: int = None) -> List[int]:
    """Occupied spin-orbitals of the (RO)HF determinant in the interleaved
    convention.  Closed shell: the lowest n_elec; open shell (n_alpha given):
    alpha orbitals 0..n_alpha-1 (even) and beta 0..n_beta-1 (odd)."""
    if n_alpha is None:
        if n_elec % 2:
            raise ValueError(
                f"odd n_elec={n_elec} needs an explicit n_alpha (the "
                "closed-shell default determinant would be in the wrong "
                "spin sector)")
        return list(range(n_elec))
    n_beta = n_elec - n_alpha
    if not 0 <= n_beta <= n_alpha:
        raise ValueError(f"invalid (n_elec={n_elec}, n_alpha={n_alpha})")
    return sorted([2 * i for i in range(n_alpha)]
                  + [2 * i + 1 for i in range(n_beta)])


def uccsd_excitations(n_spin_orb: int, n_elec
                      ) -> Tuple[List[Tuple[int, int]], List[Tuple[int, int, int, int]]]:
    """Spin-conserving occupied->virtual singles (i, a) and doubles
    (i, j, a, b) with i<j, a<b.  ``n_elec`` may be an explicit occupied
    spin-orbital list (open-shell determinants)."""
    occ = (list(range(n_elec)) if isinstance(n_elec, (int, np.integer))
           else list(n_elec))
    virt = [p for p in range(n_spin_orb) if p not in set(occ)]
    singles = [(i, a) for i in occ for a in virt if i % 2 == a % 2]
    doubles = []
    for xi, i in enumerate(occ):
        for j in occ[xi + 1:]:
            for xa, a in enumerate(virt):
                for b in virt[xa + 1:]:
                    if sorted((i % 2, j % 2)) == sorted((a % 2, b % 2)):
                        doubles.append((i, j, a, b))
    return singles, doubles


def single_op(i: int, a: int, n: int, coeff: float = 1.0) -> FermionOperator:
    """T - T† for a single excitation: a†_a a_i - a†_i a_a."""
    return FermionOperator(n, [
        FermionTerm(coeff, "Cc", [a, i]),
        FermionTerm(-coeff, "Cc", [i, a]),
    ])


def double_op(i: int, j: int, a: int, b: int, n: int,
              coeff: float = 1.0) -> FermionOperator:
    """a†_a a†_b a_j a_i - a†_i a†_j a_b a_a."""
    return FermionOperator(n, [
        FermionTerm(coeff, "CCcc", [a, b, j, i]),
        FermionTerm(-coeff, "CCcc", [i, j, b, a]),
    ])


def get_cluster_ops_and_init_guess(
    n_elec: int,
    noons_full: Sequence[float],
    orb_energies_full: Sequence[float],
    hpqrs: np.ndarray,
    n_alpha: int = None,
) -> Tuple[List[FermionOperator], List[float], int]:
    """(cluster_ops, theta_MP2, hf_init).

    theta for doubles is the spin-orbital MP2 amplitude
    t_ijab = <ab||ij> / (e_i + e_j - e_a - e_b); singles get 0.
    hf_init encodes the HF determinant with spin-orbital 0 as MSB
    (the layout consumed by numpy.binary_repr at molecule_factory.py:486).
    Pass ``n_alpha`` for an open-shell (ROHF) reference determinant.
    """
    n = len(list(noons_full))
    eps = np.asarray(orb_energies_full, dtype=float)
    ops: List[FermionOperator] = []
    thetas: List[float] = []

    occ = occupied_spin_orbitals(n_elec, n_alpha)
    singles, doubles = uccsd_excitations(n, occ)
    for (i, a) in singles:
        ops.append(single_op(i, a, n))
        thetas.append(0.0)
    for (i, j, a, b) in doubles:
        ops.append(double_op(i, j, a, b, n))
        g_abij = hpqrs[a, b, j, i]   # <ab|ij>
        g_abji = hpqrs[a, b, i, j]   # <ab|ji>
        denom = eps[i] + eps[j] - eps[a] - eps[b]
        thetas.append(float((g_abij - g_abji) / denom) if denom != 0 else 0.0)

    hf_init = 0
    for k in occ:
        hf_init |= 1 << (n - 1 - k)
    return ops, thetas, hf_init
