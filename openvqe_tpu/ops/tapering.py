"""Z2-symmetry qubit tapering (Bravyi et al.) on the symplectic Pauli IR.

The reference's battery application tapers its 16-qubit Li2FeSiO4
Hamiltonian to 14 qubits via symmer's ``QubitTapering``
(applications/quantum_batteries/contextual_subspace.ipynb cells 26-34)
before the contextual-subspace projection; the package itself delegates to
the external symmer/tangelo stack.  This module is the native equivalent:

1. **Symmetry finding** — Z-type Pauli operators commuting with every
   Hamiltonian term are the GF(2) nullspace of the x-mask matrix
   (a Z-type P=(0, z) commutes with term (x_t, z_t) iff parity(x_t & z)=0).
   The basis is row-reduced so each generator owns a pivot qubit the others
   do not touch.
2. **Clifford rotation** — each generator G_i maps onto the single-qubit
   X_{q_i} (q_i its pivot) by conjugation with exp(+- i pi/4 A_i),
   A_i = Y_{q_i} (x) Z_{rest of G_i}; pivot exclusivity keeps the other
   generators invariant.  Conjugation acts termwise on the (x, z)
   symplectic masks with an XZ-form phase — no matrices.
3. **Sector + projection** — the eigenvalue of G_i on a computational
   reference state (the HF determinant) fixes the symmetry sector;
   X_{q_i} is substituted by it and qubit q_i removed.

Tapering is EXACT for states in the reference sector (tests pin the
tapered ground energy to the full FCI value).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .pauli import PauliSum, _popcount


# ------------------------------------------------------------- GF(2) algebra

def gf2_row_reduce(rows: List[int]) -> Tuple[List[int], List[int]]:
    """Row-reduce integer bitmask rows over GF(2).  Returns (reduced
    nonzero rows, pivot bit positions), each row owning a pivot bit that is
    cleared from all other rows."""
    rows = [int(r) for r in rows if r]
    reduced: List[int] = []
    pivots: List[int] = []
    for r in rows:
        for p, piv in zip(reduced, pivots):
            if (r >> piv) & 1:
                r ^= p
        if r == 0:
            continue
        piv = r.bit_length() - 1
        reduced = [p ^ r if (p >> piv) & 1 else p for p in reduced]
        reduced.append(r)
        pivots = [pv for pv in pivots]
        pivots.append(piv)
    return reduced, pivots


def gf2_nullspace(rows: List[int], n_bits: int) -> List[int]:
    """Basis of {v : parity(row & v) = 0 for all rows} as bitmasks."""
    reduced, pivots = gf2_row_reduce(rows)
    pivot_set = set(pivots)
    free = [b for b in range(n_bits) if b not in pivot_set]
    basis: List[int] = []
    for f in free:
        v = 1 << f
        # back-substitute: pivot bit of each row fixed by the free bits
        for r, piv in zip(reduced, pivots):
            if _popcount(r & v) % 2:
                v ^= 1 << piv
        basis.append(v)
    return basis


# --------------------------------------------------------- Clifford rotation

def clifford_conjugate(ps: PauliSum, x_a: int, z_a: int,
                       direction: int = 1) -> PauliSum:
    """exp(-i direction pi/4 A) ps exp(+i direction pi/4 A) for the
    Hermitian Pauli A with symplectic masks (x_a, z_a): commuting terms pass
    through, anticommuting terms map to +- i A*T (XZ-form phase algebra)."""
    h_a = (1j) ** (_popcount(x_a & z_a) % 4)    # Hermitian A = h_a X^x Z^z
    out = {}
    for (x, z), c in ps:
        if (_popcount(x_a & z) + _popcount(z_a & x)) % 2 == 0:
            key, val = (x, z), c
        else:
            sign = -1.0 if _popcount(z_a & x) % 2 else 1.0
            key = (x_a ^ x, z_a ^ z)
            val = direction * 1j * h_a * c * sign
        cur = out.get(key, 0.0)
        out[key] = cur + val
    res = PauliSum(ps.nbqbits, {k: v for k, v in out.items() if v != 0},
                   ps.constant_coeff)
    return res


def _drop_qubits(ps: PauliSum, drop: Sequence[int],
                 sectors: Sequence[int]) -> PauliSum:
    """Substitute X_{q} -> sector eigenvalue on the dropped qubits (terms
    must have no Z there) and compress the remaining qubit indices."""
    drop = list(drop)
    keep = [q for q in range(ps.nbqbits) if q not in drop]
    pos = {q: i for i, q in enumerate(keep)}
    sec = {q: s for q, s in zip(drop, sectors)}
    out = PauliSum(len(keep), {}, ps.constant_coeff)
    for (x, z), c in ps:
        coeff = c
        nx = nz = 0
        for q in drop:
            bit = 1 << q
            if z & bit:
                raise ValueError(f"term has Z on tapered qubit {q}")
            if x & bit:
                coeff = coeff * sec[q]
        for q in keep:
            bit = 1 << q
            if x & bit:
                nx |= 1 << pos[q]
            if z & bit:
                nz |= 1 << pos[q]
        if nx == 0 and nz == 0:
            out.constant_coeff += coeff
        else:
            out._iadd_term((nx, nz), coeff)
    return out


# ----------------------------------------------------------------- tapering

@dataclass
class TaperingResult:
    tapered: PauliSum
    generators: List[int]     # Z-type symmetry z-masks (row-reduced)
    pivots: List[int]         # the qubit each generator was rotated onto
    sectors: List[int]        # +-1 eigenvalues fixed by the reference state
    kept_qubits: List[int]


def z2_symmetry_generators(ps: PauliSum) -> Tuple[List[int], List[int]]:
    """Independent Z-type symmetry generators (z-masks) of a Pauli sum and
    their pivot qubits."""
    x_rows = sorted({x for (x, z), _ in ps})
    null = gf2_nullspace(x_rows, ps.nbqbits)
    return gf2_row_reduce(null)


def reference_sector(generators: Sequence[int], ref_bits: Sequence[int]
                     ) -> List[int]:
    """(-1)^{|g & ref|} for a computational reference state given as a bit
    per qubit (qubit index order)."""
    ref = 0
    for q, b in enumerate(ref_bits):
        if b:
            ref |= 1 << q
    return [1 - 2 * (_popcount(g & ref) % 2) for g in generators]


def taper_hamiltonian(ps: PauliSum, ref_bits: Sequence[int],
                      generators: Optional[List[int]] = None
                      ) -> TaperingResult:
    """Taper every Z2 symmetry of ``ps``, fixing the sector of the
    computational reference state (e.g. the HF determinant)."""
    if generators is None:
        generators, pivots = z2_symmetry_generators(ps)
    else:
        generators, pivots = gf2_row_reduce(list(generators))
    sectors = reference_sector(generators, ref_bits)

    rotated = ps
    eff_sectors = []
    for g, q, s in zip(generators, pivots, sectors):
        # A = Y_q (x) Z_{g \ q}: anticommutes with G (and with X_q), leaves
        # the other generators (pivot-exclusive) invariant
        rotated = clifford_conjugate(rotated, 1 << q, g)
        # the rotation maps G -> sign * X_q; fold the sign into the sector
        g_rot = clifford_conjugate(PauliSum(ps.nbqbits, {(0, g): 1.0}),
                                   1 << q, g)
        ((gx, gz), gc), = list(g_rot)
        assert gx == 1 << q and gz == 0, "generator did not rotate to X_q"
        eff_sectors.append(s * int(np.sign(gc.real)))
    tapered = _drop_qubits(rotated, pivots, eff_sectors)
    kept = [q for q in range(ps.nbqbits) if q not in pivots]
    return TaperingResult(tapered=tapered, generators=list(generators),
                          pivots=list(pivots), sectors=sectors,
                          kept_qubits=kept)
