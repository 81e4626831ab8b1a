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
    eff_sectors: Optional[List[int]] = None   # sign-folded sectors actually
    #                                           substituted for X_pivot (the
    #                                           rotation G -> +-X_q can flip
    #                                           the sign); what
    #                                           taper_operator must reuse


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
                          kept_qubits=kept, eff_sectors=eff_sectors)


# ------------------------------------------------- ansatz (VQE) tapering
#
# Tapering a whole VQE problem — Hamiltonian, ansatz generators, and the
# HF reference — runs the SAME Clifford rotations over every operator and
# substitutes the SAME sector eigenvalues, which is exact as long as each
# ansatz generator commutes with every tapered symmetry (then the whole
# variational manifold stays inside the reference sector).  UCCSD-family
# excitations conserve the alpha- and beta-parity symmetries of any
# molecular Hamiltonian but may break its point-group-like Z2 symmetries,
# so the symmetry set must be FILTERED against the ansatz first.  No
# reference analog (the reference has no tapering at all; its battery app
# tapers Hamiltonians only, via the external symmer).

def ansatz_compatible_generators(ps: PauliSum,
                                 ops: Sequence[PauliSum]
                                 ) -> List[int]:
    """Z2 symmetry generators of ``ps`` that also commute with every term
    of every ansatz operator in ``ops`` (a Z-type (0, g) commutes with a
    term (x, z) iff parity(x & g) = 0).  Computed as the JOINT GF(2)
    nullspace of the Hamiltonian and ansatz x-masks — filtering the
    Hamiltonian's row-reduced basis would miss commuting COMBINATIONS of
    non-commuting rows (e.g. alpha-parity hiding inside two point-group
    rows)."""
    xs = sorted({x for (x, _z), _c in ps}
                | {x for op in ops for (x, _z), _c in op})
    gens, _ = gf2_row_reduce(gf2_nullspace(xs, ps.nbqbits))
    return gens


def taper_operator(op: PauliSum, tap: TaperingResult) -> PauliSum:
    """Apply a TaperingResult's Clifford rotations + qubit drops to another
    operator (an ansatz generator).  Exact iff ``op`` commutes with every
    tapered symmetry — enforced by _drop_qubits raising on any Z left on a
    pivot qubit."""
    if tap.eff_sectors is None:
        raise ValueError("TaperingResult lacks eff_sectors "
                         "(construct it via taper_hamiltonian)")
    rot = op
    for g, q in zip(tap.generators, tap.pivots):
        rot = clifford_conjugate(rot, 1 << q, g)
    return _drop_qubits(rot, tap.pivots, tap.eff_sectors)


def hf_to_ref_bits(hf_init: int, n: int) -> List[int]:
    """Computational-basis STATE INDEX -> per-qubit occupation bits.  The
    engine's state-index convention puts qubit q at bit (n-1-q)
    (sim/statevector.hf_state; reference molecule_factory.py:486-492
    big-endian ket)."""
    return [(hf_init >> (n - 1 - q)) & 1 for q in range(n)]


def taper_reference(hf_init: int, n: int, tap: TaperingResult) -> int:
    """Tapered-space state index of a computational reference state.  The
    Clifford rotation maps |ref> to |ref_kept> (x) (pivot X-eigenstates in
    the fixed sector), so the tapered reference is the kept-qubit
    restriction, re-encoded in the same big-endian index convention."""
    bits = hf_to_ref_bits(hf_init, n)
    nt = len(tap.kept_qubits)
    out = 0
    for i, q in enumerate(tap.kept_qubits):
        if bits[q]:
            out |= 1 << (nt - 1 - i)
    return out


def taper_vqe_problem(ps: PauliSum, ops: Sequence[PauliSum], hf_init: int
                      ) -> Tuple[PauliSum, List[PauliSum], int,
                                 TaperingResult]:
    """Taper a full VQE problem: every Z2 symmetry of ``ps`` that the
    ansatz respects is removed from the Hamiltonian, the generators, and
    the HF reference.  Returns (H_tapered, ops_tapered, hf_tapered, tap).
    theta=0 reproduces <HF|H|HF> exactly and the tapered variational
    minimum equals the untapered one (tests/test_tapering.py)."""
    gens = ansatz_compatible_generators(ps, ops)
    tap = taper_hamiltonian(ps, hf_to_ref_bits(hf_init, ps.nbqbits),
                            generators=gens)
    ops_t = [taper_operator(op, tap) for op in ops]
    hf_t = taper_reference(hf_init, ps.nbqbits, tap)
    return tap.tapered, ops_t, hf_t, tap
