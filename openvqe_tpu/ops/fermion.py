"""Fermionic-operator IR and normal ordering.

TPU-native replacement for qat's ``Term``/``FermionHamiltonian`` and the
reference's ordering utilities (behavioral parity with
``openvqe/common_files/fermion_util.py:5-114``: creation ops left, annihilation
ops right, each block sorted by ascending mode index with anticommutation
signs; duplicate indices within a block annihilate the term; a ``c``/``C``
swap on the same mode emits the contraction term).

Terms are ``coeff * prod_k op_k(mode_k)`` with op chars 'C' (creation) and
'c' (annihilation), e.g. ``FermionTerm(1.0, "CCcc", [4, 5, 1, 0])``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple


@dataclass
class FermionTerm:
    coeff: complex
    ops: str            # string over {'C', 'c'}
    qbits: List[int]    # spin-orbital (mode) indices, len == len(ops)

    def __post_init__(self):
        assert len(self.ops) == len(self.qbits)
        assert all(ch in "Cc" for ch in self.ops)

    @property
    def op(self) -> str:  # qat-compatible alias
        return self.ops

    def key(self) -> Tuple[str, Tuple[int, ...]]:
        return (self.ops, tuple(self.qbits))

    def dagger(self) -> "FermionTerm":
        swapped = "".join("C" if ch == "c" else "c" for ch in reversed(self.ops))
        return FermionTerm(self.coeff.conjugate(), swapped, list(reversed(self.qbits)))


class FermionOperator:
    """Sum of fermionic terms on ``nbqbits`` modes (qat ``FermionHamiltonian``
    equivalent, construction API mirrored from reference
    ``generator_excitations.py:122,152``)."""

    __slots__ = ("nbqbits", "terms", "constant_coeff")

    def __init__(self, nbqbits: int, terms: Optional[List[FermionTerm]] = None,
                 constant_coeff: complex = 0.0):
        self.nbqbits = nbqbits
        self.terms: List[FermionTerm] = list(terms) if terms else []
        self.constant_coeff = complex(constant_coeff)

    def copy(self) -> "FermionOperator":
        return FermionOperator(
            self.nbqbits,
            [FermionTerm(t.coeff, t.ops, list(t.qbits)) for t in self.terms],
            self.constant_coeff,
        )

    def __add__(self, other):
        if isinstance(other, (int, float)) and other == 0:  # sum() support
            return self.copy()
        if not isinstance(other, FermionOperator):
            return NotImplemented
        return FermionOperator(
            max(self.nbqbits, other.nbqbits),
            self.terms + other.terms,
            self.constant_coeff + other.constant_coeff,
        )

    def __radd__(self, other):
        if isinstance(other, (int, float)) and other == 0:
            return self.copy()
        return NotImplemented

    def __mul__(self, scalar):
        if not isinstance(scalar, (int, float, complex)):
            return NotImplemented
        return FermionOperator(
            self.nbqbits,
            [FermionTerm(t.coeff * scalar, t.ops, list(t.qbits)) for t in self.terms],
            self.constant_coeff * scalar,
        )

    __rmul__ = __mul__

    def __truediv__(self, scalar):
        return self * (1.0 / scalar)

    def dagger(self) -> "FermionOperator":
        return FermionOperator(self.nbqbits, [t.dagger() for t in self.terms],
                               self.constant_coeff.conjugate())

    def merged(self, tol: float | None = None) -> "FermionOperator":
        """Merge terms with identical (ops, qbits); reference
        ``generator_excitations.py:362-400`` (merge_duplicate_terms).

        ``tol=None`` keeps exactly-cancelled (zero-coefficient) terms — the
        reference/qat behavior that pool-size goldens depend on (a fully
        cancelled operator still occupies a pool slot, e.g. the p==q
        spin-complement singles).  Pass a float to prune instead."""
        acc: Dict[Tuple[str, Tuple[int, ...]], complex] = {}
        order: List[Tuple[str, Tuple[int, ...]]] = []
        for t in self.terms:
            k = t.key()
            if k in acc:
                acc[k] += t.coeff
            else:
                acc[k] = t.coeff
                order.append(k)
        terms = [FermionTerm(acc[k], k[0], list(k[1])) for k in order
                 if tol is None or abs(acc[k]) > tol]
        return FermionOperator(self.nbqbits, terms, self.constant_coeff)

    def normal_ordered(self) -> "FermionOperator":
        out: List[FermionTerm] = []
        for t in self.terms:
            out.extend(order_fermionic_term(t))
        return FermionOperator(self.nbqbits, out, self.constant_coeff).merged(tol=1e-15)

    def norm2(self) -> float:
        return float(sum(abs(t.coeff) ** 2 for t in self.terms) ** 0.5)

    def __repr__(self):
        body = " ".join(f"{t.coeff:+.4g}*{t.ops}{t.qbits}" for t in self.terms[:6])
        more = f" ...({len(self.terms)} terms)" if len(self.terms) > 6 else ""
        return f"FermionOperator({self.nbqbits}m: {body}{more})"


# --------------------------------------------------------------------------
# Normal ordering (parity with reference fermion_util.py semantics)
# --------------------------------------------------------------------------

def permute_fermionic_operator(term: FermionTerm, ind: int) -> List[FermionTerm]:
    """Swap the operators at positions ``ind`` and ``ind+1`` using the
    fermionic anticommutation relations.  When the pair is {c,C} on the same
    mode, returns the contraction term plus the signed swap; otherwise just
    the signed swap (reference fermion_util.py:5-29)."""
    ops, qb, coeff = term.ops, term.qbits, term.coeff
    if ind >= len(ops) - 1:
        raise IndexError("permutation index out of range")
    swapped_ops = ops[:ind] + ops[ind + 1] + ops[ind] + ops[ind + 2:]
    swapped_qb = qb[:]
    swapped_qb[ind], swapped_qb[ind + 1] = swapped_qb[ind + 1], swapped_qb[ind]
    pair = ops[ind:ind + 2]
    if "c" in pair and "C" in pair and qb[ind] == qb[ind + 1]:
        return [
            FermionTerm(coeff, ops[:ind] + ops[ind + 2:], qb[:ind] + qb[ind + 2:]),
            FermionTerm(-coeff, swapped_ops, swapped_qb),
        ]
    return [FermionTerm(-coeff, swapped_ops, swapped_qb)]


def order_qubits(term: FermionTerm) -> Optional[FermionTerm]:
    """Sort the creation block and annihilation block each by ascending mode
    index with insertion-count signs; a repeated index in a block annihilates
    the term (returns None).  Parity with reference fermion_util.py:31-70."""
    ops, qb, coeff = term.ops, term.qbits, term.coeff
    ind_c = ops.find("c")
    if ind_c < 0:
        ind_c = len(ops)
    blocks = [qb[:ind_c], qb[ind_c:]]
    new_qbits: List[int] = []
    for block in blocks:
        tmp = block[:]
        ordered = False
        while not ordered:
            i = 0
            while i < len(tmp) - 1 and tmp[i] <= tmp[i + 1]:
                if tmp[i] == tmp[i + 1]:
                    return None  # C_p C_p = 0 / c_p c_p = 0
                i += 1
            if i < len(tmp) - 1:
                i += 1
                j = 0
                while tmp[j] < tmp[i]:
                    j += 1
                if tmp[j] == tmp[i]:
                    return None
                elt = tmp.pop(i)
                tmp.insert(j, elt)
                coeff *= (-1) ** (i - j)
            else:
                ordered = True
        new_qbits += tmp
    return FermionTerm(coeff, ops, new_qbits)


def order_fermionic_ops(term: FermionTerm) -> List[FermionTerm]:
    """Bubble every creation operator to the left of every annihilation
    operator (reference fermion_util.py:72-96)."""
    ops = term.ops
    ind_c = ops.find("c")
    if ind_c < 0:
        return [term]
    rest = ops[ind_c:]
    ind_C_rel = rest.find("C")
    if ind_C_rel < 0:
        return [term]
    ind_C = ind_C_rel + ind_c
    out: List[FermionTerm] = []
    for t in permute_fermionic_operator(term, ind_C - 1):
        out.extend(order_fermionic_ops(t))
    return out


def order_fermionic_term(term: FermionTerm) -> List[FermionTerm]:
    """Full normal ordering of a single term; drops annihilated terms
    (reference fermion_util.py:98-114)."""
    ordered: List[FermionTerm] = []
    for t in order_fermionic_ops(term):
        ot = order_qubits(t)
        if ot is not None:
            ordered.append(ot)
    return ordered
