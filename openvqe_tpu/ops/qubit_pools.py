"""Qubit operator pools for qubit-ADAPT-VQE.

Behavioral rebuild of reference ``common_files/qubit_pool.py`` (all 14
constructions).  Where the reference round-trips Pauli terms through strings
("[X0 Y1 ...]" parsing, qubit_pool.py:51-148), this implementation works on
(letters, qubits) tuples directly — same observable behavior (dedup order,
coefficients, sizes), no string parsing.

From-cluster pools (generate_pool_from_cluster, qubit_pool.py:1270-1316):
    full, full_without_Z, reduced_without_Z
Cluster-free pools (generate_pool_without_cluster, qubit_pool.py:1184-1268):
    YXXX, XYXX, XXYX, XXXY, random, two, four, eight,
    without_Z_from_generator, minimal, pure_with_symmetry
plus Yordanov qubit excitations (qubit_pool.py:1043-1182).
"""

from __future__ import annotations

import itertools
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .fermion import FermionOperator
from .pauli import PauliSum
from .transforms import transform_operator

TermKey = Tuple[str, Tuple[int, ...]]


def _term(nbqbits: int, coeff: float, letters: str, qubits: Sequence[int]) -> PauliSum:
    return PauliSum.from_term(nbqbits, coeff, letters, list(qubits))


class QubitPool:
    """Reference-parity pool factory (qubit_pool.py:7-1316)."""

    # ------------------------------------------------------------ from-cluster
    def generate_pool(self, cluster_ops: Sequence[FermionOperator]) -> List[PauliSum]:
        """JW image of each fermionic cluster operator (qubit_pool.py:29-48)."""
        return [transform_operator(op, "JW") for op in cluster_ops]

    def extract_terms(self, qubit_pool: Sequence[PauliSum]) -> List[TermKey]:
        """Flat, order-preserving dedup of all Pauli strings appearing in the
        pool (qubit_pool.py:51-79)."""
        seen: List[TermKey] = []
        for op in qubit_pool:
            for coeff, letters, qubits in op.terms:
                key = (letters, tuple(qubits))
                if key not in seen:
                    seen.append(key)
        return seen

    def terms_to_hamiltonian(self, terms: Sequence[TermKey],
                             nbqbits: int) -> List[PauliSum]:
        """Each term becomes its own operator with coefficient -1
        (qubit_pool.py:121-148)."""
        return [_term(nbqbits, -1.0, letters, qubits) for letters, qubits in terms]

    def extract_terms_without_z(self, terms: Sequence[TermKey]) -> List[TermKey]:
        """Strip Z factors, dedup (qubit_pool.py:198-229)."""
        out: List[TermKey] = []
        for letters, qubits in terms:
            new_letters = ""
            new_qubits: List[int] = []
            for ch, q in zip(letters, qubits):
                if ch != "Z":
                    new_letters += ch
                    new_qubits.append(q)
            key = (new_letters, tuple(new_qubits))
            if key not in out:
                out.append(key)
        return out

    def generate_reduced_qubit_pool(self, terms: Sequence[TermKey],
                                    nbqbits: int) -> List[PauliSum]:
        """Strip Zs and keep only the first string per qubit support
        (qubit_pool.py:233-274)."""
        pool: List[PauliSum] = []
        included: List[Tuple[int, ...]] = []
        for letters, qubits in terms:
            new_letters = ""
            new_qubits: List[int] = []
            for ch, q in zip(letters, qubits):
                if ch != "Z":
                    new_letters += ch
                    new_qubits.append(q)
            support = tuple(new_qubits)
            if support not in included:
                pool.append(_term(nbqbits, -1.0, new_letters, new_qubits))
                included.append(support)
        return pool

    def generate_pool_from_cluster(self, pool_condition: str,
                                   cluster_ops: Sequence[FermionOperator],
                                   nbqbits: int):
        qubit_pool = self.generate_pool(cluster_ops)
        terms = self.extract_terms(qubit_pool)
        print("The current pool is", pool_condition)
        if pool_condition == "full":
            pool = self.terms_to_hamiltonian(terms, nbqbits)
        elif pool_condition == "full_without_Z":
            pool = self.terms_to_hamiltonian(
                self.extract_terms_without_z(terms), nbqbits)
        elif pool_condition == "reduced_without_Z":
            pool = self.generate_reduced_qubit_pool(terms, nbqbits)
        else:
            return None, None
        return len(pool), pool

    # --------------------------------------------------------- parity pools
    def _parity_pool(self, nbqbits: int, four_string: str) -> List[PauliSum]:
        pool: List[PauliSum] = []
        for a, b in itertools.combinations(range(nbqbits), 2):
            if (a + b) % 2 == 0:
                pool.append(_term(nbqbits, -1.0, "YX", [a, b]))
        for a, b, c, d in itertools.combinations(range(nbqbits), 4):
            if (a % 2 + b % 2 + c % 2 + d % 2) % 2 == 0:
                pool.append(_term(nbqbits, -1.0, four_string, [a, b, c, d]))
        return pool

    def generate_yxxx_pool(self, nbqbits: int):
        pool = self._parity_pool(nbqbits, "YXXX")
        return len(pool), pool

    def generate_xyxx_pool(self, nbqbits: int):
        pool = self._parity_pool(nbqbits, "XYXX")
        return len(pool), pool

    def generate_xxyx_pool(self, nbqbits: int):
        pool = self._parity_pool(nbqbits, "XXYX")
        return len(pool), pool

    def generate_xxxy_pool(self, nbqbits: int):
        pool = self._parity_pool(nbqbits, "XXXY")
        return len(pool), pool

    def generate_random_pool(self, yxxx_pool, xyxx_pool, xxyx_pool, xxxy_pool,
                             seed: Optional[int] = None):
        """Per-slot random choice among the four parity pools
        (qubit_pool.py:430-465; np.random there, seedable here)."""
        rng = np.random.default_rng(seed) if seed is not None else np.random
        options = [yxxx_pool, xyxx_pool, xxyx_pool, xxxy_pool]
        pool = [options[int(rng.randint(0, 4)) if seed is None
                        else int(rng.integers(0, 4))][i]
                for i in range(len(xxxy_pool))]
        return len(pool), pool

    # ------------------------------------------------------- two/four/eight
    def generate_two_pools(self, nbqbits: int):
        """(qubit_pool.py:470-539)"""
        pool: List[PauliSum] = []
        for a, b in itertools.combinations(range(nbqbits), 2):
            if (a + b) % 2 == 0:
                op = _term(nbqbits, -1.0, "YX", [a, b])
                z = PauliSum.identity(nbqbits, 1.0) + _term(nbqbits, -1.0, "ZZ", [a, b])
                pool.append(op * z)
        for a, b, c, d in itertools.combinations(range(nbqbits), 4):
            if (a % 2 + b % 2 + c % 2 + d % 2) % 2 == 0:
                op = _term(nbqbits, -1.0, "XXYX", [a, b, c, d])
                z = PauliSum.identity(nbqbits, 1.0) + _term(
                    nbqbits, 1.0, "ZZZZ", [a, b, c, d])
                pool.append(op * z)
        return len(pool), pool

    def generate_four_pools(self, nbqbits: int):
        """(qubit_pool.py:542-697) — including its aaaa/bbbb double-append
        behavior."""
        pool: List[PauliSum] = []
        for a, b in itertools.combinations(range(nbqbits), 2):
            if (a + b) % 2 == 0:
                op = _term(nbqbits, -1.0, "YX", [a, b])
                z = PauliSum.identity(nbqbits, -1.0) + _term(nbqbits, 1.0, "ZZ", [a, b])
                pool.append(op * z)
        for a, b, c, d in itertools.combinations(range(nbqbits), 4):
            if (a % 2 + b % 2 + c % 2 + d % 2) % 2 != 0:
                continue
            op = _term(nbqbits, -1.0, "XXYX", [a, b, c, d])
            z1 = PauliSum.identity(nbqbits, -1.0) + _term(
                nbqbits, -1.0, "ZZZZ", [a, b, c, d])

            def zz(i, j):
                return PauliSum.identity(nbqbits, -1.0) + _term(
                    nbqbits, 1.0, "ZZ", [i, j])

            if a % 2 == b % 2 and c % 2 == d % 2 and b % 2 == c % 2:
                # aaaa/bbbb: the reference appends twice, then overwrites z2
                # with the (a,d) variant used by the shared append below
                pool.append(op * z1 * zz(c, d))
                pool.append(op * z1 * zz(b, d))
                z2 = zz(a, d)
            elif a % 2 == b % 2:
                z2 = zz(c, d)
            elif a % 2 == c % 2:
                z2 = zz(b, d)
            else:
                z2 = zz(a, d)
            pool.append(op * z1 * z2)
        return len(pool), pool

    # ----------------------------------------------- strip-Z per-op variants
    @staticmethod
    def _real_coeff(c: complex) -> float:
        """qat coefficient extraction (qubit_pool.py:729-732): real part if
        nonzero, else imaginary part (cluster-op images are anti-Hermitian)."""
        return float(c.real) if c.real != 0 else float(c.imag)

    def _strip_z_sum(self, nbqbits: int, op: PauliSum) -> Optional[PauliSum]:
        terms = op.terms
        if not terms:
            return None
        out = PauliSum.identity(nbqbits, 0.0)
        for coeff, letters, qubits in terms:
            new_letters = ""
            new_qubits: List[int] = []
            for ch, q in zip(letters, qubits):
                if ch != "Z":
                    new_letters += ch
                    new_qubits.append(q)
            out = out + _term(nbqbits, -1.0 * self._real_coeff(coeff),
                              new_letters, new_qubits)
        return out

    def generate_eight_pools(self, nbqbits: int, qubit_pool: Sequence[PauliSum]):
        """Strip Zs per operator, dedup up to global sign
        (qubit_pool.py:790-844)."""
        pool: List[PauliSum] = []
        for op in qubit_pool:
            new_op = self._strip_z_sum(nbqbits, op)
            if new_op is None:
                continue
            if any(_pauli_equal(new_op, e) or _pauli_equal(new_op * -1.0, e)
                   for e in pool):
                continue
            pool.append(new_op)
        return len(pool), pool

    def generate_pool_without_z_from_generator(self, nbqbits: int,
                                               qubit_pool: Sequence[PauliSum]):
        """Same as eight pools but without dedup (qubit_pool.py:848-903)."""
        pool: List[PauliSum] = []
        for op in qubit_pool:
            new_op = self._strip_z_sum(nbqbits, op)
            if new_op is not None:
                pool.append(new_op)
        return len(pool), pool

    # ------------------------------------------------------------- minimal
    def generate_minimal_pool(self, nbqbits: int):
        """qubit-ADAPT appendix-C V pool (qubit_pool.py:906-957)."""
        k = nbqbits - 1
        pool: List[PauliSum] = []
        for i in range(nbqbits):
            qubits = sorted([k - i] + [k - j for j in range(i)])
            letters = "Y" + "Z" * i
            pool.append(_term(nbqbits, -1.0, _sorted_letters(letters, [k - i],
                              qubits), qubits))
            if i not in (0, nbqbits - 1):
                qubits = sorted([k - i] + [k - j for j in range(i - 1)])
                letters = "Y" + "Z" * (i - 1)
                pool.append(_term(nbqbits, -1.0, _sorted_letters(letters, [k - i],
                                  qubits), qubits))
        return len(pool), pool

    def generate_pool_pure_with_symmetry(self, molecule_symbol: str = "H4"):
        """Symmetry-pure hardcoded H4 pool (qubit_pool.py:961-1040)."""
        pool: List[PauliSum] = []
        if molecule_symbol == "H4":
            specs = [
                (-1.0, "YIXIYIYI"), (-1.0, "ZYXIYIZY"), (-1.0, "YIZYXIZY"),
                (-1.0, "ZZYXYYII"), (+1.0, "XXIZIIXY"), (-1.0, "YIZYZXYI"),
                (-1.0, "XIYZYZYI"), (+1.0, "XZIIYZII"), (+1.0, "ZXXZZXYI"),
                (-1.0, "IYYZXIZY"), (+1.0, "XXIIIIXY"),
            ]
            for coeff, s in specs:
                pool.append(PauliSum.from_term(8, coeff, s))
        return len(pool), pool

    # ----------------------------------------------------- qubit excitations
    def single_position_generator(self, nos_qubits: int):
        return [(i, k) for i, k in itertools.permutations(range(nos_qubits), 2)
                if i < k]

    def double_position_generator(self, nos_qubits: int):
        return [t for t in itertools.permutations(range(nos_qubits), 4)
                if t[0] < t[1] < t[2] < t[3]]

    def generate_excitations(self, nbqbits: int, s, d):
        """Yordanov qubit-excitation operators (qubit_pool.py:1093-1149)."""
        pool: List[PauliSum] = []
        for i in s:
            pool.append(_term(nbqbits, -0.5, "XY", list(i))
                        + _term(nbqbits, +0.5, "YX", list(i)))
        for i in d:
            op = PauliSum.identity(nbqbits, 0.0)
            for coeff, letters in [(-0.125, "XYXX"), (-0.125, "YXXX"),
                                   (-0.125, "YYYX"), (-0.125, "YYXY"),
                                   (+0.125, "XXYX"), (+0.125, "XXXY"),
                                   (+0.125, "YXYY"), (+0.125, "XYYY")]:
                op = op + _term(nbqbits, coeff, letters, list(i))
            pool.append(op)
        return len(pool), pool

    def qubit_excitations(self, nbqbits: int):
        s = self.single_position_generator(nbqbits)
        d = self.double_position_generator(nbqbits)
        n, pool = self.generate_excitations(nbqbits, s, d)
        return s, d, n, pool

    # ------------------------------------------------------------- dispatch
    def generate_pool_without_cluster(self, pool_type: str, nbqbits: int = 12,
                                      qubit_pool: Optional[Sequence[PauliSum]] = None,
                                      molecule_symbol: str = "H4",
                                      seed: Optional[int] = None):
        print("The current pool is", pool_type)
        if pool_type == "YXXX":
            return self.generate_yxxx_pool(nbqbits)
        if pool_type == "XYXX":
            return self.generate_xyxx_pool(nbqbits)
        if pool_type == "XXYX":
            return self.generate_xxyx_pool(nbqbits)
        if pool_type == "XXXY":
            return self.generate_xxxy_pool(nbqbits)
        if pool_type == "random":
            _, yxxx = self.generate_yxxx_pool(nbqbits)
            _, xyxx = self.generate_xyxx_pool(nbqbits)
            _, xxyx = self.generate_xxyx_pool(nbqbits)
            _, xxxy = self.generate_xxxy_pool(nbqbits)
            return self.generate_random_pool(yxxx, xyxx, xxyx, xxxy, seed=seed)
        if pool_type == "two":
            return self.generate_two_pools(nbqbits)
        if pool_type == "four":
            return self.generate_four_pools(nbqbits)
        if pool_type == "eight":
            return self.generate_eight_pools(nbqbits, qubit_pool)
        if pool_type == "without_Z_from_generator":
            return self.generate_pool_without_z_from_generator(nbqbits, qubit_pool)
        if pool_type == "minimal":
            return self.generate_minimal_pool(nbqbits)
        if pool_type == "pure_with_symmetry":
            return self.generate_pool_pure_with_symmetry(molecule_symbol)
        if pool_type == "qubit_excitations":
            _, _, n, pool = self.qubit_excitations(nbqbits)
            return n, pool
        raise ValueError(f"unknown pool type {pool_type!r}")


def _sorted_letters(letters: str, y_qubits: List[int], sorted_qubits: List[int]) -> str:
    """Place the single 'Y' at its qubit's position within the sorted qubit
    list; all other positions are 'Z' (minimal-pool construction)."""
    out = []
    for q in sorted_qubits:
        out.append("Y" if q in y_qubits else "Z")
    return "".join(out)


def _pauli_equal(a: PauliSum, b: PauliSum, tol: float = 1e-10) -> bool:
    if abs(a.constant_coeff - b.constant_coeff) > tol:
        return False
    keys = set(a._terms) | set(b._terms)
    return all(abs(a._terms.get(k, 0.0) - b._terms.get(k, 0.0)) <= tol
               for k in keys)
