"""Sparse Pauli-operator algebra (host side).

This is the qubit-operator IR of the framework: the TPU-native replacement for
myQLM's ``SpinHamiltonian``/``Term`` objects (reference:
``openvqe/common_files/qubit_pool.py:3-5`` and ``qat.fermion`` spin Hamiltonians).

Representation
--------------
Every Pauli string is stored in symplectic form ``c * X^x Z^z`` where ``x`` and
``z`` are Python-int bitmasks (bit ``q`` == qubit ``q``) and the complex
coefficient ``c`` absorbs the ``Y = i X Z`` phases.  Products, sums and
Hermitian checks are then pure bit arithmetic — no per-qubit string juggling,
no 2^n matrices.  ``PauliSum.compile(n)`` lowers the operator to flat numpy
mask/coefficient arrays consumed by the JAX statevector engine
(``openvqe_tpu.sim``), where a term acts on an amplitude index ``i`` as

    P |i> = phase(i) |i XOR x_perm>,   phase(i) = lam * (-1)^popcount(i & zy_perm)

with ``lam = c * i^{nY}`` folded in at compile time.
"""

from __future__ import annotations

import cmath
from typing import Dict, Iterable, Iterator, List, Tuple

import numpy as np

_PAULI_CHARS = ("I", "X", "Y", "Z")

# coefficient threshold below which a term is considered cancelled (the
# reference drops operators whose spin image is empty,
# generator_excitations.py:30-32; exact cancellations there are symbolic, so a
# tight epsilon reproduces the same pool sizes).
DEFAULT_TOL = 1e-12


def _popcount(v: int) -> int:
    return bin(v).count("1")


def string_to_xz(pauli: str, qubits: Iterable[int] | None = None) -> Tuple[int, int, complex]:
    """Convert a Pauli-char string to ``(x, z, phase)`` with ``P = phase * X^x Z^z``.

    ``pauli`` may be a dense string over qubits ``0..len-1`` (when ``qubits`` is
    None) or a compact op string paired with explicit qubit indices.
    """
    if qubits is None:
        qubits = range(len(pauli))
    x = 0
    z = 0
    phase = 1.0 + 0.0j
    for ch, q in zip(pauli, qubits):
        bit = 1 << q
        if ch in ("I", "i"):
            continue
        if ch in ("X", "x"):
            x |= bit
        elif ch in ("Z", "z"):
            z |= bit
        elif ch in ("Y", "y"):
            # Y = i X Z  ->  c * Y == (c * i) * X Z, so fold +i per Y into
            # the coefficient of the stored X^x Z^z form.
            x |= bit
            z |= bit
            phase *= 1j
        else:
            raise ValueError(f"bad Pauli char {ch!r}")
    return x, z, phase


def xz_to_string(x: int, z: int, nqbits: int) -> Tuple[str, complex]:
    """Inverse of :func:`string_to_xz`: returns (chars, phase) with
    ``X^x Z^z = phase * (Pauli string of chars)``."""
    chars = []
    phase = 1.0 + 0.0j
    for q in range(nqbits):
        bit = 1 << q
        has_x = bool(x & bit)
        has_z = bool(z & bit)
        if has_x and has_z:
            chars.append("Y")
            phase *= -1j  # X Z = -i Y
        elif has_x:
            chars.append("X")
        elif has_z:
            chars.append("Z")
        else:
            chars.append("I")
    return "".join(chars), phase


class PauliSum:
    """A complex-weighted sum of Pauli strings on ``nbqbits`` qubits.

    Mirrors the role of ``qat``'s ``SpinHamiltonian`` (construction API at
    reference ``common_files/qubit_pool.py:121-148``) but with symplectic
    bitmask storage and vectorised lowering for the device engine.
    """

    __slots__ = ("nbqbits", "_terms", "constant_coeff")

    def __init__(
        self,
        nbqbits: int,
        terms: Dict[Tuple[int, int], complex] | None = None,
        constant_coeff: complex = 0.0,
    ):
        self.nbqbits = nbqbits
        self._terms: Dict[Tuple[int, int], complex] = dict(terms) if terms else {}
        self.constant_coeff = complex(constant_coeff)

    # ------------------------------------------------------------------ build
    @classmethod
    def from_term(cls, nbqbits: int, coeff: complex, pauli: str,
                  qubits: Iterable[int] | None = None) -> "PauliSum":
        x, z, phase = string_to_xz(pauli, qubits)
        if x == 0 and z == 0:
            return cls(nbqbits, {}, constant_coeff=coeff * phase)
        return cls(nbqbits, {(x, z): coeff * phase})

    @classmethod
    def identity(cls, nbqbits: int, coeff: complex = 1.0) -> "PauliSum":
        return cls(nbqbits, {}, constant_coeff=coeff)

    @classmethod
    def from_dict(cls, d: Dict[str, complex]) -> "PauliSum":
        """Build from {pauli_string: coeff} with dense strings (qubit 0 first)."""
        n = max(len(k) for k in d)
        out = cls(n)
        for s, c in d.items():
            out += cls.from_term(n, c, s)
        return out

    def copy(self) -> "PauliSum":
        return PauliSum(self.nbqbits, self._terms, self.constant_coeff)

    # -------------------------------------------------------------- inspection
    @property
    def terms(self) -> List[Tuple[complex, str, List[int]]]:
        """Sparse term view: list of (coeff, op_chars, qubit_indices) with
        identity qubits omitted (matches qat's Term layout)."""
        out = []
        for (x, z) in sorted(self._terms):
            c = self._terms[(x, z)]
            chars = []
            qbits = []
            phase = 1.0 + 0.0j
            for q in range(self.nbqbits):
                bit = 1 << q
                hx, hz = bool(x & bit), bool(z & bit)
                if hx and hz:
                    chars.append("Y")
                    qbits.append(q)
                    phase *= -1j
                elif hx:
                    chars.append("X")
                    qbits.append(q)
                elif hz:
                    chars.append("Z")
                    qbits.append(q)
            out.append((c * phase, "".join(chars), qbits))
        return out

    def to_coeff_dict(self, imag_tol: float = 1e-9) -> Dict[str, float]:
        """{dense_string: real_coeff} — inverse of ``from_dict`` (the
        constant rides the all-identity string).  Raises if any
        coefficient's imaginary part exceeds ``imag_tol`` (contextual-
        subspace projections carry small imaginary parts that the
        reference also drops — its utils.py:41 keeps only real parts;
        pass a loose tolerance there)."""
        out: Dict[str, complex] = {}
        n = self.nbqbits
        for coeff, chars, qbits in self.terms:
            s = ["I"] * n
            for ch, q in zip(chars, qbits):
                s[q] = ch
            out["".join(s)] = out.get("".join(s), 0.0) + coeff
        if abs(complex(self.constant_coeff)) > 0:
            key = "I" * n
            out[key] = out.get(key, 0.0) + complex(self.constant_coeff)
        bad = max((abs(complex(v).imag) for v in out.values()), default=0.0)
        if bad > imag_tol:
            raise ValueError(f"non-Hermitian coefficient (imag {bad:.2e})")
        return {k: float(complex(v).real) for k, v in out.items()}

    def __len__(self) -> int:
        return len(self._terms)

    def __iter__(self) -> Iterator[Tuple[Tuple[int, int], complex]]:
        return iter(sorted(self._terms.items()))

    def is_empty(self, tol: float = DEFAULT_TOL) -> bool:
        return all(abs(c) <= tol for c in self._terms.values())

    def is_hermitian(self, tol: float = 1e-10) -> bool:
        if abs(self.constant_coeff.imag) > tol:
            return False
        for (x, z), c in self._terms.items():
            # (X^x Z^z)^dagger = (-1)^{popcount(x&z)} X^x Z^z
            sign = -1.0 if _popcount(x & z) % 2 else 1.0
            if abs(c.conjugate() * sign - c) > tol:
                return False
        return True

    # ------------------------------------------------------------- arithmetic
    def _iadd_term(self, key: Tuple[int, int], coeff: complex) -> None:
        cur = self._terms.get(key)
        if cur is None:
            self._terms[key] = coeff
        else:
            cur = cur + coeff
            if cur == 0:
                del self._terms[key]
            else:
                self._terms[key] = cur

    def __add__(self, other):
        if isinstance(other, (int, float, complex)):
            out = self.copy()
            out.constant_coeff += other
            return out
        if not isinstance(other, PauliSum):
            return NotImplemented
        out = self.copy()
        out.constant_coeff += other.constant_coeff
        for k, c in other._terms.items():
            out._iadd_term(k, c)
        return out

    __radd__ = __add__

    def __sub__(self, other):
        return self + (other * -1.0)

    def __mul__(self, other):
        if isinstance(other, (int, float, complex)):
            out = PauliSum(self.nbqbits, {k: c * other for k, c in self._terms.items()},
                           self.constant_coeff * other)
            return out
        if not isinstance(other, PauliSum):
            return NotImplemented
        out = PauliSum(max(self.nbqbits, other.nbqbits))
        ca, cb = self.constant_coeff, other.constant_coeff
        out.constant_coeff = ca * cb
        if cb != 0:
            for k, c in self._terms.items():
                out._iadd_term(k, c * cb)
        if ca != 0:
            for k, c in other._terms.items():
                out._iadd_term(k, c * ca)
        for (x1, z1), c1 in self._terms.items():
            for (x2, z2), c2 in other._terms.items():
                sign = -1.0 if _popcount(z1 & x2) % 2 else 1.0
                key = (x1 ^ x2, z1 ^ z2)
                coeff = c1 * c2 * sign
                if key == (0, 0):
                    out.constant_coeff += coeff
                else:
                    out._iadd_term(key, coeff)
        return out

    def __rmul__(self, other):
        if isinstance(other, (int, float, complex)):
            return self * other
        return NotImplemented

    def __truediv__(self, other):
        return self * (1.0 / other)

    def dagger(self) -> "PauliSum":
        out = PauliSum(self.nbqbits, constant_coeff=self.constant_coeff.conjugate())
        for (x, z), c in self._terms.items():
            sign = -1.0 if _popcount(x & z) % 2 else 1.0
            out._terms[(x, z)] = c.conjugate() * sign
        return out

    def prune(self, tol: float = DEFAULT_TOL) -> "PauliSum":
        self._terms = {k: c for k, c in self._terms.items() if abs(c) > tol}
        return self

    def norm2(self) -> float:
        """sqrt(sum |c|^2) over non-identity terms (used by singlet_sd/gsd
        normalisation, reference generator_excitations.py:352-354)."""
        return float(np.sqrt(sum(abs(c) ** 2 for c in self._terms.values())))

    # ------------------------------------------------------------- lowering
    def compile(self, nbqbits: int | None = None, drop_identity: bool = True):
        """Lower to flat arrays for the device engine.

        Returns dict with int64 arrays ``x`` (bit-flip masks over the *state
        index*, MSB = qubit 0), ``zy`` (sign masks), complex ``coeff`` with the
        i^{nY} Pauli phase folded in, plus the identity offset.
        """
        n = nbqbits if nbqbits is not None else self.nbqbits
        xs, zys, coeffs = [], [], []
        const = self.constant_coeff
        for (x, z) in sorted(self._terms):
            c = self._terms[(x, z)]
            if abs(c) <= DEFAULT_TOL:
                continue
            # We store P = c * X^x Z^z.  Acting on |i> (i indexes amplitudes
            # with qubit 0 as MSB): X^x Z^z |i> = (-1)^{popcount(i & z)} |i^x>.
            # No extra phase is needed because Y's are already folded into c.
            xs.append(_reverse_mask(x, n))
            zys.append(_reverse_mask(z, n))
            coeffs.append(c)
        return {
            "n": n,
            "x": np.asarray(xs, dtype=np.int64),
            "zy": np.asarray(zys, dtype=np.int64),
            "coeff": np.asarray(coeffs, dtype=np.complex128),
            "const": complex(const),
        }

    # --------------------------------------------------------------- matrices
    def to_matrix(self, nbqbits: int | None = None) -> np.ndarray:
        """Dense matrix (qubit 0 = most-significant index bit, matching the
        reference's kron order, molecule_factory.py:494-499). Test-scale only."""
        n = nbqbits if nbqbits is not None else self.nbqbits
        dim = 1 << n
        out = np.zeros((dim, dim), dtype=np.complex128)
        idx = np.arange(dim)
        if self.constant_coeff != 0:
            out[idx, idx] += self.constant_coeff
        for (x, z), c in self._terms.items():
            xr = _reverse_mask(x, n)
            zr = _reverse_mask(z, n)
            cols = idx
            rows = idx ^ xr
            signs = 1.0 - 2.0 * (_popcount_array(idx & zr) % 2)
            out[rows, cols] += c * signs
        return out

    def __repr__(self) -> str:
        parts = []
        if self.constant_coeff != 0:
            parts.append(f"{self.constant_coeff:+.6g}*I")
        for c, op, qb in self.terms[:8]:
            parts.append(f"{c:+.6g}*{op}{qb}")
        if len(self._terms) > 8:
            parts.append(f"... ({len(self._terms)} terms)")
        return f"PauliSum({self.nbqbits}q: " + " ".join(parts) + ")"


def _reverse_mask(mask: int, n: int) -> int:
    """Map a qubit-indexed bitmask (bit q = qubit q) to a state-index bitmask
    (qubit 0 = MSB of the 2^n amplitude index)."""
    out = 0
    for q in range(n):
        if mask & (1 << q):
            out |= 1 << (n - 1 - q)
    return out


def _popcount_array(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64)
    out = np.zeros_like(v)
    while np.any(v):
        out += v & 1
        v >>= 1
    return out
