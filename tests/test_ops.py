"""Unit tests of the operator algebra layer: Pauli algebra, fermionic normal
ordering, and the JW/BK/parity transforms.  The reference has no such unit
tests (SURVEY.md §4); correctness is established against directly-constructed
dense fermionic matrices."""

import numpy as np
import pytest

from openvqe_tpu.ops.fermion import FermionOperator, FermionTerm, order_fermionic_term
from openvqe_tpu.ops.pauli import PauliSum
from openvqe_tpu.ops.transforms import (
    get_code,
    recode_integer,
    transform_operator,
)


# ---------------------------------------------------------------- helpers
def dense_ladder(n: int, mode: int, creation: bool) -> np.ndarray:
    """Direct Fock-space matrix of a_mode / a†_mode with mode 0 as the
    most-significant index bit and JW sign (-1)^{sum_{k<mode} n_k}."""
    dim = 1 << n
    out = np.zeros((dim, dim))
    for i in range(dim):
        bit = 1 << (n - 1 - mode)
        occupied = bool(i & bit)
        if creation and not occupied:
            j = i | bit
        elif not creation and occupied:
            j = i & ~bit
        else:
            continue
        parity = bin(i >> (n - mode)).count("1")  # modes 0..mode-1 are higher bits
        out[j, i] = (-1.0) ** parity
    return out


def dense_fermion(op: FermionOperator) -> np.ndarray:
    n = op.nbqbits
    dim = 1 << n
    out = np.eye(dim, dtype=complex) * op.constant_coeff
    for t in op.terms:
        m = np.eye(dim, dtype=complex)
        for ch, q in zip(t.ops, t.qbits):
            m = m @ dense_ladder(n, q, ch == "C")
        out += t.coeff * m
    return out


def recode_permutation(kind: str, n: int) -> np.ndarray:
    code = get_code(kind, n)
    dim = 1 << n
    P = np.zeros((dim, dim))
    for i in range(dim):
        P[recode_integer(i, code), i] = 1.0
    return P


# ---------------------------------------------------------------- Pauli IR
def test_pauli_products():
    n = 3
    X0 = PauliSum.from_term(n, 1.0, "X", [0])
    Y0 = PauliSum.from_term(n, 1.0, "Y", [0])
    Z0 = PauliSum.from_term(n, 1.0, "Z", [0])
    assert np.allclose((X0 * Y0).to_matrix(), (Z0 * 1j).to_matrix())
    assert np.allclose((Y0 * Z0).to_matrix(), (X0 * 1j).to_matrix())
    assert np.allclose((Z0 * X0).to_matrix(), (Y0 * 1j).to_matrix())
    assert np.allclose((X0 * X0).to_matrix(), np.eye(8))
    XY = PauliSum.from_term(n, 2.0, "XY", [0, 2])
    assert np.allclose(XY.to_matrix(), 2.0 * np.kron(np.kron(PX(), np.eye(2)), PY()))


def PX():
    return np.array([[0, 1], [1, 0]], dtype=complex)


def PY():
    return np.array([[0, -1j], [1j, 0]])


def test_pauli_dagger_and_hermiticity():
    n = 2
    H = (PauliSum.from_term(n, 0.5, "XY", [0, 1])
         + PauliSum.from_term(n, 0.5, "YX", [0, 1])
         + PauliSum.from_term(n, 1.5, "Z", [0]))
    assert H.is_hermitian()
    m = H.to_matrix()
    assert np.allclose(m, m.conj().T)
    A = PauliSum.from_term(n, 1j, "XX", [0, 1])
    assert np.allclose(A.dagger().to_matrix(), A.to_matrix().conj().T)


# ------------------------------------------------------------ normal order
def test_normal_ordering_preserves_matrix():
    n = 4
    cases = [
        FermionTerm(1.0, "cC", [1, 1]),
        FermionTerm(1.0, "cC", [2, 1]),
        FermionTerm(2.0, "CcCc", [2, 0, 3, 1]),
        FermionTerm(1.0, "CCcc", [3, 1, 0, 2]),
        FermionTerm(-0.5, "cCcC", [0, 1, 2, 3]),
        FermionTerm(1.0, "cCcC", [0, 0, 1, 1]),
    ]
    for t in cases:
        before = dense_fermion(FermionOperator(n, [t]))
        after = dense_fermion(FermionOperator(n, order_fermionic_term(t)))
        assert np.allclose(before, after), t


def test_normal_ordering_annihilates_duplicates():
    assert order_fermionic_term(FermionTerm(1.0, "CC", [2, 2])) == []
    assert order_fermionic_term(FermionTerm(1.0, "cc", [1, 1])) == []


# -------------------------------------------------------------- transforms
@pytest.mark.parametrize("kind", ["JW", "BK", "parity"])
def test_transform_matches_dense_fock(kind):
    """Transformed operator == direct Fock matrix conjugated by the encoder's
    basis relabeling permutation, for every encoding."""
    n = 4
    op = FermionOperator(n, [
        FermionTerm(0.7, "Cc", [0, 2]),
        FermionTerm(0.7, "Cc", [2, 0]),
        FermionTerm(1.1, "Cc", [3, 3]),
        FermionTerm(0.25, "CCcc", [0, 1, 2, 3]),
        FermionTerm(0.25, "CCcc", [3, 2, 1, 0]),
    ], constant_coeff=0.3)
    ps = transform_operator(op, kind)
    direct = dense_fermion(op)
    P = recode_permutation(kind, n)
    assert np.allclose(ps.to_matrix(), P @ direct @ P.T, atol=1e-12)


def test_jw_number_operator():
    n = 3
    op = FermionOperator(n, [FermionTerm(1.0, "Cc", [1, 1])])
    ps = transform_operator(op, "JW")
    expected = PauliSum.identity(n, 0.5) + PauliSum.from_term(n, -0.5, "Z", [1])
    assert np.allclose(ps.to_matrix(), expected.to_matrix())


@pytest.mark.parametrize("kind", ["JW", "BK", "parity"])
def test_transform_spectrum_invariant(kind):
    """All encodings of the same Hermitian fermionic operator are isospectral."""
    n = 4
    rng = np.random.default_rng(0)
    terms = []
    for p in range(n):
        for q in range(n):
            c = rng.normal()
            terms.append(FermionTerm(c, "Cc", [p, q]))
            if p != q:
                terms.append(FermionTerm(c, "Cc", [q, p]))
    op = FermionOperator(n, terms).merged()
    ev = np.linalg.eigvalsh(transform_operator(op, kind).to_matrix())
    ev_jw = np.linalg.eigvalsh(transform_operator(op, "JW").to_matrix())
    assert np.allclose(ev, ev_jw, atol=1e-10)


def test_recode_integer_jw_identity():
    code = get_code("JW", 8)
    assert recode_integer(0b11110000, code) == 0b11110000


def test_anti_hermitian_cluster_transform():
    """T - T† maps to an anti-Hermitian PauliSum; x1j gives Hermitian
    (the reference's x1j convention, algorithms/ucc.py:31)."""
    n = 4
    t = FermionTerm(1.0, "CCcc", [2, 3, 1, 0])
    op = FermionOperator(n, [t]) + FermionOperator(n, [t.dagger()]) * (-1.0)
    ps = transform_operator(op, "JW")
    m = ps.to_matrix()
    assert np.allclose(m, -m.conj().T, atol=1e-12)
    h = (ps * 1j).to_matrix()
    assert np.allclose(h, h.conj().T, atol=1e-12)
