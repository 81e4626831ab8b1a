"""QubitPool construction tests (all 14 pool types; reference
common_files/qubit_pool.py has no unit tests)."""

import numpy as np
import pytest

from openvqe_tpu.models.molecule_factory import MoleculeFactory
from openvqe_tpu.ops.qubit_pools import QubitPool


@pytest.fixture(scope="module")
def cluster_setup():
    f = MoleculeFactory()
    _, cluster_ops, cluster_ops_sp = f.generate_cluster_ops(
        "H2", "singlet_gsd", "JW", active=False)
    return cluster_ops, cluster_ops_sp


def test_from_cluster_pools(cluster_setup):
    cluster_ops, _ = cluster_setup
    qp = QubitPool()
    n_full, full = qp.generate_pool_from_cluster("full", cluster_ops, 8)
    n_noz, noz = qp.generate_pool_from_cluster("full_without_Z", cluster_ops, 8)
    n_red, red = qp.generate_pool_from_cluster("reduced_without_Z",
                                               cluster_ops, 8)
    assert n_full >= n_noz >= n_red > 0
    # every reduced op is a single Pauli string with coefficient -1, no Z
    for op in red:
        terms = op.terms
        assert len(terms) == 1
        coeff, letters, qubits = terms[0]
        assert "Z" not in letters
        assert np.isclose(coeff.real, -1.0)


def test_parity_pools_and_random_sizes():
    qp = QubitPool()
    sizes = set()
    for pt in ("YXXX", "XYXX", "XXYX", "XXXY"):
        n, pool = qp.generate_pool_without_cluster(pt, nbqbits=8)
        sizes.add(n)
        assert all(len(op) == 1 for op in pool)
    assert sizes == {50}  # golden from the qubit-ADAPT test path
    n_r, pool_r = qp.generate_pool_without_cluster("random", nbqbits=8, seed=3)
    assert n_r == 50


def test_two_four_eight_pools(cluster_setup):
    _, cluster_ops_sp = cluster_setup
    qp = QubitPool()
    n2, p2 = qp.generate_pool_without_cluster("two", nbqbits=8)
    assert n2 == 50 and all(len(op) in (1, 2) for op in p2)
    n4, p4 = qp.generate_pool_without_cluster("four", nbqbits=8)
    assert n4 > 50
    n8, p8 = qp.generate_pool_without_cluster("eight", nbqbits=8,
                                              qubit_pool=cluster_ops_sp)
    nz, pz = qp.generate_pool_without_cluster(
        "without_Z_from_generator", nbqbits=8, qubit_pool=cluster_ops_sp)
    assert 0 < n8 <= nz  # eight-pool dedups, without_Z keeps duplicates
    for op in p8:
        for coeff, letters, qubits in op.terms:
            assert "Z" not in letters


def test_minimal_and_symmetry_pools():
    qp = QubitPool()
    n_min, pool = qp.generate_pool_without_cluster("minimal", nbqbits=8)
    assert n_min == 2 * 8 - 2  # V pool size (qubit-ADAPT appendix C)
    for op in pool:
        coeff, letters, qubits = op.terms[0]
        assert letters.count("Y") == 1 and set(letters) <= {"Y", "Z"}
    n_sym, pool_sym = qp.generate_pool_without_cluster(
        "pure_with_symmetry", molecule_symbol="H4")
    assert n_sym == 11


def test_qubit_excitations():
    qp = QubitPool()
    n, pool = qp.generate_pool_without_cluster("qubit_excitations", nbqbits=6)
    # C(6,2) singles + C(6,4) doubles
    assert n == 15 + 15
    for op in pool:
        m = op.to_matrix()
        # real Pauli combinations: Hermitian generators (reference
        # qubit_pool.py:1122-1147 uses real +-1/2 and +-1/8 coefficients)
        assert np.allclose(m, m.conj().T, atol=1e-12)
