"""Golden pool-size tests (the reference's integration-test assertions,
tests/test_main_*.py — SURVEY.md §4) plus operator-level sanity checks."""

import numpy as np
import pytest

from openvqe_tpu.models.molecule_factory import MoleculeFactory, MoleculeFactorySparse
from openvqe_tpu.ops.transforms import transform_operator


@pytest.fixture(scope="module")
def factory():
    return MoleculeFactory()


@pytest.mark.parametrize("molecule,generator,active,golden", [
    ("H2", "sUPCCGSD", False, 36),    # test_main_ucc.py:15-17
    ("H4", "sUPCCGSD", True, 18),     # test_main_ucc_active_space.py:15-17
    ("H4", "QUCCSD", False, 26),      # test_main_quccsd.py:15
    ("H4", "QUCCSD", True, 8),        # test_main_quccsd_active_space.py:15
    ("H4", "spin_complement_gsd", False, 175),  # test_main_fermionic_adapt.py:11
    ("H4", "spin_complement_gsd", True, 69),    # test_main_fermionic_adapt.py:15
    ("H2", "singlet_gsd", False, 70),           # test_main_qubit_adapt.py:9-14
])
def test_golden_pool_sizes(factory, molecule, generator, active, golden):
    out = factory.generate_cluster_ops(molecule, generator, "JW", active=active)
    assert out[0] == golden


def test_cluster_ops_anti_hermitian(factory):
    """Every nonzero generator op transforms to an anti-Hermitian PauliSum
    (so x1j is Hermitian — the evolution-generator convention, ucc.py:31)."""
    _, ops, sps = factory.generate_cluster_ops("H4", "singlet_gsd", "JW")
    checked = 0
    for sp in sps:
        if sp.is_empty():
            continue
        m = sp.to_matrix()
        assert np.allclose(m, -m.conj().T, atol=1e-10)
        checked += 1
    assert checked > 10


def test_sparse_factory_table_deltas():
    f = MoleculeFactorySparse()
    assert f.sparse() is True
    r, geom, charge, spin, basis = f.get_parameters("H6")
    assert r == 1.5  # sparse variant delta (molecule_factory_with_sparse.py)
    r, geom, charge, spin, basis = f.get_parameters("HD+")
    assert charge == 1


def test_hf_init_and_reference_ket(factory):
    md = factory.get_molecular_data("H4")
    (ham, ham_sp, n_elec, noons_full, orb_energies_full, info
     ) = factory.generate_hamiltonian("H4", active=False, transform="JW",
                                      display=False)
    hf_init = factory.find_hf_init(ham, n_elec, noons_full, orb_energies_full)
    assert hf_init == 0b11110000  # 4 electrons in 8 spin-orbitals, q0 = MSB
    vec, hf_sp = factory.get_reference_ket(hf_init, 8, "JW")
    assert hf_sp == hf_init
    assert vec[hf_init] == 1.0 and np.count_nonzero(vec) == 1


def test_hamiltonian_hf_energy(factory):
    """<HF|H_spin|HF> must equal the SCF energy — validates the whole
    integrals -> spin-orbital -> JW pipeline."""
    (ham, ham_sp, n_elec, noons_full, orb_energies_full, info
     ) = factory.generate_hamiltonian("H4", active=False, transform="JW",
                                      display=False)
    hf_init = factory.find_hf_init(ham, n_elec, noons_full, orb_energies_full)
    vec, _ = factory.get_reference_ket(hf_init, ham.nbqbits, "JW")
    m = ham_sp.to_matrix()
    e = np.real(vec.conj() @ (m @ vec))
    assert np.isclose(e, info["HF"], atol=1e-9)


def test_active_space_hamiltonian_fci_consistency(factory):
    """Ground state of the active-space Hamiltonian must be close to (and
    above) the full FCI energy, and below HF."""
    (ham_a, ham_sp_a, nb_els, active_noons, active_eps, info
     ) = factory.generate_hamiltonian("H4", active=True, transform="JW",
                                      display=False)
    # qat semantics (validated against the reference notebooks,
    # tests/test_active_space.py): natural orbital 0 frozen, {1,2,3} active
    assert ham_a.nbqbits == 6 and nb_els == 2
    m = ham_sp_a.to_matrix()
    # ground state within the 2-active-electron sector
    idx = [j for j in range(1 << 6) if bin(j).count("1") == nb_els]
    e0 = float(np.linalg.eigvalsh(m[np.ix_(idx, idx)])[0])
    assert info["FCI"] - 1e-9 < e0 < info["HF"]
    # frozen-core 3-orbital active space recovers most of the correlation
    # energy for H4 (reference active VQE minimum -2.14996 vs FCI -2.17831)
    assert e0 - info["FCI"] < 0.05
