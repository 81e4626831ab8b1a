"""Open-shell (ROHF) chemistry and VQE — extends the reference's
``perform_pyscf_computation(geometry, basis, spin, charge)`` surface
(molecule_factory.py:306-320) beyond its all-closed-shell molecule table.

Oracles: the H atom pin is exact-in-basis literature (STO-3G HF = FCI =
-0.46658185 Ha, Szabo & Ostlund Table 3.3-grade data); everything else is
cross-checked against dense diagonalization of the JW Hamiltonian and the
engine's own determinant expectation.
"""

import numpy as np
import pytest
from scipy.optimize import minimize

from openvqe_tpu.chem.frontend import compute_molecule
from openvqe_tpu.ops.hamiltonian import (
    ElectronicStructureHamiltonian,
    convert_to_h_integrals,
)
from openvqe_tpu.ops.transforms import transform_operator
from openvqe_tpu.ops.uccsd import get_cluster_ops_and_init_guess
from openvqe_tpu.sim.objective import VQEObjective


@pytest.fixture(scope="module")
def h3():
    """Neutral H3 chain — a doublet (3 electrons, spin = 1)."""
    md = compute_molecule([("H", (0, 0, 1.0 * k)) for k in range(3)],
                          "sto-3g", spin=1)
    return md


def test_h_atom_literature_pin():
    md = compute_molecule([("H", (0, 0, 0.0))], "sto-3g", spin=1)
    # 1 electron: HF == FCI == exact in basis
    assert abs(md.info["HF"] - (-0.46658185)) < 1e-6
    assert abs(md.info["FCI"] - md.info["HF"]) < 1e-9


def test_h3_rohf_vs_fci(h3):
    assert h3.info["converged"]
    assert h3.info["n_alpha"] == 2 and h3.info["n_beta"] == 1
    # variational ordering with a real correlation gap
    assert 1e-4 < h3.info["HF"] - h3.info["FCI"] < 0.2


def test_h3_fci_is_global_ground_state(h3):
    """The doublet FCI energy equals the dense ground state of the full JW
    Hamiltonian (H3's ground sector IS the doublet)."""
    hpq, hpqrs = convert_to_h_integrals(h3.one_body_integrals,
                                        h3.two_body_integrals)
    hsp = ElectronicStructureHamiltonian(
        hpq, hpqrs, h3.nuclear_repulsion).to_spin("JW")
    w = np.linalg.eigvalsh(hsp.to_matrix())
    assert abs(w[0] - h3.info["FCI"]) < 1e-8


def test_h3_hf_determinant_energy(h3):
    """<ROHF determinant|H|ROHF determinant> through the engine equals the
    ROHF energy — integrals, JW transform, and SCF agree end to end."""
    hpq, hpqrs = convert_to_h_integrals(h3.one_body_integrals,
                                        h3.two_body_integrals)
    hsp = ElectronicStructureHamiltonian(
        hpq, hpqrs, h3.nuclear_repulsion).to_spin("JW")
    eps = [e for e in h3.orbital_energies for _ in range(2)]
    ops, theta0, hf_init = get_cluster_ops_and_init_guess(
        h3.n_elec, [0] * hsp.nbqbits, eps, hpqrs,
        n_alpha=h3.info["n_alpha"])
    gens = [transform_operator(op, "JW") * 1j for op in ops]
    obj = VQEObjective(hsp)
    bound = obj.bind(gens, hf_init)
    e_det = bound.energy(np.zeros(len(gens)))
    assert abs(e_det - h3.info["HF"]) < 1e-8


def test_h3_open_shell_uccsd_vqe(h3):
    """Open-shell UCCSD VQE from the ROHF determinant reaches FCI."""
    hpq, hpqrs = convert_to_h_integrals(h3.one_body_integrals,
                                        h3.two_body_integrals)
    hsp = ElectronicStructureHamiltonian(
        hpq, hpqrs, h3.nuclear_repulsion).to_spin("JW")
    eps = [e for e in h3.orbital_energies for _ in range(2)]
    ops, theta0, hf_init = get_cluster_ops_and_init_guess(
        h3.n_elec, [0] * hsp.nbqbits, eps, hpqrs,
        n_alpha=h3.info["n_alpha"])
    gens = [transform_operator(op, "JW") * 1j for op in ops]
    bound = VQEObjective(hsp).bind(gens, hf_init)
    fun, jac = bound.scipy_fun_jac()
    res = minimize(fun, np.zeros(len(gens)), jac=jac, method="BFGS",
                   options={"maxiter": 200})
    assert res.fun - h3.info["FCI"] < 1e-5


def test_h4_triplet_sector():
    """spin=2 (even electron count): the determinant and UCCSD pool must
    live in the (3, 1) sector — previously the closed-shell default
    silently produced an Sz=0 determinant."""
    from openvqe_tpu.ops.uccsd import occupied_spin_orbitals

    assert occupied_spin_orbitals(4, 3) == [0, 1, 2, 4]
    with pytest.raises(ValueError):
        occupied_spin_orbitals(3)            # odd without n_alpha
    with pytest.raises(ValueError):
        occupied_spin_orbitals(3, 5)         # inconsistent counts

    md = compute_molecule([("H", (0, 0, 1.0 * k)) for k in range(4)],
                          "sto-3g", spin=2)
    assert md.info["n_alpha"] == 3 and md.info["n_beta"] == 1
    hpq, hpqrs = convert_to_h_integrals(md.one_body_integrals,
                                        md.two_body_integrals)
    hsp = ElectronicStructureHamiltonian(
        hpq, hpqrs, md.nuclear_repulsion).to_spin("JW")
    eps = [e for e in md.orbital_energies for _ in range(2)]
    ops, theta0, hf_init = get_cluster_ops_and_init_guess(
        md.n_elec, [0] * hsp.nbqbits, eps, hpqrs,
        n_alpha=md.info["n_alpha"])
    gens = [transform_operator(op, "JW") * 1j for op in ops]
    bound = VQEObjective(hsp).bind(gens, hf_init)
    # the determinant energy must equal ROHF (triplet sector), and the
    # spin-conserving VQE must reach the sector FCI
    assert abs(bound.energy(np.zeros(len(gens))) - md.info["HF"]) < 1e-8
    fun, jac = bound.scipy_fun_jac()
    res = minimize(fun, np.zeros(len(gens)), jac=jac, method="BFGS",
                   options={"maxiter": 300})
    assert res.fun - md.info["FCI"] < 1e-5


def test_li_atom_rohf():
    md = compute_molecule([("Li", (0, 0, 0.0))], "sto-3g", spin=1)
    assert md.info["converged"]
    assert md.info["n_alpha"] == 2 and md.info["n_beta"] == 1
    # STO-3G Li: ROHF near -7.3 Ha with a small (frozen-core-dominated)
    # correlation gap; FCI must sit below HF
    assert -7.5 < md.info["HF"] < -7.2
    assert 0 < md.info["HF"] - md.info["FCI"] < 0.1
