"""End-to-end VQE under Bravyi-Kitaev and parity encodings: all three
transforms must reach the same FCI energy (the reference wires BK/parity
through molecule_factory.py:348-356 but never tests them)."""

import numpy as np
import pytest
from scipy.optimize import minimize

from openvqe_tpu.models.molecule_factory import MoleculeFactory
from openvqe_tpu.ops.transforms import transform_operator
from openvqe_tpu.sim.objective import VQEObjective


@pytest.mark.parametrize("transform", ["JW", "Bravyi-Kitaev", "parity_basis"])
def test_h2_uccsd_reaches_fci_in_all_encodings(transform):
    f = MoleculeFactory()
    # H2 in STO-3G via direct chemistry (4 qubits; the table's H2 is 6-31G)
    from openvqe_tpu.chem.frontend import compute_molecule
    from openvqe_tpu.ops.hamiltonian import (ElectronicStructureHamiltonian,
                                             convert_to_h_integrals)
    from openvqe_tpu.ops.uccsd import get_cluster_ops_and_init_guess

    md = compute_molecule([("H", (0, 0, 0)), ("H", (0, 0, 0.7414))], "sto-3g")
    hpq, hpqrs = convert_to_h_integrals(md.one_body_integrals,
                                        md.two_body_integrals)
    ham = ElectronicStructureHamiltonian(hpq, hpqrs, md.nuclear_repulsion)
    n = ham.nbqbits
    kind = {"JW": "JW", "Bravyi-Kitaev": "BK", "parity_basis": "parity"}[transform]
    hsp = ham.to_spin(kind)

    eps_full = [e for e in md.orbital_energies for _ in range(2)]
    cluster_ops, theta0, hf_init = get_cluster_ops_and_init_guess(
        md.n_elec, [0] * n, eps_full, hpqrs)
    gens = [transform_operator(op, kind) * 1j for op in cluster_ops]

    vec, hf_init_sp = f.get_reference_ket(hf_init, n, transform)
    bound = VQEObjective(hsp, n).bind(gens, hf_init_sp)

    # HF expectation must match SCF in every encoding
    assert np.isclose(bound.energy(np.zeros(len(gens))), md.info["HF"],
                      atol=1e-9)

    fun, jac = bound.scipy_fun_jac()
    res = minimize(fun, np.asarray(theta0), jac=jac, method="BFGS", tol=1e-12)
    assert abs(res.fun - md.info["FCI"]) < 1e-7
