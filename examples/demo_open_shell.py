"""Open-shell VQE: the neutral H3 doublet (3 electrons, S=1/2) through the
ROHF + open-shell-UCCSD path.  The reference's molecule table is all
closed-shell, but its chemistry entry point accepts a spin argument
(molecule_factory.py:306-320) — this framework implements it natively
(ROHF with DIIS; sector-resolved determinant FCI; occupied-list UCCSD)."""
import numpy as np
from scipy.optimize import minimize

from openvqe_tpu.chem.frontend import compute_molecule
from openvqe_tpu.ops.hamiltonian import (ElectronicStructureHamiltonian,
                                         convert_to_h_integrals)
from openvqe_tpu.ops.transforms import transform_operator
from openvqe_tpu.ops.uccsd import get_cluster_ops_and_init_guess
from openvqe_tpu.sim.objective import VQEObjective

md = compute_molecule([("H", (0, 0, 1.0 * k)) for k in range(3)],
                      "sto-3g", spin=1)
print(f"ROHF = {md.info['HF']:.8f} Ha   FCI = {md.info['FCI']:.8f} Ha "
      f"(n_alpha={md.info['n_alpha']}, n_beta={md.info['n_beta']})")

hpq, hpqrs = convert_to_h_integrals(md.one_body_integrals,
                                    md.two_body_integrals)
hsp = ElectronicStructureHamiltonian(hpq, hpqrs,
                                     md.nuclear_repulsion).to_spin("JW")
eps = [e for e in md.orbital_energies for _ in range(2)]
ops, theta0, hf_init = get_cluster_ops_and_init_guess(
    md.n_elec, [0] * hsp.nbqbits, eps, hpqrs, n_alpha=md.info["n_alpha"])
gens = [transform_operator(op, "JW") * 1j for op in ops]

bound = VQEObjective(hsp).bind(gens, hf_init)
fun, jac = bound.scipy_fun_jac()
res = minimize(fun, np.zeros(len(gens)), jac=jac, method="BFGS",
               options={"maxiter": 200})
print(f"UCCSD-VQE = {res.fun:.8f} Ha   error vs FCI = "
      f"{res.fun - md.info['FCI']:.2e} Ha")
assert res.fun - md.info["FCI"] < 1e-5
