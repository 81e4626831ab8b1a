"""Ansatz-aware Z2 tapering: the same VQE problem, 2 qubits smaller, exactly.

``taper_vqe_problem`` (ops/tapering.py) removes every Z2 symmetry that the
ansatz respects — the joint GF(2) nullspace of the Hamiltonian and ansatz
x-masks, which for UCC families is the alpha- and beta-parity pair — from
the Hamiltonian, every generator, and the HF reference at once.  The
variational manifold is unchanged: theta=0 reproduces the HF energy and
the optimum matches the untapered run, at a quarter of the statevector.

No reference analog: the reference has no tapering (its battery app tapers
Hamiltonians only, through the external symmer package).  At scale this is
what turns a 30-qubit system into full 28-qubit iterations on one chip
(BENCHMARKS.md).
"""
import os

SMOKE = os.environ.get("OVQE_SMOKE") == "1"  # CI smoke mode

from openvqe_tpu.vqe import VQE

algo = VQE.algorithm("fermionic_adapt", "H4", "spin_complement_gsd", "JW",
                     False, {"max_external_iterations": 2 if SMOKE else 8,
                             "taper": True})
iterations, result = algo.execute()
print("\ntapered |E - FCI| per iteration:",
      [f"{e:.2e}" for e in iterations["energies_substracted_from_FCI"]])
