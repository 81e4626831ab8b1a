"""Fermionic ADAPT-VQE on H4 (reference notebooks/demo_fermionic_adapt.ipynb).

Grows the ansatz operator-by-operator from the spin-complemented GSD pool,
tracking energy, gradient norm, fidelity and gate counts per iteration.
"""
import os

SMOKE = os.environ.get("OVQE_SMOKE") == "1"  # CI smoke mode

from openvqe_tpu.vqe import VQE

algo = VQE.algorithm("fermionic_adapt", "H4", "spin_complement_gsd", "JW",
                     False, {"max_external_iterations": 3 if SMOKE else 12})
iterations, result = algo.execute()
print("\n|E - FCI| per iteration:",
      [f"{e:.2e}" for e in iterations["energies_substracted_from_FCI"]])
