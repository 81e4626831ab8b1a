"""Qubit ADAPT-VQE on H2/6-31G with a random parity pool
(reference notebooks/demo_qubit_adapt.ipynb)."""
import os

SMOKE = os.environ.get("OVQE_SMOKE") == "1"  # CI smoke mode

from openvqe_tpu.vqe import VQE

algo = VQE.algorithm("qubit_adapt", "H2", "singlet_gsd", "JW", False,
                     {"max_external_iterations": 3 if SMOKE else 10, "pool_seed": 1})
iterations, result = algo.execute()
print("\n|E - FCI| per iteration:",
      [f"{e:.2e}" for e in iterations["energies_substracted_from_fci"]])
