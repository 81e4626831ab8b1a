"""QUCCSD on H4 in the NOON-selected active space
(reference notebooks/demo_quccsd_active_space.ipynb)."""
from openvqe_tpu.vqe import VQE

algo = VQE.algorithm("quccsd", "H4", "QUCCSD", "JW", True)
iterations, result = algo.execute()
print("\nE1-FCI:", result["energies1_substracted_from_FCI"])
