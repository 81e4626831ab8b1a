"""k-UpCCGSD on H4 in the active space
(reference notebooks/demo_puccgsd_active_space.ipynb)."""
from openvqe_tpu.vqe import VQE

algo = VQE.algorithm("ucc", "H4", "sUPCCGSD", "JW", True)
iterations, result = algo.execute()
print("\nE1-FCI:", result["energies1_substracted_from_FCI"])
