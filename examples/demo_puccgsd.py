"""k-UpCCGSD (pUCCGSD) on H2/6-31G (reference notebooks/demo_puccgsd.ipynb):
fermionic-evolution ansatz vs reduced qubit pool."""
from openvqe_tpu.vqe import VQE

algo = VQE.algorithm("ucc", "H2", "sUPCCGSD", "JW", False)
iterations, result = algo.execute()
print("\nE1-FCI:", result["energies1_substracted_from_FCI"],
      " E2-FCI:", result["energies2_substracted_from_FCI"])
algo.plot_energy_result(save_path="puccgsd_energy.png")
algo.plot_error_result(save_path="puccgsd_error.png")
