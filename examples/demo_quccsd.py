"""QUCCSD on H4 (reference notebooks/demo_quccsd.ipynb): Yordanov
hardware-efficient evolutions, MP2 vs fixed initial parameters."""
from openvqe_tpu.vqe import VQE

algo = VQE.algorithm("quccsd", "H4", "QUCCSD", "JW", False)
iterations, result = algo.execute()
print("\nE1-FCI:", result["energies1_substracted_from_FCI"],
      " E2-FCI:", result["energies2_substracted_from_FCI"],
      " CNOTs:", result["CNOT1"])
