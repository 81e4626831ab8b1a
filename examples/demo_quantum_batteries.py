"""Quantum-battery application: CS-VQE / CS-ADAPT / Rotoselect on the
Li2FeSiO4 contextual-subspace Hamiltonians (reference
applications/quantum_batteries)."""
import os

SMOKE = os.environ.get("OVQE_SMOKE") == "1"  # CI smoke mode

from openvqe_tpu.apps.quantum_batteries.adapt import run_cs_adapt
from openvqe_tpu.apps.quantum_batteries.cs_vqe import run_cs_vqe
from openvqe_tpu.apps.quantum_batteries.rotoselect import run_rotoselect

print("== CS-ADAPT (fused, one device call per experiment) ==")
run_cs_adapt(num_iterations=1 if SMOKE else 5, qubit_counts=(7, 8),
             optimizer="lbfgs-fused")
print("\n== CS-VQE (4-layer HEA) ==")
run_cs_vqe(layers=(4,), num_iterations=1 if SMOKE else 3,
           qubit_counts=(2, 4, 6))
print("\n== Rotoselect ==")
run_rotoselect(num_iterations=1 if SMOKE else 2,
               n_steps=5 if SMOKE else 20, qubit_counts=(2, 4))
