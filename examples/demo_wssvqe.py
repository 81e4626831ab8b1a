"""Weighted subspace-search VQE on the random transverse-field Ising model
(reference notebooks/demo_WSSVQE.ipynb): ground + first excited state."""
from openvqe_tpu.algorithms.wssvqe import WSSVQE

out = WSSVQE(model="ising", nqbits=4, n_states=2, depth=3).execute()
print("final energies:", out["final_energies"])
print("exact lowest:  ", list(out["exact_eigenvalues"][:2]))
print("fidelities:    ",
      [out["fidelity_lists"][f"fidelity_circ_{i}"][-1] for i in range(2)])
