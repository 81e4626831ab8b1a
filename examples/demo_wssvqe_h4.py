"""WSSVQE on the H4 molecular Hamiltonian (reference
notebooks/'demo_WSSVQE H4.ipynb' — which actually runs H2/H4 molecule
models through the same machinery)."""
from openvqe_tpu.algorithms.wssvqe import WSSVQE

out = WSSVQE(model="H2", n_states=2, depth=4).execute()
print("final energies:", out["final_energies"])
print("exact lowest:  ", list(out["exact_eigenvalues"][:2]))
