"""UCC-family driver (reference ``openvqe/algorithms/ucc.py``): cluster ops ->
reduced_without_Z qubit pool -> two VQE runs (fermionic-evolution ansatz vs
qubit-pool ansatz)."""

from __future__ import annotations

from ..models.molecule_factory import MoleculeFactory
from ..ops.qubit_pools import QubitPool
from .algorithm import Algorithm
from .energy_ucc import EnergyUCC


class UCC(Algorithm):

    def generate_pool_from_cluster(self, cluster_ops, nbqbits):
        print(" --------------------------------------------------------------------------")
        print("                      Generate Pool from Cluster:")
        print(" --------------------------------------------------------------------------")
        qubit_pool = QubitPool()
        pool_condition = "reduced_without_Z"  # reference ucc.py:19
        return qubit_pool.generate_pool_from_cluster(pool_condition,
                                                     cluster_ops, nbqbits)

    def get_ansatz(self, cluster_ops_sp, returned_pool):
        """x1j on cluster-op images (reference ucc.py:31); pool ops are used
        as-is (already Hermitian with -1 coefficients)."""
        ansatz_ops = [op * 1j for op in cluster_ops_sp]
        ansatz_q_ops = list(returned_pool)
        return ansatz_ops, ansatz_q_ops

    def execute(self):
        self.opts = {"step": 0.01} | self.opts
        molecule_factory = MoleculeFactory()
        energy_ucc = EnergyUCC()

        self.presentation(molecule_factory)
        (hamiltonian, hamiltonian_sp, n_elec, noons_full, orb_energies_full,
         info) = self.generate_hamiltonian(molecule_factory)
        _, cluster_ops, cluster_ops_sp = self.generate_cluster_ops(molecule_factory)
        _, returned_pool = self.generate_pool_from_cluster(
            cluster_ops, hamiltonian_sp.nbqbits)
        hf_init = molecule_factory.find_hf_init(hamiltonian, n_elec,
                                                noons_full, orb_energies_full)
        _, hf_init_sp = molecule_factory.get_reference_ket(
            hf_init, hamiltonian_sp.nbqbits, self.transform)
        ansatz_ops, ansatz_q_ops = self.get_ansatz(cluster_ops_sp, returned_pool)
        theta_current = [self.opts["step"]] * len(returned_pool)

        self.info = info
        iterations, result = energy_ucc.get_energies(
            hamiltonian_sp, ansatz_ops, ansatz_q_ops, hf_init_sp,
            theta_current, theta_current, info["FCI"], mesh=self.build_mesh(),
            taper=bool(self.opts.get("taper", False)))
        print("iterations are:", iterations)
        print("results are:", result)
        self.iterations = iterations
        self.result = result
        return iterations, result
