"""MoleculeFactory: molecule -> Hamiltonian -> cluster-operator pools.

API-parity rebuild of reference ``common_files/molecule_factory.py`` (dense)
and ``molecule_factory_with_sparse.py`` (sparse variant) on the TPU-native
stack: chemistry from ``openvqe_tpu.chem`` (pyscf replacement), operators
from ``openvqe_tpu.ops``.  The "sparse" variant differs only in its molecule
table deltas and in returning operators ready for the ADAPT screening engine
— per-operator 2^n x 2^n CSR matrices (reference
molecule_factory_with_sparse.py:615-619) are deliberately *not* materialized;
the compiled-mask statevector engine applies them directly.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..chem.frontend import MolecularData, compute_molecule
from ..ops import generators
from ..ops.hamiltonian import (
    ElectronicStructureHamiltonian,
    convert_to_h_integrals,
    get_active_space_hamiltonian,
    transform_integrals_to_new_basis,
)
from ..ops.pauli import PauliSum
from ..ops.transforms import get_code, recode_integer
from ..ops.uccsd import get_cluster_ops_and_init_guess
from .molecules import get_molecule


@lru_cache(maxsize=32)
def _cached_molecule(symbol: str, variant: str) -> MolecularData:
    spec = get_molecule(symbol, variant)
    return compute_molecule(spec.geometry, spec.basis, spec.spin, spec.charge)


class MoleculeFactory:
    """Reference-parity factory (molecule_factory.py:34-578)."""

    variant = "dense"

    def sparse(self) -> bool:
        return False

    # ------------------------------------------------------------ chemistry
    def get_parameters(self, molecule_symbol: str):
        spec = get_molecule(molecule_symbol, self.variant)
        return spec.r, spec.geometry, spec.charge, spec.spin, spec.basis

    def get_molecular_data(self, molecule_symbol: str) -> MolecularData:
        return _cached_molecule(molecule_symbol, self.variant)

    # ---------------------------------------------------------- hamiltonian
    def generate_hamiltonian(self, molecule_symbol: str, active: bool = False,
                             transform: str = "JW", display: bool = True):
        """Returns (hamiltonian, hamiltonian_sp, n_elec, noons_full,
        orb_energies_full, info) — reference molecule_factory.py:306-434."""
        md = self.get_molecular_data(molecule_symbol)
        noons, basis_change = np.linalg.eigh(md.rdm1)
        noons = list(reversed(noons.tolist()))
        if display:
            print("Number of electrons = ", md.n_elec)
            print("Number of qubits before active space selection = ",
                  md.rdm1.shape[0] * 2)
            print("Orbital energies = ", md.orbital_energies)
            print("Nuclear repulsion = ", md.nuclear_repulsion)
            print("Noons = ", noons)

        if not active:
            hpq, hpqrs = convert_to_h_integrals(md.one_body_integrals,
                                                md.two_body_integrals)
            hamiltonian = ElectronicStructureHamiltonian(
                hpq, hpqrs, constant_coeff=md.nuclear_repulsion)
            noons_full, orb_energies_full = [], []
            for ind in range(len(noons)):
                noons_full.extend([noons[ind], noons[ind]])
                orb_energies_full.extend([md.orbital_energies[ind]] * 2)
            hamiltonian_sp = hamiltonian.to_spin(transform)
            return (hamiltonian, hamiltonian_sp, md.n_elec, noons_full,
                    orb_energies_full, md.info)

        # active-space path: rotate integrals to natural orbitals (descending
        # noons) and apply NOON thresholds (molecule_factory.py:366-434)
        basis_change = np.flip(basis_change, axis=1)
        one_body, two_body = transform_integrals_to_new_basis(
            md.one_body_integrals, md.two_body_integrals, basis_change)
        threshold_1 = 2.0 - noons[0]
        threshold_2 = 0.01 if len(noons) < 3 else noons[3]
        if display:
            print("threshold_1 chosen = ", threshold_1)
            print("threshold_2 chosen = ", threshold_2)
        hamiltonian_active, active_inds, occ_inds = get_active_space_hamiltonian(
            one_body, two_body, noons, md.n_elec, md.nuclear_repulsion,
            threshold_1=threshold_1, threshold_2=threshold_2)
        if display:
            print("Number of qubits after active space selection =",
                  hamiltonian_active.nbqbits)
        active_noons, active_orb_energies = [], []
        for ind in active_inds:
            active_noons.extend([noons[ind], noons[ind]])
            active_orb_energies.extend([md.orbital_energies[ind]] * 2)
        nb_active_els = md.n_elec - 2 * len(occ_inds)
        if display:
            print("length of active noons: ", len(active_noons))
            print("length of orbital energies: ", len(active_orb_energies))
        hamiltonian_active_sp = hamiltonian_active.to_spin(transform)
        return (hamiltonian_active, hamiltonian_active_sp, nb_active_els,
                active_noons, active_orb_energies, md.info)

    # --------------------------------------------------------------- uccsd
    def calculate_uccsd(self, molecule_symbol: str, transform: str, active: bool):
        (ham, ham_sp, n_elec, noons_full, orb_energies_full, info
         ) = self.generate_hamiltonian(molecule_symbol, active=active,
                                       transform=transform, display=False)
        _, _, _, spin, _ = self.get_parameters(molecule_symbol)
        return generators.uccsd(ham, n_elec, noons_full, orb_energies_full,
                                transform, n_alpha=(n_elec + spin) // 2)

    def find_hf_init(self, hamiltonian, n_elec, noons_full,
                     orb_energies_full, n_alpha=None) -> int:
        _, _, hf_init = get_cluster_ops_and_init_guess(
            n_elec, noons_full, orb_energies_full, hamiltonian.hpqrs,
            n_alpha=n_alpha)
        return hf_init

    def get_reference_ket(self, hf_init: int, nbqbits: int, transform: str):
        """(statevector ndarray, recoded integer) — reference
        molecule_factory.py:479-492 (returns CSR there; dense here, the
        engine consumes it directly)."""
        code = get_code(transform, nbqbits)
        hf_init_sp = recode_integer(hf_init, code)
        vec = np.zeros(1 << nbqbits, dtype=complex)
        vec[hf_init_sp] = 1.0
        return vec, hf_init_sp

    # --------------------------------------------------------- cluster ops
    def generate_cluster_ops(self, molecule_symbol: str, type_of_generator: str,
                             transform: str = "JW", active: bool = False):
        """Dispatch to a generator family (molecule_factory.py:501-578)."""
        md = self.get_molecular_data(molecule_symbol)
        orbital_number = len(md.orbital_energies)
        n_elec = md.n_elec
        if active:
            (_, _, nb_active_els, active_noons, _, _) = self.generate_hamiltonian(
                molecule_symbol, active=True, transform=transform, display=False)
            orbital_number = len(active_noons) // 2
            n_elec = nb_active_els

        if type_of_generator == "singlet_sd":
            return generators.singlet_sd(n_elec, orbital_number, transform)
        if type_of_generator == "singlet_gsd":
            return generators.singlet_gsd(n_elec, orbital_number, transform)
        if type_of_generator == "spin_complement_gsd":
            return generators.spin_complement_gsd(n_elec, orbital_number, transform)
        if type_of_generator == "spin_complement_gsd_twin":
            return generators.spin_complement_gsd_twin(n_elec, orbital_number,
                                                       transform)
        if type_of_generator == "sUPCCGSD":
            perm = 2  # reference hard-codes k=2 (molecule_factory.py:554)
            return generators.singlet_upccgsd(orbital_number, transform, perm)
        if type_of_generator == "uccgsd":
            return generators.uccgsd(n_elec, orbital_number, transform)
        if type_of_generator in ("QUCCSD", "UCCSD"):
            return self.calculate_uccsd(molecule_symbol, transform, active=active)
        raise ValueError(f"unknown generator {type_of_generator!r}")


class MoleculeFactorySparse(MoleculeFactory):
    """Sparse-variant factory (molecule_factory_with_sparse.py): same API,
    molecule-table deltas, and ADAPT-ready operators.  Never materializes
    2^n matrices — compiled Pauli masks replace the reference's CSR path."""

    variant = "sparse"

    def sparse(self) -> bool:
        return True
