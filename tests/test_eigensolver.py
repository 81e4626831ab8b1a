"""Device-resident Lanczos vs dense diagonalization."""

import jax.numpy as jnp
import numpy as np

from openvqe_tpu.chem.frontend import compute_molecule
from openvqe_tpu.ops.hamiltonian import (
    ElectronicStructureHamiltonian,
    convert_to_h_integrals,
)
from openvqe_tpu.sim import eigensolver, statevector as sv
from openvqe_tpu.sim.objective import VQEObjective


def test_lanczos_ground_state_matches_dense():
    md = compute_molecule([("H", (0, 0, 0.85 * k)) for k in range(4)],
                          "sto-3g")
    hpq, hpqrs = convert_to_h_integrals(md.one_body_integrals,
                                        md.two_body_integrals)
    hsp = ElectronicStructureHamiltonian(
        hpq, hpqrs, md.nuclear_repulsion).to_spin("JW")
    obj = VQEObjective(hsp)

    e0, ground = eigensolver.ground_state(obj.ham_apply, hsp.nbqbits)

    dense = hsp.to_matrix()
    w, v = np.linalg.eigh(dense)
    assert abs(e0 - float(w[0])) < 1e-8
    # the Ritz vector spans the right state: unit fidelity with the dense one
    dense_planes = jnp.asarray(sv.complex_to_planes(v[:, 0]))
    fid = float(eigensolver.fidelity(ground, dense_planes))
    assert fid > 1.0 - 1e-8


def test_fidelity_invariant_under_global_phase():
    rng = np.random.default_rng(0)
    v = rng.normal(size=32) + 1j * rng.normal(size=32)
    v /= np.linalg.norm(v)
    a = jnp.asarray(sv.complex_to_planes(v))
    b = jnp.asarray(sv.complex_to_planes(v * np.exp(1j * 1.234)))
    assert abs(float(eigensolver.fidelity(a, b)) - 1.0) < 1e-10
    c = jnp.asarray(sv.complex_to_planes(
        (rng.normal(size=32) + 1j * rng.normal(size=32))))
    assert float(eigensolver.fidelity(a, c)) < 1.0
