"""Sharded-statevector tests on the virtual 8-device CPU mesh: sharded
results must match the single-device engine bit-for-bit (up to dtype)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvqe_tpu.chem.frontend import compute_molecule
from openvqe_tpu.ops.hamiltonian import ElectronicStructureHamiltonian, convert_to_h_integrals
from openvqe_tpu.ops.transforms import transform_operator
from openvqe_tpu.ops.uccsd import get_cluster_ops_and_init_guess
from openvqe_tpu.parallel import sharded as sh
from openvqe_tpu.sim import statevector as sv
from openvqe_tpu.sim.compile import compile_op_sequence, compile_pauli_sum


@pytest.fixture(scope="module")
def h4_problem():
    md = compute_molecule([("H", (0, 0, 0.85 * k)) for k in range(4)], "sto-3g")
    hpq, hpqrs = convert_to_h_integrals(md.one_body_integrals, md.two_body_integrals)
    ham = ElectronicStructureHamiltonian(hpq, hpqrs, md.nuclear_repulsion)
    hsp = ham.to_spin("JW")
    eps_full = [e for e in md.orbital_energies for _ in range(2)]
    cluster_ops, theta0, hf_init = get_cluster_ops_and_init_guess(
        md.n_elec, [0] * 8, eps_full, hpqrs)
    gens = [transform_operator(op, "JW") * 1j for op in cluster_ops]
    # keep the sharded-ansatz compile small: the rotation sequence is
    # unrolled inside shard_map (static ppermute schedule per term), so the
    # test uses a subset of the UCCSD pool — 4 singles + 4 doubles (doubles
    # carry the nonzero HF gradients; the full pool is exercised by the
    # single-device engine tests)
    return hsp, gens[:4] + gens[-4:], hf_init, md


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_ham_apply_matches_single(h4_problem):
    hsp, gens, hf_init, md = h4_problem
    mesh = sh.make_mesh(8)
    ham_apply, energy = sh.build_sharded_ham_fns(hsp, mesh)
    rng = np.random.default_rng(0)
    psi = rng.normal(size=1 << 8) + 1j * rng.normal(size=1 << 8)
    psi /= np.linalg.norm(psi)
    planes = jnp.asarray(sv.complex_to_planes(psi))
    out_sharded = sv.to_host(ham_apply(planes))
    c = compile_pauli_sum(hsp, 8)
    out_single = sv.to_host(sv.ham_apply(planes, *sv.as_device(c)))
    assert np.allclose(out_sharded, out_single, atol=1e-10)
    e_sharded = float(energy(planes))
    e_single = float(sv.expectation(planes, *sv.as_device(c)))
    assert np.isclose(e_sharded, e_single, atol=1e-10)


@pytest.fixture(scope="module")
def sharded_fns(h4_problem):
    """One sharded build shared by the gradient-match and VQE-step tests —
    the shard_map compile dominates this file's runtime."""
    hsp, gens, hf_init, md = h4_problem
    mesh = sh.make_mesh(8)
    return sh.build_sharded_energy_fn(hsp, gens, hf_init, mesh)


def test_sharded_energy_and_adjoint_grad_match_single(h4_problem, sharded_fns):
    hsp, gens, hf_init, md = h4_problem
    energy, energy_and_grad, forward = sharded_fns

    seq = compile_op_sequence(gens, 8)
    ham = compile_pauli_sum(hsp, 8)
    energy1, _ = sv.build_energy_fn(sv.hf_state(8, hf_init), seq, ham)
    g1 = jax.jit(jax.grad(energy1))

    theta = jnp.asarray(np.random.default_rng(1).normal(size=len(gens)) * 0.05)
    e_sh = float(energy(theta))
    e_1 = float(energy1(theta))
    assert np.isclose(e_sh, e_1, atol=1e-10)

    e_sh2, g_sh = energy_and_grad(theta)
    assert np.isclose(float(e_sh2), e_1, atol=1e-10)
    assert np.allclose(np.asarray(g_sh), np.asarray(g1(theta)), atol=1e-8)


def test_sharded_vqe_step_descends(h4_problem, sharded_fns):
    """SGD steps built from the shared sharded energy_and_grad (equivalent to
    sharded_vqe_step without paying a second shard_map compile)."""
    hsp, gens, hf_init, md = h4_problem
    _, energy_and_grad, _ = sharded_fns
    theta = jnp.zeros(len(gens))
    energies = []
    for _ in range(8):
        e, g = energy_and_grad(theta)
        energies.append(float(e))
        theta = theta - 0.1 * g
    assert np.isclose(energies[0], md.info["HF"], atol=1e-9)
    assert energies[-1] < energies[0] - 1e-3  # descending toward FCI


def test_sharded_hf_state_layout():
    mesh = sh.make_mesh(8)
    psi = sh.sharded_hf_state(8, 0b11110000, mesh)
    host = sv.to_host(psi)
    assert host[0b11110000] == 1.0 and np.count_nonzero(host) == 1
