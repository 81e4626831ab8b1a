"""Statevector engine tests: Pauli apply / rotations / expectation vs dense
matrices, adjoint gradients vs finite differences, and an end-to-end UCCSD
VQE on H2 reaching FCI (the reference's correctness oracle, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import minimize

from openvqe_tpu.chem.frontend import compute_molecule
from openvqe_tpu.ops.hamiltonian import ElectronicStructureHamiltonian, convert_to_h_integrals
from openvqe_tpu.ops.pauli import PauliSum
from openvqe_tpu.ops.transforms import transform_operator
from openvqe_tpu.ops.uccsd import get_cluster_ops_and_init_guess
from openvqe_tpu.sim import statevector as sv
from openvqe_tpu.sim.compile import compile_op_sequence, compile_pauli_sum


def random_hermitian_pauli_sum(n, k, seed=0):
    rng = np.random.default_rng(seed)
    out = PauliSum.identity(n, 0.0)
    for _ in range(k):
        s = "".join(rng.choice(list("IXYZ")) for _ in range(n))
        out = out + PauliSum.from_term(n, float(rng.normal()), s)
    return out


def test_ham_apply_matches_dense():
    n = 5
    H = random_hermitian_pauli_sum(n, 12, seed=1)
    c = compile_pauli_sum(H)
    hx, hz, ha, hconst = sv.as_device(c)
    rng = np.random.default_rng(2)
    psi = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    psi /= np.linalg.norm(psi)
    psi_j = jnp.asarray(psi)
    out = np.asarray(sv.ham_apply(psi_j, hx, hz, ha, hconst))
    dense = H.to_matrix() @ psi
    assert np.allclose(out, dense, atol=1e-10)
    e = float(sv.expectation(psi_j, hx, hz, ha, hconst))
    assert np.isclose(e, np.real(np.vdot(psi, dense)), atol=1e-10)


def test_rotation_matches_expm():
    from scipy.linalg import expm
    n = 4
    P = PauliSum.from_term(n, 1.0, "XYZY", [0, 1, 2, 3])
    c = compile_pauli_sum(P)
    theta = 0.37
    rng = np.random.default_rng(3)
    psi = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    psi /= np.linalg.norm(psi)
    out = np.asarray(sv.pauli_rotation(
        jnp.asarray(psi), jnp.asarray(theta),
        jnp.asarray(c.x[0]), jnp.asarray(c.z[0]), jnp.asarray(c.kappa[0])))
    dense = expm(1j * theta * P.to_matrix()) @ psi
    assert np.allclose(out, dense, atol=1e-10)


def test_adjoint_gradient_matches_fd():
    n = 4
    H = random_hermitian_pauli_sum(n, 10, seed=5)
    gens = [random_hermitian_pauli_sum(n, 3, seed=10 + i) for i in range(4)]
    seq = compile_op_sequence(gens, n)
    ham = compile_pauli_sum(H)
    psi0 = sv.hf_state(n, 0b1100)
    energy, _ = sv.build_energy_fn(psi0, seq, ham)
    theta = jnp.asarray(np.random.default_rng(7).normal(size=4) * 0.3)
    g = jax.grad(energy)(theta)
    eps = 1e-6
    for k in range(4):
        tp = theta.at[k].add(eps)
        tm = theta.at[k].add(-eps)
        fd = (float(energy(tp)) - float(energy(tm))) / (2 * eps)
        assert np.isclose(float(g[k]), fd, atol=1e-6), (k, float(g[k]), fd)


def test_h2_uccsd_vqe_reaches_fci():
    md = compute_molecule([("H", (0, 0, 0)), ("H", (0, 0, 0.7414))], "sto-3g")
    hpq, hpqrs = convert_to_h_integrals(md.one_body_integrals, md.two_body_integrals)
    ham = ElectronicStructureHamiltonian(hpq, hpqrs, md.nuclear_repulsion)
    n = ham.nbqbits
    hsp = ham.to_spin("JW")

    noons_full = [2.0] * 2 + [0.0] * 2
    eps_full = [e for e in md.orbital_energies for _ in range(2)]
    cluster_ops, theta0, hf_init = get_cluster_ops_and_init_guess(
        md.n_elec, [0] * n, eps_full, hpqrs)

    # x1j convention of the reference (ucc.py:31): Hermitian generators
    gens = [transform_operator(op, "JW") * 1j for op in cluster_ops]
    seq = compile_op_sequence(gens, n)
    cham = compile_pauli_sum(hsp)
    psi0 = sv.hf_state(n, hf_init)
    energy, _ = sv.build_energy_fn(psi0, seq, cham)
    grad = jax.jit(jax.grad(energy))

    # HF sanity: theta=0 must give the SCF energy
    e_hf = float(energy(jnp.zeros(len(gens))))
    assert np.isclose(e_hf, md.info["HF"], atol=1e-9)

    res = minimize(lambda t: float(energy(jnp.asarray(t))),
                   np.asarray(theta0),
                   jac=lambda t: np.asarray(grad(jnp.asarray(t))),
                   method="BFGS", tol=1e-12)
    assert abs(res.fun - md.info["FCI"]) < 1e-7, (res.fun, md.info["FCI"])


def test_gates_consistency():
    n = 3
    psi = sv.hf_state(n, 0)
    # X on qubit 1 -> |010>
    psi1 = sv.apply_x(psi, 1, n)
    assert np.isclose(float(jnp.abs(psi1[0b010]) ** 2), 1.0)
    # CNOT(1 -> 2): |010> -> |011>
    psi2 = sv.apply_cnot(psi1, 1, 2, n)
    assert np.isclose(float(jnp.abs(psi2[0b011]) ** 2), 1.0)
    # RY(pi) on qubit 0 == -i Y: |0..> -> |1..> up to phase
    psi3 = sv.apply_ry(psi, np.pi, 0, n)
    assert np.isclose(float(jnp.abs(psi3[0b100]) ** 2), 1.0)
    # H then H is identity
    psi4 = sv.apply_h(sv.apply_h(psi, 2, n), 2, n)
    assert np.allclose(np.asarray(psi4), np.asarray(psi), atol=1e-12)
