"""Statevector engine tests (split-real representation): Pauli apply /
rotations / expectation vs dense matrices, adjoint gradients vs finite
differences, and an end-to-end UCCSD VQE on H2 reaching FCI (the reference's
correctness oracle, SURVEY.md §4)."""

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
from openvqe_tpu.sim.objective import VQEObjective


def random_hermitian_pauli_sum(n, k, seed=0):
    rng = np.random.default_rng(seed)
    out = PauliSum.identity(n, 0.0)
    for _ in range(k):
        s = "".join(rng.choice(list("IXYZ")) for _ in range(n))
        out = out + PauliSum.from_term(n, float(rng.normal()), s)
    return out


def random_state(n, seed):
    rng = np.random.default_rng(seed)
    psi = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    return psi / np.linalg.norm(psi)


def test_ham_apply_matches_dense():
    n = 5
    H = random_hermitian_pauli_sum(n, 12, seed=1)
    hargs = sv.as_device(compile_pauli_sum(H))
    psi = random_state(n, 2)
    planes = jnp.asarray(sv.complex_to_planes(psi))
    out = sv.to_host(sv.ham_apply(planes, *hargs))
    dense = H.to_matrix() @ psi
    assert np.allclose(out, dense, atol=1e-10)
    e = float(sv.expectation(planes, *hargs))
    assert np.isclose(e, np.real(np.vdot(psi, dense)), atol=1e-10)


def test_rotation_matches_expm():
    from scipy.linalg import expm
    n = 4
    P = PauliSum.from_term(n, 1.0, "XYZY", [0, 1, 2, 3])
    c = compile_pauli_sum(P)
    theta = 0.37
    psi = random_state(n, 3)
    kr, ki = float(np.real(c.kappa[0])), float(np.imag(c.kappa[0]))
    out = sv.to_host(sv.pauli_rotation(
        jnp.asarray(sv.complex_to_planes(psi)), jnp.asarray(theta),
        jnp.int32(c.x[0]), jnp.int32(c.z[0]),
        jnp.asarray(kr), jnp.asarray(ki)))
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


def test_dynamic_energy_matches_static_and_padding():
    n = 4
    H = random_hermitian_pauli_sum(n, 10, seed=5)
    gens = [random_hermitian_pauli_sum(n, 3, seed=20 + i) for i in range(3)]
    obj = VQEObjective(H, n)
    bound = obj.bind(gens, 0b1010)
    theta = np.random.default_rng(8).normal(size=3) * 0.2

    seq = compile_op_sequence(gens, n)
    energy_static, _ = sv.build_energy_fn(sv.hf_state(n, 0b1010), seq,
                                          compile_pauli_sum(H))
    e_static = float(energy_static(jnp.asarray(theta)))
    e_dyn, g_dyn = bound.energy_and_grad(theta)
    assert np.isclose(e_dyn, e_static, atol=1e-10)
    g_static = jax.grad(energy_static)(jnp.asarray(theta))
    assert np.allclose(g_dyn, np.asarray(g_static), atol=1e-9)


def test_pool_gradient_matches_dense():
    n = 4
    H = random_hermitian_pauli_sum(n, 8, seed=30)
    pool = [random_hermitian_pauli_sum(n, 2, seed=40 + i) * 1j for i in range(5)]
    from openvqe_tpu.sim.compile import compile_pool
    grad_fn = sv.build_pool_gradient_fn(compile_pool(pool, n),
                                        compile_pauli_sum(H))
    psi = random_state(n, 9)
    v = grad_fn(jnp.asarray(sv.complex_to_planes(psi)))
    Hm = H.to_matrix()
    sigma = Hm @ psi
    for i, A in enumerate(pool):
        expected = np.vdot(sigma, A.to_matrix() @ psi)
        assert np.isclose(v[i], expected, atol=1e-10), i


def test_h2_uccsd_vqe_reaches_fci():
    md = compute_molecule([("H", (0, 0, 0)), ("H", (0, 0, 0.7414))], "sto-3g")
    hpq, hpqrs = convert_to_h_integrals(md.one_body_integrals, md.two_body_integrals)
    ham = ElectronicStructureHamiltonian(hpq, hpqrs, md.nuclear_repulsion)
    n = ham.nbqbits
    hsp = ham.to_spin("JW")

    eps_full = [e for e in md.orbital_energies for _ in range(2)]
    cluster_ops, theta0, hf_init = get_cluster_ops_and_init_guess(
        md.n_elec, [0] * n, eps_full, hpqrs)

    gens = [transform_operator(op, "JW") * 1j for op in cluster_ops]
    obj = VQEObjective(hsp, n)
    bound = obj.bind(gens, hf_init)

    e_hf = bound.energy(np.zeros(len(gens)))
    assert np.isclose(e_hf, md.info["HF"], atol=1e-9)

    fun, jac = bound.scipy_fun_jac()
    res = minimize(fun, np.asarray(theta0), jac=jac, method="BFGS", tol=1e-12)
    assert abs(res.fun - md.info["FCI"]) < 1e-7, (res.fun, md.info["FCI"])


def test_gates_consistency():
    n = 3
    psi = jnp.asarray(sv.hf_state(n, 0))
    psi1 = sv.apply_x(psi, 1, n)
    assert np.isclose(np.abs(sv.to_host(psi1)[0b010]) ** 2, 1.0)
    psi2 = sv.apply_cnot(psi1, 1, 2, n)
    assert np.isclose(np.abs(sv.to_host(psi2)[0b011]) ** 2, 1.0)
    psi3 = sv.apply_ry(psi, np.pi, 0, n)
    assert np.isclose(np.abs(sv.to_host(psi3)[0b100]) ** 2, 1.0)
    psi4 = sv.apply_h(sv.apply_h(psi, 2, n), 2, n)
    assert np.allclose(sv.to_host(psi4), sv.to_host(psi), atol=1e-12)
    # RZ(t) = diag(e^{-it/2}, e^{+it/2}): relative phase of |1> vs |0> = e^{+it}
    psi5 = sv.apply_rz(sv.apply_h(psi, 0, n), 0.7, 0, n)
    host = sv.to_host(psi5)
    rel = host[0b100] / host[0b000]
    assert np.isclose(rel, np.exp(1j * 0.7), atol=1e-12)
