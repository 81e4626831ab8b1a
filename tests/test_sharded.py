"""Sharded-statevector tests on the virtual 8-device CPU mesh: sharded
results must match the single-device engine to 1e-10 (f64 CPU).

The engine is scan-over-groups (one executable regardless of pool size), so
the FULL H4 UCCSD pool runs here — round 1 had to truncate it because the
old per-term unroll was compile-bound.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvqe_tpu.chem.frontend import compute_molecule
from openvqe_tpu.ops.hamiltonian import ElectronicStructureHamiltonian, convert_to_h_integrals
from openvqe_tpu.ops.transforms import transform_operator
from openvqe_tpu.ops.uccsd import get_cluster_ops_and_init_guess
from openvqe_tpu.parallel import sharded as sh
from openvqe_tpu.sim import grouped as gr
from openvqe_tpu.sim import statevector as sv
from openvqe_tpu.sim.compile import compile_op_sequence, compile_pauli_sum, compile_pool


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
    return hsp, gens, hf_init, md


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
def sharded_obj(h4_problem):
    """One sharded objective shared across tests (the shard_map compile
    dominates this file's runtime)."""
    hsp, gens, hf_init, md = h4_problem
    mesh = sh.make_mesh(8)
    return sh.ShardedVQEObjective(hsp, mesh)


def test_sharded_full_pool_energy_and_grad_match_single(h4_problem,
                                                        sharded_obj):
    hsp, gens, hf_init, md = h4_problem
    bound = sharded_obj.bind(gens, hf_init)

    seq = compile_op_sequence(gens, 8)
    ham = compile_pauli_sum(hsp, 8)
    energy1, _ = sv.build_energy_fn(sv.hf_state(8, hf_init), seq, ham)
    g1 = jax.jit(jax.grad(energy1))

    theta = np.random.default_rng(1).normal(size=len(gens)) * 0.05
    e_sh = bound.energy(theta)
    e_1 = float(energy1(jnp.asarray(theta)))
    assert np.isclose(e_sh, e_1, atol=1e-10)

    e_sh2, g_sh = bound.energy_and_grad(theta)
    assert np.isclose(e_sh2, e_1, atol=1e-10)
    assert np.allclose(g_sh, np.asarray(g1(jnp.asarray(theta))), atol=1e-8)


def test_sharded_segmented_matches_unsegmented(h4_problem, sharded_obj):
    hsp, gens, hf_init, md = h4_problem
    mesh = sh.make_mesh(8)
    seg_obj = sh.ShardedVQEObjective(hsp, mesh, segmented=True)
    seg_obj.seg = 3   # force multiple segments
    theta = np.random.default_rng(2).normal(size=len(gens)) * 0.05
    e_ref, g_ref = sharded_obj.bind(gens, hf_init).energy_and_grad(theta)
    e_seg, g_seg = seg_obj.bind(gens, hf_init).energy_and_grad(theta)
    assert np.isclose(e_ref, e_seg, atol=1e-10)
    assert np.allclose(g_ref, g_seg, atol=1e-9)


def test_sharded_pool_screen_matches_single(h4_problem, sharded_obj):
    hsp, gens, hf_init, md = h4_problem
    screen = sh.build_sharded_pool_gradient_fn(gens, sharded_obj)
    psi = sharded_obj.bind(gens, hf_init).forward(
        np.random.default_rng(3).normal(size=len(gens)) * 0.05)

    ref_fn = gr.build_grouped_pool_gradient_fn(
        gr.group_pool(compile_pool(gens, 8)),
        gr.group_pauli_sum(compile_pauli_sum(hsp, 8)))
    v_sh = screen(psi)
    v_1 = ref_fn(jnp.asarray(np.asarray(psi)))
    assert np.max(np.abs(v_sh - v_1)) < 1e-10


def test_sharded_vqe_step_descends(h4_problem, sharded_obj):
    hsp, gens, hf_init, md = h4_problem
    bound = sharded_obj.bind(gens, hf_init)
    theta = np.zeros(len(gens))
    energies = []
    for _ in range(8):
        e, g = bound.energy_and_grad(theta)
        energies.append(e)
        theta = theta - 0.1 * g
    assert np.isclose(energies[0], md.info["HF"], atol=1e-9)
    assert energies[-1] < energies[0] - 1e-3  # descending toward FCI


def test_sharded_hf_state_layout():
    mesh = sh.make_mesh(8)
    psi = sh.sharded_hf_state(8, 0b11110000, mesh)
    host = sv.to_host(psi)
    assert host[0b11110000] == 1.0 and np.count_nonzero(host) == 1


def test_fermionic_adapt_on_mesh_matches_single(h4_problem):
    """End-to-end ADAPT-VQE with the state sharded over the mesh (driver
    opt mesh_devices / VQEConfig.mesh_devices) reproduces the single-device
    trajectory."""
    from openvqe_tpu.algorithms.adapt import fermionic_adapt_vqe

    hsp, gens, hf_init, md = h4_problem
    cluster = [g * (-1j) for g in gens]   # anti-Hermitian pool form
    kw = dict(n_max_grads=1, fci=md.info["FCI"], optimizer="BFGS",
              tolerance=1e-7, max_external_iterations=3, verbose=False)
    it_1, _ = fermionic_adapt_vqe(cluster, hsp, hf_init, **kw)
    it_m, _ = fermionic_adapt_vqe(cluster, hsp, hf_init,
                                  mesh=sh.make_mesh(8), **kw)
    assert np.allclose(it_1["energies"], it_m["energies"], atol=1e-8)
    assert np.allclose(it_1["norms"], it_m["norms"], atol=1e-8)


def test_14q_beh2_sharded_matches_single():
    """14-qubit BeH2/STO-3G UCCSD energy+gradient over the 8-device mesh ==
    single device to 1e-10 (VERDICT round-1 item 3 'done' criterion)."""
    from openvqe_tpu.chem.frontend import compute_molecule
    from openvqe_tpu.ops.hamiltonian import (
        ElectronicStructureHamiltonian, convert_to_h_integrals)
    from openvqe_tpu.ops.transforms import transform_operator
    from openvqe_tpu.ops.uccsd import get_cluster_ops_and_init_guess
    from openvqe_tpu.sim.objective import VQEObjective

    md = compute_molecule([("Be", (0, 0, 0)), ("H", (0, 0, 1.4)),
                           ("H", (0, 0, -1.4))], "sto-3g",
                          run_fci_flag=False)
    n = 2 * len(md.orbital_energies)
    assert n == 14
    hpq, hpqrs = convert_to_h_integrals(md.one_body_integrals,
                                        md.two_body_integrals)
    hsp = ElectronicStructureHamiltonian(
        hpq, hpqrs, md.nuclear_repulsion).to_spin("JW")
    eps_full = [e for e in md.orbital_energies for _ in range(2)]
    cluster_ops, theta0, hf_init = get_cluster_ops_and_init_guess(
        md.n_elec, [0] * n, eps_full, hpqrs)
    gens = [transform_operator(op, "JW") * 1j for op in cluster_ops]

    theta = np.asarray(theta0, dtype=float)  # MP2 amplitudes
    e_1, g_1 = VQEObjective(hsp).bind(gens, hf_init).energy_and_grad(theta)
    bound_m = sh.ShardedVQEObjective(hsp, sh.make_mesh(8)).bind(gens, hf_init)
    e_m, g_m = bound_m.energy_and_grad(theta)
    assert abs(e_1 - e_m) < 1e-10
    assert np.max(np.abs(g_1 - g_m)) < 1e-9


def test_wssvqe_on_mesh_matches_single():
    """WSSVQE's gate-level ansatz (RY/RZ/CNOT — parallel/sharded_gates) on
    the mesh: total objective, gradient, per-state energies, and states all
    match the single-device path (VERDICT r2 item 8)."""
    from openvqe_tpu.algorithms import wssvqe as wv
    from openvqe_tpu.parallel import sharded_gates  # noqa: F401

    model = wv.ising(5)
    n, depth, n_states = 5, 2, 2
    weights = [2.0, 1.0]
    mesh = sh.make_mesh(4)
    total, grad_total, efns, sfns = wv._build_sharded_wssvqe(
        model, n, depth, n_states, weights, mesh)

    from openvqe_tpu.sim.compile import compile_pauli_sum as cps
    hargs = sv.as_device(cps(model, n))
    rng = np.random.default_rng(5)
    theta = jnp.asarray(rng.normal(scale=0.2,
                                   size=wv.n_parameters(n, depth)))

    def ref_total(th):
        tot = 0.0
        for k in range(n_states):
            psi = wv.hea_state(th, k, n, depth)
            tot = tot + weights[k] * sv.expectation(psi, *hargs)
        return tot

    assert np.isclose(float(total(theta)), float(ref_total(theta)),
                      atol=1e-10)
    g_sh = np.asarray(grad_total(theta))
    g_ref = np.asarray(jax.grad(ref_total)(theta))
    np.testing.assert_allclose(g_sh, g_ref, rtol=1e-8, atol=1e-10)
    for k in range(n_states):
        e_ref = float(sv.expectation(wv.hea_state(theta, k, n, depth),
                                     *hargs))
        assert np.isclose(float(efns[k](theta)), e_ref, atol=1e-10)
        psi_sh = np.asarray(sfns[k](theta))
        psi_ref = np.asarray(wv.hea_state(theta, k, n, depth))
        np.testing.assert_allclose(psi_sh, psi_ref, atol=1e-10)


def test_wssvqe_run_on_mesh():
    """End-to-end run_wssvqe over the mesh reproduces the single-device
    optimization bit-for-bit in trajectory terms (reference
    get_energy_WSSVQE.py:151-178): same final energies to 1e-9."""
    from openvqe_tpu.algorithms import wssvqe as wv

    model = wv.ising(4)
    ref = wv.run_wssvqe(model, n_states=2, depth=3, maxiter=300, seed=1,
                        track_fidelity=False)
    mesh = sh.make_mesh(2)
    out = wv.run_wssvqe(model, n_states=2, depth=3, maxiter=300, seed=1,
                        mesh=mesh)
    for e_mesh, e_single in zip(out["final_energies"],
                                ref["final_energies"]):
        assert abs(e_mesh - e_single) < 1e-9, (e_mesh, e_single)
    # fidelity recorded through the sharded state gather stays meaningful
    assert out["fidelity_lists"]["fidelity_circ_0"][-1] > 0.5
