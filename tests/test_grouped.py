"""Parity of the x-mask-grouped engine vs the per-term reference path.

The grouped kernels (sim/grouped.py) must be numerically identical (f64
CPU: <= 1e-10) to the per-term scan engine on energies, H|psi>, rotation
sweeps, adjoint gradients, and pool screening overlaps.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from openvqe_tpu.chem.frontend import compute_molecule
from openvqe_tpu.ops.hamiltonian import (
    ElectronicStructureHamiltonian,
    convert_to_h_integrals,
)
from openvqe_tpu.ops.transforms import transform_operator
from openvqe_tpu.ops.uccsd import get_cluster_ops_and_init_guess
from openvqe_tpu.sim import grouped as gr
from openvqe_tpu.sim import statevector as sv
from openvqe_tpu.sim.compile import (
    compile_op_sequence,
    compile_pauli_sum,
    compile_pool,
)


@pytest.fixture(scope="module")
def h4_problem():
    md = compute_molecule([("H", (0, 0, 0.85 * k)) for k in range(4)],
                          "sto-3g")
    hpq, hpqrs = convert_to_h_integrals(md.one_body_integrals,
                                        md.two_body_integrals)
    ham = ElectronicStructureHamiltonian(hpq, hpqrs, md.nuclear_repulsion)
    hsp = ham.to_spin("JW")
    eps_full = [e for e in md.orbital_energies for _ in range(2)]
    cluster_ops, theta0, hf_init = get_cluster_ops_and_init_guess(
        md.n_elec, [0] * 8, eps_full, hpqrs)
    gens = [transform_operator(op, "JW") * 1j for op in cluster_ops]
    return hsp, gens, hf_init


def _random_state(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(2, 1 << n))
    return jnp.asarray(v / np.sqrt(np.sum(v * v)))


def test_grouping_reduces_group_count(h4_problem):
    hsp, gens, _ = h4_problem
    n = hsp.nbqbits
    ham = compile_pauli_sum(hsp, n)
    gh = gr.group_pauli_sum(ham)
    # diagonal terms split out, off-diagonal batches well under term count
    assert len(gh.z_diag) > 0
    assert gh.n_groups < (ham.n_terms - len(gh.z_diag))
    seq = compile_op_sequence(gens, n)
    gseq = gr.group_op_sequence(seq)
    assert gseq is not None
    # every UCCSD generator merges to one x-group (8 doubles / 2 singles)
    assert gseq.n_groups == len(gens)


def test_grouped_expectation_and_ham_apply(h4_problem):
    hsp, _, _ = h4_problem
    n = hsp.nbqbits
    ham = compile_pauli_sum(hsp, n)
    gh = gr.group_pauli_sum(ham)
    psi = _random_state(n, seed=1)

    e_ref = float(sv.expectation(psi, *sv.as_device(ham)))
    e_grp = float(gr.grouped_expectation(psi, *gr.ham_as_device(gh)))
    assert abs(e_ref - e_grp) < 1e-10

    h_ref = np.asarray(sv.ham_apply(psi, *sv.as_device(ham)))
    h_grp = np.asarray(gr.grouped_ham_apply(psi, *gr.ham_as_device(gh)))
    assert np.max(np.abs(h_ref - h_grp)) < 1e-10


def test_grouped_apply_matches_per_term(h4_problem):
    hsp, gens, hf_init = h4_problem
    n = hsp.nbqbits
    seq = compile_op_sequence(gens, n)
    gseq = gr.group_op_sequence(seq)
    rng = np.random.default_rng(7)
    theta = jnp.asarray(rng.normal(scale=0.2, size=len(gens)))
    psi0 = jnp.asarray(sv.hf_state(n, hf_init))

    ref = np.asarray(sv.apply_ops(psi0, theta, *sv.seq_as_device(seq)))
    grp = np.asarray(gr.apply_grouped_ops(psi0, theta,
                                          *gr.seq_as_device(gseq)))
    assert np.max(np.abs(ref - grp)) < 1e-10

    # inverse sweep really inverts
    back = gr.apply_grouped_ops(jnp.asarray(grp), theta,
                                *gr.seq_as_device(gseq),
                                reverse=True, sign=-1.0)
    assert np.max(np.abs(np.asarray(back) - np.asarray(psi0))) < 1e-10


def test_grouped_energy_and_adjoint_gradient(h4_problem):
    hsp, gens, hf_init = h4_problem
    n = hsp.nbqbits
    seq = compile_op_sequence(gens, n)
    gseq = gr.group_op_sequence(seq)
    ham = compile_pauli_sum(hsp, n)
    gh = gr.group_pauli_sum(ham)
    psi0 = sv.hf_state(n, hf_init)
    rng = np.random.default_rng(3)
    theta = jnp.asarray(rng.normal(scale=0.1, size=len(gens)))

    e_ref_fn, _ = sv.build_energy_fn(psi0, seq, ham)
    import jax
    g_ref = np.asarray(jax.grad(e_ref_fn)(theta))
    e_ref = float(e_ref_fn(theta))

    energy, _, _ = gr.build_grouped_dynamic_energy_fn(gh)
    _, energy_and_grad, _ = gr.build_grouped_dynamic_energy_fn(gh)
    e_grp, g_grp = energy_and_grad(theta, jnp.asarray(psi0),
                                   *gr.seq_as_device(gseq))
    assert abs(e_ref - float(e_grp)) < 1e-10
    assert np.max(np.abs(g_ref - np.asarray(g_grp))) < 1e-9


def test_grouped_segmented_matches_dynamic(h4_problem):
    hsp, gens, hf_init = h4_problem
    n = hsp.nbqbits
    seq = compile_op_sequence(gens, n)
    gseq = gr.group_op_sequence(seq)
    ham = compile_pauli_sum(hsp, n)
    gh = gr.group_pauli_sum(ham, k_cap=4)   # force chunking
    psi0 = sv.hf_state(n, hf_init)
    rng = np.random.default_rng(5)
    theta = np.asarray(rng.normal(scale=0.1, size=len(gens)))

    _, dyn_eg, _ = gr.build_grouped_dynamic_energy_fn(gr.group_pauli_sum(ham))
    e_ref, g_ref = dyn_eg(jnp.asarray(theta), jnp.asarray(psi0),
                          *gr.seq_as_device(gseq))

    energy, energy_and_grad, forward, _, _ = \
        gr.build_grouped_segmented_energy_fn(gh, seg=3)  # force segmentation
    e_seg, g_seg = energy_and_grad(theta, psi0, gr.seq_as_device(gseq))
    assert abs(float(e_ref) - e_seg) < 1e-10
    assert np.max(np.abs(np.asarray(g_ref) - g_seg)) < 1e-9


def test_grouped_pool_overlaps(h4_problem):
    hsp, gens, hf_init = h4_problem
    n = hsp.nbqbits
    ham = compile_pauli_sum(hsp, n)
    pool = compile_pool(gens, n)

    ref_fn = sv.build_pool_gradient_fn(pool, ham)
    grp_fn = gr.build_grouped_pool_gradient_fn(gr.group_pool(pool),
                                               gr.group_pauli_sum(ham))
    psi = _random_state(n, seed=11)
    v_ref = ref_fn(psi)
    v_grp = grp_fn(psi)
    assert np.max(np.abs(v_ref - v_grp)) < 1e-10


def test_grouped_non_hermitian_paulisum():
    """General complex-coefficient Pauli sums exercise the a_im branches."""
    from openvqe_tpu.ops.pauli import PauliSum

    n = 5
    rng = np.random.default_rng(13)
    ps = PauliSum.identity(n, 0.0)
    paulis = ["I", "X", "Y", "Z"]
    for _ in range(25):
        s = "".join(rng.choice(paulis) for _ in range(n))
        qubits = [q for q, p in enumerate(s) if p != "I"]
        label = "".join(p for p in s if p != "I")
        if not label:
            continue
        ps = ps + PauliSum.from_term(n, complex(rng.normal(), rng.normal()),
                                     label, qubits)
    c = compile_pauli_sum(ps, n)
    gh = gr.group_pauli_sum(c)
    assert not gh.hermitian
    psi = _random_state(n, seed=2)
    h_ref = np.asarray(sv.ham_apply(psi, *sv.as_device(c)))
    h_grp = np.asarray(gr.grouped_ham_apply(psi, *gr.ham_as_device(gh)))
    assert np.max(np.abs(h_ref - h_grp)) < 1e-10
    e_ref = float(sv.expectation(psi, *sv.as_device(c)))
    e_grp = float(gr.grouped_expectation(psi, *gr.ham_as_device(gh)))
    assert abs(e_ref - e_grp) < 1e-10
