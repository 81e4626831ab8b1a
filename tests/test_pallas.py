"""Parity of the Pallas fused kernels vs the XLA grouped path.

Interpret mode on CPU (hardware parity is exercised by the TPU bench and
the /verify recipe).  Uses n = 15 qubits so the tile-pairing path (x_top
!= 0 tile exchanges) is genuinely exercised alongside in-tile permutation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvqe_tpu.sim import grouped as gr
from openvqe_tpu.sim import pallas_kernels as pk
from openvqe_tpu.sim import statevector as sv
from openvqe_tpu.sim.compile import compile_op_sequence, compile_pauli_sum


@pytest.fixture(scope="module")
def problem15():
    """H7+ style 15-qubit problem is slow to build; instead use synthetic
    odd-Y generators + a Hermitian Hamiltonian over 15 qubits with x masks
    spanning lane, sublane and tile bits."""
    from openvqe_tpu.ops.pauli import PauliSum

    n = 15
    rng = np.random.default_rng(42)
    paulis = np.array(list("IXYZ"))

    def random_odd_y_string():
        while True:
            s = rng.choice(paulis, size=n)
            s[rng.integers(n)] = "X"           # keep support nontrivial
            ny = int(np.sum(s == "Y"))
            if ny % 2 == 1:
                qubits = [q for q, p in enumerate(s) if p != "I"]
                label = "".join(p for p in s if p != "I")
                return label, qubits

    # generators: each one Pauli string (odd-Y => real rotation group)
    gens = []
    for _ in range(6):
        label, qubits = random_odd_y_string()
        gens.append(PauliSum.from_term(n, 1.0, label, qubits))

    # Hermitian Hamiltonian with real coefficients, no diagonal terms
    # (the Pallas expectation kernel covers the off-diagonal groups)
    ham = PauliSum.identity(n, 0.0)
    for _ in range(12):
        label, qubits = random_odd_y_string()
        ham = ham + PauliSum.from_term(n, float(rng.normal()), label, qubits)
        # an even-Y (x != 0) partner too
        s = rng.choice(np.array(list("IXZ")), size=n)
        s[rng.integers(n)] = "X"
        qubits = [q for q, p in enumerate(s) if p != "I"]
        label = "".join(p for p in s if p != "I")
        ham = ham + PauliSum.from_term(n, float(rng.normal()), label, qubits)
    return n, gens, ham


def _rand_state(n, seed=3):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(2, 1 << n)).astype(np.float32)
    return jnp.asarray(v / np.sqrt(np.sum(v * v)))


def test_rotation_sweep_parity(problem15):
    n, gens, _ = problem15
    gseq = gr.group_op_sequence(compile_op_sequence(gens, n))
    assert gseq is not None
    gd = pk.seq_group_data(gseq)
    assert (gd.x_top != 0).any(), "need tile-pair exchanges in this test"
    psi = _rand_state(n)
    theta = jnp.asarray(
        np.random.default_rng(7).normal(scale=0.3, size=len(gens)),
        jnp.float32)

    sargs32 = tuple(
        a.astype(np.float32) if getattr(a, "dtype", None) == np.float64
        else a for a in gr.seq_as_device(gseq))
    ref = np.asarray(gr.apply_grouped_ops(psi, theta, *sargs32))
    out = np.asarray(pk.apply_grouped_ops_pallas(
        psi, theta, *pk.seq_args(gd), interpret=True))
    assert np.max(np.abs(out - ref)) < 1e-6


def test_expectation_parity(problem15):
    n, _, ham = problem15
    gham = gr.group_pauli_sum(compile_pauli_sum(ham, n))
    # odd-Y strings make compiled coefficients imaginary even for this
    # Hermitian H — the kernel must exercise both weight fields
    assert not gham.hermitian
    gd = pk.ham_group_data(gham)
    assert np.max(np.abs(gd.w_lane_im)) > 0
    psi = _rand_state(n, seed=11)

    hargs32 = tuple(
        a.astype(np.float32) if getattr(a, "dtype", None) == np.float64
        else a for a in gr.ham_as_device(gham))
    e_ref = float(gr.grouped_expectation(psi, *hargs32))
    # pallas kernel covers off-diagonal groups; add diag/const like the
    # production wrapper does (here: no diagonal terms, const = 0)
    assert len(gham.z_diag) == 0 and gham.c_re == 0.0
    e_pal = float(pk.expectation_pallas(psi, *pk.ham_args(gd),
                                        interpret=True))
    assert abs(e_pal - e_ref) < 1e-5 * max(1.0, abs(e_ref))


def test_ham_apply_parity(problem15):
    n, _, ham = problem15
    gham = gr.group_pauli_sum(compile_pauli_sum(ham, n))
    gd = pk.ham_group_data(gham)
    psi = _rand_state(n, seed=21)

    hargs32 = tuple(
        a.astype(np.float32) if getattr(a, "dtype", None) == np.float64
        else a for a in gr.ham_as_device(gham))
    ref = np.asarray(gr.grouped_ham_apply(psi, *hargs32))
    # pallas covers the off-diagonal groups; this synthetic H has no
    # diagonal terms or constant
    out = np.asarray(pk.ham_apply_pallas(psi, *pk.ham_args(gd),
                                         interpret=True))
    assert np.max(np.abs(out - ref)) < 1e-6


def test_adjoint_sweep_parity(problem15):
    n, gens, ham = problem15
    gseq = gr.group_op_sequence(compile_op_sequence(gens, n))
    gd = pk.seq_group_data(gseq)
    gham = gr.group_pauli_sum(compile_pauli_sum(ham, n))
    rng = np.random.default_rng(17)
    theta = jnp.asarray(rng.normal(scale=0.3, size=len(gens)), jnp.float32)

    sargs32 = tuple(
        a.astype(np.float32) if getattr(a, "dtype", None) == np.float64
        else a for a in gr.seq_as_device(gseq))
    hargs32 = tuple(
        a.astype(np.float32) if getattr(a, "dtype", None) == np.float64
        else a for a in gr.ham_as_device(gham))
    psi = gr.apply_grouped_ops(_rand_state(n, seed=5), theta, *sargs32)
    lam = gr.grouped_ham_apply(psi, *hargs32)

    grad0 = jnp.zeros_like(theta)
    p_ref, l_ref, g_ref = gr.grouped_adjoint_sweep(theta, psi, lam, grad0,
                                                   *sargs32)

    # pallas adjoint: reversed group order, per-group entries segment-summed
    rev = lambda a: np.ascontiguousarray(np.asarray(a)[::-1])
    angles = -np.asarray(theta)[gd.op][::-1].astype(np.float32)
    p_out, l_out, gts = pk.adjoint_sweep_pallas(
        psi, lam, rev(gd.x_top), rev(gd.x_mid), rev(gd.x_lane),
        np.ascontiguousarray(angles), rev(gd.w_lane), rev(gd.s_mid),
        rev(gd.s_top), interpret=True)
    g_pal = np.zeros(len(gens), dtype=np.float64)
    np.add.at(g_pal, np.asarray(gd.op)[::-1], np.asarray(gts, np.float64))

    assert np.max(np.abs(np.asarray(p_ref) - np.asarray(p_out))) < 1e-5
    assert np.max(np.abs(np.asarray(l_ref) - np.asarray(l_out))) < 1e-4
    assert np.max(np.abs(np.asarray(g_ref) - g_pal)) < 1e-5
