"""bf16-limb matmul modes: accuracy of exact_dot vs HIGHEST.

One operand of every engine matmul is an exact {0,+-1} sign/permutation
matrix; exact_dot limb-splits only the state operand.  Expected residuals
(relative): bf16x2 ~2^-18, bf16x3 ~2^-27 (better than f32's 2^-24).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvqe_tpu.sim import statevector as sv


@pytest.fixture()
def force_mxu(monkeypatch):
    # exact_dot limb paths are accelerator-only; force them on CPU (bf16
    # dots work on CPU, just slowly) to validate the arithmetic
    monkeypatch.setattr(sv, "_use_mxu_xor", lambda: True)


def _signed_perm(n, rng):
    P = np.zeros((n, n), dtype=np.float32)
    perm = rng.permutation(n)
    P[np.arange(n), perm] = rng.choice([-1.0, 1.0], size=n)
    return P


@pytest.mark.parametrize("mode,tol", [("bf16x2", 1e-4), ("bf16x3", 2e-7)])
def test_exact_dot_limb_accuracy(force_mxu, mode, tol):
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
    P = jnp.asarray(_signed_perm(128, rng))
    ref = np.asarray(X, dtype=np.float64) @ np.asarray(P, dtype=np.float64)
    dims = (((1,), (0,)), ((), ()))

    prev = sv.set_matmul_mode(mode)
    try:
        out = np.asarray(sv.exact_dot(X, P, dims, exact_side="b",
                                      out_dtype=jnp.float32))
    finally:
        sv.set_matmul_mode(prev)
    rel = np.max(np.abs(out - ref)) / np.max(np.abs(ref))
    assert rel < tol, rel
    # and the exact-side-a orientation
    prev = sv.set_matmul_mode(mode)
    try:
        out2 = np.asarray(sv.exact_dot(P, X.T, dims, exact_side="a",
                                       out_dtype=jnp.float32))
    finally:
        sv.set_matmul_mode(prev)
    ref2 = np.asarray(P, dtype=np.float64) @ np.asarray(X.T, np.float64)
    rel2 = np.max(np.abs(out2 - ref2)) / np.max(np.abs(ref2))
    assert rel2 < tol, rel2


def test_f64_and_highest_bypass_limbs(force_mxu):
    # f64 data (CPU x64 tests) must always take the HIGHEST path regardless
    # of mode, bit-identical to a direct dot
    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.normal(size=(32, 64)))
    P = jnp.asarray(_signed_perm(64, rng).astype(np.float64))
    dims = (((1,), (0,)), ((), ()))
    prev = sv.set_matmul_mode("bf16x2")
    try:
        out = np.asarray(sv.exact_dot(X, P, dims, exact_side="b"))
    finally:
        sv.set_matmul_mode(prev)
    assert out.dtype == np.float64
    np.testing.assert_allclose(out, np.asarray(X) @ np.asarray(P), rtol=1e-14)


def test_engine_energy_under_bf16x3(force_mxu):
    """Whole-engine smoke at f32 with bf16x3 permutation matmuls: H4 UCCSD
    energy within 5e-6 Ha of the f64 HIGHEST value."""
    from openvqe_tpu.chem.frontend import compute_molecule
    from openvqe_tpu.ops.hamiltonian import (
        ElectronicStructureHamiltonian, convert_to_h_integrals)
    from openvqe_tpu.ops.transforms import transform_operator
    from openvqe_tpu.ops.uccsd import get_cluster_ops_and_init_guess
    from openvqe_tpu.sim import grouped as gr
    from openvqe_tpu.sim.compile import compile_op_sequence, compile_pauli_sum

    md = compute_molecule([("H", (0, 0, 0.85 * k)) for k in range(4)],
                          "sto-3g", run_fci_flag=False)
    hpq, hpqrs = convert_to_h_integrals(md.one_body_integrals,
                                        md.two_body_integrals)
    hsp = ElectronicStructureHamiltonian(
        hpq, hpqrs, md.nuclear_repulsion).to_spin("JW")
    eps_full = [e for e in md.orbital_energies for _ in range(2)]
    cluster_ops, theta0, hf_init = get_cluster_ops_and_init_guess(
        md.n_elec, [0] * 8, eps_full, hpqrs)
    gens = [transform_operator(op, "JW") * 1j for op in cluster_ops]
    n = hsp.nbqbits
    gseq = gr.group_op_sequence(compile_op_sequence(gens, n))
    gham = gr.group_pauli_sum(compile_pauli_sum(hsp, n))
    theta = jnp.asarray(np.asarray(theta0), dtype=jnp.float32)
    psi0_64 = sv.hf_state(n, hf_init)
    psi0_32 = psi0_64.astype(np.float32)

    # f64 HIGHEST reference
    e_ref = float(gr.grouped_expectation(
        gr.apply_grouped_ops(jnp.asarray(psi0_64),
                             jnp.asarray(np.asarray(theta0)),
                             *gr.seq_as_device(gseq)),
        *gr.ham_as_device(gham)))

    prev = sv.set_matmul_mode("bf16x3")
    try:
        # rebuild f32 arg tuples so fields come out f32
        def as32(args):
            return tuple(a.astype(np.float32)
                         if getattr(a, "dtype", None) in (np.float64,)
                         else a for a in args)
        e_fast = float(gr.grouped_expectation(
            gr.apply_grouped_ops(jnp.asarray(psi0_32), theta,
                                 *as32(gr.seq_as_device(gseq))),
            *as32(gr.ham_as_device(gham))))
    finally:
        sv.set_matmul_mode(prev)
    assert abs(e_fast - e_ref) < 5e-6, (e_fast, e_ref)
