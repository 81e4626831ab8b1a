"""Qubit tapering: exactness against dense diagonalization.

Tapering is exact for states in the reference sector — the tapered ground
energy must equal the full FCI value (the molecular ground state lives in
the HF symmetry sector for these systems).
"""

import numpy as np
import pytest

from openvqe_tpu.chem.frontend import compute_molecule
from openvqe_tpu.ops.hamiltonian import (
    ElectronicStructureHamiltonian,
    convert_to_h_integrals,
)
from openvqe_tpu.ops import tapering as tp
from openvqe_tpu.ops.pauli import PauliSum


def _jw_problem(geometry, basis, charge=0):
    md = compute_molecule(geometry, basis, charge=charge, run_fci_flag=True)
    hpq, hpqrs = convert_to_h_integrals(md.one_body_integrals,
                                        md.two_body_integrals)
    hsp = ElectronicStructureHamiltonian(
        hpq, hpqrs, md.nuclear_repulsion).to_spin("JW")
    n = hsp.nbqbits
    # JW HF determinant: first n_elec spin orbitals occupied (interleaved)
    ref_bits = [1 if q < md.n_elec else 0 for q in range(n)]
    return hsp, ref_bits, md


def test_gf2_nullspace():
    rows = [0b1010, 0b0110]
    null = tp.gf2_nullspace(rows, 4)
    assert len(null) == 2
    for v in null:
        for r in rows:
            assert bin(r & v).count("1") % 2 == 0


def test_clifford_conjugation_is_unitary_equivalence():
    """Spectrum is invariant and Hermiticity is preserved under the
    exp(i pi/4 A) conjugation."""
    rng = np.random.default_rng(0)
    n = 4
    ps = PauliSum.identity(n, 0.0)
    labels = [("ZZ", [0, 1]), ("XX", [1, 2]), ("YZ", [2, 3]), ("XYZ", [0, 2, 3]),
              ("Z", [1]), ("X", [3])]
    for lab, qs in labels:
        ps = ps + PauliSum.from_term(n, float(rng.normal()), lab, qs)
    w_ref = np.linalg.eigvalsh(ps.to_matrix())
    rot = tp.clifford_conjugate(ps, x_a=0b0110, z_a=0b0011)  # some Pauli A
    assert rot.is_hermitian()
    w_rot = np.linalg.eigvalsh(rot.to_matrix())
    assert np.allclose(w_ref, w_rot, atol=1e-10)


@pytest.mark.parametrize("geometry,basis,charge,expect_removed", [
    ([("H", (0, 0, 0)), ("H", (0, 0, 0.7414))], "sto-3g", 0, 3),
    ([("H", (0, 0, 0.85 * k)) for k in range(4)], "sto-3g", 0, 2),
])
def test_tapered_ground_state_equals_fci(geometry, basis, charge,
                                         expect_removed):
    hsp, ref_bits, md = _jw_problem(geometry, basis, charge)
    res = tp.taper_hamiltonian(hsp, ref_bits)
    assert len(res.pivots) >= expect_removed
    assert res.tapered.nbqbits == hsp.nbqbits - len(res.pivots)
    w = np.linalg.eigvalsh(res.tapered.to_matrix())
    assert w[0] == pytest.approx(md.info["FCI"], abs=1e-8)


def test_tapering_preserves_hf_energy():
    """<HF|H|HF> must survive the taper: the tapered Hamiltonian evaluated
    on the projected HF state equals E_HF."""
    hsp, ref_bits, md = _jw_problem(
        [("H", (0, 0, 0.85 * k)) for k in range(4)], "sto-3g")
    res = tp.taper_hamiltonian(hsp, ref_bits)
    # the rotated HF state is no longer a basis state in general, but the
    # sector is fixed; check instead that the full spectrum of the tapered
    # H is a subset of the full H spectrum
    w_full = np.linalg.eigvalsh(hsp.to_matrix())
    w_tap = np.linalg.eigvalsh(res.tapered.to_matrix())
    for wt in w_tap[:8]:
        assert np.min(np.abs(w_full - wt)) < 1e-8


def test_taper_vqe_problem_exact_parity():
    """taper_vqe_problem (Hamiltonian + UCCSD generators + HF reference):
    theta=0 energy, an arbitrary-theta energy, gradients, and the
    variational minimum all match the untapered problem exactly — the
    whole UCCSD manifold lives in the tapered sector."""
    from scipy.optimize import minimize

    from openvqe_tpu.chem.frontend import compute_molecule
    from openvqe_tpu.ops.hamiltonian import (
        ElectronicStructureHamiltonian, convert_to_h_integrals)
    from openvqe_tpu.ops.transforms import transform_operator
    from openvqe_tpu.ops.uccsd import get_cluster_ops_and_init_guess
    from openvqe_tpu.sim.objective import VQEObjective

    md = compute_molecule([("H", (0, 0, 0.85 * k)) for k in range(4)],
                          "sto-3g")
    hpq, hpqrs = convert_to_h_integrals(md.one_body_integrals,
                                        md.two_body_integrals)
    esh = ElectronicStructureHamiltonian(hpq, hpqrs, md.nuclear_repulsion)
    hsp = esh.to_spin("JW")
    n = hsp.nbqbits
    eps = [e for e in md.orbital_energies for _ in range(2)]
    ops, th0, hf = get_cluster_ops_and_init_guess(md.n_elec, [0] * n, eps,
                                                  hpqrs)
    gens = [transform_operator(op, "JW") * 1j for op in ops]

    ht, gens_t, hf_t, tap = tp.taper_vqe_problem(hsp, gens, hf)
    assert ht.nbqbits == n - 2            # alpha- and beta-parity taper off
    b_full = VQEObjective(hsp).bind(gens, hf)
    b_tap = VQEObjective(ht).bind(gens_t, hf_t)

    z = np.zeros(len(gens))
    assert b_tap.energy(z) == pytest.approx(float(md.info["HF"]), abs=1e-9)
    th = np.asarray(th0, float)
    e_f, g_f = b_full.energy_and_grad(th)
    e_t, g_t = b_tap.energy_and_grad(th)
    assert e_t == pytest.approx(e_f, abs=1e-9)
    np.testing.assert_allclose(g_t, g_f, rtol=1e-7, atol=1e-9)

    r_f = minimize(lambda t: b_full.energy_and_grad(t), th, jac=True,
                   method="L-BFGS-B")
    r_t = minimize(lambda t: b_tap.energy_and_grad(t), th, jac=True,
                   method="L-BFGS-B")
    assert r_t.fun == pytest.approx(r_f.fun, abs=1e-8)


def test_taper_opt_plumbing():
    """VQEConfig(taper=True) reaches the UCC driver opts."""
    from openvqe_tpu.config import VQEConfig

    cfg = VQEConfig(molecule="H2", taper=True)
    assert cfg.to_opts().get("taper") is True
    assert "taper" not in VQEConfig(molecule="H2").to_opts()


def test_fermionic_adapt_taper_parity():
    """fermionic_adapt with taper=True reproduces the untapered trajectory
    (energies + selected-op count) to f32 noise, 2 qubits smaller."""
    from openvqe_tpu.vqe import VQE

    outs = {}
    for taper in (False, True):
        it, _ = VQE.algorithm(
            "fermionic_adapt", "H4", "spin_complement_gsd", "JW", False,
            {"max_external_iterations": 2, "taper": taper}).execute()
        outs[taper] = it["energies"]
    np.testing.assert_allclose(outs[True], outs[False], rtol=0, atol=5e-6)


def test_taper_composes_with_mesh():
    """taper=True + mesh compose: EnergyUCC._minimize tapers first, then
    binds the sharded objective; the optimum matches the single-device
    untapered run."""
    from openvqe_tpu.algorithms.energy_ucc import EnergyUCC
    from openvqe_tpu.chem.frontend import compute_molecule
    from openvqe_tpu.ops.hamiltonian import (
        ElectronicStructureHamiltonian, convert_to_h_integrals)
    from openvqe_tpu.ops.transforms import transform_operator
    from openvqe_tpu.ops.uccsd import get_cluster_ops_and_init_guess
    from openvqe_tpu.parallel.sharded import make_mesh

    md = compute_molecule([("H", (0, 0, 0.85 * k)) for k in range(4)],
                          "sto-3g")
    hpq, hpqrs = convert_to_h_integrals(md.one_body_integrals,
                                        md.two_body_integrals)
    esh = ElectronicStructureHamiltonian(hpq, hpqrs, md.nuclear_repulsion)
    hsp = esh.to_spin("JW")
    n = hsp.nbqbits
    eps = [e for e in md.orbital_energies for _ in range(2)]
    ops, th0, hf = get_cluster_ops_and_init_guess(md.n_elec, [0] * n, eps,
                                                  hpqrs)
    gens = [transform_operator(op, "JW") * 1j for op in ops]

    eng = EnergyUCC()
    outs = {}
    for mesh in (None, make_mesh(4)):
        res = eng._minimize(hsp, gens, hf, np.asarray(th0, float),
                            "BFGS", 1e-6, [], mesh=mesh, taper=True)
        outs[mesh is None] = float(res.fun)
    assert outs[True] == pytest.approx(outs[False], abs=1e-6)
    assert outs[True] == pytest.approx(float(md.info["FCI"]), abs=5e-4)


def test_quccsd_taper_parity():
    """QUCCSD with taper=True reproduces the untapered optimum: the qubit
    excitations flip qubits in pairs per spin sector, so both Z2 parities
    survive and the whole QUCC manifold tapers exactly."""
    from openvqe_tpu.vqe import VQE

    outs = {}
    for taper in (False, True):
        _, res = VQE.algorithm("quccsd", "H2", "QUCCSD", "JW", False,
                               {"taper": taper}).execute()
        outs[taper] = (res["energies1_substracted_from_FCI"],
                       res["energies2_substracted_from_FCI"])
    np.testing.assert_allclose(outs[True], outs[False], rtol=0, atol=5e-6)


def test_qubit_adapt_taper_parity():
    """qubit_adapt with taper=True (same seeded pool) reproduces the
    untapered trajectory to f32 noise."""
    from openvqe_tpu.vqe import VQE

    outs = {}
    for taper in (False, True):
        it, _ = VQE.algorithm(
            "qubit_adapt", "H2", "singlet_gsd", "JW", False,
            {"max_external_iterations": 2, "taper": taper,
             "pool_seed": 7}).execute()
        outs[taper] = it["energies"]
    np.testing.assert_allclose(outs[True], outs[False], rtol=0, atol=5e-6)
