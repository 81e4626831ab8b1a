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
