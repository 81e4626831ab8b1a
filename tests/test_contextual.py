"""Contextual-subspace machinery vs dense diagonalization.

The strongest check: a noncontextual Hamiltonian is classically solvable —
the Kirby-Love closed-form optimum must EQUAL the true ground energy of the
selected noncontextual sub-Hamiltonian (validates every phase/sign in the
clique factorization).  The projection must be exact with zero stabilizers
and variational (>= FCI) at every target qubit count.
"""

import numpy as np
import pytest

from openvqe_tpu.chem.frontend import compute_molecule
from openvqe_tpu.ops import contextual as cs
from openvqe_tpu.ops.hamiltonian import (
    ElectronicStructureHamiltonian,
    convert_to_h_integrals,
)
from openvqe_tpu.ops.pauli import PauliSum


@pytest.fixture(scope="module")
def h4_jw():
    md = compute_molecule([("H", (0, 0, 0.85 * k)) for k in range(4)],
                          "sto-3g", run_fci_flag=True)
    hpq, hpqrs = convert_to_h_integrals(md.one_body_integrals,
                                        md.two_body_integrals)
    hsp = ElectronicStructureHamiltonian(
        hpq, hpqrs, md.nuclear_repulsion).to_spin("JW")
    return hsp, md


def test_split_is_noncontextual_and_partitions(h4_jw):
    hsp, md = h4_jw
    st = cs.noncontextual_split(hsp)
    assert cs.is_noncontextual(st.selected)
    assert len(st.selected) + len(st.remainder) == len(hsp)
    assert len(st.cliques) >= 1          # captured off-diagonal weight


def test_classical_optimum_equals_noncontextual_ground(h4_jw):
    hsp, md = h4_jw
    st = cs.noncontextual_split(hsp)
    sol = cs.noncontextual_energy(hsp, structure=st)

    noncon = PauliSum(hsp.nbqbits,
                      {k: hsp._terms[k] for k in st.selected},
                      hsp.constant_coeff)
    w = np.linalg.eigvalsh(noncon.to_matrix())
    assert sol.energy == pytest.approx(float(w[0]), abs=1e-8)
    # the noncontextual energy is itself a decent classical estimate
    assert sol.energy <= md.info["HF"] + 1e-6


def test_projection_exact_at_full_and_variational(h4_jw):
    hsp, md = h4_jw
    ctx = cs.ContextualSubspace.build(hsp)
    n = hsp.nbqbits
    fci = md.info["FCI"]
    errors = {}
    for q in range(2, n + 1):
        h_cs = ctx.project_onto_subspace(q)
        assert h_cs.nbqbits == q
        e0 = float(np.linalg.eigvalsh(h_cs.to_matrix())[0])
        # restriction of H to a stabilizer subspace: variational
        assert e0 >= fci - 1e-9
        errors[q] = e0 - fci
    assert errors[n] == pytest.approx(0.0, abs=1e-9)   # exact, no projection
    # quantum corrections help: more qubits -> no worse, and notably better
    # than the classical noncontextual estimate by the top of the range
    assert errors[n - 1] <= errors[2] + 1e-9
    assert errors[n - 2] < 0.05


def test_derivation_loop_shapes(h4_jw):
    hsp, _ = h4_jw
    hams = cs.derive_contextual_hamiltonians(hsp, range(2, 9))
    assert sorted(hams) == list(range(2, 9))
    for q, h in hams.items():
        assert h.nbqbits == q
        assert h.is_hermitian()
