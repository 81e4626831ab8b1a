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


def _dense_restriction_e0(h, enforced, n, rot=None):
    """Ground energy of (rot H rot^dag) restricted to the joint stabilizer
    eigenspace of ``enforced`` = [(key, sector)] — the semantics
    project_onto_subspace must reproduce exactly."""
    Hd = h.to_matrix()
    if rot is not None:
        Rd = rot.to_matrix()
        Hd = Rd @ Hd @ Rd.conj().T
    P = np.eye(Hd.shape[0], dtype=complex)
    for key, qv in enforced:
        G = cs._herm_unit(n, key).to_matrix()
        P = P @ (np.eye(Hd.shape[0]) + qv * G) / 2
    w, V = np.linalg.eigh(P)
    B = V[:, w > 0.5]
    return float(np.linalg.eigvalsh(B.conj().T @ Hd @ B)[0])


@pytest.fixture(scope="module")
def random_noncon_ham():
    """Interleaved-support Hamiltonian whose noncontextual generators share
    pivots after renumbering — the round-4 multi-stabilizer projection bug
    (stale original-index keys on the shrunken Hamiltonian) reproduced on
    exactly this shape."""
    rng = np.random.default_rng(5)
    n = 6
    strings = ["ZZIIII", "IIZZII", "IIIIZZ", "ZIZIZI", "XXIIII", "IIXXII",
               "YYIIII", "ZZZZII", "IZIZIZ", "XIXIII", "IIYIYI", "ZIIZII",
               "IXXIII", "IIIXXI"]
    h = PauliSum.identity(n, 0.3)
    for s in strings:
        h = h + PauliSum.from_term(n, float(rng.normal()), s)
    return h, n


def test_projection_equals_dense_restriction(random_noncon_ham):
    """The projected CS Hamiltonian's ground energy must EQUAL the dense
    restriction P H P of H to the joint stabilizer eigenspace (anticommuting
    terms have exactly zero block there), at every target qubit count."""
    h, n = random_noncon_ham
    ctx = cs.ContextualSubspace.build(h)
    for q in range(2, n + 1):
        e = float(np.linalg.eigvalsh(
            ctx.project_onto_subspace(q).to_matrix())[0])
        eref = _dense_restriction_e0(h, ctx._enforced(q), n)
        assert e == pytest.approx(eref, abs=1e-10), q


def test_lcu_unitary_partitioning_matches_dense(random_noncon_ham):
    """clique_strategy='lcu' (symmer unitary_partitioning_method='LCU',
    contextual_subspace.ipynb cell 36): R is unitary, R A R^dag lands on
    the dominant clique representative, and the projected energies equal
    the dense restriction of R H R^dag with the clique stabilizer enforced
    first."""
    h, n = random_noncon_ham
    ctx = cs.ContextualSubspace.build(h, clique_strategy="lcu")
    assert ctx.solution.r is not None
    r_lcu, rep_w, s = ctx._clique()
    Rd = r_lcu.to_matrix()
    assert np.allclose(Rd @ Rd.conj().T, np.eye(Rd.shape[0]), atol=1e-10)
    for q in range(2, n):
        e = float(np.linalg.eigvalsh(
            ctx.project_onto_subspace(q).to_matrix())[0])
        eref = _dense_restriction_e0(
            h, [(rep_w, s)] + ctx._enforced(q), n, rot=r_lcu)
        assert e == pytest.approx(eref, abs=1e-10), q
    # the clique channel carries noncontextual correlation the
    # stabilizer-only projection cannot: strictly lower CS energy here
    ctx0 = cs.ContextualSubspace.build(h)
    e_lcu = float(np.linalg.eigvalsh(
        ctx.project_onto_subspace(4).to_matrix())[0])
    e_none = float(np.linalg.eigvalsh(
        ctx0.project_onto_subspace(4).to_matrix())[0])
    assert e_lcu < e_none - 0.1


def test_lcu_variational_on_h4(h4_jw):
    hsp, md = h4_jw
    ctx = cs.ContextualSubspace.build(hsp, clique_strategy="lcu")
    fci = md.info["FCI"]
    prev = None
    for q in (2, 4, 6, 8):
        h_cs = ctx.project_onto_subspace(q)
        e0 = float(np.linalg.eigvalsh(h_cs.to_matrix())[0])
        assert e0 >= fci - 1e-9
        prev = e0
    assert prev == pytest.approx(fci, abs=1e-9)    # q = n is exact


def test_derivation_loop_shapes(h4_jw):
    hsp, _ = h4_jw
    hams = cs.derive_contextual_hamiltonians(hsp, range(2, 9))
    assert sorted(hams) == list(range(2, 9))
    for q, h in hams.items():
        assert h.nbqbits == q
        assert h.is_hermitian()
