"""CCSD, point-group symmetry labeling, and pool-screening tests
(reference components parameter_guess.py / orbital_symmetry.py /
main_single_double.py / main_triple.py)."""

import numpy as np
import pytest

from openvqe_tpu.chem.ccsd import ccsd
from openvqe_tpu.chem.frontend import compute_molecule


def test_ccsd_exact_for_two_electrons():
    md = compute_molecule([("H", (0, 0, 0)), ("H", (0, 0, 0.7414))], "sto-3g")
    ec, t1, t2 = ccsd(md.one_body_integrals, md.two_body_integrals,
                      md.orbital_energies, 2)
    assert abs(md.info["HF"] + ec - md.info["FCI"]) < 1e-10


def test_ccsd_h4_close_to_fci():
    md = compute_molecule([("H", (0, 0, 0.85 * k)) for k in range(4)], "sto-3g")
    ec, t1, t2 = ccsd(md.one_body_integrals, md.two_body_integrals,
                      md.orbital_energies, 4)
    assert abs(md.info["HF"] + ec - md.info["FCI"]) < 5e-5


@pytest.fixture(scope="module")
def lih_sym():
    from openvqe_tpu.ops.screening import OrbSym
    return OrbSym("LiH", 4)


def test_orbital_irreps_lih(lih_sym):
    ids = lih_sym.label_orb_symm_id
    # sigma orbitals totally symmetric; the degenerate pi pair carries two
    # distinct non-trivial irreps
    assert ids[0] == ids[1] == ids[2] == 0
    pi = sorted(ids[3:5])
    assert pi[0] != 0 and pi[1] != 0 and pi[0] != pi[1]
    assert np.array_equal(lih_sym.HF_irrep, np.array([0]))


def test_hf_sym_preserves_symmetric_ops(lih_sym):
    from openvqe_tpu.ops.generators import generate_cluster_ops_without_mp2
    from openvqe_tpu.ops.screening import HF_sym, reverse_according_to_n_occ
    ops = generate_cluster_ops_without_mp2(6, 4)
    kept = HF_sym("LiH", 4, ops)
    assert 0 < len(kept) < len(ops)
    # every kept op must map the HF determinant to the HF irrep
    for op in kept:
        q = reverse_according_to_n_occ(4, list(op.terms[0].qbits))
        half = len(q) // 2
        rep = lih_sym.rep_after_excitations(q[:half], q[half:])
        assert np.array_equal(rep, lih_sym.HF_irrep)


def test_main_single_double_and_triple():
    """Screening must strictly reduce the pools and be deterministic within
    a run.  Exact counts are NOT asserted: LiH has a degenerate pi pair, so
    which near-zero amplitudes survive a raw threshold depends on the
    arbitrary orbital mixing within the degenerate block (the reference
    inherits the same fragility from pyscf's orbital conventions)."""
    from openvqe_tpu.mains.main_single_double import generate as gen_sd
    from openvqe_tpu.mains.main_triple import generate as gen_t
    from openvqe_tpu.ops.generators import generate_cluster_ops_without_mp2
    from openvqe_tpu.ops.screening import generate_cluster_ops_with_mp2

    unscreened = generate_cluster_ops_with_mp2("LiH", mp2_thresh=-1e30)
    ops = gen_sd("LiH", 4, 6, apply_HF_sym=True, apply_ccsd_check=True,
                 use_mp2=True, CCSD_THRESH=1e-8, MP2_THRESH=1e-8,
                 apply_transform=True)
    assert 0 < len(ops) < len(unscreened)
    ops_again = gen_sd("LiH", 4, 6, apply_HF_sym=True, apply_ccsd_check=True,
                       use_mp2=True, CCSD_THRESH=1e-8, MP2_THRESH=1e-8,
                       apply_transform=True)
    assert len(ops_again) == len(ops)  # deterministic within a process

    full_triples = gen_t("LiH", 4, 6, apply_HF_sym=False, apply_transform=False)
    ops3 = gen_t("LiH", 4, 6, apply_HF_sym=True, apply_transform=True)
    assert 0 < len(ops3) < len(full_triples)
