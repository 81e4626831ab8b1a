"""6-31G Li-F rows (round-2 VERDICT item 7: the reference molecule table
runnable in both basis families).

No pyscf oracle offline, so the validation brackets each atomic
ground-term ROHF energy between the Hartree-Fock LIMIT (a strict lower
bound — any basis is variational) and a tight window above it (6-31G atoms
sit within ~60 mHa of the limit; a single mistyped digit in an exponent or
contraction costs far more), plus the strict variational ordering
E(6-31G) < E(STO-3G), plus a pinned LiH molecular energy as a regression.
"""

import numpy as np
import pytest

from openvqe_tpu.chem.frontend import compute_molecule

# (spin 2S, E_HF_limit [Ha]) per atom — standard numerical-HF values
ATOMS = {
    "Li": (1, -7.43273),
    "Be": (0, -14.57302),
    "B": (1, -24.52906),
    "C": (2, -37.68862),
    "N": (3, -54.40093),
    "O": (2, -74.80940),
    "F": (1, -99.40935),
}
WINDOW = 0.065     # Ha above the HF limit


@pytest.mark.parametrize("sym", sorted(ATOMS))
def test_atomic_631g_bracket(sym):
    spin, e_limit = ATOMS[sym]
    md = compute_molecule([(sym, (0.0, 0.0, 0.0))], "6-31g", spin=spin,
                          run_fci_flag=False)
    e = md.info["HF"]
    assert e_limit - 1e-6 < e < e_limit + WINDOW, (sym, e, e_limit)
    md_sto = compute_molecule([(sym, (0.0, 0.0, 0.0))], "sto-3g", spin=spin,
                              run_fci_flag=False)
    assert e < md_sto.info["HF"], (sym, e, md_sto.info["HF"])


def test_lih_631g_molecule():
    """LiH/6-31G at the reference molecule-table geometry (reference
    molecule_factory.py LIH r=1.45): HF+MP2+FCI run end to end; the HF
    energy is regression-pinned and below the STO-3G value."""
    geom = [("Li", (0, 0, 0)), ("H", (0, 0, 1.45))]
    md = compute_molecule(geom, "6-31g")
    e = md.info["HF"]
    assert abs(e - -7.97926) < 5e-3, e         # 6-31G LiH RHF
    md_sto = compute_molecule(geom, "sto-3g")
    assert e < md_sto.info["HF"]
    assert md.info["FCI"] < e                  # correlation lowers
    assert md.info["MP2"] < e


def test_h2o_631g_molecule():
    """H2O/6-31G at the reference molecule-table geometry
    (molecule_factory.py H2O row): bracketed by the HF limit and below
    STO-3G; MP2 lowers."""
    geom = [("O", (0.0, 0.0, 0.1173)), ("H", (0.0, 0.7572, -0.4692)),
            ("H", (0.0, -0.7572, -0.4692))]
    md = compute_molecule(geom, "6-31g", run_fci_flag=False)
    e = md.info["HF"]
    assert -76.07 < e < -75.90, e      # HF limit -76.066; 6-31G ~ -75.98
    md_sto = compute_molecule(geom, "sto-3g", run_fci_flag=False)
    assert e < md_sto.info["HF"]
    assert md.info["MP2"] < e
