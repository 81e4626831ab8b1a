"""Native Li2FeSiO4 contextual-subspace derivation (component 25).

The full chain (116-basis-function RHF + active space + tapering + CS
projection) takes ~20 CPU minutes, so the derivation commits its output
as ``cs_hams_native.json`` (apps/quantum_batteries/li2fesio4.py --save);
these tests re-verify that artifact cheaply and pin the chain's
entry-point behavior."""

import json
import os

import numpy as np
import pytest

from openvqe_tpu.apps.quantum_batteries import li2fesio4 as li

_NATIVE = os.path.join(os.path.dirname(li.__file__), "cs_hams_native.json")


def test_geometry_matches_notebook():
    """CIF parse reproduces the reference notebook's cell contents
    (contextual_subspace.ipynb cells 5-8): composition and one spot-checked
    cartesian coordinate."""
    g = li.load_geometry()
    syms = [s for s, _ in g]
    assert len(g) == 16
    assert syms.count("Li") == 4 and syms.count("Fe") == 2
    assert syms.count("Si") == 2 and syms.count("O") == 8
    # first Li site: fractional (0.048157, 0.573157, 0.010972) through the
    # P2_1 lattice (a=5.1323, b=11.0373, c=6.2324, beta=91.307)
    x, y, z = g[0][1]
    assert abs(y - 0.573157 * 11.037342) < 1e-4
    assert abs(x - (0.048157 * 5.132302
                    + 0.010972 * 6.23237968 * np.cos(np.radians(91.30708)))
               ) < 1e-4


@pytest.mark.skipif(not os.path.exists(_NATIVE),
                    reason="derived artifact not present")
def test_native_artifact_consistent():
    """The committed derivation artifact: RHF converged near the reference
    mean-field scale, spectra re-diagonalize to the stored ground
    energies, and deltas vs the shipped pyscf/symmer Hamiltonians stay
    inside the documented convention window."""
    from openvqe_tpu.ops.pauli import PauliSum

    with open(_NATIVE) as f:
        art = json.load(f)
    info = art["info"]
    assert info["converged"]
    # reference chain: pyscf RHF ~ -3687.6, CCSD -3688.0463 (cs_vqe.py:17)
    assert abs(info["E_HF"] - -3687.55) < 0.5
    assert info["n_active_mos"] == 8 and info["n_active_electrons"] == 8
    for row in art["rows"]:
        q = row["qubits"]
        ham = PauliSum.from_dict(
            {k: complex(v) for k, v in art["hams"][str(q)].items()})
        e0 = float(np.linalg.eigvalsh(ham.to_matrix())[0])
        # the artifact ships real parts only (the reference does the same,
        # utils.py:41); dropping the ~1e-3 imaginary parts of the smallest
        # CS projections shifts the ground energies <= ~5e-4 Ha
        assert abs(e0 - row["E0_native"]) < 2e-3
        if "delta" in row:
            # round-4 per-cause budget (benchmarks/li2fesio4_conventions.py,
            # measured): the artifact chain (cart+atomSi, the only config
            # with a stable aufbau SCF solution) measures max |delta| 1.37;
            # the toggled conventions land at 0.98 (sph+molSi stationary
            # point) and 1.43 (cart+molSi, non-convergent DIIS).  The
            # dominant cause is the offline-unmatchable Fe STO-3G fit
            # (~0.5 Ha, PARITY.md); the bound pins the measured artifact
            # window (1.37 + margin) instead of the round-3 blanket 2.0.
            assert abs(row["delta"]) < 1.5, row
    # variational within the native chain: more qubits -> lower or equal
    es = [r["E0_native"] for r in sorted(art["rows"],
                                         key=lambda r: r["qubits"])]
    assert all(es[i + 1] <= es[i] + 1e-9 for i in range(len(es) - 1))
