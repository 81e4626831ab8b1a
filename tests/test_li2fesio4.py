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
    # round-5 per-stage attribution (benchmarks/li2fesio4_stages.py /
    # li2fesio4_stages.json, measured against the reference notebook's own
    # printed intermediates): the q=6-8 deltas (+0.385) are ~entirely
    # UPSTREAM — the native full-cell RHF sits +0.437 Ha above the
    # notebook's pyscf value (the offline-unmatchable Fe STO-3G fit;
    # cell 18 oracle) while the native CS stage contributes <= 0.034 Ha
    # (its CS error vs its own 14q FCI).  The large negative deltas at
    # q=2-4 measure the SHIPPED chain's own CS projection error (its
    # CS(2) ground sits 2.18 Ha above its CS(8)), not a native defect.
    # The LCU-vs-stabilizer partitioning convention was implemented and
    # measured: <= 1e-3 Ha here (r = [-1, 0] makes the rotation ~I).
    MEASURED_DELTA = {2: -1.7935, 3: -1.4867, 4: -1.4532, 5: -0.1248,
                      6: 0.3859, 7: 0.3854, 8: 0.3853}
    e_hf = info["E_HF"]
    for row in art["rows"]:
        q = row["qubits"]
        ham = PauliSum.from_dict(
            {k: complex(v) for k, v in art["hams"][str(q)].items()})
        e0 = float(np.linalg.eigvalsh(ham.to_matrix())[0])
        # the artifact ships real parts only (the reference does the same,
        # utils.py:41); dropping the ~1e-3 imaginary parts of the smallest
        # CS projections shifts the ground energies <= ~5e-4 Ha
        assert abs(e0 - row["E0_native"]) < 2e-3
        # native CS-stage budget: every projection stays within 0.034 Ha
        # of the active-space FCI (which itself sits 0.0333 below E_HF)
        assert e_hf - 0.034 < row["E0_native"] < e_hf + 1e-6, row
        if "delta" in row:
            assert row["delta"] == pytest.approx(MEASURED_DELTA[q],
                                                 abs=0.02), row
    # variational within the native chain: more qubits -> lower or equal
    es = [r["E0_native"] for r in sorted(art["rows"],
                                         key=lambda r: r["qubits"])]
    assert all(es[i + 1] <= es[i] + 1e-9 for i in range(len(es) - 1))


def test_stage_attribution_artifact():
    """The committed per-stage delta record (round-4 VERDICT item 4):
    stage oracles from the reference notebook's printed outputs hold for
    the native chain — term counts, tapering generators/sector, taper
    exactness — and the upstream/CS split is what PARITY.md documents."""
    stages_path = os.path.join(os.path.dirname(li.__file__), os.pardir,
                               os.pardir, os.pardir, "benchmarks",
                               "li2fesio4_stages.json")
    if not os.path.exists(stages_path):
        pytest.skip("stage artifact not present")
    with open(stages_path) as f:
        rows = {("%s|%s" % (r["stage"], r.get("qubits", ""))): r
                for r in json.load(f)}
    s0 = rows["S0 full-cell RHF|"]
    assert s0["delta"] == pytest.approx(0.4372, abs=0.01)
    s1 = rows["S1 active-space 16q JW|"]
    assert s1["n_terms"] in (5792, 5793)     # notebook: 5793 (openfermion)
    assert abs(s1["hf_expectation_minus_EHF"]) < 1e-8
    s2 = rows["S2 Z2 taper 14q|"]
    assert s2["span_matches_notebook_ZIZI_IZIZ"]
    assert s2["sector_on_notebook_generators"] == [1, 1]
    assert s2["n_qubits_tapered"] == 14
    assert abs(s2["taper_exactness_delta"]) < 1e-9
    for q in (2, 3, 4, 5, 6, 7, 8):
        for strat in ("none", "lcu"):
            r = rows[f"S3 CS ({strat})|{q}"]
            assert 0 <= r["cs_error_vs_14q"] < 0.034, r
