"""Per-convention delta measurement for the native Li2FeSiO4 CS chain.

Round-3 VERDICT item 3 asked for the 0.18-1.36 Ha native-vs-shipped gap
to be decomposed per basis convention.  This script re-derives the CS
Hamiltonians with the conventions toggled:

  cart+molSi : cartesian d shells, published molecular Si zetas
               (the DEFAULT chain and the committed cs_hams_native.json)
  sph+molSi  : pure-spherical-d projection, molecular Si zetas
               (the pyscf convention for the d shells)
  sph+atomSi : spherical-d projection, best-atom Si zetas

ROUND-4 MEASURED RESULT (run on this image, logs in BENCHMARKS.md):

  cart+molSi : RHF -3687.546 Ha CONVERGED; CS deltas -1.36..+0.62,
               max |delta| 1.37, mean 0.76
  sph+molSi  : the SCF's nearest stationary point is ~-3687.02 Ha — ODA
               (chem/scf.rhf oda_init) plateaus there monotonically and
               plain/level-shifted DIIS oscillate around it; CS deltas
               at that point: -0.85..+0.98, max 0.98, mean 0.81

i.e. the spherical projection does NOT close the gap for this package's
Fe basis: the two cartesian-d s-combinations carry ~0.5 Ha of valence
weight that compensates the best-atom-Fe-zeta / regenerated-3d-row fit
(pyscf's spherical STO-3G reference sits at ~-3687.6).  The dominant
per-cause term is therefore the Fe basis fit itself, not the d-shell
convention, and the default chain stays cartesian (li2fesio4.py module
docstring).

Run:  python benchmarks/li2fesio4_conventions.py [cart+molSi|sph+molSi|sph+atomSi]
(each run is ~20 CPU minutes; no TPU involved)
"""

import json
import sys

import numpy as np


def run(config: str):
    from openvqe_tpu.chem import basis as bas
    from openvqe_tpu.apps.quantum_batteries import li2fesio4 as li
    from openvqe_tpu.apps.quantum_batteries.utils import load_cs_hams

    spherical = config.startswith("sph")
    if config.endswith("atomSi"):
        # force the best-atom Si zetas (round-3 behavior) by removing the
        # published molecular entry for this process
        bas._STO3G_ZETA = {k: v for k, v in bas._STO3G_ZETA.items()
                           if k != "Si"}
    save = None
    if config == "cart+molSi":
        # the default configuration IS the shipped artifact — regenerate it
        import os
        save = os.path.join(os.path.dirname(li.__file__),
                            "cs_hams_native.json")
    out = li.compare(3, spherical=spherical, save_path=save)
    shipped = load_cs_hams()
    rows = []
    for row in out["rows"]:
        q = row["qubits"]
        r = {"config": config, "qubits": q,
             "E0_native": row["E0_native"]}
        if q in shipped:
            r["delta"] = row["delta"]
        rows.append(r)
        print(json.dumps(r), flush=True)
    deltas = [abs(r["delta"]) for r in rows if "delta" in r]
    summary = {"config": config, "E_HF": out["info"]["E_HF"],
               "converged": out["info"]["converged"],
               "max_abs_delta": max(deltas), "mean_abs_delta":
               float(np.mean(deltas))}
    print(json.dumps(summary), flush=True)
    return summary


if __name__ == "__main__":
    cfg = sys.argv[1] if len(sys.argv) > 1 else "cart+molSi"
    assert cfg in ("cart+molSi", "sph+molSi", "sph+atomSi"), cfg
    run(cfg)
