"""Per-convention delta measurement for the native Li2FeSiO4 CS chain.

Round-3 VERDICT item 3: the native derivation differed from the shipped
(pyscf/symmer-derived) cs_hams.json by 0.18-1.36 Ha, attributed to basis
conventions.  This script MEASURES each convention's contribution by
re-deriving the CS Hamiltonians with the conventions toggled one at a
time:

  cart+atomSi : cartesian d shells, best-atom Si zetas (round-3 default;
                matches the committed round-3 artifact)
  sph+atomSi  : spherical-d projection, best-atom Si zetas
  sph+molSi   : spherical-d projection, published molecular Si zetas
                (round-4 default = what li2fesio4.py now ships)

For each config it prints one JSON row per CS qubit count with the
derived ground energy and the delta vs the shipped Hamiltonian.  The
results are pinned in tests/test_li2fesio4.py and summarized in
PARITY.md.

Run:  python benchmarks/li2fesio4_conventions.py [cart+atomSi|sph+atomSi|sph+molSi]
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
    out = li.compare(3, spherical=spherical)
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
               "max_abs_delta": max(deltas), "mean_abs_delta":
               float(np.mean(deltas))}
    print(json.dumps(summary), flush=True)
    return summary


if __name__ == "__main__":
    cfg = sys.argv[1] if len(sys.argv) > 1 else "sph+molSi"
    assert cfg in ("cart+atomSi", "sph+atomSi", "sph+molSi"), cfg
    run(cfg)
