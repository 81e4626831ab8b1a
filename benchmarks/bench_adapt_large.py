"""Large-system fermionic ADAPT-VQE benchmark — exercises the STREAMING
pool-gradient screen + streaming objectives end to end at 21+ qubits
(no reference analog: the reference's sparse ADAPT rebuilds per-operator
CSR matvecs and tops out near ~20 qubits).

Usage: python benchmarks/bench_adapt_large.py [n_atoms] [iters]  (default 11 3)
Odd chains run as closed-shell cations (pass --neutral for the ROHF doublet).
"""

from __future__ import annotations

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ovqe_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    import numpy as np

    from openvqe_tpu.chem.frontend import compute_molecule
    from openvqe_tpu.ops.generators import uccsd as uccsd_gen
    from openvqe_tpu.ops.hamiltonian import (
        ElectronicStructureHamiltonian, convert_to_h_integrals)
    from openvqe_tpu.algorithms.adapt import fermionic_adapt_vqe

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_atoms = int(args[0]) if args else 11
    iters = int(args[1]) if len(args) > 1 else 3
    neutral = "--neutral" in sys.argv
    charge = 0 if neutral else n_atoms % 2
    spin = n_atoms % 2 if neutral else 0

    t0 = time.time()
    md = compute_molecule(
        [("H", (0, 0, 1.0 * k)) for k in range(n_atoms)], "sto-3g",
        charge=charge, spin=spin, run_fci_flag=False)
    hpq, hpqrs = convert_to_h_integrals(md.one_body_integrals,
                                        md.two_body_integrals)
    hsp = ElectronicStructureHamiltonian(
        hpq, hpqrs, md.nuclear_repulsion).to_spin("JW")
    n = hsp.nbqbits
    esh = ElectronicStructureHamiltonian(hpq, hpqrs, md.nuclear_repulsion)
    # UCCSD pool (the reference's uccsd generator family)
    _, _, pool, theta0, hf_init = uccsd_gen(
        esh, md.n_elec, [0] * n,
        [e for e in md.orbital_energies for _ in range(2)], "JW")
    if "--taper" in sys.argv:
        # exact ansatz-compatible Z2 taper: the whole ADAPT loop (screens +
        # optimizations) runs 2 qubits smaller (ops/tapering)
        from openvqe_tpu.ops.tapering import taper_vqe_problem
        hsp, pool, hf_init, _tap = taper_vqe_problem(hsp, list(pool), hf_init)
        n = hsp.nbqbits
    setup_s = time.time() - t0
    print(json.dumps({"system": f"H{n_atoms}{'+' if charge else ''}",
                      "qubits": n, "pool_ops": len(pool),
                      "h_terms": len(hsp), "setup_s": round(setup_s, 1),
                      "tapered": "--taper" in sys.argv}),
          flush=True)

    t1 = time.time()
    iterations, result = fermionic_adapt_vqe(
        pool, hsp, hf_init, n_max_grads=1, fci=None,
        optimizer="BFGS", tolerance=1e-4, type_conver="norm",
        threshold_needed=1e-2, max_external_iterations=iters,
        fidelity_max_qubits=0, verbose=True)
    wall = time.time() - t1
    print(json.dumps({
        "adapt_outer_iterations": len(iterations["energies"]),
        "wall_s": round(wall, 1),
        "s_per_outer_iteration": round(wall / max(
            1, len(iterations["energies"])), 1),
        "energies": iterations["energies"],
        "norms": [float(x) for x in iterations["norms"]],
    }), flush=True)


if __name__ == "__main__":
    main()
