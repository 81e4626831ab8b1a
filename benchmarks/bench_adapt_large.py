"""Large-system fermionic ADAPT-VQE benchmark — exercises the STREAMING
pool-gradient screen + streaming objectives end to end at 21+ qubits
(no reference analog: the reference's sparse ADAPT rebuilds per-operator
CSR matvecs and tops out near ~20 qubits).

Usage: python benchmarks/bench_adapt_large.py [n_atoms] [iters]  (default 11 3)
Odd chains run as closed-shell cations (pass --neutral for the ROHF doublet).
``run_adapt_bench`` is the importable entry bench.py uses for the
driver-captured ADAPT row (returns per-outer-iteration screen/optimize
splits so the warm iteration is separable from the compile-laden first).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ovqe_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def run_adapt_bench(n_atoms: int = 13, iters: int = 3, charge=None,
                    spin: int = 0, taper: bool = False,
                    verbose: bool = False) -> dict:
    """Fermionic ADAPT on the H-chain cation/neutral at n_atoms, optionally
    Z2-tapered; returns setup + per-outer-iteration timing splits (screen /
    bind / optimize, from the loop's own RunLogger records)."""
    import os
    import tempfile

    import numpy as np                                          # noqa: F401

    from openvqe_tpu.algorithms.adapt import fermionic_adapt_vqe
    from openvqe_tpu.chem.frontend import compute_molecule
    from openvqe_tpu.ops.generators import uccsd as uccsd_gen
    from openvqe_tpu.ops.hamiltonian import (
        ElectronicStructureHamiltonian, convert_to_h_integrals)

    if charge is None:
        charge = n_atoms % 2
    t0 = time.time()
    md = compute_molecule(
        [("H", (0, 0, 1.0 * k)) for k in range(n_atoms)], "sto-3g",
        charge=charge, spin=spin, run_fci_flag=False)
    hpq, hpqrs = convert_to_h_integrals(md.one_body_integrals,
                                        md.two_body_integrals)
    hsp = ElectronicStructureHamiltonian(
        hpq, hpqrs, md.nuclear_repulsion).to_spin("JW")
    n_sys = hsp.nbqbits
    esh = ElectronicStructureHamiltonian(hpq, hpqrs, md.nuclear_repulsion)
    _, _, pool, theta0, hf_init = uccsd_gen(
        esh, md.n_elec, [0] * n_sys,
        [e for e in md.orbital_energies for _ in range(2)], "JW")
    if taper:
        # exact ansatz-compatible Z2 taper: the whole ADAPT loop (screens +
        # optimizations) runs 2 qubits smaller (ops/tapering)
        from openvqe_tpu.ops.tapering import taper_vqe_problem
        hsp, pool, hf_init, _tap = taper_vqe_problem(hsp, list(pool),
                                                     hf_init)
    n = hsp.nbqbits
    setup_s = time.time() - t0

    with tempfile.NamedTemporaryFile(mode="r", suffix=".jsonl",
                                     delete=False) as tf:
        log_path = tf.name
    try:
        t1 = time.time()
        iterations, result = fermionic_adapt_vqe(
            pool, hsp, hf_init, n_max_grads=1, fci=None,
            optimizer="BFGS", tolerance=1e-4, type_conver="norm",
            threshold_needed=1e-2, max_external_iterations=iters,
            fidelity_max_qubits=0, verbose=verbose, log_path=log_path)
        wall = time.time() - t1
        with open(log_path) as fh:
            records = [json.loads(line) for line in fh if line.strip()]
    finally:
        os.unlink(log_path)
    per_iter = [
        {"iteration": r["iteration"], "energy": r["energy"],
         "t_screen_s": r["t_screen_s"], "t_optimize_s": r["t_optimize_s"],
         "t_outer_s": round(r["t_screen_s"] + r["t_bind_s"]
                            + r["t_optimize_s"], 2),
         "opt_nfev": r["opt_nfev"], "norm": r["norm"]}
        for r in records if "t_screen_s" in r]
    return {
        "system": f"H{n_atoms}{'+' if charge else ''}",
        "system_qubits": n_sys, "qubits": n, "tapered": taper,
        "pool_ops": len(pool), "h_terms": len(hsp),
        "setup_s": round(setup_s, 1), "wall_s": round(wall, 1),
        "outer_iterations": per_iter,
        "energies": iterations["energies"],
    }


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_atoms = int(args[0]) if args else 11
    iters = int(args[1]) if len(args) > 1 else 3
    neutral = "--neutral" in sys.argv
    r = run_adapt_bench(
        n_atoms, iters,
        charge=0 if neutral else n_atoms % 2,
        spin=n_atoms % 2 if neutral else 0,
        taper="--taper" in sys.argv, verbose=True)
    print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
