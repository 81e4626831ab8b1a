"""Converged fermionic ADAPT-VQE at scale (round-4 VERDICT item 7).

The repo's scale rows prove per-iteration cost (1-3 outers); the
reference's actual product is the CONVERGED trajectory
(fermionic_adapt_vqe.py:511-517 stops at gradient norm < threshold or
stagnation; its demo notebook converges H4 to 2e-9 of FCI).  This script
runs tapered fermionic ADAPT on a >=22-qubit system to the reference
convergence criterion and prints the full per-iteration trajectory
(energy, |E - CCSD|, gradient norm, CNOT count, wall-clock per phase).

Default: H13+/STO-3G — a 26-qubit system tapered to 24 qubits (exact
ansatz-compatible Z2 taper), |E - CCSD| against the native spin-orbital
CCSD (chem/ccsd.py) in the same space.

Usage: python benchmarks/bench_adapt_converged.py [n_atoms] [max_iters]
       (default 13 35 — the reference's max_external_iterations)
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


def run_converged(n_atoms: int = 13, max_iters: int = 35,
                  threshold: float = 1e-2, verbose: bool = True,
                  log_path: str | None = None) -> dict:
    """``log_path`` (or env OVQE_ADAPT_LOG) persists the per-iteration
    JSONL records as the run progresses, so a wall-clock-killed long run
    still yields its trajectory."""
    import os
    import tempfile

    log_path = log_path or os.environ.get("OVQE_ADAPT_LOG")

    import numpy as np

    from openvqe_tpu.algorithms.adapt import fermionic_adapt_vqe
    from openvqe_tpu.chem.ccsd import ccsd
    from openvqe_tpu.chem.frontend import compute_molecule
    from openvqe_tpu.ops.generators import uccsd as uccsd_gen
    from openvqe_tpu.ops.hamiltonian import (
        ElectronicStructureHamiltonian, convert_to_h_integrals)
    from openvqe_tpu.ops.tapering import taper_vqe_problem

    charge = n_atoms % 2
    t0 = time.time()
    md = compute_molecule(
        [("H", (0, 0, 1.0 * k)) for k in range(n_atoms)], "sto-3g",
        charge=charge, spin=0, run_fci_flag=False)
    e_corr, _t1, _t2 = ccsd(md.one_body_integrals, md.two_body_integrals,
                            md.orbital_energies, md.n_elec)
    e_ccsd = float(md.info["HF"]) + float(e_corr)
    hpq, hpqrs = convert_to_h_integrals(md.one_body_integrals,
                                        md.two_body_integrals)
    hsp = ElectronicStructureHamiltonian(
        hpq, hpqrs, md.nuclear_repulsion).to_spin("JW")
    n_sys = hsp.nbqbits
    esh = ElectronicStructureHamiltonian(hpq, hpqrs, md.nuclear_repulsion)
    _, _, pool, theta0, hf_init = uccsd_gen(
        esh, md.n_elec, [0] * n_sys,
        [e for e in md.orbital_energies for _ in range(2)], "JW")
    hsp, pool, hf_init, _tap = taper_vqe_problem(hsp, list(pool), hf_init)
    setup_s = time.time() - t0

    ephemeral = log_path is None
    if ephemeral:
        with tempfile.NamedTemporaryFile(mode="r", suffix=".jsonl",
                                         delete=False) as tf:
            log_path = tf.name
    try:
        t1 = time.time()
        iterations, result = fermionic_adapt_vqe(
            pool, hsp, hf_init, n_max_grads=1, fci=e_ccsd,
            optimizer="BFGS", tolerance=1e-6, type_conver="norm",
            threshold_needed=threshold,
            max_external_iterations=max_iters,
            fidelity_max_qubits=0, verbose=verbose, log_path=log_path)
        wall = time.time() - t1
        with open(log_path) as fh:
            records = [json.loads(line) for line in fh if line.strip()]
    finally:
        if ephemeral:
            os.unlink(log_path)

    timing = {r["iteration"]: r for r in records if "t_screen_s" in r}
    traj = []
    for i, e in enumerate(iterations["energies"]):
        t = timing.get(i, {})
        traj.append({
            "iteration": i, "energy": e,
            "abs_E_minus_CCSD": abs(e - e_ccsd),
            "norm": iterations["norms"][i],
            "max_gradient": iterations["Max_gradients"][i],
            "CNOTs": iterations["CNOTs"][i],
            "t_screen_s": t.get("t_screen_s"),
            "t_optimize_s": t.get("t_optimize_s"),
            "opt_nfev": t.get("opt_nfev"),
        })
    # the loop fills `result` on convergence OR stagnation; "converged"
    # here means the REFERENCE criterion (final pool-gradient norm below
    # threshold), so stagnation-terminated runs are labeled honestly
    final_norm = abs(traj[-1]["norm"]) if traj else None
    converged = bool(final_norm is not None and final_norm < threshold)
    return {
        "system": f"H{n_atoms}{'+' if charge else ''}",
        "system_qubits": n_sys, "qubits": hsp.nbqbits, "tapered": True,
        "pool_ops": len(pool), "h_terms": len(hsp),
        "HF": float(md.info["HF"]), "MP2": float(md.info["MP2"]),
        "CCSD": e_ccsd,
        "threshold": threshold, "max_iters": max_iters,
        "converged": converged, "final_norm": final_norm,
        "final_energy": traj[-1]["energy"] if traj else None,
        "final_abs_E_minus_CCSD": traj[-1]["abs_E_minus_CCSD"] if traj
        else None,
        "n_outer_iterations": len(traj),
        "setup_s": round(setup_s, 1), "adapt_wall_s": round(wall, 1),
        "trajectory": traj,
        "result": {k: v for k, v in result.items() if k != "parameters"},
    }


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_atoms = int(args[0]) if args else 13
    iters = int(args[1]) if len(args) > 1 else 35
    r = run_converged(n_atoms, iters, verbose=True)
    print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
