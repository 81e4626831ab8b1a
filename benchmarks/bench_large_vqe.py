"""Large-system VQE iteration benchmark (hydrogen chains, UCCSD).

One VQE iteration = one energy + one exact reversible-adjoint gradient over
the full UCCSD ansatz (the optimizer consumes exactly this per BFGS step).
Reference-scale analog: (n_params + 1) full circuit simulations per
iteration through a rebuilt myQLM circuit (get_energy_ucc.py:158-175).

Usage:
    python benchmarks/bench_large_vqe.py [n_atoms ...]   (default: 8 10)
    python benchmarks/bench_large_vqe.py CO2 --taper     (reference-table
    molecules by name; CO2 = full 30-qubit space, 28q tapered)
    python benchmarks/bench_large_vqe.py H2O/6-31g       (name/basis
    override — e.g. the double-zeta H2O at 26 qubits)

Prints one JSON line per system:
    {"system": "H8", "qubits": 16, "h_terms": ..., "h_groups": ...,
     "ops": ..., "s_per_iteration": ..., "energy": ...}
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (standalone runs)

import json
import sys
import time


def bench_chain(n_atoms, spacing: float = 1.0, repeats: int = 3,
                charge: int = 0, taper: bool = False,
                opt_maxiter: int = 0):
    """Hydrogen chain H_{n_atoms} (charge +1 for odd chains keeps the RHF
    reference closed-shell — e.g. H13+ is the 26-qubit row).  ``taper``
    removes the ansatz-compatible Z2 symmetries (alpha/beta parity: 2
    qubits) from the WHOLE problem first (ops/tapering.taper_vqe_problem
    — exact: same variational manifold, same minimum), so e.g. the
    30-qubit H15+ runs FULL iterations on one chip at 28-qubit cost."""
    import jax.numpy as jnp
    import numpy as np

    from openvqe_tpu.chem.frontend import compute_molecule
    from openvqe_tpu.ops.hamiltonian import (
        ElectronicStructureHamiltonian,
        convert_to_h_integrals,
    )
    from openvqe_tpu.ops.transforms import transform_operator
    from openvqe_tpu.ops.uccsd import get_cluster_ops_and_init_guess
    from openvqe_tpu.sim.objective import VQEObjective

    t_setup = time.time()
    if isinstance(n_atoms, str):
        from openvqe_tpu.models.molecules import get_molecule
        name, _, basis = n_atoms.partition("/")
        spec = get_molecule(name)
        md = compute_molecule(spec.geometry, basis or spec.basis,
                              spec.spin, spec.charge, run_fci_flag=False)
        label = n_atoms
    else:
        md = compute_molecule(
            [("H", (0, 0, spacing * k)) for k in range(n_atoms)], "sto-3g",
            charge=charge, run_fci_flag=False)
        label = f"H{n_atoms}" + ("+" if charge == 1 else "")
    hpq, hpqrs = convert_to_h_integrals(md.one_body_integrals,
                                        md.two_body_integrals)
    hsp = ElectronicStructureHamiltonian(
        hpq, hpqrs, md.nuclear_repulsion).to_spin("JW")
    n = hsp.nbqbits
    eps_full = [e for e in md.orbital_energies for _ in range(2)]
    cluster_ops, theta0, hf_init = get_cluster_ops_and_init_guess(
        md.n_elec, [0] * n, eps_full, hpqrs)
    gens = [transform_operator(op, "JW") * 1j for op in cluster_ops]

    n_orig = n
    if taper:
        from openvqe_tpu.ops.tapering import taper_vqe_problem
        hsp, gens, hf_init, _tap = taper_vqe_problem(hsp, gens, hf_init)
        n = hsp.nbqbits

    obj = VQEObjective(hsp)
    bound = obj.bind(gens, hf_init)
    theta = np.asarray(theta0, dtype=float)
    setup_s = time.time() - t_setup

    t_compile = time.time()
    e, g = bound.energy_and_grad(theta)      # compile + warm-up
    compile_s = time.time() - t_compile

    times = []
    for r in range(repeats):
        t0 = time.time()
        e, g = bound.energy_and_grad(theta + 1e-4 * (r + 1))
        times.append(time.time() - t0)

    row = {
        "system": label + (f" tapered {n_orig}->{n}q" if taper else ""),
        "qubits": n,
        "h_terms": obj.ham.n_terms,
        "h_groups": obj.gham.n_groups,
        "h_diag_terms": int(len(obj.gham.z_diag)),
        "ops": len(gens),
        "segmented": obj.segmented,
        "setup_s": round(setup_s, 2),
        "compile_s": round(compile_s, 2),
        "s_per_iteration": round(float(np.median(times)), 4),
        "energy": float(e),
        "grad_norm": float(np.linalg.norm(g)),
    }
    if opt_maxiter:
        # full VQE: L-BFGS over the measured iteration primitive, so the
        # final energy lands at-or-below MP2 (round-3 VERDICT item 4's
        # acceptance bar for the reference-table molecules)
        from scipy.optimize import minimize

        t_opt = time.time()
        res = minimize(
            lambda t: tuple(np.asarray(v, dtype=np.float64)
                            for v in bound.energy_and_grad(t)),
            theta, jac=True, method="L-BFGS-B",
            options={"maxiter": opt_maxiter})
        row.update({
            "opt_s": round(time.time() - t_opt, 2),
            "opt_nit": int(res.nit),
            "energy_opt": float(res.fun),
            "HF": float(md.info["HF"]),
            "MP2": float(md.info["MP2"]),
            "below_MP2": bool(res.fun <= md.info["MP2"] + 1e-9),
        })
    return row


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ovqe_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    taper = "--taper" in sys.argv
    opt_maxiter = 0
    argv = sys.argv[1:]
    if "--opt" in argv:
        k = argv.index("--opt")
        if k + 1 < len(argv) and argv[k + 1].isdigit():
            opt_maxiter = int(argv.pop(k + 1))
        else:
            opt_maxiter = 200
    sizes = [int(a) if a.isdigit() else a
             for a in argv if not a.startswith("--")] or [8, 10]
    for n_atoms in sizes:
        if isinstance(n_atoms, str):
            print(json.dumps(bench_chain(n_atoms, repeats=1, taper=taper,
                                         opt_maxiter=opt_maxiter)),
                  flush=True)
            continue
        charge = n_atoms % 2          # odd chains run as closed-shell cations
        repeats = 3 if n_atoms <= 12 else 1
        print(json.dumps(bench_chain(n_atoms, charge=charge,
                                     repeats=repeats, taper=taper,
                                     opt_maxiter=opt_maxiter)),
              flush=True)


if __name__ == "__main__":
    main()
