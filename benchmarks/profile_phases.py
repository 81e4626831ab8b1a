"""Phase breakdown of one large-system VQE iteration (forward sweep, H pass,
adjoint sweep) — drives kernel optimization priorities.

Usage: python benchmarks/profile_phases.py [n_atoms]   (default 12)
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (standalone runs)

import json
import sys
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ovqe_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    n_atoms = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    charge = n_atoms % 2

    from openvqe_tpu.chem.frontend import compute_molecule
    from openvqe_tpu.ops.hamiltonian import (
        ElectronicStructureHamiltonian, convert_to_h_integrals)
    from openvqe_tpu.ops.transforms import transform_operator
    from openvqe_tpu.ops.uccsd import get_cluster_ops_and_init_guess
    from openvqe_tpu.sim.objective import VQEObjective
    from openvqe_tpu.sim import grouped as gr

    md = compute_molecule(
        [("H", (0, 0, 1.0 * k)) for k in range(n_atoms)], "sto-3g",
        charge=charge, run_fci_flag=False)
    hpq, hpqrs = convert_to_h_integrals(md.one_body_integrals,
                                        md.two_body_integrals)
    hsp = ElectronicStructureHamiltonian(
        hpq, hpqrs, md.nuclear_repulsion).to_spin("JW")
    n = hsp.nbqbits
    eps_full = [e for e in md.orbital_energies for _ in range(2)]
    cluster_ops, theta0, hf_init = get_cluster_ops_and_init_guess(
        md.n_elec, [0] * n, eps_full, hpqrs)
    gens = [transform_operator(op, "JW") * 1j for op in cluster_ops]

    obj = VQEObjective(hsp)
    bound = obj.bind(gens, hf_init)
    theta = np.asarray(theta0, dtype=float) + 1e-3

    print(json.dumps({"n": n, "segmented": obj.segmented,
                      "h_groups": obj.gham.n_groups,
                      "seq_groups": int(len(bound._seq_args[0])),
                      "pallas": bound._pargs is not None}), flush=True)

    import jax.numpy as jnp

    def _force(out):
        """block_until_ready can return EARLY for donated+aliased pallas
        chains on the axon backend (the output buffer aliases an
        already-materialized input); a scalar D2H forces completion."""
        x = out if not isinstance(out, tuple) else out[0]
        if hasattr(x, "dtype"):
            float(jnp.sum(x))
        return out

    def t(label, fn, *args, reps=2, **kw):
        out = _force(fn(*args, **kw))          # compile/warm
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = _force(fn(*args, **kw))
            ts.append(time.time() - t0)
        print(json.dumps({"phase": label, "s": round(min(ts), 4)}),
              flush=True)
        return out

    psi = t("forward sweep", bound.forward, theta)
    lam = t("H pass (lham)", obj.ham_apply, psi)
    t("expectation", obj.expectation, psi)
    t0 = time.time()
    e, g = bound.energy_and_grad(theta)
    print(json.dumps({"phase": "full energy_and_grad (compile-warm)",
                      "s": round(time.time() - t0, 4)}), flush=True)
    t("full energy_and_grad", bound.energy_and_grad, theta, reps=1)


if __name__ == "__main__":
    main()
