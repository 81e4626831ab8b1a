"""30-qubit VQE ENERGY evaluation on ONE TPU chip.

The adjoint needs 4 streamed states (34 GB at 30q) and the bucketed H-apply
2 (17 GB) — past one v5e's 16 GB HBM; multi-chip owns the full iteration
(parallel/sharded_stream.py, benchmarks/bench_30q_mesh.py).  But the
ENERGY evaluation needs only the 8.6 GB state itself: the rotation sweep is
in-place (input_output_aliases + donated host-loop carry) and the per-group
expectation kernel is read-only with a scalar accumulator.  This script
runs a full 30-qubit UCCSD ansatz energy on the single bench chip:

  * H15+ / STO-3G (closed-shell cation), native integrals + RHF,
  * HF state built ON DEVICE (a one-hot 8.6 GB host transfer would ride
    the tunnel for minutes),
  * theta=0 energy must equal the SCF HF energy (correctness gate),
  * then one random-theta ansatz energy, timed.

Usage: python benchmarks/bench_30q_single.py [n_atoms]   (default 15)
       python benchmarks/bench_30q_single.py CO2          (any 15-orbital
       molecule from the reference geometry table, e.g. CO2 — 30 qubits)
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (standalone runs)

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ovqe_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from openvqe_tpu.sim import grouped as gr
from openvqe_tpu.sim import streaming as st


def _force(x):
    return float(jnp.sum(x[:, :8]))


def main():
    arg = sys.argv[1] if len(sys.argv) > 1 else "15"
    mol_name = None if arg.isdigit() else arg
    n_atoms = int(arg) if arg.isdigit() else 0
    charge = n_atoms % 2
    label = mol_name if mol_name else f"H{n_atoms}{'+' if charge else ''}"
    t0 = time.time()
    cache = f"/tmp/ovqe_30q_setup_{label.replace('+', 'p')}.pkl"
    import os
    import pickle
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            gseq, gham, e_hf, hf_init, theta0, n = pickle.load(f)
    else:
        from openvqe_tpu.chem.frontend import compute_molecule
        from openvqe_tpu.ops.generators import uccsd as uccsd_gen
        from openvqe_tpu.ops.hamiltonian import (
            ElectronicStructureHamiltonian, convert_to_h_integrals)
        from openvqe_tpu.sim.compile import (compile_op_sequence,
                                             compile_pauli_sum)

        if mol_name:
            from openvqe_tpu.models.molecules import get_molecule
            spec = get_molecule(mol_name)
            md = compute_molecule(spec.geometry, spec.basis, spec.spin,
                                  spec.charge, run_fci_flag=False)
        else:
            md = compute_molecule(
                [("H", (0, 0, 1.0 * k)) for k in range(n_atoms)], "sto-3g",
                charge=charge, spin=0, run_fci_flag=False)
        hpq, hpqrs = convert_to_h_integrals(md.one_body_integrals,
                                            md.two_body_integrals)
        esh = ElectronicStructureHamiltonian(hpq, hpqrs,
                                             md.nuclear_repulsion)
        hsp = esh.to_spin("JW")
        n = hsp.nbqbits
        _, _, pool, theta0, hf_init = uccsd_gen(
            esh, md.n_elec, [0] * n,
            [e for e in md.orbital_energies for _ in range(2)], "JW")
        gens = [op * 1j for op in pool]   # reference x1j (ucc.py:31)
        gseq = gr.group_op_sequence(compile_op_sequence(gens, n))
        gham = gr.group_pauli_sum(compile_pauli_sum(hsp, n))
        e_hf = float(md.info["HF"])
        with open(cache, "wb") as f:
            pickle.dump((gseq, gham, e_hf, hf_init, theta0, n), f)
    print(json.dumps({"system": label,
                      "qubits": n, "ops": gseq.n_ops,
                      "rot_groups": gseq.n_groups,
                      "h_groups": gham.n_groups, "fmode": gseq.fmode,
                      "hf_energy": e_hf,
                      "setup_s": round(time.time() - t0, 1)}), flush=True)

    # ---- device programs: the library's XL energy-only path --------------
    # (tiled in-place carry, fused stage-dispatch rotation buckets,
    # bucketed Hermitian expectation with diag folded in, on-device HF)
    energy = st.build_streaming_energy_xl_fn(gseq, gham, hf_init)
    print(json.dumps({"rot_mode": "fused" if st._fuse_policy("seq")
                      else "per-group"}), flush=True)

    # ---- theta = 0: must reproduce the HF energy -------------------------
    t1 = time.time()
    e0 = energy(np.zeros(gseq.n_ops))
    t_first = time.time() - t1
    ok = abs(e0 - e_hf) < 5e-4
    print(json.dumps({"theta0_energy": e0, "hf_energy": e_hf,
                      "match_hf": ok,
                      "first_call_s": round(t_first, 1)}), flush=True)

    # ---- MP2-guess theta, warm (energy must land BELOW HF) ---------------
    th = np.asarray(theta0, np.float32)
    t2 = time.time()
    e1 = energy(th)
    dt = time.time() - t2
    print(json.dumps({"system": label, "qubits": n,
                      "ansatz_energy": e1,
                      "s_per_energy": round(dt, 2),
                      "state_gb": round(2 * (1 << n) * 4 / 2**30, 2),
                      "ok": ok and e1 < e_hf + 1e-6}), flush=True)


if __name__ == "__main__":
    main()
