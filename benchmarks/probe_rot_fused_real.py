"""Per-group vs residency-fused rotation sweep on the REAL H12/24q UCCSD
sequence (fmode=1, measured 13.8x run fusion) — predicts the fused-path
gain for the production iteration rows.

Usage: python benchmarks/probe_rot_fused_real.py [n_atoms]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (standalone runs)

import json
import os
import pickle
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ovqe_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from openvqe_tpu.sim import grouped as gr
from openvqe_tpu.sim import streaming as st


def main():
    n_atoms = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    cache = f"/tmp/ovqe_rotseq_H{n_atoms}.pkl"
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            gseq, n = pickle.load(f)
    else:
        from openvqe_tpu.chem.frontend import compute_molecule
        from openvqe_tpu.ops.generators import uccsd as uccsd_gen
        from openvqe_tpu.ops.hamiltonian import (
            ElectronicStructureHamiltonian, convert_to_h_integrals)
        from openvqe_tpu.sim.compile import compile_op_sequence
        md = compute_molecule([("H", (0, 0, 1.0 * k))
                               for k in range(n_atoms)], "sto-3g",
                              charge=n_atoms % 2, spin=0,
                              run_fci_flag=False)
        hpq, hpqrs = convert_to_h_integrals(md.one_body_integrals,
                                            md.two_body_integrals)
        esh = ElectronicStructureHamiltonian(hpq, hpqrs,
                                             md.nuclear_repulsion)
        n = esh.to_spin("JW").nbqbits
        _, _, pool, _, _ = uccsd_gen(
            esh, md.n_elec, [0] * n,
            [e for e in md.orbital_energies for _ in range(2)], "JW")
        gseq = gr.group_op_sequence(
            compile_op_sequence([op * 1j for op in pool], n))
        with open(cache, "wb") as f:
            pickle.dump((gseq, n), f)

    G = gseq.n_groups
    fm = gseq.fmode
    rng = np.random.default_rng(0)
    theta = (rng.normal(size=gseq.n_ops) * 0.05).astype(np.float32)
    psi = rng.normal(size=(2, 1 << n)).astype(np.float32)
    psi /= np.linalg.norm(psi)
    psi_d = jnp.asarray(psi)
    th = jnp.asarray(theta)

    def timed(tag, fn):
        out = fn(psi_d, th)
        _ = float(jnp.sum(out))
        t0 = time.time()
        out2 = fn(out, th)
        _ = float(jnp.sum(out2))
        dt = time.time() - t0
        print(json.dumps({"variant": tag, "s_per_sweep": round(dt, 4),
                          "ms_per_group": round(1e3 * dt / G, 4)}),
              flush=True)
        return out2

    sd = st.build_stream_data(n, gseq.x, gseq.z, gseq.s, op=gseq.op,
                              fmode=fm)
    sargs = st.seq_stream_args(sd)
    rot = jax.jit(lambda p, t: st.apply_grouped_ops_stream(
        p, t, *sargs, fmode=fm))
    print(json.dumps({"n": n, "G": G, "fmode": fm}), flush=True)
    o1 = timed("per-group C8", rot)

    for cb in (2, 3):
        sdF = st.build_stream_data(n, gseq.x, gseq.z, gseq.s, op=gseq.op,
                                   chunk_bits=cb, fmode=fm)
        fb = st.build_seq_buckets(sdF)
        print(json.dumps({"cb": cb, "buckets": len(fb[0]),
                          "fusion": round(G / len(fb[0]), 1)}), flush=True)
        rotf = jax.jit(lambda p, t, fb=fb, cb=cb:
                       st.apply_grouped_ops_fused(p, t, *fb, chunk_bits=cb,
                                                  fmode=fm))
        o2 = timed(f"fused C{1 << cb}", rotf)
        # both paths are bitwise-exact designs; trajectories must agree
        # (o1 advanced psi by 2 sweeps; rebase fused on the same start)
        err = float(jnp.max(jnp.abs(o1 - o2)))
        print(json.dumps({"cb": cb, "max_abs_dev": err}), flush=True)


if __name__ == "__main__":
    main()
