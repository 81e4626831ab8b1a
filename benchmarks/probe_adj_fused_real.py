"""Per-group vs residency-fused ADJOINT sweep on the REAL H12/24q UCCSD
sequence — validates the per-group stage dispatch on hardware and predicts
the fused-path gain for gradient iterations.

Usage: python benchmarks/probe_adj_fused_real.py [n_atoms]
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

from openvqe_tpu.sim import streaming as st


def main():
    n_atoms = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    cache = f"/tmp/ovqe_rotseq_H{n_atoms}.pkl"
    with open(cache, "rb") as f:
        gseq, n = pickle.load(f)

    G = gseq.n_groups
    fm = gseq.fmode
    rng = np.random.default_rng(0)
    theta = (rng.normal(size=gseq.n_ops) * 0.05).astype(np.float32)
    psi = rng.normal(size=(2, 1 << n)).astype(np.float32)
    psi /= np.linalg.norm(psi)
    lam = rng.normal(size=(2, 1 << n)).astype(np.float32)
    lam /= np.linalg.norm(lam)
    psi_d = jnp.asarray(psi)
    lam_d = jnp.asarray(lam)
    th = jnp.asarray(theta)
    print(json.dumps({"n": n, "G": G, "fmode": fm}), flush=True)

    def timed(tag, fn):
        p, l, g = fn(psi_d, lam_d, th)
        _ = float(jnp.sum(p)) + float(jnp.sum(l)) + float(jnp.sum(g))
        t0 = time.time()
        p, l, g = fn(psi_d, lam_d, th)
        _ = float(jnp.sum(p)) + float(jnp.sum(l)) + float(jnp.sum(g))
        dt = time.time() - t0
        print(json.dumps({"variant": tag, "s_per_sweep": round(dt, 4),
                          "ms_per_group": round(1e3 * dt / G, 4)}),
              flush=True)
        return p, l, g

    rev = slice(None, None, -1)

    # per-group baseline at ADJ_CHUNK_BITS
    sd = st.build_stream_data(n, gseq.x, gseq.z, gseq.s, op=gseq.op,
                              chunk_bits=st.ADJ_CHUNK_BITS, fmode=fm)

    def per_group(p, l, t):
        ang = -t[jnp.asarray(sd.op[rev])]
        return st.adjoint_sweep_stream(
            p, l, sd.x_huge[rev], sd.mb[rev], sd.n_outer[rev],
            sd.x_chunk[rev], sd.x_mid[rev], sd.x_lane[rev], ang,
            sd.z_r[rev], sd.z_c[rev], sd.cre[rev], fmode=fm)

    pg = jax.jit(per_group)
    p1, l1, g1 = timed(f"per-group C{1 << st.ADJ_CHUNK_BITS}", pg)
    grad1 = np.zeros(gseq.n_ops)
    np.add.at(grad1, gseq.op[rev], np.asarray(g1))

    # cb is fixed at 2: the adjoint stages 8 planes x C rows, and C=8
    # exceeds the 16 MB scoped-VMEM limit (measured 17.08M)
    for cb in (2,):
        sdF = st.build_stream_data(n, gseq.x, gseq.z, gseq.s, op=gseq.op,
                                   chunk_bits=cb, fmode=fm)
        sd_rev = st.StreamGroupData(
            n=sdF.n, T=sdF.T, C=sdF.C, x_lane=sdF.x_lane[rev],
            x_mid=sdF.x_mid[rev], x_chunk=sdF.x_chunk[rev],
            x_huge=sdF.x_huge[rev], mb=sdF.mb[rev],
            n_outer=sdF.n_outer[rev], z_r=sdF.z_r[rev], z_c=sdF.z_c[rev],
            cre=sdF.cre[rev], cim=None, op=sdF.op[rev])
        bargs = st.build_seq_buckets(sd_rev)
        print(json.dumps({"cb": cb, "buckets": len(bargs[0]),
                          "fusion": round(G / len(bargs[0]), 1)}),
              flush=True)
        adjf = jax.jit(lambda p, l, t, bargs=bargs, cb=cb:
                       st.adjoint_sweep_fused(p, l, t, *bargs,
                                              chunk_bits=cb, fmode=fm))
        p2, l2, g2 = timed(f"fused C{1 << cb}", adjf)
        bop, bact = bargs[3], bargs[7]
        grad2 = np.zeros(gseq.n_ops)
        np.add.at(grad2, bop.reshape(-1),
                  (np.asarray(g2) * bact).reshape(-1))
        print(json.dumps({
            "cb": cb,
            "p_dev": float(jnp.max(jnp.abs(p1 - p2))),
            "l_dev": float(jnp.max(jnp.abs(l1 - l2))),
            "g_dev": float(np.max(np.abs(grad1 - grad2)))}), flush=True)


if __name__ == "__main__":
    main()
