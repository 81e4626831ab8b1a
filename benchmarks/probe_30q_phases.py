"""Attribute the 30-qubit single-chip energy between its two phases:
the donated in-place rotation sweep (4424 groups) and the bucketed
expectation (7021 groups in ~O(500) x_huge buckets).

Uses the cached H15+ setup from bench_30q_single.py (run that first) and
the same device programs, so the persistent compile cache makes this a
warm measurement.  Prints one JSON line per phase.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (standalone runs)

import json
import os
import pickle
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ovqe_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from openvqe_tpu.sim import streaming as st


def main():
    n_atoms = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    cache = f"/tmp/ovqe_30q_setup_H{n_atoms}.pkl"
    if not os.path.exists(cache):
        raise SystemExit(f"run bench_30q_single.py {n_atoms} first")
    with open(cache, "rb") as f:
        gseq, gham, e_hf, hf_init, theta0, n = pickle.load(f)

    seg = st.stream_segment_groups(n)
    seg2 = max(8, seg // 2)
    fm = gseq.fmode
    T = 1 << (n - st.TILE_BITS)

    @partial(jax.jit, donate_argnums=(0,), static_argnums=(12,))
    def rot_seg(psi4, theta, xh, mb_, nout, xc, xm, xl, op, zr, zc, cre,
                fmode=0):
        return st.apply_grouped_ops_stream4(psi4, theta, xh, mb_, nout, xc,
                                            xm, xl, op, zr, zc, cre,
                                            fmode=fmode)

    @partial(jax.jit, static_argnums=(0, 1))
    def expb_seg(stages, cb, psi4, bxh, bmb, bnout, bxc, bxm, bxl, bact,
                 bzr, bzc, bcre, bcim):
        return st.expectation_bucketed4(psi4, bxh, bmb, bnout, bxc, bxm,
                                        bxl, bact, bzr, bzc, bcre, bcim,
                                        chunk_bits=cb, herm=True,
                                        stages=stages)

    fwd_segments = [tuple(jnp.asarray(a) for a in s)
                    for s in st._segments(
                        st.seq_stream_args(st.stream_seq_data(gseq)), seg)]
    classes = st.build_ham_buckets_split(gham, with_diag=True,
                                         stage_split=True)
    h_segments = [(st_, cb, tuple(jnp.asarray(a) for a in s))
                  for st_, cb, b in classes
                  for s in st._bucket_segments(b, seg2)]
    n_buckets = sum(int((b[2] > 0).sum()) for _, _, b in classes)
    print(json.dumps({"rot_groups": int(gseq.n_groups),
                      "h_groups": int(gham.n_groups),
                      "h_buckets": n_buckets,
                      "h_segments": len(h_segments),
                      "k_classes": [(st_, int(b[7].shape[2]))
                                    for st_, _, b in classes]}),
          flush=True)

    hf_t, hf_r = divmod(int(hf_init), st.SUB * st.LANE)
    hf_s, hf_l = divmod(hf_r, st.LANE)

    @jax.jit
    def make_hf():
        psi = jnp.zeros((2, T, st.SUB, st.LANE), jnp.float32)
        return psi.at[0, hf_t, hf_s, hf_l].set(1.0)

    def _force(x):
        return float(jnp.sum(x[:, :1, :8, :8]))

    th = jnp.asarray(np.asarray(theta0, np.float32))

    for trial in range(2):
        psi = make_hf()
        _force(psi)
        t0 = time.time()
        for s in fwd_segments:
            psi = rot_seg(psi, th, *s, fm)
        _force(psi)
        t_rot = time.time() - t0

        t1 = time.time()
        acc = jnp.float32(0.0)
        for st_, cb, s in h_segments:
            acc = acc + expb_seg(st_, cb, psi, *s)
        e = float(acc)
        t_exp = time.time() - t1
        print(json.dumps({"trial": trial,
                          "rot_s": round(t_rot, 2),
                          "ms_per_rot_group": round(
                              1e3 * t_rot / gseq.n_groups, 3),
                          "exp_s": round(t_exp, 2),
                          "ms_per_h_group": round(
                              1e3 * t_exp / gham.n_groups, 3),
                          "energy": e}), flush=True)
        psi = acc = None          # free the 8.6 GB state before re-init


if __name__ == "__main__":
    main()
