"""A/B the rotation-sweep kernels at 24q on a 30q-like workload: runs of
42 consecutive equal-x_huge groups (the measured H15+/30q fusion factor).
Variants: per-group (DMA floor = read+write per group), fused C=4 (the
round-3 default-off measurement), fused C=8 (bigger per-link batches).

Usage: python benchmarks/probe_rot_fused.py [n] [G] [run_len]
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

from openvqe_tpu.sim import streaming as st


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 504
    run_len = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    rng = np.random.default_rng(2)
    K = 8

    def workload(chunk_bits):
        lift = st.TILE_BITS + chunk_bits
        span = (1 << (n - lift)) - 1
        huge = rng2.integers(0, span + 1, size=G // run_len + 1)
        x = ((huge[np.arange(G) // run_len] << lift)
             | rng2.integers(1, 1 << lift, size=G)).astype(np.int64)
        return x

    rng2 = np.random.default_rng(2)
    # one x layout shared across variants (chunk split differs per cb)
    lift0 = st.TILE_BITS + 2
    span0 = (1 << (n - lift0)) - 1
    huge = rng2.integers(0, span0 + 1, size=G // run_len + 1)
    x = ((huge[np.arange(G) // run_len] << lift0)
         | rng2.integers(1, 1 << lift0, size=G)).astype(np.int64)
    z = rng2.integers(0, 1 << n, size=(G, K)).astype(np.int64)
    coef = (rng2.normal(size=(G, K)) * 0.1).astype(np.float32)
    op = (np.arange(G) % 64).astype(np.int32)
    theta = (rng2.normal(size=64) * 0.1).astype(np.float32)
    psi = rng2.normal(size=(2, 1 << n)).astype(np.float32)
    psi /= np.linalg.norm(psi)
    psi_d = jnp.asarray(psi)
    th = jnp.asarray(theta)

    def timed(tag, fn, state):
        out = fn(state, th)
        _ = float(jnp.sum(out))
        t0 = time.time()
        out = fn(out, th)
        _ = float(jnp.sum(out))
        dt = time.time() - t0
        print(json.dumps({"variant": tag, "s_per_sweep": round(dt, 4),
                          "ms_per_group": round(1e3 * dt / G, 4)}),
              flush=True)
        return out

    sd = st.build_stream_data(n, x, z, coef, op=op)
    sargs = st.seq_stream_args(sd)
    rot = jax.jit(lambda p, t: st.apply_grouped_ops_stream(p, t, *sargs))
    o1 = timed("per-group C8", rot, psi_d)

    for cb in (2, 3):
        sdF = st.build_stream_data(n, x, z, coef, op=op, chunk_bits=cb)
        fb = st.build_seq_buckets(sdF)
        print(json.dumps({"cb": cb, "buckets": len(fb[0]),
                          "fusion": round(G / len(fb[0]), 1)}), flush=True)
        rotf = jax.jit(lambda p, t, fb=fb, cb=cb:
                       st.apply_grouped_ops_fused(p, t, *fb,
                                                  chunk_bits=cb))
        o2 = timed(f"fused C{1 << cb}", rotf, psi_d)
        err = float(jnp.max(jnp.abs(o1 - o2)))
        print(json.dumps({"cb": cb, "max_abs_dev": err}), flush=True)


if __name__ == "__main__":
    main()
