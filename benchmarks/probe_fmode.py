"""TPU timing: trig vs poly (fmode) streaming kernels at n qubits.

Usage: python benchmarks/probe_fmode.py [n] [G]   (default 24 256)
Synthetic single-Pauli groups (coef +-1) so fmode=1 is exact; measures the
rotation sweep and the reversible adjoint per-group cost for fmode 0 and 1.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (standalone runs)

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
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    rng = np.random.default_rng(7)
    x = rng.integers(1, 1 << n, size=G).astype(np.int64)
    z = rng.integers(0, 1 << n, size=(G, 1)).astype(np.int64)
    coef = np.where(rng.random(G) < 0.5, -1.0, 1.0).astype(
        np.float32).reshape(G, 1)
    op = np.arange(G, dtype=np.int32)
    theta = (rng.normal(size=G) * 0.2).astype(np.float32)
    psi = rng.normal(size=(2, 1 << n)).astype(np.float32)
    psi /= np.linalg.norm(psi)
    psi_d = jnp.asarray(psi)
    th_d = jnp.asarray(theta)

    for fm in (0, 1):
        sd = st.build_stream_data(n, x, z, coef, op=op, fmode=fm)
        args = tuple(jnp.asarray(a) for a in st.seq_stream_args(sd))
        fn = jax.jit(lambda p, t: st.apply_grouped_ops_stream(
            p, t, *args, fmode=fm))
        out = fn(psi_d, th_d)
        jax.block_until_ready(out)
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            out = fn(psi_d, th_d)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / reps
        print(f"rot  fmode={fm}: {dt*1e3/G:.3f} ms/group "
              f"({dt:.3f} s/sweep of {G})", flush=True)

    # adjoint
    lam = rng.normal(size=(2, 1 << n)).astype(np.float32)
    lam_d = jnp.asarray(lam)
    for fm in (0, 1):
        sda = st.build_stream_data(n, x[::-1].copy(), z[::-1].copy(),
                                   coef[::-1].copy(), op=op[::-1].copy(),
                                   chunk_bits=st.ADJ_CHUNK_BITS, fmode=fm)
        args = tuple(jnp.asarray(a) for a in st.seq_stream_args(sda))
        ang = jnp.asarray(-theta[np.asarray(sda.op)])

        def adj(p, l, a=args, an=ang, f=fm):
            xh, mb, nout, xc, xm, xl, opo, zr, zc, cre = a
            return st.adjoint_sweep_stream(p, l, xh, mb, nout, xc, xm, xl,
                                           an, zr, zc, cre, fmode=f)
        adj_j = jax.jit(adj)
        out = adj_j(psi_d, lam_d)
        jax.block_until_ready(out[2])
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            out = adj_j(psi_d, lam_d)
        jax.block_until_ready(out[2])
        dt = (time.time() - t0) / reps
        print(f"adj  fmode={fm}: {dt*1e3/G:.3f} ms/group "
              f"({dt:.3f} s/sweep of {G})", flush=True)


if __name__ == "__main__":
    main()
