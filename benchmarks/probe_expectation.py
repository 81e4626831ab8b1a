"""TPU timing: streaming expectation kernel, general vs Hermitian-certified.

herm=True exploits bra==ket + group Hermiticity to compute ONE cross-chunk
contribution doubled (half the perm/field compute).  Synthetic groups are
built Hermitian (imaginary weight exactly on the odd-parity(x&z) rows) so
both paths return the same value.

Usage: python benchmarks/probe_expectation.py [n] [G] [K]  (default 24 256 64)
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
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    rng = np.random.default_rng(7)
    x = rng.integers(1, 1 << n, size=G).astype(np.int64)
    z = rng.integers(0, 1 << n, size=(G, K)).astype(np.int64)
    coef = (rng.normal(size=(G, K)) * 0.3).astype(np.float32)
    par = np.zeros_like(z)
    for g in range(G):
        par[g] = [bin(int(x[g]) & int(zk)).count("1") & 1 for zk in z[g]]
    cre = np.where(par == 0, coef, 0.0).astype(np.float32)
    cim = np.where(par == 1, coef, 0.0).astype(np.float32)
    psi = rng.normal(size=(2, 1 << n)).astype(np.float32)
    psi /= np.linalg.norm(psi)
    psi_d = jnp.asarray(psi)

    sd = st.build_stream_data(n, x, z, cre, coef_im=cim)
    args = tuple(jnp.asarray(a) for a in st.ham_stream_args(sd))
    vals = {}
    for herm in (False, True):
        fn = jax.jit(lambda p: st.expectation_stream(p, *args, herm=herm))
        v = float(fn(psi_d))
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            v = float(fn(psi_d))
        dt = (time.time() - t0) / reps
        vals[herm] = v
        print(json.dumps({"herm": herm, "n": n, "G": G, "K": K, "value": v,
                          "ms_per_group": round(dt * 1e3 / G, 4)}),
              flush=True)
    print(json.dumps({"match": abs(vals[True] - vals[False]) < 1e-5}),
          flush=True)


if __name__ == "__main__":
    main()
