"""Per-group cost ATTRIBUTION for the streaming rotation sweep.

Runs the fmode=1 rotation sweep at n qubits with OVQE_STREAM_PROBE in
{"", "noperm", "nofield"} (separate subprocesses — the env is read at
import).  The deltas attribute the per-group cost to the permutation
matmul chain (MXU) vs the sign/weight field build (MXU+VPU) vs the
irreducible DMA + combine floor.

Usage: python benchmarks/probe_attribution.py [n] [G]   (default 24 256)
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (standalone runs)

import json
import os
import subprocess
import sys
import time


def _child(n, G, probe):
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/ovqe_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from openvqe_tpu.sim import streaming as st

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

    sd = st.build_stream_data(n, x, z, coef, op=op, fmode=1)
    args = tuple(jnp.asarray(a) for a in st.seq_stream_args(sd))
    fn = jax.jit(lambda p, t: st.apply_grouped_ops_stream(
        p, t, *args, fmode=1))
    out = fn(psi_d, th_d)
    float(jnp.sum(out[:, :8]))          # force completion (donation gotcha)
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        out = fn(out, th_d)
    float(jnp.sum(out[:, :8]))
    dt = (time.time() - t0) / reps
    print(json.dumps({"probe": probe or "full", "n": n, "G": G,
                      "ms_per_group": round(dt * 1e3 / G, 4),
                      "s_per_sweep": round(dt, 4)}), flush=True)


def main():
    if os.environ.get("_PROBE_CHILD"):
        _child(int(sys.argv[1]), int(sys.argv[2]),
               os.environ.get("OVQE_STREAM_PROBE", ""))
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    probes = (sys.argv[3].split(",") if len(sys.argv) > 3
              else ["", "noperm", "nofield"])
    for probe in probes:
        env = dict(os.environ, _PROBE_CHILD="1",
                   OVQE_STREAM_PROBE="" if probe == "full" else probe)
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        str(n), str(G)], env=env, check=False)


if __name__ == "__main__":
    main()
