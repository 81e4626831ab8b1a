"""30-qubit feasibility: sharded VQE iteration beyond the single-chip wall.

The 28-qubit single-chip ceiling is the adjoint's resident states (2 GB
state x 4); the streaming x sharding composition (parallel/sharded_stream)
splits the state over the mesh, so 30 qubits fits an 8-chip v5e pod with
512 MB f32 planes per device.  Multi-chip hardware is not available here,
so this run validates CORRECTNESS of the full 30-qubit iteration (forward
+ energy + reversible-adjoint gradient + SGD descent) on the virtual
8-device CPU mesh with the impl="xla" inner engine (identical composition
semantics; the Pallas kernels are hardware-validated per device at these
block sizes by benchmarks/bench_streaming.py).

Memory at n=30, 8 devices: 2^27 amplitudes/device x 4 B x 2 planes
= 1 GB per device plane pair (psi + lambda resident during the adjoint).

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python benchmarks/bench_30q_mesh.py [n_ops]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (standalone runs)

import json
import os
import sys
import time

if __name__ == "__main__":
    # hard override (not setdefault): the global env sets JAX_PLATFORMS=axon
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=8")
    os.environ["XLA_FLAGS"] = " ".join(flags)

import numpy as np


def main(n_ops: int = 6):
    import jax

    from openvqe_tpu.ops.pauli import PauliSum
    from openvqe_tpu.parallel import sharded as sh
    from openvqe_tpu.parallel import sharded_stream as ss

    n = 30
    rng = np.random.default_rng(30)

    def odd_y(device_bits: str):
        """Random odd-Y string with a FIXED device-bit prefix (qubits
        0..2): runs sharing a device mask share one executable, keeping
        the CPU-XLA compile count of this 2^30 spike bounded."""
        while True:
            body = "".join(rng.choice(list("IXYZ"),
                                      p=[0.72, 0.09, 0.1, 0.09])
                           for _ in range(n - 3))
            s = device_bits + body
            if s.count("Y") % 2 == 1 and s.count("I") < n:
                return PauliSum.from_term(n, float(rng.normal() * 0.3), s)

    # two locality classes: local (identity on the device axis) and one
    # shared nonlocal mask — consecutive same-mask ops fuse into runs
    prefixes = ["III"] * (n_ops // 2) + ["XYI"] * (n_ops - n_ops // 2)
    gens = [odd_y(p) for p in prefixes]
    ham = PauliSum.identity(n, 0.11)
    for _ in range(2):
        zs = "".join(rng.choice(list("IZ"), p=[0.7, 0.3]) for _ in range(n))
        ham = ham + PauliSum.from_term(n, float(rng.normal()), zs)
    for _ in range(4):
        s = "".join(rng.choice(list("IXYZ"), p=[0.72, 0.09, 0.1, 0.09])
                    for _ in range(n))
        if s.count("I") < n:
            ham = ham + PauliSum.from_term(n, float(rng.normal() * 0.4), s)

    mesh = sh.make_mesh(8)
    theta = rng.normal(size=n_ops) * 0.2
    hf_init = 0b111000

    t0 = time.time()
    obj = ss.ShardedStreamObjective(ham, mesh, impl="xla")
    bound = obj.bind(gens, hf_init)
    t_build = time.time() - t0

    t0 = time.time()
    e0, g0 = bound.energy_and_grad(theta)
    t_iter = time.time() - t0
    theta1 = theta - 0.05 * g0
    e1, _ = bound.energy_and_grad(theta1)

    ok = bool(np.isfinite(e0) and np.isfinite(e1) and e1 < e0)
    out = {"metric": "30q sharded VQE iteration (8-device CPU mesh, "
                     "correctness)",
           "qubits": n, "n_ops": n_ops, "E0": float(e0), "E1": float(e1),
           "descends": ok, "grad_norm": float(np.linalg.norm(g0)),
           "s_iteration_cpu": round(t_iter, 1),
           "s_build": round(t_build, 1)}
    print(json.dumps(out), flush=True)
    assert ok, out
    return out


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 6)
