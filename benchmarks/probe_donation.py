"""Minimal repro probe: donated + pallas-aliased host-loop chain, then a
forced scalar materialization — mirrors what bound.forward() + float(sum)
does at 21+ qubits.  Prints step timings; a hang here reproduces the
profiler stall."""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (standalone runs)

import time

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

jax.config.update("jax_compilation_cache_dir", "/tmp/ovqe_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from openvqe_tpu.sim import streaming as st

n = 20
G, K = 8, 4
rng = np.random.default_rng(0)
x = rng.integers(0, 1 << n, size=G).astype(np.int32)
z = rng.integers(0, 1 << n, size=(G, K)).astype(np.int32)
coef = (rng.normal(size=(G, K)) * 0.1).astype(np.float32)
op = np.zeros(G, np.int32)
theta = np.zeros(1, np.float32)
sd = st.build_stream_data(n, x, z, coef, op=op)
sargs = tuple(jnp.asarray(a) for a in st.seq_stream_args(sd))


@partial(jax.jit, donate_argnums=(0,))
def rot_seg(psi, th):
    return st.apply_grouped_ops_stream(psi, th, *sargs)


@jax.jit
def fresh(x):
    return x + jnp.float32(0.0)


@jax.jit
def jsum(x):
    return jnp.sum(x)


psi0 = jnp.asarray(rng.normal(size=(2, 1 << n)).astype(np.float32))

for rep in range(3):
    t0 = time.time()
    psi = fresh(psi0)
    for _ in range(3):                     # host loop of donated calls
        psi = rot_seg(psi, jnp.asarray(theta))
    t1 = time.time()
    s = float(jsum(psi))                   # JITTED forced materialization
    t2 = time.time()
    print(f"rep {rep}: dispatch {t1-t0:.3f}s  jit-force {t2-t1:.3f}s  "
          f"sum={s:.4f}", flush=True)

# eager reduction on the same buffer — suspected hang trigger on axon
t0 = time.time()
s = float(jnp.sum(psi))
print(f"eager force {time.time()-t0:.3f}s sum={s:.4f}", flush=True)
print("probe done")
