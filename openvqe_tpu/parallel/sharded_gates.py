"""Mesh-sharded GATE-level statevector primitives (WSSVQE's ansatz family).

The grouped sharded engine (parallel/sharded.py) covers odd-Y Pauli-rotation
sequences — every fermionic/qubit pool.  WSSVQE's hardware-efficient ansatz
(reference get_energy_WSSVQE.py:70-105) is RY/RZ layers + CNOT ladders:
RZ is diagonal and CNOT is a classical index permutation, so neither fits
the odd-Y grouping.  This module gives each gate a mesh-sharded apply with
STATIC collective patterns (gate qubits are Python ints, so the ppermute
pairing is known at trace time — one hop per global-qubit gate, zero for
local ones; contrast the traced-mask `_dyn_ppermute`).

Layout matches parallel/sharded.py: planes (2, 2^n) sharded over a 1-D mesh
of 2^d devices; device `coord` holds local indices j_loc of global
amplitudes j = coord * 2^L + j_loc, L = n - d.  Qubit q maps to amplitude
bit (n - 1 - q) — qubits 0..d-1 are the GLOBAL (device-axis) ones.

All functions are designed to run INSIDE shard_map over the "q" mesh axis
and are differentiable (ppermute/psum transpose cleanly), so jax.grad of a
sharded WSSVQE objective works end to end.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .sharded import AXIS


def _perm(x_dev: int, d: int):
    return [(i, i ^ x_dev) for i in range(1 << d)]


def _indices(dim: int):
    return jax.lax.iota(jnp.int32, dim)


def sharded_pauli_apply(psi_loc, x: int, z: int, k_re, k_im, L: int, d: int):
    """kappa * sigma |psi> on the local block: s(j) psi[j ^ x] with the
    device part of the XOR one static ppermute and the device part of the
    sign a per-device scalar."""
    x = int(x)
    z = int(z)
    lo = (1 << L) - 1
    x_dev, x_loc = x >> L, x & lo
    z_dev, z_loc = z >> L, z & lo
    block = (jax.lax.ppermute(psi_loc, AXIS, _perm(x_dev, d))
             if x_dev else psi_loc)
    idx = _indices(psi_loc.shape[-1])
    sgn = (1.0 - 2.0 * (jax.lax.population_count(idx & z_loc) & 1)
           ).astype(psi_loc.dtype)
    if z_dev:
        coord = jax.lax.axis_index(AXIS)
        s_dev = (1.0 - 2.0 * (jax.lax.population_count(coord & z_dev) & 1)
                 ).astype(psi_loc.dtype)
        sgn = sgn * s_dev
    t = sgn[None, :] * block[:, idx ^ x_loc]
    return jnp.stack([k_re * t[0] - k_im * t[1],
                      k_re * t[1] + k_im * t[0]])


def sharded_pauli_rotation(psi_loc, angle, x: int, z: int, k_re, k_im,
                           L: int, d: int):
    """exp(i angle kappa sigma)|psi> (statevector.pauli_rotation, sharded)."""
    sp = sharded_pauli_apply(psi_loc, x, z, k_re, k_im, L, d)
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.stack([c * psi_loc[0] - s * sp[1],
                      c * psi_loc[1] + s * sp[0]])


def apply_rx(psi_loc, theta, q: int, n: int, d: int):
    m = 1 << (n - 1 - q)
    return sharded_pauli_rotation(psi_loc, -theta / 2.0, m, 0, 1.0, 0.0,
                                  n - d, d)


def apply_ry(psi_loc, theta, q: int, n: int, d: int):
    m = 1 << (n - 1 - q)
    return sharded_pauli_rotation(psi_loc, -theta / 2.0, m, m, 0.0, -1.0,
                                  n - d, d)


def apply_rz(psi_loc, theta, q: int, n: int, d: int):
    m = 1 << (n - 1 - q)
    return sharded_pauli_rotation(psi_loc, -theta / 2.0, 0, m, 1.0, 0.0,
                                  n - d, d)


def apply_cnot(psi_loc, control: int, target: int, n: int, d: int):
    """out[j] = psi[j ^ tmask] where the control bit of j is set — four
    static cases by which of control/target live on the device axis."""
    L = n - d
    lo = (1 << L) - 1
    cmask = 1 << (n - 1 - control)
    tmask = 1 << (n - 1 - target)
    c_dev, c_loc = cmask >> L, cmask & lo
    t_dev, t_loc = tmask >> L, tmask & lo
    idx = _indices(psi_loc.shape[-1])

    if c_dev:
        coord = jax.lax.axis_index(AXIS)
        csel = (coord & c_dev) != 0          # scalar per device
    else:
        csel = ((idx & c_loc) != 0)[None, :]  # per amplitude

    if t_dev:
        partner = jax.lax.ppermute(psi_loc, AXIS, _perm(t_dev, d))
        flipped = partner[:, idx ^ t_loc] if t_loc else partner
    else:
        flipped = psi_loc[:, idx ^ t_loc]
    return jnp.where(csel, flipped, psi_loc)


def basis_state_local(k: int, n: int, d: int, dtype=jnp.float32):
    """|k> planes restricted to this device's block (inside shard_map)."""
    L = n - d
    coord = jax.lax.axis_index(AXIS)
    idx = _indices(1 << L)
    hit = jnp.logical_and(coord == (k >> L),
                          idx == (k & ((1 << L) - 1))).astype(dtype)
    return jnp.stack([hit, jnp.zeros_like(hit)])
