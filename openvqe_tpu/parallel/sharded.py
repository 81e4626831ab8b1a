"""Mesh-sharded statevector engine (multi-chip scaling path).

The reference caps out where one process's memory ends (its scaling axis is
qubit count; dense 2^n work at adapt/fermionic_adapt_vqe.py:474 — SURVEY.md
§2.2).  Here the 2^n amplitude vector is sharded over a 1-D device mesh
("q", 2^d devices): each device holds the 2^(n-d) amplitudes whose top d
index bits (qubits 0..d-1, MSB convention) equal its mesh coordinate.

Pauli-string action splits by construction:
  * x_lo bits (local qubits)  -> local index XOR (gather)
  * x_hi bits (global qubits) -> a *device permutation*: amplitudes move to
    device (coord XOR x_hi) — one `lax.ppermute` over ICI, the statevector
    analog of tensor-parallel collectives.
  * sign masks split as parity(j & z) = parity(coord & z_hi) XOR
    parity(j_lo & z_lo) — no communication.

The Hamiltonian is compiled into x_hi-groups: one ppermute per distinct
global-flip pattern, then a local scan over that group's terms, so the
collective count is <= 2^d per H-application regardless of term count.

Everything is built with `shard_map` over an explicit Mesh and is
backend-agnostic (virtual CPU mesh in tests, TPU pod slices in production).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.pauli import PauliSum
from ..sim.compile import CompiledOpSequence, CompiledPauliSum, compile_pauli_sum
from ..sim.statevector import default_cdtype

AXIS = "q"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    if len(devs) & (len(devs) - 1):
        raise ValueError(f"mesh size must be a power of two, got {len(devs)}")
    return Mesh(np.array(devs), (AXIS,))


def log2_devices(mesh: Mesh) -> int:
    return int(np.log2(mesh.shape[AXIS]))


def sharded_hf_state(n: int, hf_init: int, mesh: Mesh, cdtype=None):
    """|hf_init> distributed over the mesh."""
    cdtype = cdtype or default_cdtype()
    np_c = np.complex128 if cdtype == jnp.complex128 else np.complex64
    psi = np.zeros(1 << n, dtype=np_c)
    psi[hf_init] = 1.0
    sharding = NamedSharding(mesh, P(AXIS))
    return jax.device_put(psi, sharding)


# ---------------------------------------------------------------- grouping

@dataclass
class GroupedPauliSum:
    """Hamiltonian terms grouped by their global-qubit flip pattern x_hi."""
    n: int
    d: int                      # log2(devices)
    x_hi: List[int]             # one entry per group
    x_lo: List[np.ndarray]      # local flip masks per group
    z_hi: List[np.ndarray]      # global sign masks per group (device bits)
    z_lo: List[np.ndarray]      # local sign masks per group
    a: List[np.ndarray]         # complex coefficients per group
    const: complex


def group_by_xhi(c: CompiledPauliSum, d: int) -> GroupedPauliSum:
    n = c.n
    L = n - d                      # local bits
    lo_mask = (1 << L) - 1
    groups: Dict[int, List[int]] = {}
    for k in range(c.n_terms):
        xh = int(c.x[k]) >> L
        groups.setdefault(xh, []).append(k)
    x_hi, x_lo, z_hi, z_lo, a = [], [], [], [], []
    coeffs = c.coeffs()
    for xh in sorted(groups):
        idx = np.asarray(groups[xh])
        x_hi.append(xh)
        x_lo.append((c.x[idx] & lo_mask).astype(np.int32))
        z_hi.append((c.z[idx] >> L).astype(np.int32))
        z_lo.append((c.z[idx] & lo_mask).astype(np.int32))
        a.append(coeffs[idx])
    return GroupedPauliSum(n=n, d=d, x_hi=x_hi, x_lo=x_lo, z_hi=z_hi,
                           z_lo=z_lo, a=a, const=c.const)


# ------------------------------------------------------------ local kernels

def _local_indices(L: int):
    return jax.lax.iota(jnp.int32, 1 << L)


def _parity(v):
    return (jax.lax.population_count(v) & 1).astype(jnp.float32)


def _group_apply_local(block, coord, x_lo, z_hi, z_lo, a, L, acc):
    """acc += sum_k a_k sigma_k(block) for one x_hi group; ``block`` already
    holds the partner device's amplitudes."""
    idx = _local_indices(L)

    def step(carry, term):
        xl, zh, zl, ak = term
        sgn_local = 1.0 - 2.0 * _parity(idx & zl)
        sgn_global = 1.0 - 2.0 * _parity(coord & zh)
        s = (sgn_global * sgn_local).astype(block.dtype)
        return carry + ak * s * block[idx ^ xl], None

    out, _ = jax.lax.scan(step, acc, (x_lo, z_hi, z_lo, a))
    return out


def _ppermute_xor(x, x_hi: int, n_dev: int):
    if x_hi == 0:
        return x
    perm = [(i, i ^ x_hi) for i in range(n_dev)]
    return jax.lax.ppermute(x, AXIS, perm)


# ----------------------------------------------------------- H application

def build_sharded_ham_fns(hamiltonian_sp: PauliSum, mesh: Mesh, cdtype=None):
    """(ham_apply(psi) -> H psi, energy(psi) -> <psi|H|psi>) sharded over the
    mesh.  One ppermute per distinct global-flip group."""
    cdtype = cdtype or default_cdtype()
    d = log2_devices(mesh)
    n = hamiltonian_sp.nbqbits
    if n <= d:
        raise ValueError(f"need n > log2(devices): n={n}, d={d}")
    L = n - d
    g = group_by_xhi(compile_pauli_sum(hamiltonian_sp, n), d)
    n_dev = mesh.shape[AXIS]
    np_c = np.complex128 if cdtype == jnp.complex128 else np.complex64
    const = np.asarray(g.const, dtype=np_c)
    groups = [(g.x_hi[i], g.x_lo[i], g.z_hi[i], g.z_lo[i],
               g.a[i].astype(np_c)) for i in range(len(g.x_hi))]

    def local_ham_apply(psi_local):
        coord = jax.lax.axis_index(AXIS)
        acc = const * psi_local
        for (xh, xl, zh, zl, a) in groups:
            block = _ppermute_xor(psi_local, xh, n_dev)
            acc = _group_apply_local(block, coord, xl, zh, zl, a, L, acc)
        return acc

    spec = P(AXIS)
    ham_apply = shard_map(local_ham_apply, mesh=mesh, in_specs=(spec,),
                          out_specs=spec)

    def local_energy(psi_local):
        sigma = local_ham_apply(psi_local)
        e = jnp.real(jnp.vdot(psi_local, sigma))
        return jax.lax.psum(e, AXIS)

    energy = shard_map(local_energy, mesh=mesh, in_specs=(spec,),
                       out_specs=P())

    return jax.jit(ham_apply), jax.jit(energy)


# ------------------------------------------------------------- ansatz + VQE

def build_sharded_energy_fn(hamiltonian_sp: PauliSum,
                            generators: Sequence[PauliSum],
                            hf_init: int, mesh: Mesh, cdtype=None):
    """Sharded VQE objective: energy(theta) with the ansatz
    prod_t exp(i theta_{op(t)} w_t sigma_t) applied across the mesh, plus its
    exact gradient by reversible adjoint (two sharded sweeps, O(1) state
    memory; the backward ppermutes are the forward ones inverted)."""
    from ..sim.compile import compile_op_sequence

    cdtype = cdtype or default_cdtype()
    d = log2_devices(mesh)
    n = hamiltonian_sp.nbqbits
    L = n - d
    n_dev = mesh.shape[AXIS]
    np_c = np.complex128 if cdtype == jnp.complex128 else np.complex64
    lo_mask = (1 << L) - 1

    seq = compile_op_sequence(generators, n)
    # per-term static masks (rotation sequence is unrolled at trace time)
    terms = [(int(seq.x[t]) >> L, int(seq.x[t]) & lo_mask,
              int(seq.z[t]) >> L, int(seq.z[t]) & lo_mask,
              complex(seq.kappa[t]), float(np.real(seq.w[t])),
              int(seq.op_index[t])) for t in range(seq.n_terms)]
    n_ops = seq.n_ops

    gham = group_by_xhi(compile_pauli_sum(hamiltonian_sp, n), d)
    hgroups = [(gham.x_hi[i], gham.x_lo[i], gham.z_hi[i], gham.z_lo[i],
                gham.a[i].astype(np_c)) for i in range(len(gham.x_hi))]
    hconst = np.asarray(gham.const, dtype=np_c)

    psi0 = np.zeros(1 << n, dtype=np_c)
    psi0[hf_init] = 1.0

    idx = None  # built inside traced fns

    def _sigma_apply(p, coord, xh, xl, zh, zl, kappa):
        """kappa * sigma |p> for one static-mask term (sharded local view)."""
        block = _ppermute_xor(p, xh, n_dev)
        li = _local_indices(L)
        sgn = ((1.0 - 2.0 * _parity(li & zl))
               * (1.0 - 2.0 * _parity(coord & zh))).astype(p.dtype)
        return kappa * sgn * block[li ^ xl]

    def _rot(p, coord, term, theta, sign=1.0):
        xh, xl, zh, zl, kappa, w, op = term
        angle = sign * theta[op] * w
        sp = _sigma_apply(p, coord, xh, xl, zh, zl, kappa)
        return jnp.cos(angle) * p + (1j * jnp.sin(angle)) * sp

    def _lham(p, coord):
        acc = hconst * p
        for (xh, xl, zh, zl, a) in hgroups:
            block = _ppermute_xor(p, xh, n_dev)
            acc = _group_apply_local(block, coord, xl, zh, zl, a, L, acc)
        return acc

    def local_forward(theta, p0):
        coord = jax.lax.axis_index(AXIS)
        p = p0
        for term in terms:
            p = _rot(p, coord, term, theta)
        return p

    def local_energy(theta, p0):
        coord = jax.lax.axis_index(AXIS)
        p = local_forward(theta, p0)
        e = jnp.real(jnp.vdot(p, _lham(p, coord)))
        return jax.lax.psum(e, AXIS)

    def local_energy_grad(theta, p0):
        coord = jax.lax.axis_index(AXIS)
        p = local_forward(theta, p0)
        e = jax.lax.psum(jnp.real(jnp.vdot(p, _lham(p, coord))), AXIS)
        lam = _lham(p, coord)
        grad = jnp.zeros(n_ops, dtype=jnp.float32 if cdtype == jnp.complex64
                         else jnp.float64)
        for term in reversed(terms):
            xh, xl, zh, zl, kappa, w, op = term
            sp = _sigma_apply(p, coord, xh, xl, zh, zl, kappa)
            gt = -2.0 * jnp.imag(jnp.vdot(lam, sp)) * w
            gt = jax.lax.psum(gt, AXIS)
            angle = theta[op] * w
            p = jnp.cos(angle) * p - (1j * jnp.sin(angle)) * sp
            lam = _rot(lam, coord, term, theta, sign=-1.0)
            grad = grad.at[op].add(gt)
        return e, grad

    spec = P(AXIS)
    forward = shard_map(local_forward, mesh=mesh, in_specs=(P(), spec),
                        out_specs=spec)
    energy = shard_map(local_energy, mesh=mesh, in_specs=(P(), spec),
                       out_specs=P())
    energy_and_grad = shard_map(local_energy_grad, mesh=mesh,
                                in_specs=(P(), spec), out_specs=(P(), P()))

    sharding = NamedSharding(mesh, spec)
    psi0_dev = jax.device_put(psi0, sharding)

    return (jax.jit(lambda th: energy(th, psi0_dev)),
            jax.jit(lambda th: energy_and_grad(th, psi0_dev)),
            jax.jit(lambda th: forward(th, psi0_dev)))


def sharded_vqe_step(hamiltonian_sp: PauliSum, generators: Sequence[PauliSum],
                     hf_init: int, mesh: Mesh, lr: float = 0.05):
    """One full sharded training step (energy + adjoint gradient + SGD
    update), jitted over the mesh — the multi-chip 'training step' used by
    the driver dry-run."""
    _, energy_and_grad, _ = build_sharded_energy_fn(hamiltonian_sp,
                                                    generators, hf_init, mesh)

    @jax.jit
    def step(theta):
        e, g = energy_and_grad(theta)
        return theta - lr * g, e

    return step
