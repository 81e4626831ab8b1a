"""Mesh-sharded statevector engine (multi-chip scaling path).

The reference caps out where one process's memory ends (its scaling axis is
qubit count; dense 2^n work at adapt/fermionic_adapt_vqe.py:474 — SURVEY.md
§2.2).  Here the amplitude vector — stored as split-real planes (2, 2^n),
see sim.statevector — is sharded over a 1-D device mesh ("q", 2^d devices):
each device holds the 2^(n-d) amplitudes whose top d index bits (qubits
0..d-1, MSB convention) equal its mesh coordinate.

Pauli-string action splits by construction:
  * x_lo bits (local qubits)  -> local index XOR (gather)
  * x_hi bits (global qubits) -> a *device permutation*: amplitudes move to
    device (coord XOR x_hi) — one `lax.ppermute` over ICI, the statevector
    analog of tensor-parallel collectives.
  * sign masks split as parity(j & z) = parity(coord & z_hi) XOR
    parity(j_lo & z_lo) — no communication.

The Hamiltonian is compiled into x_hi-groups: one ppermute per distinct
global-flip pattern, so the collective count is <= 2^d per H-application
regardless of term count.  Everything is `shard_map` over an explicit Mesh
and backend-agnostic (virtual CPU mesh in tests, TPU pod slices in
production).
"""

from __future__ import annotations

from dataclasses import dataclass
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
from ..sim.statevector import _use_mxu_xor, _xor_permute, default_rdtype

AXIS = "q"
SPEC = P(None, AXIS)   # planes dim replicated, amplitude dim sharded


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    if len(devs) & (len(devs) - 1):
        raise ValueError(f"mesh size must be a power of two, got {len(devs)}")
    return Mesh(np.array(devs), (AXIS,))


def log2_devices(mesh: Mesh) -> int:
    return int(np.log2(mesh.shape[AXIS]))


def sharded_hf_state(n: int, hf_init: int, mesh: Mesh):
    """|hf_init> planes distributed over the mesh."""
    psi = np.zeros((2, 1 << n), dtype=default_rdtype())
    psi[0, hf_init] = 1.0
    return jax.device_put(psi, NamedSharding(mesh, SPEC))


# ---------------------------------------------------------------- grouping

@dataclass
class GroupedPauliSum:
    """Hamiltonian terms grouped by their global-qubit flip pattern x_hi."""
    n: int
    d: int
    x_hi: List[int]
    x_lo: List[np.ndarray]
    z_hi: List[np.ndarray]
    z_lo: List[np.ndarray]
    a_re: List[np.ndarray]
    a_im: List[np.ndarray]
    c_re: float
    c_im: float


def group_by_xhi(c: CompiledPauliSum, d: int) -> GroupedPauliSum:
    n = c.n
    L = n - d
    lo_mask = (1 << L) - 1
    groups: Dict[int, List[int]] = {}
    for k in range(c.n_terms):
        groups.setdefault(int(c.x[k]) >> L, []).append(k)
    rd = default_rdtype()
    coeffs = c.coeffs()
    g = GroupedPauliSum(n=n, d=d, x_hi=[], x_lo=[], z_hi=[], z_lo=[],
                        a_re=[], a_im=[], c_re=float(np.real(c.const)),
                        c_im=float(np.imag(c.const)))
    for xh in sorted(groups):
        idx = np.asarray(groups[xh])
        g.x_hi.append(xh)
        g.x_lo.append((c.x[idx] & lo_mask).astype(np.int32))
        g.z_hi.append((c.z[idx] >> L).astype(np.int32))
        g.z_lo.append((c.z[idx] & lo_mask).astype(np.int32))
        g.a_re.append(np.real(coeffs[idx]).astype(rd))
        g.a_im.append(np.imag(coeffs[idx]).astype(rd))
    return g


# ------------------------------------------------------------ local kernels

def _local_indices(L: int):
    return jax.lax.iota(jnp.int32, 1 << L)


def _parity_sign(v, dtype):
    return (1.0 - 2.0 * (jax.lax.population_count(v) & 1)).astype(dtype)


def _signed_gather_local(block, coord, x_lo, z_hi, z_lo, L):
    """Local signed-XOR application; the global part of the sign is a scalar
    from the device coordinate.  On accelerators the local XOR+sign goes
    through the MXU permutation-matmul path (XLA TPU gathers are serial);
    CPU keeps the plain gather."""
    g = _parity_sign(coord & z_hi, block.dtype)
    if _use_mxu_xor():
        return g * _xor_permute(block, x_lo, z_lo)
    idx = _local_indices(L)
    s = g * _parity_sign(idx & z_lo, block.dtype)
    return s[None, :] * block[:, idx ^ x_lo]


def _cmul(t, c_re, c_im):
    return jnp.stack([c_re * t[0] - c_im * t[1],
                      c_re * t[1] + c_im * t[0]])


def _group_apply_local(block, coord, x_lo, z_hi, z_lo, a_re, a_im, L, acc):
    """acc += sum_k a_k sigma_k(block) for one x_hi group (block already
    holds the partner device's amplitudes)."""
    def step(carry, term):
        xl, zh, zl, ar, ai = term
        t = _signed_gather_local(block, coord, xl, zh, zl, L)
        return carry + _cmul(t, ar, ai), None

    out, _ = jax.lax.scan(step, acc, (x_lo, z_hi, z_lo, a_re, a_im))
    return out


def _ppermute_xor(x, x_hi: int, n_dev: int):
    if x_hi == 0:
        return x
    perm = [(i, i ^ x_hi) for i in range(n_dev)]
    return jax.lax.ppermute(x, AXIS, perm)


# ----------------------------------------------------------- H application

def build_sharded_ham_fns(hamiltonian_sp: PauliSum, mesh: Mesh):
    """(ham_apply(psi) -> H psi, energy(psi) -> <psi|H|psi>) sharded over
    the mesh; one ppermute per distinct global-flip group."""
    d = log2_devices(mesh)
    n = hamiltonian_sp.nbqbits
    if n <= d:
        raise ValueError(f"need n > log2(devices): n={n}, d={d}")
    L = n - d
    g = group_by_xhi(compile_pauli_sum(hamiltonian_sp, n), d)
    n_dev = mesh.shape[AXIS]
    groups = list(zip(g.x_hi, g.x_lo, g.z_hi, g.z_lo, g.a_re, g.a_im))

    def local_ham_apply(psi_local):
        coord = jax.lax.axis_index(AXIS)
        acc = _cmul(psi_local, g.c_re, g.c_im)
        for (xh, xl, zh, zl, ar, ai) in groups:
            block = _ppermute_xor(psi_local, xh, n_dev)
            acc = _group_apply_local(block, coord, xl, zh, zl, ar, ai, L, acc)
        return acc

    ham_apply = shard_map(local_ham_apply, mesh=mesh, in_specs=(SPEC,),
                          out_specs=SPEC)

    def local_energy(psi_local):
        sigma = local_ham_apply(psi_local)
        e = jnp.sum(psi_local * sigma)  # Re<psi|sigma> for Hermitian H
        return jax.lax.psum(e, AXIS)

    energy = shard_map(local_energy, mesh=mesh, in_specs=(SPEC,), out_specs=P())

    return jax.jit(ham_apply), jax.jit(energy)


# ------------------------------------------------------------- ansatz + VQE

def build_sharded_energy_fn(hamiltonian_sp: PauliSum,
                            generators: Sequence[PauliSum],
                            hf_init: int, mesh: Mesh):
    """Sharded VQE objective: energy(theta), energy_and_grad(theta) (exact
    reversible adjoint: two sharded sweeps, O(1) state memory; the backward
    ppermutes are the forward ones inverted), and forward(theta)."""
    from ..sim.compile import compile_op_sequence

    d = log2_devices(mesh)
    n = hamiltonian_sp.nbqbits
    L = n - d
    n_dev = mesh.shape[AXIS]
    rd = default_rdtype()
    lo_mask = (1 << L) - 1

    seq = compile_op_sequence(generators, n)
    terms = [(int(seq.x[t]) >> L, int(seq.x[t]) & lo_mask,
              int(seq.z[t]) >> L, int(seq.z[t]) & lo_mask,
              float(np.real(seq.kappa[t])), float(np.imag(seq.kappa[t])),
              float(np.real(seq.w[t])), int(seq.op_index[t]))
             for t in range(seq.n_terms)]
    n_ops = seq.n_ops

    gham = group_by_xhi(compile_pauli_sum(hamiltonian_sp, n), d)
    hgroups = list(zip(gham.x_hi, gham.x_lo, gham.z_hi, gham.z_lo,
                       gham.a_re, gham.a_im))

    psi0 = np.zeros((2, 1 << n), dtype=rd)
    psi0[0, hf_init] = 1.0

    def _sigma_apply(p, coord, xh, xl, zh, zl, kr, ki):
        block = _ppermute_xor(p, xh, n_dev)
        return _cmul(_signed_gather_local(block, coord, xl, zh, zl, L), kr, ki)

    def _rot(p, coord, term, theta, sign=1.0):
        xh, xl, zh, zl, kr, ki, w, op = term
        angle = -sign * theta[op] * w   # exp(-i theta G) convention
        sp = _sigma_apply(p, coord, xh, xl, zh, zl, kr, ki)
        c, s = jnp.cos(angle), jnp.sin(angle)
        return jnp.stack([c * p[0] - s * sp[1], c * p[1] + s * sp[0]])

    def _lham(p, coord):
        acc = _cmul(p, gham.c_re, gham.c_im)
        for (xh, xl, zh, zl, ar, ai) in hgroups:
            block = _ppermute_xor(p, xh, n_dev)
            acc = _group_apply_local(block, coord, xl, zh, zl, ar, ai, L, acc)
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
        return jax.lax.psum(jnp.sum(p * _lham(p, coord)), AXIS)

    def local_energy_grad(theta, p0):
        coord = jax.lax.axis_index(AXIS)
        p = local_forward(theta, p0)
        lam = _lham(p, coord)
        e = jax.lax.psum(jnp.sum(p * lam), AXIS)
        grad = jnp.zeros(n_ops, dtype=rd)
        for term in reversed(terms):
            xh, xl, zh, zl, kr, ki, w, op = term
            sp = _sigma_apply(p, coord, xh, xl, zh, zl, kr, ki)
            # g = -2 Im <lam|sigma p> * w ; Im<a|b> = a_re.b_im - a_im.b_re
            im_ov = jax.lax.psum(
                jnp.sum(lam[0] * sp[1] - lam[1] * sp[0]), AXIS)
            gt = 2.0 * im_ov * w
            angle = -theta[op] * w
            c, s = jnp.cos(angle), jnp.sin(angle)
            p = jnp.stack([c * p[0] + s * sp[1], c * p[1] - s * sp[0]])
            lam = _rot(lam, coord, term, theta, sign=-1.0)
            grad = grad.at[op].add(gt)
        return e, grad

    forward = shard_map(local_forward, mesh=mesh, in_specs=(P(), SPEC),
                        out_specs=SPEC)
    energy = shard_map(local_energy, mesh=mesh, in_specs=(P(), SPEC),
                       out_specs=P())
    energy_and_grad = shard_map(local_energy_grad, mesh=mesh,
                                in_specs=(P(), SPEC), out_specs=(P(), P()))

    psi0_dev = jax.device_put(psi0, NamedSharding(mesh, SPEC))

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
