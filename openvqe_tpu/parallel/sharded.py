"""Mesh-sharded statevector engine (multi-chip scaling path).

The reference caps out where one process's memory ends (its scaling axis is
qubit count; dense 2^n work at adapt/fermionic_adapt_vqe.py:474 — SURVEY.md
§2.2).  Here the amplitude planes (2, 2^n) are sharded over a 1-D device
mesh ("q", 2^d devices): each device holds the 2^(n-d) amplitudes whose top
d index bits (qubits 0..d-1, MSB convention) equal its mesh coordinate.

A grouped Pauli action (sim/grouped.py) splits by construction:

  * x_hi bits (global qubits)  -> a device permutation: ONE logical
    `lax.ppermute` over ICI per group — realized as d masked pairwise
    ppermutes so the pattern can be a traced value inside `lax.scan`
    (collective permutations must be static; the mask is not).
  * x_lo bits (local qubits)   -> the local XOR kernel (MXU permutation
    matmuls on TPU, gather on CPU).
  * signs: s_z(j) = s(coord & z_hi) * s(j_lo & z_lo) — the coord factor is
    a per-term scalar folded into the group coefficients, the local factor
    rides the usual rank-K sign-field matmul.

Everything is `shard_map` over an explicit Mesh with the group arrays as
traced scan operands: one compiled executable regardless of pool size,
reused across ADAPT growth via padding (ShardedVQEObjective mirrors
sim.objective.VQEObjective).  Large systems run segmented (the axon backend
kills device calls past ~10 s): fixed-shape jitted shard_map pieces called
from a host loop, psi staying resident and sharded between calls.
"""

from __future__ import annotations

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
from ..sim import grouped as gr
from ..sim.compile import compile_op_sequence, compile_pauli_sum, compile_pool
from ..sim.statevector import bucket_size, default_rdtype, segment_size

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


# --------------------------------------------------------- local primitives

def _dyn_ppermute(block, x_hi, d: int):
    """block moved from device (coord ^ x_hi) — x_hi a TRACED mask: d masked
    pairwise exchanges (ppermute patterns must be static; the selects are
    not).  x_hi == 0 groups skip the wire entirely: the exchanges sit under
    a ``lax.cond`` whose predicate is replicated across the mesh (every
    device scans the same group arrays), so local groups cost zero
    collectives while the whole group scan stays ONE executable."""
    n_dev = 1 << d

    def exchange(blk):
        for b in range(d):
            perm = [(i, i ^ (1 << b)) for i in range(n_dev)]
            swapped = jax.lax.ppermute(blk, AXIS, perm)
            bit = ((x_hi >> b) & 1).astype(bool)
            blk = jnp.where(bit, swapped, blk)
        return blk

    return jax.lax.cond(x_hi > 0, exchange, lambda blk: blk, block)


def _coord_signs(z_hi, coord, dtype):
    """(K,) per-term sign factor from the device coordinate."""
    return (1 - 2 * (jax.lax.population_count(coord & z_hi) & 1)).astype(dtype)


def _split_ham(gham: gr.GroupedPauliSum, d: int):
    """Host-side split of grouped-Hamiltonian masks at the device boundary."""
    n = gham.n
    L = n - d
    lo = (1 << L) - 1
    return dict(
        n_loc=L,
        zd_hi=(gham.z_diag >> L).astype(np.int32),
        zd_lo=(gham.z_diag & lo).astype(np.int32),
        adr=gham.a_diag_re, adi=gham.a_diag_im,
        x_hi=(gham.x >> L).astype(np.int32),
        x_lo=(gham.x & lo).astype(np.int32),
        z_hi=(gham.z >> L).astype(np.int32),
        z_lo=(gham.z & lo).astype(np.int32),
        a_re=gham.a_re, a_im=gham.a_im,
        c_re=np.asarray(gham.c_re, default_rdtype()),
        hermitian=gham.hermitian,
    )


def _split_seq(gseq: gr.GroupedOpSequence, d: int):
    L = gseq.n - d
    lo = (1 << L) - 1
    return ((gseq.x >> L).astype(np.int32), (gseq.x & lo).astype(np.int32),
            (gseq.z >> L).astype(np.int32), (gseq.z & lo).astype(np.int32),
            gseq.s, gseq.op)


def _local_ham_apply(psi_loc, h, d: int, include_const: bool = True):
    """H|psi> restricted to this device's block (h = _split_ham dict)."""
    coord = jax.lax.axis_index(AXIS)
    L, herm = h["n_loc"], h["hermitian"]
    acc = h["c_re"] * psi_loc if include_const else jnp.zeros_like(psi_loc)
    if len(h["zd_hi"]):
        sc = _coord_signs(jnp.asarray(h["zd_hi"]), coord, psi_loc.dtype)
        w_re = gr._sign_field(h["zd_lo"],
                              jnp.asarray(h["adr"], psi_loc.dtype) * sc,
                              L).reshape(-1)
        acc = acc + w_re[None, :] * psi_loc
        if not herm:
            w_im = gr._sign_field(h["zd_lo"],
                                  jnp.asarray(h["adi"], psi_loc.dtype) * sc,
                                  L).reshape(-1)
            acc = acc + jnp.stack([-w_im * psi_loc[1], w_im * psi_loc[0]])

    if len(h["x_hi"]):
        def step(a, g):
            xh, xl, zh, zl, ar, ai = g
            block = _dyn_ppermute(psi_loc, xh, d)
            pxl = gr.xor_perm(block, xl)
            sc = _coord_signs(zh, coord, psi_loc.dtype)
            w_re = gr._sign_field(zl, ar * sc, L).reshape(-1)
            if herm:
                a = a + w_re[None, :] * pxl
            else:
                w_im = gr._sign_field(zl, ai * sc, L).reshape(-1)
                a = a + jnp.stack([w_re * pxl[0] - w_im * pxl[1],
                                   w_re * pxl[1] + w_im * pxl[0]])
            return a, None

        acc, _ = jax.lax.scan(step, acc, (h["x_hi"], h["x_lo"], h["z_hi"],
                                          h["z_lo"], h["a_re"], h["a_im"]))
    return acc


def _local_expectation(psi_loc, h, d: int):
    """This device's partial of Re <psi|H|psi> (caller psums)."""
    coord = jax.lax.axis_index(AXIS)
    L, herm = h["n_loc"], h["hermitian"]
    R, lanes = gr._lane_split(L)
    acc = h["c_re"] * jnp.sum(psi_loc * psi_loc)
    if len(h["zd_hi"]):
        sc = _coord_signs(jnp.asarray(h["zd_hi"]), coord, psi_loc.dtype)
        p2 = (psi_loc[0] ** 2 + psi_loc[1] ** 2).reshape(R, lanes)
        acc = acc + jnp.sum(jnp.asarray(h["adr"], psi_loc.dtype) * sc
                            * gr._group_bilinear(p2, h["zd_lo"], L))

    if len(h["x_hi"]):
        def step(a, g):
            xh, xl, zh, zl, ar, ai = g
            block = _dyn_ppermute(psi_loc, xh, d)
            pxl = gr.xor_perm(block, xl)
            sc = _coord_signs(zh, coord, psi_loc.dtype)
            Pm = (psi_loc[0] * pxl[0] + psi_loc[1] * pxl[1]).reshape(R, lanes)
            a = a + jnp.sum(ar * sc * gr._group_bilinear(Pm, zl, L))
            if not herm:
                Qm = (psi_loc[0] * pxl[1]
                      - psi_loc[1] * pxl[0]).reshape(R, lanes)
                a = a - jnp.sum(ai * sc * gr._group_bilinear(Qm, zl, L))
            return a, None

        acc, _ = jax.lax.scan(step, acc, (h["x_hi"], h["x_lo"], h["z_hi"],
                                          h["z_lo"], h["a_re"], h["a_im"]))
    return acc


def _local_apply(psi_loc, theta, seq6, L: int, d: int,
                 reverse: bool = False, sign: float = 1.0, fmode: int = 0):
    """Grouped rotation sweep on the local block.  The device-local field
    (z_hi signs folded into the coefficients) is a RESTRICTION of the global
    field to this block, so the sequence's fmode certificate carries over
    unchanged."""
    coord = jax.lax.axis_index(AXIS)

    def step(p, g):
        xh, xl, zh, zl, sg, og = g
        sc = _coord_signs(zh, coord, p.dtype)
        phi = gr._sign_field(zl, sg * sc, L).reshape(-1)
        block = _dyn_ppermute(p, xh, d)
        pxl = gr.xor_perm(block, xl)
        c, s = gr.rot_cos_sin((-sign) * theta[og], phi, fmode)
        return c[None, :] * p + s[None, :] * pxl, None

    out, _ = jax.lax.scan(step, psi_loc, seq6, reverse=reverse)
    return out


def _local_adjoint(theta, p, l, grad, seq6, L: int, d: int,
                   fmode: int = 0):
    """Reversible adjoint on the local block.  Each group's gradient entry
    is psum'd inside the scan so ``grad`` stays REPLICATED — required for
    the segmented host loop that carries it between device calls."""
    coord = jax.lax.axis_index(AXIS)

    def step(carry, g):
        p, l, gr_ = carry
        xh, xl, zh, zl, sg, og = g
        sc = _coord_signs(zh, coord, p.dtype)
        phi = gr._sign_field(zl, sg * sc, L).reshape(-1)
        c, s = gr.rot_cos_sin(-theta[og], phi, fmode)
        pxl = gr.xor_perm(_dyn_ppermute(p, xh, d), xl)
        gt = jax.lax.psum(-2.0 * jnp.sum(phi[None, :] * l * pxl), AXIS)
        p_prev = c[None, :] * p - s[None, :] * pxl
        lxl = gr.xor_perm(_dyn_ppermute(l, xh, d), xl)
        l_prev = c[None, :] * l - s[None, :] * lxl
        return (p_prev, l_prev, gr_.at[og].add(gt)), None

    (p, l, grad), _ = jax.lax.scan(step, (p, l, grad), seq6, reverse=True)
    return p, l, grad


# ----------------------------------------------------------- public builders

def build_sharded_ham_fns(hamiltonian_sp: PauliSum, mesh: Mesh):
    """(ham_apply(psi) -> H psi, energy(psi) -> <psi|H|psi>) sharded over
    the mesh."""
    d = log2_devices(mesh)
    n = hamiltonian_sp.nbqbits
    if n <= d:
        raise ValueError(f"need n > log2(devices): n={n}, d={d}")
    h = _split_ham(gr.group_pauli_sum(compile_pauli_sum(hamiltonian_sp, n)), d)

    ham_apply = shard_map(lambda pl_: _local_ham_apply(pl_, h, d),
                          mesh=mesh, in_specs=(SPEC,), out_specs=SPEC)

    def local_energy(pl_):
        return jax.lax.psum(_local_expectation(pl_, h, d), AXIS)

    energy = shard_map(local_energy, mesh=mesh, in_specs=(SPEC,), out_specs=P())
    return jax.jit(ham_apply), jax.jit(energy)


class ShardedVQEObjective:
    """Mesh-parallel mirror of sim.objective.VQEObjective: one jitted
    shard_map program per padded ansatz bucket, rebound (not recompiled) as
    an ADAPT ansatz grows."""

    def __init__(self, hamiltonian_sp: PauliSum, mesh: Mesh,
                 n: Optional[int] = None, segmented: Optional[bool] = None):
        self.mesh = mesh
        self.d = log2_devices(mesh)
        self.n = n if n is not None else hamiltonian_sp.nbqbits
        if self.n <= self.d:
            raise ValueError(f"need n > log2(devices): n={self.n}, d={self.d}")
        self.L = self.n - self.d
        self.gham = gr.group_pauli_sum(compile_pauli_sum(hamiltonian_sp,
                                                         self.n))
        self._h = _split_ham(self.gham, self.d)
        if segmented is None:
            # per-call budget is per DEVICE: local work = groups * 2^(n-d)
            from ..sim.statevector import _CALL_WORK_BUDGET
            work = (2 * self.gham.n_groups + 2) * float(1 << self.L)
            segmented = work > _CALL_WORK_BUDGET
        self.segmented = bool(segmented)
        self.seg = gr.grouped_segment_size(self.L) if self.segmented else None
        self._build_programs()
        self._seq_prog_cache: Dict[int, Dict[str, object]] = {}
        self._psi0_cache: Dict[int, jax.Array] = {}

    # -- jitted shard_map programs (ham static, sequence traced) -----------
    def _build_programs(self):
        mesh, d, h = self.mesh, self.d, self._h

        def l_ham(psi_loc):
            return _local_ham_apply(psi_loc, h, d)

        def l_expect(psi_loc):
            return jax.lax.psum(_local_expectation(psi_loc, h, d), AXIS)

        sm = lambda f, ins, outs: jax.jit(shard_map(
            f, mesh=mesh, in_specs=ins, out_specs=outs))
        self._lham = sm(l_ham, (SPEC,), SPEC)
        self._expect = sm(l_expect, (SPEC,), P())

    def _seq_programs(self, fmode: int = 0) -> Dict[str, object]:
        """Sequence programs per field mode (grouped.rot_cos_sin)."""
        if fmode in self._seq_prog_cache:
            return self._seq_prog_cache[fmode]
        mesh, d, L, h = self.mesh, self.d, self.L, self._h
        seq_specs = (P(),) * 6

        def l_energy(theta, psi_loc, *seq6):
            p = _local_apply(psi_loc, theta, seq6, L, d, fmode=fmode)
            return jax.lax.psum(_local_expectation(p, h, d), AXIS)

        def l_energy_grad(theta, psi_loc, *seq6):
            p = _local_apply(psi_loc, theta, seq6, L, d, fmode=fmode)
            # one H pass serves both: e = Re<psi|lam> + const <psi|psi>
            lam0 = _local_ham_apply(p, h, d, include_const=False)
            e = jax.lax.psum(jnp.sum(p * lam0)
                             + h["c_re"] * jnp.sum(p * p), AXIS)
            lam = lam0 + h["c_re"] * p
            grad0 = jnp.zeros_like(theta)
            _, _, grad = _local_adjoint(theta, p, lam, grad0, seq6, L, d,
                                        fmode=fmode)
            return e, grad

        def l_forward(theta, psi_loc, *seq6):
            return _local_apply(psi_loc, theta, seq6, L, d, fmode=fmode)

        sm = lambda f, ins, outs: jax.jit(shard_map(
            f, mesh=mesh, in_specs=ins, out_specs=outs))
        progs = {
            "energy": sm(l_energy, (P(), SPEC) + seq_specs, P()),
            "energy_and_grad": sm(l_energy_grad, (P(), SPEC) + seq_specs,
                                  (P(), P())),
            "forward": sm(l_forward, (P(), SPEC) + seq_specs, SPEC),
        }
        if self.segmented:
            def l_apply_seg(theta, psi_loc, *seq6):
                return _local_apply(psi_loc, theta, seq6, L, d, fmode=fmode)

            def l_adj_seg(theta, p, lam, grad, *seq6):
                return _local_adjoint(theta, p, lam, grad, seq6, L, d,
                                      fmode=fmode)

            progs["apply_seg"] = sm(l_apply_seg, (P(), SPEC) + seq_specs,
                                    SPEC)
            progs["adj_seg"] = sm(
                l_adj_seg, (P(), SPEC, SPEC, P()) + seq_specs,
                (SPEC, SPEC, P()))
        self._seq_prog_cache[fmode] = progs
        return progs

    def _psi0(self, hf_init: int):
        if hf_init not in self._psi0_cache:
            self._psi0_cache[hf_init] = sharded_hf_state(self.n, hf_init,
                                                         self.mesh)
        return self._psi0_cache[hf_init]

    def bind(self, generators: Sequence[PauliSum], hf_init: int):
        seq = compile_op_sequence(generators, self.n)
        gseq = gr.group_op_sequence(seq)
        if gseq is None:
            raise ValueError("sharded path requires odd-Y generator groups "
                             "(all fermionic/qubit pools are)")
        if not self.segmented and gseq.n_groups:
            G, K = gseq.z.shape
            gseq = gr.pad_grouped_sequence(gseq, bucket_size(G), max(K, 8))
        return ShardedBoundAnsatz(self, _split_seq(gseq, self.d),
                                  self._psi0(hf_init), len(generators),
                                  fmode=gseq.fmode)

    # device-side Hamiltonian services
    def ham_apply(self, psi):
        return self._lham(psi)

    def expectation(self, psi) -> float:
        return float(self._expect(psi))


class ShardedBoundAnsatz:

    def __init__(self, obj: ShardedVQEObjective, seq6, psi0, n_ops: int,
                 fmode: int = 0):
        self._obj = obj
        self._seq6 = seq6
        self._psi0 = psi0
        self._fmode = fmode
        self.n_ops = n_ops

    def _progs(self):
        return self._obj._seq_programs(self._fmode)

    def _segments(self):
        seg = self._obj.seg
        gx = self._seq6[0]
        G = len(gx)
        ns = max(1, -(-G // seg))
        padded = gr._pad_group_axis([np.asarray(a) for a in self._seq6],
                                    ns * seg)
        return [tuple(a.reshape((ns, seg) + a.shape[1:])[i] for a in padded)
                for i in range(ns)]

    def forward(self, theta):
        theta = jnp.asarray(theta, dtype=float)
        obj = self._obj
        if not obj.segmented:
            return self._progs()["forward"](theta, self._psi0, *self._seq6)
        psi = self._psi0
        for seq6 in self._segments():
            psi = self._progs()["apply_seg"](theta, psi, *seq6)
        return psi

    def energy(self, theta) -> float:
        theta = jnp.asarray(theta, dtype=float)
        obj = self._obj
        if not obj.segmented:
            return float(self._progs()["energy"](theta, self._psi0,
                                                 *self._seq6))
        return float(obj._expect(self.forward(theta)))

    def energy_and_grad(self, theta) -> Tuple[float, np.ndarray]:
        obj = self._obj
        theta = jnp.asarray(theta, dtype=float)
        if not obj.segmented:
            e, g = self._progs()["energy_and_grad"](theta, self._psi0,
                                                    *self._seq6)
            return float(e), np.asarray(g, dtype=float)
        psi = self.forward(theta)
        e = float(obj._expect(psi))
        lam = obj._lham(psi)
        grad = jnp.zeros(theta.shape, dtype=theta.dtype)
        p, l = psi, lam
        for seq6 in reversed(self._segments()):
            p, l, grad = self._progs()["adj_seg"](theta, p, l, grad, *seq6)
        return e, np.asarray(grad, dtype=float)

    def scipy_fun_jac(self, energies: Optional[List[float]] = None):
        cache: Dict[bytes, Tuple[float, np.ndarray]] = {}

        def evaluate(x):
            key = np.asarray(x, dtype=float).tobytes()
            if key not in cache:
                cache.clear()
                cache[key] = self.energy_and_grad(x)
                if energies is not None:
                    energies.append(cache[key][0])
            return cache[key]

        return (lambda x: evaluate(x)[0]), (lambda x: evaluate(x)[1])


def build_sharded_energy_fn(hamiltonian_sp: PauliSum,
                            generators: Sequence[PauliSum],
                            hf_init: int, mesh: Mesh):
    """(energy, energy_and_grad, forward) over the mesh — thin wrapper kept
    for API stability; see ShardedVQEObjective."""
    bound = ShardedVQEObjective(hamiltonian_sp, mesh).bind(generators,
                                                           hf_init)
    return (lambda th: bound.energy(th),
            lambda th: bound.energy_and_grad(th),
            lambda th: bound.forward(th))


def build_sharded_pool_gradient_fn(pool_ops: Sequence[PauliSum],
                                   obj: ShardedVQEObjective):
    """host-complex v_i = <H psi|A_i|psi> for the whole pool, sharded —
    the ADAPT screening pass over the mesh."""
    gpool = gr.group_pool(compile_pool(pool_ops, obj.n))
    d, L, mesh = obj.d, obj.L, obj.mesh
    lo = (1 << L) - 1
    px_hi = (gpool.x >> L).astype(np.int32)
    px_lo = (gpool.x & lo).astype(np.int32)
    pz_hi = (gpool.z >> L).astype(np.int32)
    pz_lo = (gpool.z & lo).astype(np.int32)
    n_ops = gpool.n_ops

    def l_overlaps(psi_loc, sig_loc):
        coord = jax.lax.axis_index(AXIS)
        R, lanes = gr._lane_split(L)

        def step(acc, g):
            xh, xl, zh, zl, ar, ai, og = g
            acc_re, acc_im = acc
            pxl = gr.xor_perm(_dyn_ppermute(psi_loc, xh, d), xl)
            sc = _coord_signs(zh, coord, psi_loc.dtype)
            Pm = (sig_loc[0] * pxl[0] + sig_loc[1] * pxl[1]).reshape(R, lanes)
            Qm = (sig_loc[0] * pxl[1] - sig_loc[1] * pxl[0]).reshape(R, lanes)
            t = gr._group_bilinear(Pm, zl, L) * sc
            u = gr._group_bilinear(Qm, zl, L) * sc
            acc_re = acc_re.at[og].add(jnp.sum(ar * t - ai * u))
            acc_im = acc_im.at[og].add(jnp.sum(ar * u + ai * t))
            return (acc_re, acc_im), None

        # the carry is device-varying (local partials, psum'd once at the
        # end) — mark it so under shard_map's varying-axis type system
        z0 = jax.lax.pcast(jnp.zeros(n_ops, dtype=psi_loc.dtype), AXIS,
                           to="varying")
        (vre, vim), _ = jax.lax.scan(
            step, (z0, z0),
            (px_hi, px_lo, pz_hi, pz_lo, gpool.a_re, gpool.a_im, gpool.op))
        return jax.lax.psum(jnp.stack([vre, vim]), AXIS)

    overlaps = jax.jit(shard_map(l_overlaps, mesh=mesh,
                                 in_specs=(SPEC, SPEC), out_specs=P()))

    def grads_host(psi) -> np.ndarray:
        sigma = obj.ham_apply(psi)
        out = np.asarray(overlaps(psi, sigma), dtype=np.float64)
        return out[0] + 1j * out[1]

    return grads_host


def sharded_vqe_step(hamiltonian_sp: PauliSum, generators: Sequence[PauliSum],
                     hf_init: int, mesh: Mesh, lr: float = 0.05):
    """One full sharded training step (energy + adjoint gradient + SGD
    update) — the multi-chip 'training step' used by the driver dry-run."""
    bound = ShardedVQEObjective(hamiltonian_sp, mesh).bind(generators,
                                                           hf_init)

    def step(theta):
        e, g = bound.energy_and_grad(theta)
        return np.asarray(theta, dtype=float) - lr * g, e

    return step
