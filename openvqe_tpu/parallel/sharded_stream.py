"""Streaming Pallas kernels composed with the mesh-sharded engine.

Round-2 VERDICT item 1: the single-chip streaming kernels (sim/streaming.py)
cap at 28 qubits (the adjoint's 4 streamed states x 2 GB); the sharded
engine (parallel/sharded.py) scales across the mesh but runs the plain XLA
grouped path.  This module composes the two — per-device streaming kernels
under ``shard_map``, with the cross-device part of each group's index-XOR
handled by ONE static ``ppermute`` per run of groups — extending the range
to 30+ qubits on a v5e pod.

Layout (as parallel/sharded.py): planes (2, 2^n) sharded over a 1-D mesh of
2^d devices; device ``coord`` holds j = coord * 2^L + j_loc, L = n - d.
A grouped Pauli action splits at the device boundary:

  x = x_dev * 2^L + x_loc,   z = z_dev * 2^L + z_loc

* ``z_dev`` contributes a per-term sign s_c = (-1)^popcount(coord & z_dev)
  — folded into the streamed coefficient rows per device (a (G, K, 1)
  elementwise multiply; the kernels are untouched).
* ``x_dev`` pairs device coord with coord ^ x_dev.

**The pair-closure trick** (rotations/adjoint, which are ordered): for a
run of consecutive groups sharing one x_dev, the pair (own block, partner
block) evolves CLOSED — each device can co-evolve both halves locally.  So:
exchange once per run (static ppermute), stack ``[own, partner]`` along the
amplitude axis, and run the EXISTING streaming kernels on the doubled
(2, 2^(L+1)) array with lifted masks:

  x' = 2^L | x_loc              (the half-selector bit joins the pairing)
  z'_k = z_loc_k | (f_k << L),  f_k = popcount(x_dev & z_dev_k) & 1

The f_k bit makes the in-kernel sign field evaluate the PARTNER half with
the partner's coordinate sign (s_partner = s_c * (-1)^f_k) — bitwise the
same update the partner computes for itself.  Own half is sliced out after
the run; consecutive same-x_dev groups amortize one exchange.  The adjoint
gets per-group gradients as (own + partner) contributions, so the mesh psum
double-counts nonlocal groups deterministically — divided by 2 on the host.

H-apply / expectation / the ADAPT pool screen are order-free and their
kernels already take TWO state arrays — nonlocal groups bucket by x_dev,
exchange once per bucket, and ride ``ham_apply_bucketed`` /
``pool_overlap_stream`` with the exchanged copy as the streamed operand.
No new kernel code exists in this module: every Pallas program is the
single-chip-validated one from sim/streaming.py.

The innermost local pass is swappable (``impl``):

* ``"stream"`` — the Pallas kernels (compiled on TPU; Mosaic TPU interpret
  mode — ``pltpu.InterpretParams`` — under shard_map on CPU, where plain
  ``interpret=True`` executes only device 0's shard).
* ``"xla"``    — ``sim.grouped`` programs on the SAME lifted masks: the
  full composition (splits, lifts, exchanges, run segmentation, gradient
  halving) is identical, only the innermost kernel differs.  Default on
  CPU (fast for tests/dry runs); parity between the two impls is asserted
  by tests/test_sharded_stream.py.

Reference analog: none — the reference has no distributed runtime at all
(SURVEY §2.2); this is the BASELINE north-star scaling axis.
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
from ..sim import grouped as gr
from ..sim import streaming as st
from ..sim.compile import compile_op_sequence, compile_pauli_sum, compile_pool
from .sharded import AXIS, SPEC, log2_devices, make_mesh, sharded_hf_state

__all__ = [
    "ShardedStreamObjective",
    "build_sharded_stream_pool_gradient_fn",
    "make_sharded_objective",
    "sharded_streaming_supported",
]


def make_sharded_objective(hamiltonian_sp: PauliSum, mesh: Mesh,
                           n: Optional[int] = None):
    """Policy mirror of sim.objective.VQEObjective's path choice, for the
    mesh: streaming kernels when the per-device state outgrows the VMEM
    2-state window (L > pallas_kernels.MAX_N_2STATE), the XLA grouped
    sharded engine otherwise.  OVQE_STREAM: 1 (default policy), 0 (off),
    force (wherever supported)."""
    import os

    from ..sim import pallas_kernels as pk
    from ..sim.statevector import default_rdtype
    from .sharded import ShardedVQEObjective

    n_ = n if n is not None else hamiltonian_sp.nbqbits
    d = log2_devices(mesh)
    env = os.environ.get("OVQE_STREAM", "1").lower()
    ok = (sharded_streaming_supported(n_, d)
          and default_rdtype() == np.float32)
    want = env == "force" or (n_ - d) > pk.MAX_N_2STATE
    if env != "0" and ok and want:
        return ShardedStreamObjective(hamiltonian_sp, mesh, n=n_)
    return ShardedVQEObjective(hamiltonian_sp, mesh, n=n_)


def sharded_streaming_supported(n: int, d: int) -> bool:
    """Local blocks must be streamable: L >= TILE_BITS + CHUNK_BITS (the
    lifted pair arrays then have L+1 >= MIN_N automatically)."""
    return (n - d) >= st.TILE_BITS + st.CHUNK_BITS


def _resolve_impl(impl: Optional[str]) -> str:
    if impl is not None:
        return impl
    import os
    env = os.environ.get("OVQE_SHSTREAM_IMPL")
    if env:
        if env not in ("stream", "xla"):
            raise ValueError(f"OVQE_SHSTREAM_IMPL must be stream|xla: {env}")
        return env
    return "stream" if jax.default_backend() in ("tpu", "axon") else "xla"


def _interpret_mode():
    """Kernel interpret argument: compiled on TPU backends; everywhere else
    the double-buffered streaming kernels cannot run under a multi-device
    shard_map (plain ``interpret=True`` executes only device 0's shard, and
    Mosaic TPU interpret mode — both DMA execution modes — deadlocks in its
    semaphore polling under the CPU SPMD executor; measured on jax 0.9).
    Off-TPU the ``impl="xla"`` engine runs the identical composition, and
    the kernel<->lift interplay is validated single-device in plain
    interpret mode (tests/test_sharded_stream.py::test_pair_lift_kernel*)."""
    if jax.default_backend() in ("tpu", "axon"):
        return False
    raise ValueError(
        "impl='stream' needs a TPU backend (the streaming kernels deadlock "
        "under interpret mode inside multi-device shard_map); use "
        "impl='xla' on CPU — it runs the identical composition")


def _perm(x_dev: int, n_dev: int):
    return [(i, i ^ x_dev) for i in range(n_dev)]


def _coord_sign_factor(z_dev_rows, dtype):
    """(G, K, 1) per-term coefficient sign from this device's coordinate
    (inside shard_map)."""
    coord = jax.lax.axis_index(AXIS)
    return (1 - 2 * (jax.lax.population_count(coord & z_dev_rows) & 1)
            ).astype(dtype)


# ------------------------------------------------------- host-side lowering

@dataclass
class _Run:
    """One homogeneous segment of the ordered group sequence."""
    x_dev: int              # 0 = local run
    n_eff: int              # amplitude-space bits the kernel sees (L or L+1)
    sd: st.StreamGroupData  # streaming operands over the lifted masks
    z_dev: np.ndarray       # (G, Kp, 1) int32 device-part z rows
    xla: Tuple[np.ndarray, ...]  # (x, z, s, op) lifted masks for the XLA impl


def _lift_run(x: np.ndarray, z: np.ndarray, s: np.ndarray, op: np.ndarray,
              x_dev: int, L: int, chunk_bits: int) -> _Run:
    """Lower one run to kernel operands (see module docstring for the mask
    lift)."""
    lo = (1 << L) - 1
    x_loc = (x & lo).astype(np.int64)
    z_loc = (z & lo).astype(np.int64)
    z_dev = (np.asarray(z, np.int64) >> L).astype(np.int32)
    if x_dev:
        flip = (_popcount(np.int64(x_dev) & np.asarray(z, np.int64) >> L)
                & 1).astype(np.int64)
        x_eff = ((1 << L) | x_loc).astype(np.int64)
        z_eff = (z_loc | (flip << L)).astype(np.int64)
        n_eff = L + 1
    else:
        x_eff, z_eff, n_eff = x_loc, z_loc, L
    sd = st.build_stream_data(n_eff, x_eff.astype(np.int64),
                              z_eff.astype(np.int64),
                              np.asarray(s, np.float32),
                              op=np.asarray(op, np.int32),
                              chunk_bits=chunk_bits)
    Kp = sd.z_r.shape[1]
    zd = np.zeros((len(x), Kp), np.int32)
    zd[:, : z.shape[1]] = z_dev
    return _Run(x_dev=int(x_dev), n_eff=n_eff, sd=sd, z_dev=zd[:, :, None],
                xla=(x_eff.astype(np.int32), z_eff.astype(np.int32),
                     np.asarray(s, np.float32), np.asarray(op, np.int32)))


def _popcount(v):
    v = np.asarray(v, np.int64)
    out = np.zeros_like(v)
    while np.any(v):
        out += v & 1
        v >>= 1
    return out


def _split_runs(gseq: gr.GroupedOpSequence, d: int,
                chunk_bits: int) -> List[_Run]:
    """Ordered maximal runs of equal x_dev (local runs may span many
    groups; consecutive same-x_dev nonlocal groups share one exchange)."""
    L = gseq.n - d
    xd = (np.asarray(gseq.x, np.int64) >> L).astype(np.int64)
    runs: List[_Run] = []
    i = 0
    G = gseq.n_groups
    while i < G:
        j = i
        while j < G and xd[j] == xd[i]:
            j += 1
        runs.append(_lift_run(gseq.x[i:j], gseq.z[i:j], gseq.s[i:j],
                              gseq.op[i:j], int(xd[i]), L, chunk_bits))
        i = j
    return runs


def _seg_args(run: _Run, seg: int):
    """Per-segment (stream-args, zdev, xla-args, op) tuples for one run,
    respecting the device-call budget."""
    base = st.seq_stream_args(run.sd) + (run.z_dev,) + run.xla
    return st._segments(base, seg)


# --------------------------------------------------------- ham lowering

def _split_ham_stream(gham: gr.GroupedPauliSum, d: int):
    """Partition off-diagonal Hamiltonian groups by x_dev; bucket each
    partition by local x_huge (one state pass per bucket — H terms are
    order-free).  Returns (diag dict, [(x_dev, bucket segments, zdev_map)])."""
    n = gham.n
    L = n - d
    lo = (1 << L) - 1
    diag = dict(
        zd_dev=(np.asarray(gham.z_diag, np.int64) >> L).astype(np.int32),
        zd_loc=(np.asarray(gham.z_diag, np.int64) & lo).astype(np.int32),
        adr=np.asarray(gham.a_diag_re, np.float32),
        adi=np.asarray(gham.a_diag_im, np.float32),
        c_re=float(gham.c_re), hermitian=gham.hermitian, L=L,
    )
    xd = (np.asarray(gham.x, np.int64) >> L).astype(np.int64)
    parts = []
    seg2 = max(8, st.stream_segment_groups(L) // 2)
    for v in sorted(set(xd.tolist())):
        sel = np.where(xd == v)[0]
        sub = gr.GroupedPauliSum(
            n=L,
            z_diag=np.zeros(0, np.int32), a_diag_re=np.zeros(0, np.float32),
            a_diag_im=np.zeros(0, np.float32),
            x=(np.asarray(gham.x, np.int64)[sel] & lo).astype(np.int64),
            z=(np.asarray(gham.z, np.int64)[sel] & lo).astype(np.int64),
            a_re=np.asarray(gham.a_re[sel], np.float32),
            a_im=np.asarray(gham.a_im[sel], np.float32),
            c_re=0.0, c_im=0.0, n_terms=0, hermitian=gham.hermitian)
        z_dev = (np.asarray(gham.z, np.int64)[sel] >> L).astype(np.int32)
        # big-K partitions must shrink their chunks to keep the H-apply
        # kernel under the scoped-VMEM limit (see st._ham_apply_vmem_est)
        cb = st.CHUNK_BITS
        K = sub.z.shape[1] if sub.z.ndim > 1 else 1
        while cb > 2 and st._ham_apply_vmem_est(
                1 << cb, st.HAM_BUCKET_CAP, K) > st._HAM_VMEM_BUDGET:
            cb -= 1
        bargs = st.build_ham_buckets(sub, z_extra=z_dev, chunk_bits=cb)
        segs = st._bucket_segments(bargs, seg2) if bargs is not None else []
        parts.append((int(v), cb, segs, sub, z_dev))
    return diag, parts


# ----------------------------------------------------------- the objective

class ShardedStreamObjective:
    """Streaming-kernel mirror of parallel.sharded.ShardedVQEObjective:
    HBM-resident per-device state streamed through VMEM, mesh collectives
    only at run boundaries.  API: bind(generators, hf_init) -> bound with
    energy / energy_and_grad / forward; ham_apply / expectation services."""

    def __init__(self, hamiltonian_sp: PauliSum, mesh: Mesh,
                 n: Optional[int] = None, impl: Optional[str] = None,
                 seg: Optional[int] = None):
        self.mesh = mesh
        self.d = log2_devices(mesh)
        self.n = n if n is not None else hamiltonian_sp.nbqbits
        self.L = self.n - self.d
        if not sharded_streaming_supported(self.n, self.d):
            raise ValueError(
                f"sharded streaming needs n - d >= "
                f"{st.TILE_BITS + st.CHUNK_BITS}: n={self.n}, d={self.d}")
        self.impl = _resolve_impl(impl)
        self.gham = gr.group_pauli_sum(compile_pauli_sum(hamiltonian_sp,
                                                         self.n))
        self.seg = seg if seg is not None else st.stream_segment_groups(self.L)
        self._diag, self._ham_parts = _split_ham_stream(self.gham, self.d)
        self._interpret = (_interpret_mode() if self.impl == "stream"
                           else False)
        self._build_ham_programs()
        self._psi0_cache: Dict[int, jax.Array] = {}
        # f32 kernels on both impls: the ADAPT loops key their streaming
        # policies (L-BFGS-B swap against the f32 noise floor) off this
        # flag, same as the single-chip VQEObjective streaming path.
        self._streaming = True

    # ---- shard_map program builders -----------------------------------

    def _sm(self, f, ins, outs, donate=()):
        """jit(shard_map(f)).  ``donate``: argnums whose buffers the caller
        rebinds (adjoint p/l chains, accumulators) — donation lets XLA
        evolve the 2^L shards in place instead of allocating a second
        copy per step, which is what bounds host RSS when all virtual
        devices share one host (and HBM headroom on real chips)."""
        return jax.jit(shard_map(f, mesh=self.mesh, in_specs=ins,
                                 out_specs=outs, check_vma=False),
                       donate_argnums=tuple(donate))

    def _build_ham_programs(self):
        dg = self._diag
        L, d = self.L, self.d
        n_dev = 1 << d
        interpret = self._interpret
        impl = self.impl

        def l_diag(psi_loc, include_const: bool):
            acc = (dg["c_re"] * psi_loc if include_const
                   else jnp.zeros_like(psi_loc))
            if len(dg["zd_loc"]):
                coord = jax.lax.axis_index(AXIS)
                sc = (1 - 2 * (jax.lax.population_count(
                    coord & jnp.asarray(dg["zd_dev"])) & 1)
                      ).astype(psi_loc.dtype)
                w_re = gr._sign_field(dg["zd_loc"],
                                      jnp.asarray(dg["adr"], psi_loc.dtype)
                                      * sc, L).reshape(-1)
                acc = acc + w_re[None, :] * psi_loc
                if not dg["hermitian"]:
                    w_im = gr._sign_field(dg["zd_loc"],
                                          jnp.asarray(dg["adi"],
                                                      psi_loc.dtype) * sc,
                                          L).reshape(-1)
                    acc = acc + jnp.stack([-w_im * psi_loc[1],
                                           w_im * psi_loc[0]])
            return acc

        # one jitted shard_map piece per (x_dev, bucket-segment shape):
        # exchange once, stream every bucket of the partition through the
        # two-array bucketed kernel (acc += W . perm(phi))
        def l_ham_seg(psi_loc, acc_loc, x_dev, cb, seg_args):
            phi = (jax.lax.ppermute(psi_loc, AXIS, _perm(x_dev, n_dev))
                   if x_dev else psi_loc)
            # detect the all-real certificate on the HOST arrays (inside
            # the trace bcim is a tracer and the static flag is lost)
            real = (isinstance(seg_args[10], np.ndarray)
                    and not seg_args[10].any())
            (bxh, bmb, bnout, bxc, bxm, bxl, bact, bzr, bzc, bcre, bcim,
             bzdev) = [jnp.asarray(a) for a in seg_args]
            sc = (1 - 2 * (jax.lax.population_count(
                jax.lax.axis_index(AXIS) & bzdev) & 1)).astype(acc_loc.dtype)
            return st.ham_apply_bucketed(
                phi, acc_loc, bxh, bmb, bnout, bxc, bxm, bxl, bact,
                bzr, bzc, bcre * sc, bcim * sc, chunk_bits=cb,
                interpret=interpret, real=real)

        # XLA impl: same split and exchange, grouped scan on the exchanged
        # copy (one fn per partition — no bucket segmentation needed)
        def l_ham_part_xla(psi_loc, acc_loc, x_dev, sub, z_dev):
            phi = (jax.lax.ppermute(psi_loc, AXIS, _perm(x_dev, n_dev))
                   if x_dev else psi_loc)
            coord = jax.lax.axis_index(AXIS)
            scg = (1 - 2 * (jax.lax.population_count(
                coord & jnp.asarray(z_dev)) & 1)).astype(acc_loc.dtype)

            def step(a, g):
                xk, zk, ar, ai = g
                px = gr.xor_perm(phi, xk)
                w_re = gr._sign_field(zk, ar, L).reshape(-1)
                w_im = gr._sign_field(zk, ai, L).reshape(-1)
                return a + jnp.stack([w_re * px[0] - w_im * px[1],
                                      w_re * px[1] + w_im * px[0]]), None

            acc_loc, _ = jax.lax.scan(
                step, acc_loc,
                (jnp.asarray(np.asarray(sub.x, np.int32)),
                 jnp.asarray(np.asarray(sub.z, np.int32)),
                 jnp.asarray(sub.a_re) * scg,
                 jnp.asarray(sub.a_im) * scg))
            return acc_loc

        self._diag_fn = self._sm(
            partial(l_diag, include_const=True), (SPEC,), SPEC)
        self._diag_fn_noconst = self._sm(
            partial(l_diag, include_const=False), (SPEC,), SPEC)

        self._part_fns = []
        for x_dev, cb, segs, sub, z_dev in self._ham_parts:
            if impl == "stream":
                for seg_args in segs:
                    self._part_fns.append(self._sm(
                        partial(l_ham_seg, x_dev=x_dev, cb=cb,
                                seg_args=seg_args),
                        (SPEC, SPEC), SPEC, donate=(1,)))
            else:
                self._part_fns.append(self._sm(
                    partial(l_ham_part_xla, x_dev=x_dev, sub=sub,
                            z_dev=z_dev), (SPEC, SPEC), SPEC, donate=(1,)))

        def l_dot(psi_loc, lam_loc):
            return jax.lax.psum(jnp.sum(psi_loc * lam_loc)
                                + dg["c_re"] * jnp.sum(psi_loc * psi_loc),
                                AXIS)

        self._dot_energy = self._sm(l_dot, (SPEC, SPEC), P())

        def l_addc(psi_loc, lam_loc):
            return lam_loc + dg["c_re"] * psi_loc

        # callers rebind lam (arg 1); psi stays live for the adjoint
        self._add_const = self._sm(l_addc, (SPEC, SPEC), SPEC, donate=(1,))

    # ---- Hamiltonian services ----------------------------------------

    def ham_apply(self, psi, include_const: bool = True):
        acc = (self._diag_fn(psi) if include_const
               else self._diag_fn_noconst(psi))
        for fn in self._part_fns:
            acc = fn(psi, acc)
        return acc

    def expectation(self, psi) -> float:
        lam0 = self.ham_apply(psi, include_const=False)
        return float(self._dot_energy(psi, lam0))

    # ---- ansatz binding ----------------------------------------------

    def _psi0(self, hf_init: int):
        if hf_init not in self._psi0_cache:
            self._psi0_cache[hf_init] = sharded_hf_state(self.n, hf_init,
                                                         self.mesh)
        return self._psi0_cache[hf_init]

    def bind(self, generators: Sequence[PauliSum], hf_init: int):
        seq = compile_op_sequence(generators, self.n)
        gseq = gr.group_op_sequence(seq)
        if gseq is None:
            raise ValueError("sharded streaming requires odd-Y generator "
                             "groups (all fermionic/qubit pools are)")
        fwd_runs = _split_runs(gseq, self.d, st.CHUNK_BITS)
        adj_runs = _split_runs(gseq, self.d, st.ADJ_CHUNK_BITS)
        return ShardedStreamBound(self, fwd_runs, adj_runs,
                                  self._psi0(hf_init), gseq.n_ops,
                                  fmode=gseq.fmode)


class ShardedStreamBound:
    """Bound ansatz on the sharded streaming engine.  Per run of groups:
    local runs stream straight on the shard; nonlocal runs exchange once
    and co-evolve the [own, partner] pair (see module docstring)."""

    def __init__(self, obj: ShardedStreamObjective, fwd_runs: List[_Run],
                 adj_runs: List[_Run], psi0, n_ops: int, fmode: int = 0):
        self._obj = obj
        self._psi0 = psi0
        self.n_ops = n_ops
        # the lifted per-device fields are restrictions of the global field
        # (coord signs only flip coefficient signs), so the sequence's
        # fmode certificate carries over to every run
        self._fmode = fmode
        self._fwd = self._build_sweep_fns(fwd_runs, adjoint=False)
        self._adj = self._build_sweep_fns(adj_runs, adjoint=True)

    # each (run, segment) becomes one jitted shard_map program; executables
    # are shared across segments of equal shape via jit's cache
    def _build_sweep_fns(self, runs: List[_Run], adjoint: bool):
        obj = self._obj
        L, d = obj.L, obj.d
        n_dev = 1 << d
        n_loc = 1 << L
        interpret = obj._interpret
        impl = obj.impl
        out = []
        for run in runs:
            seg = obj.seg if run.x_dev == 0 else max(8, obj.seg // 2)
            if adjoint:
                seg = max(8, seg // 2)
            for s in _seg_args(run, seg):
                stream_args = s[:10]
                z_dev_rows = s[10]
                xla_args = s[11:]
                if adjoint:
                    fn = self._make_adj_seg(run.x_dev, stream_args,
                                            z_dev_rows, xla_args, L, d,
                                            n_dev, n_loc, interpret, impl)
                else:
                    fn = self._make_fwd_seg(run.x_dev, stream_args,
                                            z_dev_rows, xla_args, L, d,
                                            n_dev, n_loc, interpret, impl)
                out.append((run.x_dev, fn))
        return out

    def _make_fwd_seg(self, x_dev, stream_args, z_dev_rows, xla_args, L, d,
                      n_dev, n_loc, interpret, impl):
        obj = self._obj

        def l_fwd(theta, psi_loc):
            sc = _coord_sign_factor(jnp.asarray(z_dev_rows), psi_loc.dtype)
            (xh, mb, nout, xc, xm, xl, op, zr, zc, cre) = [
                jnp.asarray(a) for a in stream_args]
            cre = cre * sc
            if x_dev:
                phi = jax.lax.ppermute(psi_loc, AXIS, _perm(x_dev, n_dev))
                state = jnp.concatenate([psi_loc, phi], axis=-1)
            else:
                state = psi_loc
            if impl == "stream":
                state = st.apply_grouped_ops_stream(
                    state, theta, xh, mb, nout, xc, xm, xl, op, zr, zc, cre,
                    interpret=interpret, fmode=self._fmode)
            else:
                xg, zg, sg, og = [jnp.asarray(a) for a in xla_args]
                scx = sc[:, :sg.shape[1], 0]
                state = gr.apply_grouped_ops(state, theta, xg, zg,
                                             sg * scx, og,
                                             fmode=self._fmode)
            return state[:, :n_loc]

        return obj._sm(l_fwd, (P(), SPEC), SPEC)

    def _make_adj_seg(self, x_dev, stream_args, z_dev_rows, xla_args, L, d,
                      n_dev, n_loc, interpret, impl):
        """Reverse sweep over one (reversed) segment: un-rotate p and l,
        emit per-group gradient entries.  Nonlocal segments co-evolve the
        pair, so their psum'd gradients count every chunk twice — halved
        here."""
        obj = self._obj
        # reverse the group order within the segment (host-side)
        rev = [np.ascontiguousarray(np.asarray(a)[::-1])
               for a in stream_args]
        z_rev = np.ascontiguousarray(np.asarray(z_dev_rows)[::-1])
        xla_rev = [np.ascontiguousarray(np.asarray(a)[::-1])
                   for a in xla_args]
        scale = 0.5 if x_dev else 1.0

        def l_adj(theta, p_loc, l_loc):
            sc = _coord_sign_factor(jnp.asarray(z_rev), p_loc.dtype)
            (xh, mb, nout, xc, xm, xl, op, zr, zc, cre) = [
                jnp.asarray(a) for a in rev]
            cre = cre * sc
            if x_dev:
                pp = jax.lax.ppermute(p_loc, AXIS, _perm(x_dev, n_dev))
                lp = jax.lax.ppermute(l_loc, AXIS, _perm(x_dev, n_dev))
                pst = jnp.concatenate([p_loc, pp], axis=-1)
                lst = jnp.concatenate([l_loc, lp], axis=-1)
            else:
                pst, lst = p_loc, l_loc
            if impl == "stream":
                angles = -jnp.asarray(theta, jnp.float32)[op]
                pst, lst, gts = st.adjoint_sweep_stream(
                    pst, lst, xh, mb, nout, xc, xm, xl, angles, zr, zc, cre,
                    interpret=interpret, fmode=self._fmode)
            else:
                xg, zg, sg, og = [jnp.asarray(a) for a in xla_rev]
                scx = sc[:, :sg.shape[1], 0]
                # grouped_adjoint_sweep scans REVERSED internally; feed it
                # forward-ordered arrays (un-reverse) for identical math
                grad0 = jnp.zeros(theta.shape, pst.dtype)
                pst, lst, gfull = gr.grouped_adjoint_sweep(
                    theta, pst, lst, grad0, xg[::-1], zg[::-1],
                    (sg * scx)[::-1], og[::-1], fmode=self._fmode)
                gts = None
            p_out, l_out = pst[:, :n_loc], lst[:, :n_loc]
            if gts is not None:
                gsum = jax.lax.psum(gts, AXIS) * scale
                grad_part = jax.ops.segment_sum(
                    gsum.astype(theta.dtype), jnp.asarray(op),
                    num_segments=theta.shape[0])
            else:
                grad_part = jax.lax.psum(gfull, AXIS) * scale
            return p_out, l_out, grad_part

        # p/l are rebound by the energy_and_grad loop every step: donate
        # them so the reverse sweep runs in place
        return obj._sm(l_adj, (P(), SPEC, SPEC), (SPEC, SPEC, P()),
                       donate=(1, 2))

    # ---- public API ---------------------------------------------------

    def forward(self, theta):
        theta = jnp.asarray(np.asarray(theta, np.float32))
        psi = self._psi0
        for _, fn in self._fwd:
            psi = fn(theta, psi)
        return psi

    def energy(self, theta) -> float:
        return self._obj.expectation(self.forward(theta))

    def energy_and_grad(self, theta) -> Tuple[float, np.ndarray]:
        obj = self._obj
        theta_f = jnp.asarray(np.asarray(theta, np.float32))
        psi = self.forward(theta_f)
        lam0 = obj.ham_apply(psi, include_const=False)
        e = float(obj._dot_energy(psi, lam0))
        lam = obj._add_const(psi, lam0)
        grad = jnp.zeros(int(np.shape(theta)[0]), jnp.float32)
        # hand p/l to the donating reverse sweep and DROP every stale
        # reference first — keeping psi/lam0/lam live through the loop
        # holds 3 dead full-state buffers (measured: the difference
        # between ~118 GB and ~55 GB host RSS at 2^30)
        p, l = psi, lam
        del psi, lam, lam0
        for _, fn in reversed(self._adj):
            p, l, gpart = fn(theta_f, p, l)
            grad = grad + gpart
        del p, l
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


# --------------------------------------------------------- pool screening

def _pool_screen_parts(gpool, d: int, L: int):
    """Host lowering of the sharded streaming pool screen: partition the
    pool groups by x_dev (order-free), then stage-class + x_huge-bucket
    each partition for the bucketed two-state overlap kernel (the same
    lowering as the single-chip build_streaming_pool_gradient_fn, plus the
    per-slot device-part z rows the coordinate sign needs).

    Returns ``(pool_real, parts)``: pool_real certifies every compiled
    coefficient real (UCCSD/GSD pools are — the coordinate sign only flips
    signs, so the certificate survives sharding and the kernel drops its
    imaginary weight field); parts is a list of
    (x_dev, stages, [segment tuples]) with each segment =
    (bxh, bmb, bnout, bxc, bxm, bxl, bact, bzr, bzc, bcre, bcim, bzdev,
    ops, live)."""
    lo = (1 << L) - 1
    xd = (np.asarray(gpool.x, np.int64) >> L).astype(np.int64)
    seg = max(8, st.stream_segment_groups(L) // 2)
    pool_real = not np.asarray(gpool.a_im).any()
    parts = []
    for v in sorted(set(xd.tolist())):
        sel = np.where(xd == v)[0]
        x_loc = (np.asarray(gpool.x, np.int64)[sel] & lo)
        z_loc = (np.asarray(gpool.z, np.int64)[sel] & lo)
        z_dev = (np.asarray(gpool.z, np.int64)[sel] >> L).astype(np.int32)
        ops_part = np.asarray(gpool.op)[sel].astype(np.int64)
        sd = st.build_stream_data(L, x_loc, z_loc, gpool.a_re[sel],
                                  coef_im=gpool.a_im[sel],
                                  chunk_bits=st.FUSED_CHUNK_BITS)
        Kp = sd.z_r.shape[1]
        zd_full = np.zeros((len(sel), Kp), np.int32)
        zd_full[:, : z_dev.shape[1]] = z_dev
        xm_nz = sd.x_mid != 0
        xl_nz = sd.x_lane != 0
        classes = [("", ~xm_nz & ~xl_nz), ("l", ~xm_nz & xl_nz),
                   ("m", xm_nz & ~xl_nz), ("lm", xm_nz & xl_nz)]
        for stages, selc in classes:
            idx = np.where(selc)[0]
            if not len(idx):
                continue
            bargs = st.build_pool_buckets(st._sd_select(sd, idx))
            if bargs is None:
                continue
            slot_group = bargs[-1]                       # (B, gcap)
            alive = slot_group >= 0
            safe = np.clip(slot_group, 0, None)
            op_of_slot = np.where(alive, ops_part[idx][safe], 0)
            live = alive.astype(np.float32)
            bzdev = np.where(alive[:, :, None],
                             zd_full[idx][safe], 0)[:, :, :, None]
            segs = st._bucket_segments(
                bargs[:-1] + (bzdev, op_of_slot, live), seg)
            if segs:
                parts.append((int(v), stages, segs))
    return pool_real, parts


def build_sharded_stream_pool_gradient_fn(pool_ops: Sequence[PauliSum],
                                          obj: ShardedStreamObjective):
    """Streaming ADAPT pool screen over the mesh: v_i = <H psi|A_i|psi>.
    Pool groups partition by x_dev (order-free); each partition exchanges
    psi once per x_huge bucket class and rides ``pool_overlap_bucketed``
    (stage-class certified, real-coefficient certified — the same fused
    screen the single chip runs) with the exchanged copy as the
    permuted-side operand; per-slot (re, im) rows psum'd and
    segment-summed into operators on the host."""
    gpool = gr.group_pool(compile_pool(pool_ops, obj.n))
    d, L = obj.d, obj.L
    n_dev = 1 << d
    lo = (1 << L) - 1
    interpret = obj._interpret
    impl = obj.impl
    n_ops = gpool.n_ops

    if impl == "stream":
        pool_real, parts = _pool_screen_parts(gpool, d, L)

        def make_bucket_fn(x_dev, stages, s):
            (bxh, bmb, bnout, bxc, bxm, bxl, bact, bzr, bzc, bcre, bcim,
             bzdev, ops, liv) = s

            def l_part(sig_loc, psi_loc):
                phi = (jax.lax.ppermute(psi_loc, AXIS, _perm(x_dev, n_dev))
                       if x_dev else psi_loc)
                sc = _coord_sign_factor(jnp.asarray(bzdev), psi_loc.dtype)
                rows = st.pool_overlap_bucketed(
                    sig_loc, phi, jnp.asarray(bxh), jnp.asarray(bmb),
                    jnp.asarray(bnout), jnp.asarray(bxc), jnp.asarray(bxm),
                    jnp.asarray(bxl), jnp.asarray(bact), jnp.asarray(bzr),
                    jnp.asarray(bzc), jnp.asarray(bcre) * sc,
                    jnp.asarray(bcim) * sc, stages=stages, real=pool_real,
                    limbs=st._exp_mm_limbs(2), interpret=interpret)
                rows = rows * jnp.asarray(liv)[:, :, None]
                return jax.lax.psum(rows, AXIS)

            return obj._sm(l_part, (SPEC, SPEC), P()), np.asarray(ops)

        fns = [make_bucket_fn(v, stg, s)
               for v, stg, segs in parts for s in segs]

        def grads_host(psi) -> np.ndarray:
            sigma = obj.ham_apply(psi)
            vre = np.zeros(n_ops)
            vim = np.zeros(n_ops)
            for fn, ops in fns:
                rows = np.asarray(fn(sigma, psi), np.float64)
                np.add.at(vre, ops.reshape(-1), rows[:, :, 0].reshape(-1))
                np.add.at(vim, ops.reshape(-1), rows[:, :, 1].reshape(-1))
            return vre + 1j * vim

        return grads_host

    # ---- impl="xla": identical partition/exchange/sign composition,
    # grouped scan inner engine (CPU tests / dry runs)
    xd = (np.asarray(gpool.x, np.int64) >> L).astype(np.int64)
    seg = max(8, st.stream_segment_groups(L) // 2)
    parts = []
    for v in sorted(set(xd.tolist())):
        sel = np.where(xd == v)[0]
        x_loc = (np.asarray(gpool.x, np.int64)[sel] & lo)
        z_loc = (np.asarray(gpool.z, np.int64)[sel] & lo)
        z_dev = (np.asarray(gpool.z, np.int64)[sel] >> L).astype(np.int32)
        hargs = (z_dev[:, :, None], gpool.op[sel].astype(np.int32),
                 x_loc, z_loc, gpool.a_re[sel], gpool.a_im[sel])
        parts.append((int(v), st._segments(hargs, seg)))

    def make_part_fn(x_dev, s):
        zd, ops, xg, zg, ar, ai = s

        def l_part(sig_loc, psi_loc):
            phi = (jax.lax.ppermute(psi_loc, AXIS, _perm(x_dev, n_dev))
                   if x_dev else psi_loc)
            sc = _coord_sign_factor(jnp.asarray(zd), psi_loc.dtype)
            R, lanes = gr._lane_split(L)
            scg = sc[:, :np.asarray(zg).shape[1], 0]

            def step(_, g):
                xk, zk, a_r, a_i = g
                px = gr.xor_perm(phi, xk)
                Pm = (sig_loc[0] * px[0]
                      + sig_loc[1] * px[1]).reshape(R, lanes)
                Qm = (sig_loc[0] * px[1]
                      - sig_loc[1] * px[0]).reshape(R, lanes)
                re = (jnp.sum(a_r * gr._group_bilinear(Pm, zk, L))
                      - jnp.sum(a_i * gr._group_bilinear(Qm, zk, L)))
                im = (jnp.sum(a_r * gr._group_bilinear(Qm, zk, L))
                      + jnp.sum(a_i * gr._group_bilinear(Pm, zk, L)))
                return None, jnp.stack([re, im])

            _, rows = jax.lax.scan(
                step, None,
                (jnp.asarray(xg), jnp.asarray(zg),
                 jnp.asarray(ar) * scg, jnp.asarray(ai) * scg))
            return jax.lax.psum(rows, AXIS)

        return obj._sm(l_part, (SPEC, SPEC), P()), ops

    fns = [make_part_fn(v, s) for v, segs in parts for s in segs]

    def grads_host(psi) -> np.ndarray:
        sigma = obj.ham_apply(psi)
        vre = np.zeros(n_ops)
        vim = np.zeros(n_ops)
        for fn, ops in fns:
            rows = np.asarray(fn(sigma, psi), np.float64)
            np.add.at(vre, np.asarray(ops), rows[: len(ops), 0])
            np.add.at(vim, np.asarray(ops), rows[: len(ops), 1])
        return vre + 1j * vim

    return grads_host
