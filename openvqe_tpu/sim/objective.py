"""Cached, shape-bucketed VQE objectives.

One ``VQEObjective`` per Hamiltonian owns jitted (energy, energy_and_grad)
programs with the ansatz as dynamic, padded arguments.  Binding a new ansatz
(ADAPT growth, a different screened operator, a restarted experiment) costs
zero recompilation as long as the padded shape lands in an existing bucket —
the compile-once/run-many discipline that XLA rewards and that the
reference's per-evaluation circuit rebuilding (get_energy_ucc.py:42-49)
structurally prevents.

The default compute path is the x-mask-GROUPED engine (sim/grouped.py): one
permutation + one MXU sign-field matmul per excitation group instead of one
full state pass per Pauli term (~8x fewer passes for UCC ansaetze).  Ansatz
sequences whose terms are not odd-Y (never the case for fermionic/qubit
pools) fall back to the per-term scan engine transparently.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pauli import PauliSum
from . import grouped as gr
from . import pallas_kernels as pk
from . import statevector as sv
from . import streaming as st
from .compile import compile_op_sequence, compile_pauli_sum


class VQEObjective:

    def __init__(self, hamiltonian_sp: PauliSum, n: Optional[int] = None,
                 cdtype=None, segmented: Optional[bool] = None):
        self.n = n if n is not None else hamiltonian_sp.nbqbits
        self.cdtype = cdtype or sv.default_cdtype()
        self.ham = compile_pauli_sum(hamiltonian_sp, self.n)
        self.gham = gr.group_pauli_sum(self.ham)
        if segmented is None:
            # the axon backend kills device calls past ~10 s: switch to
            # host-segmented execution when one full H pass would blow the
            # per-call work budget (a group costs ~2 per-term passes)
            work_terms = 2 * self.gham.n_groups + 2
            segmented = work_terms * float(1 << self.n) > sv._CALL_WORK_BUDGET
        self.segmented = bool(segmented)
        # grouped programs are cached per field mode (grouped.rot_cos_sin):
        # fmode > 0 sequences run transcendental-free rotation kernels
        self._seg_cache: Dict[int, tuple] = {}
        self._dyn_cache: Dict[int, tuple] = {}
        if self.segmented:
            (_, _, _, self._seg_lham, self._seg_expect) = self._seg_fns(0)
        else:
            hargs = gr.ham_as_device(self.gham)
            self._lham = jax.jit(lambda psi: gr.grouped_ham_apply(psi, *hargs))
        # ONE Pallas fast path per objective, decided before anything is
        # built:
        #   * streaming kernels (sim/streaming.py, HBM-resident state) for
        #     20+ qubits — at exactly 20 the VMEM path would still run its
        #     H pass and adjoint through XLA (the 2-state VMEM kernels cap
        #     at 19), so streaming wins there too (0.26 vs 0.58 s/iter on
        #     H10).  OVQE_STREAM: 1 (default policy), 0 (off), force
        #     (wherever supported).
        #   * VMEM-resident kernels (sim/pallas_kernels.py) for 14-20
        #     qubits otherwise.  OVQE_PALLAS=0 disables.
        import os
        f32 = sv.default_rdtype() == np.float32
        stream_env = os.environ.get("OVQE_STREAM", "1").lower()
        if stream_env not in ("1", "0", "force"):
            raise ValueError(
                f"OVQE_STREAM must be 1|0|force, got {stream_env!r}")
        want_stream = (True if stream_env == "force"
                       else self.segmented or self.n > pk.MAX_N_2STATE)
        self._streaming = (want_stream and st.streaming_supported(self.n)
                           and f32 and stream_env != "0")
        self._pallas = (not self._streaming and not self.segmented
                        and pk.pallas_supported(self.n) and f32
                        and os.environ.get("OVQE_PALLAS", "1") != "0")
        if self._pallas:
            self._build_pallas_programs()
        if self._streaming:
            (self._st_energy, self._st_energy_and_grad, self._st_forward,
             self._st_lham, self._st_expect, self._st_prepare) = \
                st.build_streaming_energy_fn(self.gham)
        self._fallback_fns = None       # built lazily for non-odd-Y ansaetze
        self._psi0_cache: Dict[int, np.ndarray] = {}
        self._psi0_dev_cache: Dict[int, "jnp.ndarray"] = {}

    def _seg_fns(self, fmode: int = 0):
        if fmode not in self._seg_cache:
            self._seg_cache[fmode] = gr.build_grouped_segmented_energy_fn(
                self.gham, fmode=fmode)
        return self._seg_cache[fmode]

    def _dyn_fns(self, fmode: int = 0):
        if fmode not in self._dyn_cache:
            self._dyn_cache[fmode] = gr.build_grouped_dynamic_energy_fn(
                self.gham, fmode=fmode)
        return self._dyn_cache[fmode]

    def _build_pallas_programs(self):
        n = self.n
        gham = self.gham
        hargs_p = pk.ham_args(pk.ham_group_data(gham))
        hargs_x = gr.ham_as_device(gham)
        zd, adr = gham.z_diag, gham.a_diag_re
        c_re = float(gham.c_re)

        def _expect(psi):
            e = pk.expectation_pallas(psi, *hargs_p)
            if len(zd):
                R, lanes = gr._lane_split(n)
                p2 = (psi[0] * psi[0] + psi[1] * psi[1]).reshape(R, lanes)
                e = e + jnp.sum(jnp.asarray(adr, psi.dtype)
                                * gr._group_bilinear(p2, zd, n))
            return e + c_re * jnp.sum(psi * psi)

        from functools import partial

        @partial(jax.jit, static_argnums=(3,))
        def p_energy(theta, psi0, pargs, fmode=0):
            psi = pk.apply_grouped_ops_pallas(psi0, theta, *pargs,
                                              fmode=fmode)
            return _expect(psi)

        two_state = pk.pallas_2state_supported(n)
        adi = gham.a_diag_im
        hermitian = gham.hermitian

        def _diag_field(psi):
            """diag(x=0) part of H|psi> (the pallas H kernel covers the
            off-diagonal groups)."""
            if not len(zd):
                return jnp.zeros_like(psi)
            w_re = gr._sign_field(zd, jnp.asarray(adr, psi.dtype),
                                  n).reshape(-1)
            out = w_re[None, :] * psi
            if not hermitian:
                w_im = gr._sign_field(zd, jnp.asarray(adi, psi.dtype),
                                      n).reshape(-1)
                out = out + jnp.stack([-w_im * psi[1], w_im * psi[0]])
            return out

        @partial(jax.jit, static_argnums=(4,))
        def p_energy_and_grad(theta, psi0, pargs, xargs, fmode=0):
            psi = pk.apply_grouped_ops_pallas(psi0, theta, *pargs,
                                              fmode=fmode)
            # one H pass serves both: e = Re<psi|lam> + const <psi|psi>
            if two_state:
                lam0 = pk.ham_apply_pallas(psi, *hargs_p) + _diag_field(psi)
            else:
                lam0 = gr.grouped_ham_apply(psi, *hargs_x,
                                            include_const=False)
            e = jnp.sum(psi * lam0) + c_re * jnp.sum(psi * psi)
            lam = lam0 + c_re * psi
            if two_state:
                # pallas adjoint over REVERSED groups; per-group gradient
                # entries segment-summed into the parameters
                x_top, x_mid, x_lane, op = (pargs[0][::-1], pargs[1][::-1],
                                            pargs[2][::-1], pargs[3][::-1])
                angles = -jnp.asarray(theta, jnp.float32)[op]
                _, _, gts = pk.adjoint_sweep_pallas(
                    psi, lam, x_top, x_mid, x_lane, angles,
                    pargs[4][::-1], pargs[5][::-1], pargs[6][::-1],
                    fmode=fmode)
                grad = jax.ops.segment_sum(gts.astype(theta.dtype), op,
                                           num_segments=theta.shape[0])
            else:
                grad0 = jnp.zeros_like(theta)
                _, _, grad = gr.grouped_adjoint_sweep(theta, psi, lam, grad0,
                                                      *xargs, fmode=fmode)
            return e, grad

        @partial(jax.jit, static_argnums=(3,))
        def p_forward(theta, psi0, pargs, fmode=0):
            return pk.apply_grouped_ops_pallas(psi0, theta, *pargs,
                                               fmode=fmode)

        self._p_energy = p_energy
        self._p_energy_and_grad = p_energy_and_grad
        self._p_forward = p_forward

    def _psi0(self, hf_init: int) -> np.ndarray:
        if hf_init not in self._psi0_cache:
            self._psi0_cache[hf_init] = sv.hf_state(self.n, hf_init,
                                                    self.cdtype)
        return self._psi0_cache[hf_init]

    def _psi0_device(self, hf_init: int):
        """Device-resident psi0 master, cached per hf_init: ADAPT re-binds
        every outer iteration and a 2^n host->device transfer per bind
        would ride the tunnel at 26+ qubits."""
        if hf_init not in self._psi0_dev_cache:
            self._psi0_dev_cache[hf_init] = jnp.asarray(
                np.asarray(self._psi0(hf_init), np.float32))
        return self._psi0_dev_cache[hf_init]

    def _fallback(self):
        if self._fallback_fns is None:
            if self.segmented:
                self._fallback_fns = sv.build_segmented_energy_fn(self.ham,
                                                                  self.cdtype)
            else:
                self._fallback_fns = sv.build_dynamic_energy_fn(self.ham,
                                                                self.cdtype)
        return self._fallback_fns

    def bind(self, generators: Sequence[PauliSum], hf_init: int):
        """Returns a BoundAnsatz for this generator list."""
        seq = compile_op_sequence(generators, self.n)
        gseq = gr.group_op_sequence(seq)
        if gseq is not None:
            if not self.segmented and gseq.n_groups:
                G, K = gseq.z.shape
                gseq = gr.pad_grouped_sequence(
                    gseq, sv.bucket_size(G), max(K, 8))
            pargs = None
            if self._pallas and gseq.n_groups:
                # device-resident once per bind: the pallas operands are a
                # few MB and must not ride host->device on every call
                pargs = tuple(jnp.asarray(a)
                              for a in pk.seq_args(pk.seq_group_data(gseq)))
            stargs = None
            if self._streaming and gseq.n_groups:
                stargs = self._st_prepare(gseq)
            sargs = tuple(jnp.asarray(a) for a in gr.seq_as_device(gseq))
            return BoundAnsatz(self, sargs, self._psi0(hf_init),
                               len(generators), grouped=True, pargs=pargs,
                               stargs=stargs, hf_init=hf_init,
                               fmode=gseq.fmode)
        if not self.segmented:
            seq = sv.pad_sequence(seq, sv.bucket_size(max(seq.n_terms, 1)))
        return BoundAnsatz(self, sv.seq_as_device(seq, self.cdtype),
                           self._psi0(hf_init), len(generators), grouped=False)

    # device-side Hamiltonian services (used by ADAPT fidelity/Lanczos)
    def ham_apply(self, psi):
        if self._streaming:
            return self._st_lham(jnp.asarray(psi))
        if self.segmented:
            return self._seg_lham(jnp.asarray(psi))
        return self._lham(jnp.asarray(psi))

    def expectation(self, psi) -> float:
        if self._streaming:
            return self._st_expect(jnp.asarray(psi))
        if self.segmented:
            return float(self._seg_expect(jnp.asarray(psi)))
        return float(gr.grouped_expectation(jnp.asarray(psi),
                                            *gr.ham_as_device(self.gham)))


class BoundAnsatz:

    def __init__(self, objective: VQEObjective, seq_args, psi0, n_ops: int,
                 grouped: bool = True, pargs=None, stargs=None,
                 hf_init: Optional[int] = None, fmode: int = 0):
        self._obj = objective
        self._seq_args = seq_args
        self._psi0 = psi0
        self._grouped = grouped
        self._pargs = pargs        # pallas group operands (or None)
        self._stargs = stargs      # streaming prepared segments (or None)
        self._hf_init = hf_init
        self._fmode = fmode        # grouped.sequence_field_mode of the bind
        self.n_ops = n_ops

    def _psi0_st(self):
        """Device-resident psi0 (cached on the OBJECTIVE per hf_init —
        ADAPT re-binds every outer iteration)."""
        if self._hf_init is not None:
            return self._obj._psi0_device(self._hf_init)
        return jnp.asarray(np.asarray(self._psi0, np.float32))

    def energy(self, theta) -> float:
        obj = self._obj
        if self._stargs is not None:
            return float(obj._st_energy(theta, self._psi0_st(),
                                        self._stargs))
        if self._pargs is not None:
            return float(obj._p_energy(jnp.asarray(theta, dtype=float),
                                       jnp.asarray(self._psi0), self._pargs,
                                       self._fmode))
        if self._grouped:
            if obj.segmented:
                return float(obj._seg_fns(self._fmode)[0](
                    theta, self._psi0, self._seq_args))
            return float(obj._dyn_fns(self._fmode)[0](
                jnp.asarray(theta, dtype=float), jnp.asarray(self._psi0),
                *self._seq_args))
        fns = obj._fallback()
        if obj.segmented:
            return float(fns[0](theta, self._psi0, self._seq_args))
        return float(fns[0](jnp.asarray(theta, dtype=float), self._psi0,
                            *self._seq_args))

    def energy_and_grad(self, theta) -> Tuple[float, np.ndarray]:
        obj = self._obj
        if self._stargs is not None:
            return obj._st_energy_and_grad(theta, self._psi0_st(),
                                           self._stargs)
        if self._pargs is not None:
            e, g = obj._p_energy_and_grad(jnp.asarray(theta, dtype=float),
                                          jnp.asarray(self._psi0),
                                          self._pargs, self._seq_args,
                                          self._fmode)
            return float(e), np.asarray(g, dtype=float)
        if self._grouped:
            if obj.segmented:
                e, g = obj._seg_fns(self._fmode)[1](theta, self._psi0,
                                                    self._seq_args)
            else:
                e, g = obj._dyn_fns(self._fmode)[1](
                    jnp.asarray(theta, dtype=float), jnp.asarray(self._psi0),
                    *self._seq_args)
            return float(e), np.asarray(g, dtype=float)
        fns = obj._fallback()
        if obj.segmented:
            e, g = fns[1](theta, self._psi0, self._seq_args)
        else:
            e, g = fns[1](jnp.asarray(theta, dtype=float), self._psi0,
                          *self._seq_args)
        return float(e), np.asarray(g, dtype=float)

    def forward(self, theta):
        """Final statevector planes (device array, shape (2, 2^n))."""
        obj = self._obj
        if self._stargs is not None:
            return obj._st_forward(theta, self._psi0_st(), self._stargs)
        theta = jnp.asarray(theta, dtype=float)
        if self._pargs is not None:
            return obj._p_forward(theta, jnp.asarray(self._psi0),
                                  self._pargs, self._fmode)
        if self._grouped:
            if obj.segmented:
                return obj._seg_fns(self._fmode)[2](theta, self._psi0,
                                                    self._seq_args)
            return obj._dyn_fns(self._fmode)[2](
                theta, jnp.asarray(self._psi0), *self._seq_args)
        if obj.segmented:
            return obj._fallback()[2](theta, self._psi0, self._seq_args)
        return _forward(theta, jnp.asarray(self._psi0), *self._seq_args)

    def scipy_fun_jac(self, energies: Optional[List[float]] = None):
        """(fun, jac) pair sharing one fused evaluation per point."""
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


@jax.jit
def _forward(theta, psi0, sx, sz, skr, ski, sw, sop):
    return sv.apply_ops(psi0, theta, sx, sz, skr, ski, sw, sop)
