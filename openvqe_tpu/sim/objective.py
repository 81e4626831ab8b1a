"""Cached, shape-bucketed VQE objectives.

One ``VQEObjective`` per Hamiltonian owns a single pair of jitted
(energy, energy_and_grad) programs with the rotation sequence as dynamic,
padded arguments.  Binding a new ansatz (ADAPT growth, a different screened
operator, a restarted experiment) costs zero recompilation as long as the
padded term count lands in an existing bucket — the compile-once/run-many
discipline that XLA rewards and that the reference's per-evaluation circuit
rebuilding (get_energy_ucc.py:42-49) structurally prevents.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pauli import PauliSum
from . import statevector as sv
from .compile import compile_op_sequence, compile_pauli_sum


class VQEObjective:

    def __init__(self, hamiltonian_sp: PauliSum, n: Optional[int] = None,
                 cdtype=None, segmented: Optional[bool] = None):
        self.n = n if n is not None else hamiltonian_sp.nbqbits
        self.cdtype = cdtype or sv.default_cdtype()
        self.ham = compile_pauli_sum(hamiltonian_sp, self.n)
        if segmented is None:
            # the axon backend kills device calls past ~10 s: switch to
            # host-segmented execution when one full H pass would blow the
            # per-call work budget
            segmented = (self.ham.n_terms * float(1 << self.n)
                         > sv._CALL_WORK_BUDGET)
        self.segmented = bool(segmented)
        if self.segmented:
            (self._seg_energy, self._seg_energy_and_grad,
             self._seg_forward) = sv.build_segmented_energy_fn(self.ham,
                                                               self.cdtype)
        else:
            self._energy, self._energy_and_grad = sv.build_dynamic_energy_fn(
                self.ham, self.cdtype)
        self._psi0_cache: Dict[int, np.ndarray] = {}

    def _psi0(self, hf_init: int) -> np.ndarray:
        if hf_init not in self._psi0_cache:
            self._psi0_cache[hf_init] = sv.hf_state(self.n, hf_init,
                                                    self.cdtype)
        return self._psi0_cache[hf_init]

    def bind(self, generators: Sequence[PauliSum], hf_init: int):
        """Returns a BoundAnsatz for this generator list."""
        seq = compile_op_sequence(generators, self.n)
        if not self.segmented:
            seq = sv.pad_sequence(seq, sv.bucket_size(max(seq.n_terms, 1)))
        args = sv.seq_as_device(seq, self.cdtype)
        return BoundAnsatz(self, args, self._psi0(hf_init), len(generators))


class BoundAnsatz:

    def __init__(self, objective: VQEObjective, seq_args, psi0, n_ops: int):
        self._obj = objective
        self._seq_args = seq_args
        self._psi0 = psi0
        self.n_ops = n_ops

    def energy(self, theta) -> float:
        if self._obj.segmented:
            return float(self._obj._seg_energy(theta, self._psi0,
                                               self._seq_args))
        return float(self._obj._energy(jnp.asarray(theta, dtype=float),
                                       self._psi0, *self._seq_args))

    def energy_and_grad(self, theta) -> Tuple[float, np.ndarray]:
        if self._obj.segmented:
            e, g = self._obj._seg_energy_and_grad(theta, self._psi0,
                                                  self._seq_args)
            return float(e), np.asarray(g, dtype=float)
        e, g = self._obj._energy_and_grad(jnp.asarray(theta, dtype=float),
                                          self._psi0, *self._seq_args)
        return float(e), np.asarray(g, dtype=float)

    def forward(self, theta):
        """Final statevector planes (device array, shape (2, 2^n))."""
        if self._obj.segmented:
            return self._obj._seg_forward(theta, self._psi0, self._seq_args)
        return _forward(jnp.asarray(theta, dtype=float),
                        jnp.asarray(self._psi0), *self._seq_args)

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
