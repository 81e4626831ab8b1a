"""CS-ADAPT-VQE on the contextual Hamiltonians (headline benchmark).

Rebuild of reference ``applications/quantum_batteries/adapt.py``
(logs/adapt.txt: 7-qubit rel.err 3.073e-05 @ 0.292 s, 8-qubit 3.077e-05 @
1.219 s per experiment on an NVIDIA GPU): one-shot ADAPT selection — screen
all double excitations at theta=0, keep the argmax-|gradient| one, VQE it,
screen all singles on top, keep the argmax, final joint VQE.

The PennyLane-derived CUDA-Q gate decompositions (reference adapt.py:17-84)
are replaced by exact qubit-excitation evolutions: the single/double
excitation generators' Pauli terms mutually commute, so the rotation-sequence
application is the exact Givens rotation.  Gradients of the whole excitation
pool are computed in one fused batched pass (or by parameter shift for
method parity).
"""

from __future__ import annotations

from time import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.optimize

from ...optim.minimize import lbfgs_minimize
from ...ops.pauli import PauliSum
from ...sim import grouped as gr
from ...sim import statevector as sv
from ...sim.compile import compile_op_sequence, compile_pauli_sum, compile_pool
from ...sim.objective import VQEObjective
from .utils import CCSD_ENERGY, hf_bitstring_to_int, load_cs_hams, rel_err


def excitations(electrons: int, orbitals: int, delta_sz: int = 0
                ) -> Tuple[List[List[int]], List[List[int]]]:
    """PennyLane-style spin-conserving excitation index lists
    (reference adapt.py:87-123; sz = +1/2 on even orbitals)."""
    sz = np.array([0.5 if (i % 2 == 0) else -0.5 for i in range(orbitals)])
    singles = [[r, p]
               for r in range(electrons)
               for p in range(electrons, orbitals)
               if sz[p] - sz[r] == delta_sz]
    doubles = [[s, r, q, p]
               for s in range(electrons - 1)
               for r in range(s + 1, electrons)
               for q in range(electrons, orbitals - 1)
               for p in range(q + 1, orbitals)
               if (sz[p] + sz[q] - sz[r] - sz[s]) == delta_sz]
    return singles, doubles


def single_excitation_generator(wires: Sequence[int], n: int) -> PauliSum:
    """G with exp(i theta G) = Givens rotation on {|01>,|10>} of the wires
    (PennyLane SingleExcitation convention up to the sign absorbed by theta)."""
    r, p = wires
    return (PauliSum.from_term(n, 0.5, "YX", [r, p])
            + PauliSum.from_term(n, -0.5, "XY", [r, p]))


def double_excitation_generator(wires: Sequence[int], n: int) -> PauliSum:
    """8-string double-excitation generator (all terms commute -> exact)."""
    w = list(wires)
    out = PauliSum.identity(n, 0.0)
    for coeff, letters in [(+0.125, "XYXX"), (+0.125, "YXXX"),
                           (+0.125, "YYYX"), (+0.125, "YYXY"),
                           (-0.125, "XXYX"), (-0.125, "XXXY"),
                           (-0.125, "YXYY"), (-0.125, "XYYY")]:
        out = out + PauliSum.from_term(n, coeff, letters, w)
    return out


class AdaptContext:
    """Per-Hamiltonian caches: one dynamic jit pair + screening programs —
    repeat experiments share every compiled executable."""

    def __init__(self, ham: PauliSum, hf: str):
        self.ham = ham
        self.hf = hf
        self.n = ham.nbqbits
        self.hf_init = hf_bitstring_to_int(hf)
        self.objective = VQEObjective(ham)
        self.electrons = sum(1 for q in hf if q == "1")
        self.singles, self.doubles = excitations(self.electrons, self.n)
        self.dbl_gens = [double_excitation_generator(w, self.n)
                         for w in self.doubles]
        self.sgl_gens = [single_excitation_generator(w, self.n)
                         for w in self.singles]
        gham = self.objective.gham
        self._dbl_screen = (gr.build_grouped_pool_gradient_fn(
            gr.group_pool(compile_pool(self.dbl_gens, self.n)), gham)
            if self.dbl_gens else None)
        self._sgl_screen = gr.build_grouped_pool_gradient_fn(
            gr.group_pool(compile_pool(self.sgl_gens, self.n)), gham)

    def screen_doubles(self, psi) -> np.ndarray:
        return -2.0 * np.imag(self._dbl_screen(jnp.asarray(psi)))

    def screen_singles(self, psi) -> np.ndarray:
        return -2.0 * np.imag(self._sgl_screen(jnp.asarray(psi)))




def parameter_shift_screen(ctx: "AdaptContext", pool: Sequence[PauliSum],
                           base_gens: Sequence[PauliSum],
                           base_theta: Sequence[float]) -> np.ndarray:
    """Reference-parity parameter-shift screening (adapt.py:127-174):
    g_i = (E(+pi/2) - E(-pi/2)) / 2 with all pool ops in one circuit."""
    bound = ctx.objective.bind(list(base_gens) + list(pool), ctx.hf_init)
    nb = len(base_gens)
    base = np.concatenate([np.asarray(base_theta, dtype=float),
                           np.zeros(len(pool))])
    grads = np.zeros(len(pool))
    for i in range(len(pool)):
        p = base.copy(); p[nb + i] += np.pi / 2
        m = base.copy(); m[nb + i] -= np.pi / 2
        grads[i] = 0.5 * (bound.energy(p) - bound.energy(m))
    return grads


def _vqe(ctx: "AdaptContext", gens, x0, optimizer="BFGS", maxiter=1000):
    bound = ctx.objective.bind(gens, ctx.hf_init)
    if optimizer == "Nelder-Mead":
        opt = scipy.optimize.minimize(bound.energy, x0=x0,
                                      method="Nelder-Mead",
                                      options={"maxiter": maxiter})
    else:
        fun, jac = bound.scipy_fun_jac()
        opt = scipy.optimize.minimize(fun, x0=x0, method=optimizer, jac=jac,
                                      options={"maxiter": maxiter})
    return float(opt.fun), np.asarray(opt.x), bound


def run_cs_adapt_experiment(ctx: "AdaptContext", optimizer: str = "BFGS",
                            rng: Optional[np.random.RandomState] = None,
                            use_parameter_shift: bool = False) -> float:
    """One experiment (reference adapt.py:263-339).  Returns the energy."""
    rng = rng or np.random.RandomState()

    # stage 1: screen doubles at theta=0 on the HF state
    if ctx.dbl_gens:
        if use_parameter_shift:
            grads = parameter_shift_screen(ctx, ctx.dbl_gens, [], [])
        else:
            grads = ctx.screen_doubles(sv.hf_state(ctx.n, ctx.hf_init))
        sel_d = int(np.argmax(np.abs(grads)))
        gens = [ctx.dbl_gens[sel_d]]
        e_d, th_d, bound = _vqe(ctx, gens, rng.uniform(size=1), optimizer)
        psi = bound.forward(th_d)
    else:
        gens, th_d = [], np.zeros(0)
        psi = jnp.asarray(sv.hf_state(ctx.n, ctx.hf_init))

    # stage 2: screen singles on top of the optimized double
    if use_parameter_shift:
        grads_s = parameter_shift_screen(ctx, ctx.sgl_gens, gens, th_d)
    else:
        grads_s = ctx.screen_singles(psi)
    sel_s = int(np.argmax(np.abs(grads_s)))

    # stage 3: final joint VQE over [selected double, selected single]
    final_gens = gens + [ctx.sgl_gens[sel_s]]
    x0 = rng.uniform(size=len(final_gens))
    e, _, _ = _vqe(ctx, final_gens, x0, optimizer, maxiter=100)
    return e


class FusedAdaptContext(AdaptContext):
    """Whole-experiment fusion: screening, argmax selection, both VQE
    optimizations (jit-resident L-BFGS) and the final energy run as ONE
    compiled program per experiment.  This is the dispatch-latency answer
    for accelerators behind an RPC tunnel: the scipy-driven path makes
    hundreds of device calls per experiment; this makes one.

    Requires a uniform per-op term count within each pool (doubles: 8 Pauli
    strings, singles: 2), so selected operators become dynamic gathers over
    stacked mask arrays with static shapes."""

    def __init__(self, ham: PauliSum, hf: str, tol: float = 1e-4,
                 maxiter: int = 100):
        super().__init__(ham, hf)
        n = self.n
        hargs = sv.as_device(compile_pauli_sum(ham, n))
        psi_hf = sv.hf_state(n, self.hf_init)

        def stack_pool(gens, n_terms):
            seq = compile_op_sequence(gens, n)
            assert seq.n_terms == len(gens) * n_terms
            rd = sv.default_rdtype()
            shape = (len(gens), n_terms)
            # jnp arrays: dynamically indexed by the traced argmax selection
            return tuple(jnp.asarray(a) for a in (
                seq.x.reshape(shape), seq.z.reshape(shape),
                np.real(seq.kappa).astype(rd).reshape(shape),
                np.imag(seq.kappa).astype(rd).reshape(shape),
                np.real(seq.w).astype(rd).reshape(shape)))

        D = stack_pool(self.dbl_gens, 8) if self.dbl_gens else None
        S = stack_pool(self.sgl_gens, 2)
        dseq = compile_pool(self.dbl_gens, n) if self.dbl_gens else None
        sseq = compile_pool(self.sgl_gens, n)

        def flat_screen(psi, sigma, seq):
            rd = sv.default_rdtype()
            wk = seq.w * seq.kappa
            vre, vim = sv.pool_overlaps(
                psi, sigma, seq.x, seq.z,
                np.real(wk).astype(rd), np.imag(wk).astype(rd),
                seq.op_index, seq.n_ops)
            return -2.0 * vim  # d<H>/dtheta at 0 for exp(i theta G)

        def seq_args_for(masks, sel, n_terms, op_id):
            X, Z, KR, KI, W = masks
            return (X[sel], Z[sel], KR[sel], KI[sel], W[sel],
                    jnp.full((n_terms,), op_id, dtype=jnp.int32))

        def energy_of(theta, psi0, parts):
            xs = jnp.concatenate([p[0] for p in parts])
            zs = jnp.concatenate([p[1] for p in parts])
            krs = jnp.concatenate([p[2] for p in parts])
            kis = jnp.concatenate([p[3] for p in parts])
            ws = jnp.concatenate([p[4] for p in parts])
            ops = jnp.concatenate([p[5] for p in parts])
            psi = sv.apply_ops(psi0, theta, xs, zs, krs, kis, ws, ops)
            return sv.expectation(psi, *hargs)

        def experiment(x0d, x0f):
            sigma_hf = sv.ham_apply(psi_hf, *hargs)
            if D is not None:
                gd = flat_screen(psi_hf, sigma_hf, dseq)
                sel_d = jnp.argmax(jnp.abs(gd))
                part_d = seq_args_for(D, sel_d, 8, 0)
                fun_d = lambda th: energy_of(th, psi_hf, [part_d])
                th_d, _, _ = lbfgs_minimize(fun_d, x0d, tol=tol,
                                            maxiter=maxiter)
                psi1 = sv.apply_ops(psi_hf, th_d, *part_d)
            else:
                psi1 = jnp.asarray(psi_hf)
            sigma1 = sv.ham_apply(psi1, *hargs)
            gs = flat_screen(psi1, sigma1, sseq)
            sel_s = jnp.argmax(jnp.abs(gs))
            if D is not None:
                part_d2 = seq_args_for(D, sel_d, 8, 0)
                part_s = seq_args_for(S, sel_s, 2, 1)
                fun_f = lambda th: energy_of(th, psi_hf, [part_d2, part_s])
            else:
                part_s = seq_args_for(S, sel_s, 2, 0)
                fun_f = lambda th: energy_of(th, psi_hf, [part_s])
            th_f, e_f, _ = lbfgs_minimize(fun_f, x0f, tol=tol, maxiter=maxiter)
            return e_f

        self._experiment = jax.jit(experiment)
        self._n_final = 2 if self.dbl_gens else 1

    def run(self, rng: Optional[np.random.RandomState] = None) -> float:
        rng = rng or np.random.RandomState()
        x0d = rng.uniform(size=1)
        x0f = rng.uniform(size=self._n_final)
        return float(self._experiment(jnp.asarray(x0d), jnp.asarray(x0f)))


def run_cs_adapt(num_iterations: int = 20, qubit_counts: Sequence[int] = (7, 8),
                 optimizer: str = "BFGS", seed: int = 42,
                 verbose: bool = True) -> Dict:
    """Experiment sweep over the 7- and 8-qubit contextual Hamiltonians
    (reference adapt.py:210-358)."""
    rng = np.random.RandomState(seed)
    hams = load_cs_hams()
    results: Dict = {"num_qubits": list(qubit_counts), "mean_durations": [],
                     "std_durations": [], "mean_rel_errs": [], "std_rel_errs": []}
    fused = optimizer in ("lbfgs-fused", "fused")
    for n_qubits in qubit_counts:
        ham, hf = hams[n_qubits]
        ctx = FusedAdaptContext(ham, hf) if fused else AdaptContext(ham, hf)
        if verbose:
            print(f"\nnum qubits = {n_qubits}")
            print(f"num electrons = {ctx.electrons}")
            print(f"Total number of excitations = "
                  f"{len(ctx.singles) + len(ctx.doubles)}")
        # warm-up run compiles all jit programs; excluded from timing (the
        # reference's CUDA-Q kernels are JIT-compiled on first use too)
        if fused:
            ctx.run(rng)
        else:
            run_cs_adapt_experiment(ctx, optimizer, rng)
        durs, errs = [], []
        e = None
        for _ in range(num_iterations):
            start = time()
            e = ctx.run(rng) if fused else run_cs_adapt_experiment(
                ctx, optimizer, rng)
            durs.append(time() - start)
            errs.append(rel_err(CCSD_ENERGY, e))
        results["mean_durations"].append(float(np.mean(durs)))
        results["std_durations"].append(float(np.std(durs)))
        results["mean_rel_errs"].append(float(np.mean(errs)))
        results["std_rel_errs"].append(float(np.std(errs)))
        if verbose:
            print(f"minimized <H> = {e}")
            print(f"rel_error = {results['mean_rel_errs'][-1]}"
                  f" +- {results['std_rel_errs'][-1]}")
            print(f"duration = {results['mean_durations'][-1]}"
                  f" += {results['std_durations'][-1]}")
    return results


if __name__ == "__main__":
    run_cs_adapt()
