"""CS-VQE: hardware-efficient-ansatz VQE on the contextual Hamiltonians.

Rebuild of reference ``applications/quantum_batteries/cs_vqe.py`` (headline
benchmark: logs/cs_vqe.txt).  The CUDA-Q kernel + NelderMead loop becomes a
jitted statevector program with exact adjoint gradients; Nelder-Mead remains
available for method-parity runs.

Ansatz (cs_vqe.py:69-81): optional HF X-preps, then `layers` of [RY on every
qubit + CNOT ladder], then a final RY layer; (layers+1)*n_qubits parameters.
"""

from __future__ import annotations

from time import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import scipy.optimize

from ...optim.minimize import lbfgs_minimize
from ...ops.pauli import PauliSum
from ...sim import statevector as sv
from ...sim.compile import compile_pauli_sum
from .utils import CCSD_ENERGY, hf_bitstring_to_int, load_cs_hams, rel_err


def hea_state(theta: jnp.ndarray, n_qubits: int, num_layers: int,
              hf_init: int, cdtype=None) -> jnp.ndarray:
    psi = jnp.asarray(sv.hf_state(n_qubits, hf_init, cdtype))
    for l in range(num_layers):
        for q in range(n_qubits):
            psi = sv.apply_ry(psi, theta[l * n_qubits + q], q, n_qubits)
        for q in range(n_qubits - 1):
            psi = sv.apply_cnot(psi, q, q + 1, n_qubits)
    for q in range(n_qubits):
        psi = sv.apply_ry(psi, theta[num_layers * n_qubits + q], q, n_qubits)
    return psi


def build_hea_energy(ham: PauliSum, num_layers: int, hf: Optional[str]):
    n = ham.nbqbits
    c = compile_pauli_sum(ham, n)
    hargs = sv.as_device(c)
    hf_init = hf_bitstring_to_int(hf)

    @jax.jit
    def energy(theta):
        psi = hea_state(theta, n, num_layers, hf_init)
        return sv.expectation(psi, *hargs)

    grad = jax.jit(jax.grad(energy))
    return energy, grad


def build_fused_hea_vqe(ham: PauliSum, num_layers: int, hf: Optional[str],
                        tol: float = 3e-4, maxiter: int = 500):
    """The ENTIRE HEA optimization as one jitted program (jit-resident
    L-BFGS with zoom linesearch): one device call per experiment instead of
    one per scipy evaluation — the same fusion that carries the CS-ADAPT
    headline row.  The optimizer sees the energy WITHOUT the -3683 Ha
    identity offset (f32 line searches plateau otherwise); the constant is
    re-added for reporting.

    The default gradient tolerance is NOISE-MATCHED: the HEA-4 model error
    floor on these contextual Hamiltonians is ~0.11 Ha above CCSD (rel err
    3.0e-05, every restart converges there), so driving the f32 gradient
    below ~3e-4 only spins the while_loop at the rounding floor — measured
    on v5e at 6 qubits: tol=1e-5 takes 8.8 s/experiment, tol=3e-4 takes
    0.046 s at IDENTICAL converged energies."""
    from ...sim import grouped as gr

    n = ham.nbqbits
    c = compile_pauli_sum(ham, n)
    gham = gr.group_pauli_sum(c)
    const = float(gham.c_re)
    gham.c_re = 0.0                       # optimizer sees the shifted energy
    hargs = gr.ham_as_device(gham)
    hf_init = hf_bitstring_to_int(hf)

    def energy(theta):
        psi = hea_state(theta, n, num_layers, hf_init)
        return gr.grouped_expectation(psi, *hargs)

    @jax.jit
    def run(x0):
        x, e, _ = lbfgs_minimize(energy, x0, tol=tol, maxiter=maxiter,
                                 patience=25, ftol=1e-5)
        return x, e + const

    return run


def run_single_vqe(ham: PauliSum, num_layers: int, hf: Optional[str],
                   x0: np.ndarray, optimizer: str = "BFGS",
                   max_iterations: int = 1000):
    energy, grad = build_hea_energy(ham, num_layers, hf)
    if optimizer == "Nelder-Mead":
        opt = scipy.optimize.minimize(
            lambda x: float(energy(jnp.asarray(x))), x0=x0,
            method="Nelder-Mead", options={"maxiter": max_iterations})
    else:
        opt = scipy.optimize.minimize(
            lambda x: float(energy(jnp.asarray(x))), x0=x0, method=optimizer,
            jac=lambda x: np.asarray(grad(jnp.asarray(x)), dtype=float),
            options={"maxiter": max_iterations})
    return float(opt.fun), opt.x


def run_cs_vqe(layers: Sequence[int] = (4, 8, 12), num_iterations: int = 20,
               qubit_counts: Optional[Sequence[int]] = None,
               optimizer: str = "BFGS", seed: int = 42,
               verbose: bool = True) -> Dict:
    """Full experiment sweep (reference cs_vqe.py:36-117): for each layer
    count and each contextual Hamiltonian, `num_iterations` random restarts;
    records mean/std of relative error vs CCSD and wall-clock."""
    rng = np.random.RandomState(seed)
    hams = load_cs_hams()
    counts = sorted(hams.keys()) if qubit_counts is None else list(qubit_counts)

    results: Dict = {
        "layers": list(layers), "num_qubits": counts,
        "mean_durations": {l: [] for l in layers},
        "std_durations": {l: [] for l in layers},
        "mean_rel_errs": {l: [] for l in layers},
        "std_rel_errs": {l: [] for l in layers},
    }

    for num_layers in layers:
        if verbose:
            print(f"\nnum layers = {num_layers}")
        for n_qubits in counts:
            ham, hf = hams[n_qubits]
            parameter_count = (num_layers + 1) * n_qubits
            fused = optimizer in ("lbfgs-fused", "fused")
            if fused:
                fused_run = build_fused_hea_vqe(ham, num_layers, hf)
                # warm with a REPRESENTATIVE draw and force the energy
                # scalar: on the axon backend the first nontrivial
                # execution pays a large one-time runtime cost that a
                # zeros-input warmup does not absorb (measured 38 s, then
                # 0.04 s steady-state)
                warm_rng = np.random.RandomState(987)
                for w in (jnp.zeros(parameter_count),
                          jnp.asarray(warm_rng.uniform(size=parameter_count))):
                    float(fused_run(w)[1])
            else:
                energy_fn, grad_fn = build_hea_energy(ham, num_layers, hf)
                # warm the jit cache so timings measure the optimization
                _ = float(energy_fn(jnp.zeros(parameter_count)))
                _ = np.asarray(grad_fn(jnp.zeros(parameter_count)))

            durs, errs = [], []
            e_last = None
            for _ in range(num_iterations):
                x0 = rng.uniform(size=parameter_count)
                start = time()
                if fused:
                    _, e_j = fused_run(jnp.asarray(x0))
                    e_last = float(e_j)
                elif optimizer == "Nelder-Mead":
                    opt = scipy.optimize.minimize(
                        lambda x: float(energy_fn(jnp.asarray(x))), x0=x0,
                        method="Nelder-Mead", options={"maxiter": 1000})
                    e_last = float(opt.fun)
                else:
                    opt = scipy.optimize.minimize(
                        lambda x: float(energy_fn(jnp.asarray(x))), x0=x0,
                        method=optimizer,
                        jac=lambda x: np.asarray(grad_fn(jnp.asarray(x)),
                                                 dtype=float),
                        options={"maxiter": 1000})
                    e_last = float(opt.fun)
                durs.append(time() - start)
                errs.append(rel_err(CCSD_ENERGY, e_last))
            results["mean_durations"][num_layers].append(float(np.mean(durs)))
            results["std_durations"][num_layers].append(float(np.std(durs)))
            results["mean_rel_errs"][num_layers].append(float(np.mean(errs)))
            results["std_rel_errs"][num_layers].append(float(np.std(errs)))
            if verbose:
                print(f"num qubits = {n_qubits}")
                print(f"minimized <H> = {e_last}")
                print(f"num params = {parameter_count}")
                print(f"rel_error = {results['mean_rel_errs'][num_layers][-1]}"
                      f" +- {results['std_rel_errs'][num_layers][-1]}")
                print(f"duration = {results['mean_durations'][num_layers][-1]}"
                      f" += {results['std_durations'][num_layers][-1]}")
    return results


def plot_results(results: Dict, save_path: str = "cs_vqe.png"):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(1, 2, figsize=(12, 5))
    nq = results["num_qubits"]
    for l in results["layers"]:
        ax[0].errorbar(nq, results["mean_rel_errs"][l],
                       results["std_rel_errs"][l], marker="o",
                       label=f"{l} layers", capsize=4)
        ax[1].errorbar(nq, results["mean_durations"][l],
                       results["std_durations"][l], marker="o",
                       label=f"{l} layers", capsize=4)
    ax[0].set_xlabel("# qubits"); ax[0].set_ylabel("Rel Error")
    ax[0].set_yscale("log"); ax[0].set_title("Relative error"); ax[0].legend()
    ax[1].set_xlabel("# qubits"); ax[1].set_ylabel("durations")
    ax[1].set_title("Runtime"); ax[1].legend()
    plt.savefig(save_path)
    plt.close()


if __name__ == "__main__":
    res = run_cs_vqe()
    plot_results(res)
