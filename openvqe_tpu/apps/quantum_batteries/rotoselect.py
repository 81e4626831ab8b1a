"""CS-VQE with the Rotoselect optimizer.

Rebuild of reference ``applications/quantum_batteries/rotoselect.py``
(logs/rotoselect.txt): closed-form per-parameter updates that also choose
each gate's generator among {RX, RY, RZ}.

TPU-first design change: the reference rebuilds the CUDA-Q kernel for every
generator assignment.  Here generator choices are DATA — an int vector
switched over inside one jitted program (`lax.switch`) — so the entire
rotoselect sweep reuses a single compiled executable.
"""

from __future__ import annotations

from time import time
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.pauli import PauliSum
from ...sim import statevector as sv
from ...sim.compile import compile_pauli_sum
from .utils import CCSD_ENERGY, hf_bitstring_to_int, load_cs_hams, rel_err

GEN_NAMES = np.array(["X", "Y", "Z"])


def build_rotoselect_cost(ham: PauliSum, hf: Optional[str]):
    """cost(params, gen_ids) jitted once: one RX/RY/RZ layer (chosen per
    qubit by gen_ids in {0,1,2}) + CNOT ladder on the HF state
    (reference rotoselect.py:56-101)."""
    n = ham.nbqbits
    c = compile_pauli_sum(ham, n)
    hargs = sv.as_device(c)
    hf_init = hf_bitstring_to_int(hf)

    @jax.jit
    def cost(params, gen_ids):
        psi = jnp.asarray(sv.hf_state(n, hf_init))
        for q in range(n):
            psi = jax.lax.switch(
                gen_ids[q],
                [lambda p, th, q=q: sv.apply_rx(p, th, q, n),
                 lambda p, th, q=q: sv.apply_ry(p, th, q, n),
                 lambda p, th, q=q: sv.apply_rz(p, th, q, n)],
                psi, params[q])
        for q in range(n - 1):
            psi = sv.apply_cnot(psi, q, q + 1, n)
        return sv.expectation(psi, *hargs)

    return cost


def rotosolve(d: int, params: np.ndarray, gen_ids: np.ndarray, cost, M_0: float
              ) -> float:
    """Closed-form sinusoidal minimization of parameter d
    (reference rotoselect.py:104-133)."""
    params[d] = np.pi / 2.0
    M_plus = float(cost(jnp.asarray(params), jnp.asarray(gen_ids)))
    params[d] = -np.pi / 2.0
    M_minus = float(cost(jnp.asarray(params), jnp.asarray(gen_ids)))
    a = np.arctan2(2.0 * M_0 - M_plus - M_minus, M_plus - M_minus)
    params[d] = -np.pi / 2.0 - a
    if params[d] <= -np.pi:
        params[d] += 2 * np.pi
    return float(cost(jnp.asarray(params), jnp.asarray(gen_ids)))


def optimal_theta_and_gen(d: int, params: np.ndarray, gen_ids: np.ndarray,
                          cost):
    """Try all three generators for parameter d; keep the best
    (reference rotoselect.py:136-170)."""
    params[d] = 0.0
    M_0 = float(cost(jnp.asarray(params), jnp.asarray(gen_ids)))
    best = None
    for g in range(3):
        gen_ids[d] = g
        val = rotosolve(d, params, gen_ids, cost, M_0)
        if best is None or val <= best[1]:
            best = (params[d], val, g)
    return best[0], best[2]


def rotoselect_cycle(cost, params: np.ndarray, gen_ids: np.ndarray):
    for d in range(len(params)):
        params[d], gen_ids[d] = optimal_theta_and_gen(d, params, gen_ids, cost)
    return params, gen_ids


def build_fused_rotoselect(ham: PauliSum, hf: Optional[str], n_steps: int):
    """The ENTIRE rotoselect optimization as ONE jitted program:
    lax.scan over cycles, lax.fori over parameters, the 3 candidate
    generators batched with vmap.  The host-loop version dispatches ~10
    tiny device calls per parameter per cycle (tunnel-latency bound — the
    round-1 TPU numbers LOST to the reference GPU on this workload); fused,
    the whole 50-cycle run is one executable."""
    n = ham.nbqbits
    c = compile_pauli_sum(ham, n)
    hargs = sv.as_device(c)
    hf_init = hf_bitstring_to_int(hf)
    psi0 = sv.hf_state(n, hf_init)

    def cost(params, gen_ids):
        psi = jnp.asarray(psi0)
        for q in range(n):
            psi = jax.lax.switch(
                gen_ids[q],
                [lambda p, th, q=q: sv.apply_rx(p, th, q, n),
                 lambda p, th, q=q: sv.apply_ry(p, th, q, n),
                 lambda p, th, q=q: sv.apply_rz(p, th, q, n)],
                psi, params[q])
        for q in range(n - 1):
            psi = sv.apply_cnot(psi, q, q + 1, n)
        return sv.expectation(psi, *hargs)

    def per_param(d, carry):
        params, gens = carry
        p0 = params.at[d].set(0.0)
        M0 = cost(p0, gens)        # theta=0: generator-independent

        def candidate(g):
            gg = gens.at[d].set(g)
            Mp = cost(p0.at[d].set(jnp.pi / 2.0), gg)
            Mm = cost(p0.at[d].set(-jnp.pi / 2.0), gg)
            a = jnp.arctan2(2.0 * M0 - Mp - Mm, Mp - Mm)
            th = -jnp.pi / 2.0 - a
            th = jnp.where(th <= -jnp.pi, th + 2.0 * jnp.pi, th)
            return th, cost(p0.at[d].set(th), gg)

        ths, vals = jax.vmap(candidate)(jnp.arange(3))
        # the reference keeps the LAST generator on ties (<= comparison)
        gbest = 2 - jnp.argmin(vals[::-1])
        return (p0.at[d].set(ths[gbest]), gens.at[d].set(gbest))

    @jax.jit
    def run(params, gen_ids):
        def cycle(carry, _):
            return jax.lax.fori_loop(0, n, per_param, carry), None

        (params, gens), _ = jax.lax.scan(cycle, (params, gen_ids), None,
                                         length=n_steps)
        return params, gens, cost(params, gens)

    return run


def run_rotoselect(num_iterations: int = 10, n_steps: int = 50,
                   qubit_counts: Optional[Sequence[int]] = None,
                   seed: int = 42, verbose: bool = True,
                   fused: bool = False) -> Dict:
    """Experiment sweep (reference rotoselect.py:195-269)."""
    rng = np.random.RandomState(seed)
    hams = load_cs_hams()
    counts = sorted(hams.keys()) if qubit_counts is None else list(qubit_counts)
    results: Dict = {"num_qubits": counts, "mean_durations": [],
                     "std_durations": [], "mean_rel_errs": [],
                     "std_rel_errs": [], "generators": []}
    for n_qubits in counts:
        ham, hf = hams[n_qubits]
        if fused:
            fused_run = build_fused_rotoselect(ham, hf, n_steps)
            out = fused_run(jnp.zeros(n_qubits),
                            jnp.ones(n_qubits, dtype=jnp.int32))
            jax.block_until_ready(out[0])          # compile warm-up
        else:
            cost = build_rotoselect_cost(ham, hf)
            _ = float(cost(jnp.zeros(n_qubits),
                           jnp.zeros(n_qubits, dtype=jnp.int32)))
        durs, errs = [], []
        gen_ids = None
        e = None
        for _ in range(num_iterations):
            params = rng.uniform(size=n_qubits)
            gen_ids = np.ones(n_qubits, dtype=np.int32)  # start from all-RY
            start = time()
            if fused:
                p_j, g_j, e_j = fused_run(jnp.asarray(params),
                                          jnp.asarray(gen_ids))
                e = float(e_j)
                gen_ids = np.asarray(g_j)
            else:
                for _ in range(n_steps):
                    params, gen_ids = rotoselect_cycle(cost, params, gen_ids)
                e = float(cost(jnp.asarray(params), jnp.asarray(gen_ids)))
            durs.append(time() - start)
            errs.append(rel_err(CCSD_ENERGY, e))
        results["mean_durations"].append(float(np.mean(durs)))
        results["std_durations"].append(float(np.std(durs)))
        results["mean_rel_errs"].append(float(np.mean(errs)))
        results["std_rel_errs"].append(float(np.std(errs)))
        results["generators"].append(GEN_NAMES[gen_ids].tolist())
        if verbose:
            print(f"\nnum qubits = {n_qubits}")
            print(f"minimized <H> = {e}")
            print(f"rel_error = {results['mean_rel_errs'][-1]}"
                  f" +- {results['std_rel_errs'][-1]}")
            print(f"duration = {results['mean_durations'][-1]}"
                  f" += {results['std_durations'][-1]}")
            print(f"generators = {results['generators'][-1]}")
    return results


if __name__ == "__main__":
    run_rotoselect()
