"""Weighted Subspace-Search VQE (excited states).

Rebuild of reference ``common_files/get_energy_WSSVQE.py``: a shared
hardware-efficient ansatz (RY/RZ layers + CNOT ladder,
get_energy_WSSVQE.py:70-105) applied to orthogonal basis states |k>, with the
weighted cost sum_k w_k <psi_k|H|psi_k> minimized jointly.  Here the ansatz
is a pure jitted statevector program and the weighted objective gets exact
autodiff gradients; the reference finite-differences a circuit per term.

Includes the random transverse-field Ising model builder (ising, :23-42,
same seed/coefficient layout) and the eigsh-based exact reference spectrum
(:110-127).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.optimize
import scipy.sparse.linalg as spla

from ..ops.pauli import PauliSum
from ..sim import statevector as sv
from ..sim.compile import compile_pauli_sum


def ising(N: int, seed: int = 123) -> PauliSum:
    """Random transverse-field Ising model (reference :23-42: X fields a_i,
    ZZ couplings J_ij for j < i, np.random.seed(123))."""
    rng = np.random.RandomState(seed)
    out = PauliSum.identity(N, 0.0)
    a = rng.random_sample(N)
    for i in range(N):
        out = out + PauliSum.from_term(N, float(a[i]), "X", [i])
    J = rng.random_sample((N, N))
    for i in range(N):
        for j in range(i):
            out = out + PauliSum.from_term(N, float(J[i, j]), "ZZ", [i, j])
    return out


def molecule_generator(model: str):
    """WSSVQE's own molecule table (reference :45-65; H2 at r=0.98!)."""
    if model == "H2":
        r = 0.98
        return r, [("H", (0, 0, 0)), ("H", (0, 0, r))], 0, 0, "sto-3g"
    if model == "H4":
        r = 0.85
        return r, [("H", (0, 0, k * r)) for k in range(4)], 0, 0, "sto-3g"
    raise KeyError(f"unknown WSSVQE model {model!r}")


def n_parameters(nqbits: int, depth: int) -> int:
    return 2 * nqbits * (depth + 1) + 2


def hea_state(theta: jnp.ndarray, k: int, nqbits: int, depth: int,
              cdtype=None) -> jnp.ndarray:
    """Hardware-efficient ansatz on basis state |k> (reference :70-105):
    X-prep, RY/RZ pre-rotation on qubit 0, `depth` layers of per-qubit RY/RZ
    + two CNOT ladders, final RY/RZ layer."""
    psi = jnp.asarray(sv.hf_state(nqbits, k, cdtype))
    psi = sv.apply_ry(psi, theta[-2], 0, nqbits)
    psi = sv.apply_rz(psi, theta[-1], 0, nqbits)
    for d in range(depth):
        for i in range(nqbits):
            psi = sv.apply_ry(psi, theta[2 * i + 2 * nqbits * d], i, nqbits)
            psi = sv.apply_rz(psi, theta[2 * i + 1 + 2 * nqbits * d], i, nqbits)
        for i in range(nqbits // 2):
            psi = sv.apply_cnot(psi, 2 * i + 1, 2 * i, nqbits)
        for i in range(nqbits // 2 - 1):
            psi = sv.apply_cnot(psi, 2 * i + 2, 2 * i + 1, nqbits)
    for i in range(nqbits):
        psi = sv.apply_ry(psi, theta[2 * i + 2 * nqbits * depth], i, nqbits)
        psi = sv.apply_rz(psi, theta[2 * i + 1 + 2 * nqbits * depth], i, nqbits)
    return psi


def calculate_eigen_vectors(model: PauliSum, vals: int
                            ) -> Tuple[np.ndarray, List[np.ndarray]]:
    """Lowest eigenpairs via matrix-free Lanczos (reference :110-127 uses a
    dense matrix; never materialized here)."""
    n = model.nbqbits
    c = compile_pauli_sum(model, n)
    hargs = sv.as_device(c)

    def matvec(v):
        planes = jnp.asarray(sv.complex_to_planes(np.asarray(v).ravel()))
        return sv.to_host(sv.ham_apply(planes, *hargs))

    dim = 1 << n
    op = spla.LinearOperator((dim, dim), matvec=matvec, dtype=complex)
    w, v = spla.eigsh(op, k=vals, which="SA")
    order = np.argsort(w)
    return w[order], [v[:, i] for i in order]


def run_wssvqe(model: PauliSum, n_states: int, depth: int,
               weights: Optional[Sequence[float]] = None,
               method: str = "BFGS", tol: float = 1e-6,
               maxiter: int = 10000, seed: int = 0,
               track_fidelity: bool = True) -> Dict:
    """Jointly minimize sum_k w_k <psi_k(theta)|H|psi_k(theta)> and return
    per-state energies, fidelities vs the exact eigenvectors, and the
    optimization trace (reference opt_funct, :151-178)."""
    n = model.nbqbits
    if weights is None:
        weights = [float(n_states - i) for i in range(n_states)]
    weights = list(weights)
    ham = compile_pauli_sum(model, n)
    hargs = sv.as_device(ham)

    energies_fns = []
    for k in range(n_states):
        def make(k):
            @jax.jit
            def efn(theta):
                psi = hea_state(theta, k, n, depth)
                return sv.expectation(psi, *hargs)
            return efn
        energies_fns.append(make(k))

    @jax.jit
    def total(theta):
        tot = 0.0
        for k in range(n_states):
            psi = hea_state(theta, k, n, depth)
            tot = tot + weights[k] * sv.expectation(psi, *hargs)
        return tot

    grad_total = jax.jit(jax.grad(total))

    exact_vals, exact_vecs = (None, None)
    if track_fidelity:
        exact_vals, exact_vecs = calculate_eigen_vectors(
            model, max(n_states, 2))

    energy_lists: Dict[str, List[float]] = {
        f"energy_circ_{i}": [] for i in range(n_states)}
    fidelity_lists: Dict[str, List[float]] = {
        f"fidelity_circ_{i}": [] for i in range(n_states)}

    def record(x):
        theta = jnp.asarray(x)
        for i in range(n_states):
            e = float(energies_fns[i](theta))
            energy_lists[f"energy_circ_{i}"].append(e)
            if track_fidelity:
                psi = sv.to_host(hea_state(theta, i, n, depth))
                ov = np.vdot(exact_vecs[i], psi)
                fidelity_lists[f"fidelity_circ_{i}"].append(
                    float(np.abs(ov) ** 2))

    rng = np.random.default_rng(seed)
    x0 = rng.normal(scale=0.1, size=n_parameters(n, depth))
    opt = scipy.optimize.minimize(
        lambda x: float(total(jnp.asarray(x))), x0=x0, method=method, tol=tol,
        jac=lambda x: np.asarray(grad_total(jnp.asarray(x)), dtype=float),
        callback=record, options={"maxiter": maxiter})
    record(opt.x)

    final_energies = [energy_lists[f"energy_circ_{i}"][-1]
                      for i in range(n_states)]
    return {
        "opt_result": opt,
        "final_energies": final_energies,
        "exact_eigenvalues": exact_vals,
        "energy_lists": energy_lists,
        "fidelity_lists": fidelity_lists,
        "weights": weights,
    }


class WSSVQE:
    """Driver: WSSVQE on the random TFIM or a molecule model."""

    def __init__(self, model: str = "ising", nqbits: int = 4,
                 n_states: int = 2, depth: int = 3, opts: Optional[Dict] = None):
        self.model_name = model
        self.nqbits = nqbits
        self.n_states = n_states
        self.depth = depth
        self.opts = opts or {}

    def build_model(self) -> PauliSum:
        if self.model_name == "ising":
            return ising(self.nqbits)
        from ..chem.frontend import compute_molecule
        from ..ops.hamiltonian import (ElectronicStructureHamiltonian,
                                       convert_to_h_integrals)
        r, geometry, charge, spin, basis = molecule_generator(self.model_name)
        md = compute_molecule(geometry, basis, spin, charge)
        hpq, hpqrs = convert_to_h_integrals(md.one_body_integrals,
                                            md.two_body_integrals)
        ham = ElectronicStructureHamiltonian(hpq, hpqrs, md.nuclear_repulsion)
        return ham.to_spin("JW")

    def execute(self) -> Dict:
        model = self.build_model()
        self.nqbits = model.nbqbits
        return run_wssvqe(model, self.n_states, self.depth, **self.opts)
