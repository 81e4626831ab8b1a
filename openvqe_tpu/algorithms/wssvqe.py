"""Weighted Subspace-Search VQE (excited states).

Rebuild of reference ``common_files/get_energy_WSSVQE.py``: a shared
hardware-efficient ansatz (RY/RZ layers + CNOT ladder,
get_energy_WSSVQE.py:70-105) applied to orthogonal basis states |k>, with the
weighted cost sum_k w_k <psi_k|H|psi_k> minimized jointly.  Here the ansatz
is a pure jitted statevector program and the weighted objective gets exact
autodiff gradients; the reference finite-differences a circuit per term.

No ``taper`` option here (unlike the UCC/QUCCSD/ADAPT families): the HEA's
RY/RZ generators commute with no Z2 symmetry of the Hamiltonian (the joint
GF(2) nullspace in ops/tapering is empty for single-qubit Y x-masks), and
the subspace-search targets excited states that span symmetry sectors — an
exact ansatz-aware taper does not exist for this algorithm.

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


def hea_ops(nqbits: int, depth: int) -> List[Tuple]:
    """The HEA gate list (reference :70-105): RY/RZ pre-rotation on qubit 0,
    `depth` layers of per-qubit RY/RZ + two CNOT ladders, final RY/RZ layer.
    Entries: ("ry"|"rz", qubit, theta_index) or ("cnot", control, target)."""
    ops: List[Tuple] = [("ry", 0, -2), ("rz", 0, -1)]
    for d in range(depth):
        for i in range(nqbits):
            ops.append(("ry", i, 2 * i + 2 * nqbits * d))
            ops.append(("rz", i, 2 * i + 1 + 2 * nqbits * d))
        for i in range(nqbits // 2):
            ops.append(("cnot", 2 * i + 1, 2 * i))
        for i in range(nqbits // 2 - 1):
            ops.append(("cnot", 2 * i + 2, 2 * i + 1))
    for i in range(nqbits):
        ops.append(("ry", i, 2 * i + 2 * nqbits * depth))
        ops.append(("rz", i, 2 * i + 1 + 2 * nqbits * depth))
    return ops


def hea_state(theta: jnp.ndarray, k: int, nqbits: int, depth: int,
              cdtype=None) -> jnp.ndarray:
    """Hardware-efficient ansatz on basis state |k> (reference :70-105)."""
    psi = jnp.asarray(sv.hf_state(nqbits, k, cdtype))
    for op in hea_ops(nqbits, depth):
        kind, a, b = op
        if kind == "ry":
            psi = sv.apply_ry(psi, theta[b], a, nqbits)
        elif kind == "rz":
            psi = sv.apply_rz(psi, theta[b], a, nqbits)
        else:
            psi = sv.apply_cnot(psi, a, b, nqbits)
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


def _build_sharded_wssvqe(model: PauliSum, n: int, depth: int, n_states: int,
                          weights: Sequence[float], mesh):
    """(total, grad_total, energies_fns, state_fns) with the statevectors
    sharded over the mesh: gate-level applies from parallel/sharded_gates
    (static one-hop ppermutes for the d global qubits), local grouped
    expectation psum'd over the mesh axis.  Differentiable end-to-end —
    jax.grad rides through shard_map's collectives."""
    try:
        from jax import shard_map
    except ImportError:                                   # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel import sharded as sh
    from ..parallel import sharded_gates as sg
    from ..sim import grouped as gr

    d = sh.log2_devices(mesh)
    if n <= d:
        raise ValueError(f"need n > log2(devices): n={n}, d={d}")
    h = sh._split_ham(gr.group_pauli_sum(compile_pauli_sum(model, n)), d)

    def hea_local(theta, k):
        psi = sg.basis_state_local(k, n, d, dtype=theta.dtype)
        for op in hea_ops(n, depth):
            kind, a, b = op
            if kind == "ry":
                psi = sg.apply_ry(psi, theta[b], a, n, d)
            elif kind == "rz":
                psi = sg.apply_rz(psi, theta[b], a, n, d)
            else:
                psi = sg.apply_cnot(psi, a, b, n, d)
        return psi

    def l_total(theta):
        tot = jnp.zeros((), theta.dtype)
        for k in range(n_states):
            psi = hea_local(theta, k)
            tot = tot + weights[k] * sh._local_expectation(psi, h, d)
        return jax.lax.psum(tot, sh.AXIS)

    sm = lambda f, outs: jax.jit(shard_map(
        f, mesh=mesh, in_specs=(P(),), out_specs=outs))
    total = sm(l_total, P())
    grad_total = jax.jit(jax.grad(lambda th: sm(l_total, P())(th)))

    energies_fns = []
    state_fns = []
    for k in range(n_states):
        def make(k):
            efn = sm(lambda th: jax.lax.psum(
                sh._local_expectation(hea_local(th, k), h, d), sh.AXIS), P())
            sfn = sm(lambda th: hea_local(th, k), sh.SPEC)
            return efn, sfn
        efn, sfn = make(k)
        energies_fns.append(efn)
        state_fns.append(sfn)
    return total, grad_total, energies_fns, state_fns


def run_wssvqe(model: PauliSum, n_states: int, depth: int,
               weights: Optional[Sequence[float]] = None,
               method: str = "BFGS", tol: float = 1e-6,
               maxiter: int = 10000, seed: int = 0,
               track_fidelity: bool = True, mesh=None) -> Dict:
    """Jointly minimize sum_k w_k <psi_k(theta)|H|psi_k(theta)> and return
    per-state energies, fidelities vs the exact eigenvectors, and the
    optimization trace (reference opt_funct, :151-178).  ``mesh`` shards
    every statevector over the device mesh (SURVEY §2.2)."""
    n = model.nbqbits
    if weights is None:
        weights = [float(n_states - i) for i in range(n_states)]
    weights = list(weights)
    ham = compile_pauli_sum(model, n)

    state_fns = None
    if mesh is not None:
        total, grad_total, energies_fns, state_fns = _build_sharded_wssvqe(
            model, n, depth, n_states, weights, mesh)
    else:
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
                if state_fns is not None:
                    planes = np.asarray(state_fns[i](theta))
                    psi = planes[0] + 1j * planes[1]
                else:
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
        opts = dict(self.opts)
        mesh = opts.pop("mesh", None)
        nd = opts.pop("mesh_devices", None)
        if mesh is None and nd:
            from ..parallel.sharded import make_mesh
            mesh = make_mesh(int(nd))
        return run_wssvqe(model, self.n_states, self.depth, mesh=mesh, **opts)
