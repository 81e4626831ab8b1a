"""Checkpoint/resume at streaming scale (round-3 VERDICT item 8).

The existing resume test (test_infra.py) runs H4 on the 8-qubit dense
path.  Here the SAME loop runs at 21 qubits over a 2-device mesh, where
``_objective_and_screen`` picks the sharded-STREAMING composition
(ShardedStreamObjective, impl="xla" on CPU — the per-device block L=20
outgrows the VMEM 2-state window) and the streaming optimizer policy
(BFGS -> L-BFGS-B against the f32 noise floor) engages.  A run
interrupted mid-loop and resumed from its checkpoint must reproduce the
uninterrupted trajectory bitwise.

The 21-qubit problem is H4/STO-3G padded with 13 idle qubits: PauliSum
masks are qubit0=LSB (sim/compile.py reverses at the target n), so terms
carry over verbatim; hf_init is qubit0=MSB and shifts up.  Energies are
exactly H4's, at a 2^21 state size.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from openvqe_tpu.algorithms.adapt import fermionic_adapt_vqe
from openvqe_tpu.ops.pauli import PauliSum
from openvqe_tpu.parallel import sharded as sh
from openvqe_tpu.parallel import sharded_stream as ss

N = 21          # d=1 mesh -> L=20 > MAX_N_2STATE: streaming path engages


@pytest.fixture(scope="module")
def padded_h4():
    from openvqe_tpu.chem.frontend import compute_molecule
    from openvqe_tpu.ops.hamiltonian import (
        ElectronicStructureHamiltonian, convert_to_h_integrals)
    from openvqe_tpu.ops.transforms import transform_operator
    from openvqe_tpu.ops.uccsd import get_cluster_ops_and_init_guess

    md = compute_molecule([("H", (0, 0, 0.85 * k)) for k in range(4)],
                          "sto-3g")
    hpq, hpqrs = convert_to_h_integrals(md.one_body_integrals,
                                        md.two_body_integrals)
    ham = ElectronicStructureHamiltonian(hpq, hpqrs, md.nuclear_repulsion)
    hsp = ham.to_spin("JW")
    eps_full = [e for e in md.orbital_energies for _ in range(2)]
    cluster_ops, _, hf_init = get_cluster_ops_and_init_guess(
        md.n_elec, [0] * 8, eps_full, hpqrs)
    cluster = [transform_operator(op, "JW") for op in cluster_ops]
    hsp_n = PauliSum(N, hsp._terms, hsp.constant_coeff)
    cluster_n = [PauliSum(N, g._terms, g.constant_coeff) for g in cluster]
    hf_n = hf_init << (N - 8)
    return hsp_n, cluster_n, hf_n, md


def test_streaming_scale_checkpoint_resume(padded_h4, tmp_path, monkeypatch):
    hsp_n, cluster_n, hf_n, md = padded_h4

    # the CI mesh runs x64; streaming paths are f32-only
    monkeypatch.setattr("openvqe_tpu.sim.statevector.default_rdtype",
                        lambda: np.float32)
    monkeypatch.setattr("openvqe_tpu.sim.grouped.default_rdtype",
                        lambda: np.float32)
    monkeypatch.setattr("openvqe_tpu.sim.statevector.default_cdtype",
                        lambda: jnp.complex64)

    # spy on the objective factory: the loop must actually take the
    # sharded-streaming path, not silently fall back to ShardedVQEObjective
    created = []
    orig = ss.make_sharded_objective

    def spy(*a, **k):
        obj = orig(*a, **k)
        created.append(obj)
        return obj

    monkeypatch.setattr("openvqe_tpu.parallel.sharded_stream."
                        "make_sharded_objective", spy)

    mesh = sh.make_mesh(2)
    kw = dict(n_max_grads=1, fci=md.info["FCI"], optimizer="BFGS",
              tolerance=1e-7, verbose=False)

    it_full, _ = fermionic_adapt_vqe(cluster_n, hsp_n, hf_n, mesh=mesh,
                                     max_external_iterations=3, **kw)
    assert created and isinstance(created[-1], ss.ShardedStreamObjective)
    assert created[-1]._streaming and created[-1].impl == "xla"
    assert np.isclose(it_full["energies"][0], md.info["HF"], atol=2e-3) or \
        it_full["energies"][0] < md.info["HF"] + 1e-6  # descending from HF
    assert it_full["energies"][-1] < it_full["energies"][0]

    # interrupt after 2 outer iterations, then resume to 3
    ck = str(tmp_path / "ck_stream.json")
    it_a, _ = fermionic_adapt_vqe(cluster_n, hsp_n, hf_n, mesh=mesh,
                                  max_external_iterations=2,
                                  checkpoint_path=ck, **kw)
    assert len(it_a["energies"]) == 2
    assert os.path.exists(ck)
    it_b, _ = fermionic_adapt_vqe(cluster_n, hsp_n, hf_n, mesh=mesh,
                                  max_external_iterations=3,
                                  checkpoint_path=ck, **kw)

    # resumed trajectory == uninterrupted trajectory, bitwise (same f32
    # arithmetic: resume rebuilds psi by the same bind().forward() the
    # in-loop path uses)
    assert it_b["energies"] == it_full["energies"]
    assert it_b["norms"] == it_full["norms"]
    assert it_b["Max_gradients"] == it_full["Max_gradients"]
    assert it_b["CNOTs"] == it_full["CNOTs"]
