"""32-qubit-system capability frontier (round-4 VERDICT item 6).

H16/STO-3G — a 32-spin-orbital system, one step past the reference's
whole molecule table (`molecule_factory.py:45-304` tops out at 30-qubit
systems like CO2/C2H4) — run two ways:

  1. ``run_32q_energy()``: exact Z2 taper (alpha/beta electron-number
     parity, ansatz-compatible — ops/tapering.py) takes the system to 30
     qubits, where the ENERGY evaluation fits ONE v5e chip via the XL
     streaming path (in-place donated rotation sweep + read-only bucketed
     expectation, sim/streaming.py).  theta=0 must reproduce the SCF HF
     energy; the MP2-guess ansatz energy must land below HF.

  2. ``run_32q_mesh_iteration()``: a REDUCED full iteration (energy +
     reversible-adjoint gradient + descent step) of the same tapered
     system on the 8-device virtual CPU mesh through the sharded-stream
     composition (parallel/sharded_stream.py) — real molecular H terms
     and real UCCSD pool operators, truncated to a CPU-feasible term/op
     count (the host is single-core; a full 36k-term pass over 2^30
     amplitudes is a TPU-pod job, not a CPU check), cross-checked against
     the single-device grouped engine at the same truncation.

Setup (SCF + JW transform + taper + grouping) is cached in /tmp: the
driver's end-of-round bench run reuses it.

Usage:
  python benchmarks/bench_32q_frontier.py            (TPU energy row)
  python benchmarks/bench_32q_frontier.py --mesh     (virtual-mesh check)
"""

from __future__ import annotations

import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CACHE = "/tmp/ovqe_32q_setup_h16.pkl"


def setup_32q():
    """H16/STO-3G (32q) -> exact Z2 taper -> 30q problem + grouped arrays.
    Returns (hsp, gens, theta0, hf_init, gseq, gham, meta)."""
    if os.path.exists(_CACHE):
        with open(_CACHE, "rb") as f:
            return pickle.load(f)

    from openvqe_tpu.chem.frontend import compute_molecule
    from openvqe_tpu.ops.hamiltonian import (
        ElectronicStructureHamiltonian, convert_to_h_integrals)
    from openvqe_tpu.ops.tapering import taper_vqe_problem
    from openvqe_tpu.ops.transforms import transform_operator
    from openvqe_tpu.ops.uccsd import get_cluster_ops_and_init_guess
    from openvqe_tpu.sim import grouped as gr
    from openvqe_tpu.sim.compile import compile_op_sequence, compile_pauli_sum

    md = compute_molecule(
        [("H", (0, 0, 1.0 * k)) for k in range(16)], "sto-3g",
        charge=0, spin=0, run_fci_flag=False)
    hpq, hpqrs = convert_to_h_integrals(md.one_body_integrals,
                                        md.two_body_integrals)
    hsp = ElectronicStructureHamiltonian(
        hpq, hpqrs, md.nuclear_repulsion).to_spin("JW")
    n_sys = hsp.nbqbits
    assert n_sys == 32, n_sys
    eps_full = [e for e in md.orbital_energies for _ in range(2)]
    cluster_ops, theta0, hf_init = get_cluster_ops_and_init_guess(
        md.n_elec, [0] * n_sys, eps_full, hpqrs)
    gens = [transform_operator(op, "JW") * 1j for op in cluster_ops]
    hsp, gens, hf_init, _tap = taper_vqe_problem(hsp, gens, hf_init)
    n = hsp.nbqbits

    gseq = gr.group_op_sequence(compile_op_sequence(gens, n))
    gham = gr.group_pauli_sum(compile_pauli_sum(hsp, n))
    meta = {"system": "H16", "system_qubits": n_sys, "qubits": n,
            "h_terms": len(hsp), "ops": len(gens),
            "hf_energy": float(md.info["HF"]), "mp2": float(md.info["MP2"])}
    data = (hsp, gens, [float(t) for t in theta0], hf_init, gseq, gham, meta)
    with open(_CACHE, "wb") as f:
        pickle.dump(data, f)
    return data


def run_32q_energy() -> dict:
    """TPU: 30q (tapered 32q-system) UCCSD ansatz energy on one chip."""
    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/ovqe_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from openvqe_tpu.sim import streaming as st

    t0 = time.time()
    hsp, gens, theta0, hf_init, gseq, gham, meta = setup_32q()
    setup_s = time.time() - t0
    e_hf = meta["hf_energy"]
    n = meta["qubits"]
    energy = st.build_streaming_energy_xl_fn(gseq, gham, hf_init)

    t1 = time.time()
    e0 = energy(np.zeros(gseq.n_ops))
    t_first = time.time() - t1            # includes compile on a cold cache
    match_hf = abs(e0 - e_hf) < 5e-4

    th = np.asarray(theta0, np.float32)
    t2 = time.time()
    e1 = energy(th)
    dt = time.time() - t2                 # warm

    return {
        "system": f"H16 tapered 32->{n}q", "qubits": n,
        "ops": gseq.n_ops, "rot_groups": gseq.n_groups,
        "h_groups": gham.n_groups, "h_terms": meta["h_terms"],
        "setup_s": round(setup_s, 1),
        "first_call_s": round(t_first, 1),
        "s_per_energy": round(dt, 2),
        "theta0_energy": float(e0), "hf_energy": e_hf,
        "match_hf": bool(match_hf),
        "ansatz_energy": float(e1),
        "below_hf": bool(e1 < e_hf + 1e-6),
        "state_gb": round(2 * (1 << n) * 4 / 2**30, 2),
        "backend": jax.default_backend(),
    }


def run_32q_mesh_iteration(n_devices: int = 2, n_ops: int = 4,
                           n_ham_offdiag: int = 6,
                           n_ham_diag: int = 8) -> dict:
    """Virtual-mesh check: a reduced full iteration (energy + adjoint
    gradient) of the tapered H16 system through the sharded-stream
    composition, on real molecular operators, cross-checked against the
    exact sparse-support oracle (sim/oracle.py — all UCCSD terms of one
    excitation share an XOR mask, so n_ops operators reach <= 2^n_ops
    basis states and energy/gradient have exact f64 closed forms).

    Sized for a single host whose RAM is every virtual device's "HBM" at
    once: a pair-lifted (concat-twin) generator at 2^30 was measured to
    OOM a 125 GB host, so the generators are the largest-|MP2| operators
    NOT touching the device qubit (local runs) and the cross-device
    exchange is carried by the molecular Hamiltonian's own qubit-0
    off-diagonal terms (lax.ppermute in the H apply).  The generator
    pair-lift path is dryrun-gated at 26q mixed masks and hardware-
    proven at 21q (__graft_entry__._dryrun_30q_stream_iteration,
    bench_sharded_stream.py)."""
    import jax
    import numpy as np

    from openvqe_tpu.ops.pauli import PauliSum
    from openvqe_tpu.parallel import sharded as sh
    from openvqe_tpu.parallel import sharded_stream as ss
    from openvqe_tpu.sim import oracle as orc
    from openvqe_tpu.sim.compile import compile_op_sequence, compile_pauli_sum

    assert jax.default_backend() == "cpu"
    hsp, gens_all, theta0, hf_init, _gseq, _gham, meta = setup_32q()
    n = meta["qubits"]
    d = int(np.log2(n_devices))
    dev_mask = (1 << d) - 1                 # PauliSum qubits 0..d-1 = device bits

    # truncate pool: largest-|MP2-amplitude| operators local to the mesh
    # (x mask clear of the device qubits — see docstring)
    def is_local(ps):
        return all((x & dev_mask) == 0 for (x, _z), _c in ps)

    order = [int(k) for k in np.argsort(-np.abs(np.asarray(theta0)))
             if is_local(gens_all[int(k)])][:n_ops]
    gens = [gens_all[k] for k in order]
    theta = np.asarray([theta0[k] for k in order]) + 0.05
    gen_xs = {x for g in gens for (x, _z), _c in g}

    # truncate H: largest diagonal terms + the largest off-diagonal terms
    # whose XOR mask matches a selected generator (these COUPLE to the
    # ansatz, so the gradient parity is non-vacuous — the globally
    # largest off-diagonal terms commute past this 4-op ansatz and give
    # an identically-zero gradient, measured), plus the largest
    # CROSS-DEVICE term so the mesh exchange runs at 30q on real data
    items = list(hsp)                       # [((x, z), coeff)]
    diag = sorted([t for t in items if t[0][0] == 0],
                  key=lambda t: -abs(t[1]))[:n_ham_diag]
    offd = sorted([t for t in items if t[0][0] in gen_xs],
                  key=lambda t: -abs(t[1]))[:n_ham_offdiag - 2]
    # a PAIR of cross-device terms whose XOR difference equals a selected
    # generator mask: their H^2 cross-product lands back on the oracle
    # support, making the |H psi|^2 gate below phase-sensitive to the
    # mesh exchange (a single cross term only gates its 2-norm; its
    # <psi|H|psi> contribution is structurally zero under local-run
    # generators).  Both partners are REAL molecular terms, found by
    # exact x-index lookup.
    by_x = {}
    for t in items:
        by_x.setdefault(t[0][0], []).append(t)
    pair = None
    for t1 in sorted((t for t in items if t[0][0] & dev_mask),
                     key=lambda t: -abs(t[1]))[:200]:
        for g in gen_xs:
            cands = by_x.get(t1[0][0] ^ g, [])
            if cands:
                t2 = max(cands, key=lambda t: abs(t[1]))
                if t2[0] != t1[0]:
                    pair = (t1, t2)
                    break
        if pair:
            break
    assert pair is not None, "no paired cross-device molecular terms found"
    offd.extend(pair)
    ham = PauliSum(n, dict(diag + offd),
                   constant_coeff=hsp.constant_coeff)

    mesh = sh.make_mesh(n_devices)
    obj = ss.ShardedStreamObjective(ham, mesh, impl="xla")
    bound = obj.bind(gens, hf_init)
    t0 = time.time()
    e0, g0 = bound.energy_and_grad(theta)
    t_iter = time.time() - t0

    # exact sparse-support oracle (f64; dual-validated in tests/test_oracle.py)
    seqc = compile_op_sequence(gens, n)
    e_ref, g_ref = orc.sparse_energy_and_grad(
        theta, seqc, compile_pauli_sum(ham, n), hf_init)
    dev = abs(float(e0) - e_ref)

    # phase-sensitive exchange gate: |H psi|^2 vs the oracle's exact
    # <psi|H^2|psi> (see the paired-cross-term selection above), with a
    # teeth self-check — flipping one partner's sign in the oracle must
    # move the value by >> the pass tolerance
    import jax.numpy as jnp
    psi = bound.forward(theta)
    lam = obj.ham_apply(psi)
    s_eng = float(jax.jit(lambda a: jnp.sum(a * a))(lam))
    del psi, lam
    state = orc.sparse_forward(theta, seqc, hf_init)
    s_ref = orc.sparse_expectation(
        state, compile_pauli_sum((ham * ham).prune(1e-12), n))
    (k2, c2) = pair[1]
    flip = ham + PauliSum(n, {k2: -2.0 * c2})
    s_flip = orc.sparse_expectation(
        state, compile_pauli_sum((flip * flip).prune(1e-12), n))
    gate_signal = abs(s_ref - s_flip) / max(1.0, abs(s_ref))
    s_dev = abs(s_eng - s_ref) / max(1.0, abs(s_ref))

    ok = bool(dev < 1e-4
              and np.allclose(np.asarray(g0), g_ref, rtol=1e-3, atol=1e-4)
              and np.linalg.norm(g_ref) > 1e-3    # non-vacuous gradient
              and s_dev < 1e-5                    # exchange gate (f32)
              and gate_signal > 1e-4)             # ... with teeth
    out = {"metric": "H16 tapered 32->30q reduced iteration, "
                     f"{n_devices}-device virtual mesh (sharded-stream, "
                     "real molecular ops, exact-oracle cross-check)",
           "qubits": n, "n_ops": len(gens), "h_terms": len(ham),
           "cross_device_h_terms": int(sum(bool(t[0][0] & dev_mask)
                                           for t in offd)),
           "E0": float(e0), "E0_oracle": e_ref, "dev": dev,
           "grad_norm": float(np.linalg.norm(np.asarray(g0))),
           "grad_max_dev": float(np.max(np.abs(np.asarray(g0) - g_ref))),
           "h2_norm_engine": s_eng, "h2_norm_oracle": s_ref,
           "h2_rel_dev": s_dev, "h2_gate_signal": gate_signal,
           "s_iteration_cpu": round(t_iter, 1), "ok": ok}
    assert ok, out
    return out


if __name__ == "__main__":
    if "--mesh" in sys.argv:
        # the axon plugin registers itself at interpreter start via
        # sitecustomize, so in-process env edits are too late: re-exec a
        # clean CPU-forced subprocess (same pattern as
        # __graft_entry__.dryrun_multichip) unless already forced
        import jax

        if jax.default_backend() != "cpu":
            import subprocess

            env = dict(os.environ)
            env["JAX_PLATFORMS"] = "cpu"
            env["PALLAS_AXON_POOL_IPS"] = ""
            flags = [f for f in env.get("XLA_FLAGS", "").split()
                     if "host_platform_device_count" not in f]
            flags.append("--xla_force_host_platform_device_count=8")
            env["XLA_FLAGS"] = " ".join(flags)
            raise SystemExit(subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--mesh"],
                env=env).returncode)
        print(json.dumps(run_32q_mesh_iteration()), flush=True)
    else:
        print(json.dumps(run_32q_energy()), flush=True)
