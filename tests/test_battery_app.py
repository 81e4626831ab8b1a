"""Quantum-battery application tests against the reference's recorded
experiment accuracy (BASELINE.md / logs)."""

import numpy as np
import pytest

from openvqe_tpu.apps.quantum_batteries.adapt import (
    AdaptContext,
    excitations,
    run_cs_adapt,
    run_cs_adapt_experiment,
)
from openvqe_tpu.apps.quantum_batteries.cs_vqe import run_cs_vqe
from openvqe_tpu.apps.quantum_batteries.rotoselect import run_rotoselect
from openvqe_tpu.apps.quantum_batteries.utils import (
    CCSD_ENERGY,
    load_cs_hams,
    rel_err,
)


def test_load_cs_hams():
    hams = load_cs_hams()
    assert sorted(hams) == [2, 3, 4, 5, 6, 7, 8]
    ham8, hf8 = hams[8]
    assert ham8.nbqbits == 8 and hf8 == "11111100"
    assert len(ham8) + 1 == 440  # 439 Pauli strings + identity folded out
    assert ham8.is_hermitian()


def test_excitations_counts():
    # reference run prints "Total number of excitations = 3" for 7q/6e
    s, d = excitations(6, 7)
    assert len(s) + len(d) == 3
    s, d = excitations(6, 8)
    assert len(s) + len(d) == 15


def test_cs_adapt_matches_reference_accuracy():
    res = run_cs_adapt(num_iterations=2, qubit_counts=(7, 8), verbose=False)
    # reference: 3.073e-05 (7q), 3.077e-05 (8q)
    assert res["mean_rel_errs"][0] < 6e-5
    assert res["mean_rel_errs"][1] < 6e-5


def test_cs_adapt_parameter_shift_agrees():
    hams = load_cs_hams()
    ham, hf = hams[7]
    ctx = AdaptContext(ham, hf)
    rng = np.random.RandomState(0)
    e_analytic = run_cs_adapt_experiment(ctx, rng=np.random.RandomState(0))
    e_shift = run_cs_adapt_experiment(ctx, rng=np.random.RandomState(0),
                                      use_parameter_shift=True)
    assert abs(e_analytic - e_shift) < 1e-4


def test_cs_vqe_small():
    res = run_cs_vqe(layers=(4,), num_iterations=2, qubit_counts=(2, 6),
                     verbose=False)
    # reference logs/cs_vqe.txt: 6.2e-4 (2q), 3.6e-5 best (6q)
    assert res["mean_rel_errs"][4][0] < 1e-3
    assert res["mean_rel_errs"][4][1] < 1e-4


def test_rotoselect_small():
    res = run_rotoselect(num_iterations=1, n_steps=10, qubit_counts=(2,),
                         verbose=False)
    assert res["mean_rel_errs"][0] < 1e-3


def test_fused_rotoselect_matches_host_loop():
    """The fully-fused (one-executable) rotoselect must reproduce the
    host-loop optimizer trajectory."""
    import jax.numpy as jnp
    import numpy as np
    from openvqe_tpu.apps.quantum_batteries import rotoselect as rs
    from openvqe_tpu.apps.quantum_batteries.utils import load_cs_hams

    ham, hf = load_cs_hams()[2]
    n = ham.nbqbits
    n_steps = 4
    params0 = np.random.default_rng(0).uniform(size=n)

    cost = rs.build_rotoselect_cost(ham, hf)
    p_ref = params0.copy()
    g_ref = np.ones(n, dtype=np.int32)
    for _ in range(n_steps):
        p_ref, g_ref = rs.rotoselect_cycle(cost, p_ref, g_ref)
    e_ref = float(cost(jnp.asarray(p_ref), jnp.asarray(g_ref)))

    fused = rs.build_fused_rotoselect(ham, hf, n_steps)
    p_f, g_f, e_f = fused(jnp.asarray(params0),
                          jnp.ones(n, dtype=jnp.int32))
    assert np.array_equal(np.asarray(g_f), g_ref)
    assert np.allclose(np.asarray(p_f), p_ref, atol=1e-9)
    assert abs(e_f - e_ref) < 1e-10


def test_lbfgs_plateau_stop():
    """lbfgs_minimize(patience=...) must stop on a value plateau well
    before maxiter when the gradient norm cannot reach tol (the f32
    rounding-floor scenario that burned the CS-VQE budget), at the same
    minimum."""
    import jax.numpy as jnp
    from openvqe_tpu.optim.minimize import lbfgs_minimize

    def rosen(x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                       + (1.0 - x[:-1]) ** 2)

    x0 = jnp.zeros(4)
    x_ref, f_ref, it_ref = lbfgs_minimize(rosen, x0, tol=0.0, maxiter=400)
    x_pl, f_pl, it_pl = lbfgs_minimize(rosen, x0, tol=0.0, maxiter=400,
                                       patience=10, ftol=1e-9)
    assert int(it_ref) == 400          # tol=0 never met: full budget
    assert int(it_pl) < 400            # plateau stop fired early
    assert abs(float(f_pl) - float(f_ref)) < 1e-6


def test_lbfgs_returns_best_seen():
    """lbfgs_minimize must return the BEST-SEEN (params, value) pair, not
    the last iterate: after a plateau stop the returned value must equal
    fun(returned params) and can never exceed any evaluated iterate
    (round-3 ADVICE: the last iterate could drift up to ~patience*ftol
    above the best encountered minimum)."""
    import jax.numpy as jnp
    from openvqe_tpu.optim.minimize import lbfgs_minimize

    def rosen(x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2
                       + (1.0 - x[:-1]) ** 2)

    x0 = jnp.zeros(4)
    for kwargs in ({}, {"patience": 3, "ftol": 1e-2},
                   {"patience": 10, "ftol": 1e-9}, {"maxiter": 5}):
        kwargs = {"maxiter": 400, **kwargs}
        x, f, _ = lbfgs_minimize(rosen, x0, tol=0.0, **kwargs)
        assert abs(float(rosen(x)) - float(f)) < 1e-12   # value IS f(x)
        assert float(f) <= float(rosen(x0))


def test_fused_cs_vqe_cpu_matches_scipy():
    """Fused HEA VQE (plateau L-BFGS) reaches the scipy-BFGS energy on the
    smallest contextual Hamiltonian."""
    import numpy as np
    from openvqe_tpu.apps.quantum_batteries.cs_vqe import (
        build_fused_hea_vqe, build_hea_energy, run_single_vqe)
    from openvqe_tpu.apps.quantum_batteries.utils import load_cs_hams

    ham, hf = load_cs_hams()[2]
    rng = np.random.RandomState(0)
    x0 = rng.uniform(size=(4 + 1) * 2)
    e_scipy, _ = run_single_vqe(ham, 4, hf, x0, optimizer="BFGS")
    import jax.numpy as jnp
    _, e_fused = build_fused_hea_vqe(ham, 4, hf)(jnp.asarray(x0))
    assert abs(float(e_fused) - e_scipy) < 1e-4
