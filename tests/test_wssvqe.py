"""WSSVQE tests: weighted subspace search finds the lowest eigenstates of
the random TFIM (reference get_energy_WSSVQE.py has no tests)."""

import numpy as np
import pytest

from openvqe_tpu.algorithms.wssvqe import (
    WSSVQE,
    calculate_eigen_vectors,
    ising,
    molecule_generator,
    n_parameters,
)


def test_ising_builder_deterministic():
    h1 = ising(4)
    h2 = ising(4)
    assert len(h1) == len(h2) == 4 + 6  # N X-fields + N(N-1)/2 ZZ couplings
    assert h1.is_hermitian()
    m1, m2 = h1.to_matrix(), h2.to_matrix()
    assert np.allclose(m1, m2)


def test_eigenvector_reference():
    model = ising(4)
    w, vecs = calculate_eigen_vectors(model, 3)
    dense = np.linalg.eigvalsh(model.to_matrix())
    assert np.allclose(w, dense[:3], atol=1e-8)


def test_wssvqe_tfim_two_states():
    out = WSSVQE(model="ising", nqbits=4, n_states=2, depth=3,
                 opts={"tol": 1e-5, "maxiter": 250}).execute()
    exact = out["exact_eigenvalues"]
    # variational upper bounds, ordered, and close to the exact spectrum
    assert out["final_energies"][0] >= exact[0] - 1e-9
    assert out["final_energies"][1] >= exact[1] - 1e-9
    assert abs(out["final_energies"][0] - exact[0]) < 0.05
    assert out["fidelity_lists"]["fidelity_circ_0"][-1] > 0.9


def test_wssvqe_molecule_model():
    out = WSSVQE(model="H2", n_states=2, depth=4,
                 opts={"tol": 1e-6, "maxiter": 400}).execute()
    exact = out["exact_eigenvalues"]
    assert abs(out["final_energies"][0] - exact[0]) < 1e-4
    assert abs(out["final_energies"][1] - exact[1]) < 1e-3


def test_param_count_and_molecule_table():
    assert n_parameters(4, 3) == 2 * 4 * 4 + 2
    r, geom, charge, spin, basis = molecule_generator("H2")
    assert r == 0.98  # WSSVQE's own H2 geometry (get_energy_WSSVQE.py:46-51)
    with pytest.raises(KeyError):
        molecule_generator("XYZ")
