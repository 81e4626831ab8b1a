"""C++ integral engine cross-checks against the pure-numpy reference path."""

import numpy as np
import pytest

from openvqe_tpu import native
from openvqe_tpu.chem import integrals as I
from openvqe_tpu.chem.basis import build_shells

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native engine unavailable (no g++)")


@pytest.mark.parametrize("geom,basis", [
    ([("H", (0, 0, 0)), ("H", (0, 0, 0.75))], "6-31g"),
    ([("Li", (0, 0, 0)), ("H", (0, 0, 1.45))], "sto-3g"),
    ([("O", (0, 0, 0)), ("H", (0.9578, 0, 0)),
      ("H", (-0.24, 0.927, 0))], "sto-3g"),
    # d shells (Fe: 1s/2sp/3sp/4sp/3d — exercises every l=2 class)
    ([("Fe", (0, 0, 0)), ("O", (0.8, 0.5, 1.1))], "sto-3g"),
])
def test_native_matches_numpy(geom, basis):
    shells, charges, coords = build_shells(geom, basis)
    S1, T1 = I.overlap_kinetic(shells)
    V1 = I.nuclear_attraction(shells, charges, coords)
    e1 = I.electron_repulsion(shells)
    S2, T2, V2 = native.one_electron(shells, charges, coords)
    e2 = native.eri(shells)
    assert np.allclose(S1, S2, atol=1e-11)
    assert np.allclose(T1, T2, atol=1e-11)
    assert np.allclose(V1, V2, atol=1e-10)
    assert np.allclose(e1, e2, atol=1e-11)
