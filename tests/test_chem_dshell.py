"""d-shell (l=2) integrals + regenerated STO-3G rows (round-2 VERDICT
item 6 — the machinery that makes Fe/Si representable natively).

Validation strategy (no pyscf offline):

* the STO-3G regeneration fit must reproduce the PUBLISHED universal
  1s/2sp rows to ~1e-4, pinning the procedure that generated the new
  3d/4sp rows;
* d integrals are checked against a derivative ORACLE that never touches
  the l=2 code path: a d Gaussian is a center-derivative of p/s
  Gaussians, so every S/T/V/ERI element over d functions equals a central
  difference of validated s/p integrals;
* one-electron spectra are rotation-invariant for a rigid-rotated
  Fe-bearing geometry;
* Si and Fe atomic ROHF ground terms converge, are variational, and are
  pinned as regressions.
"""

import numpy as np
import pytest

from openvqe_tpu.chem import basis as bas
from openvqe_tpu.chem import fit_sto3g as fit
from openvqe_tpu.chem.basis import Shell
from openvqe_tpu.chem.integrals import (electron_repulsion,
                                        nuclear_attraction, overlap_kinetic)


@pytest.fixture(autouse=True)
def _coarse_fit_grid(monkeypatch):
    monkeypatch.setattr(fit, "_GRID_POINTS", 40_001)


def test_fit_reproduces_published_rows():
    e, c = fit.fit_slater(1, 0)
    np.testing.assert_allclose(e, bas._STO3G_1S_EXP, rtol=2e-4)
    np.testing.assert_allclose(c, bas._STO3G_1S_COEF, rtol=0, atol=2e-4)
    e, cs, cp = fit.fit_slater_shared(2)
    np.testing.assert_allclose(e, bas._STO3G_2SP_EXP, rtol=3e-4)
    np.testing.assert_allclose(cs, bas._STO3G_2S_COEF, rtol=0, atol=3e-4)
    np.testing.assert_allclose(cp, bas._STO3G_2P_COEF, rtol=0, atol=3e-4)


def _bare(l, center, a):
    return Shell(l, np.asarray(center, float), np.array([a]),
                 np.array([1.0]), 0)


def _ints(shells, charges=(1,), coords=((0.1, -0.2, 0.3),)):
    S, T = overlap_kinetic(shells)
    V = nuclear_attraction(shells, list(charges), np.asarray(coords, float))
    eri = electron_repulsion(shells)
    return S, T, V, eri


def test_dshell_integrals_derivative_oracle():
    """d_xx = (dB_x p_x + s)/(2b), d_xy = dB_y p_x / (2b) (unnormalized
    primitives) — so every d integral is a finite difference of s/p
    integrals.  Checks S, T, V, ERI."""
    rng = np.random.default_rng(3)
    A = np.array([0.0, 0.0, 0.0])
    B = np.array([0.9, -0.4, 0.7])
    a, b = 1.1, 0.8
    probe = [_bare(0, A, a), _bare(1, A, 0.6)]     # 4 probe functions

    h = 2e-4
    idx_xx, idx_xy = 0, 1      # cartesian order: xx, xy, xz, yy, yz, zz

    def ints_with(shell_d):
        return _ints(probe + [shell_d])

    def p_ints(center):
        return _ints(probe + [_bare(1, center, b)])

    S, T, V, eri = ints_with(_bare(2, B, b))
    np_probe = 4
    ex = np.zeros(3)
    ex[0] = 1.0
    ey = np.zeros(3)
    ey[1] = 1.0

    def diff(mats_p, mats_m):
        return [(mp - mm) / (2 * h) for mp, mm in zip(mats_p, mats_m)]

    dSx, dTx, dVx, dEx = diff(p_ints(B + h * ex), p_ints(B - h * ex))
    dSy, dTy, dVy, dEy = diff(p_ints(B + h * ey), p_ints(B - h * ey))
    Ss, Ts, Vs, Es = _ints(probe + [_bare(0, B, b)])

    px = np_probe + 0          # p_x column in the p-shell system
    col_xx = np_probe + idx_xx
    col_xy = np_probe + idx_xy
    for M, dMx, dMy, Ms, name, tol in (
            (S, dSx, dSy, Ss, "S", 5e-7),
            (T, dTx, dTy, Ts, "T", 5e-6),
            (V, dVx, dVy, Vs, "V", 5e-6)):
        for r in range(np_probe):
            want_xx = (dMx[r, px] + Ms[r, np_probe]) / (2 * b)
            want_xy = dMy[r, px] / (2 * b)
            assert abs(M[r, col_xx] - want_xx) < tol, (name, r)
            assert abs(M[r, col_xy] - want_xy) < tol, (name, r)

    # ERI column (p q | r d) for probe p,q,r
    for p in range(np_probe):
        for q in range(np_probe):
            for r in range(np_probe):
                want_xx = (dEx[p, q, r, px]
                           + Es[p, q, r, np_probe]) / (2 * b)
                want_xy = dEy[p, q, r, px] / (2 * b)
                assert abs(eri[p, q, r, col_xx] - want_xx) < 2e-5
                assert abs(eri[p, q, r, col_xy] - want_xy) < 2e-5


def test_one_electron_spectrum_rotation_invariant():
    """Generalized eigenvalues of (T+V, S) for an Fe-O fragment are
    invariant under rigid rotation — exercises every d-block orientation."""
    import scipy.linalg as sla

    geom = [("Fe", (0.0, 0.0, 0.0)), ("O", (0.8, 0.5, 1.1))]
    rng = np.random.default_rng(5)
    Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))

    def spectrum(geometry):
        shells, charges, coords = bas.build_shells(geometry, "sto-3g")
        S, T = overlap_kinetic(shells)
        V = nuclear_attraction(shells, charges, coords)
        return np.sort(sla.eigh(T + V, S, eigvals_only=True))

    w1 = spectrum(geom)
    geom_rot = [(s, tuple(Q @ np.asarray(x))) for s, x in geom]
    w2 = spectrum(geom_rot)
    np.testing.assert_allclose(w1, w2, rtol=1e-8, atol=1e-8)


def test_si_fe_atomic_rohf():
    """Best-atom STO-3G rows: ground-term ROHF converges; energies are the
    zeta-optimization outputs (regression pins, not external oracles —
    provenance in chem/basis.py)."""
    e_si = fit.atomic_energy("Si", list(
        bas._STO3G_ZETA_BEST_ATOM["Si"].values()))
    assert abs(e_si - SI_E_ATOM) < 5e-5, e_si
    e_fe = fit.atomic_energy("Fe", list(
        bas._STO3G_ZETA_BEST_ATOM["Fe"].values()))
    assert abs(e_fe - FE_E_ATOM) < 5e-5, e_fe
    # variational sanity: within 2% of the HF-limit atomic energies
    # (Si -288.854, Fe -1262.44 Ha) from below-bounded above
    assert -289.0 < e_si < -270.0
    assert -1263.0 < e_fe < -1150.0


# zeta-optimization outputs (chem/fit_sto3g.py __main__; committed as data)
SI_E_ATOM = -285.580052
FE_E_ATOM = -1248.365804


def test_cart2sph_projection():
    """Pure-d projection (round-3 VERDICT item 3): B^T S B is exactly
    unit-normalized (the 1/3 Gaussian moment ratios behind the analytic
    scales in basis._CART2SPH_D are exponent-independent), the spherical
    space drops exactly one function per d shell, and RHF in the
    projected basis is variationally above the cartesian RHF while
    staying converged — the convention the reference's pyscf chain used
    (contextual_subspace.ipynb cells 11-14, pyscf spherical default)."""
    from openvqe_tpu.chem.basis import (build_shells, cart2sph_matrix,
                                        nbasis, to_spherical)
    from openvqe_tpu.chem.scf import rhf

    geom = [("Fe", (0.0, 0.0, 0.0)), ("O", (0.8, 0.5, 1.1))]
    shells, charges, coords = build_shells(geom, "sto-3g")
    S, T = overlap_kinetic(shells)
    V = nuclear_attraction(shells, charges, coords)
    eri = electron_repulsion(shells)
    B = cart2sph_matrix(shells)
    n_d_shells = sum(1 for sh in shells if sh.l == 2)
    assert n_d_shells == 1
    assert B.shape == (nbasis(shells), nbasis(shells) - n_d_shells)
    S2, (T2, V2), eri2 = to_spherical(B, S, [T, V], eri)
    np.testing.assert_allclose(np.diag(S2), 1.0, rtol=0, atol=1e-12)
    # ERI transform: the tensordot chain must equal the direct 4-fold
    # einsum contraction
    np.testing.assert_allclose(
        np.einsum("pqrs,pi,qj,rk,sl->ijkl", eri, B, B, B, B), eri2,
        rtol=0, atol=1e-11)
    hf_c = rhf(S, T + V, eri, 34, 0.0, max_iter=400, conv=1e-7)
    hf_s = rhf(S2, T2 + V2, eri2, 34, 0.0, max_iter=400, conv=1e-7)
    assert hf_c.converged and hf_s.converged
    assert hf_s.energy >= hf_c.energy - 1e-9
    assert hf_s.energy - hf_c.energy < 1.0


def test_si_published_molecular_zetas():
    """Si now carries the published molecular STO-3G factors
    (basis._STO3G_ZETA["Si"]); the table identity 0.4828540806 * 1.75^2
    = 1.4787406... pins the 3sp row against the canonical exponent, and
    build_shells prefers the published factors over the best-atom fit."""
    sh, _, _ = bas.build_shells([("Si", (0, 0, 0))], "sto-3g")
    assert abs(sh[3].exps[0] - 1.4787406) < 1e-6     # 3s leading exponent
    assert abs(sh[0].exps[0] - 2.227660584 * 13.53 ** 2) < 1e-9
